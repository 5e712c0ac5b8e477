"""Deduplication operators.

All hashes are cross-engine-stable (md5 hex / crc32) so every operator has
a DuckDB-checkable oracle. Designed around shuffle economics:

- exact dedup: one groupBy on a 32-char hash — minimal shuffle width;
- MinHash-LSH: per-doc signatures computed map-side (Arrow batch), banded
  into (band, band_hash) keys; only the band buckets shuffle, and
  candidate pairs come from a self-join *within* buckets (tiny vs the
  full cross product);
- SimHash: 64-bit signature map-side, exact-match buckets (or rotate for
  near-match at scale);
- n-gram Jaccard verify: exact similarity only for LSH candidate pairs.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORD_RE = re.compile(r"[^ ]+")


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_docs, keeper, doc_ids).
    keeper = min doc_id (deterministic survivor)."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
    )


def _shingles(text: str, k: int = 3) -> list[str]:
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def _minhash_sig(text: str, n_hashes: int, k: int) -> list[int]:
    """MinHash signature via md5(seed:shingle) — deterministic and
    reproducible in SQL (md5 is available in both Spark and DuckDB)."""
    sh = _shingles(text, k)
    if not sh:
        return [0] * n_hashes
    sig = []
    for seed in range(n_hashes):
        best = None
        for s in sh:
            h = hashlib.md5(f"{seed}:{s}".encode("utf-8")).hexdigest()[:16]
            v = int(h, 16)
            if best is None or v < best:
                best = v
        sig.append(best)
    return sig


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n_hashes: int = 16, shingle_k: int = 3
) -> DataFrame:
    """(doc_id, sig ARRAY<LONG>) — map-side only, no shuffle."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("sig", T.ArrayType(T.LongType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [
                [v - (1 << 63) for v in _minhash_sig(t or "", n_hashes, shingle_k)]
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    return docs.select("doc_id", text_col).mapInPandas(run, schema=schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs (doc_a < doc_b, band) from banded
    MinHash. Pairs emerge from a self-join within (band, band_sig)
    buckets, never a global cross join."""
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(docs, text_col, n_hashes, shingle_k)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[i].cast("string")
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ],
                        ).alias("band_sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_sig")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash BIGINT): 64-bit SimHash over word unigrams using
    md5-derived word hashes (stable across engines)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                words = _WORD_RE.findall((t or "").lower())
                acc = np.zeros(64, dtype=np.int64)
                shifts = np.arange(64, dtype=np.uint64)
                for w in words:
                    h = np.uint64(int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16))
                    bits = (h >> shifts) & np.uint64(1)
                    acc += np.where(bits == 1, 1, -1)
                val = 0
                for i in range(64):
                    if acc[i] > 0:
                        val |= 1 << i
                out.append(val - (1 << 63))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.select("doc_id", text_col).mapInPandas(run, schema=schema)


def jaccard_verify(
    docs: DataFrame, pairs: DataFrame, text_col: str = "text", shingle_k: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: (doc_a, doc_b, jaccard).
    Joins texts to the (small) candidate set — broadcast when it fits."""
    texts = docs.select(F.col("doc_id"), F.col(text_col).alias("_t"))
    joined = (
        pairs.join(texts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("_t", "ta"), "doc_a")
        .join(texts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("_t", "tb"), "doc_b")
    )
    schema = T.StructType(
        [
            T.StructField("doc_a", T.LongType(), False),
            T.StructField("doc_b", T.LongType(), False),
            T.StructField("jaccard", T.DoubleType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            js = []
            for ta, tb in zip(pdf["ta"], pdf["tb"]):
                sa, sb = set(_shingles(ta or "", shingle_k)), set(_shingles(tb or "", shingle_k))
                js.append(len(sa & sb) / len(sa | sb) if (sa or sb) else 1.0)
            yield pd.DataFrame(
                {"doc_a": pdf["doc_a"], "doc_b": pdf["doc_b"], "jaccard": js}
            )

    return joined.mapInPandas(run, schema=schema)
