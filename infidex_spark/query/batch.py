"""Distributed batch query evaluation.

For evaluating many queries at once (offline relevance jobs, query-log
replays) the driver-side executor is the wrong shape; this module scores
a whole query table in one Spark job:

  queries(query_id, text, k)
    -> driver tokenizes (cheap, <100 terms/query) and computes idf per
       (query_id, term) from the postings df column      [broadcast]
  postings (bucket-pruned to the union of query terms)
    -> mapInPandas decode: (term, doc_id, tf)            [scan, pruned]
    -> broadcast-join query terms -> per-term scores
    -> join doc_stats for dl                             [shuffle]
    -> groupBy(query_id, doc_id) sum                     [shuffle]
    -> per-query top-k window                            [shuffle, k rows/query out]

Semantics: exact BM25+ over the full disjunction of each query's known
terms (incl. LD1 fuzzy unions for unknown tokens >= 4 chars). This is a
superset of the single-query tiered candidate set; scores are exact and
the ordering of any doc the tiered path returns is identical.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from infidex_spark.build.codec import decode_postings
from infidex_spark.kernel.bm25 import B, DELTA, K1, compute_idf
from infidex_spark.kernel.normalize import normalize
from infidex_spark.kernel.tokenize import search_tokens
from infidex_spark.query.executor import IndexReader, term_bucket

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.FloatType(), False),
    ]
)


def batch_search(
    spark: SparkSession,
    reader: IndexReader,
    queries: list[tuple[int, str, int]],
    default_k: int = 10,
) -> DataFrame:
    """queries: (query_id, text, k). Returns DataFrame
    (query_id, rank, doc_key, score) with rank 1..k per query."""
    index_dir = reader.index_dir

    # ---- driver: tokenize + resolve term stats (tiny)
    per_query_terms: list[tuple[int, str, float, int]] = []  # qid, term, idf, fuzzy
    all_terms: set[str] = set()
    fuzzy_map: dict[tuple[int, str], list[str]] = {}
    for qid, text, k in queries:
        q = normalize((text or "").strip()).lower()
        toks = sorted(set(search_tokens(q, reader.sizes, reader.start_pad)))
        fetched = reader.fetch_terms(toks)
        for tok in toks:
            tp = fetched.get(tok)
            if tp is not None:
                if 0 < tp.df <= reader.stop_term_limit:
                    idf = float(compute_idf(reader.total_docs, tp.df))
                    per_query_terms.append((qid, tok, idf, 0))
                    all_terms.add(tok)
            elif len(tok) >= 4 and tok not in reader.stop_terms:
                matches = reader.fetch_variant_terms(tok)
                if matches:
                    posts = reader.fetch_terms(matches)
                    union = (
                        np.unique(np.concatenate([p.doc_ids for p in posts.values()]))
                        if posts
                        else np.zeros(0)
                    )
                    if union.size:
                        idf = float(compute_idf(reader.total_docs, int(union.size)))
                        per_query_terms.append((qid, tok, idf, 1))
                        fuzzy_map[(qid, tok)] = matches
                        all_terms.update(matches)

    if not per_query_terms:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_key long, score double"
        )

    qt = spark.createDataFrame(
        per_query_terms, "query_id long, qterm string, idf double, fuzzy int"
    )
    # fuzzy tokens resolve to their matched index terms (tf forced to 1)
    expand_rows = [(qid, tok, m) for (qid, tok), ms in fuzzy_map.items() for m in ms]
    if expand_rows:
        fz = spark.createDataFrame(expand_rows, "query_id long, qterm string, term string")
    else:
        fz = None

    # ---- distributed: decode only the needed term rows
    buckets = sorted({term_bucket(t, reader.n_buckets) for t in all_terms})
    postings = (
        spark.read.parquet(f"{index_dir}/postings")
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(list(all_terms)))
        .select("term", "n_docs", "payload", "weights")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms_out, docs_out, tfs_out = [], [], []
            for r in pdf.itertuples(index=False):
                d, w = decode_postings(r.payload, r.weights, int(r.n_docs))
                terms_out.append(np.repeat(np.array([r.term], dtype=object), d.size))
                docs_out.append(d)
                tfs_out.append(w.astype(np.float32))
            if terms_out:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms_out),
                        "doc_id": np.concatenate(docs_out),
                        "tf": np.concatenate(tfs_out),
                    }
                )

    decoded = postings.mapInPandas(decode, schema=_DECODED_SCHEMA)

    exact = decoded.join(
        F.broadcast(qt.filter(F.col("fuzzy") == 0)),
        decoded.term == F.col("qterm"),
    ).select("query_id", "doc_id", "tf", "idf")
    parts = [exact]
    if fz is not None:
        fuzzy_hits = (
            decoded.join(F.broadcast(fz), "term")
            .select("query_id", "qterm", "doc_id")
            .distinct()  # union semantics: one virtual posting per doc
            .join(
                F.broadcast(qt.filter(F.col("fuzzy") == 1)), ["query_id", "qterm"]
            )
            .select("query_id", "doc_id", F.lit(1.0).cast("float").alias("tf"), "idf")
        )
        parts.append(fuzzy_hits)
    contrib = parts[0]
    for p in parts[1:]:
        contrib = contrib.unionByName(p)

    doc_stats = spark.read.parquet(f"{index_dir}/doc_stats")
    avgdl = float(reader.avgdl if reader.avgdl > 0 else 1.0)
    k1, b, delta = float(K1), float(B), float(DELTA)
    scored = (
        contrib.join(doc_stats, "doc_id")
        .withColumn("dl_adj", F.when(F.col("dl") <= 0, 1.0).otherwise(F.col("dl")))
        .withColumn(
            "s",
            F.col("idf")
            * (
                (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl_adj") / avgdl))
                + delta
            ),
        )
        .groupBy("query_id", "doc_id", "doc_key")
        .agg(F.sum("s").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_key"))
    ks = {qid: (k or default_k) for qid, _, k in queries}
    k_df = spark.createDataFrame(list(ks.items()), "query_id long, k int")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(k_df), "query_id")
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_key", "score")
        .orderBy("query_id", "rank")
    )
