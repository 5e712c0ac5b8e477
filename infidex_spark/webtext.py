"""Deterministic synthetic Common-Crawl-style webtext.

Produces the exact input-table shape from the project brief
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string),
fully seeded — the same (n_rows, seed) always yields byte-identical rows,
so tests, benchmarks, and the two-parallelism scaling runs all see the
same input regardless of partitioning.

Generation is distributed: rows are derived purely from their row index
(spark.range -> mapInPandas), so it scales to any row count with no
driver-side materialization.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# Zipfian English vocabulary so stop-gram / hot-term skew paths trigger.
_EN_VOCAB = (
    "the of and to in a is that for it was on are as with be at by this "
    "have from or had not but what all were when we there can an your which "
    "their said if do will each about how up out them then she many some so "
    "these would other into has more her two like him see time could no make "
    "than first been its who now people my made over did down only way find "
    "use may water long little very after words called just where most know "
    "internet website page search engine index query document ranking score "
    "data cluster spark shuffle partition executor memory network storage "
    "quick brown fox jumps lazy dog batman gotham redemption shawshank "
    "prison hope freedom crawl archive snapshot token weight corpus"
).split()

_CS_VOCAB = (
    "příliš žluťoučký kůň úpěl ďábelské ódy mateřská škola březnice praha "
    "gymnázium základní umělecká čeština řeka hora město vesnice národní "
    "knihovna divadlo muzeum zámek hrad náměstí ulice"
).split()

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _row_texts(indices: np.ndarray, seed: int) -> tuple[list[str], list[str]]:
    """Deterministic text + lang per global row index (vectorized-ish)."""
    texts, langs = [], []
    en = np.array(_EN_VOCAB)
    cs = np.array(_CS_VOCAB)
    # Zipf ranks for the English vocab
    ranks = np.arange(1, len(en) + 1, dtype=np.float64)
    probs_en = (1.0 / ranks) / (1.0 / ranks).sum()
    ranks_cs = np.arange(1, len(cs) + 1, dtype=np.float64)
    probs_cs = (1.0 / ranks_cs) / (1.0 / ranks_cs).sum()
    for i in indices:
        rng = np.random.default_rng(seed * 1_000_003 + int(i))
        is_cs = rng.random() < 0.1
        n_words = int(rng.integers(30, 120))
        if is_cs:
            words = rng.choice(cs, size=n_words, p=probs_cs)
            langs.append("cs")
        else:
            words = rng.choice(en, size=n_words, p=probs_en)
            langs.append("en")
        texts.append(" ".join(words.tolist()))
    return texts, langs


def generate_webtext(
    spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic webtext table of exactly n_rows rows."""
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 4)
    base = spark.range(0, n_rows, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            texts, langs = _row_texts(idx, seed)
            urls = [f"https://example{int(i) % 97}.com/page/{int(i)}" for i in idx]
            ts = [_EPOCH + dt.timedelta(seconds=int(i)) for i in idx]
            from infidex_spark.pipeline.html import wrap_html_text

            # rich page shape (head/title/style/script/comment + nested
            # tags); extraction is byte-identical to `text` (tested)
            html = [wrap_html_text(t).encode("utf-8") for t in texts]
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": [x.replace(tzinfo=None) for x in ts],
                    "html": html,
                    "text": texts,
                    "lang": langs,
                }
            )

    return base.mapInPandas(gen, schema=WEBTEXT_SCHEMA)


def with_doc_ids(df: DataFrame, order_col: str = "url") -> DataFrame:
    """Assign dense LONG doc_id = rank of order_col (deterministic).

    Distributed: range-partitioned sort + zipWithIndex over just the key
    column, then a join back — never a single-partition window. At 10^12
    rows this is two shuffles of the key column plus one of the data.
    """
    keys = df.select(order_col).sort(order_col)
    ids = keys.rdd.map(lambda r: r[0]).zipWithIndex().toDF([order_col, "doc_id"])
    return df.join(ids, order_col, "inner")


def webtext_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver-provided documents.parquet (doc_id, text, lang, ...)
    into the webtext shape, deterministically."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("https://docs.example.com/"), F.col("doc_id").cast("string")).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )
