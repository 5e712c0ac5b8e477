#!/usr/bin/env python3
"""Capture .explain('formatted') before/after pairs for the second wave
of round-7 changes: the map-side-partial word/prefix list builds, the
map-side champions top-k, and the sq_topk fold's base-postings isin
pushdown. 'Before' plans are reconstructed from the prior dataflows
(pair-granular shuffle + streaming collector; join+window champions;
unfiltered base scan); 'after' plans come from the live helpers."""

from __future__ import annotations

import os
import sys
from contextlib import redirect_stdout
from typing import Iterator

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLANS = os.path.join(REPO, "plans", "r07")
IDX = os.path.join(REPO, "_work", "plans_idx_small")


def dump(df, name: str) -> None:
    os.makedirs(PLANS, exist_ok=True)
    with open(os.path.join(PLANS, name + ".txt"), "w") as f:
        with redirect_stdout(f):
            df.explain("formatted")
    print("wrote", name)


def main() -> None:
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from infidex_spark.build.indexer import (
        _champions_sidecar,
        _prefix_pairs_extract,
        _word_list_merge,
        _word_list_partial,
        _word_pairs_extract,
        build_index,
    )
    from infidex_spark.session import get_spark
    from infidex_spark.webtext import generate_webtext, with_doc_ids

    spark = get_spark(app_name="plans-r07b", cpus=8)
    docs = (
        with_doc_ids(generate_webtext(spark, 2000, seed=42))
        .selectExpr("doc_id", "doc_id as doc_key", "text")
        .repartition(8)
        .persist()
    )
    docs.count()
    if not os.path.isdir(os.path.join(IDX, "doc_meta")):
        build_index(spark, docs, IDX, n_buckets=8, salts=2, short_precompute=False)

    # ---- wm_words list build
    pairs = docs.select("doc_id", "text").mapInPandas(
        _word_pairs_extract(None), "doc_id long, word string"
    )
    w2 = pairs.filter(F.length("word") >= 2)
    bucket = F.pmod(F.crc32(F.encode("word", "utf-8")), F.lit(32)).cast("int")

    def passthrough(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from batches

    before = (
        w2.withColumn("bucket", bucket)
        .repartition(32, "bucket")
        .sortWithinPartitions("word", "doc_id")
        .mapInPandas(
            passthrough,
            "word string, doc_ids array<long>, n_docs long, bucket int",
        )
    )
    dump(before, "wm_words_lists_before")
    after = (
        w2.mapInPandas(
            _word_list_partial(32), "word string, doc_ids array<long>, bucket int"
        )
        .repartition(32, "bucket")
        .sortWithinPartitions("bucket", "word")
        .mapInPandas(
            _word_list_merge(1_250_000),
            "word string, doc_ids array<long>, n_docs long, bucket int",
        )
    )
    dump(after, "wm_words_lists_after")

    # ---- prefix lists
    ppairs = docs.select("doc_id", "text").mapInPandas(
        _prefix_pairs_extract(None),
        "prefix string, doc_id long, first_pos long, n_ws long, "
        "n_exact long, first_exact boolean",
    )
    counts = ppairs.groupBy("prefix").agg(F.count("*").alias("n_docs"))
    small = counts.filter(F.col("n_docs") <= 100_000).select("prefix")
    plists_before = (
        ppairs.select("prefix", "doc_id")
        .join(F.broadcast(small), "prefix", "left_semi")
        .repartition("prefix")
        .sortWithinPartitions("prefix", "doc_id")
        .mapInPandas(
            passthrough, "prefix string, n_docs long, doc_ids array<long>"
        )
    )
    dump(plists_before, "prefix_lists_pairshuffle_before")
    plists_after = (
        ppairs.select("prefix", "doc_id")
        .join(F.broadcast(small), "prefix", "left_semi")
        .mapInPandas(
            _word_list_partial(None, key="prefix"),
            "prefix string, doc_ids array<long>",
        )
        .repartition("prefix")
        .sortWithinPartitions("prefix")
        .mapInPandas(
            _word_list_merge(100_000, key="prefix", cap_is_null=True),
            "prefix string, n_docs long, doc_ids array<long>",
        )
    )
    dump(plists_after, "prefix_lists_pairshuffle_after")

    # ---- champions
    doc_meta = spark.read.parquet(os.path.join(IDX, "doc_meta"))
    scored_before = (
        ppairs.join(doc_meta, "doc_id")
        .join(docs.select("doc_id", "doc_key"), "doc_id")
        .withColumn(
            "precedence",
            F.lit(128)
            + F.when(F.col("first_pos") == 0, 64).otherwise(0)
            + F.when(
                (F.col("n_exact") > 0) | (F.col("n_tokens") <= 3), 32
            ).otherwise(0)
            + F.when(F.col("first_exact"), 16).otherwise(0)
            + F.when(F.col("tiny_text") == F.col("prefix"), 8).otherwise(0),
        )
        .withColumn(
            "base",
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    (F.lit(255) - F.least(F.col("first_pos") * 16, F.lit(240)))
                    + F.least(F.col("n_ws") * 8, F.lit(32)),
                ),
            ),
        )
        .withColumn(
            "sq_score", F.shiftleft(F.col("precedence"), 8) + F.col("base")
        )
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("sq_score"), F.asc("doc_key"))
    champs_before = (
        scored_before.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 64)
        .select("prefix", "doc_id", "doc_key", "sq_score", "rn")
    )
    dump(champs_before, "champions_before")
    side = _champions_sidecar(spark, docs, os.path.join(IDX, "doc_meta"))
    assert side is not None

    def local_topk_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from batches

    champs_after = (
        ppairs.mapInPandas(
            local_topk_stub,
            "prefix string, doc_id long, doc_key long, sq_score long",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 64)
        .select("prefix", "doc_id", "doc_key", "sq_score", "rn")
    )
    dump(champs_after, "champions_after")

    # ---- sq_topk fold base leg: isin pushdown reaching the scan
    posts = spark.read.parquet(os.path.join(IDX, "postings"))
    base_terms = [" qu", "qui", "fox"]
    base_map = F.broadcast(
        spark.createDataFrame(
            [(t, t[-2:]) for t in base_terms], "term string, q string"
        )
    )
    base_before = posts.join(base_map, "term").select(
        "q", "payload", "weights", "n_docs"
    )
    dump(base_before, "sq_topk_base_scan_before")
    base_after = (
        posts.filter(F.col("term").isin(base_terms))
        .join(base_map, "term")
        .select("q", "payload", "weights", "n_docs")
    )
    dump(base_after, "sq_topk_base_scan_after")

    spark.stop()


if __name__ == "__main__":
    main()
