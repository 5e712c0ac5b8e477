#!/usr/bin/env python3
"""Capture .explain('formatted') for every dataflow the round-7
optimization touched, as before/after pairs under plans/r07/.

'Before' plans are reconstructed from the round-6 pipeline shapes
(token-table materialization + separate partial-encode stage, the
collect_list prefixes aggregation, the doc_meta-explode member lists,
the window-ranked pattern filter); 'after' plans come from the live
code. Declared contract queries are untouched this round — a sample of
their plans is captured once (same file serves as before and after)."""

from __future__ import annotations

import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLANS = os.path.join(REPO, "plans", "r07")
IDX = os.path.join(REPO, "_work", "prof_idx_200k")


def dump(df, name: str) -> None:
    os.makedirs(PLANS, exist_ok=True)
    with open(os.path.join(PLANS, name + ".txt"), "w") as f:
        with redirect_stdout(f):
            df.explain("formatted")
    print("wrote", name)


def main() -> None:
    import numpy as np  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from infidex_spark.build.indexer import (
        FUSED_SCHEMA,
        POINT_READ_WRITE_OPTS,  # noqa: F401
        POSTINGS_SCHEMA,
        _fused_tokenize_partials,
        _merge_partial_stream,
        _pattern_rank_local,
        _tf_cap,
    )
    from infidex_spark.build.tokenizer import tokenize_batch  # noqa: F401
    from infidex_spark.session import get_spark
    from infidex_spark.webtext import generate_webtext, with_doc_ids

    spark = get_spark(app_name="plans-r07", cpus=8)
    docs = (
        with_doc_ids(generate_webtext(spark, 2000, seed=42))
        .selectExpr("doc_id", "doc_id as doc_key", "text")
        .repartition(8)
        .persist()
    )
    docs.count()
    cap = _tf_cap(1.5)

    # ---- tokens -> postings chain
    from infidex_spark.build.indexer import tokenize_docs

    tokens_before = (
        tokenize_docs(docs, (3,), 2, None)
        .withColumn("tf", F.least(F.col("occ"), F.lit(cap)))
        .withColumn("dfc", F.col("occ") - F.col("tf") + F.lit(1))
    )
    dump(tokens_before, "tokens_table_before")
    fused = docs.select("doc_id", "text").mapInPandas(
        _fused_tokenize_partials((3,), 2, None, cap, None), schema=FUSED_SCHEMA
    )
    dump(fused, "tokens_fused_partials_after")

    bucket_expr = F.pmod(F.crc32(F.encode("term", "utf-8")), F.lit(32)).cast("int")
    partials = fused.filter(F.col("kind") == 0).select(
        "term", "df", "n_docs", "payload", "weights"
    )
    merge_after = (
        partials.repartition(8, bucket_expr, F.pmod(F.xxhash64("term"), F.lit(4)))
        .sortWithinPartitions(F.xxhash64("term"), "term")
        .mapInPandas(_merge_partial_stream(32), schema=POSTINGS_SCHEMA)
        .sortWithinPartitions("bucket", "term")
    )
    dump(merge_after, "postings_merge_after")

    # term_df before/after
    dump(tokens_before.groupBy("term").agg(F.sum("dfc").alias("df")), "term_df_before")
    dump(partials.groupBy("term").agg(F.sum("df").alias("df")), "term_df_after")

    # doc_stats before/after (fused dl sidecar vs token-table agg)
    dl_before = tokens_before.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dump(
        docs.select("doc_id", "doc_key").join(dl_before, "doc_id", "left").fillna({"dl": 0}),
        "doc_stats_before",
    )
    dl_after = (
        fused.filter(F.col("kind") == 1)
        .select(F.explode(F.arrays_zip("doc_ids", "dls")).alias("z"))
        .select(F.col("z.doc_ids").alias("doc_id"), F.col("z.dls").alias("dl"))
        .groupBy("doc_id")
        .agg(F.sum("dl").alias("dl"))
    )
    dump(
        docs.select("doc_id", "doc_key").join(dl_after, "doc_id", "left").fillna({"dl": 0}),
        "doc_stats_after",
    )

    # ---- prefixes lists before/after (pairs stand-in: (prefix, doc_id))
    pairs = docs.select(
        F.substring("text", 1, 2).alias("prefix"), "doc_id"
    )
    counts = pairs.groupBy("prefix").agg(F.count("*").alias("n_docs"))
    small = counts.filter(F.col("n_docs") <= 100_000).select("prefix")
    lists_before = (
        pairs.join(F.broadcast(small), "prefix", "left_semi")
        .groupBy("prefix")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
    )
    dump(counts.join(lists_before, "prefix", "left"), "prefix_lists_before")
    import pandas as pd

    def _collector(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"prefix": pdf["prefix"], "n_docs": 1, "doc_ids": [[0]] * len(pdf)}
            )

    lists_after = (
        pairs.join(F.broadcast(small), "prefix", "left_semi")
        .repartition("prefix")
        .sortWithinPartitions("prefix", "doc_id")
        .mapInPandas(_collector, "prefix string, n_docs long, doc_ids array<long>")
        .unionByName(
            counts.filter(F.col("n_docs") > 100_000).select(
                "prefix", "n_docs", F.lit(None).cast("array<long>").alias("doc_ids")
            )
        )
    )
    dump(lists_after, "prefix_lists_after")

    # ---- sq_topk member lists before/after (uses the 200k index tables)
    if os.path.isdir(os.path.join(IDX, "wm_words")):
        tok_map = F.broadcast(
            spark.createDataFrame([("th", "th"), ("a", "a b")], "w string, q string")
        )
        meta = spark.read.parquet(os.path.join(IDX, "doc_meta"))
        member_before = (
            meta.select(
                "doc_id", F.explode(F.split(F.col("words_text"), " ")).alias("w")
            )
            .filter(F.length("w").isin(1, 2))
            .join(tok_map, "w")
            .distinct()
            .groupBy("q", "w")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        )
        dump(member_before, "sq_topk_member_before")
        msrc = (
            spark.read.parquet(os.path.join(IDX, "sq_words1"))
            .select("word", "doc_ids", "n_docs")
            .unionByName(
                spark.read.parquet(os.path.join(IDX, "wm_words")).select(
                    "word", "doc_ids", "n_docs"
                )
            )
        )
        member_after = (
            msrc.filter(F.col("word").isin(["th", "a"]))
            .filter(F.size("doc_ids") == F.col("n_docs"))
            .withColumnRenamed("word", "w")
            .join(tok_map, "w")
        )
        dump(member_after, "sq_topk_member_after")

        # ---- pattern_scores rank filter before/after
        posts = spark.read.parquet(os.path.join(IDX, "postings"))
        p = (
            posts.select("term")
            .filter(F.length("term") >= 2)
            .withColumn("pattern", F.substring("term", 1, 2))
        )
        w = Window.partitionBy("pattern").orderBy("term")
        pats_before = (
            p.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 4096)
            .select("term", "pattern")
        )
        dump(
            posts.select("term", "payload", "weights", "n_docs").join(
                pats_before, "term"
            ),
            "pattern_scores_join_before",
        )
        pats_after = _pattern_rank_local(os.path.join(IDX, "postings"), 4096, spark)
        dump(
            posts.select("term", "payload", "weights", "n_docs").join(
                F.broadcast(pats_after), "term"
            ),
            "pattern_scores_join_after",
        )

    # ---- a sample of the (untouched) declared queries, for the record
    from infidex_spark.contract import QUERIES

    sf = "/root/testdata/sf0.01"
    for name in ("bm25_word_topk", "word_df", "dedup_exact", "events_window_agg"):
        dump(QUERIES[name](spark, sf), f"contract_{name}_unchanged")
    spark.stop()


if __name__ == "__main__":
    main()
