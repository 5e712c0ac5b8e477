#!/usr/bin/env python3
"""Round-7 build-tail profiler: fresh 200k index (unslimmed doc_meta),
then standalone timings of the serial-tail jobs (pattern_scores with
sub-steps, sq_topk, sq_fuzzy) using the noop-sink methodology
(spark_optimization_guide §1.4). Writes _work/prof_r07.json."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "_work", "prof_idx_200k")


def main() -> None:
    from pyspark.sql import functions as F

    from infidex_spark.build.indexer import (
        _build_pattern_scores,
        _build_sq_fuzzy,
        _build_sq_topk,
        _write_pattern_store,
        build_index,
    )
    from infidex_spark.session import get_spark
    from infidex_spark.webtext import generate_webtext, with_doc_ids

    res: dict = {}
    spark = get_spark(app_name="prof-r07", cpus=32)
    docs = (
        with_doc_ids(generate_webtext(spark, 200_000, seed=42))
        .selectExpr("doc_id", "doc_id as doc_key", "text")
        .persist()
    )
    docs.count()

    build = "--skip-build" not in sys.argv
    if build:
        t0 = time.monotonic()
        m = build_index(
            spark, docs, OUT, n_buckets=32, salts=8,
            short_precompute=True, slim_doc_meta=False,
        )
        res["build_wall"] = round(time.monotonic() - t0, 2)
        res["step_secs"] = m["step_secs"]
        res["aux_step_secs"] = m["aux_step_secs"]
        res["aux_step_starts"] = m["aux_step_starts"]

    postings = os.path.join(OUT, "posting" + "s")

    # ---- pattern_scores sub-steps
    spark.sparkContext.setJobDescription("prof: pattern_scores")
    t0 = time.monotonic()
    _build_pattern_scores(spark, postings, OUT, write_store=False)
    res["pattern_scores_total"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    _write_pattern_store(OUT)
    res["pattern_store_write"] = round(time.monotonic() - t0, 2)

    # ---- sq_topk
    spark.sparkContext.setJobDescription("prof: sq_topk")
    t0 = time.monotonic()
    _build_sq_topk(spark, OUT, postings, (3,), 2)
    res["sq_topk_total"] = round(time.monotonic() - t0, 2)

    # ---- sq_fuzzy
    spark.sparkContext.setJobDescription("prof: sq_fuzzy")
    t0 = time.monotonic()
    _build_sq_fuzzy(spark, OUT)
    res["sq_fuzzy_total"] = round(time.monotonic() - t0, 2)

    with open(os.path.join(REPO, "_work", "prof_r07.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
