#!/usr/bin/env python3
"""Benchmark: index-build throughput + query latency, one JSON line out.

Workload (deterministic, seeded):
1. generate synthetic Common-Crawl-style webtext (row count scales with
   the sf of $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1);
2. build the full inverted index (tokenize -> postings/doc_stats/
   prefixes/variants) on local[$SPARK_GRAFT_CPUS];
3. run the reference-style query set (exact / typo / split+typo /
   multi-term / type-ahead) through the driver-side executor, 20
   repetitions each, and report p50 latency.

Output: ONE JSON line
  {"metric": ..., "value": <build wall sec>, "unit": "sec",
   "queries": {name: p50_sec}, "sf": ..., ...extras}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# reference-style query set (FIXTURES.md §5) over the webtext vocabulary
QUERIES = {
    "exact_single": "shawshank",
    "typo": "shaaawshank",
    "split_typo": "shaa awshank",
    "multi_term": "redemption shank",
    "type_ahead": "redemption sh",
    "flagship": "quick fox",
    "golden_1": "batman",
    "golden_2": "qick fux",
    "hot_terms": "the of and",
    "diacritics": "zlutoucky kun",
}


def host_mem_canary() -> dict:
    """~1 s probe of the host's memory subsystem, reported alongside every
    latency number: this VM's neighbors swing the memory pipe by 5-13x on
    a tens-of-minutes timescale (BASELINE.md round-6 scaling section), and
    first-touch page faults have been observed at ~170 us/page — any cold
    latency measured in such a phase is host, not code. stream_mbps reads
    an already-faulted 64 MB buffer (bandwidth); alloc_touch_mbps writes a
    FRESH 64 MB allocation (fault path). Healthy host: both in the
    thousands. Degraded phase: alloc_touch collapses first."""
    import numpy as np

    buf = np.ones(8 << 20, dtype=np.float64)  # 64 MB, faulted by ones()
    float(buf.sum())  # ensure faulted before the timed read
    t0 = time.monotonic()
    float(buf.sum())  # pure read pass, no output allocation
    stream = 64 / max(time.monotonic() - t0, 1e-9)
    t0 = time.monotonic()
    fresh = np.empty(8 << 20, dtype=np.float64)
    fresh[::512] = 1.0  # touch every 4 KB page once
    alloc = 64 / max(time.monotonic() - t0, 1e-9)
    return {
        "stream_mbps": round(stream, 0),
        "alloc_touch_mbps": round(alloc, 0),
    }


def main() -> None:
    # stdout must be EXACTLY one JSON line (the driver json-parses it),
    # but the Spark JVM inherits fd 1 and writes progress bars/log lines
    # there. Keep the real stdout aside and point fd 1 at stderr before
    # the JVM starts; only the final result line uses the saved fd.
    result_fd = os.dup(1)
    os.dup2(2, 1)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = 0.1
    for part in sf_dir.rstrip("/").split("/"):
        if part.startswith("sf"):
            try:
                sf = float(part[2:])
            except ValueError:
                pass
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(max(2000, int(200_000 * sf)))))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "20"))
    out_dir = os.path.join(REPO, "_work", f"bench_index_{n_docs}")

    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader, QueryExecutor
    from infidex_spark.session import get_spark
    from infidex_spark.webtext import generate_webtext, with_doc_ids

    loadavg_start = os.getloadavg()
    canary_start = host_mem_canary()
    spark = get_spark(app_name="infidex-bench", cpus=cpus)
    wt = generate_webtext(spark, n_docs, seed=42)
    docs = with_doc_ids(wt).selectExpr("doc_id", "doc_id as doc_key", "text").persist()
    docs.count()  # materialize input outside the measured window

    # headline build wall: repeated so one co-tenant storm cannot fake a
    # regression (VERDICT r4 'what's wrong' #4); min + all reps reported
    build_reps = int(os.environ.get("SPARK_GRAFT_BENCH_BUILD_REPS", "2"))
    build_walls = []
    for _ in range(max(1, build_reps)):
        t0 = time.monotonic()
        manifest = build_index(spark, docs, out_dir, n_buckets=32, salts=8)
        build_walls.append(round(time.monotonic() - t0, 2))
    build_sec = min(build_walls)

    # second build WITH the short-query precompute (pattern_scores +
    # sq_topk champions + char_terms), so the precompute's true cost is
    # tracked per round (VERDICT r3 #6) and the query measurements below
    # run against the full production table set
    t0 = time.monotonic()
    manifest = build_index(
        spark, docs, out_dir, n_buckets=32, salts=8, short_precompute=True
    )
    build_precompute_sec = round(time.monotonic() - t0, 2)

    ex = QueryExecutor(IndexReader(out_dir))
    q_p50: dict[str, float] = {}
    lat_all: list[float] = []
    for name, text in QUERIES.items():
        ex.search(text, 10)  # warm (dataset metadata, stop set)
        times = []
        for _ in range(reps):
            t = time.monotonic()
            ex.search(text, 10)
            times.append(time.monotonic() - t)
        q_p50[name] = round(statistics.median(times), 5)
        lat_all.extend(times)

    # full-pipeline (coverage/fusion rerank) latency on the same index
    from infidex_spark.query.rerank import RerankExecutor

    rr = RerankExecutor(IndexReader(out_dir))
    rr_p50: dict[str, float] = {}
    rr_cold: dict[str, float] = {}
    for name, text in [("typo", QUERIES["typo"]), ("multi_term", QUERIES["multi_term"]), ("flagship", QUERIES["flagship"])]:
        t = time.monotonic()
        rr.search(text, 10)  # first evaluation: caches cold
        rr_cold[name] = round(time.monotonic() - t, 5)
        times = []
        for _ in range(max(5, reps // 2)):
            t = time.monotonic()
            rr.search(text, 10)
            times.append(time.monotonic() - t)
        rr_p50[name] = round(statistics.median(times), 5)

    # short-query (D10) first evaluations — measured on fresh executors
    # (the short-result cache makes warm repeats ~0 ms)
    sq_cold: dict[str, float] = {}
    sq_reader = IndexReader(out_dir)
    sq_reader.sq_meta()  # one-time column-cache load, reported separately
    t = time.monotonic()
    sq_reader._open_ps_store()
    sq_reader.sq_topk("\x00warm\x00")  # one-time champion-table load
    sq_open = round(time.monotonic() - t, 5)
    sq_ex = QueryExecutor(sq_reader)
    # includes the classes that were the r3 worst cases: hot single-token
    # ('fo', 'th', 'an'), two-token ('a b'), sparse fuzzy ('qz', 'xq')
    for text in ["fo", "ba", "tw", "a b", "qz", "th", "an", "xq"]:
        t = time.monotonic()
        sq_ex.search(text, 10)
        sq_cold[text] = round(time.monotonic() - t, 5)

    # multi-field build: same docs split into (title, body) columns —
    # the vectorized fields tokenizer should stay within ~1.5x of the
    # single-field build (VERDICT r2 #1 'done' criterion)
    from pyspark.sql import functions as F

    fdocs = docs.select(
        "doc_id", "doc_key",
        F.substring("text", 1, 40).alias("title"),
        F.expr("substring(text, 41)").alias("body"),
    ).persist()
    fdocs.count()
    t = time.monotonic()
    build_index(
        spark, fdocs, out_dir + "_fields", n_buckets=32, salts=8,
        fields=[("title", 0), ("body", 1)], aux=False,
    )
    fields_build_sec = round(time.monotonic() - t, 2)
    # aux=False builds only the BM25 core; compare against a matching
    # single-field core build for an apples-to-apples tokenizer ratio
    t = time.monotonic()
    build_index(spark, docs, out_dir + "_core", n_buckets=32, salts=8, aux=False)
    core_build_sec = round(time.monotonic() - t, 2)

    extras = {
        "build_wall_reps": build_walls,
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "host_mem_canary_start": canary_start,
        "host_mem_canary_end": host_mem_canary(),
        "build_precompute_sec": build_precompute_sec,
        "rerank_p50_sec": rr_p50,
        "rerank_cold_sec": rr_cold,
        "short_query_cold_sec": sq_cold,
        "short_query_store_open_sec": sq_open,
        "fields_core_build_sec": fields_build_sec,
        "singlefield_core_build_sec": core_build_sec,
        "index_bytes_total": manifest.get("index_bytes_total", 0),
        "table_bytes": manifest.get("table_bytes", {}),
    }
    scaling_path = os.path.join(REPO, "SCALING.json")
    if os.path.exists(scaling_path):
        try:
            with open(scaling_path) as f:
                extras["scaling"] = json.load(f)
        except Exception:
            pass

    result = {
        "metric": "index-build wall sec, synthetic webtext (query p50s in 'queries')",
        "value": round(build_sec, 2),
        "unit": "sec",
        "queries": q_p50,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / build_sec, 1),
        "query_p50_sec_overall": round(statistics.median(lat_all), 5),
        "build_step_secs": manifest.get("step_secs", {}),
        "index_terms_sample": manifest.get("n_stop_terms", 0),
        "cpus": cpus,
        **extras,
    }
    spark.stop()
    os.write(result_fd, (json.dumps(result) + "\n").encode())


if __name__ == "__main__":
    main()
