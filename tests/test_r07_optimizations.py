"""Round-7 optimization internals: every fast path must be bit-identical
to the path it replaces (dense lookup vs searchsorted, dense doc_lengths,
variant/fuzzy caches, driver-side pattern ranking vs the window plan,
strict-sortedness gating of the dense accumulator, reader close())."""

import numpy as np
import pytest

from infidex_spark.query.executor import (
    TermPostings,
    aggregate_weighted_postings,
)


def _mk_tp(ids: np.ndarray) -> TermPostings:
    return TermPostings(
        term="t",
        df=ids.size,
        doc_ids=ids.astype(np.int64),
        tfs=(np.arange(ids.size) % 7 + 1).astype(np.float32),
    )


def _searchsorted_ref(tp: TermPostings, docs: np.ndarray):
    ids, tfs = tp.doc_ids, tp.tfs
    pos = np.searchsorted(ids, docs)
    pos_c = np.clip(pos, 0, ids.size - 1)
    hit = ids[pos_c] == docs
    return hit, tfs[pos_c[hit]]


def test_dense_lookup_matches_searchsorted():
    rng = np.random.default_rng(7)
    # dense list over a modest range -> crosses the posmap gate
    ids = np.sort(rng.choice(40_000, 20_000, replace=False)).astype(np.int64)
    tp = _mk_tp(ids)
    docs = np.sort(rng.choice(45_000, 5_000, replace=False)).astype(np.int64)
    hit, tf = tp.lookup(docs)
    hit_ref, tf_ref = _searchsorted_ref(tp, docs)
    assert np.array_equal(hit, hit_ref)
    assert np.array_equal(tf, tf_ref)
    # probes entirely outside the id range
    lo = np.arange(0, 100, dtype=np.int64)  # below base is impossible here
    hi = np.arange(50_000, 53_000, dtype=np.int64)
    for probe in (lo, hi, np.concatenate([lo, ids[:3000], hi])):
        probe = np.sort(probe)
        h, t = tp.lookup(probe)
        h2, t2 = _searchsorted_ref(tp, probe)
        assert np.array_equal(h, h2) and np.array_equal(t, t2)


def test_sparse_term_keeps_searchsorted_path():
    # density below the 1/8 gate: result must still be correct
    ids = np.sort(
        np.random.default_rng(1).choice(10_000_000, 30_000, replace=False)
    ).astype(np.int64)
    tp = _mk_tp(ids)
    docs = np.sort(
        np.random.default_rng(2).choice(10_000_000, 10_000, replace=False)
    ).astype(np.int64)
    hit, tf = tp.lookup(docs)
    h2, t2 = _searchsorted_ref(tp, docs)
    assert np.array_equal(hit, h2) and np.array_equal(tf, t2)


def test_dense_accumulator_duplicates_fall_to_sparse():
    # duplicate-bearing ids must SUM (bincount semantics), not drop —
    # the strict-ascent gate reroutes them off the fancy-index path
    ids = np.array([1, 1, 2, 5], dtype=np.int64)
    w = np.array([2.0, 3.0, 1.0, 4.0])
    uids, scores = aggregate_weighted_postings(
        [ids], [(w, 10.0)], total_docs=8
    )
    assert uids.tolist() == [1, 2, 5]
    assert scores.tolist() == [50.0, 10.0, 40.0]


def test_variant_and_fuzzy_caches(tmp_path, spark, reference_docs):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader, QueryExecutor

    out = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, key, text) for i, (key, text) in enumerate(reference_docs)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2)
    r = IndexReader(out)
    ex = QueryExecutor(r)
    first = ex.search("qick fux", 5)
    v1 = r.fetch_variant_terms("qick")
    v1.append("poison")  # caller mutation must not leak into the cache
    v2 = r.fetch_variant_terms("qick")
    assert "poison" not in v2
    assert ex.search("qick fux", 5) == first
    # close() releases prewarm state; queries still work (lazy reload)
    r.prewarm_postings_meta()
    r.close()
    assert ex.search("qick fux", 5) == first
    assert ex.search("batman", 3) == ex.search("batman", 3)


def test_pattern_rank_local_matches_window(tmp_path, spark, reference_docs):
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from infidex_spark.build.indexer import _pattern_rank_local, build_index
    from infidex_spark.kernel.tokenize import DELIMITERS, START_PAD

    out = str(tmp_path / "idx2")
    docs = spark.createDataFrame(
        [(i, key, text) for i, (key, text) in enumerate(reference_docs)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2, aux=False)
    pp = os.path.join(out, "postings")
    # tiny cap_terms exercises the rank cutoff
    local = {
        tuple(r)
        for r in _pattern_rank_local(pp, 3, spark).toPandas().values
    }
    posts = spark.read.parquet(pp)
    pats = None
    for plen in (2, 3):
        p = (
            posts.select("term")
            .filter(F.length("term") >= plen)
            .withColumn("pattern", F.substring("term", 1, plen))
        )
        w = Window.partitionBy("pattern").orderBy("term")
        p = p.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
        if plen == 3:
            delim_class = "[" + "".join(
                "\\" + c if c in "\\^]-[" else c for c in DELIMITERS
            ) + "]"
            reachable = F.col("pattern").startswith(START_PAD) | F.col(
                "pattern"
            ).rlike(delim_class)
            p = p.filter(
                reachable
                & ((F.length("term") > plen) | F.col("pattern").startswith(START_PAD))
            )
        p = p.select("term", "pattern")
        pats = p if pats is None else pats.unionByName(p)
    window = {tuple(r) for r in pats.toPandas().values}
    assert local == window and len(local) > 0


def test_doc_lengths_dense_bounds(tmp_path, spark, reference_docs):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader

    out = str(tmp_path / "idx3")
    docs = spark.createDataFrame(
        [(i, key, text) for i, (key, text) in enumerate(reference_docs)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2, aux=False)
    r = IndexReader(out)
    assert r._dl_dense  # build ids are dense by contract
    dl, keys = r.doc_lengths(np.array([0, 3, 9], dtype=np.int64))
    assert keys.tolist() == [1, 4, 10]
    with pytest.raises(KeyError):
        r.doc_lengths(np.array([0, 99], dtype=np.int64))
