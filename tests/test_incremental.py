"""Incremental indexing: delta segments, multi-segment query, tombstones,
compaction, and streaming ingest via foreachBatch."""

import os

import pytest

from infidex_spark.build.indexer import build_index
from infidex_spark.kernel.engine import KernelIndex
from infidex_spark.query.executor import IndexReader, MultiReader, QueryExecutor
from infidex_spark.streaming.incremental import (
    append_delta,
    delete_docs,
    merge_segments,
    next_doc_id,
    stream_ingest,
)

BATCH1 = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "A journey of a thousand miles begins with a single step"),
    (3, "To be or not to be, that is the question"),
    (4, "All that glitters is not gold"),
    (5, "The fox was quick and clever in the forest"),
]
BATCH2 = [
    (6, "Batman and Robin fight crime in Gotham City"),
    (7, "Superman flies faster than a speeding bullet"),
    (8, "Spider-Man swings through New York City"),
    (9, "Wonder Woman protects the innocent"),
    (10, "The Flash runs at incredible speeds"),
]

QUERIES = ["batman", "quick fox", "qick fux", "city", "the"]


@pytest.fixture(scope="module")
def incremental_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("inc") / "idx")
    df1 = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(BATCH1)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, df1, out, n_buckets=4)
    assert next_doc_id(out) == 5
    df2 = spark.createDataFrame(BATCH2, "doc_key long, text string")
    append_delta(spark, df2, out, batch_id=1, n_buckets=4)
    assert next_doc_id(out) == 10
    return out


def _kernel_all():
    idx = KernelIndex()
    idx.index_documents(BATCH1 + BATCH2)
    return idx


@pytest.mark.parametrize("query", QUERIES)
def test_multi_segment_matches_single_kernel(incremental_index, query):
    """Main+delta must rank like one kernel index over all docs, modulo
    global-df semantics (identical here: doc sets are disjoint)."""
    ex = QueryExecutor(MultiReader(incremental_index))
    got = ex.search(query, 10)
    want = _kernel_all().search(query, 10)
    assert [d for d, _ in got] == [d for d, _ in want], (query, got, want)


def test_multireader_merge_preserves_lazy_decode(incremental_index):
    """fetch_terms over main+delta returns a composite whose per-segment
    parts stay ENCODED: a small lookup block-decodes only what it
    touches instead of forcing a full decode at merge time, and the
    composite's results equal the eagerly merged arrays."""
    import numpy as np

    mr = MultiReader(incremental_index)
    # 'the' appears in both batches -> composite over two segments
    tp = mr.fetch_terms(["the"])["the"]
    from infidex_spark.query.executor import CompositeTermPostings

    assert isinstance(tp, CompositeTermPostings)
    assert all(not p.is_decoded for p in tp.parts), "parts decoded eagerly"
    probe = np.array([0, 7], dtype=np.int64)  # one id per segment
    hit, tf = tp.lookup(probe)
    # the composite never concatenates at merge/lookup time (parts may
    # still choose a full decode adaptively when probes touch most of
    # their tiny block set — that is per-part policy, not merge cost)
    assert tp._doc_ids is None, "lookup materialized the merged arrays"
    # equivalence with the full decode
    ids, tfs = tp.doc_ids, tp.tfs
    assert np.all(np.diff(ids) > 0)  # disjoint ascending segment ranges
    exp_hit = np.isin(probe, ids)
    assert hit.tolist() == exp_hit.tolist()
    pos = np.searchsorted(ids, probe[exp_hit])
    assert tf.tolist() == tfs[pos].tolist()
    assert tp.df == sum(p.df for p in tp.parts)
    assert tp.block_last_doc.size == sum(p.block_last_doc.size for p in tp.parts)


def test_tombstones_hide_docs(incremental_index):
    ex = QueryExecutor(MultiReader(incremental_index))
    assert ex.search("batman", 10)[0][0] == 6
    delete_docs(incremental_index, [6])
    ex2 = QueryExecutor(MultiReader(incremental_index))
    res = ex2.search("batman", 10)
    assert all(d != 6 for d, _ in res)
    delete_docs(incremental_index, [])  # idempotent append keeps 6 deleted
    assert 6 in QueryExecutor(MultiReader(incremental_index)).r.tombstones


def test_merge_segments_compacts(incremental_index, spark, tmp_path):
    out = str(tmp_path / "merged")
    source = spark.createDataFrame(BATCH1 + BATCH2, "doc_key long, text string")
    merge_segments(spark, incremental_index, out, docs_source=source, n_buckets=4)
    ex = QueryExecutor(IndexReader(out))
    # doc 6 was tombstoned above -> gone after compaction
    res = ex.search("batman", 10)
    assert all(d != 6 for d, _ in res)
    # everything else still matches the kernel built without doc 6
    k = KernelIndex()
    k.index_documents([(d, t) for d, t in BATCH1 + BATCH2 if d != 6])
    for q in QUERIES:
        got = [d for d, _ in ex.search(q, 10)]
        want = [d for d, _ in k.search(q, 10)]
        assert got == want, q


def test_stream_ingest(spark, tmp_path):
    out = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")
    src_dir = str(tmp_path / "src")
    df1 = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(BATCH1)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, df1, out, n_buckets=4)
    spark.createDataFrame(BATCH2, "doc_key long, text string").write.parquet(src_dir)
    stream = spark.readStream.schema("doc_key long, text string").parquet(src_dir)
    q = stream_ingest(spark, stream, out, ckpt, n_buckets=4)
    q.awaitTermination(120)
    ex = QueryExecutor(MultiReader(out))
    want = _kernel_all().search("batman", 10)
    got = ex.search("batman", 10)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_batch_search_matches_executor(spark, incremental_index):
    """Distributed batch mode must agree with the driver executor on docs
    the executor returns (batch scores the full disjunction, a superset)."""
    from infidex_spark.query.batch import batch_search

    reader = IndexReader(incremental_index)  # main segment only
    ex = QueryExecutor(reader)
    queries = [(0, "quick fox", 5), (1, "journey miles", 5), (2, "glitters", 5)]
    out = batch_search(spark, reader, queries).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.doc_key, r.score))
    for qid, text, k in queries:
        single = ex.search(text, k)
        batch = by_q.get(qid, [])
        # executor candidates are a subset: every executor hit must appear
        # in batch mode with the same score and relative order
        batch_rank = {d: i for i, (d, _) in enumerate(batch)}
        batch_score = dict(batch)
        prev = -1
        for d, s in single:
            assert d in batch_rank, (qid, d, batch)
            assert batch_score[d] == pytest.approx(s, rel=1e-5)
            assert batch_rank[d] > prev
            prev = batch_rank[d]


def test_rerank_over_multireader(spark, tmp_path):
    """The full coverage/fusion rerank runs over main+delta segments and
    matches a single kernel index over all docs (rank + scores)."""
    from infidex_spark.kernel.engine import FullSearch
    from infidex_spark.query.rerank import RerankExecutor
    from infidex_spark.streaming.incremental import delete_docs

    out = str(tmp_path / "rr_idx")
    df1 = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(BATCH1)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, df1, out, n_buckets=4)
    df2 = spark.createDataFrame(BATCH2, "doc_key long, text string")
    append_delta(spark, df2, out, batch_id=1, n_buckets=4)

    rr = RerankExecutor(MultiReader(out))
    fs = FullSearch(_kernel_all())
    for q in ["batman", "quick fox", "qick fux", "speedng bullet", "wonder woman"]:
        kern = fs.search(q, 5)
        got = rr.search(q, 5)
        assert [k for k, _, _ in got] == [k for k, _, _ in kern], q
        for (gk, gs, gt), (kk, ks, kt) in zip(got, kern):
            assert gs == pytest.approx(ks, rel=1e-6) and gt == kt, (q, gk)

    # soft deletes: tombstoned docs never surface through the rerank
    delete_docs(out, [6])
    rr2 = RerankExecutor(MultiReader(out))
    keys = [k for k, _, _ in rr2.search("batman", 5)]
    assert 6 not in keys
