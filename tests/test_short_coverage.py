"""allowShortQueryCoverage (SearchPipeline.cs:110-160): a 1-3 char
delimiter-free query whose stage-1 found fewer than maxResults runs the
coverage stage when the prefix matches 1..500 docs."""

import pytest

from infidex_spark.kernel.engine import FullSearch, KernelIndex

# tiny corpus: 'zx' matches exactly 2 docs -> stage-1 < k=10 and the
# coverage/fusion rerank kicks in (doc cap 500 satisfied)
DOCS = [
    (1, "zx spectrum computer"),
    (2, "the zx81 home micro"),
    (3, "modern laptops are fast"),
    (4, "vintage hardware collection"),
]


@pytest.fixture(scope="module")
def kidx():
    idx = KernelIndex()
    idx.index_documents(DOCS)
    return idx


def test_short_query_coverage_runs_under_cap(kidx):
    fs = FullSearch(kidx)
    res = fs.search("zx", 10)
    keys = [k for k, _, _ in res]
    assert 1 in keys and 2 in keys
    # coverage precedence: the exact whole-word 'zx' (doc 1) outranks the
    # prefix-only match inside 'zx81' (doc 2)
    assert keys.index(1) < keys.index(2)
    # fusion-scale scores prove the coverage stage ran (short-path scores
    # are precedence+norm <= ~16)
    assert res[0][1] > 1000


def test_short_query_no_coverage_when_satisfied(kidx):
    # k=1: stage-1 already returns >= k results -> early return with the
    # short-path score scale
    fs = FullSearch(kidx)
    res = fs.search("zx", 1)
    assert len(res) == 1
    assert res[0][1] < 100


def test_executor_matches_kernel_on_short_coverage(spark, tmp_path, kidx):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader
    from infidex_spark.query.rerank import RerankExecutor

    out = str(tmp_path / "scidx")
    docs = spark.createDataFrame(
        [(i, key, text) for i, (key, text) in enumerate(DOCS)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2)
    rr = RerankExecutor(IndexReader(out))
    fs = FullSearch(kidx)
    for q, kk in [("zx", 10), ("zx", 1), ("vi", 10), ("mo", 5)]:
        kern = [(key, pytest.approx(s, rel=1e-6), t) for key, s, t in fs.search(q, kk)]
        assert [(key, s, t) for key, s, t in rr.search(q, kk)] == kern, (q, kk)
