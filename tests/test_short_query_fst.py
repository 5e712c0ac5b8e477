"""D10 — multi-char non-ngram queries through the FST-expansion short
query processor (ShortQueryProcessor.SearchShortQuery port). Adversarial
2-char / all-short-word golden set: executor (sorted term_dict prefix
scans over the Spark index) must equal the kernel exactly, and the
reference's prefix-ordering behaviors must hold."""

import pytest

from infidex_spark.kernel.engine import (
    KernelIndex,
    build_prefix_patterns,
    short_query_precedence,
)
from infidex_spark.kernel.tokenize import START_PAD

# built to exercise every precedence bit: exact-title, first-word-exact,
# word-boundary matches, prefix-only, fuzzy-fallback-only
DOCS = [
    (1, "fo"),                       # title == query
    (2, "fo sho"),                   # first word exact
    (3, "fox trot alpha"),           # title starts with query
    (4, "go fo broke"),              # any word exact, not first
    (5, "info about forests"),       # contains 'fo' inside words only
    (6, "two foxes fighting"),       # multi-word with fo-prefix word
    (7, "to be or not to be"),
    (8, "be to that is the question"),
    (9, "tw fo abbreviation"),       # both short tokens exactly present
    (10, "twelve forty"),            # both tokens as prefixes only
]

QUERIES = ["fo", "tw", "to", "tw fo", "to be", "zz", "qx", "ab"]


@pytest.fixture(scope="module")
def kidx():
    idx = KernelIndex()
    idx.index_documents(DOCS)
    return idx


def test_prefix_patterns_shape():
    pats = build_prefix_patterns("fo", 3, 2)
    assert pats == [START_PAD * 2 + "f", START_PAD + "fo", "fo", " fo"]
    pats2 = build_prefix_patterns("to be", 3, 2)
    assert pats2 == [START_PAD * 2 + "t", START_PAD + "to", "to ", " to be"]


def test_precedence_bits():
    # single token: exact(1) | startswith(2) | first-exact(4) | title-eq(8)
    assert short_query_precedence(["fo"], ["fo"], "fo", "fo", True) == 15
    assert short_query_precedence(["fo"], ["fo", "sho"], "fo", "fo sho", True) == 7
    assert short_query_precedence(["fo"], ["fox", "trot"], "fo", "fox trot", True) == 2
    assert short_query_precedence(["fo"], ["go", "fo"], "fo", "go fo", False) == 1
    # multi token: all-present(8) + short-title(2), else partial(4)
    assert short_query_precedence(["tw", "fo"], ["tw", "fo", "x"], "tw fo", "t", False) == 10
    assert short_query_precedence(["tw", "fo"], ["tw", "a", "b", "c"], "tw fo", "t", False) == 4


def test_kernel_ordering_invariants(kidx):
    res = {k: s for k, s in kidx.search("fo", 10)}
    # title == query outranks everything
    order = [k for k, _ in kidx.search("fo", 10)]
    assert order[0] == 1
    # first-word-exact beats prefix-only beats mid-word-only
    assert res[2] > res[3] > res[4]
    # docs whose title starts with the query outrank same-score non-prefix
    assert res[3] > res[5]


def test_executor_matches_kernel_exactly(spark, tmp_path, kidx):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader, QueryExecutor

    out = str(tmp_path / "sqidx")
    docs = spark.createDataFrame(
        [(i, key, text) for i, (key, text) in enumerate(DOCS)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2)
    ex = QueryExecutor(IndexReader(out))
    for q in QUERIES:
        kern = kidx.search(q, 10)
        got = ex.search(q, 10)
        assert [k for k, _ in got] == [k for k, _ in kern], q
        for (gk, gs), (kk, ks) in zip(got, kern):
            assert gs == pytest.approx(ks, rel=1e-6), (q, gk)


def test_fast_and_legacy_short_paths_identical(spark, tmp_path):
    """The precomputed fast path (pattern_scores aggregates + sq_meta /
    word-postings precedence) must be BIT-identical to the live path
    (term_dict expansion + doc_meta point fetches) on every query shape:
    pure 2-char, multi-word, fuzzy-fallback-only."""
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader, QueryExecutor

    out = str(tmp_path / "sqfast")
    docs = spark.createDataFrame(
        [(i, key, text) for i, (key, text) in enumerate(DOCS)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2, short_precompute=True)
    fast = QueryExecutor(IndexReader(out))
    legacy_r = IndexReader(out)
    legacy_r._pattern_scores = None  # disable precomputed aggregates
    legacy_r._sq_words1 = None  # disable fast precedence
    legacy_r._sq_meta = {}  # sq_meta() -> None
    legacy = QueryExecutor(legacy_r)
    assert IndexReader(out)._pattern_scores is not None, "table not built"
    for q in QUERIES + ["f.", "o f"]:
        assert fast.search(q, 10) == legacy.search(q, 10), q


def test_stop_demoted_terms_parity(spark, tmp_path):
    """With a tiny stop_term_limit several grams cross it; demoted terms
    must be excluded from the short-query dictionary walk identically in
    the kernel and the executor (the reference's pre-demotion partial
    postings are ingestion-order state a distributed build cannot
    reproduce — documented delta in KernelIndex._search_short_query)."""
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader, QueryExecutor

    limit = 3  # 'fo'-prefixed grams appear in far more than 3 docs
    stop_docs = DOCS + [
        (11, "fort fond ford"),
        (12, "foam focus fog"),
        (13, "folly fora form"),
    ]
    kidx = KernelIndex(stop_term_limit=limit)
    kidx.index_documents(stop_docs)
    assert any(
        st.df == -1 for t, st in kidx.terms.items() if t.startswith("fo")
    ), "expected at least one demoted fo-gram"
    out = str(tmp_path / "sqstop")
    docs = spark.createDataFrame(
        [(i, key, text) for i, (key, text) in enumerate(stop_docs)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2, stop_term_limit=limit)
    ex = QueryExecutor(IndexReader(out))
    for q in ["fo", "tw", "qx", "fo tw"]:
        kern = kidx.search(q, 10)
        got = ex.search(q, 10)
        assert [k for k, _ in got] == [k for k, _ in kern], q
        for (gk, gs), (kk, ks) in zip(got, kern):
            assert gs == pytest.approx(ks, rel=1e-6), (q, gk)


def test_fuzzy_fallback_fires_on_rare_chars(kidx):
    # 'zz' matches no prefix pattern term; the whole-dictionary fallback
    # must still surface docs containing the characters
    res = kidx.search("zz", 10)
    assert res == [] or all(s < 2 for _, s in res)
    # 'qx': q appears in 'question' -> fallback contains-match
    res2 = kidx.search("qx", 10)
    assert any(k == 8 for k, _ in res2)
