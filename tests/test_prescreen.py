"""E1 lexical prescreen (Scoring/LexicalPrescreen.cs:18-87), behind the
existing enable_lexical_prescreen flag (default off, matching
CoverageSetup.cs:92). Kernel and Spark executor behave identically."""

import pytest

from infidex_spark.kernel.coverage.config import CoverageConfig
from infidex_spark.kernel.engine import FullSearch, KernelIndex

DOCS = [
    (1, "the shawshank redemption story"),
    (2, "shawshank prison drama"),
    (3, "shewshonk tale of hope"),  # fuzzy-only: no exact query word
    (4, "redemption of the city"),
    (5, "completely unrelated text about gardens"),
]


@pytest.fixture(scope="module")
def kidx():
    idx = KernelIndex()
    idx.index_documents(DOCS)
    return idx


def _stage1_keys(fs, q):
    return [k for k, _ in fs.index.search(q, fs.setup.coverage_depth)]


def test_prescreen_drops_docs_without_query_words(kidx):
    fs = FullSearch(kidx, CoverageConfig(enable_lexical_prescreen=True))
    s1 = kidx.search("shawshank", 500)
    filtered = fs._lexical_prescreen("shawshank", s1)
    keys = {k for k, _ in filtered}
    assert keys <= {1, 2}  # only docs containing the word survive
    assert 3 not in keys


def test_prescreen_skips_on_unknown_word(kidx):
    fs = FullSearch(kidx, CoverageConfig(enable_lexical_prescreen=True))
    s1 = kidx.search("shawshank", 500)
    # 'zzzqqq' is not a dictionary term -> possible typo -> pass-through
    assert fs._lexical_prescreen("shawshank zzzqqq", s1) == s1


def test_prescreen_never_empties(kidx):
    fs = FullSearch(kidx, CoverageConfig(enable_lexical_prescreen=True))
    s1 = [(5, 1.0)]  # candidate without the word
    assert fs._lexical_prescreen("shawshank", s1) == s1


def test_flag_off_is_default_and_prescreen_drops_fuzzy_tail(kidx):
    assert CoverageConfig().enable_lexical_prescreen is False
    on = FullSearch(kidx, CoverageConfig(enable_lexical_prescreen=True))
    off = FullSearch(kidx, CoverageConfig())
    res_on = on.search("shawshank", 5)
    res_off = off.search("shawshank", 5)
    # the exact-word hits rank identically; the fuzzy-only doc (3) is
    # exactly what the prescreen removes from the TF-IDF backbone
    assert [k for k, _, _ in res_on] == [2, 1]
    assert [k for k, _, _ in res_off] == [2, 1, 3]


def test_executor_prescreen_reingested_delta_doc_survives(spark, tmp_path):
    """A key re-ingested in a delta segment must survive the prescreen
    when only its NEWER segment's text contains the query word — the
    membership check covers every internal id of the key, not just the
    lowest (representative) one."""
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import MultiReader
    from infidex_spark.query.rerank import RerankExecutor
    from infidex_spark.streaming.incremental import append_delta

    out = str(tmp_path / "deltapres")
    docs = spark.createDataFrame(
        [(0, 1, "old text about gardens"), (1, 2, "shawshank prison drama")],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2)
    # re-ingest key 1: the new segment's text now contains the word
    append_delta(
        spark,
        spark.createDataFrame(
            [(1, "shawshank redemption remake")], "doc_key long, text string"
        ),
        out,
        batch_id=0,
        n_buckets=4,
        salts=2,
    )
    rr = RerankExecutor(
        MultiReader(out), CoverageConfig(enable_lexical_prescreen=True)
    )
    s1 = rr.stage1.search("shawshank", 500)
    assert 1 in {k for k, _ in s1}
    filtered = rr._lexical_prescreen("shawshank", s1)
    assert 1 in {k for k, _ in filtered}


def test_executor_prescreen_matches_kernel(spark, tmp_path):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader
    from infidex_spark.query.rerank import RerankExecutor

    out = str(tmp_path / "presidx")
    docs = spark.createDataFrame(
        [(i, key, text) for i, (key, text) in enumerate(DOCS)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2)
    kidx = KernelIndex()
    kidx.index_documents(DOCS)
    for flag in (False, True):
        cfg = CoverageConfig(enable_lexical_prescreen=flag)
        rr = RerankExecutor(IndexReader(out), cfg)
        fs = FullSearch(kidx, cfg)
        for q in ["shawshank", "redemption story", "shewshonk", "gardens"]:
            kern = [(k, pytest.approx(s, rel=1e-6)) for k, s, _ in fs.search(q, 5)]
            got = [(k, s) for k, s, _ in rr.search(q, 5)]
            assert got == kern, (flag, q)
