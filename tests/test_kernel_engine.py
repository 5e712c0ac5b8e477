import numpy as np
import pytest

from infidex_spark.kernel.bm25 import compute_idf
from infidex_spark.kernel.engine import KernelIndex, levenshtein_le1


def test_levenshtein_le1():
    assert levenshtein_le1("qick", "quick")  # insertion
    assert levenshtein_le1("quick", "qick")  # deletion
    assert levenshtein_le1("fux", "fox")  # substitution
    assert levenshtein_le1("fox", "fox")  # exact
    assert not levenshtein_le1("fax", "fox2x")
    assert not levenshtein_le1("abc", "cba")
    assert not levenshtein_le1("ab", "ba" + "x")
    # transposition counts as 2 in plain Levenshtein (Myers matcher)
    assert not levenshtein_le1("abcd", "abdc")


def test_idf_formula_float32():
    # ln((N - df + 0.5)/(df + 0.5) + 1) in float32
    got = compute_idf(10, 2)
    expect = np.float32(np.log(np.float32((10 - 2 + 0.5) / (2 + 0.5)) + np.float32(1.0)))
    assert got == pytest.approx(float(expect), abs=0)
    assert compute_idf(10, 0) == 0.0
    assert compute_idf(0, 5) == 0.0


def test_df_counts_documents_not_occurrences(kernel_index):
    # 'the' appears multiple times within docs; df must count docs.
    st = kernel_index.terms.get("the")
    assert st is not None
    # docs with word 'the' (len>=3): 1 (x2), 3, 5 (x2), 9, 10
    assert st.df == 5


def test_tf_is_occurrence_count(kernel_index):
    # 'the' is counted both as a 3-gram and as a whole word: doc 1
    # ("The ... the lazy dog") has 2 grams + 2 words = 4 occurrences.
    st = kernel_index.terms["the"]
    posting = dict(zip(st.doc_ids, st.weights))
    assert posting[0] == 4
    assert posting[2] == 2  # doc 3: 'the question' -> 1 gram + 1 word


def test_doc_lengths_positive(kernel_index):
    assert kernel_index.doc_lengths is not None
    assert (kernel_index.doc_lengths > 0).all()
    assert kernel_index.avgdl > 0


def test_batman_top1_is_doc6(kernel_index):
    res = kernel_index.search("batman", 10)
    assert res, "batman should match"
    assert res[0][0] == 6


def test_qick_fux_candidates_are_docs_5_and_1(kernel_index):
    res = kernel_index.search("qick fux", 10)
    assert {d for d, _ in res} == {1, 5}


def test_battamam_fuzzy_finds_batman(kernel_index):
    res = kernel_index.search("battamam", 10)
    # 'battamam' len 8: no LD1 match for the whole word, but grams
    # 'bat','att','tta' overlap doc 6.
    assert res and res[0][0] == 6


def test_exact_phrase_ranks_source_doc_first(kernel_index):
    res = kernel_index.search("gotham city", 10)
    assert res[0][0] == 6


def test_scores_descending_and_ties_by_key(kernel_index):
    res = kernel_index.search("quick fox", 10)
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
    for (k1, s1), (k2, s2) in zip(res, res[1:]):
        if s1 == s2:
            assert k1 < k2


def test_empty_and_unknown_queries(kernel_index):
    assert kernel_index.search("", 10) == []
    assert kernel_index.search("   ", 10) == []
    assert kernel_index.search("zzzzzzz", 10) == []


def test_diacritics_query_matches_folded_index():
    idx = KernelIndex()
    idx.index_documents([(1, "Mateřská škola Březnice"), (2, "Gymnázium Praha")])
    res = idx.search("materska skola", 10)
    assert res and res[0][0] == 1


def test_stop_term_limit_drops_postings():
    idx = KernelIndex(stop_term_limit=3)
    idx.index_documents(
        [(i, f"common word{i}") for i in range(1, 6)]
    )
    st = idx.terms["common"]
    assert st.df == -1
    # stale postings may remain (Term.cs:134-146 does not clear them) but
    # must be invisible: excluded from doc lengths and from scoring.
    dl_word_only = idx.doc_lengths[0]
    res = idx.search("common", 10)
    assert res == []  # stop term contributes nothing
    assert dl_word_only < 20  # 'common' grams/word not in dl


def test_k_limits_results(kernel_index):
    res = kernel_index.search("city", 1)
    assert len(res) == 1


def test_deterministic(kernel_index):
    a = kernel_index.search("quick brown fox", 10)
    b = kernel_index.search("quick brown fox", 10)
    assert a == b
