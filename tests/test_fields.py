"""Multi-field weighted documents (reference: DocumentFields.cs:124 '§'
concatenation + boundary markers, VectorModel.cs:96-128 per-token field
weight, ConfigurationParameters.DefaultFieldWeights [1.5, 1.25, 1.0]).

Covers: the boundary/weight helpers, the kernel fields index, the movie
fixture behaviors the reference test suite locks in
(MovieSearchParityTests.cs:13-25), and Spark build == kernel parity on a
fields corpus."""

import numpy as np
import pytest

from infidex_spark.build.indexer import build_index
from infidex_spark.kernel.engine import (
    FIELD_WEIGHTS,
    KernelIndex,
    field_boundaries,
    field_weight_at,
)
from infidex_spark.query.executor import IndexReader, QueryExecutor

# title (High), description (Med), genre (Low), year (Low) — the shape of
# the reference's movie parity fixtures
MOVIES = [
    ("The Shawshank Redemption", "Two imprisoned men bond over a number of years", "Drama", "1994"),
    ("The Dark Knight", "Batman faces the Joker in Gotham city", "Action", "2008"),
    ("Redemption Road", "A long journey of guilt and forgiveness", "Drama", "2016"),
    ("Quick Change", "A bank robbery goes comically wrong", "Comedy", "1990"),
    ("The Quick and the Dead", "A gunslinger enters a dueling tournament", "Western", "1995"),
    ("Gone Girl", "A man becomes the focus of a media storm about redemption", "Thriller", "2014"),
    ("Fox Catcher", "A wrestler joins a troubled benefactor's team", "Drama", "2014"),
    ("Batman Returns", "The penguin rises from the sewers of Gotham", "Action", "1992"),
    ("City Lights", "A tramp falls for a blind flower girl", "Romance", "1931"),
    ("The Shining", "A family heads to an isolated hotel for the winter", "Horror", "1980"),
]
FIELD_SPEC = [0, 1, 2, 2]  # High, Med, Low, Low


def fields_of(movie):
    return list(zip(movie, FIELD_SPEC))


@pytest.fixture(scope="module")
def kernel_fields():
    idx = KernelIndex()
    idx.index_documents_fields(
        [(i + 1, fields_of(m)) for i, m in enumerate(MOVIES)]
    )
    return idx


# ------------------------------------------------------------- helpers


def test_field_boundaries_concat():
    raw, bounds = field_boundaries([("abc", 0), ("de", 1), ("", 2)])
    assert raw == "abc§de§"
    assert bounds == [(0, 0), (4, 1), (7, 2)]


def test_field_weight_lookup():
    bounds = [(0, 0), (4, 1), (7, 2)]
    assert field_weight_at(0, bounds) == 1.5
    assert field_weight_at(3, bounds) == 1.5
    assert field_weight_at(4, bounds) == 1.25
    assert field_weight_at(6, bounds) == 1.25
    assert field_weight_at(7, bounds) == 1.0
    assert field_weight_at(100, bounds) == 1.0
    assert field_weight_at(5, []) == 1.0  # no boundaries -> 1.0 (reference)
    # out-of-range weight index -> 1.0
    assert field_weight_at(0, [(0, 9)]) == 1.0


def test_weights_are_reference_defaults():
    assert FIELD_WEIGHTS == (1.5, 1.25, 1.0)


# ------------------------------------------------------------ kernel


def test_title_field_weighted_higher(kernel_fields):
    """A term occurring once in a High field accumulates round(1.5)=2 tf;
    the same term once in a Med/Low field accumulates 1."""
    # note: '§' is NOT a tokenizer delimiter (reference behavior), so a
    # word adjacent to a field boundary joins across it — keep the probe
    # word mid-field
    idx = KernelIndex()
    idx.index_documents_fields(
        [
            (1, [("a zebra title", 0), ("other words here", 1)]),
            (2, [("plain title", 0), ("the zebra grazes", 1)]),
        ]
    )
    st = idx.terms["zebra"]
    w = dict(zip(st.doc_ids, st.weights))
    assert w[0] == 2  # High: round(1.5) -> 2 (banker's)
    assert w[1] == 1  # Med: round(1.25) -> 1


def test_mixed_weight_fold_order():
    """tf accumulation rounds at every step, so field order matters
    (Term.FirstCycleAdd: newWeight = byte_prev + fieldWeight)."""
    # same word once in High then once in Low: 2 -> round(2+1.0)=3
    idx = KernelIndex()
    idx.index_documents_fields(
        [(1, [("the wombat runs", 0), ("a wombat sleeps", 2)])]
    )
    assert idx.terms["wombat"].weights == [3]
    # once in Low then once in High: 1 -> round(1+1.5)=2 (banker's 2.5->2)
    idx2 = KernelIndex()
    idx2.index_documents_fields(
        [(1, [("the wombat runs", 2), ("a wombat sleeps", 0)])]
    )
    assert idx2.terms["wombat"].weights == [2]


def test_search_prefers_title_match(kernel_fields):
    """'redemption' in the title (Shawshank, Redemption Road) must outrank
    the description-only match (Gone Girl)."""
    res = kernel_fields.search("redemption", 10)
    keys = [k for k, _ in res]
    title_hits = {1, 3}
    desc_hit = 6
    assert desc_hit in keys
    assert all(keys.index(t) < keys.index(desc_hit) for t in title_hits if t in keys)


def test_full_search_redemption_sh(kernel_fields):
    """MovieSearchParityTests.RedemptionSh: 'redemption sh' prefers The
    Shawshank Redemption over other redemption titles."""
    from infidex_spark.kernel.engine import FullSearch

    fs = FullSearch(kernel_fields)
    res = fs.search("redemption sh", 10)
    assert res, "expected results for 'redemption sh'"
    assert res[0][0] == 1  # The Shawshank Redemption


# ------------------------------------- vectorized batch fold parity


def _scalar_fields_fold(fields_rows, widxs, sizes=(3,), start_pad=2):
    """The original per-row reference fold (kernel building blocks),
    kept as the oracle for the vectorized batch tokenizer."""
    from infidex_spark.kernel.normalize import normalize
    from infidex_spark.kernel.tokenize import index_tokens

    out = {}
    for r, vals in enumerate(fields_rows):
        raw, bounds = field_boundaries(list(zip(vals, widxs)))
        prepped = normalize(raw).lower()
        acc = {}
        for term, pos in index_tokens(prepped, sizes, start_pad):
            w = field_weight_at(pos, bounds)
            st = acc.get(term)
            if st is None:
                acc[term] = [min(round(w), 255), 1, 0]
            else:
                st[1] += 1
                nw = st[0] + w
                if nw <= 255.0:
                    st[0] = round(nw)
                    st[2] += 1
        for t, (tf, occ, succ) in acc.items():
            out[(r, t)] = (tf, occ - succ)
    return out


def test_vectorized_fields_fold_matches_scalar():
    """tokenize_fields_batch is bit-identical to folding index_tokens
    occurrences through Term.FirstCycleAdd one at a time — including
    byte saturation, diacritics, astral chars, and long words."""
    import random

    import pandas as pd

    from infidex_spark.build.tokenizer import tokenize_fields_batch
    from infidex_spark.kernel.engine import FIELD_DELIM

    random.seed(11)
    vocab = [
        "fox", "the", "quick", "zèbra", "a", "by", "shawshank",
        "redemption", "x" * 250, "tk", "ab", "foo-bar", "don't",
        "émigré", "😀ok", "wombat " * 120,
    ]
    for nf in (1, 2, 4):
        rows = [
            [" ".join(random.choices(vocab, k=random.randint(0, 10)))
             for _ in range(nf)]
            for _ in range(80)
        ]
        widxs = [random.choice([0, 1, 2, 5]) for _ in range(nf)]
        exp = _scalar_fields_fold(rows, widxs)
        bpos = np.zeros((len(rows), nf), dtype=np.int64)
        for r, v in enumerate(rows):
            p = 0
            for j, val in enumerate(v):
                bpos[r, j] = p
                p += len(val) + 1
        got_df = tokenize_fields_batch(
            pd.Series([FIELD_DELIM.join(v) for v in rows]), bpos, widxs
        )
        got = {
            (int(r), t): (int(tf), int(d))
            for r, t, tf, d in zip(
                got_df["doc_idx"], got_df["term"].astype(str),
                got_df["tf"], got_df["dfc"],
            )
        }
        assert got == exp, nf


# ------------------------------------------------------- spark parity


@pytest.fixture(scope="module")
def built_fields_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fieldsidx") / "idx")
    rows = [
        (i, i + 1, m[0], m[1], m[2], m[3]) for i, m in enumerate(MOVIES)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, doc_key long, title string, description string, genre string, year string"
    )
    manifest = build_index(
        spark, docs, out, n_buckets=4, salts=2,
        fields=[("title", 0), ("description", 1), ("genre", 2), ("year", 2)],
    )
    return out, manifest


def test_spark_fields_postings_match_kernel(built_fields_index, kernel_fields):
    out, manifest = built_fields_index
    assert manifest["fields"] == [["title", 0], ["description", 1], ["genre", 2], ["year", 2]] or \
        manifest["fields"] == [("title", 0), ("description", 1), ("genre", 2), ("year", 2)]
    reader = IndexReader(out)
    live = {t: s for t, s in kernel_fields.terms.items() if s.df > 0}
    fetched = reader.fetch_terms(list(live.keys()))
    assert set(fetched.keys()) == set(live.keys())
    for term, st in live.items():
        tp = fetched[term]
        assert tp.df == st.df, term
        assert tp.doc_ids.tolist() == sorted(st.doc_ids), term
        got_w = dict(zip(tp.doc_ids.tolist(), tp.tfs.astype(int).tolist()))
        exp_w = dict(zip(st.doc_ids, st.weights))
        assert got_w == exp_w, term


def test_spark_fields_topk_matches_kernel(built_fields_index, kernel_fields):
    out, _ = built_fields_index
    ex = QueryExecutor(IndexReader(out))
    for q in ["redemption", "batman", "quick", "gotham", "redemption sh", "shawshank"]:
        kern = kernel_fields.search(q, 10)
        spark_res = ex.search(q, 10)
        assert [k for k, _ in spark_res] == [k for k, _ in kern], q
        for (sk, ss), (kk, ks) in zip(spark_res, kern):
            assert ss == pytest.approx(ks, rel=1e-6), (q, sk)


def test_spark_fields_doc_stats_match_kernel(built_fields_index, kernel_fields):
    out, manifest = built_fields_index
    assert manifest["avgdl"] == pytest.approx(kernel_fields.avgdl, rel=1e-6)
    reader = IndexReader(out)
    ids = np.arange(len(MOVIES), dtype=np.int64)
    dl, keys = reader.doc_lengths(ids)
    np.testing.assert_allclose(dl, kernel_fields.doc_lengths, rtol=1e-6)
