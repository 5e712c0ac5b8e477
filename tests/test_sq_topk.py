"""sq_topk champion lists == live _search_short_query, bit for bit.

The build-time table stores the FULL top-K short-query answers for hot
2-char single-token queries; the live path stays authoritative for
sparse/fuzzy queries, k beyond the stored depth, and under tombstones.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from infidex_spark.build.indexer import build_index
from infidex_spark.query.executor import IndexReader, QueryExecutor

QUERIES = [
    "fo", "th", "ba", "tw", "qu", "zz", "xq", "ab", "an", "of",
    "a b", "t o", "a t", "q z", "z q",
]


@pytest.fixture(scope="module")
def sq_index(spark, tmp_path_factory):
    from infidex_spark.webtext import generate_webtext, with_doc_ids

    out = str(tmp_path_factory.mktemp("sqtopk") / "idx")
    wt = generate_webtext(spark, 2000, seed=7)
    docs = with_doc_ids(wt).selectExpr("doc_id", "doc_id as doc_key", "text")
    build_index(spark, docs, out, n_buckets=8, short_precompute=True)
    return out


def test_table_exists_and_serves(sq_index):
    r = IndexReader(sq_index)
    assert os.path.isdir(os.path.join(sq_index, "sq_topk"))
    served = [q for q in QUERIES if len(q) == 2 and r.sq_topk(q) is not None]
    # the webtext vocabulary guarantees several hot 2-char prefixes
    assert served, "no champion rows built"
    for q in served:
        row = r.sq_topk(q)
        assert len(row) >= 10
    # two-token champions (fold-path extra) should exist for common
    # first letters
    assert any(
        r.sq_topk(q) is not None for q in QUERIES if " " in q
    ), "no two-token champion rows"


def test_table_path_equals_live_path(sq_index):
    ex_table = QueryExecutor(IndexReader(sq_index))
    live_reader = IndexReader(sq_index)
    live_reader._sq_topk_map = {}  # force champion-miss -> live path
    ex_live = QueryExecutor(live_reader)
    for q in QUERIES:
        got = ex_table.search(q, 10)
        want = ex_live.search(q, 10)
        assert got == want, (q, got, want)


def test_k_beyond_stored_depth_falls_back(sq_index):
    r = IndexReader(sq_index)
    ex = QueryExecutor(r)
    live_reader = IndexReader(sq_index)
    live_reader._sq_topk_map = {}
    ex_live = QueryExecutor(live_reader)
    served = [q for q in QUERIES if len(q) == 2 and r.sq_topk(q) is not None]
    q = served[0]
    k = len(r.sq_topk(q)) + 37
    assert ex.search(q, k) == ex_live.search(q, k)


def test_fold_and_join_paths_agree(spark, tmp_path_factory):
    """The broadcast-fold dataflow and the pure-join dataflow must emit
    identical tables (the join path is the >8M-doc scale fallback).
    Built with slim_doc_meta=False: both dataflows read the full
    doc_meta columns (production runs them before the slimming step)."""
    import pyarrow.parquet as pq

    from infidex_spark.build.indexer import _build_sq_topk
    from infidex_spark.webtext import generate_webtext, with_doc_ids

    out = str(tmp_path_factory.mktemp("sqfj") / "idx")
    wt = generate_webtext(spark, 1200, seed=11)
    docs = with_doc_ids(wt).selectExpr("doc_id", "doc_id as doc_key", "text")
    build_index(
        spark, docs, out, n_buckets=8, short_precompute=True,
        slim_doc_meta=False,
    )
    sq_index = out
    fold_tbl = pq.read_table(os.path.join(sq_index, "sq_topk")).sort_by("q")
    _build_sq_topk(
        spark, sq_index, os.path.join(sq_index, "postings"), (3,), 2,
        force_path="join",
    )
    join_tbl = pq.read_table(os.path.join(sq_index, "sq_topk")).sort_by("q")
    # the join path emits single-token champions only; compare on that
    # common subset
    import pyarrow.compute as pc

    fsub = fold_tbl.filter(
        pc.equal(pc.count_substring(fold_tbl["q"], " "), 0)
    )
    assert len(fsub) > 0
    assert fsub.column("q").to_pylist() == join_tbl.column("q").to_pylist()
    assert fsub.column("doc_keys").to_pylist() == join_tbl.column("doc_keys").to_pylist()
    assert fsub.column("finals").to_pylist() == join_tbl.column("finals").to_pylist()
    assert fsub.column("n_matched").to_pylist() == join_tbl.column("n_matched").to_pylist()


def test_char_terms_equals_scan(sq_index):
    """char_terms-backed fuzzy fallback == the legacy full-dictionary
    scan (same terms, same multipliers, same order)."""
    from infidex_spark.kernel.engine import build_prefix_patterns

    r = IndexReader(sq_index)
    assert os.path.isdir(os.path.join(sq_index, "char_terms"))
    ex_tbl = QueryExecutor(IndexReader(sq_index))
    scan_reader = IndexReader(sq_index)
    scan_reader._char_terms_ds = None  # force legacy scan
    ex_scan = QueryExecutor(scan_reader)
    for q in ["qz", "xq", "zz", "ab", "q z"]:
        pats = build_prefix_patterns(q, r.sizes[0], r.start_pad)
        got = ex_tbl._short_fuzzy_terms(q, pats)
        want = ex_scan._short_fuzzy_terms(q, pats)
        assert got == want, (q, got[:5], want[:5])


def test_fuzzy_class_precomputed(sq_index):
    """Round 5: 2-char queries in the fuzzy/sparse class (below the
    sq_topk match threshold — 'xq', 'qz', 'zz' on webtext) are served
    from the sq_fuzzy table (built by distributed evaluation of the
    live path), bit-identical to the live answer at every k."""
    r = IndexReader(sq_index)
    assert os.path.isdir(os.path.join(sq_index, "sq_fuzzy"))
    fuzzy_served = [
        q for q in ("xq", "qz", "zz", "zq") if r.sq_topk(q) is not None
    ]
    assert fuzzy_served, "no fuzzy-class champion rows built"
    ex = QueryExecutor(IndexReader(sq_index))
    live_reader = IndexReader(sq_index)
    live_reader._sq_topk_map = {}
    ex_live = QueryExecutor(live_reader)
    for q in fuzzy_served:
        for k in (1, 5, 10, 50):
            assert ex.search(q, k) == ex_live.search(q, k), (q, k)


def test_complete_rows_serve_any_k(spark, tmp_path_factory):
    """A sq_fuzzy row flagged complete (full result set smaller than
    the stored depth) answers k beyond its stored length — and still
    equals the live path there. An 80-doc corpus guarantees every
    fuzzy answer has < 100 hits, so every stored row is complete."""
    from infidex_spark.webtext import generate_webtext, with_doc_ids

    out = str(tmp_path_factory.mktemp("sqcomp") / "idx")
    wt = generate_webtext(spark, 80, seed=3)
    docs = with_doc_ids(wt).selectExpr("doc_id", "doc_id as doc_key", "text")
    from infidex_spark.build.indexer import build_index

    build_index(spark, docs, out, n_buckets=8, short_precompute=True)
    r = IndexReader(out)
    r.sq_topk("xq")  # trigger the lazy load
    complete = sorted(r._sq_complete)
    assert complete, "no complete fuzzy rows on an 80-doc corpus"
    # pick a query with a non-empty answer if one exists
    q = next((c for c in complete if r.sq_topk(c)), complete[0])
    row = r.sq_topk(q)
    k = len(row) + 37
    ex = QueryExecutor(IndexReader(out))
    live_reader = IndexReader(out)
    live_reader._sq_topk_map = {}
    ex_live = QueryExecutor(live_reader)
    assert ex.search(q, k) == ex_live.search(q, k) == [
        (int(d), float(s)) for d, s in row
    ]


def test_tombstones_filter_champions(sq_index):
    """Champion rows SERVE under tombstones (r6, VERDICT r5 Missing #4):
    deleted docs are filtered out of the stored row — the reference
    serves short queries from its in-RAM champion lists regardless of
    deletes (ShortQueryResolver.cs:18-31) — and the result is
    bit-identical to the live path, which anchors normalization to the
    full-corpus max for exactly this reason."""
    r = IndexReader(sq_index)
    served = [q for q in QUERIES if len(q) == 2 and r.sq_topk(q) is not None]
    for q in served[:3]:
        row = r2 = IndexReader(sq_index)
        row = r2.sq_topk(q)
        # tombstone the rank-1 doc AND the highest-normalized doc (the
        # hardest case: the old code renormalized and had to gate off)
        top_norm = max(row, key=lambda t: t[1] - int(np.ceil(t[1]) - 1))
        victims = frozenset({int(row[0][0]), int(top_norm[0])})
        r2.tombstones = victims
        ex = QueryExecutor(r2)
        got = ex.search(q, 10)
        assert all(d not in victims for d, _ in got)
        live_reader = IndexReader(sq_index)
        live_reader._sq_topk_map = {}  # champion-miss -> live path
        live_reader.tombstones = victims
        ex_live = QueryExecutor(live_reader)
        assert got == ex_live.search(q, 10), q  # bit-exact incl. scores


def test_tombstones_champion_path_actually_serves(sq_index):
    """With enough surviving stored entries, the tombstoned answer comes
    from the champion table, not a silent live fallback."""
    r = IndexReader(sq_index)
    served = [q for q in QUERIES if len(q) == 2 and r.sq_topk(q) is not None]
    q = served[0]
    victim = int(r.sq_topk(q)[0][0])
    r.tombstones = frozenset({victim})
    ex = QueryExecutor(r)
    ex._search_short_query = None  # live path would raise TypeError
    got = ex.search(q, 10)
    assert len(got) == 10 and all(d != victim for d, _ in got)


def test_tombstones_fall_back_when_row_exhausted(sq_index):
    """Deleting so many stored docs that fewer than k survive must fall
    back to the live path (the filtered row no longer covers k) and
    still exclude every victim."""
    r = IndexReader(sq_index)
    served = [q for q in QUERIES if len(q) == 2 and r.sq_topk(q) is not None]
    q = served[0]
    row = r.sq_topk(q)
    victims = frozenset(int(d) for d, _ in row[: len(row) - 5])
    r.tombstones = victims
    ex = QueryExecutor(r)
    got = ex.search(q, 10)
    assert all(d not in victims for d, _ in got)
    live_reader = IndexReader(sq_index)
    live_reader._sq_topk_map = {}
    live_reader.tombstones = victims
    assert got == QueryExecutor(live_reader).search(q, 10)


def test_slim_doc_meta_title_rows(sq_index):
    """Slim indexes (doc_meta without text/words_text) must serve
    doc_title_rows from the doc_store with an exactly re-derived
    words_text, and the slow precedence path must equal the fast one."""
    import numpy as np
    import pyarrow.parquet as pq

    r = IndexReader(sq_index)
    names = pq.ParquetDataset(os.path.join(sq_index, "doc_meta")).schema.names
    assert "text" not in names and "words_text" not in names, "not slim"
    texts, wtexts = r.doc_title_rows([0, 1, 2, 3, 4])
    assert len(texts) == 5 and wtexts is not None
    for i, t in texts.items():
        w = wtexts[i]
        assert w.startswith(" ") and w.endswith(" ")
        # every word of the text appears wrapped in sentinels
        from infidex_spark.kernel.tokenize import word_tokens

        for tok in word_tokens(t, min_size=1):
            assert f" {tok} " in w, (tok, w)
    # slow-path precedence (uses doc_title_rows) == fast-path (sq_meta)
    ex_fast = QueryExecutor(IndexReader(sq_index))
    slow_r = IndexReader(sq_index)
    slow_r._sq_meta = {}  # force the doc_title_rows point-fetch path
    slow_r._sq_topk_map = {}  # and the live short-query path
    ex_slow = QueryExecutor(slow_r)
    fast_r = IndexReader(sq_index)
    fast_r._sq_topk_map = {}  # live path but fast precedence
    ex_fast_live = QueryExecutor(fast_r)
    for q in ["fo", "th", "ab", "a b", "qz"]:
        got = ex_slow.search(q, 10)
        want = ex_fast_live.search(q, 10)
        assert got == want, (q, got, want)
