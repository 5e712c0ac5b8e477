"""Postings point-read path: the parquet-stats term dictionary.

fetch_terms selects row groups by their term min/max footer stats (the
columnar analogue of the reference's FST term dictionary pointing into
the postings region) and reads them in one FileSystemDataset scan. These
tests pin its contract: parity with a plain filtered dataset scan,
negative caching, the no-stats fallback, and that freshly built bucket
files really are term-sorted (partitionBy would silently destroy the
sort if the sort keys did not lead with the partition column — see
build/indexer.py)."""

import glob

import numpy as np
import pyarrow.dataset as ds
import pyarrow.parquet as pq
import pytest

from tests.conftest import REFERENCE_DOCS


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from infidex_spark.build.indexer import build_index

    d = str(tmp_path_factory.mktemp("fetch") / "idx")
    docs = [(i, key, text) for i, (key, text) in enumerate(REFERENCE_DOCS)]
    df = spark.createDataFrame(docs, "doc_id long, doc_key long, text string")
    build_index(spark, df, d, n_buckets=4)
    return d


def _scan_reference(r, terms):
    """The pre-stats-dictionary read: one filtered dataset scan."""
    from infidex_spark.query.executor import term_bucket

    buckets = sorted({term_bucket(t, r.n_buckets) for t in terms})
    cols = ["term", "df", "n_docs", "payload", "weights",
            "block_last_doc", "block_max_w", "block_offsets"]
    flt = ds.field("bucket").isin(buckets) & ds.field("term").isin(terms)
    tbl = r._postings.to_table(columns=cols, filter=flt)
    out = {}
    for i in range(tbl.num_rows):
        out[tbl["term"][i].as_py()] = (
            tbl["df"][i].as_py(),
            tbl["n_docs"][i].as_py(),
            tbl["payload"][i].as_py(),
            tbl["weights"][i].as_py(),
            tuple(tbl["block_last_doc"][i].as_py()),
            tuple(tbl["block_max_w"][i].as_py()),
            tuple(tbl["block_offsets"][i].as_py()),
        )
    return out


def _materialize(tps):
    return {
        t: (
            tp.df,
            tp.n_docs,
            tp._payload,
            tp._weights,
            tuple(np.asarray(tp.block_last_doc).tolist()),
            tuple(np.asarray(tp.block_max_w).tolist()),
            tuple(np.asarray(tp._block_offsets).tolist()),
        )
        for t, tp in tps.items()
    }


def test_bucket_files_are_term_sorted(built):
    files = sorted(set(glob.glob(built + "/postings/bucket=*/*.parquet")))
    assert files
    for f in files:
        terms = pq.read_table(f, columns=["term"])["term"].to_pylist()
        assert terms == sorted(terms), f


def test_fetch_parity_with_dataset_scan(built):
    from infidex_spark.query.executor import IndexReader

    r = IndexReader(built)
    terms = ["qui", "uic", "ick", "fox", "bat", "the", "gol", "ld "]
    want = _scan_reference(r, terms)
    assert want, "probe terms must exist in the corpus"
    got = _materialize(r.fetch_terms(terms))
    assert got == want
    # dtype contract for the vectorized block-array extraction
    tp = r.fetch_terms(["the"])["the"]
    for a in (tp.block_last_doc, tp.block_max_w, tp._block_offsets):
        assert np.asarray(a).dtype == np.int64
    # cached repeat returns identical objects
    again = r.fetch_terms(terms)
    assert all(again[t] is r._term_cache[t] for t in again)


def test_fetch_negative_cache_and_partial_hits(built):
    from infidex_spark.query.executor import _TERM_MISS, IndexReader

    r = IndexReader(built)
    out = r.fetch_terms(["zzz", "qqq", "fox"])
    assert set(out) == {"fox"}
    assert r._term_cache["zzz"] is _TERM_MISS
    assert r._term_cache["qqq"] is _TERM_MISS
    # the negative cache answers without new reads
    assert set(r.fetch_terms(["zzz", "fox"])) == {"fox"}


def test_fetch_fallback_when_stats_unavailable(built):
    from infidex_spark.query.executor import IndexReader

    r = IndexReader(built)
    terms = ["qui", "fox", "bat", "zzz"]
    want = _materialize(
        {t: tp for t, tp in IndexReader(built).fetch_terms(terms).items()}
    )
    r._pfrag_idx = None  # simulate an unrecognized layout: no stats dict
    got = _materialize(r.fetch_terms(terms))
    assert got == want
    assert "zzz" not in got
