"""Auto-segmentation (A7) + segment consolidation (D12)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from infidex_spark.build.segmenter import consolidate, segment_docs, segment_text
from infidex_spark.kernel.engine import KernelIndex

LONG_A = (
    "the gotham chronicles begin with a masked vigilante stalking rooftops "
    "at night while the city sleeps and criminals gather in warehouses "
    "planning heists that never succeed because the dark knight always "
    "arrives first breaking their plans apart with precision and fear "
    "spreading through the underworld like wildfire across dry plains"
)
LONG_B = (
    "a quiet village by the river where fishermen mend their nets at dawn "
    "and children chase geese along muddy paths while the old mill turns "
    "slowly grinding grain for the autumn bread festival that draws "
    "travelers from distant towns carrying stories and songs of harvests "
    "past and futures bright with promise under clear september skies"
)
SHORT_C = "gotham vigilante night watch"


def test_segment_text_rules():
    assert segment_text("short text") == ["short text"]
    segs = segment_text(LONG_A)
    assert len(segs) > 1
    assert all(len(s) <= 260 for s in segs)  # target 200 + word slack
    # overlap: consecutive segments share words
    w0, w1 = set(segs[0].split()), set(segs[1].split())
    assert w0 & w1
    # every word of the original appears in some segment
    all_words = set(LONG_A.split())
    covered = set(w for s in segs for w in s.split())
    assert all_words <= covered


def test_consolidate():
    hits = [(1, 9.0), (2, 8.0), (1, 7.0), (3, 8.0), (2, 10.0)]
    assert consolidate(hits, 10) == [(2, 10.0), (1, 9.0), (3, 8.0)]
    assert consolidate(hits, 2) == [(2, 10.0), (1, 9.0)]
    assert consolidate([], 5) == []


@pytest.fixture(scope="module")
def segmented_setup(spark, tmp_path_factory):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader, QueryExecutor

    docs = spark.createDataFrame(
        [(1, LONG_A), (2, LONG_B), (3, SHORT_C)], "doc_key long, text string"
    )
    segs = segment_docs(docs).orderBy("doc_key", "seg_no").collect()
    rows = [(i, r.doc_key, r.text) for i, r in enumerate(segs)]
    seg_df = spark.createDataFrame(rows, "doc_id long, doc_key long, text string")
    out = str(tmp_path_factory.mktemp("seg") / "idx")
    build_index(spark, seg_df, out, n_buckets=4)
    kernel = KernelIndex()
    kernel.index_documents([(key, text) for _, key, text in rows])
    return QueryExecutor(IndexReader(out)), kernel, rows


def test_segments_share_doc_key(segmented_setup):
    _, _, rows = segmented_setup
    keys = [k for _, k, _ in rows]
    assert keys.count(1) > 1 and keys.count(2) > 1 and keys.count(3) == 1


@pytest.mark.parametrize(
    "query", ["gotham vigilante", "dark knight", "autumn bread festival", "the city"]
)
def test_consolidated_results_unique_keys_and_match_kernel(segmented_setup, query):
    ex, kernel, _ = segmented_setup
    got = ex.search(query, 10)
    keys = [d for d, _ in got]
    assert len(keys) == len(set(keys)), "segments must consolidate"
    want = kernel.search(query, 10)
    assert keys == [d for d, _ in want], (got, want)
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-5
    )


def test_doc3_tops_its_own_query(segmented_setup):
    ex, _, _ = segmented_setup
    res = ex.search("vigilante night watch", 5)
    assert res[0][0] == 3
