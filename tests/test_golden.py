"""Golden top-k fixtures (golden/*.json): the kernel must reproduce them
bit-for-bit, and the Spark-built index + executor must be rank-identical
with float32-tight scores."""

import glob
import json
import os

import numpy as np
import pytest

from infidex_spark.fixtures import REFERENCE_DOCS, SCHOOL_DOCS, movie_docs
from infidex_spark.kernel.engine import KernelIndex

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")
GOLDEN_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.json")))

CORPora = {
    "reference": REFERENCE_DOCS,
    "movies": movie_docs(),
    "schools": SCHOOL_DOCS,
}


def _load(path):
    with open(path) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def kernels():
    out = {}
    for name, docs in CORPora.items():
        idx = KernelIndex()
        idx.index_documents(docs)
        out[name] = idx
    return out


def test_goldens_exist():
    assert len(GOLDEN_FILES) >= 15


@pytest.mark.parametrize("path", GOLDEN_FILES, ids=[os.path.basename(p) for p in GOLDEN_FILES])
def test_kernel_reproduces_golden(kernels, path):
    g = _load(path)
    idx = kernels[g["corpus"]]
    hits = idx.search(g["query"], g["k"])
    assert [d for d, _ in hits] == [r["doc_id"] for r in g["results"]]
    assert [s for _, s in hits] == [r["bm25_score"] for r in g["results"]]


# reference expectations lifted from the reference's own test assertions
def test_reference_expectations(kernels):
    ref = kernels["reference"]
    assert ref.search("batman", 10)[0][0] == 6
    assert [d for d, _ in ref.search("qick fux", 10)] == [5, 1]
    battamam = ref.search("battamam", 10)
    assert len(battamam) == 1 and battamam[0][0] == 6
    movies = kernels["movies"]
    assert movies.search("Shawshank", 10)[0][0] == 1  # The Shawshank Redemption


@pytest.fixture(scope="module")
def spark_executors(spark, tmp_path_factory):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader, QueryExecutor

    out = {}
    for name, docs in CORPora.items():
        d = str(tmp_path_factory.mktemp("golden") / name)
        df = spark.createDataFrame(
            [(i, key, text) for i, (key, text) in enumerate(docs)],
            "doc_id long, doc_key long, text string",
        )
        build_index(spark, df, d, n_buckets=4)
        out[name] = QueryExecutor(IndexReader(d))
    return out


@pytest.mark.parametrize("path", GOLDEN_FILES, ids=[os.path.basename(p) for p in GOLDEN_FILES])
def test_spark_executor_matches_golden(spark_executors, path):
    g = _load(path)
    ex = spark_executors[g["corpus"]]
    hits = ex.search(g["query"], g["k"])
    assert [d for d, _ in hits] == [r["doc_id"] for r in g["results"]], g["query"]
    np.testing.assert_allclose(
        [s for _, s in hits],
        [r["bm25_score"] for r in g["results"]],
        rtol=1e-5,
    )
