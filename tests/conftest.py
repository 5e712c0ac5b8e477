import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The 10-doc golden corpus from the reference's own tests
# (/root/reference/src/Infidex.Tests/ReferenceMatchingTests.cs:22-34).
REFERENCE_DOCS: list[tuple[int, str]] = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "A journey of a thousand miles begins with a single step"),
    (3, "To be or not to be, that is the question"),
    (4, "All that glitters is not gold"),
    (5, "The fox was quick and clever in the forest"),
    (6, "Batman and Robin fight crime in Gotham City"),
    (7, "Superman flies faster than a speeding bullet"),
    (8, "Spider-Man swings through New York City"),
    (9, "Wonder Woman protects the innocent"),
    (10, "The Flash runs at incredible speeds"),
]


@pytest.fixture(scope="session")
def reference_docs():
    return list(REFERENCE_DOCS)


@pytest.fixture(scope="session")
def kernel_index(reference_docs):
    from infidex_spark.kernel.engine import KernelIndex

    idx = KernelIndex()
    idx.index_documents(reference_docs)
    return idx


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession for all Spark-backed tests."""
    from infidex_spark.session import get_spark

    s = get_spark(app_name="infidex-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
