import pandas as pd
import pytest

from infidex_spark.kernel.engine import KernelIndex
from infidex_spark.kernel.synonyms import SynonymMap


def _map():
    m = SynonymMap()
    m.add("car", "automobile")
    m.add_group("film", "movie", "picture")
    return m


def test_union_find_canonical_prefers_longer_then_lexicographic():
    m = _map()
    assert m.canonical("car") == "automobile"
    assert m.canonical("automobile") == "automobile"
    # film/movie/picture: longest root wins -> picture
    assert m.canonical("film") == "picture"
    assert m.canonical("movie") == "picture"
    assert m.canonical("unrelated") == "unrelated"


def test_canonicalize_text_preserves_delimiters():
    m = _map()
    got = m.canonicalize_text("the car, a movie/film")
    assert got == "the automobile, a picture/picture"
    # '!' is not a delimiter -> token is 'film!', no mapping, kept intact
    assert m.canonicalize_text("movie/film!") == "picture/film!"


def test_canonicalize_series_matches_scalar():
    m = _map()
    texts = ["a car and a movie", "car-film picture", "nothing here", ""]
    got = m.canonicalize_series(pd.Series(texts)).tolist()
    assert got == [m.canonicalize_text(t) for t in texts]


def test_kernel_with_synonyms_matches_queries():
    docs = [
        (1, "a great automobile race"),
        (2, "a great movie night"),
        (3, "boring documentary"),
    ]
    idx = KernelIndex(synonym_map=_map())
    idx.index_documents(docs)
    # query 'car' canonicalizes to 'automobile' -> doc 1 wins
    assert idx.search("car race", 5)[0][0] == 1
    # 'film' and 'picture' both hit doc 2's canonicalized 'picture'
    assert idx.search("film night", 5)[0][0] == 2
    assert idx.search("picture night", 5)[0][0] == 2


def test_spark_build_with_synonyms_matches_kernel(spark, tmp_path):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader, QueryExecutor

    docs = [
        (1, "a great automobile race"),
        (2, "a great movie night"),
        (3, "boring documentary"),
        (4, "the car of the year"),
    ]
    kernel = KernelIndex(synonym_map=_map())
    kernel.index_documents(docs)
    df = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(docs)],
        "doc_id long, doc_key long, text string",
    )
    out = str(tmp_path / "synidx")
    build_index(spark, df, out, n_buckets=4, synonym_map=_map())
    ex = QueryExecutor(IndexReader(out))
    for q in ["car race", "automobile", "film night", "picture", "movie year"]:
        got = [d for d, _ in ex.search(q, 5)]
        want = [d for d, _ in kernel.search(q, 5)]
        assert got == want, q
