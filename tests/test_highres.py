"""A6 high-resolution joined-text shingles (Tokenizer.cs:202-266) —
config-gated query-side pass: shingles over the delimiter-stripped query
plus the whole joined text as one token."""

from hypothesis import given
from hypothesis import strategies as st

from infidex_spark.kernel.engine import KernelIndex
from infidex_spark.kernel.tokenize import (
    DEFAULT_INDEX_SIZES,
    DELIMITERS,
    search_tokens,
)

_DELIMS = set(DELIMITERS)


def test_highres_superset_of_normal():
    q = "quick fox"
    normal = search_tokens(q)
    hi = search_tokens(q, high_resolution=True)
    assert hi[: len(normal)] == normal  # normal pass first, order kept
    assert len(hi) > len(normal)


def test_highres_joined_shingles_bridge_word_boundary():
    hi = set(search_tokens("quick fox", high_resolution=True))
    assert "ckf" in hi and "kfo" in hi  # grams spanning the removed space
    assert "quickfox" in hi  # the whole joined token


def test_highres_noop_without_delimiters():
    # single word: joined == word, so the extra pass adds no new grams
    # beyond the (already present) padded grams + the word itself
    normal = set(search_tokens("quickfox"))
    hi = set(search_tokens("quickfox", high_resolution=True))
    assert hi == normal


@given(st.text(alphabet="abc -.", min_size=0, max_size=30))
def test_highres_property_joined_pass(q):
    normal = search_tokens(q)
    hi = search_tokens(q, high_resolution=True)
    # prefix property
    assert hi[: len(normal)] == normal
    joined = "".join(c for c in q if c not in _DELIMS)
    extra = hi[len(normal):]
    min_size = DEFAULT_INDEX_SIZES[0]
    if len(joined) >= min_size:
        # last extra token is the whole joined text
        assert extra and extra[-1] == joined
        # every other extra token is a shingle of the padded joined text
        padded = "\x02" * 0 + joined  # pads use control chars; just check substring-ish
        for g in extra[:-1]:
            stripped = g.strip("".join(sorted({c for c in g if not c.isalnum() and c not in joined})))
            assert any(ch in joined for ch in g if ch.isalnum()) or stripped == ""
    # joined pass never emits delimiter characters
    for g in extra:
        assert not any(c in _DELIMS for c in g)


def test_kernel_search_highres_finds_joined_docs():
    docs = [
        (1, "the quickfox runs far"),
        (2, "a slow turtle walks"),
        (3, "quick brown fox"),
    ]
    off = KernelIndex()
    off.index_documents(docs)
    on = KernelIndex(high_resolution=True)
    on.index_documents(docs)
    q = "quick fox"
    keys_off = [k for k, _ in off.search(q, 10)]
    keys_on = [k for k, _ in on.search(q, 10)]
    assert 1 in keys_on  # joined shingles bridge 'quick|fox' -> 'quickfox'
    assert 3 in keys_on
    # high-res is a superset recall-wise for this corpus
    assert set(keys_off) <= set(keys_on)


def test_executor_highres_matches_kernel(spark, tmp_path):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader, QueryExecutor

    docs_py = [
        (1, "the quickfox runs far"),
        (2, "a slow turtle walks"),
        (3, "quick brown fox"),
        (4, "foxes are quick animals"),
    ]
    out = str(tmp_path / "hiidx")
    docs = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(docs_py)],
        "doc_id long, doc_key long, text string",
    )
    build_index(spark, docs, out, n_buckets=4, salts=2)
    kidx = KernelIndex(high_resolution=True)
    kidx.index_documents(docs_py)
    ex = QueryExecutor(IndexReader(out), high_resolution=True)
    for q in ["quick fox", "quickfox", "slow turtle"]:
        kern = kidx.search(q, 10)
        got = ex.search(q, 10)
        assert [k for k, _ in got] == [k for k, _ in kern], q
