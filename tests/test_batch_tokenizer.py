from collections import Counter

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from infidex_spark.build.tokenizer import tokenize_batch
from infidex_spark.kernel.normalize import normalize
from infidex_spark.kernel.tokenize import index_tokens


def _kernel_counts(text: str, sizes=(3,)) -> Counter:
    prepped = normalize(text).lower()
    return Counter(t for t, _ in index_tokens(prepped, sizes))


def _batch_counts(texts: list[str], sizes=(3,)) -> dict[int, Counter]:
    df = tokenize_batch(pd.Series(texts), sizes=sizes)
    out: dict[int, Counter] = {i: Counter() for i in range(len(texts))}
    for r in df.itertuples(index=False):
        out[int(r.doc_idx)][r.term] += int(r.occ)
    return out


CORPUS = [
    "The quick brown fox jumps over the lazy dog",
    "Batman and Robin fight crime in Gotham City",
    "Spider-Man swings through New York City",
    "",
    "a",
    "ab",
    "Příliš žluťoučký kůň úpěl ďábelské ódy",
    "x  y\t\tz -- [brackets] (parens) a/b.c,d:e;f",
    "repeat repeat repeat repeat repeat",
    "ÿ edge ￿ literal pad char in text",
]


def test_batch_matches_kernel_default():
    got = _batch_counts(CORPUS)
    for i, text in enumerate(CORPUS):
        assert got[i] == _kernel_counts(text), f"doc {i}: {text!r}"


def test_batch_matches_kernel_sizes_2_3():
    got = _batch_counts(CORPUS, sizes=(2, 3))
    for i, text in enumerate(CORPUS):
        assert got[i] == _kernel_counts(text, sizes=(2, 3)), f"doc {i}"


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_batch_matches_kernel_property(texts):
    got = _batch_counts(texts)
    for i, text in enumerate(texts):
        assert got[i] == _kernel_counts(text)


def test_empty_batch():
    df = tokenize_batch(pd.Series([], dtype="object"))
    assert len(df) == 0
