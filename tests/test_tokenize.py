import numpy as np

from infidex_spark.kernel.bm25 import tf_accumulate, tf_df_fast
from infidex_spark.kernel.tokenize import (
    START_PAD,
    index_tokens,
    search_tokens,
    word_tokens,
)


def test_index_tokens_grams_and_words():
    toks = index_tokens("fox")
    # padded: ÿÿfox -> grams: ÿÿf, ÿfo, fox ; word: fox
    assert toks == [
        (START_PAD * 2 + "f", 0),
        (START_PAD + "fo", 1),
        ("fox", 2),
        ("fox", 2),
    ]


def test_all_padding_grams_skipped():
    toks = index_tokens("a")
    # padded ÿÿa: grams ÿÿa(skip? contains 'a' -> keep), ... length 3 only
    terms = [t for t, _ in toks]
    assert terms == [START_PAD * 2 + "a"]  # word 'a' too short (min 3)


def test_word_min_size():
    toks = index_tokens("an ox jumps")
    words = [t for t, p in toks if not t.startswith(START_PAD) and " " not in t]
    # grams of len 3 without pad and delimiter chars, plus word 'jumps'
    assert "jumps" in words
    assert "an" not in words and "ox" not in words


def test_word_positions_offset_by_pad():
    toks = index_tokens("cat dog")
    assert ("cat", 2) in toks  # word at text offset 0 + startPad 2
    assert ("dog", 6) in toks


def test_search_tokens_words_first_then_grams():
    toks = search_tokens("qick fux")
    assert toks[:2] == ["qick", "fux"]
    assert toks[2] == START_PAD * 2 + "q"
    assert "fux" in toks[2:]  # the final 3-gram equals the word
    assert "ck f" not in toks
    assert "ck " in toks  # grams cross word boundaries including spaces


def test_search_tokens_short_text():
    # padded length 4 > 3 -> normal 3-gram path
    assert search_tokens("ab") == [START_PAD * 2 + "a", START_PAD + "ab"]


def test_word_tokens_delimiters():
    assert word_tokens("spider-man, new/york.city") == [
        "spider",
        "man",
        "new",
        "york",
        "city",
    ]


def test_tf_accumulate_default_weight():
    # w=1.25: first -> round(1.25)=1; each accumulate +1; cap at 254
    assert tf_accumulate(1) == (1, 1)
    assert tf_accumulate(2) == (2, 1)
    assert tf_accumulate(254) == (254, 1)
    assert tf_accumulate(255) == (254, 2)  # 254+1.25 > 255: drop, df stays
    assert tf_accumulate(300) == (254, 47)


def test_tf_accumulate_weight_one():
    assert tf_accumulate(255, 1.0) == (255, 1)
    assert tf_accumulate(256, 1.0) == (255, 2)


def test_tf_df_fast_matches_exact():
    occs = [1, 2, 3, 100, 253, 254, 255, 256, 300, 1000]
    tf, df = tf_df_fast(occs, 1.25)
    exact = [tf_accumulate(o, 1.25) for o in occs]
    assert tf.tolist() == [e[0] for e in exact]
    assert df.tolist() == [e[1] for e in exact]
    tf1, df1 = tf_df_fast(occs, 1.0)
    exact1 = [tf_accumulate(o, 1.0) for o in occs]
    assert tf1.tolist() == [e[0] for e in exact1]
    assert df1.tolist() == [e[1] for e in exact1]


def test_banker_rounding_matches_csharp():
    # C# Math.Round is half-to-even; numpy rint too.
    assert float(np.rint(0.5)) == 0.0
    assert float(np.rint(1.5)) == 2.0
    assert float(np.rint(2.5)) == 2.0
