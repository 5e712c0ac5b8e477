import pandas as pd

from infidex_spark.kernel.normalize import (
    fold_chars,
    normalize,
    normalize_lower,
    normalize_series,
)


def test_diacritic_fold_czech():
    assert normalize("Příliš žluťoučký kůň") == "Prilis zlutoucky kun"


def test_diacritic_fold_mixed_languages():
    assert fold_chars("Łódź") == "Lodz"
    assert fold_chars("Ğğ İı Şş") == "Gg Ii Ss"
    assert fold_chars("Æøå ÆØÅ") == "Eoa EOA"  # Æ folds to E per the table
    assert fold_chars("ß") == "s"
    assert fold_chars("Ðð Þþ") == "Dd Tt"


def test_whitespace_mapping_and_collapse():
    assert normalize("a\tb\nc\rd") == "a b c d"
    assert normalize("a  b") == "a b"
    assert normalize("a \t\n b") == "a b"
    assert normalize("a     b") == "a b"


def test_leading_trailing_spaces_preserved_but_collapsed():
    # The reference collapses runs but does not trim.
    assert normalize("  a  ") == " a "
    assert normalize(" a") == " a"


def test_unmapped_whitespace_untouched():
    # Only \t \n \r map to space (TextNormalizer.cs:196-200); \f \v and
    # unicode spaces pass through.
    assert normalize("a\fb") == "a\fb"
    assert normalize("a b") == "a b"


def test_empty_and_identity():
    assert normalize("") == ""
    assert normalize("hello world") == "hello world"


def test_normalize_lower_order():
    # fold happens before lowercase: 'İ' -> 'I' -> 'i' (no combining dot)
    assert normalize_lower("İstanbul") == "istanbul"


def test_series_matches_scalar():
    texts = [
        "Příliš žluťoučký kůň",
        "a\t b\n\nc",
        "",
        "plain",
        "Łódź  –  Kraków",
    ]
    got = normalize_series(pd.Series(texts)).tolist()
    assert got == [normalize(t) for t in texts]
