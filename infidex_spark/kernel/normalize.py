"""Text normalization: Latin diacritic folding + whitespace collapsing.

Semantics mirror the reference normalizer
(/root/reference/src/Infidex/Tokenization/TextNormalizer.cs:120-302):

1. ``\\t``, ``\\n``, ``\\r`` map to a space.
2. Runs of (mapped) spaces collapse to a single space.
3. A fixed Latin-diacritic fold table maps accented characters to their
   ASCII base (the table below is the reference's default table — it is
   configuration data, re-entered verbatim so extracted text is
   byte-identical per the project invariant).

The whole pass is a single linear scan in the reference; here it is one
``str.translate`` (char fold + whitespace->space) followed by one compiled
regex that collapses space runs, which is equivalent because the fold table
never produces a space and never maps a space away.

Leading/trailing spaces are preserved (the reference only collapses runs;
it does not trim — trimming happens separately on the query path).
"""

from __future__ import annotations

import re
from functools import lru_cache

# Reference default fold table (TextNormalizer.cs:216-291).
# Keys/values are single characters; this is pure configuration data.
_FOLD_PAIRS: tuple[tuple[str, str], ...] = (
    # Nordic/German
    ("Æ", "E"), ("æ", "e"), ("Ø", "O"), ("ø", "o"), ("Å", "A"), ("å", "a"),
    ("Ä", "A"), ("ä", "a"), ("Ö", "O"), ("ö", "o"), ("Ü", "U"), ("ü", "u"),
    ("ß", "s"),
    # Czech/Slovak carons
    ("Š", "S"), ("š", "s"), ("Č", "C"), ("č", "c"), ("Ř", "R"), ("ř", "r"),
    ("Ž", "Z"), ("ž", "z"), ("Ň", "N"), ("ň", "n"), ("Ť", "T"), ("ť", "t"),
    ("Ď", "D"), ("ď", "d"), ("Ě", "E"), ("ě", "e"),
    # Acute accents + Czech kroužek
    ("Á", "A"), ("á", "a"), ("É", "E"), ("é", "e"), ("Í", "I"), ("í", "i"),
    ("Ó", "O"), ("ó", "o"), ("Ú", "U"), ("ú", "u"), ("Ý", "Y"), ("ý", "y"),
    ("Ů", "U"), ("ů", "u"),
    # Polish
    ("Ą", "A"), ("ą", "a"), ("Ć", "C"), ("ć", "c"), ("Ę", "E"), ("ę", "e"),
    ("Ł", "L"), ("ł", "l"), ("Ń", "N"), ("ń", "n"), ("Ś", "S"), ("ś", "s"),
    ("Ź", "Z"), ("ź", "z"), ("Ż", "Z"), ("ż", "z"),
    # Hungarian
    ("Ő", "O"), ("ő", "o"), ("Ű", "U"), ("ű", "u"),
    # Romanian
    ("Ă", "A"), ("ă", "a"), ("Â", "A"), ("â", "a"), ("Î", "I"), ("î", "i"),
    ("Ș", "S"), ("ș", "s"), ("Ț", "T"), ("ț", "t"),
    # Turkish
    ("Ğ", "G"), ("ğ", "g"), ("İ", "I"), ("ı", "i"), ("Ş", "S"), ("ş", "s"),
    # French/Spanish/Portuguese
    ("À", "A"), ("à", "a"), ("Ç", "C"), ("ç", "c"), ("È", "E"), ("è", "e"),
    ("Ê", "E"), ("ê", "e"), ("Ë", "E"), ("ë", "e"), ("Ì", "I"), ("ì", "i"),
    ("Ï", "I"), ("ï", "i"), ("Ñ", "N"), ("ñ", "n"), ("Ò", "O"), ("ò", "o"),
    ("Ô", "O"), ("ô", "o"), ("Õ", "O"), ("õ", "o"), ("Ù", "U"), ("ù", "u"),
    ("Û", "U"), ("û", "u"), ("Ÿ", "Y"), ("ÿ", "y"),
    # Icelandic
    ("Ð", "D"), ("ð", "d"), ("Þ", "T"), ("þ", "t"),
)

FOLD_TABLE: dict[int, str] = {ord(k): v for k, v in _FOLD_PAIRS}

# Whitespace chars the reference maps to space before run-collapsing
# (TextNormalizer.cs:196-200: only \t \n \r — NOT \f \v or Unicode spaces).
_TRANSLATE_TABLE: dict[int, str] = dict(FOLD_TABLE)
for _ws in ("\t", "\n", "\r"):
    _TRANSLATE_TABLE[ord(_ws)] = " "

_SPACE_RUN = re.compile(r" {2,}")


def fold_chars(text: str) -> str:
    """Apply only the diacritic fold table (no whitespace handling)."""
    return text.translate(FOLD_TABLE)


def normalize(text: str) -> str:
    """Normalize one string: fold diacritics, map \\t\\n\\r to space,
    collapse space runs. Matches the reference's single-pass normalizer."""
    if not text:
        return text
    return _SPACE_RUN.sub(" ", text.translate(_TRANSLATE_TABLE))


@lru_cache(maxsize=1)
def _str_maketrans() -> dict[int, str]:
    return dict(_TRANSLATE_TABLE)


def normalize_series(series):
    """Vectorized normalize over a pandas Series of strings.

    Used inside Arrow-batched pandas UDFs on the Spark side; equivalent to
    ``series.map(normalize)`` but uses pandas' vectorized str ops.
    """
    out = series.str.translate(_str_maketrans())
    return out.str.replace(_SPACE_RUN, " ", regex=True)


def normalize_lower(text: str) -> str:
    """normalize + lowercase — the exact index-/query-time text prep order
    (normalize first, then lowercase; VectorModel.cs:84-88)."""
    return normalize(text).lower()
