"""Tokenization: padded character n-grams + whole-word tokens.

Semantics mirror the reference tokenizer
(/root/reference/src/Infidex/Tokenization/Tokenizer.cs:75-330) under the
default engine configuration ("config 400",
ConfigurationParameters.cs:100-124):

- n-gram sizes ``[3]``, start padding = 2 x U+FFFF, no stop padding;
- n-grams are sliding windows over the padded text; windows consisting
  entirely of padding chars are skipped;
- if the *padded* text length <= the smallest n-gram size, only the
  smallest size is used (relevant for multi-size configs);
- whole words (split on the 22-char delimiter set) of length >= the
  smallest n-gram size are ALSO emitted as index terms;
- index-time token position = offset in the padded text (n-grams) or
  start padding + word offset (words); positions feed per-field weights.

The caller is responsible for normalize+lowercase before tokenizing
(matches VectorModel.IndexDocument / SearchEngine.Search ordering).
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable, Iterator

START_PAD = "￿"
STOP_PAD = "￾"

# Default word delimiters (TokenizerSetup.cs:36-43).
DELIMITERS = " -/.,:;'`–—*&\\_(){}[]\t"
_DELIM_SET = frozenset(DELIMITERS)
_DELIM_RE = re.compile("[" + re.escape(DELIMITERS) + "]+")

# Default configuration: 3-grams, start pad 2, stop pad 0 (config 400).
DEFAULT_INDEX_SIZES: tuple[int, ...] = (3,)
DEFAULT_START_PAD = 2
DEFAULT_STOP_PAD = 0


def _ngrams_of(padded: str, sizes: tuple[int, ...]) -> Iterator[tuple[str, int]]:
    """Yield (gram, position) over the padded text for each configured size.

    Multi-size rule (Tokenizer.cs:288-298): if the padded text is no longer
    than the smallest size, only the smallest size runs.
    """
    max_size = sizes[-1]
    if len(padded) <= sizes[0]:
        max_size = sizes[0]
    all_pad = frozenset((START_PAD, STOP_PAD))
    for n in sizes:
        if len(padded) >= n:
            for i in range(len(padded) - n + 1):
                gram = padded[i : i + n]
                if all(c in all_pad for c in gram):
                    continue
                yield gram, i
        if n == max_size:
            break


def _words_of(text: str, min_size: int) -> Iterator[tuple[str, int]]:
    """Yield (word, char_offset) for words of length >= min_size."""
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i] in _DELIM_SET:
            i += 1
        if i >= n:
            break
        start = i
        while i < n and text[i] not in _DELIM_SET:
            i += 1
        if i - start >= min_size:
            yield text[start:i], start


def index_tokens(
    text: str,
    sizes: tuple[int, ...] = DEFAULT_INDEX_SIZES,
    start_pad: int = DEFAULT_START_PAD,
    stop_pad: int = DEFAULT_STOP_PAD,
    segment_continuation: bool = False,
) -> list[tuple[str, int]]:
    """Index-time token stream: n-grams (in padded-position order) followed
    by words (in text order), each as (term, position-in-padded-text).

    Emission order matters for byte-saturating tf accumulation, so it is
    preserved exactly (n-grams first, then words —
    Tokenizer.EnumerateTokensForIndexing).
    """
    if not text:
        return []
    pad_prefix = "" if segment_continuation else START_PAD * start_pad
    padded = pad_prefix + text + STOP_PAD * stop_pad
    out: list[tuple[str, int]] = list(_ngrams_of(padded, sizes))
    base = 0 if segment_continuation else start_pad
    min_size = sizes[0] if sizes else 1
    for word, off in _words_of(text, min_size):
        out.append((word, base + off))
    return out


def search_tokens(
    text: str,
    sizes: tuple[int, ...] = DEFAULT_INDEX_SIZES,
    start_pad: int = DEFAULT_START_PAD,
    stop_pad: int = DEFAULT_STOP_PAD,
    high_resolution: bool = False,
) -> list[str]:
    """Query-time token stream: words first, then padded n-grams
    (Tokenizer.EnumerateShinglesForSearch). No positions at query time.

    high_resolution (A6, Tokenizer.cs:202-266): an additional query-side
    pass over the JOINED text (all delimiters removed) — its padded
    shingles, plus the whole joined text as one token when it reaches the
    minimum size. Lets 'quickfox' match documents indexed as 'quick fox'
    (the joined shingles bridge the word boundary)."""
    if text is None:
        return []
    out: list[str] = []
    min_size = sizes[0] if sizes else 1
    out.extend(w for w, _ in _words_of(text, min_size))
    padded = START_PAD * start_pad + text + STOP_PAD * stop_pad
    out.extend(g for g, _ in _ngrams_of(padded, sizes))
    if high_resolution:
        joined = "".join(c for c in text if c not in _DELIM_SET)
        padded_joined = START_PAD * start_pad + joined + STOP_PAD * stop_pad
        out.extend(g for g, _ in _ngrams_of(padded_joined, sizes))
        if len(joined) >= min_size:
            out.append(joined)
    return out


def word_tokens(text: str, min_size: int = 1) -> list[str]:
    """Plain word split on the delimiter set (no padding, no grams)."""
    return [w for w in _DELIM_RE.split(text) if len(w) >= min_size]


def term_counts(tokens: Iterable[tuple[str, int]]) -> Counter:
    """Occurrence count per term from an index_tokens stream."""
    return Counter(term for term, _ in tokens)
