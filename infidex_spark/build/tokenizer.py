"""Arrow-batch tokenizer: vectorized n-gram + word extraction over a
pandas Series of documents.

Produces per-document term occurrence counts — identical multisets to the
kernel tokenizer (kernel/tokenize.py::index_tokens, itself mirroring
Tokenizer.cs:75-139) but computed with numpy over the whole Arrow batch:

- all documents in a batch are padded and concatenated into one codepoint
  array; n-grams are overlapping windows packed into uint64 keys
  (21 bits/codepoint), counted with a single lexsort + run-length pass;
- words come from one vectorized regex split over the batch;
- per-(doc, term) counts from grams and words are summed (a 3-char word
  IS its own 3-gram term and must merge).

This is the map stage of the index build; it runs inside mapInPandas so
the only Python-interpreter work per document is O(unique terms), not
O(characters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from infidex_spark.kernel.normalize import normalize_series
from infidex_spark.kernel.tokenize import (
    DEFAULT_INDEX_SIZES,
    DEFAULT_START_PAD,
    DELIMITERS,
    START_PAD,
    STOP_PAD,
)

_DELIM_SPLIT = "[" + "".join("\\" + c for c in DELIMITERS) + "]+"
_PAD_CPS = frozenset((ord(START_PAD), ord(STOP_PAD)))


def _gram_counts(
    texts: pd.Series, size: int, start_pad: int, only_docs: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_idx, gram_key_uint64, count) for one n-gram size.

    only_docs: boolean mask of docs participating at this size (multi-size
    rule: docs whose padded length <= min size only use the min size).
    """
    padded = (START_PAD * start_pad) + texts.fillna("")
    if only_docs is not None:
        padded = padded.where(pd.Series(only_docs, index=padded.index), "")
    blob = "".join(padded.tolist())
    if not blob:
        return (np.zeros(0, np.int64), np.zeros(0, np.uint64), np.zeros(0, np.int64))
    cps = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
    lengths = padded.str.len().to_numpy(dtype=np.int64)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    n = cps.size
    if n < size:
        return (np.zeros(0, np.int64), np.zeros(0, np.uint64), np.zeros(0, np.int64))
    # window start positions that stay inside one doc
    pos = np.arange(n - size + 1)
    doc_of = np.searchsorted(ends, pos, side="right")
    valid = pos + size <= ends[doc_of]
    pos = pos[valid]
    doc_of = doc_of[valid]
    # pack codepoints into a uint64 key (21 bits each, size<=3)
    key = np.zeros(pos.size, dtype=np.uint64)
    for j in range(size):
        key = (key << np.uint64(21)) | cps[pos + j].astype(np.uint64)
    # drop all-padding windows
    pad_keys = set()
    if size <= 3:
        from itertools import product

        for combo in product(_PAD_CPS, repeat=size):
            k = 0
            for c in combo:
                k = (k << 21) | c
            pad_keys.add(k)
    if pad_keys:
        mask = ~np.isin(key, np.fromiter(pad_keys, dtype=np.uint64))
        key, doc_of = key[mask], doc_of[mask]
    if key.size == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.uint64), np.zeros(0, np.int64))
    order = np.lexsort((key, doc_of))
    key, doc_of = key[order], doc_of[order]
    boundary = np.empty(key.size, dtype=bool)
    boundary[0] = True
    boundary[1:] = (key[1:] != key[:-1]) | (doc_of[1:] != doc_of[:-1])
    idx = np.flatnonzero(boundary)
    counts = np.diff(np.append(idx, key.size))
    return doc_of[idx], key[idx], counts


def _key_to_str(keys: np.ndarray, size: int) -> list[str]:
    chars = np.empty((keys.size, size), dtype=np.uint32)
    k = keys.copy()
    for j in range(size - 1, -1, -1):
        chars[:, j] = (k & np.uint64((1 << 21) - 1)).astype(np.uint32)
        k = k >> np.uint64(21)
    return [bytes(row).decode("utf-32-le") for row in chars.view(np.uint8).reshape(keys.size, size * 4)]


def tokenize_batch(
    texts: pd.Series,
    sizes: tuple[int, ...] = DEFAULT_INDEX_SIZES,
    start_pad: int = DEFAULT_START_PAD,
    prenormalized: bool = False,
) -> pd.DataFrame:
    """Per-document term occurrence counts for an Arrow batch.

    Returns DataFrame(doc_idx:int64, term:str, occ:int64) where doc_idx is
    the positional index into ``texts``.
    """
    if not prenormalized:
        texts = normalize_series(texts.fillna("")).str.lower()
    texts = texts.reset_index(drop=True)
    frames: list[pd.DataFrame] = []

    # multi-size rule: padded length <= sizes[0] -> only sizes[0]
    padded_len = texts.str.len().to_numpy(dtype=np.int64) + start_pad
    max_size = sizes[-1]
    for size in sizes:
        if size == sizes[0]:
            only = None  # smallest size: all docs
        else:
            only = padded_len > sizes[0]
        d, k, c = _gram_counts(texts, size, start_pad, only)
        if k.size:
            # unique keys across the batch -> strings once
            uniq, inv = np.unique(k, return_inverse=True)
            strs = _key_to_str(uniq, size)
            frames.append(
                pd.DataFrame(
                    {
                        "doc_idx": d,
                        "term": pd.array([strs[i] for i in inv], dtype="object"),
                        "occ": c,
                    }
                )
            )
        if size == max_size:
            break

    # words >= min size
    min_size = sizes[0]
    words = texts.str.split(_DELIM_SPLIT, regex=True).explode()
    words = words[words.str.len() >= min_size]
    if len(words):
        wdf = pd.DataFrame({"doc_idx": words.index.to_numpy(np.int64), "term": words.to_numpy()})
        wc = wdf.groupby(["doc_idx", "term"], sort=False).size().reset_index(name="occ")
        frames.append(wc)

    if not frames:
        return pd.DataFrame({"doc_idx": pd.array([], dtype="int64"), "term": pd.array([], dtype="object"), "occ": pd.array([], dtype="int64")})
    out = pd.concat(frames, ignore_index=True)
    # merge grams and words that are the same term (e.g. 3-char words)
    out = out.groupby(["doc_idx", "term"], sort=False, as_index=False)["occ"].sum()
    return out
