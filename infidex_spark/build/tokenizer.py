"""Arrow-batch tokenizer: vectorized n-gram + word extraction over a
pandas Series of documents.

Produces per-document term occurrence counts — identical multisets to the
kernel tokenizer (kernel/tokenize.py::index_tokens, itself mirroring
Tokenizer.cs:75-139) but computed with numpy over the whole Arrow batch:

- all documents in a batch are padded and concatenated into one codepoint
  array; n-grams are overlapping windows packed into uint64 keys
  (21 bits/codepoint), counted with a single lexsort + run-length pass;
- words of exactly n-gram length are packed into the same key space and
  counted together with the grams (a 3-char word IS its own 3-gram term);
- longer words are counted with one pandas groupby;
- gram term columns are emitted as pandas Categorical so they stay
  dictionary-encoded through Arrow — no per-occurrence Python strings.

This is the map stage of the index build; the only Python-interpreter
work per batch is O(unique terms), not O(characters).
"""

from __future__ import annotations

from itertools import product
from typing import Iterator

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
_PAD_CPS = (ord(START_PAD), ord(STOP_PAD))


def _pack_keys(cps: np.ndarray, pos: np.ndarray, size: int) -> np.ndarray:
    """uint64 keys for windows of `size` codepoints starting at pos."""
    key = np.zeros(pos.size, dtype=np.uint64)
    for j in range(size):
        key = (key << np.uint64(21)) | cps[pos + j].astype(np.uint64)
    return key


def _pack_strings(strings: pd.Series, size: int) -> np.ndarray:
    """uint64 keys for strings of exactly `size` chars (vectorized)."""
    blob = "".join(strings.tolist())
    cps = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
    pos = np.arange(0, cps.size, size)
    return _pack_keys(cps, pos, size)


def _pad_keys(size: int) -> np.ndarray:
    out = []
    for combo in product(_PAD_CPS, repeat=size):
        k = 0
        for c in combo:
            k = (k << 21) | c
        out.append(k)
    return np.array(out, dtype=np.uint64)


def _key_to_str(keys: np.ndarray, size: int) -> list[str]:
    chars = np.empty((keys.size, size), dtype=np.uint32)
    k = keys.copy()
    for j in range(size - 1, -1, -1):
        chars[:, j] = (k & np.uint64((1 << 21) - 1)).astype(np.uint32)
        k = k >> np.uint64(21)
    flat = chars.reshape(-1).astype("<u4").tobytes()
    s = flat.decode("utf-32-le")
    return [s[i * size : (i + 1) * size] for i in range(keys.size)]


def _count_pairs(doc_of: np.ndarray, key: np.ndarray):
    """run-length count of (doc, key) pairs -> (docs, keys, counts)."""
    order = np.lexsort((key, doc_of))
    key, doc_of = key[order], doc_of[order]
    boundary = np.empty(key.size, dtype=bool)
    boundary[0] = True
    boundary[1:] = (key[1:] != key[:-1]) | (doc_of[1:] != doc_of[:-1])
    idx = np.flatnonzero(boundary)
    counts = np.diff(np.append(idx, key.size))
    return doc_of[idx], key[idx], counts


def tokenize_batch_frames(
    texts: pd.Series,
    sizes: tuple[int, ...] = DEFAULT_INDEX_SIZES,
    start_pad: int = DEFAULT_START_PAD,
    prenormalized: bool = False,
) -> Iterator[pd.DataFrame]:
    """Yield DataFrames (doc_idx int64, term, occ int64); term columns are
    Categorical for gram-size frames, object for long words. Frames are
    disjoint on (doc_idx, term) across yields."""
    if not prenormalized:
        texts = normalize_series(texts.fillna("")).str.lower()
    texts = texts.reset_index(drop=True)
    if len(texts) == 0:
        return

    # one word split for the whole batch
    words = texts.str.split(_DELIM_SPLIT, regex=True).explode()
    min_size = sizes[0]
    words = words[words.str.len() >= min_size]
    wlens = words.str.len()

    padded = (START_PAD * start_pad) + texts
    blob = "".join(padded.tolist())
    cps = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
    lengths = padded.str.len().to_numpy(dtype=np.int64)
    ends = np.cumsum(lengths)
    padded_len = lengths  # == text len + start_pad

    max_size = sizes[-1]
    for size in sizes:
        # multi-size rule: docs with padded length <= min size only use min
        if size == sizes[0]:
            doc_mask = None
        else:
            doc_mask = padded_len > sizes[0]
        n = cps.size
        if n >= size:
            pos = np.arange(n - size + 1)
            doc_of = np.searchsorted(ends, pos, side="right")
            valid = pos + size <= ends[doc_of]
            if doc_mask is not None:
                valid &= doc_mask[doc_of]
            pos, doc_of = pos[valid], doc_of[valid]
            key = _pack_keys(cps, pos, size)
            mask = ~np.isin(key, _pad_keys(size))
            key, doc_of = key[mask], doc_of[mask]
        else:
            key = np.zeros(0, dtype=np.uint64)
            doc_of = np.zeros(0, dtype=np.int64)

        # words of exactly this length live in the same key space
        sw = words[wlens == size]
        if len(sw):
            wkeys = _pack_strings(sw, size)
            key = np.concatenate([key, wkeys])
            doc_of = np.concatenate([doc_of, sw.index.to_numpy(np.int64)])

        if key.size:
            d, k, c = _count_pairs(doc_of, key)
            uniq, inv = np.unique(k, return_inverse=True)
            yield pd.DataFrame(
                {
                    "doc_idx": d,
                    "term": pd.Categorical.from_codes(inv, categories=_key_to_str(uniq, size)),
                    "occ": c,
                }
            )
        if size == max_size:
            break

    lw = words[wlens > max_size]
    if len(lw):
        wdf = pd.DataFrame({"doc_idx": lw.index.to_numpy(np.int64), "term": lw.to_numpy()})
        wc = wdf.groupby(["doc_idx", "term"], sort=False).size().reset_index(name="occ")
        yield wc


def tokenize_batch(
    texts: pd.Series,
    sizes: tuple[int, ...] = DEFAULT_INDEX_SIZES,
    start_pad: int = DEFAULT_START_PAD,
    prenormalized: bool = False,
) -> pd.DataFrame:
    """Materialized variant (tests / small inputs): one DataFrame with a
    plain-object term column."""
    frames = [
        f.assign(term=f["term"].astype(str))
        for f in tokenize_batch_frames(texts, sizes, start_pad, prenormalized)
    ]
    if not frames:
        return pd.DataFrame(
            {
                "doc_idx": pd.array([], dtype="int64"),
                "term": pd.array([], dtype="object"),
                "occ": pd.array([], dtype="int64"),
            }
        )
    return pd.concat(frames, ignore_index=True)
