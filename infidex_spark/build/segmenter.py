"""Auto-segmentation of long documents into overlapping chunks (A7) and
query-time segment consolidation (D12).

Reference analogue: Core/AutoSegmenter.cs:8-233 (target ~200-char chunks,
20% overlap, split on word boundaries; segment 0 of a document carries
the original identity) and Scoring/SegmentProcessor.cs:14-37 (best-scoring
segment per DocumentKey wins). The reference ships the segmenter as a
client-side utility (its engine never calls it); we keep the same shape:
segment first, index the segments, consolidate at query time.

Functionally equivalent, not byte-identical: chunk boundaries come from
the same rule (fill to target size at word boundaries, back up by
overlap_ratio of the chunk) but without replicating the C# span
arithmetic — boundaries are an indexing choice, not a parity surface.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

if TYPE_CHECKING:  # pyspark is imported lazily inside segment_docs so
    # the query-time consolidate() (used by every executor search) does
    # not drag the whole pyspark package into a reader-only process
    from pyspark.sql import DataFrame

from infidex_spark.kernel.tokenize import word_tokens

DEFAULT_MAX_TEXT = 300  # ConfigurationParameters.MaxIndexTextLength
DEFAULT_TARGET = 200  # AutoSegmentationSetup(200, 0.2)
DEFAULT_OVERLAP = 0.2


def segment_text(
    text: str,
    max_text: int = DEFAULT_MAX_TEXT,
    target: int = DEFAULT_TARGET,
    overlap: float = DEFAULT_OVERLAP,
) -> list[str]:
    """Split one document into overlapping word-boundary chunks; texts at
    or under max_text stay whole."""
    if text is None:
        return [""]
    if len(text) <= max_text:
        return [text]
    words = word_tokens(text, min_size=1)
    if len(words) <= 1:
        return [text]
    segments: list[str] = []
    i = 0
    n = len(words)
    while i < n:
        j = i
        size = 0
        while j < n and size + len(words[j]) + (1 if size else 0) <= target:
            size += len(words[j]) + (1 if size else 0)
            j += 1
        if j == i:  # single word longer than target
            j = i + 1
        segments.append(" ".join(words[i:j]))
        if j >= n:
            break
        # back up by ~overlap of the chunk's characters (word-aligned)
        back_chars = int(size * overlap)
        k = j
        acc = 0
        while k > i + 1 and acc < back_chars:
            k -= 1
            acc += len(words[k]) + 1
        i = k
    return segments


SEGMENTS_SCHEMA = "doc_key long, seg_no int, text string"


def segment_docs(
    docs: DataFrame,
    max_text: int = DEFAULT_MAX_TEXT,
    target: int = DEFAULT_TARGET,
    overlap: float = DEFAULT_OVERLAP,
) -> DataFrame:
    """docs(doc_key, text) -> one row per segment (doc_key, seg_no, text).
    Pair with webtext.with_doc_ids (ordering by (doc_key, seg_no)) to get
    dense per-segment doc_ids; doc_key stays the external identity, so
    query-time consolidation collapses segments back to documents."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, segs, texts = [], [], []
            for key, text in zip(pdf["doc_key"], pdf["text"]):
                for s, chunk in enumerate(segment_text(text or "", max_text, target, overlap)):
                    keys.append(int(key))
                    segs.append(s)
                    texts.append(chunk)
            yield pd.DataFrame({"doc_key": keys, "seg_no": segs, "text": texts})

    return docs.select("doc_key", "text").mapInPandas(run, schema=SEGMENTS_SCHEMA)


def consolidate(hits: list[tuple[int, float]], k: int) -> list[tuple[int, float]]:
    """SegmentProcessor.ConsolidateSegments: best score per doc_key, then
    (score desc, key asc), truncated to k."""
    best: dict[int, float] = {}
    for key, score in hits:
        if key not in best or score > best[key]:
            best[key] = score
    out = sorted(best.items(), key=lambda t: (-t[1], t[0]))
    return out[:k]
