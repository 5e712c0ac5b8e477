"""WordMatcher vocabulary index: sorted-array affix lookups + length-
bucketed LD1 candidates (replaces O(vocab) Python scans; same results,
tested via the full-pipeline parity suite)."""

from __future__ import annotations

from bisect import bisect_left

from infidex_spark.kernel.engine import levenshtein_le1


class AffixVocab:
    def __init__(self, words) -> None:
        self.sorted = sorted(words)
        self.rev_sorted = sorted(w[::-1] for w in self.sorted)
        self.by_len: dict[int, list[str]] = {}
        for w in self.sorted:
            if 2 <= len(w) <= 8:
                self.by_len.setdefault(len(w), []).append(w)

    def _range(self, arr: list[str], prefix: str) -> list[str]:
        lo = bisect_left(arr, prefix)
        hi = bisect_left(arr, prefix + "￿")
        return arr[lo:hi]

    def with_prefix(self, w: str) -> list[str]:
        return [x for x in self._range(self.sorted, w) if x != w]

    def with_suffix(self, w: str) -> list[str]:
        rw = w[::-1]
        return [x[::-1] for x in self._range(self.rev_sorted, rw) if x[::-1] != w]

    def ld1(self, w: str) -> list[str]:
        out = []
        for length in (len(w) - 1, len(w), len(w) + 1):
            for cand in self.by_len.get(length, ()):
                if levenshtein_le1(w, cand):
                    out.append(cand)
        return out
