"""WordMatcher vocabulary index.

- Affix lookups: sorted-array binary search with the reference's shared
  per-query-word budget of 4096 terms — prefix matches are taken first
  (lexicographic order), then suffix matches consume the remainder
  (reference: WordMatcher.cs:41 MaxFstAffixTermsPerQuery, LookupAffix
  WordMatcher.cs:276-340 takes prefix count first, suffix second).
- LD1 lookups: symmetric-delete dictionary (delete-1 variants of every
  2-8 char vocab word), confirmed with the exact metric — same results
  as the previous length-bucket scan (tested), O(len(w)) probes instead
  of O(|bucket|) distance computations.
"""

from __future__ import annotations

from bisect import bisect_left

from infidex_spark.kernel.engine import levenshtein_le1

MAX_AFFIX_TERMS_PER_QUERY = 4096  # reference WordMatcher.cs:41


class AffixVocab:
    def __init__(self, words) -> None:
        # the affix FST only indexes words len >= MinimumWordSizeLD1 = 3
        # (WordMatcher.cs Load: IndexWordInFst gate)
        self.sorted = sorted(w for w in words if len(w) >= 3)
        self.rev_sorted = sorted(w[::-1] for w in self.sorted)
        # symmetric-delete table over 2-8 char words, built lazily: the
        # LD1 candidate range is unchanged from the length-bucket design
        # (callers only probe 3-8 char query words; variants come from
        # the same 2-8 char vocabulary slice)
        self._words_2_8 = [w for w in words if 2 <= len(w) <= 8]
        self._del1: dict[str, list[str]] | None = None

    # ------------------------------------------------------------- affix

    def _range(self, arr: list[str], prefix: str, limit: int) -> list[str]:
        lo = bisect_left(arr, prefix)
        hi = bisect_left(arr, prefix + "￿", lo)
        if hi - lo > limit:
            hi = lo + limit
        return arr[lo:hi]

    def with_prefix(self, w: str, limit: int = MAX_AFFIX_TERMS_PER_QUERY) -> list[str]:
        # over-fetch by one so the excluded exact word doesn't eat budget
        out = self._range(self.sorted, w, limit + 1)
        return [x for x in out if x != w][:limit]

    def with_suffix(self, w: str, limit: int = MAX_AFFIX_TERMS_PER_QUERY) -> list[str]:
        rw = w[::-1]
        out = self._range(self.rev_sorted, rw, limit + 1)
        return [x[::-1] for x in out if x != rw][:limit]

    def affix_terms(self, w: str) -> list[str]:
        """Prefix + suffix matches for one query word under the shared
        4096-term budget (prefix first, reference order)."""
        pre = self.with_prefix(w, MAX_AFFIX_TERMS_PER_QUERY)
        remaining = MAX_AFFIX_TERMS_PER_QUERY - len(pre)
        if remaining <= 0:
            return pre
        return pre + self.with_suffix(w, remaining)

    # --------------------------------------------------------------- ld1

    def _build_del1(self) -> dict[str, list[str]]:
        table: dict[str, list[str]] = {}
        for w in sorted(self._words_2_8):
            table.setdefault(w, []).append(w)
            for i in range(len(w)):
                table.setdefault(w[:i] + w[i + 1 :], []).append(w)
        return table

    def ld1(self, w: str) -> list[str]:
        if self._del1 is None:
            self._del1 = self._build_del1()
        probes = {w}
        for i in range(len(w)):
            probes.add(w[:i] + w[i + 1 :])
        cands: set[str] = set()
        for p in probes:
            got = self._del1.get(p)
            if got:
                cands.update(got)
        # symmetric-delete overgenerates (same-length double substitution
        # shares a delete); confirm with the exact metric
        return sorted(c for c in cands if levenshtein_le1(w, c))
