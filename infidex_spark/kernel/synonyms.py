"""Synonym canonicalization: union-find over synonym pairs, every word
token rewritten to its class root before indexing and querying.

Semantics mirror the reference SynonymMap
(/root/reference/src/Infidex/Synonyms/SynonymMap.cs:129-250):
- pairs are bidirectional; groups = all pairs;
- the canonical root of a merged class is the LONGER root, ties broken by
  lexicographic (ordinal) order — deterministic regardless of insertion
  order of equal-length roots;
- CanonicalizeText splits on the tokenizer delimiter set, rewrites each
  token to its root, preserves delimiters verbatim;
- terms never mentioned in a pair canonicalize to themselves.
"""

from __future__ import annotations

import re

from infidex_spark.kernel.tokenize import DELIMITERS

_DELIM_TOKEN_RE = re.compile("([" + re.escape(DELIMITERS) + "]+)")


class SynonymMap:
    def __init__(self) -> None:
        self._parent: dict[str, str] = {}

    def add(self, term1: str, term2: str) -> None:
        t1 = (term1 or "").strip().lower()
        t2 = (term2 or "").strip().lower()
        if not t1 or not t2 or t1 == t2:
            return
        self._union(t1, t2)

    def add_group(self, *terms: str) -> None:
        for i in range(len(terms)):
            for j in range(i + 1, len(terms)):
                self.add(terms[i], terms[j])

    @property
    def has_mappings(self) -> bool:
        return bool(self._parent)

    def canonical(self, term: str) -> str:
        t = (term or "").strip().lower()
        if t not in self._parent:
            return t
        return self._find(t)

    def canonicalize_text(self, text: str) -> str:
        """Rewrite word tokens to class roots; delimiters preserved.
        Input should already be normalized + lowercased."""
        if not text or not self._parent:
            return text
        parts = _DELIM_TOKEN_RE.split(text)
        # parts alternate token/delimiter; delimiter groups match the regex
        return "".join(
            p if (i % 2 == 1) else (self._find(p) if p in self._parent else p)
            for i, p in enumerate(parts)
        )

    def as_pairs(self) -> list[tuple[str, str]]:
        """(term, canonical_root) rows for every mapped term — the
        broadcast table used by the Spark build."""
        return sorted((t, self._find(t)) for t in self._parent)

    def canonicalize_series(self, series):
        """Vectorized-ish canonicalization over a pandas Series: a single
        alternation regex over the (small) mapped vocabulary, bounded by
        the delimiter class, replaced via dict lookup."""
        if not self._parent:
            return series
        mapping = {t: self._find(t) for t in self._parent}
        d = re.escape(DELIMITERS)
        pat = re.compile(
            "(?:(?<=[" + d + "])|^)("
            + "|".join(re.escape(t) for t in sorted(mapping, key=len, reverse=True))
            + ")(?=[" + d + "]|$)"
        )
        return series.str.replace(pat, lambda m: mapping[m.group(1)], regex=True)

    def to_json(self) -> list[list[str]]:
        return [[t, r] for t, r in self.as_pairs()]

    @classmethod
    def from_json(cls, rows) -> "SynonymMap":
        m = cls()
        for t, root in rows or []:
            m._parent[t] = root
        return m

    # union-find with the reference's canonical-root preference
    def _find(self, t: str) -> str:
        parent = self._parent.get(t, t)
        if parent != t:
            root = self._find(parent)
            self._parent[t] = root
            return root
        return t

    def _union(self, t1: str, t2: str) -> None:
        self._parent.setdefault(t1, t1)
        self._parent.setdefault(t2, t2)
        r1, r2 = self._find(t1), self._find(t2)
        if r1 == r2:
            return
        if len(r1) != len(r2):
            canon, other = (r1, r2) if len(r1) >= len(r2) else (r2, r1)
        else:
            canon, other = (r1, r2) if r1 <= r2 else (r2, r1)
        self._parent[other] = canon
