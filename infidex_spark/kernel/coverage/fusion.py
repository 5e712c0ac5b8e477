"""Fusion signals (E9) — port of Coverage/FusionSignalComputer.cs.

Operates on UNFILTERED tokens (min word size 0, duplicates kept), unlike
the matcher cascade. Inputs are already lowercased, so the reference's
OrdinalIgnoreCase comparisons reduce to plain string ops.
"""

from __future__ import annotations

from dataclasses import dataclass

from infidex_spark.kernel.coverage.metrics import damerau_restricted
from infidex_spark.kernel.coverage.state import Token, _raw_tokens

ANCHOR_STEM_LENGTH = 3
MAX_TRAILING_TERM_LENGTH_FOR_BONUS = 2


@dataclass
class FusionSignals:
    unfiltered_query_token_count: int = 0
    lexical_prefix_last: bool = False
    all_preceding_exact: bool = False
    is_perfect_doc_lexical: bool = False
    has_stem_evidence: bool = False
    has_anchor_stem: bool = False
    trailing_match_density: int = 0  # byte
    single_term_lexical_sim: int = 0  # byte
    single_char_last_token_boost: int = 0


def compute_fusion_signals(
    query: str,
    doc_text: str,
    min_stem_length: int,
    q_tokens: list[Token] | None = None,
    d_tokens: list[Token] | None = None,
    memo: dict | None = None,
    d_set: frozenset[str] | None = None,
    d_uniq: list[str] | None = None,
) -> FusionSignals:
    """q_tokens/d_tokens: optional precomputed _raw_tokens(text, 0) (the
    engine passes its per-query / per-candidate tokens to avoid double
    tokenization); d_set: optional set of d_tokens texts; d_uniq:
    optional unique texts in first-occurrence order (order-independent
    any/all/max loops run over it instead of the raw duplicated stream);
    memo: optional per-query pair-metric memo."""
    if q_tokens is None:
        q_tokens = _raw_tokens(query, 0)
    if d_tokens is None:
        d_tokens = _raw_tokens(doc_text, 0)
    if memo is None:
        memo = {}
    if d_uniq is None:
        seen: set[str] = set()
        d_uniq = []
        for d in d_tokens:
            if d.text not in seen:
                seen.add(d.text)
                d_uniq.append(d.text)
    if d_set is None:
        d_set = frozenset(d_uniq)
    q_count, d_count = len(q_tokens), len(d_tokens)
    sig = FusionSignals(unfiltered_query_token_count=q_count)
    if q_count == 0 or d_count == 0:
        return sig

    sig.lexical_prefix_last, sig.all_preceding_exact = _check_prefix_last(
        q_tokens, d_uniq, d_set
    )
    sig.is_perfect_doc_lexical = _perfect_doc(q_tokens, d_uniq, memo)
    if q_count >= 2:
        sig.has_stem_evidence = _stem_evidence(
            q_tokens, d_uniq, min_stem_length, memo
        )

    first = q_tokens[0].text
    if len(first) >= ANCHOR_STEM_LENGTH:
        stem = first[:ANCHOR_STEM_LENGTH]
        sig.has_anchor_stem = any(
            len(t) >= len(stem) and t.startswith(stem) for t in d_uniq
        )

    if q_count >= 2:
        last = q_tokens[-1].text
        if 1 <= len(last) <= MAX_TRAILING_TERM_LENGTH_FOR_BONUS:
            matchable = sum(
                1
                for d in d_tokens
                if d.text.startswith(last)
                or (len(d.text) > len(last) and last in d.text)
            )
            if matchable > 0:
                density = matchable / d_count
                sig.trailing_match_density = int(min(max(density * 255.0, 0.0), 255.0))

    if q_count == 1:
        sim = _single_term_similarity(q_tokens[0].text, d_uniq, memo)
        sig.single_term_lexical_sim = int(min(max(sim * 255.0, 0.0), 255.0))

    if q_count >= 2:
        sig.single_char_last_token_boost = _single_char_last_token(
            q_tokens, d_tokens, doc_text
        )
    return sig


def _check_prefix_last(
    q_tokens: list[Token], d_uniq: list[str], d_set: frozenset[str]
) -> tuple[bool, bool]:
    # d_uniq preserves first-occurrence order, so the first
    # startswith-match over it is the first match over the raw stream
    q_count = len(q_tokens)
    if q_count == 1:
        q = q_tokens[0].text
        for t in d_uniq:
            if t.startswith(q):
                return True, t == q
        return False, False
    for qt in q_tokens[:-1]:
        if not qt.text:
            continue
        if qt.text not in d_set:
            return False, False
    last = q_tokens[-1].text
    if not last:
        return True, True
    for t in d_uniq:
        if t.startswith(last):
            return True, True
    return False, False


def _perfect_doc(q_tokens: list[Token], d_uniq: list[str], memo: dict) -> bool:
    # per doc-word result is query-constant: memoize on the word text
    for t in d_uniq:
        mkey = ("pd", t)
        ok = memo.get(mkey)
        if ok is None:
            ok = any(
                t.startswith(q.text) or q.text.startswith(t)
                for q in q_tokens
            )
            memo[mkey] = ok
        if not ok:
            return False
    return True


def _stem_pair(q: str, dt: str, min_stem: int) -> bool:
    """Does doc word dt provide stem evidence for unmatched query term q?"""
    if len(dt) < min_stem:
        return False
    if q.startswith(dt):
        return True
    if min(len(q), len(dt)) >= min_stem:
        prefix_len = 0
        for a, b in zip(q, dt):
            if a == b:
                prefix_len += 1
            else:
                break
        if prefix_len >= min_stem:
            return True
    return False


def _stem_evidence(
    q_tokens: list[Token], d_uniq: list[str], min_stem: int, memo: dict
) -> bool:
    # any()-style scans: duplicates contribute nothing, so the unique
    # word list is equivalent to the raw stream
    unmatched = 0
    evidence = 0
    mget = memo.get
    for qt in q_tokens:
        q = qt.text
        if len(q) < min_stem:
            continue
        prefixed = False
        for dt in d_uniq:
            mkey = ("sw", q, dt)
            hit = mget(mkey)
            if hit is None:
                hit = bool(dt) and (dt == q or dt.startswith(q))
                memo[mkey] = hit
            if hit:
                prefixed = True
                break
        if prefixed:
            continue
        unmatched += 1
        for dt in d_uniq:
            mkey = ("st", q, dt)
            hit = mget(mkey)
            if hit is None:
                hit = _stem_pair(q, dt, min_stem)
                memo[mkey] = hit
            if hit:
                evidence += 1
                break
    return unmatched > 0 and evidence == unmatched


def _single_char_last_token(
    q_tokens: list[Token], d_tokens: list[Token], doc_text: str
) -> int:
    last = q_tokens[-1]
    if len(last.text) != 1:
        return 0
    target = last.text[0]
    if not target.isalpha():
        return 0
    d_index = 0
    first_match_index = -1
    for qt in q_tokens[:-1]:
        found = False
        while d_index < len(d_tokens):
            if qt.text in d_tokens[d_index].text:
                found = True
                if first_match_index == -1:
                    first_match_index = d_index
                break
            d_index += 1
        if not found:
            return 0
    if d_index + 1 < len(d_tokens):
        nxt = d_tokens[d_index + 1]
        if nxt.text and nxt.text[0] == target:
            end_of_last = d_tokens[d_index].position + len(d_tokens[d_index].text)
            between = doc_text[end_of_last : nxt.position]
            if all(c.isspace() for c in between):
                boost = 8 + max(0, 16 - first_match_index)
                if len(nxt.text) == 1:
                    boost += 4
                return boost
    return 0


def _sts_token(query: str, t: str, q_len: int) -> float:
    """Per-token similarity contribution (query-constant: memoized)."""
    idx = query.find(t)
    if idx >= 0:
        return (len(t) / q_len) * (1.0 - idx / q_len)
    max_k = min(q_len, len(t))
    best_k = 0
    for length in range(max_k, 1, -1):
        if query[q_len - length :] == t[:length]:
            best_k = length
            break
    prefix_suffix = best_k / q_len if best_k else 0.0
    fuzzy = 0.0
    if len(t) <= 32:
        dist = damerau_restricted(query, t, 2)
        if dist <= 2:
            fuzzy = (q_len - dist) / q_len
    return max(prefix_suffix, fuzzy)


def _single_term_similarity(query: str, d_uniq: list[str], memo: dict) -> float:
    # max() over memoized per-text scores: the unique word list is
    # equivalent to the raw stream; the two-segment first-hit indexes
    # compare equal/unequal identically because duplicates of a text
    # share flags (the first raw hit IS a first occurrence)
    q_len = len(query)
    if q_len < 3:
        return 0.0
    best = 0.0
    for t in d_uniq:
        if len(t) < 2:
            continue
        mkey = ("ss", t)
        score = memo.get(mkey)
        if score is None:
            score = _sts_token(query, t, q_len)
            memo[mkey] = score
        best = max(best, score)
    # two-segment heuristic: query split across two doc tokens
    MIN_SEG = 3
    if q_len >= 2 * MIN_SEG:
        seg_len = min(2 * MIN_SEG, q_len // 2)
        prefix_frag = query[:seg_len]
        suffix_frag = query[q_len - seg_len :]
        p_idx = s_idx = -1
        mget = memo.get
        for i, t in enumerate(d_uniq):
            if len(t) < 3:
                continue
            mkey = ("2s", t)
            flags = mget(mkey)
            if flags is None:
                flags = (
                    t.startswith(prefix_frag) or prefix_frag.startswith(t),
                    t.endswith(suffix_frag) or suffix_frag.endswith(t),
                )
                memo[mkey] = flags
            if p_idx == -1 and flags[0]:
                p_idx = i
            if s_idx == -1 and flags[1]:
                s_idx = i
            if p_idx != -1 and s_idx != -1:
                break
        if p_idx != -1 and s_idx != -1 and p_idx != s_idx:
            best = max(best, min(1.0, (len(prefix_frag) + len(suffix_frag)) / q_len))
    return best
