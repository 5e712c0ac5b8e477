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


def compute_fusion_signals(query: str, doc_text: str, min_stem_length: int) -> FusionSignals:
    q_tokens = _raw_tokens(query, 0)
    d_tokens = _raw_tokens(doc_text, 0)
    q_count, d_count = len(q_tokens), len(d_tokens)
    sig = FusionSignals(unfiltered_query_token_count=q_count)
    if q_count == 0 or d_count == 0:
        return sig

    sig.lexical_prefix_last, sig.all_preceding_exact = _check_prefix_last(
        q_tokens, d_tokens
    )
    sig.is_perfect_doc_lexical = _perfect_doc(q_tokens, d_tokens)
    if q_count >= 2:
        sig.has_stem_evidence = _stem_evidence(q_tokens, d_tokens, min_stem_length)

    first = q_tokens[0].text
    if len(first) >= ANCHOR_STEM_LENGTH:
        stem = first[:ANCHOR_STEM_LENGTH]
        sig.has_anchor_stem = any(
            len(d.text) >= len(stem) and d.text.startswith(stem) for d in d_tokens
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
        sim = _single_term_similarity(q_tokens[0].text, d_tokens)
        sig.single_term_lexical_sim = int(min(max(sim * 255.0, 0.0), 255.0))

    if q_count >= 2:
        sig.single_char_last_token_boost = _single_char_last_token(
            q_tokens, d_tokens, doc_text
        )
    return sig


def _check_prefix_last(q_tokens: list[Token], d_tokens: list[Token]) -> tuple[bool, bool]:
    q_count = len(q_tokens)
    if q_count == 1:
        q = q_tokens[0].text
        for d in d_tokens:
            if d.text.startswith(q):
                return True, d.text == q
        return False, False
    for qt in q_tokens[:-1]:
        if not qt.text:
            continue
        if not any(d.text == qt.text for d in d_tokens):
            return False, False
    last = q_tokens[-1].text
    if not last:
        return True, True
    for d in d_tokens:
        if d.text.startswith(last):
            return True, True
    return False, False


def _perfect_doc(q_tokens: list[Token], d_tokens: list[Token]) -> bool:
    for d in d_tokens:
        if not any(
            d.text.startswith(q.text) or q.text.startswith(d.text) for q in q_tokens
        ):
            return False
    return True


def _stem_evidence(q_tokens: list[Token], d_tokens: list[Token], min_stem: int) -> bool:
    unmatched = 0
    evidence = 0
    for qt in q_tokens:
        q = qt.text
        if len(q) < min_stem:
            continue
        if any(d.text and (d.text == q or d.text.startswith(q)) for d in d_tokens):
            continue
        unmatched += 1
        for d in d_tokens:
            dt = d.text
            if len(dt) < min_stem:
                continue
            if q.startswith(dt):
                evidence += 1
                break
            max_check = min(len(q), len(dt))
            if max_check >= min_stem:
                prefix_len = 0
                for a, b in zip(q, dt):
                    if a == b:
                        prefix_len += 1
                    else:
                        break
                if prefix_len >= min_stem:
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


def _single_term_similarity(query: str, d_tokens: list[Token]) -> float:
    q_len = len(query)
    if q_len < 3:
        return 0.0
    best = 0.0
    for d in d_tokens:
        t = d.text
        if len(t) < 2:
            continue
        idx = query.find(t)
        if idx >= 0:
            score = (len(t) / q_len) * (1.0 - idx / q_len)
            best = max(best, score)
            continue
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
        best = max(best, prefix_suffix, fuzzy)
    # two-segment heuristic: query split across two doc tokens
    MIN_SEG = 3
    if q_len >= 2 * MIN_SEG:
        seg_len = min(2 * MIN_SEG, q_len // 2)
        prefix_frag = query[:seg_len]
        suffix_frag = query[q_len - seg_len :]
        p_idx = s_idx = -1
        for i, d in enumerate(d_tokens):
            t = d.text
            if len(t) < 3:
                continue
            if p_idx == -1 and (t.startswith(prefix_frag) or prefix_frag.startswith(t)):
                p_idx = i
            if s_idx == -1 and (t.endswith(suffix_frag) or suffix_frag.endswith(t)):
                s_idx = i
            if p_idx != -1 and s_idx != -1:
                break
        if p_idx != -1 and s_idx != -1 and p_idx != s_idx:
            best = max(best, min(1.0, (len(prefix_frag) + len(suffix_frag)) / q_len))
    return best
