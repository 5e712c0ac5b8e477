"""Word matchers over MatchState — ports of Coverage/WholeWordMatcher.cs,
JoinedWordMatcher.cs, and FuzzyWordMatcher.cs (ordering, state mutations,
and scoring contributions preserved exactly; see each function)."""

from __future__ import annotations

from infidex_spark.kernel.coverage.config import CoverageConfig
from infidex_spark.kernel.coverage.metrics import damerau_restricted
from infidex_spark.kernel.coverage.state import MatchState


def _doc_index(state: MatchState) -> dict:
    if state.d_index is None:
        # doc_tokens are unique by text (engine.doc_view dedupes)
        state.d_index = {t.text: j for j, t in enumerate(state.doc_tokens)}
    return state.d_index


def match_whole_words(state: MatchState) -> None:
    """WholeWordMatcher.Match (E3): exact token matches, positional
    mismatch penalty, phrase-bonus char (+1 between multi-term hits).
    The first-active-equal-text scan is a dict lookup: doc tokens are
    unique by text, so at most one index can match."""
    q_count, d_count = state.q_count, state.d_count
    d_index = _doc_index(state)
    p_increment = 1 if q_count > 1 else 0
    for i in range(q_count):
        q = state.query_tokens[i]
        j = d_index.get(q.text, -1)
        match_index = j if j >= 0 and state.d_active[j] else -1
        if match_index == -1:
            continue
        state.word_hits += 1
        state.num_whole += len(q.text)
        state.term_matched_chars[i] += len(q.text)
        state.term_has_whole[i] = True
        state.term_has_prefix[i] = True
        pos = state.doc_tokens[match_index].position
        if state.term_first_pos[i] == -1 or pos < state.term_first_pos[i]:
            state.term_first_pos[i] = pos
        # penalty when the i-th doc token is not the i-th query token
        if d_count > i:
            if state.doc_tokens[i].text != q.text:
                state.penalty += 1
        else:
            state.penalty += 1
        if i < q_count - 1:
            state.num_whole += p_increment
        state.q_active[i] = False
        state.d_active[match_index] = False


def match_joined_words(state: MatchState) -> None:
    """JoinedWordMatcher.Match (E4): query bigram == doc token and the
    inverse (doc bigram == query token)."""
    _match_query_joined(state)
    _match_doc_joined(state)


def _match_query_joined(state: MatchState) -> None:
    q_count = state.q_count
    d_index = _doc_index(state)
    for i in range(q_count - 1):
        if not (state.q_active[i] and state.q_active[i + 1]):
            continue
        next_idx = -1
        for k in range(i + 1, q_count):
            if state.q_active[k]:
                next_idx = k
                break
        if next_idx == -1:
            break
        q1, q2 = state.query_tokens[i], state.query_tokens[next_idx]
        joined_len = len(q1.text) + len(q2.text)
        # len == len(q1)+len(q2) + startswith(q1) + endswith(q2) is
        # exactly text == q1+q2, and doc tokens are unique: dict lookup
        j = d_index.get(q1.text + q2.text, -1)
        match_index = j if j >= 0 and state.d_active[j] else -1
        if match_index == -1:
            continue
        state.num_joined += joined_len
        state.word_hits += 2
        pos = state.doc_tokens[match_index].position
        state.term_matched_chars[i] += len(q1.text)
        state.term_has_joined[i] = True
        state.term_has_prefix[i] = True
        if state.term_first_pos[i] == -1 or pos < state.term_first_pos[i]:
            state.term_first_pos[i] = pos
        state.term_matched_chars[next_idx] += len(q2.text)
        state.term_has_joined[next_idx] = True
        if state.term_first_pos[next_idx] == -1 or pos < state.term_first_pos[next_idx]:
            state.term_first_pos[next_idx] = pos
        state.q_active[i] = False
        state.q_active[next_idx] = False
        state.d_active[match_index] = False


def _match_doc_joined(state: MatchState) -> None:
    q_count, d_count = state.q_count, state.d_count
    for i in range(d_count - 1):
        if not state.d_active[i]:
            continue
        next_idx = -1
        for k in range(i + 1, d_count):
            if state.d_active[k]:
                next_idx = k
                break
        if next_idx == -1:
            break
        d1, d2 = state.doc_tokens[i], state.doc_tokens[next_idx]
        joined_len = len(d1.text) + len(d2.text)
        if joined_len not in state.q_len_set:
            continue
        if state.q_index is None:
            state.q_index = {t.text: j for j, t in enumerate(state.query_tokens)}
        j = state.q_index.get(d1.text + d2.text, -1)
        match_index = j if j >= 0 and state.q_active[j] else -1
        if match_index == -1:
            continue
        state.num_joined += joined_len
        state.word_hits += 1
        state.term_matched_chars[match_index] += joined_len
        state.term_has_joined[match_index] = True
        state.term_has_prefix[match_index] = True
        pos = d1.position
        if state.term_first_pos[match_index] == -1 or pos < state.term_first_pos[match_index]:
            state.term_first_pos[match_index] = pos
        state.q_active[match_index] = False
        state.d_active[i] = False
        state.d_active[next_idx] = False


def _token_max_edits(q_len: int, setup: CoverageConfig) -> tuple[int, bool]:
    """Per-token typo budget + special len-2 rule (FuzzyWordMatcher)."""
    if q_len >= setup.min_length_two_typos:
        max_edits = 2
    elif q_len >= setup.min_length_one_typo:
        max_edits = 1
    else:
        max_edits = 0
    special = q_len == 2 and max_edits == 0 and setup.num_typos >= 1
    if special:
        max_edits = 1
    return min(max_edits, setup.num_typos), special


def match_fuzzy_words(state: MatchState, setup: CoverageConfig) -> None:
    """FuzzyWordMatcher.Match (E6): banded Damerau-Levenshtein matching,
    distance tier by tier (all dist=1 matches before any dist=2), typo
    budgets by token length, first-char-must-match rule for len-2
    tokens. Credit per match = q_len - dist."""
    max_query_len = max(
        (len(t.text) for i, t in enumerate(state.query_tokens) if state.q_active[i]),
        default=0,
    )
    if max_query_len == 0:
        return
    global_max, _ = _token_max_edits(max_query_len, setup)
    if global_max == 0:
        return
    for edit_dist in range(1, global_max + 1):
        if not any(state.q_active):
            break
        for i in range(state.q_count):
            if not state.q_active[i]:
                continue
            q = state.query_tokens[i]
            q_len = len(q.text)
            if q_len < setup.min_word_size:
                continue
            token_max, special = _token_max_edits(q_len, setup)
            if edit_dist > token_max:
                continue
            if special and edit_dist != 1:
                continue
            min_len = max(setup.min_word_size, q_len - edit_dist)
            max_len = min(setup.levenshtein_max_word_size, q_len + edit_dist, 63)
            for j in range(state.d_count):
                if not state.d_active[j]:
                    continue
                d = state.doc_tokens[j]
                d_len = len(d.text)
                if d_len > max_len or d_len < min_len:
                    continue
                if special and (not d.text or d.text[0] != q.text[0]):
                    continue
                mkey = ("f", q.text, d.text, edit_dist)
                dist = state.memo.get(mkey)
                if dist is None:
                    dist = damerau_restricted(q.text, d.text, edit_dist)
                    state.memo[mkey] = dist
                if dist <= edit_dist:
                    state.word_hits += 1
                    state.num_fuzzy += q_len - dist
                    state.term_matched_chars[i] += q_len - dist
                    pos = d.position
                    if state.term_first_pos[i] == -1 or pos < state.term_first_pos[i]:
                        state.term_first_pos[i] = pos
                    state.q_active[i] = False
                    state.d_active[j] = False
                    break


def all_terms_fully_matched(state: MatchState) -> bool:
    for i in range(state.q_count):
        if state.term_max_chars[i] > 0 and state.term_matched_chars[i] < state.term_max_chars[i]:
            return False
    return True


def match_prefix_suffix(state: MatchState) -> None:
    """PrefixSuffixMatcher.Match (E5): pass 1 exact prefix (full credit) /
    suffix (half) / contains (0.6x, len>=4) / query-ends-with-doc-token;
    pass 2 fuzzy prefix (Damerau<=1 on doc-token slices of len q, q+1,
    q-1; len>=4, or >=2 for the final query term). Both passes visit
    tokens longest-first (stable on ties, preserving original order)."""
    q_order = sorted(
        (i for i in range(state.q_count) if state.q_active[i]),
        key=lambda i: -len(state.query_tokens[i].text),
    )
    if state.d_order_full is not None:
        # precomputed length-desc stable order (doc_view); inactive
        # entries are skipped inside the passes, which is the same
        # sequence as sorting the active subset (stable sort)
        d_order = [j for j in state.d_order_full if state.d_active[j]]
    else:
        d_order = sorted(
            (j for j in range(state.d_count) if state.d_active[j]),
            key=lambda j: -len(state.doc_tokens[j].text),
        )
    _match_exact_affix(state, q_order, d_order)
    _match_fuzzy_prefix(state, q_order, d_order)


def _affix_credit(state: MatchState, i: int, j: int, score: float, is_prefix: bool) -> None:
    state.num_prefix_suffix += score
    state.word_hits += 1
    state.term_matched_chars[i] += score
    if is_prefix:
        state.term_has_prefix[i] = True
    pos = state.doc_tokens[j].position
    if state.term_first_pos[i] == -1 or pos < state.term_first_pos[i]:
        state.term_first_pos[i] = pos
    state.q_active[i] = False
    state.d_active[j] = False


def _exact_affix_pair(q: str, d: str) -> tuple[bool, float, bool]:
    """Pure pair function behind pass 1 of PrefixSuffixMatcher (memoized
    per query in MatchState.memo)."""
    if len(q) == len(d):
        return False, 0.0, False
    if len(q) < len(d):
        if d.startswith(q):
            return True, float(len(q)), True
        if d.endswith(q):
            return True, float(max(1, len(q) // 2)), False
        if len(q) >= 4 and q in d:
            return True, len(q) * 0.6, False
    elif q.endswith(d):
        return True, float(len(d)), False
    return False, 0.0, False


def _match_exact_affix(state: MatchState, q_order: list[int], d_order: list[int]) -> None:
    memo = state.memo
    for i in q_order:
        if not state.q_active[i]:
            continue
        q = state.query_tokens[i].text
        for j in d_order:
            if not state.d_active[j]:
                continue
            d = state.doc_tokens[j].text
            mkey = ("a", q, d)
            res = memo.get(mkey)
            if res is None:
                res = _exact_affix_pair(q, d)
                memo[mkey] = res
            matched, score, is_prefix = res
            if matched:
                _affix_credit(state, i, j, score, is_prefix)
                break


def _fuzzy_prefix_pair(q: str, d: str) -> tuple[bool, float]:
    """Pure pair function behind pass 2 of PrefixSuffixMatcher (memoized
    per query in MatchState.memo). Caller guarantees len(q) < len(d)."""
    q_len = len(q)
    dist = damerau_restricted(q, d[:q_len], 1)
    if dist <= 1:
        return True, max(q_len - dist, 0.1)
    if len(d) > q_len:
        dist = damerau_restricted(q, d[: q_len + 1], 1)
        if dist <= 1:
            return True, max(q_len - dist, 0.1)
        if q_len > 1:
            dist = damerau_restricted(q, d[: q_len - 1], 1)
            if dist <= 1:
                return True, max(q_len - 1 - dist, 0.1)
    return False, 0.0


def _match_fuzzy_prefix(state: MatchState, q_order: list[int], d_order: list[int]) -> None:
    q_count = state.q_count
    memo = state.memo
    for i in q_order:
        if not state.q_active[i]:
            continue
        q = state.query_tokens[i].text
        q_len = len(q)
        if not (q_len >= 4 or (i == q_count - 1 and q_len >= 2)):
            continue
        for j in d_order:
            if not state.d_active[j]:
                continue
            d = state.doc_tokens[j].text
            if q_len >= len(d):
                continue
            mkey = ("p", q, d)
            res = memo.get(mkey)
            if res is None:
                res = _fuzzy_prefix_pair(q, d)
                memo[mkey] = res
            matched, score = res
            if matched:
                _affix_credit(state, i, j, score, is_prefix=False)
                break
