"""Coverage scoring (E8) — port of Coverage/CoverageScorer.cs
CalculateFinalScore plus the CoverageResult/CoverageFeatures shapes."""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from infidex_spark.kernel.coverage.state import MatchState


@dataclass
class CoverageFeatures:
    coverage_score: int = 0  # byte
    terms_count: int = 0
    terms_with_any_match: int = 0
    terms_fully_matched: int = 0
    terms_strict_matched: int = 0
    terms_prefix_matched: int = 0
    first_match_index: int = -1
    sum_ci: float = 0.0
    word_hits: int = 0
    doc_token_count: int = 0
    longest_prefix_run: int = 0
    suffix_prefix_run: int = 0
    phrase_span: int = 0
    preceding_strict_count: int = 0
    last_token_has_prefix: bool = False
    last_term_ci: float = 0.0
    weighted_coverage: float = 0.0
    last_term_is_type_ahead: bool = False
    idf_coverage: float = 0.0
    total_idf: float = 0.0
    missing_idf: float = 0.0
    term_idf: list[float] | None = None
    term_ci: list[float] | None = None
    fusion: object = None  # FusionSignals, filled by the engine


def calculate_final_score(
    state: MatchState,
    query_len: int,
    lcs_sum: float,
    cover_whole_query: bool,
    word_level_term_idf: list[float] | None,
) -> CoverageFeatures:
    """CoverageScorer.CalculateFinalScore (CoverageScorer.cs:5-200)."""
    f = CoverageFeatures(terms_count=state.q_count, word_hits=state.word_hits,
                         doc_token_count=state.doc_token_count)
    q_count = state.q_count

    if not cover_whole_query:
        lcs_sum = 0.0
    num11 = state.num_joined + state.num_whole + state.num_fuzzy + state.num_prefix_suffix - state.penalty
    if num11 == 0.0 and lcs_sum > 2.0:
        num11 = lcs_sum - 2.0
    f.coverage_score = int(min(num11 / query_len * 255.0, 255.0)) if query_len else 0
    if f.coverage_score < 0:
        f.coverage_score = 0

    sum_ci = 0.0
    weighted_sum = 0.0
    total_weight = 0.0
    idf_weighted_sum = 0.0
    total_idf = 0.0
    missing_idf = 0.0
    last_term_ci = 0.0
    last_term_idf = 0.0
    first_match_index = -1
    min_pos, max_pos = math.inf, -1
    term_ci = [0.0] * q_count if (word_level_term_idf is not None and q_count > 0) else None

    for i in range(q_count):
        if state.term_max_chars[i] <= 0:
            continue
        ci = min(1.0, state.term_matched_chars[i] / state.term_max_chars[i])
        sum_ci += ci
        if term_ci is not None:
            term_ci[i] = ci
        if ci > 0:
            f.terms_with_any_match += 1
        term_weight = float(state.term_max_chars[i])
        total_weight += term_weight
        weighted_sum += ci * term_weight
        idf = state.term_idf[i]
        total_idf += idf
        idf_weighted_sum += ci * idf
        if ci < 1.0:
            missing_idf += (1.0 - ci) * idf
        if i == q_count - 1:
            last_term_ci = ci
            last_term_idf = idf
        fully = state.term_matched_chars[i] >= (state.term_max_chars[i] - 0.01)
        if fully:
            f.terms_fully_matched += 1
        if (state.term_has_whole[i] or state.term_has_joined[i]) and fully:
            f.terms_strict_matched += 1
        if state.term_has_prefix[i]:
            f.terms_prefix_matched += 1
        if state.term_first_pos[i] >= 0:
            p = state.term_first_pos[i]
            if first_match_index == -1 or p < first_match_index:
                first_match_index = p
            min_pos = min(min_pos, p)
            max_pos = max(max_pos, p)

    f.weighted_coverage = weighted_sum / total_weight if total_weight > 0 else 0.0
    f.idf_coverage = idf_weighted_sum / total_idf if total_idf > 0 else 0.0
    f.total_idf = total_idf
    f.missing_idf = missing_idf
    f.last_term_ci = last_term_ci
    f.first_match_index = first_match_index
    f.term_idf = word_level_term_idf
    f.term_ci = term_ci

    if q_count > 0 and total_idf > 0:
        f.last_term_is_type_ahead = (last_term_idf / total_idf) <= (1.0 / (q_count + 1))

    # single-term LCS boost
    if q_count == 1 and query_len > 0 and lcs_sum > 0.0:
        ci_lcs = min(1.0, lcs_sum / query_len)
        if ci_lcs > sum_ci:
            sum_ci = ci_lcs
    f.sum_ci = sum_ci

    # longest consecutive prefix run + suffix run
    run = 0
    for i in range(q_count):
        hit = state.term_has_prefix[i] and state.term_max_chars[i] > 0 and state.term_matched_chars[i] > 0
        if hit:
            run += 1
            f.longest_prefix_run = max(f.longest_prefix_run, run)
        else:
            run = 0
    suffix = 0
    for i in range(q_count - 1, -1, -1):
        if state.term_has_prefix[i] and state.term_max_chars[i] > 0 and state.term_matched_chars[i] > 0:
            suffix += 1
        else:
            break
    f.suffix_prefix_run = suffix

    if max_pos >= 0 and min_pos is not math.inf and max_pos >= min_pos and f.terms_with_any_match >= 2:
        f.phrase_span = int(max_pos - min_pos) + 1

    if q_count >= 1:
        last = q_count - 1
        f.last_token_has_prefix = (
            state.term_has_prefix[last] and state.term_matched_chars[last] > 0
        )
        if q_count >= 2:
            for i in range(q_count - 1):
                if (state.term_has_whole[i] or state.term_has_joined[i]) and state.term_matched_chars[i] >= (
                    state.term_max_chars[i] - 0.01
                ):
                    f.preceding_strict_count += 1
    return f
