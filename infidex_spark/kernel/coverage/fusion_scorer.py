"""Fusion scoring (E10) — port of Scoring/FusionScorer.cs:19-397.

Final stage-3 score = precedence (integer bit tiers) + semantic
(fraction, clamped to [0, 0.999)); tiebreaker = min(1, qlen/doclen)*255.
Bit layout preserved exactly:

  bits 17-16: coverage tier (multi-term) / complete+clean (single-term)
  bit 15:     exact prefix
  bit 14:     subset match (doc fully explained by hits)
  bit 13:     high-info term dominance / strong anchor
  bit 3 (8):  stem-evidence or missing-info boost
  low bits:   per-arity tier (single-term tier<<3, multi-term tier,
              plus the single-char last-token boost)
"""

from __future__ import annotations

import math

from infidex_spark.kernel.coverage.scorer import CoverageFeatures

INTENT_BONUS_PER_SIGNAL = 0.15


def fusion_calculate(
    query_text: str,
    document_text: str,
    features: CoverageFeatures,
    bm25_score: float,
    min_stem_length: int,
) -> tuple[float, int]:
    """Returns (final_score, tiebreaker_byte)."""
    fs = features.fusion
    n = fs.unfiltered_query_token_count if fs.unfiltered_query_token_count > 0 else features.terms_count
    is_single = n <= 1

    tc = features.terms_count
    is_complete = tc > 0 and features.terms_with_any_match == tc
    is_clean = tc > 0 and features.terms_prefix_matched == tc
    is_exact = tc > 0 and features.terms_strict_matched == tc
    starts_at_beginning = features.first_match_index == 0
    lexical_prefix_last = fs.lexical_prefix_last
    preceding_terms = max(0, tc - 1)
    coverage_prefix_last = (
        tc >= 1
        and features.preceding_strict_count == preceding_terms
        and features.last_token_has_prefix
    )
    is_prefix_last_strong = lexical_prefix_last and coverage_prefix_last
    is_perfect_doc = fs.is_perfect_doc_lexical

    precedence = 0
    coverage_tier = 0
    if not is_single and tc > 0:
        matched = features.terms_with_any_match
        if matched >= tc:
            coverage_tier = 3
        elif matched == tc - 1:
            coverage_tier = 2
        elif matched * 2 >= tc:
            coverage_tier = 1
    if not is_single and coverage_tier > 0:
        precedence |= (coverage_tier & 0b11) << 16

    is_exact_prefix = (
        not is_single and is_clean and starts_at_beginning and lexical_prefix_last and is_complete
    )
    is_subset_match = (
        not is_single and features.doc_token_count > 0 and features.word_hits == features.doc_token_count
    )
    if is_exact_prefix:
        precedence |= 1 << 15
    if is_subset_match:
        precedence |= 1 << 14

    # high-info term dominance
    if not is_single and tc >= 2:
        has_dominant = False
        avg_idf = 0.0
        if (
            features.term_idf is not None
            and features.term_ci is not None
            and len(features.term_idf) == tc
            and len(features.term_ci) == tc
        ):
            avg_idf = features.total_idf / tc if features.total_idf > 0 and tc > 0 else 0.0
            for c in range(tc):
                power = features.term_idf[c] * features.term_ci[c]
                if (
                    features.term_ci[c] <= 0.1
                    or features.term_idf[c] <= 0
                    or features.term_idf[c] < avg_idf
                ):
                    continue
                other = sum(
                    features.term_idf[i] * features.term_ci[i] for i in range(tc) if i != c
                )
                if power >= other:
                    has_dominant = True
                    break
        has_strong_anchor = (
            fs.has_anchor_stem
            and features.term_idf is not None
            and len(features.term_idf) >= 1
            and features.term_idf[0] >= avg_idf
        )
        if has_dominant or has_strong_anchor:
            precedence |= 1 << 13
        unmatched = tc - features.terms_with_any_match
        if has_dominant and unmatched == 1:
            precedence |= 8

    if is_single:
        if is_complete:
            precedence |= 1 << 17
        if is_clean and tc > 0:
            precedence |= 1 << 16
        precedence |= _single_term_tier(is_exact, is_clean, starts_at_beginning, is_complete) << 3
    else:
        has_anchor_with_run = fs.has_anchor_stem and features.longest_prefix_run >= 2
        if is_prefix_last_strong:
            tier = 3
        elif lexical_prefix_last:
            tier = 2
        elif is_perfect_doc or has_anchor_with_run:
            tier = 1
        else:
            tier = 0
        multi = tier
        if fs.unfiltered_query_token_count > tc:
            multi += fs.single_char_last_token_boost
        precedence |= multi

    coverage_ratio = features.terms_with_any_match / tc if tc > 0 else 0.0
    has_partial = 0.0 < coverage_ratio < 1.0

    if has_partial and n >= 2:
        if fs.has_stem_evidence:
            precedence |= 8
        else:
            unmatched = tc - features.terms_with_any_match
            last_matched = features.last_token_has_prefix or (
                tc > 0 and features.terms_with_any_match == tc
            )
            can_boost = (last_matched or not features.last_term_is_type_ahead) and features.total_idf > 0
            if unmatched == 1 and can_boost:
                missing_ratio = features.missing_idf / features.total_idf
                term_gap = 1.0 - coverage_ratio
                if missing_ratio < term_gap:
                    precedence |= 8

    semantic = _semantic_score(features, is_single, bm25_score, coverage_ratio)
    semantic = min(max(semantic, 0.0), 0.999)

    tiebreaker = 0
    if n >= 2 and len(document_text) > 0:
        focus = min(1.0, len(query_text) / len(document_text))
        tiebreaker = int(focus * 255.0)

    return float(precedence) + semantic, tiebreaker


def _single_term_tier(is_exact: bool, is_clean: bool, starts: bool, is_complete: bool) -> int:
    if not is_complete:
        return 0
    if starts:
        if is_exact:
            return 4
        if is_clean:
            return 3
    else:
        if is_exact:
            return 2
        if is_clean:
            return 1
    return 0


def _semantic_score(
    features: CoverageFeatures, is_single: bool, bm25_score: float, coverage_ratio: float
) -> float:
    fs = features.fusion
    tc = features.terms_count
    avg_ci = features.sum_ci / tc if tc > 0 else 0.0
    has_partial = 0.0 < coverage_ratio < 1.0

    if is_single:
        lexical_sim = fs.single_term_lexical_sim / 255.0
        semantic = (avg_ci + lexical_sim) / 2.0
    elif features.doc_token_count == 0:
        semantic = avg_ci
    else:
        unmatched = tc - features.terms_with_any_match
        last_matched = features.last_token_has_prefix or (
            tc > 0 and features.terms_with_any_match == tc
        )
        can_use_idf = (last_matched or not features.last_term_is_type_ahead) and features.total_idf > 0
        use_idf_cov = (
            has_partial and unmatched == 1 and can_use_idf and features.idf_coverage > coverage_ratio
        )
        base_cov = features.idf_coverage if use_idf_cov else avg_ci
        density = features.word_hits / features.doc_token_count
        semantic = base_cov * density
        # intent bonus (>=3 terms: anchor stem / suffix phrase run)
        if tc >= 3:
            signals = (1 if fs.has_anchor_stem else 0) + (
                1 if features.suffix_prefix_run >= 2 else 0
            )
            if signals:
                semantic = min(1.0, semantic + INTENT_BONUS_PER_SIGNAL * signals)
        # trailing-term bonus
        if tc >= 2:
            match_density = fs.trailing_match_density / 255.0
            if match_density > 0.0:
                semantic += (1.0 - semantic) * match_density

    coverage_gap = 1.0 - coverage_ratio
    if has_partial and bm25_score >= coverage_gap:
        semantic = coverage_ratio * semantic + coverage_gap * bm25_score

    return semantic
