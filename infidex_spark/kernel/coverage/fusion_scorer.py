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


def fusion_calculate_batch(
    query_len: int,
    doc_text_lens,
    feats_list,
    bm25_scores,
) -> list[tuple[float, int]]:
    """Vectorized fusion_calculate over a candidate list: identical
    arithmetic in identical per-element order (every scalar expression
    maps to the same sequence of elementwise float64 ops), so results
    are bit-identical to the scalar function — enforced by
    tests/test_batch_coverage.py::test_fusion_batch_equals_scalar.
    query_text/document_text enter the scalar only via len(); callers
    pass the lengths."""
    import numpy as np

    N = len(feats_list)
    if N == 0:
        return []
    # ---- column extraction (one cached row tuple per features object:
    # repeated searches of a hot query skip the attribute walk) ----
    rows = []
    for f in feats_list:
        row = getattr(f, "fus_row", None)
        if row is None:
            fs = f.fusion
            row = (
                f.terms_count, fs.unfiltered_query_token_count,
                f.terms_with_any_match, f.terms_prefix_matched,
                f.terms_strict_matched, f.first_match_index,
                f.preceding_strict_count, f.last_token_has_prefix,
                f.doc_token_count, f.word_hits, f.longest_prefix_run,
                f.suffix_prefix_run, f.sum_ci, f.idf_coverage,
                f.total_idf, f.missing_idf, f.last_term_is_type_ahead,
                fs.lexical_prefix_last, fs.is_perfect_doc_lexical,
                fs.has_stem_evidence, fs.has_anchor_stem,
                fs.trailing_match_density, fs.single_term_lexical_sim,
                fs.single_char_last_token_boost,
            )
            f.fus_row = row
        rows.append(row)
    M = np.asarray(rows, dtype=np.float64)  # ints/bools are exact in f64
    tc = M[:, 0].astype(np.int64)
    n_uf = M[:, 1].astype(np.int64)
    n_tok = np.where(n_uf > 0, n_uf, tc)
    is_single = n_tok <= 1
    twa = M[:, 2].astype(np.int64)
    tpm = M[:, 3].astype(np.int64)
    tsm = M[:, 4].astype(np.int64)
    fmi = M[:, 5].astype(np.int64)
    psc = M[:, 6].astype(np.int64)
    ltp = M[:, 7] != 0
    dtc = M[:, 8].astype(np.int64)
    wh = M[:, 9].astype(np.int64)
    lpr = M[:, 10].astype(np.int64)
    spr = M[:, 11].astype(np.int64)
    sum_ci = M[:, 12]
    idf_cov = M[:, 13]
    total_idf = M[:, 14]
    missing_idf = M[:, 15]
    type_ahead = M[:, 16] != 0
    lex_pl = M[:, 17] != 0
    perfect = M[:, 18] != 0
    stem_ev = M[:, 19] != 0
    anchor = M[:, 20] != 0
    trail_d = M[:, 21].astype(np.int64)
    st_sim = M[:, 22].astype(np.int64)
    sc_boost = M[:, 23].astype(np.int64)
    bases = np.asarray(bm25_scores, dtype=np.float64)
    dlen = np.asarray(doc_text_lens, dtype=np.int64)

    is_complete = (tc > 0) & (twa == tc)
    is_clean = (tc > 0) & (tpm == tc)
    is_exact = (tc > 0) & (tsm == tc)
    starts = fmi == 0
    preceding_terms = np.maximum(0, tc - 1)
    cov_pl = (tc >= 1) & (psc == preceding_terms) & ltp
    prefix_strong = lex_pl & cov_pl

    precedence = np.zeros(N, dtype=np.int64)
    multi = ~is_single
    coverage_tier = np.zeros(N, dtype=np.int64)
    mt = multi & (tc > 0)
    coverage_tier = np.where(mt & (twa >= tc), 3, coverage_tier)
    coverage_tier = np.where(
        mt & (twa < tc) & (twa == tc - 1), 2, coverage_tier
    )
    coverage_tier = np.where(
        mt & (twa < tc) & (twa != tc - 1) & (twa * 2 >= tc), 1, coverage_tier
    )
    precedence |= np.where(
        multi & (coverage_tier > 0), (coverage_tier & 0b11) << 16, 0
    )

    is_exact_prefix = multi & is_clean & starts & lex_pl & is_complete
    is_subset = multi & (dtc > 0) & (wh == dtc)
    precedence |= np.where(is_exact_prefix, 1 << 15, 0)
    precedence |= np.where(is_subset, 1 << 14, 0)

    # high-info term dominance / strong anchor (multi-term, tc >= 2)
    dom_scope = multi & (tc >= 2)
    has_dominant = np.zeros(N, dtype=bool)
    avg_idf = np.zeros(N, dtype=np.float64)
    if dom_scope.any():
        m_max = int(tc.max())
        TI = np.zeros((N, m_max), dtype=np.float64)
        CI = np.zeros((N, m_max), dtype=np.float64)
        valid = np.zeros(N, dtype=bool)
        for r in range(N):
            f = feats_list[r]
            t = int(tc[r])
            if (
                dom_scope[r]
                and f.term_idf is not None
                and f.term_ci is not None
                and len(f.term_idf) == t
                and len(f.term_ci) == t
            ):
                valid[r] = True
                TI[r, :t] = f.term_idf[:t]
                CI[r, :t] = f.term_ci[:t]
        avg_idf = np.where(
            valid & (total_idf > 0) & (tc > 0),
            np.divide(total_idf, np.where(tc > 0, tc, 1)),
            0.0,
        )
        power = TI * CI
        col = np.arange(m_max)
        in_range = col[None, :] < tc[:, None]
        # exact scalar parity: other_c = sum_{i != c} power_i added LEFT
        # TO RIGHT (float addition is not associative, so 2*power >=
        # total would differ in edge cases); m_max <= ~8 keeps this cheap
        any_dom = np.zeros(N, dtype=bool)
        for c in range(m_max):
            other = np.zeros(N, dtype=np.float64)
            for i in range(m_max):
                if i != c:
                    other = other + np.where(in_range[:, i], power[:, i], 0.0)
            elig_c = (
                in_range[:, c]
                & (CI[:, c] > 0.1)
                & (TI[:, c] > 0)
                & (TI[:, c] >= avg_idf)
                & (power[:, c] >= other)
            )
            any_dom |= elig_c
        has_dominant = valid & any_dom
        # strong anchor uses term_idf[0] vs avg (avg is 0 when invalid)
        ti0 = np.zeros(N, dtype=np.float64)
        ti0_ok = np.zeros(N, dtype=bool)
        for r in range(N):
            f = feats_list[r]
            if dom_scope[r] and f.term_idf is not None and len(f.term_idf) >= 1:
                ti0[r] = f.term_idf[0]
                ti0_ok[r] = True
        has_strong_anchor = dom_scope & anchor & ti0_ok & (ti0 >= avg_idf)
        precedence |= np.where(
            dom_scope & (has_dominant | has_strong_anchor), 1 << 13, 0
        )
        unmatched = tc - twa
        precedence |= np.where(dom_scope & has_dominant & (unmatched == 1), 8, 0)

    # single-term tiers
    precedence |= np.where(is_single & is_complete, 1 << 17, 0)
    precedence |= np.where(is_single & is_clean & (tc > 0), 1 << 16, 0)
    tier1 = np.zeros(N, dtype=np.int64)
    tier1 = np.where(starts & is_exact, 4, tier1)
    tier1 = np.where(starts & ~is_exact & is_clean, 3, tier1)
    tier1 = np.where(~starts & is_exact, 2, tier1)
    tier1 = np.where(~starts & ~is_exact & is_clean, 1, tier1)
    tier1 = np.where(is_complete, tier1, 0)
    precedence |= np.where(is_single, tier1 << 3, 0)
    # multi-term tiers
    anchor_run = anchor & (lpr >= 2)
    tier_m = np.where(
        prefix_strong,
        3,
        np.where(lex_pl, 2, np.where(perfect | anchor_run, 1, 0)),
    )
    multi_val = tier_m + np.where(n_uf > tc, sc_boost, 0)
    precedence |= np.where(multi, multi_val, 0)

    coverage_ratio = np.where(tc > 0, twa / np.where(tc > 0, tc, 1), 0.0)
    has_partial = (coverage_ratio > 0.0) & (coverage_ratio < 1.0)

    pscope = has_partial & (n_tok >= 2)
    unmatched = tc - twa
    last_matched = ltp | ((tc > 0) & (twa == tc))
    can_boost = (last_matched | ~type_ahead) & (total_idf > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        missing_ratio = np.where(total_idf > 0, missing_idf / np.where(total_idf > 0, total_idf, 1), 0.0)
    term_gap = 1.0 - coverage_ratio
    boost8 = np.where(
        stem_ev,
        True,
        (unmatched == 1) & can_boost & (missing_ratio < term_gap),
    )
    precedence |= np.where(pscope & boost8, 8, 0)

    # ---- semantic score (_semantic_score, elementwise) ----
    avg_ci = np.where(tc > 0, sum_ci / np.where(tc > 0, tc, 1), 0.0)
    # single-term branch
    sem_single = (avg_ci + st_sim / 255.0) / 2.0
    # multi-term, dtc == 0
    sem_empty = avg_ci
    # multi-term, dtc > 0
    can_use_idf = (last_matched | ~type_ahead) & (total_idf > 0)
    use_idf_cov = (
        has_partial & (unmatched == 1) & can_use_idf & (idf_cov > coverage_ratio)
    )
    base_cov = np.where(use_idf_cov, idf_cov, avg_ci)
    density = np.where(dtc > 0, wh / np.where(dtc > 0, dtc, 1), 0.0)
    sem_multi = base_cov * density
    signals = (anchor.astype(np.int64)) + (spr >= 2)
    sem_multi = np.where(
        (tc >= 3) & (signals > 0),
        np.minimum(1.0, sem_multi + INTENT_BONUS_PER_SIGNAL * signals),
        sem_multi,
    )
    match_density = trail_d / 255.0
    sem_multi = np.where(
        (tc >= 2) & (match_density > 0.0),
        sem_multi + (1.0 - sem_multi) * match_density,
        sem_multi,
    )
    semantic = np.where(
        is_single, sem_single, np.where(dtc == 0, sem_empty, sem_multi)
    )
    coverage_gap = 1.0 - coverage_ratio
    blend = has_partial & (bases >= coverage_gap)
    semantic = np.where(
        blend, coverage_ratio * semantic + coverage_gap * bases, semantic
    )
    semantic = np.minimum(np.maximum(semantic, 0.0), 0.999)

    tie_scope = (n_tok >= 2) & (dlen > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        focus = np.minimum(1.0, np.where(dlen > 0, query_len / np.where(dlen > 0, dlen, 1), 0.0))
    tiebreaker = np.where(tie_scope, (focus * 255.0).astype(np.int64), 0)

    final = precedence.astype(np.float64) + semantic
    return [
        (float(final[r]), int(tiebreaker[r])) for r in range(N)
    ]


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
