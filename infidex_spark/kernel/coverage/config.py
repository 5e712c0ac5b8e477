"""Coverage configuration defaults (Coverage/CoverageSetup.cs:1-164)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class CoverageConfig:
    min_word_size: int = 2
    levenshtein_max_word_size: int = 20
    num_typos: int = 2
    min_length_one_typo: int = 3
    min_length_two_typos: int = 7
    coverage_min_word_hits_abs: int = 1
    coverage_min_word_hits_relative: int = 0
    coverage_q_limit_for_error_tolerance: int = 5
    coverage_lcs_error_tolerance_relative_q: float = 0.2
    cover_whole_query: bool = True
    cover_whole_words: bool = True
    cover_fuzzy_words: bool = True
    cover_joined_words: bool = True
    cover_prefix_suffix: bool = True
    truncate: bool = True
    enable_lexical_prescreen: bool = False
    truncation_score: int = 254
    coverage_depth: int = 500
