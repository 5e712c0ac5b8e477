"""Coverage rerank (reference Stage 2/3) — round-2 port in progress.

Landed: configuration, coverage tokenizer, string metrics (tolerant LCS,
restricted Damerau-Levenshtein), whole-word / joined-word / fuzzy-word
matchers over the shared MatchState. Remaining (see COVERAGE.md roadmap):
prefix/suffix matcher, coverage scorer, fusion signals/scorer, pipeline
orchestration + truncation.
"""

from infidex_spark.kernel.coverage.config import CoverageConfig
from infidex_spark.kernel.coverage.metrics import damerau_restricted, lcs_tolerant
from infidex_spark.kernel.coverage.state import MatchState, tokenize_coverage

__all__ = [
    "CoverageConfig",
    "damerau_restricted",
    "lcs_tolerant",
    "MatchState",
    "tokenize_coverage",
]
