"""Coverage engine orchestration — port of Coverage/CoverageEngine.cs.

calculate_features(query, doc_text, ...) runs the matcher cascade
(whole -> joined -> prefix/suffix -> fuzzy, each config-gated) over the
shared MatchState and produces CoverageFeatures. Term IDF comes from the
index term dictionary (average BM25 idf over the term's n-grams,
ComputeTermIdf CoverageEngine.cs:389-427); the optional word-level IDF
cache feeds type-ahead detection and per-term arrays.

Inputs are already normalized + lowercased (the engine's callers do
normalize->lower->synonym-canonicalize on both sides).
"""

from __future__ import annotations

import math
from typing import Callable

from infidex_spark.kernel.bm25 import compute_idf
from infidex_spark.kernel.coverage.config import CoverageConfig
from infidex_spark.kernel.coverage.matchers import (
    all_terms_fully_matched,
    match_fuzzy_words,
    match_joined_words,
    match_prefix_suffix,
    match_whole_words,
)
from infidex_spark.kernel.coverage.scorer import CoverageFeatures, calculate_final_score
from infidex_spark.kernel.coverage.state import MatchState, Token, tokenize_coverage


class CoverageEngine:
    def __init__(
        self,
        setup: CoverageConfig | None = None,
        sizes: tuple[int, ...] = (3,),
        term_df: Callable[[str], int] | None = None,
        total_docs: int = 0,
        word_idf: dict[str, float] | None = None,
    ):
        """term_df: term -> document frequency (0 if unknown); the same
        dictionary the BM25 stage queries. word_idf: optional word-level
        IDF cache (B4)."""
        self.setup = setup or CoverageConfig()
        self.sizes = sizes
        self.term_df = term_df
        self.total_docs = total_docs
        self.word_idf = word_idf
        self._query_idf_cache: dict[str, list[float]] = {}

    # ------------------------------------------------------------ query prep

    def prepare_query(self, query: str) -> dict:
        tokens, _ = tokenize_coverage(query, self.setup.min_word_size)
        idfs = self._query_idf_cache.get(query)
        if idfs is None:
            idfs = [self._term_idf(t.text) for t in tokens]
            self._query_idf_cache[query] = idfs
        word_level = None
        if self.word_idf is not None and tokens:
            word_level = [self.word_idf.get(t.text, 0.0) for t in tokens]
        return {"query": query, "tokens": tokens, "idfs": idfs, "word_level": word_level}

    def _term_idf(self, token: str) -> float:
        """Average BM25 idf over the token's n-grams; fallback
        log2(len+1) when the dictionary is unavailable."""
        if self.term_df is None or self.total_docs <= 0:
            return math.log2(len(token) + 1)
        idf_sum, n = 0.0, 0
        for size in self.sizes:
            if len(token) < size:
                continue
            for i in range(len(token) - size + 1):
                df = self.term_df(token[i : i + size])
                if df and df > 0:
                    idf_sum += float(compute_idf(self.total_docs, df))
                    n += 1
        return idf_sum / n if n else math.log2(len(token) + 1)

    # ------------------------------------------------------------- features

    def calculate_features(
        self, ctx: dict, doc_text: str, lcs_sum: float
    ) -> CoverageFeatures:
        tokens: list[Token] = ctx["tokens"]
        if not tokens:
            return CoverageFeatures()
        doc_tokens, raw_count = tokenize_coverage(doc_text, self.setup.min_word_size)
        state = MatchState(
            query_tokens=tokens, doc_tokens=doc_tokens, doc_token_count=raw_count
        )
        state.term_idf = list(ctx["idfs"])

        if self.setup.cover_whole_words:
            match_whole_words(state)
        if self.setup.cover_joined_words:
            match_joined_words(state)
        if self.setup.cover_prefix_suffix:
            match_prefix_suffix(state)
        if self.setup.cover_fuzzy_words and not all_terms_fully_matched(state):
            match_fuzzy_words(state, self.setup)

        features = calculate_final_score(
            state,
            len(ctx["query"]),
            lcs_sum,
            self.setup.cover_whole_query,
            ctx["word_level"],
        )

        from infidex_spark.kernel.coverage.fusion import compute_fusion_signals

        features.fusion = compute_fusion_signals(
            ctx["query"], doc_text, self.setup.min_word_size
        )
        return features
