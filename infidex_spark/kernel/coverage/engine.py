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
        self._ctx_cache: dict[str, dict] = {}

    # ------------------------------------------------------------ query prep

    def prepare_query(self, query: str) -> dict:
        ctx = self._ctx_cache.get(query)
        if ctx is not None:
            return ctx
        from infidex_spark.kernel.coverage.state import _raw_tokens

        tokens, _ = tokenize_coverage(query, self.setup.min_word_size)
        idfs = [self._term_idf(t.text) for t in tokens]
        word_level = None
        if self.word_idf is not None and tokens:
            word_level = [self.word_idf.get(t.text, 0.0) for t in tokens]
        ctx = {
            "query": query,
            "tokens": tokens,
            "idfs": idfs,
            "word_level": word_level,
            # raw (unfiltered, duplicates kept) query tokens for fusion
            "q_raw": _raw_tokens(query, 0),
            # per-query memo of pure pair metrics (q_token, doc_word) ->
            # result, shared across all candidates/searches of this query
            "memo": {},
        }
        if len(self._ctx_cache) >= 4096:
            self._ctx_cache.clear()
        self._ctx_cache[query] = ctx
        return ctx

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

    def doc_view(self, doc_text: str, d_raw: list[Token] | None = None):
        """Query-independent per-doc token views: (raw unfiltered tokens,
        filtered+deduped matcher tokens, raw filtered count, raw-text
        set, text->index over the matcher tokens, length-desc stable
        token order, unique raw texts in first-occurrence order).
        Callers may cache the result per doc and pass it to
        calculate_features — everything here is per-doc work the cold
        path would otherwise redo per (query, candidate). d_raw: optional
        precomputed _raw_tokens(doc_text, 0) (the rerank batches raw
        tokenization over the whole candidate set)."""
        from infidex_spark.kernel.coverage.state import _raw_tokens

        if d_raw is None:
            d_raw = _raw_tokens(doc_text, 0)
        min_ws = self.setup.min_word_size
        # single fused pass: a token's filter eligibility is a function of
        # its text alone, so first-occurrence dedupe over all tokens and
        # over the length-filtered subset agree on which occurrence wins
        seen: set[str] = set()
        doc_tokens: list[Token] = []
        d_uniq_raw: list[str] = []
        raw_count = 0
        for t in d_raw:
            txt = t.text
            long_enough = len(txt) >= min_ws
            if long_enough:
                raw_count += 1
            if txt not in seen:
                seen.add(txt)
                d_uniq_raw.append(txt)
                if long_enough:
                    doc_tokens.append(t)
        d_set = frozenset(d_uniq_raw)
        # doc_tokens are unique by text: exact-match scans become lookups
        d_index = {t.text: j for j, t in enumerate(doc_tokens)}
        d_order = sorted(range(len(doc_tokens)), key=lambda j: -len(doc_tokens[j].text))
        return d_raw, doc_tokens, raw_count, d_set, d_index, d_order, d_uniq_raw

    def calculate_features(
        self, ctx: dict, doc_text: str, lcs_sum: float,
        d_view=None,
    ) -> CoverageFeatures:
        """d_view: optional precomputed doc_view(doc_text) — callers with a
        per-doc cache pass it to skip re-tokenization."""
        tokens: list[Token] = ctx["tokens"]
        if not tokens:
            return CoverageFeatures()
        if d_view is None:
            d_view = self.doc_view(doc_text)
        d_raw, doc_tokens, raw_count, d_set, d_index, d_order, d_uniq = d_view
        state = MatchState(
            query_tokens=tokens, doc_tokens=doc_tokens, doc_token_count=raw_count
        )
        state.term_idf = list(ctx["idfs"])
        state.memo = ctx["memo"]
        state.d_index = d_index
        state.d_order_full = d_order
        q_index = ctx.get("q_index")
        if q_index is None:
            q_index = {t.text: i for i, t in enumerate(tokens)}
            ctx["q_index"] = q_index
        state.q_index = q_index

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
            ctx["query"], doc_text, self.setup.min_word_size,
            q_tokens=ctx["q_raw"], d_tokens=d_raw, memo=ctx["memo"],
            d_set=d_set, d_uniq=d_uniq,
        )
        return features
