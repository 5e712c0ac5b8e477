"""Single-process reference engine: the golden oracle for every
distributed component.

Replicates the observable semantics of the reference's BM25 stage
(Stage 1) end to end:

- index build: VectorModel.IndexDocument + BuildInvertedLists
  (/root/reference/src/Infidex/Indexing/VectorModel.cs:73-220), including
  the df/tf bookkeeping of Term.FirstCycleAdd (Term.cs:71-146) and the
  positional prefix index (ShortQuery/PositionalPrefixIndex.cs:55-146);
- query: VectorModel.SearchWithMaxScore (VectorModel.cs:376-602) —
  search tokenization, term stats, LD1 fuzzy expansion of unknown tokens
  >= 4 chars (VectorModel.cs:643-743), tiered candidate selection
  (Scoring/TieredCandidateSelector.cs:53-237), exact BM25+ scoring in
  float32 (Indexing/Bm25Scorer.cs), and top-k ordered by
  (score desc, doc_key asc) (Core/ScoreEntry.cs:24-36, tiebreaker 0 at
  this stage).

Determinism note: the reference's WAND pruning is lossless, so its top-k
*set and scores* equal exact scoring of the candidate set; only at exact
float ties on the k-th boundary can its heap order differ from our
deterministic (score desc, key asc) rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from infidex_spark.kernel.bm25 import compute_idf, term_max_score, term_score
from infidex_spark.kernel.normalize import normalize
from infidex_spark.kernel.tokenize import (
    DEFAULT_INDEX_SIZES,
    DEFAULT_START_PAD,
    DEFAULT_STOP_PAD,
    DELIMITERS as _QUERY_DELIMS,
    index_tokens,
    search_tokens,
    word_tokens,
)

DEFAULT_FIELD_WEIGHT = 1.25  # Weight.Med (Field.cs:34, ConfigurationParameters.cs:16)

# Multi-field indexing (DocumentFields.cs:124, VectorModel.cs:96-128):
# fields concatenate with '§' and each token scores with the weight of
# the field it starts in. Weight enum High/Med/Low -> multiplier.
FIELD_DELIM = "§"  # '§' (VectorModel.cs:79)
FIELD_WEIGHTS = (1.5, 1.25, 1.0)  # ConfigurationParameters.DefaultFieldWeights


def field_boundaries(values: list[str]) -> tuple[str, list[tuple[int, int]]]:
    """Concatenate field values with '§' and return (raw_text, [(position,
    weight_index)]) — port of DocumentFields.GetSearchableTexts (scalar
    path): boundary positions are offsets in the RAW concatenated text."""
    parts: list[str] = []
    bounds: list[tuple[int, int]] = []
    pos = 0
    for i, (value, widx) in enumerate(values):
        v = value if value is not None else ""
        bounds.append((pos, int(widx)))
        parts.append(v)
        pos += len(v) + 1  # +1 for the delimiter
    return FIELD_DELIM.join(parts), bounds


def field_weight_at(token_pos: int, bounds: list[tuple[int, int]]) -> float:
    """VectorModel.DetermineFieldWeight ported exactly, including the
    reference's quirk that token positions are measured in the PADDED
    normalized text while boundary positions come from the raw
    concatenated text (the start-pad shift is part of observable
    behavior)."""
    if not bounds:
        return 1.0
    widx = 0
    for bpos, bw in bounds:
        if bpos <= token_pos:
            widx = bw
        else:
            break
    return FIELD_WEIGHTS[widx] if widx < len(FIELD_WEIGHTS) else 1.0
DEFAULT_STOP_TERM_LIMIT = 1_250_000


@dataclass
class _TermState:
    ordinal: int
    df: int = 0  # -1 = stop term
    doc_ids: list = field(default_factory=list)
    weights: list = field(default_factory=list)


def short_query_score(
    q: str,
    first_pos: int,
    n_ws: int,
    n_exact: int,
    first_exact: bool,
    n_tokens: int,
    tiny_text: str | None,
) -> int:
    """ShortQueryResolver.CalculateFinalScore (ShortQueryResolver.cs:248-307):
    precedence bits (word-start 128, first-position 64, exact-token or
    short-title 32, first-token-exact 16, title==query 8) << 8, plus a
    position/density base byte. All prefix postings are word starts
    (PositionalPrefixIndex indexes token prefixes only)."""
    precedence = 128
    if first_pos == 0:
        precedence |= 64
    if n_exact > 0 or n_tokens <= 3:
        precedence |= 32
    if first_exact:
        precedence |= 16
    if tiny_text is not None and tiny_text == q:
        precedence |= 8
    pos_component = 255 - min(first_pos * 16, 240)
    density = min(n_ws * 8, 32)
    base = max(0, min(pos_component + density, 255))
    return (precedence << 8) | base


def levenshtein_le1(a: str, b: str) -> bool:
    """True iff plain Levenshtein distance (ins/del/sub; no transposition,
    matching the reference's Myers bit-parallel matcher,
    Fst/FstIndex.cs:202-360) between a and b is <= 1."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return diff <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is longer by 1: check a == b with one char deleted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


MAX_FST_TERMS_PER_PREFIX = 4096  # ShortQueryProcessor.cs:17
SHORT_QUERY_MAX_LENGTH = 3  # SearchPipeline.cs:23
SHORT_QUERY_COVERAGE_DOC_CAP = 500  # SearchPipeline.cs:24


def build_prefix_patterns(
    search_lower: str, min_index_size: int, start_pad_size: int
) -> list[str]:
    """ShortQueryProcessor.BuildPrefixPatterns: sliding pad/query prefixes
    of the min gram size, plus the word-boundary pattern ' ' + query."""
    from infidex_spark.kernel.tokenize import START_PAD

    patterns: list[str] = []
    for i in range(min(min_index_size, start_pad_size + len(search_lower))):
        pad_count = max(0, start_pad_size - i)
        query_count = min(len(search_lower), min_index_size - pad_count)
        if query_count > 0:
            patterns.append(START_PAD * pad_count + search_lower[:query_count])
    patterns.append(" " + search_lower)
    return patterns


def short_query_precedence(
    query_tokens: list[str],
    words: list[str],
    search_lower: str,
    trimmed_title: str,
    first_token_starts_with_prefix: bool,
) -> int:
    """ShortQueryProcessor.ComputePrecedence, ported bit-for-bit."""
    precedence = 0
    if len(query_tokens) >= 2:
        token_matches = sum(1 for qt in query_tokens if qt in words)
        if token_matches == len(query_tokens):
            precedence |= 8
            if len(words) <= len(query_tokens) + 1:
                precedence |= 2
        elif token_matches > 0:
            precedence |= 4
    else:
        first_exact = bool(words) and words[0] == search_lower
        any_exact = first_exact or search_lower in words
        if any_exact:
            precedence |= 1
        if first_token_starts_with_prefix:
            precedence |= 2
        if first_exact:
            precedence |= 4
        if trimmed_title == search_lower:
            precedence |= 8
    return precedence


class KernelIndex:
    """In-memory reference index over (doc_key, text) pairs."""

    def __init__(
        self,
        field_weight: float = DEFAULT_FIELD_WEIGHT,
        stop_term_limit: int = DEFAULT_STOP_TERM_LIMIT,
        index_sizes: tuple[int, ...] = DEFAULT_INDEX_SIZES,
        start_pad: int = DEFAULT_START_PAD,
        stop_pad: int = DEFAULT_STOP_PAD,
        synonym_map=None,
        high_resolution: bool = False,
    ):
        self.synonym_map = synonym_map
        # A6: query-side joined-text shingle pass (TokenizerSetup.
        # HighResolutionMode; default off, matching config 400)
        self.high_resolution = high_resolution
        self.field_weight = float(np.float32(field_weight))
        self.stop_term_limit = stop_term_limit
        self.index_sizes = index_sizes
        self.start_pad = start_pad
        self.stop_pad = stop_pad
        self.terms: dict[str, _TermState] = {}
        self.doc_keys: list[int] = []
        self.prefix_index: dict[str, set[int]] = {}
        # positional prefix data for the short-query path (B6/D10):
        # prefix -> doc -> [first_pos, n_ws, n_exact, first_exact]
        self.prefix_postings: dict[str, dict[int, list]] = {}
        # doc metadata cache (B8): (n_tokens, tiny_text)
        self.doc_meta: list[tuple[int, str | None]] = []
        self.doc_texts: list[str] = []  # prepped text (coverage stage input)
        self.word_df: dict[str, int] = {}  # word-level df (B4)
        # WordMatcher word postings (B9): word (len >= 2) -> internal doc
        # ids, independent of gram stop demotion (WordMatcher.cs Load)
        self.wm_word_postings: dict[str, list[int]] = {}
        self.word_idf: dict[str, float] = {}
        self.doc_lengths: np.ndarray | None = None
        self.avgdl: float = 0.0
        self._sorted_terms: list[str] | None = None  # lazy FST stand-in

    # ------------------------------------------------------------------ build

    def index_documents(self, docs: list[tuple[int, str]]) -> None:
        for key, text in docs:
            self._index_one(key, text)
        self._build_doc_lengths()

    def index_documents_fields(
        self, docs: list[tuple[int, list[tuple[str, int]]]]
    ) -> None:
        """Multi-field indexing: docs are (key, [(field_value,
        weight_index)]) with weight_index 0=High(1.5) 1=Med(1.25)
        2=Low(1.0). Fields concatenate with '§'; each token's tf
        accumulates with its field's weight (DocumentFields.cs:124,
        VectorModel.cs:96-128)."""
        for key, fields in docs:
            self._index_one(key, fields=fields)
        self._build_doc_lengths()

    def _index_one(
        self,
        key: int,
        text: str | None = None,
        fields: list[tuple[str, int]] | None = None,
    ) -> None:
        doc_id = len(self.doc_keys)
        self.doc_keys.append(key)
        self._sorted_terms = None  # dictionary changes: rebuild lazily
        bounds: list[tuple[int, int]] | None = None
        if fields is not None:
            text, bounds = field_boundaries(fields)
        prepped = normalize(text).lower()
        if self.synonym_map is not None and self.synonym_map.has_mappings:
            prepped = self.synonym_map.canonicalize_text(prepped)
        for term_text, pos in index_tokens(
            prepped, self.index_sizes, self.start_pad, self.stop_pad
        ):
            w = field_weight_at(pos, bounds) if bounds is not None else None
            self._add_token(term_text, doc_id, weight=w)
        self._index_prefixes(prepped, doc_id)

    def _add_token(
        self, term_text: str, doc_id: int, weight: float | None = None
    ) -> None:
        st = self.terms.get(term_text)
        if st is None:
            st = _TermState(ordinal=len(self.terms))
            self.terms[term_text] = st
        # TermCollection.CountTermUsage -> IncrementTermUsageCounter
        if st.df != -1:
            st.df += 1
            if st.df > self.stop_term_limit:
                st.df = -1
        # Term.FirstCycleAdd
        if st.df < 0:
            return
        w = self.field_weight if weight is None else weight
        if len(st.weights) < self.stop_term_limit:
            if not st.doc_ids or st.doc_ids[-1] != doc_id:
                initial = min(float(np.rint(w)), 255.0)
                st.weights.append(int(initial))
                st.doc_ids.append(doc_id)
            else:
                new_weight = st.weights[-1] + w
                if new_weight <= 255.0:
                    st.weights[-1] = int(np.rint(new_weight))
                    st.df -= 1
        else:
            st.df = -1
            st.doc_ids.clear()
            st.weights.clear()

    def _index_prefixes(self, prepped: str, doc_id: int) -> None:
        # PositionalPrefixIndex.IndexDocument: token prefixes of length 1..3
        # with (token position, exactness) for short-query precedence
        toks = word_tokens(prepped, min_size=1)
        for pos, tok in enumerate(toks):
            for plen in range(1, min(len(tok), 3) + 1):
                p = tok[:plen]
                self.prefix_index.setdefault(p, set()).add(doc_id)
                st = self.prefix_postings.setdefault(p, {}).get(doc_id)
                exact = len(tok) == plen
                if st is None:
                    self.prefix_postings[p][doc_id] = [
                        pos, 1, 1 if exact else 0, exact and pos == 0
                    ]
                else:
                    st[1] += 1
                    if exact:
                        st[2] += 1
        stripped = prepped.strip()
        self.doc_meta.append(
            (len(toks), stripped if len(stripped) <= 3 else None)
        )
        self.doc_texts.append(prepped)
        for w in set(toks):
            self.word_df[w] = self.word_df.get(w, 0) + 1
            # WordMatcher word-level postings (WordMatcher.cs Load): words
            # len >= 2, NO stop demotion (its indexes are independent of
            # the gram dictionary's df limits)
            if len(w) >= 2:
                self.wm_word_postings.setdefault(w, []).append(doc_id)

    def _build_doc_lengths(self) -> None:
        n = len(self.doc_keys)
        dl = np.zeros(n, dtype=np.float32)
        for st in self.terms.values():
            if st.df <= 0:
                continue
            for d, w in zip(st.doc_ids, st.weights):
                dl[d] += np.float32(w)
        self.doc_lengths = dl
        self.avgdl = float(dl.sum(dtype=np.float32) / np.float32(n)) if n else 0.0
        # word-level IDF cache (B4, VectorModel.BuildWordIdfCache)
        self.word_idf = {
            w: float(compute_idf(n, df))
            for w, df in self.word_df.items()
            if 0 < df <= n
        }

    # ------------------------------------------------------------------ query

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_key, bm25_score) for the query, rank-identical to the
        reference's Stage-1 SearchWithMaxScore output."""
        q = normalize(query.strip()).lower()
        if self.synonym_map is not None and self.synonym_map.has_mappings:
            q = self.synonym_map.canonicalize_text(q)
        if not q:
            return []
        total_docs = len(self.doc_keys)
        if total_docs == 0:
            return []
        # routing (QueryAnalyzer.Analyze + SearchPipeline.ExecuteRelevancyStage):
        # n-gram path iff some word reaches the min gram size; mixed queries
        # strip short words from the stage-1 text; else short-query path.
        min_size = self.index_sizes[0]
        words = word_tokens(q, min_size=1)
        long_words = [w for w in words if len(w) >= min_size]
        if words:
            can_ngrams = bool(long_words)
        else:
            can_ngrams = len(q) >= min_size
        if not can_ngrams:
            # SearchPipeline.ExecuteRelevancyStage: 1-char queries resolve
            # via the positional-prefix champion path; longer non-ngram
            # queries via the FST-expansion short-query processor (D10)
            if len(q) == 1:
                return self._short_query(q, k)
            return self._search_short_query(q, k)
        if long_words and len(long_words) < len(words):
            q = " ".join(long_words)
        stats = self._query_stats(q)
        self._fuzzy_expand(stats)

        avgdl = np.float32(self.avgdl if self.avgdl > 0 else 1.0)
        active: list[dict] = []
        for s in stats:
            df = s["df"]
            if df <= 0 or df > self.stop_term_limit:
                continue
            idf = compute_idf(total_docs, df)
            active.append(
                {
                    "df": df,
                    "idf": idf,
                    "max_score": term_max_score(idf, avgdl),
                    "postings": s["postings"],  # dict doc_id -> tf (float)
                }
            )

        if not active:
            return []

        candidates = self._select_candidates(active, k, q)
        if not candidates:
            # reference full-scan fallback == disjunctive over all postings
            candidates = set()
            for t in active:
                candidates.update(t["postings"].keys())
            if not candidates:
                return []

        cand = np.fromiter(candidates, dtype=np.int64)
        cand.sort()
        dl = self.doc_lengths[cand].astype(np.float32)
        dl = np.where(dl <= 0, np.float32(1.0), dl)
        scores = np.zeros(len(cand), dtype=np.float32)
        for t in active:  # accumulate in stats order, float32 (as reference)
            post = t["postings"]
            tf = np.fromiter(
                (post.get(int(d), 0.0) for d in cand), dtype=np.float32, count=len(cand)
            )
            mask = tf > 0
            if mask.any():
                scores[mask] += term_score(tf[mask], dl[mask], avgdl, t["idf"])

        hit = scores > 0
        keys = np.asarray(self.doc_keys, dtype=np.int64)[cand[hit]]
        sc = scores[hit]
        order = np.lexsort((keys, -sc))
        # segment consolidation (D12): best-scoring segment per doc_key
        # wins; a no-op when keys are unique
        out: list[tuple[int, float]] = []
        seen: set[int] = set()
        for i in order:
            key = int(keys[i])
            if key in seen:
                continue
            seen.add(key)
            out.append((key, float(sc[i])))
            if len(out) == k:
                break
        return out

    def _search_short_query(self, q: str, k: int) -> list[tuple[int, float]]:
        """D10 for multi-char non-ngram queries — port of
        ShortQueryProcessor.SearchShortQuery (ShortQueryProcessor.cs:154):
        expand the min-size prefix patterns over the sorted term
        dictionary (<= 4096 terms per pattern, the FST cap), accumulate
        weight*10 per posting, run the all-dictionary fuzzy fallback when
        under 100 docs matched, then score precedence bits + normalized
        weight against each doc's title words.

        Documented delta: the title used for the prefix/precedence checks
        is the key's representative (lowest-id) document rather than each
        posting's own segment — identical on unsegmented corpora and
        shared exactly by the Spark executor.

        Documented delta (stop terms): the reference FST keeps demoted
        (df=-1) terms with whatever postings accumulated before demotion
        — an ingestion-order-dependent partial set a distributed build
        cannot reproduce. Here demoted terms are excluded from the
        dictionary walk entirely (before the 4096 cap) and from the
        fuzzy fallback, exactly matching the Spark executor, whose
        term_dict/postings only contain live terms."""
        from bisect import bisect_left

        if self._sorted_terms is None:
            self._sorted_terms = sorted(self.terms)
        st_list = self._sorted_terms
        patterns = build_prefix_patterns(q, self.index_sizes[0], self.start_pad)
        doc_scores: dict[int, int] = {}
        rep: dict[int, int] = {}  # key -> representative internal id

        def process_term(st: _TermState, mult: int) -> None:
            for internal, w in zip(st.doc_ids, st.weights):
                key = self.doc_keys[internal]
                prev = rep.get(key)
                if prev is None or internal < prev:
                    rep[key] = internal
                doc_scores[key] = doc_scores.get(key, 0) + w * mult

        hi_ch = chr(0x10FFFF)
        for pat in patterns:
            lo = bisect_left(st_list, pat)
            hi = bisect_left(st_list, pat + hi_ch, lo)
            taken = 0
            for t in st_list[lo:hi]:
                st = self.terms[t]
                if st.df <= 0:
                    continue  # demoted: not in the live dictionary
                process_term(st, 10)
                taken += 1
                if taken >= MAX_FST_TERMS_PER_PREFIX:
                    break

        if len(doc_scores) < 100:
            # fuzzy fallback: whole-dictionary scan for word-boundary /
            # contains character matches (ProcessFuzzyFallback)
            for t in st_list:
                if self.terms[t].df <= 0:
                    continue
                if any(t.startswith(p) for p in patterns):
                    continue
                has_wb = False
                cnt = 0
                for ch in q:
                    if (" " + ch) in t:
                        has_wb = True
                        cnt += 1
                    elif ch in t:
                        cnt += 1
                if has_wb or cnt > 0:
                    process_term(self.terms[t], 2 if has_wb else 1)

        if not doc_scores:
            return []
        max_score = max(doc_scores.values())
        qtokens = word_tokens(q, min_size=1)
        out: list[tuple[int, float]] = []
        for key, val in doc_scores.items():
            title = self.doc_texts[rep[key]]
            words_d = word_tokens(title, min_size=1)
            prec = short_query_precedence(
                qtokens, words_d, q, title.strip(), title.startswith(q)
            )
            norm = val / max_score if max_score > 0 else val / 255.0
            out.append((key, float(np.float32(prec + norm))))
        from infidex_spark.build.segmenter import consolidate

        return consolidate(out, k)

    def _short_query(self, q: str, k: int) -> list[tuple[int, float]]:
        """Short-query (1-3 char) resolution over the positional prefix
        index (ShortQueryResolver.Resolve/CalculateFinalScore semantics:
        precedence bits <<8 | position/density base, sorted desc)."""
        posting = self.prefix_postings.get(q)
        if not posting:
            return []
        out = []
        for doc_id, (first_pos, n_ws, n_exact, first_exact) in posting.items():
            n_tokens, tiny = self.doc_meta[doc_id]
            score = short_query_score(
                q, first_pos, n_ws, n_exact, first_exact, n_tokens, tiny
            )
            out.append((self.doc_keys[doc_id], float(score)))
        from infidex_spark.build.segmenter import consolidate

        return consolidate(out, k)

    def _query_stats(self, q: str) -> list[dict]:
        """Tokenize the query and fold duplicates into per-term stats,
        ordered like the reference (sort by term ordinal, unknown-by-text
        first; VectorModel.cs:355-364,432-487)."""
        raw = []
        for tok in search_tokens(
            q, self.index_sizes, self.start_pad, self.stop_pad,
            high_resolution=self.high_resolution,
        ):
            st = self.terms.get(tok)
            if st is not None:
                raw.append((st.ordinal, None, tok))
            else:
                raw.append((-1, tok, tok))
        raw.sort(key=lambda r: (r[0], r[1] or ""))
        stats: list[dict] = []
        for ordinal, text, tok in raw:
            if stats and (
                (ordinal >= 0 and stats[-1]["ordinal"] == ordinal)
                or (ordinal < 0 and stats[-1]["text"] == text)
            ):
                stats[-1]["qocc"] = min(stats[-1]["qocc"] + 1, 255)
                continue
            st = self.terms.get(tok)
            postings: dict[int, float] = {}
            df = 0
            if st is not None:
                df = st.df
                if st.df > 0:
                    postings = dict(zip(st.doc_ids, (float(w) for w in st.weights)))
            stats.append(
                {
                    "ordinal": ordinal,
                    "text": text,
                    "token": tok,
                    "df": df,
                    "qocc": 1,
                    "postings": postings,
                    "fuzzy": False,
                }
            )
        return stats

    def _fuzzy_expand(self, stats: list[dict]) -> None:
        """LD1 expansion of unknown tokens >= 4 chars into a virtual term
        (union of matching terms' postings, tf fixed at 1;
        VectorModel.cs:498-507,643-743)."""
        for s in stats:
            if s["df"] != 0 or s["text"] is None or len(s["text"]) < 4:
                continue
            text = s["text"]
            union: set[int] = set()
            for term_text, st in self.terms.items():
                if st.df <= 0:
                    continue
                if levenshtein_le1(text, term_text):
                    union.update(st.doc_ids)
            if union:
                s["df"] = len(union)
                s["postings"] = {d: 1.0 for d in union}
                s["fuzzy"] = True

    # --------------------------------------------------- candidate selection

    def _select_candidates(self, active: list[dict], topk: int, q: str) -> set[int]:
        """Port of TieredCandidateSelector.SelectCandidates semantics
        (Scoring/TieredCandidateSelector.cs:53-237). ``active`` contains
        only live terms (df>0), matching what the reference passes in."""
        # Prefix precedence (TrySelectPrefixCandidates, :455-532)
        prefix_cands = self._prefix_candidates(q, topk)
        if prefix_cands and len(prefix_cands) >= min(topk * 2, 100):
            return set(prefix_cands)

        max_idf = max(np.float32(t["idf"]) for t in active)
        has_typo = any(t["df"] < 10 for t in active)

        if has_typo or len(active) == 1:
            return self._disjunctive(active, topk, max_idf)

        terms = sorted(
            range(len(active)), key=lambda i: (-active[i]["idf"], i)
        )  # idf desc
        ordered = [active[i] for i in terms]
        global_c: set[int] = set()

        if len(ordered) >= 2:  # Tier 0: full AND
            global_c |= self._intersect(ordered)
            if len(global_c) >= topk * 2:
                return global_c

        if len(ordered) >= 3 and len(global_c) < topk * 3:  # Tier 1: n-1 terms
            global_c |= self._intersect(ordered[:-1])

        if len(global_c) < topk * 5:  # Tier 2: up to 2 selective single terms
            cutoff = max_idf * np.float32(0.3)
            selective = []
            for t in ordered:
                if t["idf"] <= 0 or t["idf"] < cutoff:
                    continue
                selective.append(t)
                if len(selective) == min(2, len(ordered)):
                    break
            for t in selective:
                global_c.update(t["postings"].keys())
                if len(global_c) >= topk * 10:
                    break
        return global_c

    def _prefix_candidates(self, q: str, topk: int) -> set[int]:
        for plen in range(min(len(q), 3), 0, -1):
            docs = self.prefix_index.get(q[:plen])
            if not docs:
                continue
            pop = len(docs)
            if pop > topk * 20:
                continue
            if pop <= topk * 10:
                return docs
        return set()

    @staticmethod
    def _disjunctive(active: list[dict], topk: int, max_idf) -> set[int]:
        ordered = sorted(range(len(active)), key=lambda i: (-active[i]["idf"], i))
        result: set[int] = set()
        has_selective = False
        low_cutoff = max_idf * np.float32(0.2)
        for i in ordered:
            t = active[i]
            low_quality = t["idf"] < low_cutoff
            if len(active) > 1 and low_quality and has_selective:
                continue
            docs = t["postings"].keys()
            if not docs:
                continue
            result.update(docs)
            if not low_quality and result:
                has_selective = True
            if len(result) >= topk * 100:
                break
        return result

    @staticmethod
    def _intersect(terms: list[dict]) -> set[int]:
        sets = sorted((set(t["postings"].keys()) for t in terms), key=len)
        out = sets[0]
        for s in sets[1:]:
            out = out & s
            if not out:
                break
        return out


# ---------------------------------------------------------------------------
# Full pipeline (stage 1 BM25 -> stage 2/3 coverage + fusion), mirroring
# SearchPipeline.ExecuteCoverageStage / ProcessCandidate
# (Scoring/SearchPipeline.cs:298-522) and the truncation rule
# (Scoring/ResultProcessor.cs:146-178).


class FullSearch:
    """Stage-1 + coverage/fusion rerank over a KernelIndex."""

    def __init__(self, index: KernelIndex, setup=None):
        from infidex_spark.kernel.coverage.config import CoverageConfig
        from infidex_spark.kernel.coverage.engine import CoverageEngine

        self.index = index
        self.setup = setup or CoverageConfig()
        self.engine = CoverageEngine(
            setup=self.setup,
            sizes=index.index_sizes,
            term_df=lambda t: (index.terms[t].df if t in index.terms else 0),
            total_docs=len(index.doc_keys),
            word_idf=index.word_idf,
        )
        self._key_to_id = {}
        for i, k in enumerate(index.doc_keys):
            self._key_to_id.setdefault(k, i)
        self._affix_vocab = None  # built lazily from word_df

    def _word_matcher_docs(self, q: str) -> list[int]:
        """WordMatcher lookup (B9/B10/B11, WordMatcher.cs): per query word
        (len 2-8) union of exact word postings, LD1-variant postings
        (variants len 2-8), and affix-matched word postings (FST words are
        len >= 3, shared 4096-term budget per query word). Word postings
        are the dedicated word-level index — independent of gram stop
        demotion, so len-2 words and stop-demoted words still match."""
        from infidex_spark.kernel.tokenize import word_tokens

        docs: set[int] = set()
        wm = self.index.wm_word_postings

        if self._affix_vocab is None:
            from infidex_spark.kernel.coverage.vocab import AffixVocab

            self._affix_vocab = AffixVocab(self.index.word_df)
        vocab = self._affix_vocab
        for w in set(word_tokens(q, min_size=2)):
            if len(w) <= 8:
                docs.update(wm.get(w, ()))
                if len(w) >= 3:
                    for word in vocab.ld1(w):
                        docs.update(wm.get(word, ()))
            # affix lookup (SupportAffix): indexed words extending the
            # query word as prefix, or ending with it — bounded by the
            # reference's shared 4096-term budget (WordMatcher.cs:41)
            if self.setup.cover_prefix_suffix:
                for word in vocab.affix_terms(w):
                    docs.update(wm.get(word, ()))
        return sorted(docs)

    def _lexical_prescreen(
        self, q: str, stage1: list[tuple[int, float]]
    ) -> list[tuple[int, float]]:
        """E1 — Scoring/LexicalPrescreen.cs:18-87: drop TF-IDF candidates
        containing NO query word token. Conservative: if any query word is
        absent from the term dictionary (df == 0 / unknown), or the filter
        would empty the list, the candidates pass through unchanged (the
        possible-typo case is left to the fuzzy machinery)."""
        from infidex_spark.kernel.coverage.state import tokenize_coverage

        tokens, _ = tokenize_coverage(q, self.setup.min_word_size)
        if not tokens:
            return stage1
        union: set[int] = set()
        for t in tokens:
            st = self.index.terms.get(t.text)
            if st is None or st.df == 0:
                return stage1  # unknown word: skip prescreen (typo case)
            union.update(st.doc_ids)  # stop terms (df=-1) contribute none
        if not union:
            return stage1
        filtered = [
            (key, s)
            for key, s in stage1
            if self._key_to_id.get(key) in union
        ]
        return filtered if filtered else stage1

    def search(self, query: str, k: int = 10) -> list[tuple[int, float, int]]:
        """Returns [(doc_key, fusion_score, tiebreaker)] after the full
        rerank; short queries return the stage-1 short path directly."""
        idx = self.index
        q = normalize(query.strip()).lower()
        if idx.synonym_map is not None and idx.synonym_map.has_mappings:
            q = idx.synonym_map.canonicalize_text(q)
        if not q or not idx.doc_keys:
            return []
        from infidex_spark.kernel.tokenize import word_tokens as _wt

        min_size = idx.index_sizes[0]
        words = _wt(q, min_size=1)
        long_words = [w for w in words if len(w) >= min_size]
        can_ngrams = bool(long_words) if words else len(q) >= min_size
        depth = self.setup.coverage_depth
        if not can_ngrams:
            # same routing as stage-1: 1-char champion path, multi-char
            # FST-expansion short-query processor
            s1 = idx.search(q, k)
            # SearchPipeline.cs:110-160: a short query (<= 3 chars, no
            # delimiters) runs the coverage stage ONLY when stage-1 found
            # fewer than maxResults AND the prefix matches 1..500 docs
            is_short = len(q) <= SHORT_QUERY_MAX_LENGTH and not any(
                c in _QUERY_DELIMS for c in q
            )
            if not is_short or len(s1) >= k:
                return [(d, s, 0) for d, s in s1[:k]]
            count = len(idx.prefix_index.get(q, ()))
            if count == 0 or count > SHORT_QUERY_COVERAGE_DOC_CAP:
                return [(d, s, 0) for d, s in s1[:k]]
            stage1 = s1
        else:
            stage1 = idx.search(q, depth)
        if self.setup.enable_lexical_prescreen and stage1:
            stage1 = self._lexical_prescreen(q, stage1)
        if not stage1:
            max_tfidf = 1.0
        else:
            max_tfidf = stage1[0][1] or 1.0

        ctx = self.engine.prepare_query(q)
        from infidex_spark.kernel.coverage.fusion_scorer import fusion_calculate
        from infidex_spark.kernel.coverage.metrics import lcs_tolerant

        tol = 0
        if len(q) >= self.setup.coverage_q_limit_for_error_tolerance:
            tol = int(len(q) * self.setup.coverage_lcs_error_tolerance_relative_q)

        wm_docs = self._word_matcher_docs(q)
        tfidf_ids = {self._key_to_id[d] for d, _ in stage1 if d in self._key_to_id}
        wm_overlap = [i for i in wm_docs if i in tfidf_ids]
        wm_unique = [i for i in wm_docs if i not in tfidf_ids]
        wm_limit = max(0, depth - len(wm_overlap))

        entries: list[tuple[float, int, int]] = []  # (score, tiebreaker, key)
        lcs_by_key: dict[int, int] = {}
        hits_by_key: dict[int, int] = {}
        max_word_hits = 0

        def process(internal_id: int, base: float) -> None:
            nonlocal max_word_hits
            key = idx.doc_keys[internal_id]
            text = idx.doc_texts[internal_id]
            lcs = lcs_by_key.get(key)
            if lcs is None:
                lcs = lcs_tolerant(q, text, tol)
                lcs_by_key[key] = min(lcs, 255)
            feats = self.engine.calculate_features(ctx, text, lcs)
            score, tie = fusion_calculate(q, text, feats, base, min_size)
            if key not in hits_by_key:
                hits_by_key[key] = min(feats.word_hits, 255)
            max_word_hits = max(max_word_hits, feats.word_hits)
            entries.append((score, tie, key))

        for i in wm_overlap:
            process(i, 0.0)
        for i in wm_unique[:wm_limit]:
            process(i, 0.0)
        for key, s1 in stage1:
            internal = self._key_to_id.get(key)
            if internal is None:
                continue
            process(internal, s1 / max_tfidf if max_tfidf > 0 else 0.0)

        if max_word_hits == 0 and not wm_docs:
            # coverage found nothing lexical: fall back to the TF-IDF
            # backbone (SearchPipeline.cs:184-198 safety net)
            return [(d, s, 0) for d, s in stage1[:k]]

        # heap order (score desc, tiebreaker desc, key asc) + consolidation
        entries.sort(key=lambda e: (-e[0], -e[1], e[2]))
        final: list[tuple[int, float, int]] = []
        seen: set[int] = set()
        for score, tie, key in entries:
            if key in seen:
                continue
            seen.add(key)
            final.append((key, score, tie))

        # truncation (E11)
        if self.setup.truncate and final:
            min_hits = max(
                self.setup.coverage_min_word_hits_abs,
                max_word_hits - self.setup.coverage_min_word_hits_relative,
            )
            trunc = -1
            for i in range(len(final) - 1, -1, -1):
                key = final[i][0]
                if (
                    hits_by_key.get(key, 0) >= min_hits
                    or lcs_by_key.get(key, 0) > 0
                    or final[i][1] >= self.setup.truncation_score
                ):
                    trunc = i
                    break
            count = k if trunc == -1 else min(trunc + 1, k)
            final = final[:count]
        else:
            final = final[:k]
        return final
