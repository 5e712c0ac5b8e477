"""Batch (cross-candidate) coverage == scalar cascade, bit for bit.

The scalar kernel (matchers.py/fusion.py) is the reference; the batch
module (kernel/coverage/batch.py) must produce identical CoverageFeatures
(every field) and identical fusion_calculate outputs for randomized
corpora covering every matcher: whole, joined (both directions), exact
and fuzzy affix, fuzzy tiers, stem evidence, trailing density,
single-term similarity, single-char last-token boost.
"""

from __future__ import annotations

import dataclasses
import random

import pytest

from infidex_spark.kernel.coverage.batch import BatchCoverage
from infidex_spark.kernel.coverage.config import CoverageConfig
from infidex_spark.kernel.coverage.engine import CoverageEngine
from infidex_spark.kernel.coverage.fusion_scorer import fusion_calculate
from infidex_spark.kernel.coverage.metrics import lcs_tolerant

WORDS = [
    "quick", "quik", "brown", "fox", "foxes", "jumps", "jump", "over",
    "lazy", "dog", "dogs", "the", "a", "of", "redemption", "shawshank",
    "shank", "shanks", "red", "emption", "batman", "batmans", "gotham",
    "city", "knight", "dark", "darkknight", "kn", "ni", "x", "y",
    "quickfox", "redemptionshank", "ab", "ba", "abc", "acb",
]

QUERIES = [
    "quick fox",
    "quik fxo",
    "redemption shank",
    "redemption sh",
    "shawshank",
    "shaaawshank",
    "dark knight",
    "darkknight",
    "batman",
    "batmn",
    "the quick brown fox jumps",
    "quickfox",
    "red emption",
    "fox x",
    "lazy dog x",
    "abc",
    "ab",
    "a b",
    "gotham city k",
    "sh",
]


def _mk_docs(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    docs = []
    for _ in range(n):
        k = rng.randint(1, 14)
        words = [rng.choice(WORDS) for _ in range(k)]
        # occasional punctuation-delimited and duplicated tokens
        sep = rng.choice([" ", " ", " ", ", ", "-", "  "])
        docs.append(sep.join(words))
    docs.append("")  # empty doc
    docs.append("the the the the")  # all-duplicate doc
    return docs


def _features_tuple(f):
    d = dataclasses.asdict(f)
    fus = d.pop("fusion")
    return d, fus


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_batch_equals_scalar_features(seed):
    docs = _mk_docs(seed, 60)
    setup = CoverageConfig()
    term_df = lambda t: (hash(t) % 50) + 1  # deterministic fake df  # noqa: E731
    word_idf = {w: 1.0 + (hash(w) % 7) / 3.0 for w in WORDS}
    eng = CoverageEngine(
        setup=setup, sizes=(3,), term_df=term_df, total_docs=1000,
        word_idf=word_idf,
    )
    batch_eng = CoverageEngine(
        setup=setup, sizes=(3,), term_df=term_df, total_docs=1000,
        word_idf=word_idf,
    )
    bc = BatchCoverage(setup)
    for query in QUERIES:
        ctx_s = eng.prepare_query(query)
        ctx_b = batch_eng.prepare_query(query)
        tol = 0
        if len(query) >= setup.coverage_q_limit_for_error_tolerance:
            tol = int(len(query) * setup.coverage_lcs_error_tolerance_relative_q)
        items = []
        want = []
        for i, text in enumerate(docs):
            lcs = min(lcs_tolerant(query, text, tol), 255)
            items.append((i, text, lcs))
            want.append(eng.calculate_features(ctx_s, text, lcs))
        got_map = bc.compute(batch_eng, ctx_b, items)
        for (i, text, lcs), w in zip(items, want):
            g = got_map[i]
            gd, gf = _features_tuple(g)
            wd, wf = _features_tuple(w)
            assert gd == wd, (query, text, gd, wd)
            assert gf == wf, (query, text, gf, wf)
            if w.fusion is None:
                # empty query token set: both paths return bare features
                # (rerank never scores these — can_ngrams guards upstream)
                assert g.fusion is None
                continue
            # final fusion scores must agree bit-exactly too
            for base in (0.0, 0.5, 1.0):
                assert fusion_calculate(query, text, g, base, setup.min_word_size) == \
                    fusion_calculate(query, text, w, base, setup.min_word_size)


def test_batch_incremental_interner_growth():
    """Second batch with new words must extend the tables, not corrupt
    results for previously seen words."""
    setup = CoverageConfig()
    eng = CoverageEngine(setup=setup, sizes=(3,), term_df=lambda t: 5,
                         total_docs=100)
    beng = CoverageEngine(setup=setup, sizes=(3,), term_df=lambda t: 5,
                          total_docs=100)
    bc = BatchCoverage(setup)
    q = "quick fox"
    docs1 = ["quick brown fox", "lazy dog"]
    docs2 = ["quicker foxes zebra", "quick fox", "zzz qqq"]
    ctx_b = beng.prepare_query(q)
    bc.compute(beng, ctx_b, [(i, t, 0) for i, t in enumerate(docs1)])
    got = bc.compute(
        beng, ctx_b, [(100 + i, t, 0) for i, t in enumerate(docs2)]
    )
    ctx_s = eng.prepare_query(q)
    for i, t in enumerate(docs2):
        w = eng.calculate_features(ctx_s, t, 0)
        gd, gf = _features_tuple(got[100 + i])
        wd, wf = _features_tuple(w)
        assert gd == wd and gf == wf, t


def test_rerank_batch_equals_scalar_end_to_end(spark, tmp_path):
    """RerankExecutor(use_batch=True) returns the identical ranked list
    (keys, scores, ties) as use_batch=False on a small index."""
    from infidex_spark.build.indexer import build_index
    from infidex_spark.fixtures import REFERENCE_DOCS, movie_docs
    from infidex_spark.query.executor import IndexReader
    from infidex_spark.query.rerank import RerankExecutor

    for name, corpus in (("ref", REFERENCE_DOCS), ("mov", movie_docs())):
        d = str(tmp_path / name)
        df = spark.createDataFrame(
            [(i, key, text) for i, (key, text) in enumerate(corpus)],
            "doc_id long, doc_key long, text string",
        )
        build_index(spark, df, d, n_buckets=4)
        rb = RerankExecutor(IndexReader(d), use_batch=True)
        rs = RerankExecutor(IndexReader(d), use_batch=False)
        for query in [
            "batman", "qick fux", "battamam", "gotham city", "quick fox",
            "Shawshank", "Shaaawshank", "redemption shank", "redemption sh",
            "dark knight", "goodfelas", "pulp fiction", "sh", "a b",
        ]:
            got = rb.search(query, 10)
            want = rs.search(query, 10)
            assert got == want, (name, query, got, want)
            # repeat (warm ctx_feats replay) must also agree
            assert rb.search(query, 10) == want, (name, query)
