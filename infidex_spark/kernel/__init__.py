"""Pure-Python/numpy parity kernel.

Everything in this package is Spark-free and replicates the observable
semantics of the reference engine's text analysis + BM25 stage bit-exactly.
The distributed build (``infidex_spark.build``) and the query executor
(``infidex_spark.query``) are tested against this kernel.
"""

from infidex_spark.kernel.normalize import normalize, fold_chars
from infidex_spark.kernel.tokenize import (
    DELIMITERS,
    START_PAD,
    STOP_PAD,
    index_tokens,
    search_tokens,
    word_tokens,
)
from infidex_spark.kernel.bm25 import (
    K1,
    B,
    DELTA,
    MAX_TF,
    compute_idf,
    term_score,
    term_max_score,
)

__all__ = [
    "normalize",
    "fold_chars",
    "DELIMITERS",
    "START_PAD",
    "STOP_PAD",
    "index_tokens",
    "search_tokens",
    "word_tokens",
    "K1",
    "B",
    "DELTA",
    "MAX_TF",
    "compute_idf",
    "term_score",
    "term_max_score",
]
