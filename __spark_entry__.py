"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship n-gram BM25 query over sf0.001 through the real
                engine (build index -> block-max retrieval -> top-k).
queries()     : one callable per implemented operator from SURVEY.md §2
                (search core word-level projections, the real n-gram
                engine, relational post-processing F1-F8, and the
                training-data pipeline operators).
oracle_sql()  : DuckDB-equivalent SQL for every SQL-expressible entry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from infidex_spark.contract import q_ngram_topk_engine

    return q_ngram_topk_engine(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from infidex_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from infidex_spark.contract import ORACLES

    return dict(ORACLES)
