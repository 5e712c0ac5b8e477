"""Result post-processing: filter, boost, sort, facets, limit.

Mirrors the reference's relational layer (SURVEY.md 2.F):
- ApplyFilter   (Scoring/ResultProcessor.cs:36-75)  -> DataFrame.filter
- ApplyBoosts   (Scoring/ResultProcessor.cs:80-123) -> score + CASE WHEN
- ApplySort     (Scoring/ResultProcessor.cs:128-146) -> orderBy
- FacetBuilder  (Core/FacetBuilder.cs:19-100)       -> groupBy().count()
                  top-100 per field by (count desc, value asc)
- Take(maxResults) -> LIMIT

These operate on any DataFrame carrying result rows (typically the join
of top-k hits with their source documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from infidex_spark.functions.infiscript import infiscript_to_sql

BOOST_STRENGTHS = {"low": 5, "medium": 10, "high": 20, "extreme": 40}
FACET_LIMIT = 100  # FacetBuilder.cs: top 100 values per facet field


def apply_filter(df: DataFrame, infiscript: str) -> DataFrame:
    """Filter result rows with an Infiscript expression."""
    return df.filter(F.expr(infiscript_to_sql(infiscript)))


def apply_boosts(
    df: DataFrame,
    boosts: list[tuple[str, int | str]],
    score_col: str = "score",
) -> DataFrame:
    """Each boost = (infiscript_condition, strength). Matching rows get
    `strength` added to the score; rows are re-sorted by the boosted
    score (Boost.cs / BoostStrength.cs: strengths 5/10/20/40)."""
    out = F.col(score_col)
    for cond, strength in boosts:
        s = BOOST_STRENGTHS[strength] if isinstance(strength, str) else int(strength)
        out = out + F.when(F.expr(infiscript_to_sql(cond)), F.lit(float(s))).otherwise(
            F.lit(0.0)
        )
    return df.withColumn(score_col, out).orderBy(F.col(score_col).desc())


def apply_sort(df: DataFrame, field: str, ascending: bool = True) -> DataFrame:
    col = F.col(field)
    return df.orderBy(col.asc() if ascending else col.desc())


def build_facets(df: DataFrame, fields: list[str], limit: int = FACET_LIMIT) -> DataFrame:
    """Facet counts over the result set: one output row per (field, value)
    with count, keeping the top `limit` values per field ordered by
    (count desc, value asc) — exactly FacetBuilder's ordering."""
    parts = []
    for f_name in fields:
        parts.append(
            df.filter(F.col(f_name).isNotNull())
            .groupBy(F.col(f_name).cast("string").alias("value"))
            .agg(F.count("*").alias("n"))
            .select(F.lit(f_name).alias("field"), "value", "n")
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    w = Window.partitionBy("field").orderBy(F.col("n").desc(), F.col("value").asc())
    return (
        union.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .drop("rank")
        .orderBy("field", F.col("n").desc(), F.col("value").asc())
    )


def take(df: DataFrame, k: int) -> DataFrame:
    return df.limit(k)
