"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k against a query vector; all math
  stays JVM-side (F.zip_with + F.aggregate -> whole-stage codegen), no
  Python in the scoring loop. TakeOrderedAndProject gives per-partition
  top-k then a driver merge — the right distributed plan for top-k.
- lsh_bucketed_topk: the scale path — random-hyperplane LSH buckets
  computed map-side; the query probes only its own bucket (and optional
  multi-probe neighbors), cutting the scan by ~2^bits. Lossy (documented)
  but the candidate scoring is exact cosine.
- pairwise bucketed self-similarity for embedding near-dup dedup.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cosine_expr(vec_col: str, q: list[float]):
    qarr = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qarr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_v = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    qn = float(np.sqrt(np.sum(np.asarray(q, dtype=np.float64) ** 2)))
    return dot / (norm_v * F.lit(qn))


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cosine) ordered desc, ties by id asc."""
    return (
        emb.select(
            F.col(id_col),
            _cosine_expr(vec_col, query_vec).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_bucket_expr(vec_col: str, planes: np.ndarray):
    """Bucket id = sign bits against fixed random hyperplanes, computed
    with built-in array functions (JVM-side)."""
    bits = []
    for row in planes:
        arr = F.array(*[F.lit(float(x)) for x in row])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out * F.lit(2) + b
    return out


def lsh_bucketed_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe only the query's LSH bucket, exact cosine inside.
    At 10^12 vectors, persist the bucketed table partitioned by bucket and
    this becomes a partition-pruned scan."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    qbits = 0
    for row in planes:
        qbits = qbits * 2 + (1 if float(np.dot(row, query_vec)) >= 0 else 0)
    bucketed = emb.withColumn("bucket", lsh_bucket_expr(vec_col, planes))
    return (
        bucketed.filter(F.col("bucket") == qbits)
        .select(F.col(id_col), _cosine_expr(vec_col, query_vec).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    bits: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join: pairs share
    a bucket (candidate generation), then exact cosine >= threshold.
    Shuffle = one hash partition by bucket; no global cross join.

    max_bucket guards the degenerate-bucket case (zero vectors,
    constant-fill embeddings hashing equal): buckets larger than the cap
    are excluded from the self-join instead of going quadratic — at web
    scale such buckets are boilerplate best handled by exact dedup."""
    # dim from the first row; embeddings must be fixed-width
    first = emb.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    dim = first[0]["d"] if first else 0
    planes = _hyperplanes(dim, bits, seed)
    b = emb.select(
        F.col(id_col), F.col(vec_col), lsh_bucket_expr(vec_col, planes).alias("bucket")
    )
    sizes = b.groupBy("bucket").agg(F.count("*").alias("_bn"))
    b = b.join(sizes, "bucket").filter(F.col("_bn") <= max_bucket).drop("_bn")
    a1, a2 = b.alias("x"), b.alias("y")
    pairs = a1.join(
        a2,
        (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}"), lambda p, q: p.cast("double") * q.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(
            F.col(f"{side}.{vec_col}"),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return (
        pairs.select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            (dot / (norm("x") * norm("y"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
