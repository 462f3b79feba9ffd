"""Similarity search over embedding columns (array<float>).

  brute_topk     — exact cosine top-k: JVM-side fold (aggregate/zip_with),
                   no Python in the loop; the correctness baseline.
  lsh_topk       — random-hyperplane LSH bucketing: signature = sign bits
                   of projections onto fixed seeded hyperplanes; search
                   only the query's bucket (scale path: the bucket join
                   shuffles a tiny fraction of the table).
  cosine_neardup — embedding near-duplicate pairs above a cosine
                   threshold, inverted on LSH buckets at scale.

Cosine is computed in float64 with a sequential left fold in BOTH Spark
and the DuckDB oracle so results match bit-for-bit (rounded to 6dp for
hash stability).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

N_PLANES = 8


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(1234)  # fixed seed: same planes every call
    return rng.integers(-1000, 1001, size=(N_PLANES, dim)).astype(np.float64) / 1000.0


def _vec_lit_spark(vec) -> str:
    return "array(" + ",".join(f"cast({float(x)!r} as double)" for x in vec) + ")"


def _vec_lit_duck(vec) -> str:
    return "[" + ",".join(repr(float(x)) for x in vec) + "]::DOUBLE[]"


def _dot_spark(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def _dot_duck(a: str, b: str) -> str:
    # index fold keeps the same left-to-right summation order as Spark
    return (
        f"list_reduce(list_prepend(cast(0 as double), "
        f"list_transform(generate_series(1, len({a})), i -> ({a})[i] * ({b})[i])), "
        f"(acc, v) -> acc + v)"
    )


def _cos_spark(a: str, b: str) -> str:
    return f"round({_dot_spark(a, b)} / (sqrt({_dot_spark(a, a)}) * sqrt({_dot_spark(b, b)})), 6)"


def _cos_duck(a: str, b: str) -> str:
    return f"round({_dot_duck(a, b)} / (sqrt({_dot_duck(a, a)}) * sqrt({_dot_duck(b, b)})), 6)"


EMB_D_SPARK = "cast(embedding as array<double>)"
EMB_D_DUCK = "embedding::DOUBLE[]"


def brute_topk(df: DataFrame, query_vec, k: int = 10) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = _vec_lit_spark(query_vec)
    return (
        df.select(
            "vec_id",
            F.expr(_cos_spark(EMB_D_SPARK, q)).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def brute_topk_oracle(query_vec, k: int = 10) -> str:
    q = _vec_lit_duck(query_vec)
    return f"""
SELECT vec_id, {_cos_duck(EMB_D_DUCK, q)} AS cos
FROM embeddings
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def lsh_bucket_expr_spark(dim: int) -> str:
    planes = _planes(dim)
    terms = []
    for j in range(N_PLANES):
        p = _vec_lit_spark(planes[j])
        terms.append(f"(case when {_dot_spark(EMB_D_SPARK, p)} > 0 then {1 << j} else 0 end)")
    return " + ".join(terms)


def lsh_bucket_expr_duck(dim: int) -> str:
    planes = _planes(dim)
    terms = []
    for j in range(N_PLANES):
        p = _vec_lit_duck(planes[j])
        terms.append(f"(CASE WHEN {_dot_duck(EMB_D_DUCK, p)} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


def lsh_topk(df: DataFrame, query_vec, k: int = 10, dim: int | None = None) -> DataFrame:
    """ANN: search only vectors sharing the query's hyperplane-sign bucket.

    At scale the bucket column is a partition key: the probe touches one
    bucket's partitions instead of the full table.
    """
    dim = dim or len(query_vec)
    q = _vec_lit_spark(query_vec)
    # evaluate the query's bucket with the SAME fold expression used for
    # the table (identical float op order -> identical sign decisions)
    spark = df.sparkSession
    qbucket = spark.range(1).select(
        F.expr(lsh_bucket_expr_spark(dim).replace(EMB_D_SPARK, q)).alias("b")
    ).first()["b"]
    return (
        df.withColumn("bucket", F.expr(lsh_bucket_expr_spark(dim)))
        .filter(F.col("bucket") == qbucket)
        .select("vec_id", F.expr(_cos_spark(EMB_D_SPARK, q)).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_topk_oracle(query_vec, k: int = 10, dim: int | None = None) -> str:
    dim = dim or len(query_vec)
    q = _vec_lit_duck(query_vec)
    qbucket = lsh_bucket_expr_duck(dim).replace(EMB_D_DUCK, q)
    return f"""
SELECT vec_id, {_cos_duck(EMB_D_DUCK, q)} AS cos
FROM (SELECT vec_id, embedding, {lsh_bucket_expr_duck(dim)} AS bucket FROM embeddings)
WHERE bucket = ({qbucket})
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def cosine_neardup(df: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold), bucketed by
    LSH so the join is bucket-local rather than a full cross join."""
    dim = len(df.select("embedding").first()["embedding"])
    b = df.withColumn("bucket", F.expr(lsh_bucket_expr_spark(dim)))
    a, c = b.alias("a"), b.alias("b")
    cos = _cos_spark("cast(a.embedding as array<double>)", "cast(b.embedding as array<double>)")
    return (
        a.join(c, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.expr(cos).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def cosine_neardup_oracle(dim: int, threshold: float = 0.95) -> str:
    cos = _cos_duck("x.embedding::DOUBLE[]", "y.embedding::DOUBLE[]")
    return f"""
WITH bk AS (SELECT vec_id, embedding, {lsh_bucket_expr_duck(dim)} AS bucket FROM embeddings)
SELECT x.vec_id AS id_a, y.vec_id AS id_b, {cos} AS cos
FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE {cos} >= {threshold}
"""
