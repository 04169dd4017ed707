"""Vector similarity operators over embedding columns (array<float>).

JVM-side built-ins (``zip_with``/``aggregate``) — no Python in the hot
path. Brute-force cosine top-k is the correctness baseline; the LSH-bucket
variant is the 100 TB scale path (candidates per bucket, never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    Plan: scan → per-row cosine (codegen'd) → TakeOrderedAndProject
    (Catalyst rewrites orderBy+limit to a top-k, no full sort)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), round_to).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def neardup_pairs_by_label(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    round_to: int = 5,
) -> DataFrame:
    """Embedding near-dup pairs within a blocking key (label): equi-join on
    the block bounds the pair explosion — the all-pairs cosine only happens
    inside a block. At scale the block key is an LSH bucket."""
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(label_col).alias("lbl"), F.col(vec_col).alias("va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(label_col).alias("lbl"), F.col(vec_col).alias("vb")
    )
    return (
        a.join(b, "lbl")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")),
                round_to,
            ),
        )
        .where(F.col("cos_sim") >= threshold)
        .select("lbl", "id_a", "id_b", "cos_sim")
    )


def plane_component(i: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1].

    md5-derived so the identical value is computable in SQL:
    ``(CAST('0x'||substr(md5('pl'||i||':'||j),1,15) AS BIGINT) % 2001 - 1000)
    / 1000.0`` — keeps the LSH bucketing oracle-checkable cross-engine.
    """
    import hashlib

    h = int(hashlib.md5(f"pl{i}:{j}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def lsh_bucket_ann(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane LSH bucketing: sign pattern of `n_planes` fixed
    hash-derived projections → bucket id. The IVF/LSH scale path for ANN:
    query hashes to a bucket; search only that bucket."""
    bucket = F.lit(0).cast("long")
    v = F.col(vec_col).cast("array<double>")
    for i in range(n_planes):
        plane = F.array(*[F.lit(plane_component(i, j)) for j in range(dim)])
        bucket = bucket + F.when(dot(v, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.select(F.col(id_col), bucket.alias("bucket"))
