"""Similarity search over embedding columns (array<float>).

Not in the reference (its similarity space is phylogenetic distance); this is
the embedding-cosine near-dup / ANN family a training-data pipeline needs
(task brief), built the same two-tier way as the text dedup:

  * brute-force top-k cosine — the exactness baseline (quadratic; fine for
    a bounded query set, never for all-pairs at scale);
  * random-hyperplane LSH (SimHash-for-vectors, Charikar'02) — deterministic
    sign planes derived from md5 parity, so buckets are portable to the
    DuckDB oracle exactly like the text hashes.

Cosine is computed JVM-side with higher-order functions (zip_with +
aggregate), summing in array order so both engines produce bit-identical
doubles before the defensive rounding.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plane_signs(n_planes: int, dim: int, seed: str = "ann") -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix from md5 parity — shared verbatim
    by the Spark exprs and the DuckDB oracle SQL."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h[:2], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def _dot_sql(a: str, b: str) -> str:
    """Sequential left-to-right double dot product of two array columns."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0 as double), (acc, v) -> acc + v)"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt({_dot_sql(a, a)})"


def cosine_expr(a: str, b: str):
    return F.expr(f"{_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)})")


def knn_bruteforce(
    queries: DataFrame,   # (qid, qvec)
    targets: DataFrame,   # (tid, tvec)
    k: int,
) -> DataFrame:
    """Exact top-k cosine per query. The query side is expected small
    (broadcast); targets stream through — one pass, no shuffle of targets.
    -> (qid, tid, pos, score)."""
    j = targets.crossJoin(F.broadcast(queries))
    scored = j.withColumn("score", cosine_expr("qvec", "tvec"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("tid"))
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select("qid", "tid", F.col("pos").cast("long").alias("pos"),
                F.round("score", 6).alias("score"))
    )


def hyperplane_bucket_expr(planes: list[list[int]], vec_col: str = "embedding"):
    """Bucket id = bits of sign(plane . vec), bit p worth 2^p.

    Written as one textual sum per plane so evaluation order is fixed and
    identical to the oracle's SQL."""
    terms = []
    for p, row in enumerate(planes):
        dot = " + ".join(
            f"({s}) * cast(element_at({vec_col}, {d + 1}) as double)"
            for d, s in enumerate(row)
        )
        terms.append(f"(case when ({dot}) > 0 then {1 << p} else 0 end)")
    return F.expr(" + ".join(terms)).cast("long")


def ann_buckets(vectors: DataFrame, planes: list[list[int]],
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return vectors.select(
        F.col(id_col).alias("id"),
        hyperplane_bucket_expr(planes, vec_col).alias("bucket"),
    )


def cosine_dup_pairs(
    vectors: DataFrame,
    planes: list[list[int]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: unordered pairs that collide
    in a hyperplane bucket AND score cosine >= threshold (inclusive, same
    convention as the text tiers). The embedding analog of
    minhash_dup_pairs — these edges can feed the same connected-components
    + classification stages. -> (id_a, id_b, cosine)."""
    b = ann_buckets(vectors, planes, id_col, vec_col)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    withv = b.join(v, "id")
    a = withv.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket")
    t = withv.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket")
    return (
        a.join(t, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr("vec_a", "vec_b"))
        .where(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .distinct()  # a pair may collide in several salted variants upstream
    )


def ann_lsh_topk(
    vectors: DataFrame,
    planes: list[list[int]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k neighbors per vector among same-bucket candidates.
    The scale path: bucket join instead of cross join; recall grows with
    multi-probe or fewer planes (config), traded against candidate count."""
    b = ann_buckets(vectors, planes, id_col, vec_col)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    withv = b.join(v, "id")
    a = withv.select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec"), "bucket"
    )
    t = withv.select(
        F.col("id").alias("tid"), F.col("vec").alias("tvec"), "bucket"
    )
    cand = a.join(t, "bucket").where(F.col("qid") != F.col("tid"))
    scored = cand.withColumn("score", cosine_expr("qvec", "tvec"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("tid"))
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select("qid", "tid", F.col("pos").cast("long").alias("pos"),
                F.round("score", 6).alias("score"))
    )
