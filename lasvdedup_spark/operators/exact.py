"""Exact duplicate detection — the cheapest tier of the cascade.

The reference's early-exit ordering (cheap distance test before expensive
tree ops, /root/reference/lasvdedup/utils/sequence_grouping.py:209-254)
becomes staged filtering here: exact-hash dedup first, each later tier
(simhash, minhash/LSH, substring) only refines what remains.

Pure built-ins: md5 -> groupBy -> window. One shuffle on the content hash;
at 100 TB this is the map-side-combinable kind (distinct hashes << rows when
duplication exists; AQE coalesces the tiny post-agg partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_content_hash(pages: DataFrame, text_col: str = "text") -> DataFrame:
    return pages.withColumn("content_hash", F.md5(F.col(text_col)))


def exact_dup_clusters(pages: DataFrame, id_col: str = "url") -> DataFrame:
    """(id, content_hash, cluster_size, rep_id, is_duplicate).

    rep = min id per hash group: deterministic under any partitioning —
    the reference's tie rule is "first encountered" under a stable sort
    (io_utils.py:48-55); distributed engines have no input order, so the
    explicit id tiebreak is the order-isomorphic equivalent (SURVEY §7).
    """
    h = with_content_hash(pages)
    w = Window.partitionBy("content_hash")
    return (
        h.select(id_col, "content_hash")
        .withColumn("cluster_size", F.count("*").over(w))
        .withColumn("rep_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", (F.col(id_col) != F.col("rep_id")))
    )


def exact_dup_pairs(pages: DataFrame, id_col: str = "url") -> DataFrame:
    """Unordered exact-dup pairs (a < b), the i<j dedup of the reference's
    get_distances pair enumeration (distance_matrix.py:35-43)."""
    h = with_content_hash(pages).select(F.col(id_col).alias("id"), "content_hash")
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(b, "content_hash")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
