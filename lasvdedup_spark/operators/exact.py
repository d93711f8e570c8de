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


def with_content_hash(
    pages: DataFrame, text_col: str = "text", hash_family: str = "md5"
) -> DataFrame:
    """Content hash for the exact tier. md5 (default) is the DuckDB-oracle
    -portable family; production runs pass cfg.hash_family="xxhash64"
    because JDK MessageDigest serializes on the JCA provider lock — an
    md5-heavy map stage does not scale across executor threads within one
    JVM (measured flat ~20s at local[8] AND local[32]; BENCH.md). xxhash64
    is 64-bit, so it is composed with length(text) to push the collision
    odds for a false merge far below the 1e12-doc birthday bound."""
    col = F.col(text_col)
    if hash_family == "xxhash64":
        h = F.concat_ws(
            ":", F.hex(F.xxhash64(col)), F.length(col).cast("string")
        )
    else:
        h = F.md5(col)
    return pages.withColumn("content_hash", h)


def exact_dup_clusters(
    pages: DataFrame, id_col: str = "url", hash_family: str = "md5"
) -> DataFrame:
    """(id, content_hash, cluster_size, rep_id, is_duplicate).

    rep = min id per hash group: deterministic under any partitioning —
    the reference's tie rule is "first encountered" under a stable sort
    (io_utils.py:48-55); distributed engines have no input order, so the
    explicit id tiebreak is the order-isomorphic equivalent (SURVEY §7).
    """
    h = with_content_hash(pages, hash_family=hash_family)
    w = Window.partitionBy("content_hash")
    return (
        h.select(id_col, "content_hash")
        .withColumn("cluster_size", F.count("*").over(w))
        .withColumn("rep_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", (F.col(id_col) != F.col("rep_id")))
    )


def exact_dup_pairs(
    pages: DataFrame, id_col: str = "url", hash_family: str = "md5"
) -> DataFrame:
    """Star edges (rep_id, member) per exact-dup cluster, id_a < id_b.

    Deliberately NOT the all-pairs enumeration of the reference's
    get_distances (distance_matrix.py:35-43): connected components only
    need a spanning structure, and a web-scale boilerplate cluster of 100k
    identical pages would otherwise emit 5e9 edges inside one hash group.
    Star edges are O(m) per cluster and produce identical components
    (every member is linked to the cluster minimum). rep_id = min id, so
    id_a < id_b holds by construction."""
    c = exact_dup_clusters(pages, id_col, hash_family=hash_family)
    return c.where(F.col("is_duplicate")).select(
        F.col("rep_id").alias("id_a"), F.col(id_col).alias("id_b")
    )
