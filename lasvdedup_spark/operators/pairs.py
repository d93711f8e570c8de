"""Generic skew-proof unordered-pair generation from a keyed table.

One routine serves every tier that turns key collisions into candidate
pairs — LSH band buckets (minhash), token L-grams (substring), hyperplane
buckets (ann). All three share the same scale hazard: a boilerplate key
with m members puts m^2/2 pair enumerations in one task. The fix is the
north rule's salted join, written once.

Lazy by construction: no action runs at plan-composition time (the round-1
version ran an isEmpty() census to route around the salt machinery; that
executed the whole upstream subtree just to build a plan and made the
operator illegal on streaming DataFrames). Instead the plan is always
  plain(small keys, via left_anti)  UNION  salted(big keys, via left_semi)
and when no key exceeds the cutoff the salted side is simply empty at
runtime — the empty case costs one map-side-combinable size census and two
broadcast probes, not a driver-side branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_pair_join(
    keyed: DataFrame,
    key_col: str,
    salt_buckets: int,
    skew_cutoff: int,
    count_alias: str = "n_keys",
    id_col: str = "id",
    carry: str | None = None,
) -> DataFrame:
    """keyed(id, key) -> distinct unordered pairs (id_a < id_b, <count_alias>)
    where <count_alias> = number of distinct keys the pair collided on.

    The a.id < b.id predicate is the reference's i<j pair dedup
    (/root/reference/lasvdedup/utils/distance_matrix.py:38). Dedup across
    keys via groupBy (map-side partial agg), never distinct() on the
    exploded rows.

    Skew: keys with more than ``skew_cutoff`` members take a salted path —
    the left side keeps one salt s(id) = pmod(xxhash64(id), S), the right
    side replicates to every salt; joining on (key, salt) yields each
    unordered pair exactly once (from the orientation where the smaller id
    sits on the left) while spreading the key's pair space over S tasks.
    AQE skew-join stays on as a backstop for milder imbalance.

    carry: optional NARROW per-id payload column in ``keyed`` to ride
    through the join into the output as <carry>_a / <carry>_b. For a
    scalar payload (simhash's one int64) this deletes the two
    join-the-values-back-for-verify shuffles entirely; for wide payloads
    (minhash signatures, embedding vectors) do NOT carry — the payload
    would multiply through every (key, id) row of the shuffle, which is
    exactly what the candidates-then-verify shape avoids.
    """
    kid = F.col(id_col)
    pa, pb = (f"{carry}_a", f"{carry}_b") if carry else (None, None)

    def _pair_cols(prefix_a: str = "a", prefix_b: str = "b") -> list:
        cols = [
            F.col(f"{prefix_a}.{id_col}").alias("id_a"),
            F.col(f"{prefix_b}.{id_col}").alias("id_b"),
        ]
        if carry:
            cols += [
                F.col(f"{prefix_a}.{carry}").alias(pa),
                F.col(f"{prefix_b}.{carry}").alias(pb),
            ]
        return cols

    # payload is functionally dependent on id, so grouping by it too keeps
    # the same (id_a, id_b) groups while letting it ride the aggregation
    group_cols = ["id_a", "id_b"] + ([pa, pb] if carry else [])

    if salt_buckets <= 1:
        a, b = keyed.alias("a"), keyed.alias("b")
        joined = a.join(b, key_col).where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        return joined.select(*_pair_cols()).groupBy(*group_cols).agg(
            F.count("*").alias(count_alias)
        )

    # Referenced by three subtrees (census, small path, salted path); lazy
    # localCheckpoint so the upstream pipeline runs once per action, not
    # three times (Spark has no cross-subtree CSE). Lazy = still no job at
    # composition time.
    keyed = keyed.localCheckpoint(eager=False)
    sizes = keyed.groupBy(key_col).agg(F.count("*").alias("_ksz"))
    big = sizes.where(F.col("_ksz") > skew_cutoff).select(key_col)

    small = keyed.join(F.broadcast(big), key_col, "left_anti")
    plain = (
        small.alias("a")
        .join(small.alias("b"), key_col)
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(*_pair_cols())
    )

    skewed = keyed.join(F.broadcast(big), key_col, "left_semi")
    s = salt_buckets
    left = skewed.withColumn("_salt", F.pmod(F.xxhash64(kid), F.lit(s)))
    right = skewed.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(s - 1))))
    salted = (
        left.alias("a")
        .join(right.alias("b"), [key_col, "_salt"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(*_pair_cols())
    )

    return (
        plain.unionByName(salted)
        .groupBy(*group_cols)
        .agg(F.count("*").alias(count_alias))
    )
