"""Portable hash expression builders (Spark Column side).

The reference outsources all content hashing to external alignment tools;
here hashing IS the engine, so it must be (a) fast — JVM-side, inside
whole-stage codegen — and (b) reproducible in a second engine for the
correctness oracle.

Portable family: ``bigint(conv(substr(md5(s), 1, N), 16, 10))``.
  * N=15 -> 60-bit non-negative hash (general purpose, simhash bit source)
  * N=7  -> 28-bit hash (minhash input: keeps a*h+b < 2^60, see config.py)
DuckDB spells the same thing ``('0x' || substr(md5(s),1,N))::BIGINT`` —
verified bit-identical (see tests/test_hashing.py).

Production family: xxhash64 (Spark built-in, ~10x faster than md5) — same
call shapes, not oracle-checkable. Selected by DedupConfig.hash_family.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from lasvdedup_spark.config import MINHASH_PRIME, DedupConfig


def portable_hash60(col: Column | str) -> Column:
    """60-bit non-negative portable hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash28_sql(expr: str) -> str:
    """SQL-fragment form of the 28-bit hash, for use inside lambda exprs."""
    return f"cast(conv(substr(md5({expr}),1,7),16,10) as bigint)"


def fast_hash64(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def shingle_hash_sql(cfg: DedupConfig, expr: str) -> str:
    """Hash fragment applied to each shingle string (inside transform())."""
    if cfg.hash_family == "md5":
        return portable_hash28_sql(expr)
    # xxhash64 is signed; fold into the same non-negative 28-bit range so the
    # minhash overflow guarantee (a*h+b < 2^60) still holds.
    return f"pmod(xxhash64({expr}), 268435456)"


def minhash_sig_expr(cfg: DedupConfig, shingles_col: str = "shingles") -> Column:
    """MinHash signature as array<bigint>, fully JVM-side.

    sig[j] = min over shingles s of (a_j * h28(s) + b_j) mod P.

    Replaces the reference's PhyloDM Rust distance kernel
    (/root/reference/lasvdedup/utils/distance_matrix.py:15) as the
    "vectorized native compute" — here it is Catalyst higher-order
    functions inside whole-stage codegen, no Python worker hop at all.
    """
    perms = ", ".join(f"struct({a}L as a, {b}L as b)" for a, b in cfg.permutations)
    h = shingle_hash_sql(cfg, "s")
    return F.expr(
        f"transform(array({perms}), "
        f"  p -> array_min(transform({shingles_col}, "
        f"    s -> pmod(p.a * {h} + p.b, {MINHASH_PRIME}))))"
    )


def band_keys_expr(cfg: DedupConfig, sig_col: str = "sig") -> Column:
    """LSH band bucket keys: array of 'band_id:csv(rows)' strings.

    Banding b x r: two docs collide iff some band's r signature rows are all
    equal — the standard S-curve with threshold ~ (1/b)^(1/r).
    """
    b, r = cfg.lsh_bands, cfg.lsh_rows
    return F.expr(
        f"transform(sequence(0, {b - 1}), "
        f"  i -> concat(cast(i as string), ':', "
        f"       concat_ws(',', slice({sig_col}, i*{r}+1, {r}))))"
    )


def sig_jaccard_expr(a: str = "sig_a", b: str = "sig_b") -> Column:
    """Estimated Jaccard from two MinHash signatures: fraction of agreeing
    positions. This is the graft's pairwise-distance replacement (distance =
    1 - jaccard) for the reference's patristic distance
    (/root/reference/lasvdedup/utils/distance_matrix.py:35-43)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> if(x = y, 1, 0)), "
        f"0, (acc, v) -> acc + v) / size({a})"
    ).cast("double")


def set_jaccard_expr(a: str, b: str) -> Column:
    """Exact Jaccard of two array columns (distinct elements assumed)."""
    return (
        F.size(F.array_intersect(F.col(a), F.col(b)))
        / F.size(F.array_union(F.col(a), F.col(b)))
    ).cast("double")
