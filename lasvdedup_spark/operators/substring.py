"""Long-shared-span (substring) tier.

Semantics: two docs are substring-duplicates iff they share a contiguous
span of >= L tokens. Key identity making this exact AND distributed:

    shared span of >= L tokens  <=>  shared at least one token L-gram.

So membership is an equi-join on L-gram hashes — no suffix array needed for
the *decision*. The suffix-array machinery appears in ``span_lengths``:
an applyInPandas grouped-map that, for each candidate pair, computes the
actual longest common token span (sorted-suffix scan), for reporting and
threshold tuning. That is the engine's only UDTF-shaped operator (SURVEY
§2.9), replacing the reference's external alignment tools as the "expensive
verification kernel".

Scale path: ``sample_mod`` keeps only L-grams whose hash = 0 (mod s) on BOTH
sides — classic winnowing-style sampling; recall trades off explicitly and
the sampling rate is part of the config fingerprint. Default 1 = exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lasvdedup_spark.config import DedupConfig
from lasvdedup_spark.functions.hashing import portable_hash60
from lasvdedup_spark.functions.text import lgrams_expr, tokens_expr


def lgram_hashes(pages: DataFrame, cfg: DedupConfig, id_col: str = "url",
                 sample_mod: int = 1) -> DataFrame:
    """(id, gh) — one row per distinct L-gram hash per doc."""
    g = (
        pages.select(F.col(id_col).alias("id"), tokens_expr("text").alias("tokens"))
        .withColumn("lgrams", lgrams_expr(cfg.substring_min_tokens))
        .select("id", F.explode("lgrams").alias("lgram"))
        .select("id", portable_hash60("lgram").alias("gh"))
    )
    if sample_mod > 1:
        g = g.where(F.pmod(F.col("gh"), F.lit(sample_mod)) == 0)
    return g


def substring_dup_pairs(pages: DataFrame, cfg: DedupConfig, id_col: str = "url",
                        sample_mod: int = 1) -> DataFrame:
    """(id_a, id_b, n_shared_grams) for docs sharing >= 1 L-gram."""
    g = lgram_hashes(pages, cfg, id_col, sample_mod)
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(b, "gh")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_shared_grams"))
    )


def span_lengths(pages: DataFrame, pairs: DataFrame, id_col: str = "url") -> DataFrame:
    """For each candidate pair, the exact longest common token-span length.

    applyInPandas grouped by a pair-bucket: each group gets a batch of pairs
    plus both token arrays (joined in beforehand, so the Python worker never
    sees the corpus — only candidate rows). Suffix-array-style computation
    per pair via sorted suffixes of the concatenated sequence.
    """
    toks = pages.select(
        F.col(id_col).alias("id"), tokens_expr("text").alias("tokens")
    )
    enriched = (
        pairs.select("id_a", "id_b")
        .join(toks.select(F.col("id").alias("id_a"), F.col("tokens").alias("toks_a")), "id_a")
        .join(toks.select(F.col("id").alias("id_b"), F.col("tokens").alias("toks_b")), "id_b")
        .withColumn("bucket", F.pmod(F.xxhash64("id_a", "id_b"), F.lit(64)))
    )

    def _lcs_tokens(a: list, b: list) -> int:
        # longest common substring over token sequences via suffix sorting of
        # the separator-joined sequence; O((n+m) log(n+m)) per pair.
        sep = "\x00"
        seq = list(a) + [sep] + list(b)
        n, na = len(seq), len(a)
        suffixes = sorted(range(n), key=lambda i: seq[i:])
        best = 0
        for i in range(1, n):
            s1, s2 = suffixes[i - 1], suffixes[i]
            # only count pairs of suffixes from different docs
            if (s1 < na) == (s2 < na):
                continue
            l = 0
            while (
                s1 + l < n and s2 + l < n
                and seq[s1 + l] == seq[s2 + l] and seq[s1 + l] != sep
            ):
                l += 1
            best = max(best, l)
        return best

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["span_len"] = [
            _lcs_tokens(ta, tb) for ta, tb in zip(pdf["toks_a"], pdf["toks_b"])
        ]
        return pdf[["id_a", "id_b", "span_len"]]

    return enriched.groupBy("bucket").applyInPandas(
        compute, schema="id_a string, id_b string, span_len int"
    )
