"""Cross-engine hash parity: the portable md5-prefix hash family must be
bit-identical between Spark and DuckDB — this is what makes every downstream
stage oracle-checkable."""

import duckdb
import pytest
from pyspark.sql import functions as F

from lasvdedup_spark.config import DedupConfig
from lasvdedup_spark.functions.hashing import (
    minhash_sig_expr,
    portable_hash60,
    sig_jaccard_expr,
)
from lasvdedup_spark.functions.text import shingles_expr, tokens_expr

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "a b",
    "single",
]


@pytest.fixture(scope="module")
def cfg():
    # md5 pinned: this suite exists to prove the oracle-portable family
    return DedupConfig(num_perms=8, lsh_bands=4, lsh_rows=2, hash_family="md5")


def test_portable_hash60_matches_duckdb(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_hash60("s").alias("h")).collect()
    }
    for t in TEXTS:
        (want,) = duckdb.sql(
            "select ('0x' || substr(md5(?),1,15))::BIGINT", params=[t]
        ).fetchone()
        assert got[t] == want, t


def test_minhash_signature_matches_duckdb(spark, cfg):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    sigs = (
        df.withColumn("tokens", tokens_expr())
        .withColumn("shingles", shingles_expr(cfg.shingle_k))
        .select("text", minhash_sig_expr(cfg).alias("sig"))
        .collect()
    )
    perms = cfg.permutations
    k = cfg.shingle_k
    for row in sigs:
        sql = f"""
        with t as (select string_split(lower(trim(?)), ' ') toks),
        s as (select list_distinct([array_to_string(toks[i+1:i+{k}], ' ')
                     for i in range(greatest(len(toks)-{k},0)+1)]) sh from t)
        select [list_min([(p[1] * ('0x'||substr(md5(x),1,7))::BIGINT + p[2]) % 2147483647
                for x in sh])
                for p in [{",".join(f"[{a},{b}]" for a, b in perms)}]] from s
        """
        (want,) = duckdb.sql(sql, params=[row["text"]]).fetchone()
        assert list(row["sig"]) == list(want), row["text"]


def test_sig_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4], [1, 2, 3, 4]), ([1, 2, 3, 4], [5, 6, 7, 8]),
         ([1, 2, 3, 4], [1, 2, 9, 9])],
        ["sig_a", "sig_b"],
    )
    vals = [r["j"] for r in df.select(sig_jaccard_expr().alias("j")).collect()]
    assert vals == [1.0, 0.0, 0.5]
