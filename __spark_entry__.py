"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: full dedup pipeline (signatures -> LSH bands ->
               salted bucket join -> signature-jaccard verify -> connected
               components -> classification cascade) over the synthetic
               pages table at sf0.001.
queries()    — one entry per implemented operator from SURVEY.md §2,
               each oracle-checked against DuckDB at sf0.01.
oracle_sql() — the DuckDB twins (portable md5-prefix hashing makes even
               MinHash/LSH/clustering value-hash-exact across engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from lasvdedup_spark.config import DedupConfig
    from lasvdedup_spark.pipeline import dedup
    from lasvdedup_spark.sources.pages import synth_pages_with_dups

    pages, _truth = synth_pages_with_dups(spark, "/root/testdata/sf0.001")
    cfg = DedupConfig()
    out = dedup(spark, pages, cfg)
    # stable schema + deterministic order for the smoke check
    return out.select(
        "url",
        "component",
        "classification",
        "decision_category",
        F.col("rank").cast("long").alias("rank"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "rep_id",
    ).orderBy("url")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lasvdedup_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from lasvdedup_spark.entry_queries import ORACLES

    return dict(ORACLES)
