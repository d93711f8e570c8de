"""SparkSession factory with the engine's recommended configuration.

Tuned for correctness-at-scale defaults: AQE on (runtime re-plan, skew-join
backstop behind our explicit salting/caps), Arrow on (pandas UDF transfers),
shuffle partitions sized by caller (32 threads locally; a real cluster sets
this to ~2-3x total cores).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lasvdedup_spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict | None = None,
) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    b = (
        b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # deterministic timestamp behavior regardless of host zone
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
