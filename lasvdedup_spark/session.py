"""SparkSession factory with the engine's recommended configuration.

Tuned for correctness-at-scale defaults: AQE on (runtime re-plan, skew-join
backstop behind our explicit salting/caps), Arrow on (pandas UDF transfers),
shuffle partitions sized by caller (32 threads locally; a real cluster sets
this to ~2-3x total cores).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession


def iceberg_runtime_jar() -> str | None:
    """Path of an iceberg-spark-runtime jar on the local Spark classpath,
    or None. Session configs must be set BEFORE getOrCreate, so the probe
    is a filesystem check of the jar directories Spark actually loads from
    (pyspark's bundled jars/ + $SPARK_HOME/jars), not a JVM class lookup
    against a session that doesn't exist yet."""
    import pyspark

    dirs = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    if os.environ.get("SPARK_HOME"):
        dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    for d in dirs:
        hits = glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


def get_spark(
    app_name: str = "lasvdedup_spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict | None = None,
    iceberg_warehouse: str | None = None,
) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    if iceberg_runtime_jar() is not None:
        # Iceberg runtime detected at session build: register the 'local'
        # hadoop catalog so the production writeTo(...).partitionedBy(...)
        # sink path (sinks.py) and its guarded test run for real. In
        # environments without the jar these configs are simply not set and
        # everything routes through the parquet seam as before.
        warehouse = iceberg_warehouse or os.path.join(
            os.path.expanduser("~"), ".lasvdedup_spark", "iceberg_warehouse"
        )
        b = (
            b.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config(
                "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
            )
            .config("spark.sql.catalog.local.type", "hadoop")
            .config("spark.sql.catalog.local.warehouse", warehouse)
        )
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
