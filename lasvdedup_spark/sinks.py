"""Output sinks: classification table writes + projected views.

Reproduces the reference's output surface (io_utils.py:111-169) Spark-first:

  * per-class FASTA directories (io_utils.py:111-144: one subdir per
    good/bad verdict) -> ONE table partitioned by classification: partition
    pruning gives "read only the good docs" for free, which is the actual
    downstream access pattern of a training-data pipeline;
  * classification TSV (io_utils.py:146-157, sorted by name) ->
    ``ORDER BY url`` parquet/Iceberg write;
  * FigTree annotation TSV (io_utils.py:160-169: 4-column projection
    sequence_name/classification/decision_category/sample_id) ->
    ``figtree_view``, the same projection over the classifications table
    (sample_id's analog is the cluster/component id).

On a real deployment writes go to Iceberg (``writeTo(...)``); the sandbox
has no Iceberg runtime jar, so ``write_classifications`` takes either an
``iceberg_table`` (the production path, exercised wherever the jar exists)
or a parquet ``path`` — one seam, mirroring pipeline.py's checkpoint IO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def figtree_view(classifications: DataFrame) -> DataFrame:
    """4-column annotation projection (reference io_utils.py:160-169).
    sample_id -> component: the grouping key whose members were judged
    together, exactly the role sample_id plays in the reference."""
    return classifications.select(
        "url",
        "classification",
        "decision_category",
        F.col("component").alias("sample_id"),
    )


def write_classifications(
    classifications: DataFrame,
    path: str | None = None,
    iceberg_table: str | None = None,
) -> None:
    """Write the final classifications partitioned by verdict.

    Exactly one of ``path`` (parquet directory) or ``iceberg_table``
    (catalog table name, e.g. ``local.db.classifications``) must be given.
    Partitioning by classification mirrors the reference's per-class output
    directories (io_utils.py:111-144) and makes the dominant downstream
    read ("give me the kept documents") a partition-pruned scan.
    """
    if (path is None) == (iceberg_table is None):
        raise ValueError("pass exactly one of path= or iceberg_table=")
    if iceberg_table is not None:
        (
            classifications.writeTo(iceberg_table)
            .partitionedBy(F.col("classification"))
            .createOrReplace()
        )
        return
    (
        classifications.write.mode("overwrite")
        .partitionBy("classification")
        .parquet(path)
    )
