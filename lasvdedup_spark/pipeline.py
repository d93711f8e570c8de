"""Staged pipeline runner: checkpoints, resume, per-stage metrics.

Mirrors the reference's Snakemake incremental DAG
(/root/reference/lasvdedup/pipeline.py:70-78: skip rules whose outputs
exist, --force to rerun) as a driver-side orchestration pattern:

  * every stage writes parquet under <checkpoint_dir>/<config_fingerprint>/<stage>;
  * a finished stage (parquet _SUCCESS present) is read back instead of
    recomputed — resume after a crash costs only the unfinished stages;
  * the fingerprint covers every semantics-affecting config field, so a
    changed config never reuses stale checkpoints (Snakemake gets this from
    file timestamps; we get it from content addressing, which also survives
    clock skew across a cluster);
  * per-stage metrics rows (stage, rows, seconds, skipped) append to a
    metrics parquet — the north rule's per-partition lineage + metrics
    analog of the reference's elapsed-time logging
    (determine_duplicates.py:107,149-150).

On a real deployment the writes target Iceberg tables
(``writeTo(...).createOrReplace()``); in this sandbox the Iceberg runtime
jar is unavailable, so the same IO goes through parquet paths behind this
one module — the stage logic never knows the difference.
"""

from __future__ import annotations

import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lasvdedup_spark.config import DedupConfig


class StageRunner:
    def __init__(self, spark: SparkSession, cfg: DedupConfig):
        self.spark = spark
        self.cfg = cfg
        self.root = (
            os.path.join(cfg.checkpoint_dir, cfg.fingerprint())
            if cfg.checkpoint_dir
            else None
        )
        self.metrics: list[dict] = []

    def _path(self, stage: str) -> str:
        assert self.root is not None
        return os.path.join(self.root, stage)

    def _done(self, stage: str) -> bool:
        return self.root is not None and os.path.exists(
            os.path.join(self._path(stage), "_SUCCESS")
        )

    def stage(
        self, name: str, fn: Callable[[], DataFrame], heavy: bool = False
    ) -> DataFrame:
        """Run-or-resume one stage. Without a checkpoint_dir this is a
        pass-through (pure lazy DataFrame composition) — except heavy=True
        stages, which get a lazy localCheckpoint: they are consumed by
        several downstream subtrees (components AND classification both read
        edges), and without truncation every downstream action re-executes
        the whole signature/band/join pipeline once per reference."""
        t0 = time.time()
        if self.root is None:
            df = fn()
            if heavy:
                df = df.localCheckpoint(eager=False)
            self.metrics.append({"stage": name, "skipped": False, "seconds": 0.0, "rows": -1})
            return df
        if self._done(name):
            df = self.spark.read.parquet(self._path(name))
            self.metrics.append(
                {"stage": name, "skipped": True, "seconds": time.time() - t0, "rows": -1}
            )
            return df
        df = fn()
        df.write.mode("overwrite").parquet(self._path(name))
        out = self.spark.read.parquet(self._path(name))
        rows = out.count()
        self.metrics.append(
            {"stage": name, "skipped": False, "seconds": time.time() - t0, "rows": rows}
        )
        self._write_partition_lineage(name, out)
        return out

    def _write_partition_lineage(self, stage: str, df: DataFrame) -> None:
        """Per-partition lineage rows (north rule): how many rows each
        partition of the persisted stage holds, keyed by stage + config
        fingerprint. This is what makes skew VISIBLE after the fact — a
        stage whose max/mean partition ratio blows up is the one to salt —
        and it documents exactly which partition of which checkpoint any
        downstream row came from."""
        pl = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .select(
                F.lit(stage).alias("stage"),
                F.lit(self.cfg.fingerprint()).alias("config_fingerprint"),
                "partition_id",
                F.col("count").alias("rows"),
                F.lit(float(time.time())).alias("logged_at"),
            )
        )
        pl.write.mode("append").parquet(os.path.join(self.root, "_lineage"))

    def write_metrics(self) -> None:
        if self.root is None:
            return
        mdf = self.spark.createDataFrame(
            [
                (m["stage"], bool(m["skipped"]), float(m["seconds"]), int(m["rows"]), time.time())
                for m in self.metrics
            ],
            "stage string, skipped boolean, seconds double, rows long, logged_at double",
        )
        mdf.write.mode("append").parquet(os.path.join(self.root, "_metrics"))


def dedup(
    spark: SparkSession,
    pages: DataFrame,
    cfg: DedupConfig | None = None,
    tiers: tuple[str, ...] = ("minhash",),
) -> DataFrame:
    """Public API: pages -> classifications DataFrame (lazy unless
    checkpointing). The analog of the reference's importable
    ``determine_duplicates(config=...)`` entry point
    (/root/reference/lasvdedup/utils/determine_duplicates.py:52-153).

    tiers ⊆ {"exact", "minhash", "simhash", "substring"} select which edge
    generators feed the shared connected-components + classification stages.
    "exact" edges are implied by "minhash" (identical text ⇒ identical
    signature ⇒ jaccard 1.0), so the default single tier is complete.
    """
    from lasvdedup_spark.operators import classify as C
    from lasvdedup_spark.operators import components, exact, minhash, simhash, substring

    cfg = cfg or DedupConfig()
    r = StageRunner(spark, cfg)

    narrow = r.stage(
        "narrow",
        lambda: pages.select(
            "url", "text", F.length("text").alias("n_chars")
        ),
    )

    edge_frames = []
    if "exact" in tiers:
        e = r.stage("edges_exact", lambda: exact.exact_dup_pairs(narrow).withColumn(
            "jaccard", F.lit(1.0)
        ))
        edge_frames.append(e.select("id_a", "id_b", "jaccard"))
    if "minhash" in tiers:
        # the north rule's checkpoint stages: signatures -> bands -> pairs
        sigs = r.stage(
            "signatures", lambda: minhash.signatures(narrow, cfg), heavy=True
        )
        bands = r.stage(
            "bands", lambda: minhash.capped_buckets(minhash.band_buckets(sigs, cfg), cfg)
        )
        e = r.stage(
            "pairs",
            lambda: minhash.verified_pairs(
                minhash.candidate_pairs(bands, cfg), sigs, cfg
            ),
        )
        edge_frames.append(e.select("id_a", "id_b", "jaccard"))
    if "simhash" in tiers:
        e = r.stage(
            "edges_simhash",
            lambda: simhash.simhash_dup_pairs(narrow, cfg).withColumn(
                "jaccard", 1.0 - F.col("hamming") / F.lit(60.0)
            ),
        )
        edge_frames.append(e.select("id_a", "id_b", "jaccard"))
    if "substring" in tiers:
        e = r.stage(
            "edges_substring",
            lambda: substring.substring_dup_pairs(narrow, cfg).withColumn(
                "jaccard", F.lit(1.0)  # shared-span edges are hard links
            ),
        )
        edge_frames.append(e.select("id_a", "id_b", "jaccard"))
    if not edge_frames:
        raise ValueError("at least one tier required")

    all_edges = edge_frames[0]
    for f in edge_frames[1:]:
        all_edges = all_edges.unionByName(f)
    # same pair from several tiers: keep max similarity
    edges = r.stage(
        "edges",
        lambda: all_edges.groupBy("id_a", "id_b").agg(F.max("jaccard").alias("jaccard")),
        heavy=True,
    )

    assignments = r.stage(
        "components",
        lambda: components.assign_components(narrow, edges),
        heavy=True,
    )

    stats = narrow.select(F.col("url").alias("id"), "n_chars")
    out = r.stage(
        "classifications",
        lambda: C.classify(assignments, edges, stats, cfg).withColumnRenamed(
            "id", "url"
        ).orderBy("url"),
    )
    r.write_metrics()
    return out
