"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "docs_per_sec": ...}

The headline metric is the full dedup pipeline (signatures -> LSH ->
verify -> connected components -> classification) over the synthetic pages
corpus derived from documents.parquet; per-stage queries are timed
individually as well.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    expand = int(os.environ.get("SPARK_GRAFT_EXPAND", "1"))

    from pyspark.sql import functions as F

    from lasvdedup_spark.config import DedupConfig
    from lasvdedup_spark.operators import exact, minhash, simhash
    from lasvdedup_spark.operators.components import assign_components
    from lasvdedup_spark.pipeline import dedup
    from lasvdedup_spark.session import get_spark
    from lasvdedup_spark.sources.pages import synth_pages_with_dups

    spark = get_spark(
        app_name="lasvdedup_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 32),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig()

    pages, _ = synth_pages_with_dups(spark, sf_dir, expand=expand)
    pages = pages.localCheckpoint(eager=True)  # exclude synthesis from timings
    n_docs = pages.count()
    narrow = pages.select("url", "text")

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        timings[name] = round(time.time() - t0, 3)
        return n

    timed("exact_dedup", lambda: exact.exact_dup_clusters(narrow).count())
    sigs = minhash.signatures(narrow, cfg)
    timed("minhash_signatures", lambda: sigs.count())
    timed(
        "lsh_verified_pairs",
        lambda: minhash.minhash_dup_pairs(narrow, cfg).count(),
    )
    timed("simhash_pairs", lambda: simhash.simhash_dup_pairs(narrow, cfg).count())

    t0 = time.time()
    out = dedup(spark, pages, cfg)
    n_classified = out.count()
    pipeline_sec = round(time.time() - t0, 3)
    timings["dedup_pipeline_e2e"] = pipeline_sec

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "dedup_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "n_docs": n_docs,
                "n_classified": n_classified,
                "docs_per_sec": round(n_docs / pipeline_sec, 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
