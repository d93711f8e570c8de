"""Capture .explain("formatted") for named DECLARED queries (entry_queries
QUERIES) into plans/r06/<query>_<tag>.txt. Used by the r06 optimization
round to commit before/after plan evidence for non-bench queries.

Usage: python scripts/capture_query_plans.py <tag> <out_dir> <query> [...]
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from lasvdedup_spark.entry_queries import QUERIES
    from lasvdedup_spark.session import get_spark

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(p)
        print(f"wrote {path} ({len(p)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
