"""Isolate the signature map stage's 4-vs-16 thread scaling (diagnostic).

The e2e scaling number is dominated by this one stage; if IT doesn't
scale ~4x in one JVM, the bottleneck is per-thread throughput (allocation/
memory bandwidth), not pipeline structure. Warm JIT, same corpus, noop
sink, N repeats per level in the SAME process alternating levels is not
possible (master fixed per JVM) — so child-per-level like bench_scaling.
"""

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EXPAND = int(os.environ.get("SPARK_GRAFT_EXPAND", "300"))
CONCAT = int(os.environ.get("SPARK_GRAFT_CONCAT", "8"))


def child(cpus: int) -> None:
    from lasvdedup_spark.config import DedupConfig
    from lasvdedup_spark.operators.minhash import signatures
    from lasvdedup_spark.session import get_spark
    from lasvdedup_spark.sources.pages import synth_pages_with_dups

    spark = get_spark(
        app_name=f"sig_probe_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/spark_local",
            **(
                {"spark.driver.extraJavaOptions": os.environ["PROBE_JVM_OPTS"]}
                if os.environ.get("PROBE_JVM_OPTS")
                else {}
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig(hash_family="xxhash64")
    pages, _ = synth_pages_with_dups(spark, SF_DIR, expand=EXPAND, concat=CONCAT)
    pages = pages.repartition(96, "url").localCheckpoint(eager=True)
    pages.count()

    def once():
        t0 = time.time()
        signatures(pages, cfg).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    once()  # JIT warm
    best = min(once() for _ in range(2))
    print(json.dumps({"cpus": cpus, "sig_seconds": round(best, 3)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    out = []
    for cpus in (4, 16):
        p = subprocess.run(
            [sys.executable, __file__, "--child", str(cpus)],
            capture_output=True, text=True, check=True,
        )
        out.append(json.loads(p.stdout.strip().splitlines()[-1]))
        time.sleep(2)
    lo, hi = out
    sp = lo["sig_seconds"] / hi["sig_seconds"]
    print(json.dumps({"runs": out, "speedup": round(sp, 3),
                      "efficiency": round(sp / 4, 3)}))


if __name__ == "__main__":
    main()
