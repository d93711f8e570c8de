"""Per-stage profile of the scaling child: same job as bench_scaling.py
--child, with the Spark event log enabled, then a driver-side parse of
stage timelines — per-stage duration, task-time sum, and inter-stage gaps
(scheduling/AQE/driver latency). Diagnostic only; not part of the bench."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EXPAND = int(os.environ.get("SPARK_GRAFT_EXPAND", "300"))
CONCAT = int(os.environ.get("SPARK_GRAFT_CONCAT", "8"))
CPUS = int(os.environ.get("PROFILE_CPUS", "16"))
LOGDIR = "/tmp/spark-events-profile"


def run() -> None:
    from lasvdedup_spark.config import DedupConfig
    from lasvdedup_spark.pipeline import dedup
    from lasvdedup_spark.session import get_spark
    from lasvdedup_spark.sources.pages import synth_pages_with_dups

    import shutil

    shutil.rmtree(LOGDIR, ignore_errors=True)
    os.makedirs(LOGDIR, exist_ok=True)
    spark = get_spark(
        app_name=f"lasvdedup_profile_{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(2 * CPUS, 16),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/spark_local",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": LOGDIR,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig(hash_family="xxhash64")

    warm_pages, _ = synth_pages_with_dups(
        spark, SF_DIR, expand=max(1, EXPAND // 8), concat=CONCAT
    )
    warm_pages = warm_pages.repartition(64, "url").localCheckpoint(eager=True)
    dedup(spark, warm_pages, cfg).write.format("noop").mode("overwrite").save()

    pages, _ = synth_pages_with_dups(spark, SF_DIR, expand=EXPAND, concat=CONCAT)
    pages = pages.repartition(96, "url").localCheckpoint(eager=True)
    n_docs = pages.count()

    marker = time.time() * 1000  # events after this = the timed window
    t0 = time.time()
    out = dedup(spark, pages, cfg)
    out.write.format("noop").mode("overwrite").save()
    sec = time.time() - t0
    print(json.dumps({"cpus": CPUS, "seconds": round(sec, 3), "n_docs": n_docs}))
    spark.stop()
    parse(marker)


def parse(marker_ms: float) -> None:
    # Spark 4 rolling event log: a DIRECTORY per app containing
    # events_*.zstd parts (+ appstatus marker)
    files = [
        p
        for p in glob.glob(f"{LOGDIR}/*") + glob.glob(f"{LOGDIR}/*/events_*")
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    assert files, "no event log"
    stages = []

    def lines():
        for path in sorted(files):
            if path.endswith(".zstd"):
                import subprocess

                out = subprocess.run(
                    ["zstd", "-dc", path], capture_output=True, text=True
                )
                if out.returncode != 0:  # no zstd binary: try python lib
                    import zstandard

                    with open(path, "rb") as fh:
                        yield from (
                            zstandard.ZstdDecompressor()
                            .stream_reader(fh)
                            .read()
                            .decode()
                            .splitlines()
                        )
                    continue
                yield from out.stdout.splitlines()
            else:
                op = gzip.open if path.endswith(".gz") else open
                with op(path, "rt") as fh:
                    yield from fh

    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if not sub or sub < marker_ms:
                    continue
                stages.append(
                    {
                        "stage": si["Stage ID"],
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "sub": sub,
                        "comp": comp,
                        "dur_s": round((comp - sub) / 1000, 2),
                        "tasks": si["Number of Tasks"],
                    }
                )
    stages.sort(key=lambda s: s["sub"])
    total_busy = 0.0
    prev_end = None
    print(f"\n{len(stages)} stages in timed window")
    print(f"{'stage':>5} {'gap_s':>6} {'dur_s':>6} {'tasks':>5}  name")
    for s in stages:
        gap = 0.0 if prev_end is None else max(0.0, (s["sub"] - prev_end) / 1000)
        prev_end = max(prev_end or 0, s["comp"])
        total_busy += s["dur_s"]
        print(f"{s['stage']:>5} {gap:>6.2f} {s['dur_s']:>6.2f} {s['tasks']:>5}  {s['name']}")
    span = (stages[-1]["comp"] - stages[0]["sub"]) / 1000 if stages else 0
    print(
        f"\nwall span {span:.1f}s; sum(stage dur) {total_busy:.1f}s; "
        f"gaps {span - total_busy:.1f}s (driver/AQE/scheduling, minus overlap)"
    )


if __name__ == "__main__":
    sys.argv
    run()
