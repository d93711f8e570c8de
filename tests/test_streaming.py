"""Incremental dedup over Structured Streaming (streaming/incremental.py):
pages arrive as file-source micro-batches; each batch is LSH-joined against
the persisted band index of everything seen before, so cross-batch
duplicates are found without recomputing old signatures."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from lasvdedup_spark.config import DedupConfig
from lasvdedup_spark.streaming.incremental import (
    N_INDEX_PARTS,
    incremental_dedup_query,
    read_index_pruned,
    read_pairs,
    sig_bands,
)

TS = datetime.datetime(2024, 1, 1)


def _page(url, text):
    return (url, TS, b"<p>x</p>", text, "en")


TEXT_A = "the quick brown fox jumps over the lazy dog again and again every day"
TEXT_B = "completely different content about spark structured streaming micro batches"
TEXT_C = "unrelated third document mentioning nothing shared with any other page"


def _write_batch(spark, input_dir, name, rows):
    """One parquet FILE per batch directly in input_dir (the file stream
    source lists flat files, not nested directories)."""
    import glob
    import shutil
    import tempfile

    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    stage = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "out"))
    part = glob.glob(os.path.join(stage, "out", "part-*.parquet"))[0]
    os.makedirs(input_dir, exist_ok=True)
    shutil.move(part, os.path.join(input_dir, f"{name}.parquet"))
    shutil.rmtree(stage)


def test_incremental_dedup_finds_cross_batch_pairs(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    work_dir = str(tmp_path / "work")
    cfg = DedupConfig()

    # batch 1: A and an unrelated doc; batch 2: exact copy of A + near copy
    _write_batch(spark, input_dir, "b1", [_page("u/a1", TEXT_A), _page("u/b1", TEXT_B)])
    _write_batch(
        spark, input_dir, "b2",
        [_page("u/a2", TEXT_A), _page("u/a3", TEXT_A + " extra"), _page("u/c1", TEXT_C)],
    )

    q = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q.awaitTermination(120)

    pairs = {(r["id_a"], r["id_b"]) for r in read_pairs(spark, work_dir).collect()}
    # cross-batch: a1 (batch1) vs a2/a3 (batch2); within-batch: a2 vs a3
    assert ("u/a1", "u/a2") in pairs
    assert ("u/a1", "u/a3") in pairs
    assert ("u/a2", "u/a3") in pairs
    # non-duplicates never pair
    assert not any("u/b1" in p or "u/c1" in p for p in pairs)

    # restart with a third batch: only the new file is processed (checkpoint),
    # and its duplicate against batch-1 content is still found via the index
    _write_batch(spark, input_dir, "b3", [_page("u/a4", TEXT_A)])
    q2 = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q2.awaitTermination(120)
    pairs2 = {(r["id_a"], r["id_b"]) for r in read_pairs(spark, work_dir).collect()}
    assert ("u/a1", "u/a4") in pairs2 and ("u/a2", "u/a4") in pairs2
    assert pairs <= pairs2

    # --- index layout + pruning: the per-batch join must NOT rescan the
    # whole accumulated index. The index is partitioned by
    # part = pmod(bucket, N_INDEX_PARTS); a pruned read pushes the part
    # filter into the file listing (PartitionFilters), so each batch reads
    # only the partitions its own buckets map to.
    index_dir = os.path.join(work_dir, "index")
    full = read_index_pruned(spark, index_dir, None)
    assert full is not None and "part" in full.columns
    some_part = full.select("part").first()["part"]
    pruned = read_index_pruned(spark, index_dir, [int(some_part)])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part#" in plan.split("PartitionFilters")[1][:200]

    def files_read(df) -> int:
        df.collect()
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            m = leaves.apply(i).metrics()
            if m.contains("numFiles"):
                total += m.apply("numFiles").value()
        return total

    # pruned scan must physically touch strictly fewer files than the full
    # index (every batch wrote several part directories)
    assert files_read(pruned) < files_read(full)
    # probe-through-Spark: a missing index is None, not a crash and not a
    # silently-empty join (os.listdir would lie on non-local filesystems)
    assert read_index_pruned(spark, str(tmp_path / "nope"), None) is None


def test_sig_bands_is_streaming_composable(spark, tmp_path):
    """The signature/band expressions must stay pure projections — assert
    they compose onto readStream without an analysis error."""
    input_dir = str(tmp_path / "in")
    _write_batch(spark, input_dir, "b1", [_page("u/x", TEXT_A)])
    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .parquet(input_dir)
        .select("url", "text")
    )
    bands = sig_bands(stream, DedupConfig())
    assert bands.isStreaming
    assert set(bands.columns) == {"id", "sig", "bucket"}


def test_compact_index_preserves_pairs_and_shrinks_listing(spark, tmp_path):
    """compact_index rewrites batch_id=N/part=P epoch trees into one
    batch_id=-1 tree: same pairs before/after (including for NEW batches
    joining against the compacted index), fewer directories listed."""
    from lasvdedup_spark.streaming.incremental import compact_index

    input_dir = str(tmp_path / "in")
    work_dir = str(tmp_path / "work")
    cfg = DedupConfig()
    _write_batch(spark, input_dir, "b1", [_page("u/a1", TEXT_A), _page("u/b1", TEXT_B)])
    _write_batch(spark, input_dir, "b2", [_page("u/a2", TEXT_A)])
    _write_batch(spark, input_dir, "b3", [_page("u/c1", TEXT_C)])
    q = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q.awaitTermination(120)
    index_dir = os.path.join(work_dir, "index")
    before_dirs = [d for d in os.listdir(index_dir) if d.startswith("batch_id=")]
    assert len(before_dirs) == 3
    idx_before = read_index_pruned(spark, index_dir, None)
    rows_before = {(r["id"], r["bucket"]) for r in idx_before.select("id", "bucket").collect()}

    res = compact_index(spark, work_dir)
    assert res["batches_compacted"] == 3 and res["rows"] == len(rows_before)
    after_dirs = [d for d in os.listdir(index_dir) if d.startswith("batch_id=")]
    assert after_dirs == ["batch_id=-1"]
    idx_after = read_index_pruned(spark, index_dir, None)
    rows_after = {(r["id"], r["bucket"]) for r in idx_after.select("id", "bucket").collect()}
    assert rows_after == rows_before

    # idempotent: second compaction is a no-op
    assert compact_index(spark, work_dir)["batches_compacted"] == 0

    # a NEW batch still finds cross-batch duplicates against the compacted index
    _write_batch(spark, input_dir, "b4", [_page("u/a3", TEXT_A)])
    q2 = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q2.awaitTermination(120)
    pairs = {(r["id_a"], r["id_b"]) for r in read_pairs(spark, work_dir).collect()}
    assert ("u/a1", "u/a3") in pairs and ("u/a2", "u/a3") in pairs


def test_compact_index_on_file_uri_workdir(spark, tmp_path):
    """Compaction's listdir/rename/delete go through the Hadoop FileSystem
    API (fsio): a work_dir addressed by file: URI — the form any non-local
    scheme (hdfs:, s3a:) arrives in — compacts correctly; the old
    os.listdir/shutil path saw nothing behind a scheme."""
    from lasvdedup_spark.streaming.incremental import compact_index

    input_dir = str(tmp_path / "in")
    work_dir = f"file://{tmp_path}/work"
    cfg = DedupConfig()
    _write_batch(spark, input_dir, "b1", [_page("u/a1", TEXT_A)])
    _write_batch(spark, input_dir, "b2", [_page("u/a2", TEXT_A)])
    q = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q.awaitTermination(120)
    res = compact_index(spark, work_dir)
    assert res["batches_compacted"] == 2 and res["rows"] > 0
    local_index = str(tmp_path / "work" / "index")
    assert [d for d in os.listdir(local_index) if d.startswith("batch_id=")] == [
        "batch_id=-1"
    ]
    pairs = {(r["id_a"], r["id_b"]) for r in read_pairs(spark, work_dir).collect()}
    assert ("u/a1", "u/a2") in pairs


def test_read_index_pruned_legacy_layout_no_crash(spark, tmp_path):
    """An index directory written WITHOUT the part column (pre-partitioned
    layout) must full-scan instead of raising AnalysisException on the
    pruned read path."""
    legacy = str(tmp_path / "legacy_index")
    df = spark.createDataFrame(
        [("u/x", [1, 2], 7), ("u/y", [3, 4], 9)], "id string, sig array<int>, bucket long"
    )
    df.write.mode("overwrite").parquet(os.path.join(legacy, "batch_id=0"))
    idx = read_index_pruned(spark, legacy, [7 % N_INDEX_PARTS])
    assert idx is not None
    assert idx.count() == 2  # unpruned full scan, not a crash


def test_stream_resume_over_legacy_index_stays_consistent(spark, tmp_path):
    """Resuming a stream over a legacy (un-partitioned) index must not
    crash on the SECOND batch: a partitioned epoch written next to legacy
    epochs gives parquet two leaf depths and partition discovery rejects
    the tree. New epochs therefore stay un-partitioned until
    compact_index migrates the whole index; after compaction new epochs
    are partitioned again."""
    from lasvdedup_spark.streaming.incremental import compact_index

    input_dir = str(tmp_path / "in")
    work_dir = str(tmp_path / "work")
    index_dir = os.path.join(work_dir, "index")
    cfg = DedupConfig()

    # 1) build a real index, then strip it to the legacy layout:
    # un-partitioned batch dirs, no part column
    _write_batch(spark, input_dir, "b1", [_page("u/a1", TEXT_A), _page("u/b1", TEXT_B)])
    q = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q.awaitTermination(120)
    import shutil

    legacy_rows = read_index_pruned(spark, index_dir, None).select(
        "id", "sig", "bucket"
    )
    stage = str(tmp_path / "legacy_stage")
    legacy_rows.write.mode("overwrite").parquet(stage)
    shutil.rmtree(index_dir)
    os.makedirs(index_dir)
    shutil.move(stage, os.path.join(index_dir, "batch_id=0"))

    # 2) resume: TWO more batches over the legacy index — batch 3 reads an
    # index containing batch 2's epoch, the mixed-depth crash case
    _write_batch(spark, input_dir, "b2", [_page("u/a2", TEXT_A)])
    _write_batch(spark, input_dir, "b3", [_page("u/a3", TEXT_A)])
    q2 = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q2.awaitTermination(120)

    pairs = {(r["id_a"], r["id_b"]) for r in read_pairs(spark, work_dir).collect()}
    assert ("u/a1", "u/a2") in pairs      # vs legacy index content
    assert ("u/a1", "u/a3") in pairs and ("u/a2", "u/a3") in pairs
    # the new epochs joined the legacy layout (no part dirs anywhere)
    idx = read_index_pruned(spark, index_dir, None)
    assert "part" not in idx.columns

    # 3) compaction migrates to the partitioned layout; the next epoch is
    # partitioned and cross-batch pairs still arrive
    assert compact_index(spark, work_dir)["batches_compacted"] == 3
    _write_batch(spark, input_dir, "b4", [_page("u/a4", TEXT_A)])
    q3 = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q3.awaitTermination(120)
    idx2 = read_index_pruned(spark, index_dir, None)
    assert "part" in idx2.columns
    pairs2 = {(r["id_a"], r["id_b"]) for r in read_pairs(spark, work_dir).collect()}
    assert ("u/a1", "u/a4") in pairs2 and ("u/a3", "u/a4") in pairs2


def test_compact_index_crash_remnant_converges(spark, tmp_path):
    """compact_index's crash contract: the compacted tree is renamed INTO
    the index BEFORE the source epochs are deleted, so a crash in between
    leaves duplicates (never a loss). A re-run over that remnant state
    folds everything into one tree with the original row set."""
    from lasvdedup_spark.streaming.incremental import compact_index

    input_dir = str(tmp_path / "in")
    work_dir = str(tmp_path / "work")
    index_dir = os.path.join(work_dir, "index")
    cfg = DedupConfig()
    _write_batch(spark, input_dir, "b1", [_page("u/a1", TEXT_A), _page("u/b1", TEXT_B)])
    _write_batch(spark, input_dir, "b2", [_page("u/a2", TEXT_A)])
    q = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q.awaitTermination(120)
    rows = {
        (r["id"], r["bucket"])
        for r in read_index_pruned(spark, index_dir, None).select("id", "bucket").collect()
    }

    # simulate the crash window: compacted tree landed (batch_id=-1), but
    # the source epoch dirs were NOT yet deleted
    import shutil

    full = read_index_pruned(spark, index_dir, None).select("id", "sig", "bucket", "part")
    tmp = str(tmp_path / "t")
    full.write.mode("overwrite").partitionBy("part").parquet(tmp)
    shutil.move(tmp, os.path.join(index_dir, "batch_id=-1"))

    # duplicated state reads fine and the re-run folds it
    dup = read_index_pruned(spark, index_dir, None)
    assert dup.count() == 2 * len(rows)
    res = compact_index(spark, work_dir)
    assert res["batches_compacted"] == 3  # 2 epochs + 1 crash remnant
    assert res["rows"] == len(rows)  # duplicates folded, not carried
    after = read_index_pruned(spark, index_dir, None)
    got = {(r["id"], r["bucket"]) for r in after.select("id", "bucket").collect()}
    assert got == rows
    dirs = [d for d in os.listdir(index_dir) if d.startswith("batch_id=")]
    assert dirs == ["batch_id=-2"]  # fresh compaction id, atomic rename target


def test_batch_pairs_plan_is_salted_union(spark):
    """Both micro-batch joins must route through the salted skew machinery
    (VERDICT r4 #1): the within-batch self-join and the new-vs-index join
    each contribute a plain+salted union — assert the salted leg (_salt)
    is in the executed plan, and that the pair set over a HOT bucket is
    exactly the brute-force expectation."""
    from lasvdedup_spark.streaming.incremental import batch_pairs

    cfg = DedupConfig(salt_buckets=4, skew_bucket_cutoff=8)
    # 30 new docs + 40 indexed docs all colliding in one boilerplate bucket,
    # with identical signatures (jaccard 1.0) so every pair verifies
    sig = [1, 2, 3, 4]
    bands = spark.createDataFrame(
        [(f"n/{i:02d}", sig, 7, 7 % N_INDEX_PARTS) for i in range(30)],
        "id string, sig array<int>, bucket long, part int",
    )
    idx = spark.createDataFrame(
        [(f"o/{i:02d}", sig, 7) for i in range(40)],
        "id string, sig array<int>, bucket long",
    )
    out = batch_pairs(bands, idx, cfg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan and "Union" in plan
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    want = {(f"n/{i:02d}", f"n/{j:02d}") for i in range(30) for j in range(i + 1, 30)}
    want |= {(f"n/{i:02d}", f"o/{j:02d}") for i in range(30) for j in range(40)}
    assert pairs == want


def test_hot_bucket_across_batches_stays_correct(spark, tmp_path):
    """End-to-end streaming with a boilerplate mega-bucket spanning batches
    and the salted path FORCED (cutoff below the bucket size): every
    cross-batch duplicate pair still lands."""
    input_dir = str(tmp_path / "in")
    work_dir = str(tmp_path / "work")
    cfg = DedupConfig(salt_buckets=4, skew_bucket_cutoff=4)

    _write_batch(
        spark, input_dir, "b1", [_page(f"u/a{i:02d}", TEXT_A) for i in range(8)]
    )
    _write_batch(
        spark, input_dir, "b2",
        [_page(f"u/b{i:02d}", TEXT_A) for i in range(6)] + [_page("u/x", TEXT_B)],
    )
    q = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q.awaitTermination(120)
    pairs = {(r["id_a"], r["id_b"]) for r in read_pairs(spark, work_dir).collect()}
    ids = [f"u/a{i:02d}" for i in range(8)] + [f"u/b{i:02d}" for i in range(6)]
    want = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:] if a < b}
    want = {(min(a, b), max(a, b)) for a, b in want}
    assert pairs == want


def test_index_append_cap_bounds_bucket_growth(spark, tmp_path):
    """With max_bucket_size set, the accumulated index's per-bucket
    membership must saturate at the cap across batches (VERDICT r4 #1:
    'apply the bucket cap to index appends'), dropped rows must be COUNTED
    into work_dir/metrics (never silent), and pairs among kept members
    still arrive."""
    input_dir = str(tmp_path / "in")
    work_dir = str(tmp_path / "work")
    cfg = DedupConfig(max_bucket_size=5)

    _write_batch(
        spark, input_dir, "b1", [_page(f"u/a{i:02d}", TEXT_A) for i in range(4)]
    )
    _write_batch(
        spark, input_dir, "b2", [_page(f"u/b{i:02d}", TEXT_A) for i in range(4)]
    )
    q = incremental_dedup_query(spark, input_dir, work_dir, cfg)
    q.awaitTermination(120)

    idx = read_index_pruned(spark, os.path.join(work_dir, "index"), None)
    max_bucket = (
        idx.groupBy("bucket").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_bucket <= 5
    metrics = spark.read.parquet(os.path.join(work_dir, "metrics"))
    tot = metrics.agg(
        F.sum("rows_in").alias("i"), F.sum("rows_dropped").alias("d")
    ).collect()[0]
    assert tot["d"] > 0 and tot["i"] > tot["d"]
    # batch-2 docs still pair against the capped index's kept members
    pairs = {(r["id_a"], r["id_b"]) for r in read_pairs(spark, work_dir).collect()}
    assert any(a.startswith("u/a") and b.startswith("u/b") for a, b in pairs)
