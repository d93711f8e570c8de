"""spark-submit --py-files launch shape (north rule): the packaged archive
plus the thin launcher must run the pipeline in a FRESH driver process that
can only import lasvdedup_spark from the zip."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_contents_and_determinism(tmp_path):
    from lasvdedup_spark.packaging import build_pyfiles_zip

    z1 = str(tmp_path / "a.zip")
    z2 = str(tmp_path / "b.zip")
    build_pyfiles_zip(z1)
    build_pyfiles_zip(z2)
    # byte-identical rebuilds -> cluster-side archive caches hit across runs
    assert open(z1, "rb").read() == open(z2, "rb").read()

    names = set(zipfile.ZipFile(z1).namelist())
    assert "lasvdedup_spark/__init__.py" in names
    assert "lasvdedup_spark/pipeline.py" in names
    assert "lasvdedup_spark/operators/minhash.py" in names
    assert "lasvdedup_spark/streaming/incremental.py" in names
    assert "lasvdedup_spark/default_config.yaml" in names
    assert not any("__pycache__" in n for n in names)
    assert all(n.endswith((".py", ".yaml")) for n in names)


def test_packaged_default_config_matches_dataclass_defaults():
    """The shipped default_config.yaml IS the dataclass defaults — the
    reference's packaged-config contract (utils/resources.py:4-6 +
    config_setup.py's packaged-default precedence floor)."""
    from lasvdedup_spark.config import DedupConfig
    from lasvdedup_spark.resources import (
        get_default_config_path,
        get_default_config_text,
    )

    path = get_default_config_path()
    assert os.path.isfile(path)
    assert DedupConfig.from_yaml(path) == DedupConfig()
    assert get_default_config_text().startswith("#")


def test_spark_submit_pyfiles_end_to_end(spark, sf_dir, tmp_path):
    """Build the zip, then spark-submit the launcher from an empty cwd with
    the repo scrubbed from PYTHONPATH — the pipeline must resolve entirely
    from --py-files, exactly as on a cluster."""
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    from lasvdedup_spark.packaging import build_pyfiles_zip
    from lasvdedup_spark.sources.pages import synth_pages_with_dups

    pages, _ = synth_pages_with_dups(spark, sf_dir)
    inp = str(tmp_path / "pages")
    outp = str(tmp_path / "out")
    pages.write.parquet(inp)
    n_pages = pages.count()

    zip_path = build_pyfiles_zip(str(tmp_path / "lasvdedup_spark.zip"))
    launcher = str(tmp_path / "run_dedup.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_dedup.py"), launcher)

    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # the zip must be the only import source
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            launcher,
            "--input", inp,
            "--output", outp,
            "--tiers", "minhash",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_classified"] == n_pages

    import pyarrow.parquet as pq

    table = pq.read_table(outp)
    assert table.num_rows == n_pages
    assert {"url", "component", "classification"} <= set(table.column_names)


def test_cli_embedding_tier_requires_embeddings():
    from lasvdedup_spark.cli import main

    with pytest.raises(SystemExit, match="embedding"):
        main(["--input", "i", "--output", "o", "--tiers", "minhash,embedding"])


def test_unknown_tier_rejected_loudly():
    """A tier typo must fail fast, not silently drop the tier's edges."""
    from lasvdedup_spark.cli import main
    from lasvdedup_spark.config import DedupConfig
    from lasvdedup_spark.pipeline import stage_plan

    with pytest.raises(ValueError, match="simhsh"):
        stage_plan(DedupConfig(), tiers=("minhash", "simhsh"))
    with pytest.raises(ValueError, match="minhsh"):
        main(["--input", "i", "--output", "o", "--tiers", "minhsh"])
