"""--py-files archive builder: the cluster launch shape of the north rule.

spark-submit takes an application FILE plus dependency archives; the
standard way to ship a pure-Python package to every executor is

    spark-submit --py-files lasvdedup_spark.zip scripts/run_dedup.py ...

This module builds that zip. The archive is BYTE-DETERMINISTIC for a given
source tree (sorted walk, fixed timestamps, no host paths): two builds of
the same commit are identical, so cluster-side caches keyed on the archive
checksum (YARN local-resource cache, Spark's fileserver) hit across
submissions instead of re-distributing ~100 KB to 1000 executors per run.

Reference analog: the pip/conda packaging that makes ``lasvdedup`` runnable
as an installed console script (/root/reference/pyproject.toml); here the
deliverable is the spark-submit artifact instead of a wheel.

Usage:  python -m lasvdedup_spark.packaging --out lasvdedup_spark.zip
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

# fixed DOS timestamp (zip epoch) -> byte-identical rebuilds
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_pyfiles_zip(out_path: str, package_root: str | None = None) -> str:
    """Zip the ``lasvdedup_spark`` package (``.py`` sources plus packaged
    ``.yaml`` resources, package-relative arcnames) into ``out_path``;
    returns ``out_path``.

    package_root: directory CONTAINING ``lasvdedup_spark/`` (defaults to
    this installation's parent, so the built archive matches the imported
    code).
    """
    if package_root is None:
        package_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(package_root, "lasvdedup_spark")
    if not os.path.isfile(os.path.join(pkg, "__init__.py")):
        raise ValueError(f"no lasvdedup_spark package under {package_root!r}")

    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".py", ".yaml")):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, package_root), full))

    with zipfile.ZipFile(out_path, "w") as z:
        for arcname, full in sorted(entries):
            info = zipfile.ZipInfo(arcname.replace(os.sep, "/"), _EPOCH)
            # STORED, not DEFLATED: deflate output is only stable per zlib
            # build — a toolchain change would shift every byte and miss
            # archive-checksum caches. The package is ~100 KB; compression
            # buys nothing worth the determinism caveat.
            info.compress_type = zipfile.ZIP_STORED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                z.writestr(info, f.read())
    return out_path


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m lasvdedup_spark.packaging",
        description="build the spark-submit --py-files archive",
    )
    p.add_argument("--out", default="lasvdedup_spark.zip", help="output zip path")
    args = p.parse_args(argv)
    path = build_pyfiles_zip(args.out)
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
