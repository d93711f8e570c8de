"""Packaged-resource accessors.

Reference analog: ``lasvdedup/utils/resources.py`` (/root/reference/
lasvdedup/utils/resources.py:1-14), which resolves the packaged
``config.yaml`` / Snakefile / data dir via ``importlib.resources``. Here the
only packaged resource is the default config YAML (there is no Snakefile —
the Spark engine's DAG is the query plan), but the resolution contract is
the same, including working when the package is imported FROM THE
--py-files ZIP on an executor or a fresh driver: ``importlib.resources``
reads through zipimport, and ``as_file`` materializes a real path when a
caller needs one (``DedupConfig.from_yaml`` opens by path).
"""

from __future__ import annotations

import atexit
import contextlib
import functools
import importlib.resources

_exit_stack: contextlib.ExitStack | None = None


def get_default_config_text() -> str:
    """The packaged default config YAML, as text (zip-safe, no temp file)."""
    return (
        importlib.resources.files("lasvdedup_spark")
        .joinpath("default_config.yaml")
        .read_text()
    )


@functools.lru_cache(maxsize=1)
def get_default_config_path() -> str:
    """Filesystem path to the packaged default config YAML.

    On a normal directory install this is the file inside the package; when
    the package is imported from a --py-files zip, the resource is
    extracted to a temp file that lives until interpreter exit (the same
    lifetime contract importlib.resources documents for as_file).
    Memoized (r5 advice): each call used to enter a fresh as_file context
    on the shared ExitStack — from a zip that extracted a new temp file per
    call, accumulating until interpreter exit, and the lazy stack init was
    a minor thread race; at most one extraction now happens per process.
    """
    global _exit_stack
    res = importlib.resources.files("lasvdedup_spark").joinpath(
        "default_config.yaml"
    )
    if _exit_stack is None:
        _exit_stack = contextlib.ExitStack()
        atexit.register(_exit_stack.close)
    return str(_exit_stack.enter_context(importlib.resources.as_file(res)))
