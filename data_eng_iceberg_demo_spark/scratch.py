"""Per-process scratch directory management for sinks, icelite warehouses
and streaming file sources.

Every query that needs a local staging path used to ``mkdtemp`` straight
under /tmp and never clean up, so repeated bench/driver runs accumulated
unbounded ``events_src_*`` / ``sink_*`` litter.  All scratch now nests
under ONE per-process root that is removed at interpreter exit.

Scale note: on a real cluster these paths would be per-executor local
dirs (spark.local.dir) or object-store staging prefixes with a TTL; the
single-root + atexit pattern is the local[*] analogue.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _stop_spark_then_rmtree(root: str) -> None:
    """Exit handler: the root doubles as spark.local.dir/java.io.tmpdir
    for sessions the factory builds, so deleting it under a LIVE JVM
    (e.g. a pytest session fixture that never calls spark.stop()) could
    yank shuffle/spill dirs out from under late lazy evaluation.  Stop
    any live session first, then remove."""
    try:
        from pyspark.sql import SparkSession
        live = (SparkSession.getActiveSession()
                or getattr(SparkSession, "_instantiatedSession", None))
        if live is not None:
            live.stop()
    except Exception:
        pass  # no pyspark / JVM already gone: removal alone is safe
    shutil.rmtree(root, ignore_errors=True)


def scratch_root() -> str:
    """Lazily create the per-process scratch root (removed at exit)."""
    global _ROOT
    if _ROOT is None or not os.path.isdir(_ROOT):
        _ROOT = tempfile.mkdtemp(prefix="sparkdemo_scratch_")
        atexit.register(_stop_spark_then_rmtree, _ROOT)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the per-process root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
