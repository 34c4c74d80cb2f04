"""Scratch-dir hygiene: every sink/stream staging path nests under one
per-process root that is removed at interpreter exit — repeated bench /
driver runs must not accumulate /tmp litter (round-2 verdict item 5)."""

from __future__ import annotations

import os
import subprocess
import sys


def test_scratch_dirs_nest_under_one_root():
    from data_eng_iceberg_demo_spark.scratch import scratch_dir, scratch_root

    a, b = scratch_dir("x_"), scratch_dir("y_")
    root = scratch_root()
    assert os.path.dirname(a) == root
    assert os.path.dirname(b) == root
    assert os.path.isdir(a) and os.path.isdir(b)


def test_scratch_root_removed_at_exit():
    code = ("from data_eng_iceberg_demo_spark.scratch import scratch_dir, "
            "scratch_root; scratch_dir('probe_'); print(scratch_root())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    import tempfile

    root = out.stdout.strip().splitlines()[-1]
    assert root.startswith(tempfile.gettempdir()), root
    assert not os.path.exists(root), f"{root} survived interpreter exit"
