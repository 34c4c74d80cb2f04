"""Round-14 hardening pins: the advisor findings' regression guards that
don't belong to an existing suite."""

from __future__ import annotations

import os

import pytest


def test_link_events_refuses_empty_directory_source(tmp_path):
    """r14 (advisor): a directory-shaped events.parquet with NO top-level
    *.parquet members (Hive-partitioned layout, .snappy suffixes) must
    raise instead of silently linking nothing — an empty stream source
    makes every downstream streaming query vacuously green."""
    from data_eng_iceberg_demo_spark.streaming.harness import _link_events

    d = tmp_path / "sf"
    sub = d / "events.parquet" / "day=2024-01-01"
    sub.mkdir(parents=True)
    (sub / "part-000.parquet").write_bytes(b"")
    dst = tmp_path / "dst"
    dst.mkdir()
    with pytest.raises(FileNotFoundError, match="no top-level"):
        _link_events(str(d), str(dst))
    assert os.listdir(dst) == []


def test_link_events_links_flat_directory_members(tmp_path):
    from data_eng_iceberg_demo_spark.streaming.harness import _link_events

    d = tmp_path / "sf"
    (d / "events.parquet").mkdir(parents=True)
    for i in range(3):
        (d / "events.parquet" / f"part-{i}.parquet").write_bytes(b"x")
    dst = tmp_path / "dst"
    dst.mkdir()
    _link_events(str(d), str(dst))
    assert len(os.listdir(dst)) == 3


def test_parity_canon_distinguishes_nan_from_null():
    """r14 (advisor): with Arrow-fetched masked frames, a query returning
    NaN where the oracle returns NULL must FAIL parity — the old
    integral-float branch rendered both as 'NULL'."""
    import pandas as pd
    import pyarrow as pa

    import tests.test_oracle_parity as op

    masked = pa.table({"x": pa.array([37.0, None, float("nan")])}) \
        .to_pandas(types_mapper=op._mapper)
    got = op.canon(masked)
    assert list(got["x"].sort_values()) == ["37", "NULL", "NaN"] or \
        sorted(got["x"]) == sorted(["37", "NULL", "NaN"])

    # legacy plain-numpy input keeps the historical conflation (the
    # sibling adversarial suites' documented exclusions depend on it)
    legacy = pd.DataFrame({"x": [37.0, float("nan")]})
    got2 = op.canon(legacy)
    assert set(got2["x"]) == {"37", "NULL"}


def _process_committer(args):
    """Worker for the cross-PROCESS commit race: M empty append commits
    with retry-on-conflict against a shared table dir.  Runs without any
    SparkSession — the icelite commit protocol is pure metadata, which
    is exactly what makes a process-level race testable and cheap."""
    tdir, worker, n_commits = args
    import sys
    import time as _t
    sys.path.insert(0, "/root/repo")
    from data_eng_iceberg_demo_spark.tables.icelite import (CommitConflict,
                                                            IceliteTable)
    t = IceliteTable(None, tdir)
    conflicts = 0
    for i in range(n_commits):
        for attempt in range(200):
            meta = t.meta
            try:
                t._commit_snapshot(meta, "append", [])
                break
            except CommitConflict:
                conflicts += 1
                _t.sleep(0.01 * (attempt % 3))
        else:
            return (worker, conflicts, f"starved at commit {i}")
    return (worker, conflicts, None)


def test_commit_race_across_processes(tmp_path):
    """r14: the two-thread race test shares one GIL and one page cache —
    this races 6 PROCESSES x 4 commits on one table dir, the honest test
    of the O_CREAT|O_EXCL marker arbitration and the atomic pointer
    swap.  Every commit must publish exactly once: contiguous ids,
    linear parent chain, zero lost updates."""
    import os
    from concurrent.futures import ProcessPoolExecutor

    from data_eng_iceberg_demo_spark.tables.icelite import (_write_meta,
                                                            IceliteTable)

    tdir = str(tmp_path / "racetab")
    os.makedirs(tdir)
    _write_meta(tdir, {
        "schema_versions": [{"version": 1, "fields": []}],
        "current_schema": 1, "current_snapshot": None,
        "snapshots": [], "refs": {}, "partition_spec": []})

    n_proc, n_commits = 6, 4
    with ProcessPoolExecutor(n_proc) as ex:
        results = list(ex.map(_process_committer,
                              [(tdir, w, n_commits) for w in range(n_proc)]))
    assert all(err is None for _w, _c, err in results), results

    meta = IceliteTable(None, tdir).meta
    snaps = sorted(meta["snapshots"], key=lambda s: s["id"])
    assert len(snaps) == n_proc * n_commits
    assert [s["id"] for s in snaps] == list(range(1, len(snaps) + 1))
    for prev, cur in zip(snaps, snaps[1:]):
        assert cur["parent"] == prev["id"]
    assert meta["current_snapshot"] == snaps[-1]["id"]

    # process spawn stagger can serialize the whole pool on a loaded
    # host — the exactly-once contract above still verified; only the
    # contention claim is then unproven (r14 review: don't hard-assert
    # a timing outcome)
    total_conflicts = sum(c for _w, c, _e in results)
    if total_conflicts == 0:
        pytest.skip("processes never contended — exactly-once checks "
                    "all ran")
