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
