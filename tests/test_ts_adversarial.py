"""Timestamp-adversarial parity: the driver fixtures' event times span
a tame contemporary window, so divergences at epoch boundaries never
flip a driver hash — but real logs carry corrupt and extreme stamps.
This mirror injects pre-1970 instants, the exact epoch, a 1900 stamp,
a far-future (2200) stamp, and a same-second duplicate pair, then
replays every hash-oracled events-reading query cell-by-cell vs DuckDB
(the nulls/unicode mirror pattern).

First run caught two real defects: events_moving_regression overflowed
ANSI int32 on x*x once the day index spanned 1900->2200, and
events_survival_km's product-limit ln(1 - d/n) hit ln(0) when a time
point's whole at-risk cohort churned (raises in DuckDB, NULLs in
Spark; the estimator is defined — S sticks at 0).
"""

from __future__ import annotations

import inspect
import re

import duckdb
import pytest

from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                        _load_all_modules)

import importlib.util as _ilu
import os as _os

_spec = _ilu.spec_from_file_location(
    "oracle_parity_helpers_ts",
    _os.path.join(_os.path.dirname(__file__), "test_oracle_parity.py"))
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
canon = _mod.canon

_load_all_modules()

_EXTREME_EVENTS = """
  UNION ALL SELECT 910001, TIMESTAMP '1969-12-31 23:59:59.123456', 91001, 'view', 1.5, NULL
  UNION ALL SELECT 910002, TIMESTAMP '1970-01-01 00:00:00',        91001, 'click', 2.5, NULL
  UNION ALL SELECT 910003, TIMESTAMP '1900-01-01 00:00:00.000001', 91002, 'purchase', 3.5, NULL
  UNION ALL SELECT 910004, TIMESTAMP '2200-12-31 23:59:59.999999', 91003, 'view', 4.5, NULL
  UNION ALL SELECT 910005, TIMESTAMP '2025-03-09 02:30:00',        91004, 'click', 5.5, NULL
  UNION ALL SELECT 910006, TIMESTAMP '2025-03-09 02:30:00',        91004, 'click', 5.5, NULL
"""


@pytest.fixture(scope="module")
def ts_sf_dir(tmp_path_factory, sf_dir):
    dst = tmp_path_factory.mktemp("sf_ts")
    con = duckdb.connect()
    con.sql(f"""COPY (
      SELECT * FROM read_parquet('{sf_dir}/events.parquet')
      {_EXTREME_EVENTS}
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        con.sql(f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(dst)


@pytest.fixture(scope="module")
def ts_duck(ts_sf_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{ts_sf_dir}/{t}.parquet')")
    yield con
    con.close()


# every hash-oracled query whose plan reads the events table, found by
# source scan so new registrations join automatically
TS_FAMILY = sorted(
    n for n in REGISTRY
    if REGISTRY[n].oracle is not None
    and re.search(r'["\']events["\']', inspect.getsource(REGISTRY[n].fn))
    # a 2200-era stamp legitimately advances the watermark past every
    # other row — late-drop is the CORRECT streaming semantics and the
    # batch oracle (which admits all rows) is certifying the tame-
    # fixture contract, not this storm; same class as arrival-order
    # sensitivity, documented in SURVEY §5
    and n != "stream_watermark_late")


@pytest.mark.parametrize("name", TS_FAMILY)
def test_events_query_parity_on_extreme_timestamps(driver_spark, ts_sf_dir,
                                                   ts_duck, name):
    spec = REGISTRY[name]
    got = canon(spec.fn(driver_spark, ts_sf_dir).toPandas())
    want = canon(ts_duck.execute(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    if not got.equals(want):
        import pandas as pd
        diff = (got != want).any(axis=1)
        sample = pd.concat([got[diff].head(4).assign(side="spark"),
                            want[diff].head(4).assign(side="oracle")])
        raise AssertionError(f"{name}: extreme-ts divergence\n{sample.to_string()}")
