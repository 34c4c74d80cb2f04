"""Differential test: every declared query vs its DuckDB oracle — a strict
local replica of the driver's t2 check (row count + column names + sorted
value comparison).  Runs at sf0.001 by default for speed; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the driver-scale run.

The comparison is STRICTER than a hash: values are canonicalized (floats
via repr of float64, timestamps to ISO strings) and compared cell by cell
after sorting rows by all columns — so a mismatch shows the offending rows
instead of just a hash difference.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                        _load_all_modules)

_load_all_modules()

HASHED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize a result frame: column order by name, every cell to a
    comparable primitive, rows sorted."""
    out = {}
    for c in sorted(df.columns):
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").map(
                lambda x: "NaN" if (x is None or (isinstance(x, float) and math.isnan(x)))
                else repr(round(x, 9)))
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64").astype("object").map(
                lambda x: "NULL" if pd.isna(x) else str(int(x)))
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.map(lambda x: "NULL" if pd.isna(x) else str(bool(x)))
        else:
            out[c] = s.map(
                lambda x: "NULL" if x is None or (isinstance(x, float) and math.isnan(x))
                else (repr(round(float(x), 9)) if isinstance(x, float) else str(x)))
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", HASHED)
def test_hash_query_matches_oracle(name, driver_spark, duck, sf_dir):
    spec = REGISTRY[name]
    got = canon(spec.fn(driver_spark, sf_dir).toPandas())
    want = canon(duck.execute(spec.oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    if not got.equals(want):
        diff_mask = (got != want).any(axis=1)
        sample = pd.concat(
            [got[diff_mask].head(5).assign(side="spark"),
             want[diff_mask].head(5).assign(side="oracle")])
        raise AssertionError(f"{name}: value mismatch\n{sample.to_string()}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, driver_spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(driver_spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0
