from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# default to sf0.01 — the exact scale the driver hash-compares at, so CI
# catches scale-dependent issues (e.g. rounding ties that only occur on
# rows absent from sf0.001); override with SPARK_GRAFT_TEST_SF_DIR
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


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
