"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the engine's registry
(``data_eng_iceberg_demo_spark/plans/registry.py``); this module only
re-exports the contract maps.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_eng_iceberg_demo_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (4-table star join + agg + sort) on sf0.001."""
    return registry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 Table B."""
    return registry.query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every declared query.  As of r15 this
    covers the WHOLE registry: former rows-only names (approximate
    sketches / ANN) emit band-verdict output — deterministic exact
    columns the oracle replays plus a within-band boolean computed from
    the approximate result — so none is omitted."""
    return registry.oracle_map()
