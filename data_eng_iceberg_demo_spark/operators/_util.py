"""Shared helpers for declared queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load(spark, sf_dir, name)


# Declared-output policy (SURVEY.md §5.3): timestamps leave the plan as
# strings via CAST (identical text form in Spark and DuckDB for the
# ms-precision fixture columns); events.ts is ns in parquet and µs in Spark,
# so it is always date_trunc'd to seconds first.
TS_AS_STRING = "CAST({c} AS STRING)"
