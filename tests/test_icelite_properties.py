"""Property-based tests for the icelite schema-evolution chain
(SURVEY.md §7.4 hard part #1: rename-safe field-id resolution must
survive arbitrary add/rename/drop sequences, including reusing an old
name for a new field), plus rollback semantics.

hypothesis drives random operation sequences; the invariant oracle is a
pure-Python model of the expected visible schema and per-column values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

from data_eng_iceberg_demo_spark.tables.icelite import IceliteCatalog

BASE_SCHEMA = StructType([
    StructField("k", IntegerType()),
    StructField("a", StringType()),
])

NAMES = ["a", "b", "c", "d"]

# an op is ("add", name) | ("rename", old, new) | ("drop", name)
ops_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.sampled_from(NAMES)),
        st.tuples(st.just("rename"), st.sampled_from(NAMES),
                  st.sampled_from(NAMES)),
        st.tuples(st.just("drop"), st.sampled_from(NAMES)),
    ),
    min_size=1, max_size=6,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=ops_strategy)
def test_evolution_chain_matches_model(spark, tmp_path_factory, ops):
    """Apply a random add/rename/drop sequence to both the real table and
    a dict model; the table's visible columns and the values of the
    original physical column must always match the model."""
    tmp = tmp_path_factory.mktemp("evo")
    cat = IceliteCatalog(spark, str(tmp))
    t = cat.create_table("db.t", BASE_SCHEMA)
    t.insert(spark.createDataFrame([(1, "x"), (2, "y")], BASE_SCHEMA))

    # model: visible column name -> "orig_a" (data-bearing) or None (added)
    model: dict[str, str | None] = {"k": "orig_k", "a": "orig_a"}

    for op in ops:
        if op[0] == "add":
            name = op[1]
            if name in model:
                with pytest.raises(ValueError):
                    t.add_column(name, "string")
            else:
                t.add_column(name, "string")
                model[name] = None
        elif op[0] == "rename":
            _, old, new = op
            if old not in model or (new in model and new != old):
                with pytest.raises(ValueError):
                    t.rename_column(old, new)
            elif new == old:
                with pytest.raises(ValueError):
                    t.rename_column(old, new)
            else:
                t.rename_column(old, new)
                # rename keeps the column's position in the schema
                model = {(new if k == old else k): v
                         for k, v in model.items()}
        else:  # drop
            name = op[1]
            if name not in model or name == "k":
                if name not in model:
                    with pytest.raises(ValueError):
                        t.drop_column(name)
                    continue
            t.drop_column(name)
            model.pop(name)

        df = t.read()
        assert df.columns == list(model)  # order = schema-version order
        rows = {r["k"] if "k" in model else None: r for r in df.collect()}
        for col, origin in model.items():
            if origin == "orig_a":
                got = sorted(r[col] for r in rows.values())
                assert got == ["x", "y"], f"col {col} lost its data"
            elif origin is None:
                assert all(r[col] is None for r in rows.values()), \
                    f"added col {col} must read NULL for old rows"


def test_rename_rejects_duplicate_and_missing(spark, tmp_path):
    cat = IceliteCatalog(spark, str(tmp_path))
    t = cat.create_table("db.t", BASE_SCHEMA)
    with pytest.raises(ValueError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError):
        t.rename_column("a", "k")  # collides with existing


def test_rollback_restores_old_contents_and_keeps_history(spark, tmp_path):
    cat = IceliteCatalog(spark, str(tmp_path))
    t = cat.create_table("db.t", BASE_SCHEMA)
    t.insert(spark.createDataFrame([(1, "x"), (2, "y")], BASE_SCHEMA))
    t.delete_where("k = 1")
    assert t.read().count() == 1
    t.rollback_to_snapshot(1)
    got = sorted((r["k"], r["a"]) for r in t.read().collect())
    assert got == [(1, "x"), (2, "y")]  # pre-delete contents restored
    ops = [r["operation"] for r in t.history().collect()]
    assert ops.count("rollback") == 1 and "delete" in ops
    # the rolled-past delete snapshot is still time-travelable
    assert t.read(version=2).count() == 1
    with pytest.raises(ValueError):
        t.rollback_to_snapshot(99)


# --------------------------------------------------------- z-order pruning
@pytest.fixture(scope="module")
def zorder_table(spark, tmp_path_factory):
    """One z-ordered table shared by the property runs (build once)."""
    from pyspark.sql.types import LongType

    base = tmp_path_factory.mktemp("zprop")
    cat = IceliteCatalog(spark, str(base))
    t = cat.create_table("db.z", StructType([
        StructField("rid", LongType()), StructField("a", LongType()),
        StructField("b", LongType())]))
    df = (spark.range(2048).select(
        F.col("id").alias("rid"),
        F.pmod(F.hash(F.col("id")), F.lit(1000)).alias("a"),
        F.pmod(F.hash(F.col("id") + 7), F.lit(1000)).alias("b")))
    t.insert(df.repartition(8))
    t.rewrite_data_files(target_files=8, zorder_by=["a", "b"])
    full = {r["rid"]: (r["a"], r["b"]) for r in t.read().collect()}
    return t, full


@given(col=st.sampled_from(["a", "b"]),
       lo=st.integers(min_value=-50, max_value=1000),
       width=st.integers(min_value=0, max_value=400))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_scan_range_equals_full_filter(zorder_table, col, lo, width):
    """For ANY range on EITHER z-order column, the stats-pruned scan must
    return exactly the rows a full-scan filter returns (skipping is an
    optimization, never a semantics change) — including empty and
    out-of-domain ranges."""
    t, full = zorder_table
    hi = lo + width
    idx = 0 if col == "a" else 1
    want = sorted(r for r, v in full.items() if lo <= v[idx] <= hi)
    got = sorted(r["rid"] for r in t.scan_range(col, lo=lo, hi=hi).collect())
    assert got == want
