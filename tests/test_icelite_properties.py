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


# ---------------------------------------------------------------- r13:
# lazy metadata decode (the icelite inflated sweep's finding: eager
# decode made every pointer load O(snapshots x files) — 0.263 s at
# 400 snapshots / 2000 files, quadratic in history length — so every
# commit paid it twice; lazy chain replay took the same load to 3 ms)

def _many_snapshot_table(spark, tmp_path, n_commits=6, overwrite_at=3,
                         rollback=True):
    """Small history exercising every chain shape: appends, an
    overwrite (full manifest), a row-level delete (removed paths), and
    a rollback (paths removed then re-added — the order-sensitive
    case for chain replay)."""
    cat = IceliteCatalog(spark, str(tmp_path / "lazymeta"))
    t = cat.create_table("ns.lazy", BASE_SCHEMA)
    for i in range(n_commits):
        df = spark.createDataFrame(
            [(i * 10 + j, f"v{i}") for j in range(3)], BASE_SCHEMA)
        if i == overwrite_at:
            t.insert_overwrite(df)
        else:
            t.insert(df)
    t.delete_where("k % 10 = 1")
    if rollback:
        hist = {r["snapshot_id"] for r in t.history().collect()}
        t.rollback_to_snapshot(sorted(hist)[overwrite_at])
    return cat, t


def _eager_resolution(tbl):
    """Brute-force reference decode: replay every snapshot's manifest
    chain independently, no caches — the ground truth the lazy decoder
    must reproduce exactly (same entries, same ORDER)."""
    import json as _json
    import os as _os
    with open(_os.path.join(tbl.tdir, "metadata.json")) as f:
        raw = _json.load(f)

    def body_of(name):
        with open(_os.path.join(tbl.tdir, "manifests", name)) as f:
            return _json.load(f)

    name_of = {h["id"]: h["manifest"] for h in raw["snapshots"]}

    def resolve(sid):
        bodies, cur = [], sid
        while cur is not None:
            b = body_of(name_of[cur])
            bodies.append(b)
            cur = b["base"]
        files, dels = [], []
        for b in reversed(bodies):
            rm = set(b["removed"])
            files = [f for f in files if f["path"] not in rm] + b["added"]
            rmd = set(b["removed_deletes"])
            dels = ([d for d in dels if d["path"] not in rmd]
                    + b["added_deletes"])
        return files, dels

    return {h["id"]: resolve(h["id"]) for h in raw["snapshots"]}


def test_lazy_meta_matches_brute_force_replay(spark, tmp_path):
    """Every snapshot's lazily-resolved (files, delete_files) must equal
    an independent no-cache chain replay — entries AND order — across
    appends, overwrite, MOR delete, and rollback (re-added paths)."""
    cat, t = _many_snapshot_table(spark, tmp_path)
    want = _eager_resolution(t)
    fresh = cat.load_table("ns.lazy")
    meta = fresh.meta
    for s in meta["snapshots"]:
        wf, wd = want[s["id"]]
        assert s["files"] == wf, f"files diverged at snapshot {s['id']}"
        assert s["delete_files"] == wd, \
            f"delete_files diverged at snapshot {s['id']}"


def test_meta_decode_opens_no_manifest_bodies(spark, tmp_path):
    """The pointer decode itself must be O(snapshots): zero manifest
    bodies read until a snapshot's file list is actually touched, and
    history() must run entirely from header counts."""
    cat, t = _many_snapshot_table(spark, tmp_path)
    fresh = cat.load_table("ns.lazy")
    meta = fresh.meta
    assert fresh._mcache == {}, "decode opened manifest bodies"
    # physical-presence probe: since r14 `'files' in s` answers True on
    # every snapshot (the lazy keys are logically always present), so
    # laziness is asserted via dict.__contains__ — the same spelling
    # _write_meta uses to keep commits O(1)
    for s in meta["snapshots"]:
        assert not dict.__contains__(s, "files")
        assert not dict.__contains__(s, "delete_files")
    n_hist = fresh.history().count()
    assert fresh._mcache == {}, "history() replayed manifest chains"
    assert n_hist == len(meta["snapshots"])
    # first touch materializes, and get() honors the lazy keys (plain
    # dict.get would return the default without resolving)
    cur = fresh._snapshot(meta, None)
    assert isinstance(cur.get("delete_files", []), list)
    assert "files" in cur or cur["files"] is not None


def test_lazy_get_never_returns_default_for_real_deletes(spark, tmp_path):
    """s.get('delete_files', []) on a NEVER-materialized snapshot that
    HAS delete files must return them — the dict.get/__missing__ trap."""
    cat = IceliteCatalog(spark, str(tmp_path / "getdeltrap"))
    t = cat.create_table("ns.g", BASE_SCHEMA,
                         properties={"format-version": "2",
                                     "write.delete.mode": "merge-on-read"})
    t.insert(spark.createDataFrame([(1, "x"), (2, "y")], BASE_SCHEMA))
    t.delete_where("k = 1")
    fresh = cat.load_table("ns.g")
    cur = fresh._snapshot(fresh.meta, None)
    assert cur.get("delete_files", []) != [], \
        "lazy get() returned the default instead of resolving"


def test_pre_r13_pointer_file_decodes(spark, tmp_path):
    """Back-compat: a pointer whose headers lack manifest_base/n_files
    (pre-r13 layout) must decode and read identically — the decoder
    falls back to one cached body read per snapshot."""
    import json as _json
    import os as _os
    cat, t = _many_snapshot_table(spark, tmp_path, rollback=False)
    want = t.read().sort("k").collect()
    mpath = _os.path.join(t.tdir, "metadata.json")
    with open(mpath) as f:
        raw = _json.load(f)
    for h in raw["snapshots"]:
        h.pop("manifest_base", None)
        h.pop("n_files", None)
        h.pop("n_delete_files", None)
    with open(mpath, "w") as f:
        _json.dump(raw, f)
    fresh = cat.load_table("ns.lazy")
    assert fresh.read().sort("k").collect() == want
    assert fresh.history().count() == len(raw["snapshots"])


def test_chain_rollup_bounds_fresh_reader_walk(spark, tmp_path):
    """After many commits, a FRESH handle materializing the current
    snapshot must open at most _MAX_CHAIN_DEPTH + 1 manifest bodies —
    the commit path rolls a too-deep delta chain up into a full
    manifest — while every historical snapshot stays time-travelable
    and the live contents stay exact."""
    from data_eng_iceberg_demo_spark.tables.icelite import _MAX_CHAIN_DEPTH
    cat = IceliteCatalog(spark, str(tmp_path / "rollup"))
    t = cat.create_table("ns.r", BASE_SCHEMA)
    n_commits = _MAX_CHAIN_DEPTH * 2 + 7
    for i in range(n_commits):
        t.insert(spark.createDataFrame([(i, f"v{i}")], BASE_SCHEMA))
    fresh = cat.load_table("ns.r")
    meta = fresh.meta
    cur = fresh._snapshot(meta, None)
    _ = cur["files"]
    opened = len(fresh._mcache)
    assert opened <= _MAX_CHAIN_DEPTH + 1, \
        f"fresh reader walked {opened} manifests"
    assert {r["k"] for r in fresh.read().collect()} == set(range(n_commits))
    # time travel across a rollup boundary still resolves exactly
    mid = meta["snapshots"][_MAX_CHAIN_DEPTH + 3]["id"]
    assert fresh.read(version=mid).count() == _MAX_CHAIN_DEPTH + 4
