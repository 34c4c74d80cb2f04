"""Replay-style tests for the SQL-shim statements added in round 4 —
the SQL surface tracking the API surface grown in rounds 1-3 plus the
new merge-on-read / transform features:

  * CALL system.remove_orphan_files
  * CALL system.rollback_to_snapshot
  * ALTER TABLE ... SET TBLPROPERTIES (write.delete.mode routes DELETE)
  * ALTER TABLE ... ADD PARTITION FIELD months()/bucket()/truncate()
  * VERSION AS OF '<branch>' over write_to_branch results (WAP read)
"""

from __future__ import annotations

import os

import pytest

from data_eng_iceberg_demo_spark.tables.sqlext import IceliteSqlSession


@pytest.fixture()
def sess(spark, tmp_path):
    s = IceliteSqlSession(spark, str(tmp_path))
    s.sql("CREATE SCHEMA IF NOT EXISTS db")
    s.sql("""
        CREATE TABLE db.t (id INT, uf STRING, ts TIMESTAMP)
        USING iceberg TBLPROPERTIES ('format-version'='2')
    """)
    s.sql("""
        INSERT INTO db.t SELECT * FROM VALUES
          (1, 'SP', TIMESTAMP '2024-01-10 00:00:00'),
          (2, 'RJ', TIMESTAMP '2024-02-10 00:00:00'),
          (3, 'SP', TIMESTAMP '2024-03-10 00:00:00'),
          (4, 'MG', TIMESTAMP '2025-01-10 00:00:00') AS v(id, uf, ts)
    """)
    return s


def test_call_remove_orphan_files(spark, sess):
    t = sess._table("db.t")
    orphan = os.path.join(t.tdir, "data", "orphan.parquet")
    open(orphan, "w").close()  # debris a failed commit would leave
    out = sess.sql("CALL system.remove_orphan_files('db.t')")
    removed = {r["orphan_file_location"] for r in out.collect()}
    assert "data/orphan.parquet" in removed
    assert not os.path.exists(orphan)
    assert sess.sql("SELECT count(*) AS n FROM db.t").collect()[0]["n"] == 4


def test_call_rollback_to_snapshot(spark, sess):
    sess.sql("DELETE FROM db.t WHERE uf = 'SP'")
    assert sess.sql("SELECT count(*) AS n FROM db.t").collect()[0]["n"] == 2
    sess.sql("CALL system.rollback_to_snapshot('db.t', 1)")
    assert sess.sql("SELECT count(*) AS n FROM db.t").collect()[0]["n"] == 4


def test_tblproperties_route_delete_to_merge_on_read(spark, sess):
    sess.sql("ALTER TABLE db.t SET TBLPROPERTIES "
             "('write.delete.mode'='merge-on-read')")
    t = sess._table("db.t")
    files_before = sorted(f["path"] for f in
                          t.meta["snapshots"][-1]["files"])
    sess.sql("DELETE FROM db.t WHERE uf = 'SP'")
    snap = t.meta["snapshots"][-1]
    # data files untouched, one position-delete file committed
    assert sorted(f["path"] for f in snap["files"]) == files_before
    assert len(snap["delete_files"]) == 1
    rows = sess.sql("SELECT id FROM db.t ORDER BY id").collect()
    assert [r["id"] for r in rows] == [2, 4]


def test_add_partition_field_transforms(spark, sess):
    sess.sql("ALTER TABLE db.t ADD PARTITION FIELD months(ts)")
    t = sess._table("db.t")
    assert t.meta["partition_spec"]["transform"] == "months"
    sess.sql("""
        INSERT INTO db.t SELECT * FROM VALUES
          (5, 'BA', TIMESTAMP '2026-07-01 00:00:00') AS v(id, uf, ts)
    """)
    parts = {f["partition"] for f in t.meta["snapshots"][-1]["files"]
             if f["partition"] is not None}
    assert "2026-07" in parts
    sess.sql("ALTER TABLE db.t ADD PARTITION FIELD bucket(4, id)")
    assert t.meta["partition_spec"] == {
        "transform": "bucket", "source": "id", "source_id": 1,
        "name": "p_bucket", "param": 4}
    sess.sql("ALTER TABLE db.t ADD PARTITION FIELD truncate(2, uf)")
    assert t.meta["partition_spec"]["transform"] == "truncate"


def test_version_as_of_branch_after_branch_write(spark, sess):
    """WAP read path: rows staged on a branch are visible via
    VERSION AS OF '<branch>' and invisible on main until fast_forward."""
    t = sess._table("db.t")
    t.create_branch("audit")
    staged = spark.sql("SELECT * FROM VALUES (9, 'PR', "
                       "TIMESTAMP '2027-01-01 00:00:00') AS v(id, uf, ts)")
    t.write_to_branch("audit", staged)
    on_branch = sess.sql(
        "SELECT id FROM db.t VERSION AS OF 'audit' ORDER BY id").collect()
    assert [r["id"] for r in on_branch] == [1, 2, 3, 4, 9]
    on_main = sess.sql("SELECT id FROM db.t ORDER BY id").collect()
    assert [r["id"] for r in on_main] == [1, 2, 3, 4]
    sess.sql("CALL system.fast_forward('db.t', 'audit')")
    published = sess.sql("SELECT id FROM db.t ORDER BY id").collect()
    assert [r["id"] for r in published] == [1, 2, 3, 4, 9]


def test_select_metadata_tables_files_and_partitions(spark, sess):
    """SELECT over db.t.files / db.t.partitions (Iceberg's inspection
    spelling) resolves through the shim to manifest-backed metadata."""
    files = sess.sql(
        "SELECT file_path, record_count FROM db.t.files").collect()
    assert sum(r["record_count"] for r in files) == 4
    assert all(r["file_path"].startswith("data/") for r in files)
    parts = sess.sql(
        "SELECT partition, file_count, record_count FROM db.t.partitions"
    ).collect()
    assert sum(r["record_count"] for r in parts) == 4
    assert all(r["file_count"] >= 1 for r in parts)


def test_select_metadata_table_refs(spark, sess):
    """SELECT over db.t.refs lists main plus every tag/branch with the
    snapshot each pins."""
    sess.sql("ALTER TABLE db.t CREATE TAG v1")
    sess.sql("ALTER TABLE db.t CREATE BRANCH audit")
    refs = {r["name"]: r for r in
            sess.sql("SELECT name, type, snapshot_id FROM db.t.refs").collect()}
    assert refs["main"]["type"] == "branch"
    assert refs["v1"]["type"] == "tag"
    assert refs["audit"]["type"] == "branch"


def test_select_metadata_table_manifests(spark, sess):
    """SELECT over db.t.manifests (Iceberg's inspection spelling)
    resolves through the shim to the delta-manifest chain, and the
    chain accounts for the snapshot exactly."""
    rows = sess.sql(
        "SELECT snapshot_id, base_snapshot_id, added_data_files,"
        "       removed_data_files FROM db.t.manifests").collect()
    assert rows
    n_files = sess.sql("SELECT count(*) AS c FROM db.t.files").collect()[0].c
    assert (sum(r.added_data_files for r in rows)
            - sum(r.removed_data_files for r in rows)) == n_files
