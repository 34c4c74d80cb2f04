"""Row-level UPDATE semantics (the second half of Iceberg v2's
"updates e deletes" capability, README.md:180; README.md:325 names
UPDATE alongside DELETE as a small-file source).  Contract pinned here:

  * CoW update result matches applying the assignment in SQL
  * MoR update result == CoW update result for the same statement
  * MoR update rewrites ZERO existing data files (old files all carry
    over; matched rows move via position delete + one appended file)
  * every RHS sees the OLD row (SET a = b, b = a swaps, not cascades)
  * time travel across an update sees the pre-update rows
  * rewrite_data_files folds the MoR delete + append pair into a clean
    file set with identical rows
  * the sqlext router accepts UPDATE ... SET ... WHERE and MERGE INTO
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_eng_iceberg_demo_spark.tables.icelite import IceliteCatalog
from data_eng_iceberg_demo_spark.tables.queries import (PEDIDOS_SCHEMA,
                                                        _typed_pedidos)


def _fresh(spark, tmp_path, name):
    cat = IceliteCatalog(spark, str(tmp_path))
    t = cat.create_table(name, PEDIDOS_SCHEMA)
    t.insert(_typed_pedidos(spark))
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _data_paths(t):
    return sorted(f["path"] for f in
                  t.meta["snapshots"][t.meta["current_snapshot"] - 1]["files"])


@pytest.fixture()
def pair(spark, tmp_path):
    return (_fresh(spark, tmp_path, "db.cow"),
            _fresh(spark, tmp_path, "db.mor"))


def test_update_cow_matches_sql_semantics(spark, tmp_path):
    t = _fresh(spark, tmp_path, "db.t")
    expected = _rows(
        _typed_pedidos(spark).withColumn(
            "quantidade",
            F.when(F.col("uf") == "SP", F.col("quantidade") + 10)
            .otherwise(F.col("quantidade"))))
    t.update_where("uf = 'SP'", {"quantidade": "quantidade + 10"})
    assert _rows(t.read()) == expected
    assert t.meta["snapshots"][-1]["operation"] == "update"


def test_update_mor_equals_cow_and_rewrites_nothing(spark, pair):
    cow, mor = pair
    before = _data_paths(mor)
    cow.update_where("uf = 'SP'", {"quantidade": "quantidade + 10"})
    mor.update_where("uf = 'SP'", {"quantidade": "quantidade + 10"},
                     mode="merge-on-read")
    assert _rows(cow.read()) == _rows(mor.read())
    # every pre-update data file carries over; exactly the appended
    # file(s) are new; one position delete file masks the old versions
    after = _data_paths(mor)
    assert set(before) <= set(after) and len(after) > len(before)
    assert len(mor.meta["snapshots"][-1]["delete_files"]) == 1


def test_update_rhs_sees_old_row(spark, tmp_path):
    t = _fresh(spark, tmp_path, "db.t")
    before = {r["id_pedido"]: (r["quantidade"], r["id_cliente"])
              for r in t.read().collect()}
    t.update_where("true", {"quantidade": "id_cliente",
                            "id_cliente": "quantidade"})
    after = {r["id_pedido"]: (r["quantidade"], r["id_cliente"])
             for r in t.read().collect()}
    assert all(after[k] == (c, q) for k, (q, c) in before.items())


def test_update_time_travel_and_compaction(spark, tmp_path):
    t = _fresh(spark, tmp_path, "db.t")
    orig = _rows(t.read())
    t.update_where("uf = 'SP'", {"quantidade": "quantidade + 10"},
                   mode="merge-on-read")
    updated = _rows(t.read())
    assert _rows(t.read(version=1)) == orig
    t.rewrite_data_files()
    assert _rows(t.read()) == updated
    assert not t.meta["snapshots"][-1].get("delete_files")


def test_update_unknown_column_raises(spark, tmp_path):
    t = _fresh(spark, tmp_path, "db.t")
    with pytest.raises(ValueError, match="no such column"):
        t.update_where("true", {"nope": "1"})


def test_update_stacks_with_mor_deletes(spark, tmp_path):
    """MoR delete -> MoR update -> CoW delete compose: each operation
    sees the previous one's live rows, and the final state equals the
    same statements applied to a plain DataFrame."""
    t = _fresh(spark, tmp_path, "db.t")
    t.delete_where("uf = 'RJ'", mode="merge-on-read")
    t.update_where("uf = 'SP'", {"quantidade": "quantidade * 2"},
                   mode="merge-on-read")
    t.delete_where("quantidade > 8")  # CoW, applies pending deletes
    expected = _rows(
        _typed_pedidos(spark)
        .filter("uf <> 'RJ'")
        .withColumn("quantidade",
                    F.when(F.col("uf") == "SP", F.col("quantidade") * 2)
                    .otherwise(F.col("quantidade")))
        .filter("quantidade <= 8"))
    assert _rows(t.read()) == expected


def test_concurrent_update_conflict(spark, tmp_path):
    """Two writers updating from the same base snapshot: first commit
    wins, the stale-based second raises CommitConflict, and a re-read
    re-apply succeeds (optimistic concurrency, as for DELETE)."""
    from data_eng_iceberg_demo_spark.tables.icelite import (CommitConflict,
                                                            IceliteTable)

    t = _fresh(spark, tmp_path, "db.t")
    loser = IceliteTable(spark, t.tdir)
    stale = loser.meta                   # loser reads its base...
    t.update_where("uf = 'SP'", {"quantidade": "quantidade + 1"})
    with pytest.raises(CommitConflict):  # ...winner committed first
        loser._commit_snapshot(stale, "update", [])
    # loser re-reads and re-applies cleanly on the new base
    loser.update_where("uf = 'MG'", {"quantidade": "quantidade + 1"})
    assert t.meta["current_snapshot"] == 3  # insert + two updates


def test_sqlext_update_and_merge(spark, tmp_path):
    from data_eng_iceberg_demo_spark.tables.sqlext import IceliteSqlSession

    sess = IceliteSqlSession(spark, str(tmp_path))
    sess.sql("CREATE SCHEMA db")
    sess.sql("""CREATE TABLE db.pedidos (
        id_pedido string, produto string, quantidade int) USING iceberg""")
    src = spark.createDataFrame(
        [("a", "mouse", 1), ("b", "teclado", 2)],
        "id_pedido string, produto string, quantidade int")
    src.createOrReplaceTempView("seed")
    sess.sql("INSERT INTO db.pedidos SELECT * FROM seed")

    sess.sql("UPDATE db.pedidos SET quantidade = quantidade * 10 "
             "WHERE id_pedido = 'a'")
    got = {r["id_pedido"]: r["quantidade"]
           for r in sess.sql("SELECT * FROM db.pedidos").collect()}
    assert got == {"a": 10, "b": 2}

    upd = spark.createDataFrame(
        [("b", "monitor", 5), ("c", "webcam", 7)],
        "id_pedido string, produto string, quantidade int")
    upd.createOrReplaceTempView("updates")
    sess.sql("""MERGE INTO db.pedidos t USING updates s
                ON t.id_pedido = s.id_pedido
                WHEN MATCHED THEN UPDATE SET t.produto = s.produto,
                                             t.quantidade = s.quantidade
                WHEN NOT MATCHED THEN INSERT *""")
    got = {r["id_pedido"]: (r["produto"], r["quantidade"])
           for r in sess.sql("SELECT * FROM db.pedidos").collect()}
    assert got == {"a": ("mouse", 10), "b": ("monitor", 5),
                   "c": ("webcam", 7)}
