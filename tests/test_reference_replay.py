"""Replay the reference tutorial's SQL session statement-for-statement
(README.md:155-328, sessions 3-7) through the SQL shim and assert every
outcome its prose describes.  A user of the reference can paste their
script at IceliteSqlSession.sql() and get the tutorial's behavior."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_eng_iceberg_demo_spark.tables.sqlext import IceliteSqlSession

FIXTURE = "/root/repo/tests/fixtures/pedidos.csv.gz"


@pytest.fixture()
def sess(spark, tmp_path):
    return IceliteSqlSession(spark, str(tmp_path))


def test_tutorial_sessions_3_through_7(spark, sess):
    # --- Session 3: schema, table, CSV view, typed insert (README.md:155-216)
    sess.sql("CREATE SCHEMA IF NOT EXISTS db;")
    sess.sql("""
        CREATE TABLE db.pedidos (
            id_pedido STRING,
            produto STRING,
            valor_unitario DECIMAL(10, 2),
            quantidade INT,
            data_criacao TIMESTAMP,
            uf STRING,
            id_cliente BIGINT
        )
        USING iceberg
        TBLPROPERTIES ('format-version'='2');
    """)
    sess.sql(f"""
        CREATE OR REPLACE TEMP VIEW pedidos_raw
        USING csv
        OPTIONS (
          path = '{FIXTURE}',
          header = 'true',
          delimiter = ';'
        );
    """)
    sess.sql("""
        INSERT INTO db.pedidos
        SELECT
          id_pedido,
          produto,
          CAST(valor_unitario AS DECIMAL(10, 2)),
          CAST(quantidade AS INT),
          CAST(data_criacao AS TIMESTAMP),
          uf,
          CAST(id_cliente AS BIGINT)
        FROM pedidos_raw;
    """)
    five = sess.sql("SELECT * FROM db.pedidos LIMIT 5;")
    assert five.count() == 5  # "Você deverá ver os dados" (README.md:219)
    assert five.columns[0] == "id_pedido"

    # --- Session 4: delete, group-by, history, time travel (README.md:225-258)
    n_sp = sess.sql(
        "SELECT count(*) AS c FROM db.pedidos WHERE uf = 'SP'").collect()[0]["c"]
    assert n_sp > 0
    sess.sql("DELETE FROM db.pedidos WHERE uf = 'SP';")
    by_uf = {r["uf"]: r["count(1)"] for r in
             sess.sql("SELECT uf, count(*) FROM db.pedidos GROUP BY uf;").collect()}
    assert "SP" not in by_uf  # "os pedidos de SP sumiram" (README.md:234-238)

    hist = sess.sql("SELECT * FROM db.pedidos.history;").collect()
    assert len(hist) == 2  # insert then delete (README.md:248)
    ops = [r["operation"] for r in sorted(hist, key=lambda r: r["snapshot_id"])]
    assert ops == ["append", "delete"]
    insert_snap = min(r["snapshot_id"] for r in hist)

    travel = {r["uf"]: r["count(1)"] for r in sess.sql(
        f"SELECT uf, count(*) FROM db.pedidos VERSION AS OF {insert_snap} "
        f"GROUP BY uf;").collect()}
    assert travel.get("SP") == n_sp  # "Resultado Mágico" (README.md:258)

    # --- Session 5: schema evolution (README.md:263-292)
    sess.sql("ALTER TABLE db.pedidos ADD COLUMN status STRING;")
    st = sess.sql("SELECT id_pedido, uf, status FROM db.pedidos LIMIT 5;")
    assert all(r["status"] is None for r in st.collect())  # README.md:276
    sess.sql("ALTER TABLE db.pedidos RENAME COLUMN uf TO estado;")
    renamed = sess.sql("SELECT id_pedido, estado FROM db.pedidos LIMIT 5;")
    assert renamed.count() == 5  # README.md:286-290
    with pytest.raises(Exception):
        sess.sql("SELECT uf FROM db.pedidos LIMIT 1;").collect()  # uf is gone

    # --- Session 6: hidden partitioning (README.md:298-307)
    sess.sql("ALTER TABLE db.pedidos ADD PARTITION FIELD days(data_criacao);")
    assert sess._table("db.pedidos").meta["partition_spec"]["source"] == \
        "data_criacao"

    # --- Session 7: maintenance (README.md:313-328)
    sess.sql("CALL system.expire_snapshots('db.pedidos', "
             "older_than => NOW() - INTERVAL '1' SECOND, retain_last => 1);")
    with pytest.raises(ValueError):
        sess._table("db.pedidos").read(version=insert_snap)  # expired

    t = sess._table("db.pedidos")
    rows_before = t.read().count()
    sess.sql("CALL system.rewrite_data_files(table => 'db.pedidos');")
    # the spec added in session 6 now applies: compaction rewrites into
    # the partition layout (one file per day), data identical
    n_days = (t.read().select(F.to_date("data_criacao").alias("day"))
              .distinct().count())
    assert t.file_count() == n_days
    assert t.read().count() == rows_before


def test_unhandled_statements_pass_through_to_spark(spark, sess):
    df = sess.sql("SELECT 1 AS one")
    assert df.collect()[0]["one"] == 1


def test_tag_branch_wap_sql_surface(spark, sess):
    """Iceberg's ref DDL shapes route through the shim: CREATE TAG pins a
    readable version, CREATE BRANCH + fast_forward publish WAP writes."""
    sess.sql("CREATE SCHEMA IF NOT EXISTS db;")
    sess.sql("""
        CREATE TABLE db.t (id BIGINT, v STRING) USING iceberg;
    """)
    spark.range(3).selectExpr("id", "CAST(id AS STRING) AS v") \
        .createOrReplaceTempView("seed")
    sess.sql("INSERT INTO db.t SELECT id, v FROM seed;")
    sess.sql("ALTER TABLE db.t CREATE TAG v1;")
    sess.sql("DELETE FROM db.t WHERE id = 0;")
    assert sess.sql("SELECT * FROM db.t;").count() == 2
    tagged = sess.sql("SELECT * FROM db.t VERSION AS OF 'v1';")
    assert tagged.count() == 3  # the tag still sees the pre-delete rows

    sess.sql("ALTER TABLE db.t CREATE BRANCH audit;")
    t = sess._table("db.t")
    t.write_to_branch(
        "audit", spark.range(10, 12).selectExpr("id", "CAST(id AS STRING) AS v"))
    assert sess.sql("SELECT * FROM db.t;").count() == 2      # main unchanged
    assert sess.sql("SELECT * FROM db.t VERSION AS OF 'audit';").count() == 4
    sess.sql("CALL system.fast_forward('db.t', 'audit');")
    assert sess.sql("SELECT * FROM db.t;").count() == 4      # published
