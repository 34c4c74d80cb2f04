"""Round-12 additions: properties the oracle comparison can't express —
the streaming pattern matcher's cross-batch state carry (a match split
by a micro-batch boundary must fire exactly once), cherrypick /
position-deletes lifecycle corners live in test_icelite.py, QOI codec
spec pins in test_codec_properties.py."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                        _load_all_modules)

_load_all_modules()


def test_stream_pattern_match_carries_state_across_batches(spark, tmp_path):
    """Split view,click | purchase across two files with
    maxFilesPerTrigger=1 (file-source mtime ordering -> two
    micro-batches): the triple must fire ONCE, from the carried
    2-event state, never zero (state dropped) or twice (carry
    re-scanned past the boundary)."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType, TimestampType)

    from data_eng_iceberg_demo_spark.streaming import harness

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ])
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = "2024-03-01 10:00:"
    b1 = spark.createDataFrame(
        [(1, f"{base}01", 7, "view"), (2, f"{base}02", 7, "click"),
         (3, f"{base}01", 9, "view")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2 = spark.createDataFrame(
        [(4, f"{base}03", 7, "purchase"), (5, f"{base}02", 9, "error")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1.coalesce(1).write.parquet(os.path.join(src, "f1"))
    time.sleep(0.05)
    b2.coalesce(1).write.parquet(os.path.join(src, "f2"))
    # file source lists leaf files; re-point mtimes so f2 > f1
    now = time.time()
    for sub, off in (("f1", -10), ("f2", 0)):
        for fn in os.listdir(os.path.join(src, sub)):
            p = os.path.join(src, sub, fn)
            os.utime(p, (now + off, now + off))

    # drive the registered query body against the two-batch source by
    # monkey-patching the stream input (same session isolation path)
    orig = harness._events_stream

    def two_batch_stream(iso, d, path=None, max_files=None):
        raw = iso.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1").option(
            "recursiveFileLookup", "true").parquet(src)
        return raw

    harness._events_stream = two_batch_stream
    try:
        out = REGISTRY["stream_pattern_match"].fn(
            spark, "/root/testdata/sf0.001").collect()
    finally:
        harness._events_stream = orig
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 7 and r["secs_to_convert"] == 2
    assert str(r["match_start"]).startswith("2024-03-01 10:00:01")


def test_weighted_sample_is_weight_biased(spark):
    """A-Res must oversample heavy docs: the sampled mean weight has to
    exceed the corpus mean (by a clear margin on 500 docs / k=100), and
    the sample must be exactly k distinct docs."""
    out = REGISTRY["llm_weighted_sample"].fn(
        spark, "/root/testdata/sf0.01").collect()
    assert len(out) == 100
    assert len({r["doc_id"] for r in out}) == 100
    sample_mean = sum(r["weight"] for r in out) / len(out)
    corpus = (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
              .agg(F.avg("n_chars")).collect()[0][0])
    assert sample_mean > corpus * 1.1


def test_rewrite_position_deletes_invariants(spark):
    """The consolidation contract the hash can't see: two MoR deletes
    leave two pending delete files; the procedure collapses them to
    ONE, leaves every data file byte-identical (same paths), drops
    dangling positions (a CoW rewrite between the deletes orphans the
    rewritten file's positions), keeps the visible rows identical, and
    a second run is a no-op."""
    from data_eng_iceberg_demo_spark.tables.queries import (_fresh_table,
                                                            _as_output)

    t = _fresh_table(spark)
    t.delete_where("uf = 'SP'", mode="merge-on-read")
    t.delete_where("uf = 'RJ'", mode="merge-on-read")
    before = t._snapshot(t.meta, None)
    assert len(before.get("delete_files", [])) == 2
    data_before = sorted(f["path"] for f in before["files"])
    rows_before = {r["id_pedido"] for r in
                   _as_output(t.read()).select("id_pedido").collect()}

    assert t.rewrite_position_deletes() == 2
    after = t._snapshot(t.meta, None)
    assert len(after["delete_files"]) == 1
    assert sorted(f["path"] for f in after["files"]) == data_before
    rows_after = {r["id_pedido"] for r in
                  _as_output(t.read()).select("id_pedido").collect()}
    assert rows_after == rows_before
    # merged entry carries an exact record count (no double counting
    # of rows both deletes could have targeted)
    n_merged = after["delete_files"][0].get("record_count")
    assert n_merged is not None and n_merged > 0
    # metadata-only COUNT(*) stays truthful after consolidation
    assert t.metadata_count() == len(rows_after)
    # second run: fewer than two pending files -> no-op
    assert t.rewrite_position_deletes() == 0


def test_rewrite_position_deletes_drops_dangling_positions(spark):
    """A CoW rewrite between MoR deletes applies + removes the first
    delete's targets; consolidation afterwards must not resurrect or
    carry positions for files that left the snapshot."""
    from data_eng_iceberg_demo_spark.tables.queries import (_fresh_table,
                                                            _as_output)

    t = _fresh_table(spark)
    t.delete_where("uf = 'SP'", mode="merge-on-read")
    # CoW compaction folds the pending delete away and rewrites files
    t.rewrite_data_files(target_files=2)
    t.delete_where("uf = 'RJ'", mode="merge-on-read")
    t.delete_where("uf = 'MG'", mode="merge-on-read")
    expect = {r["id_pedido"] for r in
              _as_output(t.read()).select("id_pedido").collect()}
    assert t.rewrite_position_deletes() == 2
    got = {r["id_pedido"] for r in
           _as_output(t.read()).select("id_pedido").collect()}
    assert got == expect
    snap = t._snapshot(t.meta, None)
    live = {f["path"] for f in snap["files"]}
    assert set(snap["delete_files"][0]["targets"]) <= live


def test_timestamp_as_of_resolution_rules(spark):
    """FOR TIMESTAMP AS OF picks the LATEST snapshot at-or-before the
    instant; an instant before the first commit is an error; an instant
    after the head resolves to the head."""
    import pytest as _pytest

    from data_eng_iceberg_demo_spark.tables.queries import _fresh_table

    t = _fresh_table(spark)
    t.delete_where("uf = 'SP'")
    snaps = sorted(t.meta["snapshots"], key=lambda s: s["id"])
    ts1, ts2 = snaps[0]["ts"], snaps[1]["ts"]
    # exactly at commit 1 -> snapshot 1 (inclusive bound)
    assert t.read(as_of_ts=ts1).filter("uf = 'SP'").count() > 0
    # between commits -> still snapshot 1
    mid = (ts1 + ts2) / 2
    if ts1 < mid < ts2:
        assert t.read(as_of_ts=mid).filter("uf = 'SP'").count() > 0
    # at/after the delete commit -> SP rows gone
    assert t.read(as_of_ts=ts2 + 1.0).filter("uf = 'SP'").count() == 0
    # before the first commit -> error
    with _pytest.raises(ValueError):
        t.read(as_of_ts=ts1 - 1000.0)
    # exclusive with version=
    with _pytest.raises(ValueError):
        t.read(version=1, as_of_ts=ts1)


def test_column_stats_staleness_and_non_commit(spark):
    """Stats binding rules: analyze_table is NOT a commit (snapshot
    count unchanged), the readout is current right after analysis, a
    later DELETE flips is_current to False, and re-analysis both
    refreshes the flag and reflects the new values."""
    from data_eng_iceberg_demo_spark.tables.queries import _fresh_table

    t = _fresh_table(spark)
    n_snaps = len(t.meta["snapshots"])
    t.analyze_table(["uf"])
    assert len(t.meta["snapshots"]) == n_snaps  # not a commit
    df = t.column_stats_df()
    assert df.filter("column = 'uf'").first()["is_current"] is True
    ndv_before = df.first()["ndv"]
    t.delete_where("uf = 'SP'")
    assert t.column_stats_df().first()["is_current"] is False  # stale
    t.analyze_table(["uf"])
    row = t.column_stats_df().first()
    assert row["is_current"] is True
    assert row["ndv"] == ndv_before - 1  # SP gone from the domain
