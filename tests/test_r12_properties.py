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
