"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic event generator, registered as format("synthetic_events").

This is the engine's template for wrapping any Python-reachable system
(REST API, message queue, bespoke file format) as a first-class Spark
relation: partitions() declares the parallelism (each partition becomes
one Spark task, so generation scales out like any scan), read() yields
pyarrow RecordBatches (the Spark 4 DataSource API accepts them in place
of per-row tuples, skipping the Python row→pickle→JVM row path
entirely), and the declared schema makes downstream pruning and codegen
work as if the data came from parquet.

Determinism: row content is a pure function of (partition, row index) —
a splittable counter-based scheme (like Philox RNGs) rather than stateful
random generation, so any task can regenerate its partition
independently; retries and speculative execution stay correct at 100 TB.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])


def _row(i: int):
    # counter-based: mix the index through a 64-bit LCG step (splittable,
    # stateless — same value for the same i on any executor)
    h = (i * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
    return (
        i,
        h % 150,
        EVENT_TYPES[(h >> 8) % len(EVENT_TYPES)],
        round(((h >> 16) % 100000) / 100.0, 2),
    )


def _batch(start: int, end: int):
    """Vectorized form of _row over [start, end): one Arrow RecordBatch.

    numpy uint64 arithmetic wraps mod 2**64, which is exactly the LCG's
    masking step, so the whole partition is four array expressions.  The
    value column needs no explicit rounding: v/100.0 is already the
    closest double to a 2-decimal value, so round(x, 2) is the identity
    on it (pinned by test_pysource_batch_matches_row)."""
    import numpy as np
    import pyarrow as pa

    i = np.arange(start, end, dtype=np.uint64)
    h = i * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)
    etype = np.asarray(EVENT_TYPES, dtype=object)[
        ((h >> np.uint64(8)) % np.uint64(len(EVENT_TYPES))).astype(np.int64)]
    return pa.record_batch(
        [pa.array(i.astype(np.int64)),
         pa.array((h % np.uint64(150)).astype(np.int64)),
         pa.array(etype, type=pa.string()),
         pa.array(((h >> np.uint64(16)) % np.uint64(100000))
                  .astype(np.float64) / 100.0)],
        names=["event_id", "user_id", "event_type", "value"])


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", "1000"))
        self.parts = int(options.get("partitions", "4"))

    def partitions(self):
        step = max(1, self.n // self.parts)
        bounds = list(range(0, self.n, step)) + [self.n]
        return [_Partition(a, b) for a, b in zip(bounds, bounds[1:])]

    # Arrow batch size: bounds peak memory per task regardless of how
    # many rows a partition declares (100 TB-scale partitions stream
    # through in constant memory).
    BATCH_ROWS = 1 << 16

    def read(self, partition):
        for a in range(partition.start, partition.end, self.BATCH_ROWS):
            yield _batch(a, min(a + self.BATCH_ROWS, partition.end))


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same counter-based generator (Spark 4
    Python DataSource streaming API): the offset is simply the next row
    index, each micro-batch covers [start, start+batch_rows), and the
    source reports end-of-data by returning its start offset unchanged.
    Offsets are checkpointable dicts, and because row content is a pure
    function of the index, replaying a batch after failure regenerates
    identical rows — exactly-once semantics without any source-side
    state.  SimpleDataSourceStreamReader reads on the driver (fine for a
    demo-rate source); the partition-planned DataSourceStreamReader is
    the scale path, same row function."""

    def __init__(self, options):
        self.n = int(options.get("rows", "300"))
        self.batch_rows = int(options.get("batch_rows", "100"))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i = int(start["i"])
        if i >= self.n:
            return iter([]), start
        end = min(i + self.batch_rows, self.n)
        return iter([_row(j) for j in range(i, end)]), {"i": end}

    def readBetweenOffsets(self, start, end):
        return iter([_row(j) for j in range(int(start["i"]), int(end["i"]))])


def register_source(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SyntheticEventsSource)


from ..plans.registry import register  # noqa: E402


@register(
    "scan_python_datasource",
    oracle="""
    WITH g AS (SELECT unnest(generate_series(0, 999)) AS i),
    h AS (
        SELECT i,
               CAST((CAST(i AS HUGEINT) * 6364136223846793005
                     + 1442695040888963407) % 18446744073709551616 AS HUGEINT)
                   AS hv
        FROM g
    )
    SELECT CAST(i AS BIGINT) AS event_id,
           CAST(hv % 150 AS BIGINT) AS user_id,
           (['click','view','purchase','signup','error'])
               [CAST((hv // 256) % 5 AS INTEGER) + 1] AS event_type,
           round(CAST((hv // 65536) % 100000 AS DOUBLE) / 100.0, 2) AS value
    FROM h
    """,
)
def scan_python_datasource(spark, d):
    """Scan through the custom Python data source: 1000 deterministic
    rows over 4 partitions (4 Spark tasks).  The oracle replays the
    same counter-based row function in SQL, proving the source is a
    pure, splittable function of the row index."""
    register_source(spark)
    return (spark.read.format("synthetic_events")
            .option("rows", "1000").option("partitions", "4").load())


@register(
    "stream_python_datasource",
    oracle="""
    WITH g AS (SELECT unnest(generate_series(0, 299)) AS i),
    h AS (
        SELECT i,
               CAST((CAST(i AS HUGEINT) * 6364136223846793005
                     + 1442695040888963407) % 18446744073709551616 AS HUGEINT)
                   AS hv
        FROM g
    )
    SELECT CAST(i AS BIGINT) AS event_id,
           CAST(hv % 150 AS BIGINT) AS user_id,
           (['click','view','purchase','signup','error'])
               [CAST((hv // 256) % 5 AS INTEGER) + 1] AS event_type,
           round(CAST((hv // 65536) % 100000 AS DOUBLE) / 100.0, 2) AS value
    FROM h
    """,
)
def stream_python_datasource(spark, d):
    """readStream through the custom Python data source (Spark 4
    streaming DataSource API): 300 rows arrive as index-offset
    micro-batches of 100 and drain into a memory sink.  The union of all
    micro-batches must equal the batch scan of the same index range —
    the oracle replays the counter function in SQL, so the offset
    bookkeeping (no gap, no overlap, stop at end) is what's actually
    under test.  The query runs on a tight micro-batch trigger;
    processAllAvailable() returns once the source's offset stops
    advancing (end-of-data), then the query stops."""
    import uuid as _uuid

    register_source(spark)
    stream = (spark.readStream.format("synthetic_events")
              .option("rows", "300").option("batch_rows", "100").load())
    qname = f"py_stream_{_uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.format("memory").queryName(qname)
         .outputMode("append").trigger(processingTime="0 seconds").start())
    try:
        # drains every micro-batch; returns once the source's offset
        # stops advancing (read() reports end-of-data)
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)
