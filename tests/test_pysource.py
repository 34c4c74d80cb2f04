"""Pin the Arrow-batched Python DataSource to its scalar row function.

The vectorized `_batch` path is what Spark executes; `_row` is the
readable spec (and what the DuckDB oracle replays in SQL).  If the two
ever diverge — numpy wrap semantics, the round-identity assumption on
value, the event-type indexing — the driver oracle would fail with no
hint where; this pins the equivalence at the function level.
"""

from data_eng_iceberg_demo_spark.sources.pysource import (EVENT_TYPES, _batch,
                                                          _row)


def test_pysource_batch_matches_row():
    # spans: start of stream, an unaligned interior range, and a range
    # crossing the default 1000-row query size
    for a, b in [(0, 1024), (123, 457), (990, 1010), (65535, 65600)]:
        cols = _batch(a, b).to_pydict()
        for j, i in enumerate(range(a, b)):
            assert (
                cols["event_id"][j],
                cols["user_id"][j],
                cols["event_type"][j],
                cols["value"][j],
            ) == _row(i)


def test_pysource_batch_schema_and_bounds():
    batch = _batch(0, 10)
    assert batch.schema.names == ["event_id", "user_id", "event_type", "value"]
    assert batch.num_rows == 10
    assert set(batch.column("event_type").to_pylist()) <= set(EVENT_TYPES)
    # empty range must yield an empty batch, not raise
    assert _batch(5, 5).num_rows == 0


def test_python_sink_commit_manifest_covers_every_file(spark, sf_dir):
    """The sink's two-phase commit must publish a _SUCCESS manifest on
    the driver naming every partition file with its row count — the
    atomic-publish half of the writer protocol."""
    import glob
    import json
    import os

    from data_eng_iceberg_demo_spark.plans.registry import REGISTRY

    df = REGISTRY["sink_python_datasource"].fn(spark, sf_dir)
    total = df.count()
    out = os.path.dirname(df.inputFiles()[0].removeprefix("file://"))
    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest = json.load(f)
    files = sorted(glob.glob(os.path.join(out, "part-*.csv")))
    assert sorted(manifest) == files
    assert sum(manifest.values()) == total
