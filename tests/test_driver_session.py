"""Driver-session simulation: the correctness driver runs ``queries()``
on ITS OWN SparkSession, not the one built by
:func:`data_eng_iceberg_demo_spark.session.get_spark`.  Round 1/2
failures (PARQUET_TYPE_ILLEGAL on events.parquet TIMESTAMP(NANOS))
escaped the local suite precisely because every local test used the
package's session factory, which sets the legacy nanos conf at build
time.  These tests run the events readers on a session where that conf
is explicitly reverted to its default, proving the readers set it at
runtime themselves."""

from __future__ import annotations

import pytest

from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                        _load_all_modules)
from data_eng_iceberg_demo_spark.sources.readers import load

_load_all_modules()

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def bare_spark(spark):
    """A session that mimics the driver's: same JVM, but the legacy nanos
    conf is NOT pre-set (newSession gives fresh runtime SQL conf; unset
    reverts any value inherited from the context to the default)."""
    ns = spark.newSession()
    ns.conf.unset(NANOS_CONF)
    return ns


def test_load_events_on_bare_session(bare_spark, sf_dir):
    df = load(bare_spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


@pytest.mark.parametrize("name", [
    "events_funnel", "events_cohort_retention", "events_top_paths",
    "events_anomaly", "join_asof", "join_interval",
])
def test_events_queries_on_bare_session(bare_spark, sf_dir, name):
    """The six CORRECTNESS_r02 hard failures, replayed on a driver-like
    session: each must build and produce rows without PARQUET_TYPE_ILLEGAL."""
    df = REGISTRY[name].fn(bare_spark, sf_dir)
    assert df.count() >= 0  # forces full execution


def test_stream_query_on_bare_session(bare_spark, sf_dir):
    """_events_stream's batch schema peek reads the raw nanos parquet and
    must also set the conf itself."""
    from data_eng_iceberg_demo_spark.streaming.harness import run_stream_to_df

    out = run_stream_to_df(
        bare_spark, sf_dir,
        lambda s: s.groupBy("event_type").count(),
        "bare_session_stream", output_mode="complete")
    assert out.count() > 0


def test_timezone_reset_on_bare_session(bare_spark, sf_dir, duck):
    """A driver session in a non-UTC timezone must still hash-match the
    timezone-naive DuckDB oracle: the registry wrapper resets
    spark.sql.session.timeZone before the plan is built."""
    bare_spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spec = REGISTRY["events_cohort_retention"]
    got = sorted(map(tuple, spec.fn(bare_spark, sf_dir).collect()))
    want = sorted(map(tuple, duck.execute(spec.oracle).fetchall()))
    assert bare_spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert got == want


@pytest.mark.parametrize("name", [
    "table_partitions_meta", "stream_table_appends", "table_incremental_agg",
    "llm_winnow_fingerprint", "llm_dedup_incremental", "cte_recursive_spine",
    "join_lateral_topn", "udf_cogrouped_map", "stream_python_datasource",
    "fn_xml", "fn_url", "fn_collation", "project_transpose",
])
def test_round5_queries_on_bare_session(bare_spark, sf_dir, name):
    """Every round-5 query must build and execute on a driver-like
    session (no package-session confs pre-applied) — the conf-dependence
    failure class of rounds 1-2, replayed for the new surface."""
    df = REGISTRY[name].fn(bare_spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", [
    "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q16", "tpch_q20", "tpch_q21",
    "table_rollback", "table_orphan_cleanup", "llm_bm25_topk",
    "agg_kmv_distinct", "join_bloom_prefilter", "subquery_not_in",
    "agg_mode_median", "llm_repetition_filter", "dq_constraint_check",
    "llm_bpe_pair_counts", "join_interval_bucketed", "llm_dedup_cross_source",
    "scd2_dimension_merge", "llm_multimodal_decode_bmp",
    "llm_multimodal_decode_wav", "llm_similarity_incremental",
    "table_partition_spec_evolution", "events_transition_matrix",
    "fn_try_family", "events_attribution", "window_time_range_frame",
    "agg_regression_family", "window_count_distinct", "events_rolling_dau",
    "llm_bigram_logprob", "scan_csv_malformed",
    "llm_dedup_exact_normalized", "agg_filter_clause",
    "fn_aes_roundtrip", "llm_line_dedup", "events_streaks",
    "scan_parquet_schema_merge", "scan_jdbc_partitioned",
    "udf_python_arrow", "udtf_python_analyze", "udf_grouped_map_arrow",
    "stream_stateful_rocksdb", "stream_file_sink_exactly_once",
    "sink_python_datasource", "udf_cogrouped_map_arrow",
    "llm_dedup_keep_best",
])
def test_round6_queries_on_bare_session(bare_spark, sf_dir, name):
    """The round-6 additions (derived-partsupp TPC-H set, table
    rollback/orphan cleanup, BM25, KMV sketch), replayed on a
    driver-like session with no package-session confs pre-applied.

    Note: the pysource cases (sink_python_datasource here) pin their
    OWN first-registering session for the duration of the read/write
    and restore the caller's active session afterwards — so this test
    proves they are callable from a bare session, not that they
    execute on it (sources/pysource.py:_pinned_session)."""
    df = REGISTRY[name].fn(bare_spark, sf_dir)
    assert df.count() >= 0


def test_pysource_restores_callers_active_session(spark, sf_dir):
    """_pinned_session must put the JVM active session back: a pysource
    query issued from a child session may not leave the process's
    active session flipped to the registered one (r6 ADVICE — the
    permanent setActiveSession was a cross-session state leak)."""
    child = spark.newSession()
    jcls = child._jvm.org.apache.spark.sql.classic.SparkSession
    jcls.setActiveSession(child._jsparkSession)
    REGISTRY["scan_python_datasource"].fn(child, sf_dir).count()
    active = jcls.getActiveSession()
    assert active.isDefined()
    assert active.get().equals(child._jsparkSession)


@pytest.mark.parametrize("name", [
    "table_merge_full_sync", "table_manifests_meta", "llm_similarity_lsh",
    "table_sorted_write_scan", "sink_xml_roundtrip", "llm_substring_dedup",
    "llm_perplexity_bucket", "agg_bitmap_distinct", "fn_higher_order",
    "llm_similarity_funnel", "events_rollup_ohlc", "join_asof_forward",
    "scan_parquet_metadata_cols", "table_snapshot_diff",
])
def test_round7_queries_on_bare_session(bare_spark, sf_dir, name):
    """Round-7 additions (full-sync MERGE, manifests metadata table,
    the hash-oracled LSH rewrite), replayed on a driver-like session
    with no package-session confs pre-applied."""
    df = REGISTRY[name].fn(bare_spark, sf_dir)
    assert df.count() >= 0


def test_streaks_reconcile_with_event_counts(spark, sf_dir):
    """events_streaks invariants vs the raw log: one row per active
    user, max streak <= user's event count, and streak count <= events
    (each streak holds >= 1 event)."""
    from data_eng_iceberg_demo_spark.operators._util import T

    rep = REGISTRY["events_streaks"].fn(spark, sf_dir).toPandas()
    per_user = (T(spark, sf_dir, "events").groupBy("user_id").count()
                .toPandas().set_index("user_id")["count"])
    assert sorted(rep.user_id) == sorted(per_user.index)
    j = rep.set_index("user_id").join(per_user)
    assert (j.max_streak_len <= j["count"]).all()
    assert (j.n_streaks <= j["count"]).all()
    assert (j.max_streak_len >= 1).all() and (j.n_streaks >= 1).all()


def test_streaks_match_brute_force_on_random_logs(spark, tmp_path_factory):
    """events_streaks vs a pure-Python brute force on randomized small
    event logs (hypothesis): heavy tie density (2 distinct timestamps,
    3 types, many users) exercises exactly the (tss, event_id) tiebreak
    and the deterministic longest-streak pick."""
    import datetime

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_eng_iceberg_demo_spark.plans.registry import REGISTRY

    base = datetime.datetime(2024, 1, 1)
    row = st.tuples(st.integers(0, 3),          # user
                    st.integers(0, 1),          # ts bucket (dense ties)
                    st.sampled_from(["view", "click", "buy"]))
    root = tmp_path_factory.mktemp("streaks_prop")
    case_n = [0]

    def brute(rows):
        out = {}
        by_user = {}
        for eid, (u, tb, ty) in enumerate(rows):
            by_user.setdefault(u, []).append((tb, eid, ty))
        for u, evs in by_user.items():
            evs.sort()
            streaks = []  # (len, streak_id, type)
            sid = 0
            for i, (tb, eid, ty) in enumerate(evs):
                if i == 0 or ty != evs[i - 1][2]:
                    sid += 1
                    streaks.append([0, sid, ty])
                streaks[-1][0] += 1
            best = sorted(streaks, key=lambda s: (-s[0], s[1], s[2]))[0]
            out[u] = (len(streaks), best[0], best[2])
        return out

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(row, min_size=1, max_size=30))
    def check(rows):
        case_n[0] += 1
        d = str(root / f"c{case_n[0]}")
        import duckdb
        con = duckdb.connect()
        con.execute("CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, "
                    "user_id BIGINT, event_type VARCHAR, value DOUBLE, "
                    "props VARCHAR)")
        for eid, (u, tb, ty) in enumerate(rows):
            con.execute("INSERT INTO e VALUES (?, ?, ?, ?, 1.0, '{}')",
                        [eid, base + datetime.timedelta(seconds=tb), u, ty])
        import os
        os.makedirs(d, exist_ok=True)
        con.execute(f"COPY e TO '{d}/events.parquet' (FORMAT PARQUET)")
        con.close()
        got = {r.user_id: (r.n_streaks, r.max_streak_len, r.top_streak_type)
               for r in REGISTRY["events_streaks"].fn(spark, d).collect()}
        assert got == brute(rows)

    check()


def test_stateful_provider_conf_is_live(spark, sf_dir):
    """stream_stateful_rocksdb's provider conf must actually reach the
    state store: a bogus provider class must fail the stream (proving
    the conf is honored, so the green RocksDB run really ran RocksDB)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from data_eng_iceberg_demo_spark.streaming.harness import \
        _stateful_running

    # no bare Exception in the tuple (it would pass on any failure —
    # r6 ADVICE): the error must be a streaming/JVM failure whose
    # message names the bogus provider class, proving the conf reached
    # the state store rather than e.g. a fixture-path typo.
    with pytest.raises((StreamingQueryException, Py4JJavaError),
                       match="no\\.such\\.StateStoreProvider"):
        _stateful_running(spark, sf_dir,
                          provider="no.such.StateStoreProvider",
                          tag="bogus_provider")


@pytest.mark.parametrize("name", [
    "join_asof_nearest", "llm_quality_classifier", "llm_dataset_card",
    "events_count_min_sketch", "llm_cdc_chunking", "llm_vocab_coverage",
    "llm_stratified_sample", "dq_k_anonymity",
    "llm_embedding_power_iteration", "scan_avro_python",
    "sink_avro_roundtrip", "llm_bpe_train_merges", "llm_pmi_collocations",
    "table_refs_meta", "table_files_meta", "stream_avro_python",
])
def test_round8_queries_on_bare_session(bare_spark, sf_dir, name):
    """Round-8 additions (the as-of completion, the pipeline scorers,
    the pure-python avro scan/sink pair), replayed on a driver-like
    session with no package-session confs pre-applied."""
    df = REGISTRY[name].fn(bare_spark, sf_dir)
    assert df.count() >= 0
