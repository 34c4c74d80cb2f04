"""B-udf queries (SURVEY.md §2): the full user-defined-function surface —
row-at-a-time Python UDF, vectorized (Arrow) pandas UDFs (scalar and
grouped-agg), applyInPandas grouped-map, mapInPandas, and a Python UDTF.

Scale notes: row-at-a-time UDFs exist for coverage, not for hot paths —
they serialize row-by-row across the JVM↔Python boundary.  Every other
entry here moves data as Arrow record batches (10-100× less overhead) and
is the sanctioned pattern for custom logic at 100 TB.  Each UDF's logic is
mirrored in plain oracle SQL so the driver hash-checks the results.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf

from pyspark.sql.types import DoubleType, LongType

from ..operators._util import T
from ..plans.registry import register


# Both scalar UDFs are defined ONCE at module scope.  Re-decorating inside
# the query function built a fresh UDF object per call, which (a) meant the
# bench's adjacent warm-up run warmed a *different* UDF than the timed run
# (r04 recorded udf_pandas_scalar at 8.8x its r01 figure purely from that
# cold path), and (b) for the row UDF triggered pyspark's
# "Cannot infer the eval type from type hints" fallback on every call.
# The row UDF's function carries NO type hints: hints on a plain F.udf
# send udf.py:134 down the hint-inference path, which cannot resolve a
# non-pandas signature and warns before falling back.
def _tier(price):
    if price >= 300000:
        return 3
    if price >= 100000:
        return 2
    return 1


_tier_udf = F.udf(_tier, returnType=LongType(), useArrow=False)


# return type as a DataType object, not a DDL string: the string form is
# parsed eagerly through the active SparkContext, which does not exist yet
# at module import time
@pandas_udf(DoubleType())
def _adj_price(price: pd.Series, disc: pd.Series) -> pd.Series:
    return (price * (1.0 - disc) * 1.1).round(6)


@register(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE WHEN o_totalprice >= 300000 THEN 3
                     WHEN o_totalprice >= 100000 THEN 2
                     ELSE 1 END AS BIGINT) AS tier
    FROM orders
    """,
)
def udf_python_scalar(spark, d):
    """Row-at-a-time Python UDF (deliberate coverage of the slow path;
    ``useArrow=False`` pins pickled-batch BatchEvalPython semantics)."""
    o = T(spark, d, "orders")
    return o.select("o_orderkey", _tier_udf("o_totalprice").alias("tier"))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * 1.1, 6) AS adj_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark, d):
    """Vectorized Series→Series pandas UDF over Arrow batches
    (ArrowEvalPython in the plan — asserted in tests/test_plans.py)."""
    li = T(spark, d, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        _adj_price("l_extendedprice", "l_discount").alias("adj_price"),
    )


@register(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT c_nationkey,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / (100.0 * count(*)) AS mean_bal,
           max(c_acctbal) - min(c_acctbal) AS bal_range
    FROM customer
    GROUP BY c_nationkey
    """,
)
def udf_pandas_grouped_agg(spark, d):
    """Vectorized UDAF: Series→scalar pandas UDFs inside .agg()."""

    @pandas_udf("double")
    def exact_mean(v: pd.Series) -> float:
        # acctbal has exactly 2 decimals: sum exact integer cents, then one
        # float division — bit-identical to the oracle's decimal-sum/count
        cents = (v * 100).round().astype("int64").sum()
        return float(cents) / (100.0 * len(v))

    @pandas_udf("double")
    def value_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    c = T(spark, d, "customer")
    return c.groupBy("c_nationkey").agg(
        exact_mean("c_acctbal").alias("mean_bal"),
        value_range("c_acctbal").alias("bal_range"),
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT c_custkey, c_nationkey,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 4) + 0
               AS bal_z
    FROM customer
    """,
)
def udf_grouped_map(spark, d):
    """applyInPandas grouped-map: per-nation z-score normalization.  The
    group key partitions the shuffle; each group is one pandas frame
    (bounded by the largest nation — salting would split a hot group)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame({
            "c_custkey": pdf["c_custkey"],
            "c_nationkey": pdf["c_nationkey"],
            "bal_z": ((pdf["c_acctbal"] - mu) / sd).round(4) + 0.0,
        })

    c = T(spark, d, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    return c.groupBy("c_nationkey").applyInPandas(
        zscore, "c_custkey bigint, c_nationkey int, bal_z double")


@register(
    "udf_map_in_pandas",
    oracle="""
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    """,
)
def udf_map_in_pandas(spark, d):
    """mapInPandas partition-wise iterator transform (Arrow batches in and
    out) — the plumbing pattern for multimodal decode at scale."""

    def tokenize(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                # nullable Int64: a NULL text row must yield NULL, not
                # crash the astype (pandas IntCastingNaNError — caught
                # by the r13 null-mirror widening)
                "n_tokens": pdf["text"].str.split(" ").str.len().astype("Int64"),
                "n_chars": pdf["n_chars"],
            })

    docs = T(spark, d, "documents")
    return docs.mapInPandas(
        tokenize, "doc_id bigint, lang string, n_tokens bigint, n_chars bigint")


@register(
    "udtf_python",
    oracle="""
    SELECT r_regionkey, r_name, CAST(u.n AS BIGINT) AS n,
           concat(r_name, '-', CAST(u.n AS VARCHAR)) AS tag
    FROM region, unnest([1, 2, 3]) AS u(n)
    """,
)
def udtf_python(spark, d):
    """Python UDTF (Spark 4): one input row → three output rows via a
    lateral join."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="n bigint, tag string")
    class Fanout:
        def eval(self, key: int, name: str):
            for n in (1, 2, 3):
                yield n, f"{name}-{n}"

    spark.udtf.register("fanout_udtf", Fanout)
    T(spark, d, "region").createOrReplaceTempView("region_udtf")
    return spark.sql("""
        SELECT r.r_regionkey, r.r_name, f.n, f.tag
        FROM region_udtf r, LATERAL fanout_udtf(r.r_regionkey, r.r_name) f
    """)


@register(
    "udf_sql_declared",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))), 4)
                AS DOUBLE) AS net,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      * (1 + CAST(l_tax AS DECIMAL(18,2))), 4)
                AS DOUBLE) AS gross
    FROM lineitem
    WHERE l_quantity >= 45
    """,
)
def udf_sql_declared(spark, d):
    """SQL-declared scalar UDFs (Spark 4 CREATE FUNCTION ... RETURN):
    the function body is an expression the optimizer INLINES — unlike
    Python UDFs there is no serialization boundary, so declared SQL
    UDFs are the 100 TB-safe way to share business logic."""
    T(spark, d, "lineitem").createOrReplaceTempView("li_sqludf")
    # decimal-in, decimal-out: 2-decimal inputs put products exactly on
    # the 1e-4/1e-6 grid, where double round() hits half-way ties that
    # resolve differently per engine — decimal math keeps ties exact
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION net_price(
            p DECIMAL(18,2), disc DECIMAL(18,2))
        RETURNS DECIMAL(28,4) RETURN p * (1 - disc)
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION gross_price(
            p DECIMAL(18,2), disc DECIMAL(18,2), tax DECIMAL(18,2))
        RETURNS DECIMAL(38,6) RETURN net_price(p, disc) * (1 + tax)
    """)
    return spark.sql("""
        SELECT l_orderkey, l_linenumber,
               CAST(round(net_price(CAST(l_extendedprice AS DECIMAL(18,2)),
                                    CAST(l_discount AS DECIMAL(18,2))), 4)
                    AS DOUBLE) AS net,
               CAST(round(gross_price(CAST(l_extendedprice AS DECIMAL(18,2)),
                                      CAST(l_discount AS DECIMAL(18,2)),
                                      CAST(l_tax AS DECIMAL(18,2))), 4)
                    AS DOUBLE) AS gross
        FROM li_sqludf
        WHERE l_quantity >= 45
    """)


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT event_id,
           round(value * 2.0, 4) AS doubled,
           CAST(length(event_type) AS INTEGER) AS type_len
    FROM events
    """,
)
def udf_map_in_arrow(spark, d):
    """mapInArrow: the zero-copy Arrow batch surface under the pandas
    UDFs — pyarrow.compute kernels run vectorized on each RecordBatch
    with no pandas conversion cost.  The right tier for byte-level and
    columnar-native transforms."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def transform(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            yield pa.RecordBatch.from_arrays(
                [t.column("event_id").combine_chunks(),
                 pc.round(pc.multiply(
                     t.column("value").combine_chunks(),
                     pa.scalar(2.0)), 4),
                 pc.cast(pc.utf8_length(
                     t.column("event_type").combine_chunks()), pa.int32())],
                ["event_id", "doubled", "type_len"])

    e = T(spark, d, "events").select("event_id", "value", "event_type")
    return e.mapInArrow(
        transform, "event_id bigint, doubled double, type_len int")


@register(
    "udf_cogrouped_map",
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
           CAST(coalesce(sum(l.l_quantity), 0) AS DOUBLE) AS sum_qty,
           CAST(coalesce(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 0)
                AS DOUBLE) AS revenue
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-01-08'
    GROUP BY 1, 2
    """,
)
def udf_cogrouped_map(spark, d):
    """Cogrouped applyInPandas (``groupby.cogroup(...).applyInPandas``):
    both sides hash-partition on the key, and each key's (orders-frame,
    lineitem-frame) pair reaches ONE pandas function — the Spark-native
    shape for custom two-sided merge logic (as-of merges, reconciliation,
    interval alignment) that a plain join can't express row-wise.  Here
    the merge itself IS join-expressible (that's what makes it
    hash-checkable); the money arithmetic runs on exact integer cents so
    it matches the oracle's decimal sum bit-for-bit.  Scale: Python cost
    is O(groups touched) — ~2-4 ms per cogroup call — so the demo
    restricts to one week of orders; the production pattern keeps the
    cogrouped key domain bounded (or batches keys) for the same reason."""
    o = (T(spark, d, "orders")
         .filter((F.col("o_orderdate") >= "1995-01-01")
                 & (F.col("o_orderdate") < "1995-01-08"))
         .select("o_orderkey", "o_totalprice"))
    li = T(spark, d, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    # the cogroup still keys BOTH full sides; pre-semi-join the big side
    # so only the month's line items shuffle (at 100 TB this is the
    # difference between shuffling the corpus and shuffling the delta)
    li = li.join(o.select(F.col("o_orderkey").alias("l_orderkey")),
                 "l_orderkey", "left_semi")

    def merge(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        if len(odf) == 0:
            return pd.DataFrame(columns=[
                "o_orderkey", "o_totalprice", "n_lines", "sum_qty", "revenue"])
        # exact integer-cents arithmetic: price and discount are 2-decimal
        # values, so cents*(100-disc_pct) sums exactly in int64 and ONE
        # final division gives the correctly-rounded double — bit-identical
        # to the oracle's CAST(sum(DECIMAL*DECIMAL) AS DOUBLE), with no
        # float accumulation order or round() tie-breaking in play
        cents = np.rint(ldf["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.rint(ldf["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = float(int((cents * (100 - disc)).sum())) / 10000.0
        return pd.DataFrame({
            "o_orderkey": odf["o_orderkey"].iloc[:1],
            "o_totalprice": odf["o_totalprice"].iloc[:1].astype("float64"),
            "n_lines": [len(ldf)],
            "sum_qty": [float(ldf["l_quantity"].sum()) if len(ldf) else 0.0],
            "revenue": [rev],
        })

    return (o.groupby("o_orderkey")
            .cogroup(li.groupby("l_orderkey"))
            .applyInPandas(merge, "o_orderkey bigint, o_totalprice double, "
                                  "n_lines bigint, sum_qty double, "
                                  "revenue double"))


def _margin(price, disc):
    # no type hints on purpose (see _tier).  Round at 6, not 2: the true
    # product of two 2-decimal values has <= 4 decimals, so a 1e-6
    # rounding step can never sit on a tie — rounding at 2 DID, and
    # Python's banker's rounding split from the oracle's half-away on
    # exactly-.005 margins (observed on the fixture)
    return round(price * (1.0 - disc), 6)


_margin_arrow_udf = F.udf(_margin, returnType=DoubleType(), useArrow=True)


@register(
    "udf_python_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS margin
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def udf_python_arrow(spark, d):
    """Arrow-OPTIMIZED Python UDF (Spark 3.5 ``useArrow=True``): the
    third execution mode of the scalar-UDF surface, between
    udf_python_scalar (pickled rows, BatchEvalPython) and
    udf_pandas_scalar (pandas Series, ArrowEvalPython).  The function
    body stays plain per-row Python — no pandas signature to rewrite —
    but inputs/outputs cross the boundary as Arrow record batches, so
    the serialization tax drops toward pandas-UDF levels while keeping
    row-function ergonomics.  The plan carries ArrowEvalPython (pinned
    in tests/test_plans.py), proving the Arrow path actually engaged
    rather than silently falling back to pickle."""
    li = T(spark, d, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey", "l_linenumber",
        _margin_arrow_udf("l_extendedprice", "l_discount").alias("margin"))


@register(
    "udtf_python_analyze",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS tok_0,
           string_split(text, ' ')[2] AS tok_1,
           string_split(text, ' ')[3] AS tok_2
    FROM documents
    """,
)
def udtf_python_analyze(spark, d):
    """POLYMORPHIC Python UDTF (Spark 3.5+ static ``analyze``): the
    output schema is computed AT PLAN TIME from the call's constant
    argument — split_k(text, 3) declares columns tok_0..tok_2, a
    different k would declare a different width.  This is the
    table-function analog of generics: one registration serves every
    arity, and Catalyst sees the concrete schema (so downstream pruning
    and codegen work normally).  eval stays a plain generator; NULL text
    yields NULL tokens to match SQL split semantics."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitK:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(k.value):
                st = st.add(f"tok_{i}", StringType())
            return AnalyzeResult(st)

        def eval(self, text: str, k: int):
            if text is None:
                yield tuple(None for _ in range(k))
                return
            parts = text.split(" ")
            yield tuple(parts[i] if i < len(parts) else None
                        for i in range(k))

    spark.udtf.register("split_k_udtf", udtf(SplitK))
    T(spark, d, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql("""
        SELECT d.doc_id, f.tok_0, f.tok_1, f.tok_2
        FROM docs_udtf d, LATERAL split_k_udtf(d.text, 3) f
    """)


@register(
    "udf_grouped_map_arrow",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def udf_grouped_map_arrow(spark, d):
    """Grouped map over RAW Arrow tables (Spark 4 ``applyInArrow``) —
    the zero-copy sibling of applyInPandas: each nation's customers
    arrive as one pyarrow.Table and the kernel runs pyarrow.compute
    (no pandas materialization, no index bookkeeping), the right shape
    when the per-group logic is itself columnar.  Money accumulates as
    integer cents (pc.round then sum over int64) so the total is
    order-independent and exact against the oracle — the
    udf_pandas_grouped_agg discipline carried to the Arrow API."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_nation(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("c_acctbal"), 100.0)),
                        pa.int64())
        return pa.table({
            "c_nationkey": pa.array([t.column("c_nationkey")[0].as_py()],
                                    pa.int32()),
            "n_customers": pa.array([t.num_rows], pa.int64()),
            "total_bal": pa.array([pc.sum(cents).as_py() / 100.0],
                                  pa.float64()),
        })

    c = T(spark, d, "customer").select("c_nationkey", "c_acctbal")
    return c.groupBy("c_nationkey").applyInArrow(
        per_nation, schema="c_nationkey int, n_customers bigint, "
                           "total_bal double")


@register(
    "udf_cogrouped_map_arrow",
    oracle="""
    WITH cc AS (SELECT c_nationkey AS k, count(*) AS nc
                FROM customer GROUP BY 1),
         sc AS (SELECT s_nationkey AS k, count(*) AS ns
                FROM supplier GROUP BY 1),
         keys AS (SELECT k FROM cc UNION SELECT k FROM sc)
    SELECT CAST(k AS INTEGER) AS n_nationkey,
           CAST(coalesce(nc, 0) AS BIGINT) AS n_customers,
           CAST(coalesce(ns, 0) AS BIGINT) AS n_suppliers
    FROM keys LEFT JOIN cc USING (k) LEFT JOIN sc USING (k)
    """,
)
def udf_cogrouped_map_arrow(spark, d):
    """Cogrouped map over RAW Arrow tables (Spark 4
    ``cogroup(...).applyInArrow``) — the last cell of the
    Python-execution matrix: both sides hash-partition on nationkey and
    each key's (customer-table, supplier-table) PAIR reaches one
    pyarrow function with no pandas materialization.  The kernel here
    counts each side (join-expressible on purpose: that is what makes
    it hash-checkable); the production shape is two-sided columnar
    reconciliation.  Count semantics mirror the oracle's LEFT-JOIN
    cross-count: a nation with customers but no suppliers (or vice
    versa) reports the present side's count and 0 for the other, and
    the cross-product inflation of a plain double LEFT JOIN is avoided
    on the oracle side by pre-deduping — the cogroup sees each side
    once, so its counts are the plain per-side cardinalities (the
    oracle pre-aggregates each side before joining — a naive double
    LEFT JOIN would cross-inflate customers by suppliers)."""
    import pyarrow as pa

    c = T(spark, d, "customer").select(
        F.col("c_nationkey").cast("int").alias("k"), "c_custkey")
    s = T(spark, d, "supplier").select(
        F.col("s_nationkey").cast("int").alias("k"), "s_suppkey")

    def both(left: pa.Table, right: pa.Table) -> pa.Table:
        key = (left.column("k")[0].as_py() if left.num_rows
               else right.column("k")[0].as_py())
        return pa.table({
            "n_nationkey": pa.array([key], pa.int32()),
            "n_customers": pa.array([left.num_rows], pa.int64()),
            "n_suppliers": pa.array([right.num_rows], pa.int64()),
        })

    return c.groupBy("k").cogroup(s.groupBy("k")).applyInArrow(
        both, schema="n_nationkey int, n_customers bigint, "
                     "n_suppliers bigint")


# Iterator variant declared at module scope for the same warm-up-identity
# reason as the scalar UDFs above.  The Iterator type hints are LOAD-
# BEARING: pandas_udf infers SQL_SCALAR_PANDAS_ITER_UDF from them —
# without hints the function is treated as Series->Series and the
# worker rejects the generator return.
@pandas_udf(LongType())
def _price_band_iter(it: "Iterator[pd.Series]") -> "Iterator[pd.Series]":
    """Iterator[pd.Series] -> Iterator[pd.Series]: the one-time block
    before the loop runs ONCE PER TASK, not once per Arrow batch — the
    production pattern for amortizing an expensive init (model /
    tokenizer / lookup load) across every batch the task processes.
    Here the 'expensive init' is a tiny cutoff array; the contract
    under test is the execution shape, not the payload."""
    import numpy as np

    cuts = np.array([100000.0, 300000.0])  # per-task init
    for prices in it:
        yield pd.Series(
            np.searchsorted(cuts, prices.to_numpy(), side="right") + 1
        ).astype("int64")


@register(
    "udf_pandas_iter",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE WHEN o_totalprice >= 300000 THEN 3
                     WHEN o_totalprice >= 100000 THEN 2
                     ELSE 1 END AS BIGINT) AS band
    FROM orders
    """,
)
def udf_pandas_iter(spark, d):
    """Iterator-of-Series pandas UDF (SQL_SCALAR_PANDAS_ITER_UDF): same
    Arrow batch transport as the scalar variant, but the Python
    function sees the WHOLE task's batch stream, so per-task setup
    happens once instead of per batch — at 100 TB with a real model in
    the init block this is the difference between loading it per ~10k
    rows and per task.  searchsorted(side='right') reproduces the
    closed-lower-bound CASE semantics exactly (>= at both cutoffs)."""
    o = T(spark, d, "orders")
    return o.select("o_orderkey",
                    _price_band_iter("o_totalprice").alias("band"))


class PerTypeSummary:
    """Per-partition (count, int-cents sum) summarizer for the
    TABLE-argument UDTF below — module-scope so the all-NULL-partition
    regression test pins THIS class, not a copy (r11 review).  An
    all-NULL partition must yield a NULL sum like SQL's SUM."""

    def __init__(self):
        self._key = None
        self._n = 0
        self._cents = 0
        self._nn = 0

    def eval(self, row):
        self._key = row["event_type"]
        self._n += 1
        v = row["value"]
        if v is not None:
            import math
            self._cents += int(math.floor(v * 100 + 0.5))
            self._nn += 1

    def terminate(self):
        yield self._key, self._n, (self._cents if self._nn else None)


@register(
    "udtf_table_argument",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY event_type
    """,
)
def udtf_table_argument(spark, d):
    """Python UDTF with a TABLE argument + PARTITION BY (Spark 4): the
    function consumes WHOLE ROWS of a relation instead of scalar
    columns, and PARTITION BY routes one UDTF instance per key — eval
    streams the partition's rows, terminate() emits its summary.  This
    is the API for per-group algorithms that don't fit an aggregate
    signature (sessionizers, sequence models, samplers); here a
    per-event-type (count, cents-sum) proves the lifecycle against the
    plain GROUP BY oracle.  Values sum as half-up-rounded INT cents —
    double addition is order-dependent and a partitioned UDTF gives no
    order guarantee, so only an integer sum is hash-stable.  An
    all-NULL partition yields NULL cents to match SQL SUM.

    Scale shape: PARTITION BY is one hash shuffle on the key (same as
    the aggregate it mirrors); the Python worker sees each partition as
    an Arrow row stream, state is one (count, sum) pair per instance —
    O(1) memory regardless of partition size."""
    from pyspark.sql.functions import udtf

    spark.udtf.register("per_type_summary_udtf", udtf(
        PerTypeSummary, returnType="event_type string, n bigint, cents bigint"))
    (T(spark, d, "events").select("event_type", "value")
     .createOrReplaceTempView("ev_tblarg"))
    return spark.sql("""
        SELECT event_type, n, cents
        FROM per_type_summary_udtf(TABLE(ev_tblarg) PARTITION BY event_type)
    """)
