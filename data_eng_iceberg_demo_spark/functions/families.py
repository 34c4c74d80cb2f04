"""B-fn queries (SURVEY.md §2): scalar function families — string,
datetime, math, array, map, JSON — each exercised over fixture columns.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; none of these fall back to Python at runtime.

Cross-engine discipline: integer-returning Spark functions (year, size, …)
cast to bigint (DuckDB's default); libm-computed doubles (ln, sqrt, pow)
rounded at 6 (1-ulp engine differences ≪ rounding step); events.ts handled
per the ns-vs-µs rule (SURVEY.md §5.3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..operators._util import T
from ..plans.registry import register


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substring(c_name, 10, 9) AS digits_part,
           length(c_name) AS name_len,
           c_mktsegment || ':' || c_name AS seg_name,
           trim('  ' || c_mktsegment || ' ') AS seg_trim,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
           string_split(c_name, '#')[2] AS name_num,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           replace(c_name, 'Customer', 'Cliente') AS name_pt,
           (c_mktsegment LIKE 'MACH%') AS is_mach
    FROM customer
    """,
)
def fn_string(spark, d):
    c = T(spark, d, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 10, 9).alias("digits_part"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat("c_mktsegment", F.lit(":"), "c_name").alias("seg_name"),
        F.trim(F.concat(F.lit("  "), "c_mktsegment", F.lit(" "))).alias("seg_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
        F.split("c_name", "#").getItem(1).alias("name_num"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cliente")).alias("name_pt"),
        F.col("c_mktsegment").like("MACH%").alias("is_mach"),
    )


@register(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mth,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS VARCHAR)
               AS month_start_s,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
               AS days_since_95,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS VARCHAR) AS due_s,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 YEAR AS VARCHAR) AS prior_year_s
    FROM orders
    """,
)
def fn_datetime(spark, d):
    """Datetime family incl. the reference's days() transform building
    block (README.md:304-307) and interval arithmetic (README.md:319 uses
    NOW() - INTERVAL; a fixed literal keeps the query deterministic)."""
    o = T(spark, d, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).cast("bigint").alias("yr"),
        F.month(od).cast("bigint").alias("mth"),
        F.dayofmonth(od).cast("bigint").alias("dom"),
        F.date_trunc("month", od).cast("string").alias("month_start_s"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint").alias("days_since_95"),
        F.date_add(od.cast("date"), 30).cast("timestamp").cast("string").alias("due_s"),
        F.add_months(od.cast("date"), -12).cast("timestamp").cast("string")
        .alias("prior_year_s"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 1) AS price_r1,
           abs(o_totalprice - 250000.0) AS dist_from_mid,
           CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(o_orderkey % 7 AS BIGINT) AS key_mod7,
           round(power(o_totalprice / 100000.0, 2), 6) AS pow2,
           round(ln(o_totalprice), 6) AS log_price,
           round(sqrt(o_totalprice), 6) AS sqrt_price,
           CAST(sign(o_totalprice - 250000.0) AS DOUBLE) AS side
    FROM orders
    """,
)
def fn_math(spark, d):
    o = T(spark, d, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(p, 1).alias("price_r1"),
        F.abs(p - 250000.0).alias("dist_from_mid"),
        F.ceil(p).cast("bigint").alias("price_ceil"),
        F.floor(p).cast("bigint").alias("price_floor"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.round(F.pow(p / 100000.0, 2), 6).alias("pow2"),
        F.round(F.log(p), 6).alias("log_price"),
        F.round(F.sqrt(p), 6).alias("sqrt_price"),
        F.signum(p - 250000.0).cast("double").alias("side"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) + 0 AS first_elem,
           round((SELECT sum(CAST(x AS DOUBLE)) FROM unnest(embedding) AS u(x)), 4) + 0
               AS vec_sum,
           -- NULL embedding => NULL count (a bare scalar-subquery
           -- count(*) would force 0 where Spark's size(filter(NULL))
           -- is NULL — caught by the r13 null-mirror widening)
           CASE WHEN embedding IS NULL THEN NULL
                ELSE CAST((SELECT count(*) FROM unnest(embedding) AS u(x)
                           WHERE x > 0) AS BIGINT) END AS n_positive,
           round((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 2.0)
                  FROM unnest(embedding) AS u(x)), 4) AS sum_sq_doubled,
           round(CAST(list_sort(embedding)[1] AS DOUBLE), 6) + 0 AS min_elem
    FROM embeddings
    """,
)
def fn_array(spark, d):
    """Array family incl. higher-order functions (transform / filter /
    aggregate) over the 64-dim embedding column."""
    e = T(spark, d, "embeddings")
    emb = F.col("embedding")
    dbl = emb.cast("array<double>")
    return e.select(
        "vec_id",
        F.size(emb).cast("bigint").alias("dim"),
        (F.round(F.element_at(emb, 1).cast("double"), 6) + F.lit(0.0)).alias("first_elem"),
        (F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4) + F.lit(0.0))
        .alias("vec_sum"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_positive"),
        F.round(
            F.aggregate(F.transform(dbl, lambda x: x * x * 2.0),
                        F.lit(0.0), lambda acc, x: acc + x), 4)
        .alias("sum_sq_doubled"),
        (F.round(F.element_at(F.sort_array(emb), 1).cast("double"), 6) + F.lit(0.0)).alias("min_elem"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id, 'type' AS k1, event_type AS v1,
           CAST(round(value, 2) AS VARCHAR) AS v2,
           CAST(2 AS BIGINT) AS n_keys
    FROM events
    """,
)
def fn_map(spark, d):
    """Map family: build a map column, then read it back out via
    map_keys/map_values/element_at (oracle checks the extracted values —
    DuckDB's MAP type does not round-trip through pandas comparably)."""
    e = T(spark, d, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("value"), F.round("value", 2).cast("string"),
    )
    return e.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("k1"),
        F.element_at(m, "type").alias("v1"),
        F.element_at(F.map_values(m), 2).alias("v2"),
        F.size(m).cast("bigint").alias("n_keys"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled
    FROM events
    """,
)
def fn_json(spark, d):
    """JSON family over the events.props JSON-string column
    (get_json_object / from_json)."""
    from pyspark.sql.types import LongType, StructField, StructType

    e = T(spark, d, "events")
    parsed = F.from_json("props", StructType([StructField("k", LongType())]))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_num"),
        (parsed.getField("k") * 2).alias("k_doubled"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey >> 4 AS BIGINT) AS shr4,
           CAST((o_orderkey & 15) << 2 AS BIGINT) AS shl2,
           CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def fn_bitwise(spark, d):
    """Bitwise family (and/or/xor/shifts/popcount) — the primitives the
    simhash/banding operators are built from, exposed as a query."""
    o = T(spark, d, "orders").filter(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("low_byte"),
        F.shiftright(k, 4).cast("bigint").alias("shr4"),
        F.shiftleft(k.bitwiseAND(F.lit(15)), 2).cast("bigint").alias("shl2"),
        k.bitwiseXOR(F.lit(21845)).cast("bigint").alias("xored"),
        F.bit_count(k).cast("bigint").alias("popcount"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           o_custkey AS cust_id,
           CAST(o_totalprice AS DOUBLE) AS price,
           o_orderpriority AS prio,
           CAST(o_custkey AS VARCHAR) || ':' ||
               CAST(round(CAST(o_totalprice AS DOUBLE), 2) AS VARCHAR)
               AS packed
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def fn_struct(spark, d):
    """Struct family: build a nested struct, read fields back out, and
    serialize it — nested types stay columnar (parquet stores struct
    fields as separate column chunks, so field access prunes)."""
    o = T(spark, d, "orders").filter(F.col("o_orderkey") < 500)
    s = F.struct(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderpriority").alias("prio"))
    packed = o.select("o_orderkey", s.alias("rec"))
    return packed.select(
        "o_orderkey",
        F.col("rec.cust_id").alias("cust_id"),
        F.col("rec.price").alias("price"),
        F.col("rec.prio").alias("prio"),
        F.concat(F.col("rec.cust_id").cast("string"), F.lit(":"),
                 F.round(F.col("rec.price"), 2).cast("string"))
        .alias("packed"),
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
               AS k_mod
    FROM events
    """,
)
def fn_variant(spark, d):
    """VARIANT semi-structured type (Spark 4): parse_json once into a
    binary variant column, then typed variant_get extraction — unlike
    from_json no full schema is declared and unlike get_json_object the
    parse cost is paid once per row, not per path.  The modern
    JSON-at-scale path."""
    e = T(spark, d, "events")
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
        (F.expr("variant_get(parse_json(props), '$.k', 'bigint')") % 10)
        .alias("k_mod"))


@register(
    "fn_hash",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS h_md5,
           sha256(p_name) AS h_sha256,
           CAST(length(md5(p_name)) AS INT) AS md5_len
    FROM part WHERE p_partkey <= 50
    """,
)
def fn_hash(spark, d):
    """Cryptographic digest family (md5 / sha2-256): hex output verified
    byte-identical across engines — the column-fingerprint primitives
    dedup and partition-routing hash on.  Pure codegen, narrow map."""
    p = T(spark, d, "part").filter(F.col("p_partkey") <= 50)
    return p.select(
        "p_partkey",
        F.md5(F.col("p_name").cast("binary")).alias("h_md5"),
        F.sha2(F.col("p_name").cast("binary"), 256).alias("h_sha256"),
        F.length(F.md5(F.col("p_name").cast("binary"))).cast("int")
        .alias("md5_len"))


@register(
    "fn_xml",
    oracle="""
    SELECT c_custkey,
           '<cust><k>' || CAST(c_custkey AS VARCHAR) || '</k><seg>'
               || c_mktsegment || '</seg><bal>'
               || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
               || '</bal></cust>' AS xml_doc,
           CAST(c_custkey AS BIGINT) AS parsed_key,
           c_mktsegment AS parsed_seg,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS parsed_bal
    FROM customer
    WHERE c_custkey <= 100
    """,
)
def fn_xml(spark, d):
    """XML family (Spark 4 ``from_xml``): serialize fixture columns into
    an XML document, parse it back with an explicit schema, and emit the
    round-tripped fields.  The oracle reproduces the serialized string
    and takes the field values straight from the source columns, so the
    parse must be an exact inverse of the build — proving real XML
    parsing without needing XML support in the oracle engine."""
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    c = T(spark, d, "customer").filter(F.col("c_custkey") <= 100)
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    xml = F.concat(
        F.lit("<cust><k>"), F.col("c_custkey").cast("string"),
        F.lit("</k><seg>"), F.col("c_mktsegment"),
        F.lit("</seg><bal>"), bal.cast("string"),
        F.lit("</bal></cust>"))
    schema = StructType([
        StructField("k", LongType()),
        StructField("seg", StringType()),
        StructField("bal", DoubleType()),
    ])
    parsed = F.from_xml(xml, schema)
    return c.select(
        "c_custkey",
        xml.alias("xml_doc"),
        parsed.getField("k").alias("parsed_key"),
        parsed.getField("seg").alias("parsed_seg"),
        parsed.getField("bal").alias("parsed_bal"))


@register(
    "fn_url",
    oracle="""
    SELECT o_orderkey,
           'https://shop.example.com/orders/' || CAST(o_orderkey AS VARCHAR)
               || '?priority=' || replace(o_orderpriority, ' ', '+')
               || '&status=' || o_orderstatus AS url,
           'shop.example.com' AS host,
           '/orders/' || CAST(o_orderkey AS VARCHAR) AS path,
           'priority=' || replace(o_orderpriority, ' ', '+')
               || '&status=' || o_orderstatus AS query,
           o_orderpriority AS priority_param
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def fn_url(spark, d):
    """URL family (parse_url + url_encode): build a URL from fixture
    columns, then extract HOST/PATH/QUERY and a single query parameter
    back out.  parse_url's parameter extraction must also DECODE the
    form-encoded ('+' for space) priority — the oracle takes it from the
    source column, so an encode/decode asymmetry fails the hash."""
    o = T(spark, d, "orders").filter(F.col("o_orderkey") <= 500)
    url = F.concat(
        F.lit("https://shop.example.com/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?priority="), F.url_encode("o_orderpriority"),
        F.lit("&status="), F.col("o_orderstatus"))
    return o.select(
        "o_orderkey",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.url_decode(F.parse_url(url, F.lit("QUERY"), F.lit("priority")))
         .alias("priority_param"))


@register(
    "fn_collation",
    oracle="""
    WITH variants AS (
        SELECT c_mktsegment AS s FROM customer
        UNION ALL SELECT lower(c_mktsegment) FROM customer
        UNION ALL SELECT upper(substr(c_mktsegment, 1, 1))
                  || lower(substr(c_mktsegment, 2)) FROM customer
    )
    SELECT lower(s) AS segment_ci,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT s) AS BIGINT) AS n_spellings
    FROM variants
    GROUP BY 1
    """,
)
def fn_collation(spark, d):
    """String collations (Spark 4): grouping under the UTF8_LCASE
    collation merges case-variant spellings without rewriting the data
    to a canonical case.  Three case variants of every segment are
    generated (original / lower / initcap); the collated group-by must
    count all of them together, while the binary-collation DISTINCT
    inside still sees each spelling.  The emitted label is lowercased
    because a collated group's representative value is
    first-seen-nondeterministic — the label must not leak it."""
    c = T(spark, d, "customer")
    variants = (c.select(F.col("c_mktsegment").alias("s"))
                .unionAll(c.select(F.lower("c_mktsegment").alias("s")))
                .unionAll(c.select(F.initcap(F.lower("c_mktsegment"))
                                   .alias("s"))))
    return (variants
            .groupBy(F.collate("s", "UTF8_LCASE").alias("sc"))
            .agg(F.count("*").alias("n"),
                 F.count_distinct("s").alias("n_spellings"))
            .select(F.lower("sc").alias("segment_ci"), "n", "n_spellings"))


@register(
    "fn_try_family",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / NULLIF(o_custkey % 3, 0) AS safe_div,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit,
           string_split(o_orderpriority, '-')[9] AS oob_element
    FROM orders WHERE o_orderkey <= 500
    """,
)
def fn_try_family(spark, d):
    """ANSI-safe try_* family (Spark 3.4+): under ANSI mode a bad cast,
    a division by zero or an out-of-bounds index ABORTS the query — the
    try_ variants return NULL instead, which is what a pipeline over
    dirty data at 100 TB needs (fail the ROW, not the job; see the
    null-injection sweep, which caught exactly these crash classes).
    try_divide(x, 0) -> NULL, try_cast('1-URGENT' as bigint) -> NULL,
    a leading-digit try_cast that succeeds, try_element_at past the end
    -> NULL.  DuckDB mirrors with TRY_CAST / NULLIF division / its
    NULL-on-out-of-range list indexing."""
    o = T(spark, d, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.try_divide("o_totalprice", F.col("o_custkey") % 3).alias("safe_div"),
        F.expr("try_cast(o_orderpriority AS BIGINT)").alias("bad_cast"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)")
         .alias("prio_digit"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(9))
         .alias("oob_element"))


@register(
    "fn_aes_roundtrip",
    oracle="""
    SELECT c_custkey, c_name AS plain,
           TRUE AS rt_ok, TRUE AS wrong_key_null,
           CAST(length(c_name) - length(c_name) % 16 + 16 AS BIGINT)
               AS ct_len
    FROM customer WHERE c_custkey <= 200
    """,
)
def fn_aes_roundtrip(spark, d):
    """Column-level encryption family (Spark 3.3+ aes_encrypt /
    aes_decrypt / try_aes_decrypt): encrypt a column, decrypt it back,
    and prove the invariants the oracle can state without doing crypto —
    the decrypt is an exact inverse (rt_ok), a WRONG key yields NULL via
    try_aes_decrypt instead of aborting the job (the try_* dirty-data
    discipline), and the ECB/PKCS ciphertext length is the closed-form
    len - len%16 + 16.  ECB is used because it is DETERMINISTIC — GCM's
    random IV would make every run's ciphertext differ (fine for real
    pipelines, fatal for a replayable oracle); this is a determinism
    choice, not crypto advice.  All JVM codegen, narrow map, no
    shuffle."""
    c = T(spark, d, "customer").filter(F.col("c_custkey") <= 200)
    ct = F.expr("aes_encrypt(c_name, '0123456789abcdef', 'ECB')")
    return c.select(
        "c_custkey",
        F.col("c_name").alias("plain"),
        (F.expr("cast(aes_decrypt(aes_encrypt(c_name, '0123456789abcdef', "
                "'ECB'), '0123456789abcdef', 'ECB') AS STRING)")
         == F.col("c_name")).alias("rt_ok"),
        F.expr("try_aes_decrypt(aes_encrypt(c_name, '0123456789abcdef', "
               "'ECB'), 'fedcba9876543210', 'ECB')").isNull()
         .alias("wrong_key_null"),
        F.length(ct).cast("bigint").alias("ct_len"))


@register(
    "fn_higher_order",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               list_sort(list(CAST(l_quantity AS DOUBLE))) AS qs
        FROM lineitem
        WHERE l_quantity IS NOT NULL
        GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           round(list_sum(qs), 4) AS total_qty,
           CAST(len(list_filter(qs, x -> x >= 25)) AS BIGINT) AS n_bulk,
           len(list_filter(qs, x -> x >= 49)) > 0 AS has_huge,
           len(list_filter(qs, x -> NOT (x > 0))) = 0 AS all_positive,
           round(list_sum(list_transform(list_zip(qs, list_reverse(qs)),
                                         p -> p[1] * p[2])), 4)
               AS palindrome_dot,
           round(list_max(list_transform(qs, x -> x * x)), 4) AS max_sq
    FROM per_order
    """,
)
def fn_higher_order(spark, d):
    """Higher-order array function family as a first-class demo —
    lambda expressions over array columns, the JVM-side alternative to
    a Python UDF for per-row collection logic: aggregate (fold),
    filter, exists, forall, zip_with and transform, each mapped 1:1 to
    a DuckDB list_* form in the oracle.  Every lambda runs inside
    codegen on the sorted per-order quantity array; sums fold in array
    order on BOTH engines (the array is sorted first, so the fold
    order — and therefore the float result — is engine-identical;
    quantities are small integers in doubles anyway).  Narrow after
    one groupBy: the collect_list and all six lambdas ride a single
    shuffle."""
    # NULL quantities filtered BEFORE the group on both sides: Spark's
    # collect_list skips NULLs (empty array -> fold yields 0.0) while
    # DuckDB's list() keeps them (list_sum -> NULL) — without the
    # guard an all-NULL group diverges (r10 TPC-H null-mirror finding)
    qs = (T(spark, d, "lineitem")
          .filter(F.col("l_quantity").isNotNull())
          .groupBy("l_orderkey")
          .agg(F.sort_array(F.collect_list(
              F.col("l_quantity").cast("double"))).alias("qs")))
    return qs.select(
        "l_orderkey",
        F.round(F.aggregate("qs", F.lit(0.0), lambda a, x: a + x), 4)
        .alias("total_qty"),
        F.size(F.filter("qs", lambda x: x >= 25)).cast("bigint")
        .alias("n_bulk"),
        F.exists("qs", lambda x: x >= 49).alias("has_huge"),
        F.forall("qs", lambda x: x > 0).alias("all_positive"),
        F.round(F.aggregate(
            F.zip_with("qs", F.reverse("qs"), lambda a, b: a * b),
            F.lit(0.0), lambda a, x: a + x), 4).alias("palindrome_dot"),
        F.round(F.array_max(F.transform("qs", lambda x: x * x)), 4)
        .alias("max_sq"))


@register(
    "fn_regexp",
    oracle="""
    SELECT doc_id,
           coalesce(nullif(regexp_extract(text, '[0-9]+'), ''), '-')
               AS first_num,
           CAST(len(regexp_extract_all(
               translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                               'abcdefghijklmnopqrstuvwxyz'),
               '[a-z]+')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
               AS n_digits,
           substring(regexp_replace(text, '[0-9]', '#', 'g'), 1, 30)
               AS masked_head,
           regexp_matches(text, '^[A-Z]') AS starts_upper
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def fn_regexp(spark, d):
    """Regexp function family — extract / extract_all / count / replace /
    rlike — over document text.  Patterns are kept to the POSIX-class
    subset where Java regex (Spark) and RE2 (DuckDB) agree; no-match
    extract normalizes through nullif+coalesce because Spark returns ''
    where other engines return NULL (divergence catalog §5.2).  Casing
    uses translate('A-Z','a-z'), never lower(): Unicode case edges
    (U+0130) differ between engines inside hashed outputs.  All five run
    as codegen'd JVM expressions in one projection — a single scan pass,
    no Python."""
    t = T(spark, d, "documents").filter(F.col("text").isNotNull())
    lowered = F.translate("text", "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                          "abcdefghijklmnopqrstuvwxyz")
    return t.select(
        "doc_id",
        F.coalesce(F.nullif(F.regexp_extract("text", "[0-9]+", 0),
                            F.lit("")), F.lit("-")).alias("first_num"),
        F.size(F.regexp_extract_all(lowered, F.lit("[a-z]+"), F.lit(0)))
        .cast("bigint").alias("n_words"),
        F.regexp_count("text", F.lit("[0-9]")).cast("bigint")
        .alias("n_digits"),
        F.substring(F.regexp_replace("text", "[0-9]", "#"), 1, 30)
        .alias("masked_head"),
        F.col("text").rlike("^[A-Z]").alias("starts_upper"),
    )


@register(
    "fn_generators",
    oracle="""
    WITH base AS (
        SELECT n_nationkey, n_regionkey,
               CASE WHEN n_nationkey % 7 = 0 THEN NULL
                    ELSE [n_regionkey, n_nationkey % 5] END AS arr
        FROM nation
    )
    SELECT n_nationkey, 'posexplode' AS gen, CAST(i - 1 AS BIGINT) AS pos,
           CAST(NULL AS VARCHAR) AS k, CAST(arr[i] AS BIGINT) AS val
    FROM base, unnest(generate_series(1, len(arr))) s(i)
    UNION ALL
    SELECT n_nationkey, 'posexplode', NULL, NULL, NULL
    FROM base WHERE arr IS NULL
    UNION ALL
    SELECT n_nationkey, 'inline', NULL, 'reg', CAST(n_regionkey AS BIGINT)
    FROM base
    UNION ALL
    SELECT n_nationkey, 'inline', NULL, 'mod',
           CAST(n_nationkey % 3 AS BIGINT)
    FROM base
    UNION ALL
    SELECT n_nationkey, 'stack', NULL, 'a', CAST(n_nationkey AS BIGINT)
    FROM base
    UNION ALL
    SELECT n_nationkey, 'stack', NULL, 'b', CAST(n_regionkey AS BIGINT)
    FROM base
    """,
)
def fn_generators(spark, d):
    """Generator (table-valued projection) function family (r12 — the
    last uncovered fn family): posexplode_outer over a NULLABLE array
    (the _outer contract: a NULL array still yields one row, with NULL
    pos/val — plain posexplode silently drops the parent row, the
    classic lost-rows bug), inline over an array of structs (struct
    fields become columns), and stack (the n-column -> k-row transpose
    generator).  All three flatten into one tall (gen, pos, k, val)
    frame so the hash pins each generator's row multiplicity AND null
    semantics.

    Scale shape: generators are narrow per-row fan-outs inside
    whole-stage codegen — no shuffle at any size; the union of three
    projections reads the 25-row dim thrice (a 100 TB fan-out would
    fuse them into one pass per source scan)."""
    n = T(spark, d, "nation").select("n_nationkey", "n_regionkey")
    nk, rk = F.col("n_nationkey"), F.col("n_regionkey")
    arr = F.when(nk % 7 == 0, F.lit(None).cast("array<bigint>")) \
        .otherwise(F.array(rk.cast("bigint"), (nk % 5).cast("bigint")))
    sn = F.lit(None).cast("string")
    bn = F.lit(None).cast("bigint")
    a1 = (n.select("n_nationkey", F.posexplode_outer(arr))
          .select("n_nationkey", F.lit("posexplode").alias("gen"),
                  F.col("pos").cast("bigint").alias("pos"),
                  sn.alias("k"), F.col("col").cast("bigint").alias("val")))
    structs = F.array(
        F.struct(F.lit("reg").alias("k"), rk.cast("bigint").alias("v")),
        F.struct(F.lit("mod").alias("k"), (nk % 3).cast("bigint").alias("v")))
    a2 = (n.select("n_nationkey", F.inline(structs))
          .select("n_nationkey", F.lit("inline").alias("gen"),
                  bn.alias("pos"), F.col("k"), F.col("v").alias("val")))
    a3 = (n.selectExpr(
        "n_nationkey",
        "stack(2, 'a', CAST(n_nationkey AS BIGINT), "
        "'b', CAST(n_regionkey AS BIGINT)) AS (k, val)")
        .select("n_nationkey", F.lit("stack").alias("gen"),
                bn.alias("pos"), "k", "val"))
    return a1.unionByName(a2).unionByName(a3)


@register(
    "fn_geo_haversine",
    oracle="""
    WITH pts AS (
        SELECT n_name,
               (CAST(concat('0x', substring(md5(n_name || 'lat'), 1, 8))
                     AS BIGINT) % 140000) / 1000.0 - 70.0 AS lat,
               (CAST(concat('0x', substring(md5(n_name || 'lon'), 1, 8))
                     AS BIGINT) % 360000) / 1000.0 - 180.0 AS lon
        FROM nation
    ), pairs AS (
        SELECT a.n_name AS name_a, b.n_name AS name_b,
               round(2 * 6371.0 * asin(sqrt(
                   pow(sin(radians(b.lat - a.lat) / 2), 2)
                   + cos(radians(a.lat)) * cos(radians(b.lat))
                     * pow(sin(radians(b.lon - a.lon) / 2), 2))), 1)
                   AS dist_km
        FROM pts a JOIN pts b ON a.n_name < b.n_name
    ), ranked AS (
        SELECT name_a, name_b, dist_km,
               row_number() OVER (ORDER BY dist_km, name_a, name_b) AS r
        FROM pairs
    )
    SELECT name_a, name_b, dist_km + 0 AS dist_km FROM ranked
    WHERE r <= 20
    """,
)
def fn_geo_haversine(spark, d):
    """Geo function family (r12): great-circle (haversine) distance —
    the building block of every geo join/dedup — over md5-derived
    nation centroids (deterministic lat in [-70,70), lon in [-180,180),
    replayable on any engine), reporting the 20 closest country pairs.
    The formula composes radians/sin/cos/asin/sqrt/pow — all IEEE libm
    on both engines; distances are ~10^3 km so the 0.1 km rounding
    guard dwarfs any last-ulp drift.  The pair ranking carries a
    (dist, name, name) tiebreak so the top-20 cut is total.

    Scale shape: the dimension is tiny so the pair join broadcasts;
    point-corpus geo joins at 100 TB take the join_spatial_grid
    cell-bucketed plan with this same distance as the exact verify."""
    pts = T(spark, d, "nation").select(
        "n_name",
        ((F.conv(F.substring(F.md5(F.concat(F.col("n_name"), F.lit("lat"))),
                             1, 8), 16, 10).cast("bigint") % 140000)
         / 1000.0 - 70.0).alias("lat"),
        ((F.conv(F.substring(F.md5(F.concat(F.col("n_name"), F.lit("lon"))),
                             1, 8), 16, 10).cast("bigint") % 360000)
         / 1000.0 - 180.0).alias("lon"))
    a = pts.select(F.col("n_name").alias("name_a"),
                   F.col("lat").alias("lat_a"), F.col("lon").alias("lon_a"))
    b = pts.select(F.col("n_name").alias("name_b"),
                   F.col("lat").alias("lat_b"), F.col("lon").alias("lon_b"))
    hav = (F.pow(F.sin(F.radians(F.col("lat_b") - F.col("lat_a")) / 2), 2)
           + F.cos(F.radians("lat_a")) * F.cos(F.radians("lat_b"))
           * F.pow(F.sin(F.radians(F.col("lon_b") - F.col("lon_a")) / 2), 2))
    pairs = (a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
             .select("name_a", "name_b",
                     F.round(2 * 6371.0 * F.asin(F.sqrt(hav)), 1)
                     .alias("dist_km")))
    ranked = pairs.withColumn(
        "r", F.row_number().over(
            Window.orderBy("dist_km", "name_a", "name_b")))
    return (ranked.filter(F.col("r") <= 20)
            .select("name_a", "name_b",
                    (F.col("dist_km") + F.lit(0.0)).alias("dist_km")))


@register(
    "fn_uuid_deterministic",
    oracle="""
    WITH h AS (
        SELECT o_orderkey,
               md5('orders.icelite:' || CAST(o_orderkey AS VARCHAR)) AS x
        FROM orders
    ), u AS (
        SELECT o_orderkey,
               substring(x, 1, 8) || '-' || substring(x, 9, 4) || '-3'
               || substring(x, 14, 3) || '-'
               || CASE CAST(concat('0x', substring(x, 17, 1)) AS BIGINT) % 4
                      WHEN 0 THEN '8' WHEN 1 THEN '9'
                      WHEN 2 THEN 'a' ELSE 'b' END
               || substring(x, 18, 3) || '-' || substring(x, 21, 12)
                   AS uuid
        FROM h
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT uuid) AS BIGINT) AS n_distinct,
           min(uuid) AS min_uuid, max(uuid) AS max_uuid,
           CAST(count(*) FILTER (substring(uuid, 15, 1) = '3'
                                 AND substring(uuid, 20, 1)
                                     IN ('8', '9', 'a', 'b'))
                AS BIGINT) AS rfc_layout_ok
    FROM u
    """,
)
def fn_uuid_deterministic(spark, d):
    """Deterministic surrogate-key UUIDs (r12; the name-based UUIDv3
    construction of RFC 4122 §4.3 over a string namespace): md5 of
    ``namespace:natural_key`` laid out 8-4-4-4-12 with the version
    nibble forced to 3 and the variant nibble to 10xx — the stable-ID
    minting every warehouse needs when joining re-ingested feeds (same
    input, same UUID, on ANY engine; rand-based uuid() cannot give
    that).  The query proves the three contract properties under one
    hash: injectivity on the fixture (n == n_distinct), determinism
    (min/max of the generated set), and the RFC bit layout
    (version/variant positions).

    Scale shape: a narrow map in whole-stage codegen plus one
    groupBy-less reduce — key minting is scan-speed."""
    h = T(spark, d, "orders").select(
        "o_orderkey",
        F.md5(F.concat(F.lit("orders.icelite:"),
                       F.col("o_orderkey").cast("string"))).alias("x"))
    var_digit = (F.when(F.conv(F.substring("x", 17, 1), 16, 10)
                        .cast("bigint") % 4 == 0, "8")
                 .when(F.conv(F.substring("x", 17, 1), 16, 10)
                       .cast("bigint") % 4 == 1, "9")
                 .when(F.conv(F.substring("x", 17, 1), 16, 10)
                       .cast("bigint") % 4 == 2, "a")
                 .otherwise("b"))
    u = h.select(F.concat(
        F.substring("x", 1, 8), F.lit("-"), F.substring("x", 9, 4),
        F.lit("-3"), F.substring("x", 14, 3), F.lit("-"), var_digit,
        F.substring("x", 18, 3), F.lit("-"), F.substring("x", 21, 12))
        .alias("uuid"))
    return u.agg(
        F.count("*").alias("n"),
        F.count_distinct("uuid").alias("n_distinct"),
        F.min("uuid").alias("min_uuid"), F.max("uuid").alias("max_uuid"),
        F.count(F.when((F.substring("uuid", 15, 1) == "3")
                       & F.substring("uuid", 20, 1).isin("8", "9", "a", "b"),
                       1)).alias("rfc_layout_ok"))


@register(
    "fn_ip_cidr",
    oracle="""
    WITH ip AS (
        SELECT c_custkey AS k,
               CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)
                    || ':ip'), 1, 8)) AS BIGINT) % 4294967296 AS ip_int
        FROM customer
    ), parts AS (
        SELECT k, ip_int,
               CAST(ip_int // 16777216 AS VARCHAR) || '.'
               || CAST((ip_int // 65536) % 256 AS VARCHAR) || '.'
               || CAST((ip_int // 256) % 256 AS VARCHAR) || '.'
               || CAST(ip_int % 256 AS VARCHAR) AS dotted
        FROM ip
    )
    SELECT k, dotted,
           ip_int // 1048576 = (10 * 16777216) // 1048576 AS in_10_slash_12,
           ip_int // 16777216 = 10 AS in_10_slash_8,
           CAST(ip_int // 2147483648 AS BIGINT) = 1 AS high_half
    FROM parts
    """,
)
def fn_ip_cidr(spark, d):
    """IP address family (r12): dotted-quad rendering and CIDR
    membership over md5-derived 32-bit addresses — the
    network-partitioning functions access-log pipelines need (Spark
    ships no inet type; integer arithmetic IS the implementation, and
    the same prefix shift works as a join/partition key at any scale).
    Membership in a /N block is one integer division: ip >> (32-N)
    compared against the block's prefix — replayed with identical
    semantics on both engines since all values are exact ints.

    Scale shape: pure narrow map in codegen; CIDR prefixes used as
    equi-join keys give block-local joins for free."""
    ip = T(spark, d, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.conv(F.substring(F.md5(F.concat(
            F.col("c_custkey").cast("string"), F.lit(":ip"))), 1, 8),
            16, 10).cast("bigint") % 4294967296).alias("ip_int"))
    dotted = F.concat_ws(
        ".",
        F.expr("ip_int div 16777216").cast("string"),
        F.expr("(ip_int div 65536) % 256").cast("string"),
        F.expr("(ip_int div 256) % 256").cast("string"),
        (F.col("ip_int") % 256).cast("string"))
    return ip.select(
        "k", dotted.alias("dotted"),
        (F.expr("ip_int div 1048576")
         == (10 * 16777216) // 1048576).alias("in_10_slash_12"),
        F.expr("ip_int div 16777216 = 10").alias("in_10_slash_8"),
        (F.expr("ip_int div 2147483648").cast("bigint") == 1)
        .alias("high_half"))
