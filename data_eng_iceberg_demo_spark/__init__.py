"""PySpark-native analytics engine with the capabilities of
``infobarbosa/data-eng-iceberg-demo`` (reference: /root/reference/README.md),
plus LLM-data-pipeline operators, built Spark-first for 100 TB scale.

Layout:
    session.py    -- SparkSession factory (local test config; cluster-safe)
    sources/      -- parquet/csv/json readers
    operators/    -- relational/join/agg/window/sort/set/LLM query definitions
    functions/    -- scalar-function families and the UDF/UDAF/UDTF surface
    streaming/    -- event-time windowing + streaming micro-harness
    tables/       -- "icelite": Parquet-backed snapshot/metadata table layer
                     (time travel, history, schema evolution, partitioning,
                     compaction, retention -- reference README.md:223-328)
    plans/        -- query registry binding names -> (Spark callable, oracle SQL)
"""

__version__ = "0.1.0"
