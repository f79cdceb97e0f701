"""Schema registry + table loaders.

Explicit ``StructType`` declarations for every table the engine touches
(SURVEY.md §1.3: the reference declares its sink schema via a SQLAlchemy
model, scrap_tokopedia.py:80-91; upstream extraction is schema-on-read —
we make both explicit and checked).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Small driver-side table as a DataFrame via the Arrow/pandas path.

    ``createDataFrame(list, ...)`` produces a Python-RDD-backed scan that
    re-pays a Python worker round-trip per partition on EVERY job; the
    pandas route with Arrow yields a JVM-side ``LocalTableScan``
    (one-time Arrow transfer, ~35x faster per action on local[32]).
    Arrow conversion is OFF by default in a plain session, so it is
    force-enabled just for the conversion — the resulting LocalTableScan
    holds its rows eagerly, so restoring the conf afterwards is safe.
    ``schema`` is a DDL string like ``"id int, name string"``."""
    names = [c.strip().split()[0] for c in schema.split(",")]
    pdf = pd.DataFrame([list(r) for r in rows], columns=names, dtype=object)
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        return spark.createDataFrame(pdf, schema)
    finally:
        spark.conf.set(key, prev)

# ---------------------------------------------------------------------------
# The reference's one persisted table: main.tr_raw_scrap_data
# (scrap_tokopedia.py:80-91; semantics table in FIXTURES.md §A1)
# ---------------------------------------------------------------------------
RAW_SCRAP_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), True),            # sink-generated
    T.StructField("name", T.StringType(), False),       # required (drop row if absent)
    T.StructField("detail", T.StringType(), True),
    T.StructField("price", T.LongType(), False),        # Rupiah integer
    T.StructField("originalprice", T.LongType(), True),
    T.StructField("discountpercentage", T.DoubleType(), True),  # fraction in [0,1]
    T.StructField("platform", T.StringType(), False),
    T.StructField("createdate", T.DateType(), False),
])

# Intermediate scrape-pipeline rows (SURVEY.md §3.2/3.3): one fetched page.
FETCHED_PAGE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("status", T.IntegerType(), True),
    T.StructField("html", T.StringType(), True),
    T.StructField("fetcher", T.StringType(), True),     # which source produced it
])

# Extracted product struct (pre-validation; nullable everywhere so the
# quarantine split can decide, SURVEY.md §2.7 F6).
PRODUCT_STRUCT = T.StructType([
    T.StructField("name", T.StringType(), True),
    T.StructField("detail", T.StringType(), True),
    T.StructField("price", T.LongType(), True),
    T.StructField("originalprice", T.LongType(), True),
    T.StructField("discountpercentage", T.DoubleType(), True),
])

# ---------------------------------------------------------------------------
# Driver test tables (/root/testdata/sf*/; FIXTURES.md §B)
# ---------------------------------------------------------------------------
TEST_TABLES: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Plain ``spark.read.parquet`` so Catalyst keeps
    full pushdown/pruning freedom; schemas above are the declared contract
    and are asserted in tests, not forced onto the scan.

    ``events.ts`` has shipped in two physical encodings across testdata
    generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    unless read as raw nanos via legacy nanosAsLong, then floor-divided
    to µs — the same truncation DuckDB applies narrowing ns to its
    native µs) and plain µs with isAdjustedToUTC=false (which Spark 4
    infers as TIMESTAMP_NTZ — a type ANSI cast refuses to turn into
    epoch seconds). Normalize both to session-local TIMESTAMP (the
    session is pinned UTC) so every downstream ``ts.cast('long')`` is
    the same epoch-seconds DuckDB's ``epoch(ts)`` yields on the naive
    value."""
    if name == "events":
        from pyspark.sql import functions as F
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # NANOS generation, read as raw nanos: truncate to µs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dict(df.dtypes).get("ts") == "timestamp_ntz":
            # µs-NTZ generation: reinterpret the naive value as UTC —
            # with the session pinned to UTC this matches DuckDB's
            # naive-timestamp arithmetic bit for bit, and downstream
            # ts.cast('long') (illegal on NTZ under ANSI) works.
            df = df.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TEST_TABLES}
