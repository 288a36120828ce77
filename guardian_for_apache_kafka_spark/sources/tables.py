"""Canonical loaders for the driver-provided parquet tables (TESTDATA.md).

One quirk: ``events.ts`` is a nanosecond parquet timestamp. With
``spark.sql.legacy.parquet.nanosAsLong=true`` Spark reads it as LongType epoch
nanos; the canonical loader converts to TimestampType (µs) with *integer*
division — ``ts DIV 1000`` — because a double-precision detour
(``cast(ts/1000 as long)``) would lose precision above 2^53 ns (~1970+104 days).
The source data is µs-granular (verified: sub-µs component is zero at every sf),
so the conversion is lossless.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Keyed by the live session OBJECT (weakly): an id()-keyed cache can hand a
# DataFrame bound to a dead JVM to a new session that reuses the address.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; events gets its ns->µs timestamp normalization.

    Memoized per (session, dir, table): ``spark.read.parquet`` performs file
    listing + footer schema reads on every call (~0.2 s of pure driver-side
    overhead per query at bench scale, and a real listing cost against object
    stores at 100 TB); reusing the immutable DataFrame handle matches what a
    catalog/temp-view deployment gets for free."""
    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    df = per_session.get(key)
    if df is not None:
        return df
    # The harness may hand us a vanilla session that lacks the engine
    # factory's confs (session.py). Both knobs are runtime-settable SQL confs;
    # guarded for Sparks that drop them.
    # - nanosAsLong: historical testdata generations stored events.ts as
    #   timestamp[ns]; without the knob the read throws PARQUET_TYPE_ILLEGAL
    #   before our ns->µs conversion can run.
    # - inferTimestampNTZ=false: current testdata stores naive timestamp[us]
    #   (isAdjustedToUTC=false), which Spark 3.4+ otherwise infers as
    #   TIMESTAMP_NTZ — a type DuckDB's naive TIMESTAMP oracle matches but
    #   half the LTZ-only time functions (unix_millis, window, ...) reject.
    #   Reading as plain TIMESTAMP under the UTC session keeps values
    #   byte-identical to the oracle AND keeps filter pushdown on the native
    #   column (a post-read cast would block parquet predicate pushdown).
    # - session.timeZone=UTC: with NTZ inference off, naive timestamp[us]
    #   columns load as TIMESTAMP_LTZ, so rendering/derivations (date_trunc,
    #   hour, casts) happen in the session zone; only UTC matches the naive
    #   DuckDB oracle. session.py's factory pins it; pin here too so a vanilla
    #   harness session gets the same semantics.
    # - nanosAsLong scope: TESTDATA confines ns timestamps to events.ts (the
    #   only column the loader re-normalizes below). A ns column appearing in
    #   another table would load as bigint rather than fail loudly — accepted,
    #   since the schema contract is fixed by the driver's generator.
    for conf_kv in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(*conf_kv)
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register all tables as temp views (names = table names) and return them."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
