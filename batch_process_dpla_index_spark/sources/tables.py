"""Fixture-table loaders (TESTDATA.md tables).

Mirrors the reference's scan surface (SURVEY.md §2.1 S1-S3) for the
driver-generated star schema. The only non-trivial piece: ``events.ts``
is stored as parquet TIMESTAMP(NANOS), which Spark's vectorized reader
rejects outright; with ``spark.sql.legacy.parquet.nanosAsLong=true`` it
arrives as a nanosecond long which we truncate to microseconds —
bit-identical to how DuckDB (and Arrow-µs consumers) read the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.session import tune

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

#: Small dimension tables — always broadcast-join these against fact tables.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


#: Per-path inferred-schema memo. Fixture parquet is immutable for the
#: life of a process (testdata dirs and per-test tmp paths are written
#: once), so the footer/schema-inference pass — ~0.2 s of driver-side
#: fixed overhead PER spark.read.parquet call, the dominant cost of
#: every sub-second query (r14 verdict: rolling_hash/scd2_history warm
#: pins) — only needs to run once per path. On a real cluster this is
#: the same contract as a metastore-backed table: the schema is known,
#: the scan doesn't re-infer it per query. The memo value carries the
#: path's mtime (one os.stat vs ~0.2 s of inference — free), so a
#: caller that rewrites a parquet at a previously-loaded path gets a
#: fresh inference instead of a silent stale-schema read (r16 ADVICE);
#: a Spark overwrite rewrites the directory entries, which bumps the
#: directory mtime. One entry per path (superseded generations are
#: replaced, not accumulated), so the memo is bounded by the distinct
#: paths a process touches.
_SCHEMA_CACHE: dict[str, tuple[float, object]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    tune(spark)
    path = f"{sf_dir}/{name}.parquet"
    try:
        mtime = os.stat(path).st_mtime
    except OSError:
        mtime = -1.0
    hit = _SCHEMA_CACHE.get(path)
    if hit is None or hit[0] != mtime:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = (mtime, df.schema)
    else:
        df = spark.read.schema(hit[1]).parquet(path)
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize every events-timestamp parquet encoding seen across
    driver rounds to plain TIMESTAMP (the verify-skill gotcha): shared
    by :func:`load_table` and any CLI path that reads a user-supplied
    events parquet directly."""
    ts_type = dict(df.dtypes).get(ts_col)
    if ts_type == "bigint":
        # nanos-as-long → µs truncation (integer div: the values ~1.7e18
        # do not survive a double round-trip).
        df = df.withColumn(
            ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)")
        )
    elif ts_type == "timestamp_ntz":
        # Un-annotated parquet µs timestamps infer as TIMESTAMP_NTZ on
        # PySpark 4.1 when the session was built before tune() could set
        # inferTimestampNTZ=false. The session TZ is pinned UTC, so the
        # cast is value-exact and restores unix_micros/withWatermark
        # compatibility.
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_tables(spark: SparkSession, sf_dir: str, suffix: str = "") -> list[str]:
    """Register every fixture table as a temp view (`<name><suffix>`) so
    callers can hit the engine through the SQL-string entry path — the
    reference's own MqReports shape (spark.sql over a registered view).
    Returns the view names."""
    names = []
    for name in TABLES:
        view = f"{name}{suffix}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names
