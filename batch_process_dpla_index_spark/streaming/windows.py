"""Time-window operators over event streams — batch and streaming forms.

The reference is batch-only (SURVEY.md §2.11); the extension surface
adds tumbling / sliding / session windows that run identically as a
batch aggregation (F.window / F.session_window over a static frame)
and as a Structured Streaming query (readStream + withWatermark).
Batch semantics are the oracle-verified ones; the streaming wrappers
reuse the same aggregation builders so the two can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame, ts_col: str, duration: str, group_cols: list[str], aggs: list
) -> DataFrame:
    return events.groupBy(F.window(ts_col, duration).alias("win"), *group_cols).agg(*aggs)


def sliding_agg(
    events: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list,
) -> DataFrame:
    return events.groupBy(
        F.window(ts_col, duration, slide).alias("win"), *group_cols
    ).agg(*aggs)


def session_agg(
    events: DataFrame, ts_col: str, gap: str, group_cols: list[str], aggs: list
) -> DataFrame:
    """Session windows: events closer than ``gap`` merge into one session.
    An event exactly ``gap`` after its predecessor starts a NEW session
    (session end bound is exclusive) — the SQL-oracle equivalent is a
    gaps-and-islands scan with `diff >= gap` as the boundary."""
    return events.groupBy(
        F.session_window(ts_col, gap).alias("win"), *group_cols
    ).agg(*aggs)


def streaming_tumbling_counts(
    spark,
    source_path: str,
    schema,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
):
    """Structured Streaming variant: file source → watermark → tumbling
    count. Returns the streaming DataFrame (caller starts the sink).
    Late rows beyond the watermark are dropped; state is bounded by
    (windows in watermark horizon × groups)."""
    stream = spark.readStream.schema(schema).parquet(source_path)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration).alias("win"), *(group_cols or []))
        .agg(F.count("*").alias("n_events"))
    )
