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


def streaming_session_agg(
    spark,
    source_path: str,
    schema,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
    max_files_per_trigger: int | None = None,
):
    """Structured Streaming session windows — the stream twin of
    `session_agg` (the batch form behind the oracle-verified
    `user_sessions` registry query): file source → optional watermark
    → the SAME ``F.session_window`` aggregation builder, so the two
    forms cannot drift.

    Sessions MERGE in the state store across micro-batches: two
    events ``gap``-close always land in one session no matter how the
    trigger boundaries split them (``max_files_per_trigger=1`` in the
    convergence test forces exactly that). In production append mode
    the ``watermark`` bounds state — a session finalizes and evicts
    once the watermark passes its close; the complete-mode convergence
    test passes ``watermark=None`` because complete retains all
    session state by definition and the drained memory-sink table
    must equal the batch aggregation row-for-row."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    return session_agg(
        stream,
        ts_col,
        gap,
        group_cols or [],
        aggs or [F.count("*").alias("n_events")],
    )


def run_stream_to_batch(sdf, query_name: str, output_mode: str = "complete"):
    """Run a streaming DataFrame to completion over the currently
    available data (Trigger.AvailableNow) into a memory sink and return
    the result as a BATCH DataFrame.

    This is how the engine oracle-verifies streaming semantics: the
    same aggregation builders produce the batch plan (DuckDB-checked)
    and the streaming plan (checked here to converge to identical
    results once the source drains).
    """
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(query_name)


def streaming_dedup(stream, id_cols: list[str], ts_col: str, watermark: str):
    """Streaming exact dedup: watermark-bounded dropDuplicates — the
    state store retains one entry per key only within the watermark
    horizon (the 100 TB streaming path for exact_dedup)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(id_cols)


def streaming_dedup_within_watermark(
    stream, id_cols: list[str], ts_col: str, watermark: str
):
    """Bounded-state dedup for at-least-once sources whose RETRIES can
    carry different event times (redelivery re-stamps ``ts``): plain
    ``dropDuplicates`` only guarantees state eviction when the event
    time is part of the key, but then re-stamped retries aren't
    duplicates anymore. ``dropDuplicatesWithinWatermark`` (Spark 3.5+)
    keys state on ``id_cols`` alone and evicts an entry once the
    watermark passes its first-seen time — duplicates are dropped as
    long as they arrive within the watermark delay of the original,
    and state stays bounded by the horizon regardless."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) time-interval join: each left row pairs
    with right rows of the same key whose timestamp falls in
    ``(left_ts - lookback, left_ts]`` — the attribution-window join
    (click ← preceding impressions, purchase ← preceding clicks).

    The SAME builder serves both engines — Spark's planner picks the
    physical form from the input kind:

    - batch frames → a range-predicate equi-join (shuffle on the key;
      the time bound prunes pairs stage-side);
    - streaming frames (``watermark`` set) → a watermarked
      stream-stream join where the interval condition is exactly what
      lets Spark BOUND THE STATE STORE: right rows age out once
      ``right_ts < watermark - lookback``, left rows once matched or
      expired. Without a time bound a stream-stream join must retain
      unbounded state — this operator makes the bound explicit.

    Columns are emitted prefixed (``l_`` / ``r_``) so the join is
    self-join-safe (events to events).
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)],
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    )
    if watermark is not None:
        l = l.withWatermark("l_ts", watermark)
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("r_ts") <= F.col("l_ts"))
    )
    return l.join(r, cond, how)


RUNNING_TOTALS_STATE = "n BIGINT, total DOUBLE"
RUNNING_TOTALS_OUTPUT = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"


def running_user_totals_tws(stream):
    """The same running per-user totals on the Spark 4
    ``transformWithStateInPandas`` API (StatefulProcessor + typed
    ValueState) — the successor surface to applyInPandasWithState:
    named state variables with their own schemas/TTLs and optional
    timers, instead of one opaque state tuple. Kept semantically
    identical to :func:`running_user_totals` so the two APIs are
    convergence-tested against the same batch aggregate.

    Runtime requirement: the TWS state protocol is protobuf-based
    (pyspark/sql/streaming/proto), so executing this needs
    ``google.protobuf`` on driver and executors; environments without
    it use :func:`running_user_totals` (applyInPandasWithState), which
    has no such dependency — the convergence test gates accordingly."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", RUNNING_TOTALS_STATE)

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType=RUNNING_TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


def running_user_totals(stream):
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value sum, emitted once per micro-batch.
    State is two scalars per user — O(|users|) state at any scale."""
    import pandas as pd

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        RUNNING_TOTALS_OUTPUT,
        RUNNING_TOTALS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def streaming_mix_counts(
    stream,
    ts_col: str = "ts",
    cat_col: str = "event_type",
    watermark: str = "1 day",
):
    """Per-day category counts maintained ONLINE — the streaming feed
    of the mix-drift monitor (`operators/profiling.py:
    event_mix_drift`). Tumbling 1-day event-time windows keyed by
    category; state per (day, cat) is one counter, bounded by
    |days in watermark|·|cats| regardless of stream length. The
    drained table is EXACTLY the batch operator's (day, cat, c)
    aggregate (same date_trunc boundary: a tumbling 1-day window's
    start IS the truncated day), so feeding it through
    `profiling.mix_drift_from_counts` yields the batch answer
    bit-for-bit — pinned by test_mix_drift_stream_converges_to_batch.

    The aggregation key is the FULL window column — extracting
    ``.start`` before the groupBy would strip the event-time watermark
    metadata from the key, so the watermark could never evict state
    and append mode would be rejected (unbounded state on a
    long-running stream); ``win.start`` is projected AFTER the agg.
    Watermark-evictability is pinned by
    test_streaming_count_helpers_support_append."""
    from pyspark.sql import functions as F

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, "1 day").alias("win"),
            F.col(cat_col).alias("cat"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(F.col("win.start").alias("day"), "cat", "c")
    )


def streaming_value_counts(
    stream,
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 day",
):
    """Per-day floor-bucketed value counts maintained ONLINE — the
    streaming feed of the KS drift monitor (`operators/profiling.py:
    temporal_drift_ks`), the `streaming_mix_counts` pattern. Tumbling
    1-day event-time windows keyed by the integer floor; state per
    (day, floor) is one counter, bounded by the watermark horizon ×
    |distinct floors in horizon| (a stream cannot know the global
    min/max, so the r16 bucket cap cannot be applied online — clip the
    value domain upstream if its floor cardinality is unbounded). The
    drained table is exactly the batch RAW (day, x, c) aggregate; feed
    it through `profiling.temporal_drift_ks_from_counts`, which
    replays the batch operator's bucket cap over the drained counts
    and yields the batch answer bit-for-bit at ANY value span — pinned
    by test_ks_drift_stream_converges_to_batch. (Feeding
    ks_drift_from_counts directly diverges once the floor span exceeds
    n_buckets — r16 review finding.) As in
    :func:`streaming_mix_counts`, the agg key is the FULL window
    column (watermark metadata survives; append mode accepted) and
    ``win.start`` is projected after."""
    from pyspark.sql import functions as F

    return (
        stream.where(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, "1 day").alias("win"),
            F.floor(F.col(value_col)).cast("bigint").alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(F.col("win.start").alias("day"), "x", "c")
    )
