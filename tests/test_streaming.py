"""Structured Streaming parity: the streaming forms of the window
operators must converge to the oracle-verified batch results once the
source drains (Trigger.AvailableNow), plus watermarked streaming dedup
and the applyInPandasWithState stateful operator."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.sources.tables import load_table
from batch_process_dpla_index_spark.streaming.windows import (
    run_stream_to_batch,
    running_user_totals,
    streaming_dedup,
    streaming_tumbling_counts,
    tumbling_agg,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-staged as micro-batch-friendly parquet (µs timestamps,
    several files so AvailableNow sees multiple splits)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(4).write.parquet(path)
    return path


def test_streaming_tumbling_matches_batch(spark, events_dir):
    ev = spark.read.parquet(events_dir)
    stream = streaming_tumbling_counts(
        spark, events_dir, ev.schema, "ts", "1 hour", "2 hours", ["event_type"]
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    got = run_stream_to_batch(stream, name).select(
        F.col("win.start").alias("ws"), "event_type", "n_events"
    )
    want = tumbling_agg(ev, "ts", "1 hour", ["event_type"], [F.count("*").alias("n_events")]).select(
        F.col("win.start").alias("ws"), "event_type", "n_events"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_streaming_dedup_drops_duplicates(spark, events_dir, tmp_path):
    ev = spark.read.parquet(events_dir)
    dup_dir = str(tmp_path / "dup")
    ev.union(ev).repartition(3).write.parquet(dup_dir)
    stream = spark.readStream.schema(ev.schema).parquet(dup_dir)
    deduped = streaming_dedup(stream, ["event_id"], "ts", "1 hour")
    name = f"d_{uuid.uuid4().hex[:8]}"
    got = run_stream_to_batch(deduped, name, output_mode="append")
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_running_user_totals_state(spark, events_dir):
    ev = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(ev.schema).parquet(events_dir)
    name = f"s_{uuid.uuid4().hex[:8]}"
    got = run_stream_to_batch(running_user_totals(stream), name, output_mode="update")
    # last emission per user equals the batch totals
    from pyspark.sql.window import Window

    want = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    latest = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max("total_value"), 6).alias("total_value"),
    )
    assert latest.exceptAll(want).count() == 0 and want.exceptAll(latest).count() == 0
