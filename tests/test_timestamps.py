"""Timestamp-encoding guard: the events loader must normalize ``ts`` to
plain TIMESTAMP regardless of how the parquet fixture encodes it.

Round-3 regression class: PySpark 4.1 defaults
``spark.sql.parquet.inferTimestampNTZ.enabled=true``, so an un-annotated
µs timestamp column arrives as TIMESTAMP_NTZ, which breaks
``unix_micros`` (analysis error) and ``withWatermark`` (NTZ event time
rejected). This suite pins all three encodings the fixture has shipped
with across rounds — µs-annotated, ns-as-int64, and un-annotated µs
(the NTZ trap) — and asserts every events-consuming query family still
analyzes.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.sources.tables import load_table

_ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 10, 11],
    "event_type": ["click", "purchase", "click"],
    "value": [1.5, 2.5, 3.5],
    "props": ['{"k":1}', "{}", "{}"],
}
_TS = [
    datetime.datetime(2024, 1, 10, 12, 0, 0),
    datetime.datetime(2024, 1, 10, 12, 30, 0),
    datetime.datetime(2024, 1, 10, 13, 0, 0),
]


def _write_events(dir_path, ts_array: pa.Array) -> str:
    cols = {"event_id": pa.array(_ROWS["event_id"], pa.int64()), "ts": ts_array}
    cols["user_id"] = pa.array(_ROWS["user_id"], pa.int64())
    cols["event_type"] = pa.array(_ROWS["event_type"])
    cols["value"] = pa.array(_ROWS["value"], pa.float64())
    cols["props"] = pa.array(_ROWS["props"])
    path = str(dir_path / "events.parquet")
    pq.write_table(pa.table(cols), path)
    return str(dir_path)


_ENCODINGS = {
    # un-annotated µs — infers as TIMESTAMP_NTZ on PySpark 4.1 defaults
    "us_naive": pa.array(_TS, pa.timestamp("us")),
    # µs with UTC annotation — plain TIMESTAMP everywhere
    "us_utc": pa.array(_TS, pa.timestamp("us", tz="UTC")),
    # TIMESTAMP(NANOS) — vectorized reader rejects it unless
    # nanosAsLong=true, then it arrives as a ns bigint
    "ns_naive": pa.array(_TS, pa.timestamp("ns")),
}


@pytest.mark.parametrize("enc", sorted(_ENCODINGS))
def test_events_ts_always_timestamp(spark, tmp_path, enc):
    sf_dir = _write_events(tmp_path, _ENCODINGS[enc])
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", ev.dtypes
    # value-exact under the pinned UTC session regardless of encoding
    got = [r[0] for r in ev.select(F.unix_micros("ts")).orderBy("event_id").collect()]
    want = [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) for t in _TS]
    assert got == want


@pytest.mark.parametrize("enc", sorted(_ENCODINGS))
def test_events_query_families_analyze(spark, tmp_path, enc):
    """Every events-consuming family must at least pass analysis: tumbling
    window + unix_micros projection, session window, as-of prep, and a
    watermarked streaming aggregate."""
    sf_dir = _write_events(tmp_path, _ENCODINGS[enc])
    ev = load_table(spark, sf_dir, "events")

    tumbling = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros("win.start").alias("ws"), "event_type", "n")
    )
    assert tumbling.count() > 0

    sessions = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros("win.start").alias("ss"), "user_id", "n")
    )
    assert sessions.count() > 0

    asof_prep = ev.select("user_id", F.unix_micros("ts").alias("ts_us"))
    assert asof_prep.count() == 3

    # withWatermark rejects NTZ event time — exercise it end-to-end
    stream = spark.readStream.schema(ev.schema).parquet(
        f"{sf_dir}"
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    assert agg.isStreaming


def test_schema_memo_invalidates_on_rewrite(spark, tmp_path):
    """Rewriting a parquet at a previously-loaded path must re-infer
    the schema, not serve the memoized one (r16 ADVICE: the memo was
    keyed by path alone, so a same-process rewrite with a different
    schema read stale — missing/null columns instead of failing loudly
    or reading fresh). Keyed on (path, mtime) now; this pins it."""
    import time

    from batch_process_dpla_index_spark.sources.tables import load_table

    sf_dir = str(tmp_path)
    path = f"{sf_dir}/part.parquet"
    spark.range(3).selectExpr("id AS p_partkey").write.parquet(path)
    first = load_table(spark, sf_dir, "part")
    assert first.columns == ["p_partkey"]

    time.sleep(0.05)  # directory mtime granularity guard
    spark.range(3).selectExpr(
        "id AS p_partkey", "'x' AS p_brand"
    ).write.mode("overwrite").parquet(path)
    second = load_table(spark, sf_dir, "part")
    assert sorted(second.columns) == ["p_brand", "p_partkey"]
    assert second.count() == 3
