"""Streaming ingestion product — the continuous twin of the monthly
batch (SURVEY.md §2.11 extension, operational tier).

The reference lands data monthly (monthly_batch_emr.sh); a training
pipeline usually wants the same products continuously. This product
tails a source directory with Structured Streaming and lands
exactly-once parquet through ``foreachBatch``:

- the checkpoint directory gives source-offset tracking and restart
  recovery (micro-batch replay is idempotent: each batch overwrites
  only its own ``batch=<id>`` partition — the Spark-native idempotent
  sink recipe, since a plain file-sink append would double rows on
  replay);
- per-batch row counts accumulate into the product ``_MANIFEST``
  (same provenance contract as the batch products, O3);
- downstream readers see a normal Hive-layout parquet directory and
  can partition-prune on ``batch``.

``Trigger.AvailableNow`` drains whatever is present and stops —
the batch-shaped run used by tests and backfills; omit it in
production for a continuously running query.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from batch_process_dpla_index_spark.io.manifest import write_manifest
from batch_process_dpla_index_spark.io.paths import iso_timestamp


def ingest_available(
    spark: SparkSession,
    source_path: str,
    schema,
    out_path: str,
    checkpoint_path: str,
    transform=None,
    now=None,
) -> dict[str, int]:
    """Drain the source into ``<out>/batch=<id>/`` parquet partitions
    (one AvailableNow run), write the _MANIFEST, and return
    {batch_id: row_count}. ``transform`` is an optional
    DataFrame→DataFrame applied per micro-batch (flatten, redact,
    filter — any of the engine's narrow operators)."""
    from pyspark.sql import functions as F

    counts: dict[int, int] = {}

    def land(batch_df, batch_id: int) -> None:
        out = transform(batch_df) if transform is not None else batch_df
        # idempotent per-batch landing: replays overwrite their own
        # partition only, never append a second copy
        (
            out.withColumn("batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(out_path)
        )
        counts[int(batch_id)] = out.count()

    stream = spark.readStream.schema(schema).parquet(source_path)
    q = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    write_manifest(
        {
            "Source": source_path,
            "Batches": str(len(counts)),
            "Total record count": str(sum(counts.values())),
            **{f"Batch {b} record count": str(n) for b, n in sorted(counts.items())},
        },
        out_path,
        timestamp=iso_timestamp(now),
    )
    return counts
