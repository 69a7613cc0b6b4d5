"""Small-file compaction for parquet datasets.

Incremental producers (the streaming-ingest product's per-batch
appends, `products/streaming_ingest.py`; the reference's monthly
re-writes, ParquetDump.scala:118) accumulate many under-sized part
files; at 100 TB the resulting per-file task overhead and NameNode/
listing pressure dominate scan cost. This product measures, plans,
and executes compaction with Spark-native pieces:

- **stats**: the `_metadata` hidden column on file sources gives
  (file_path, file_size) DISTRIBUTED — no driver-side listing, works
  on any store the reader reaches.
- **plan**: deterministic size-cumsum binning — files in path order,
  `bin = floor((cumsum - size) / target)` — one window over the
  (tiny) file-stats frame. Greedy-but-linear: every bin lands in
  [target, target + max_file) bytes except the last, which is the
  right trade at scale (optimal bin packing is NP-hard and the win
  over greedy is marginal for power-law file sizes).
- **execute**: one output file per planned bin via
  ``repartitionByRange(n_bins, bin)`` + per-partition write — range
  partitioning (not hash) so bin→task is collision-free and output
  sizes match the plan.

The rewrite is idempotent-overwrite (K8): re-running replaces the
compacted output; the source directory is never mutated (compact-
then-swap is the caller's move, mirroring the reference's
delete-then-write convention, JsonlDump.scala:72-74).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_process_dpla_index_spark.functions.windows import one_bucket


def file_stats(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """(file, size_bytes, n_rows) per parquet part file — computed
    executor-side from the `_metadata` struct, aggregated in one tiny
    shuffle (|files| rows). ``path`` may be a directory or an explicit
    file list (the snapshot product passes a version's exact files)."""
    paths = [path] if isinstance(path, str) else list(path)
    return (
        spark.read.parquet(*paths)
        .select(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.file_size").alias("size_bytes"),
        )
        .groupBy("file", "size_bytes")
        .agg(F.count("*").alias("n_rows"))
    )


def compaction_plan(stats: DataFrame, target_bytes: int) -> DataFrame:
    """Assign every file to a compaction bin: path-ordered size cumsum,
    ``bin = floor((cumsum - size) / target)``. Deterministic (total
    path order), one window over the file-stats frame — the frame is
    |files| rows, so a single-partition window is fine even when the
    DATA is 100 TB (a million files is still one executor's work).

    A file at/above ``target_bytes`` always closes its bin (the cumsum
    step crosses a bin boundary, so the next file starts a new bin),
    but it may share its own bin with small files that preceded it —
    e.g. sizes 10 then 200 with target 100 both land in bin 0. Large
    files are never rewritten *with each other*; the rewrite of a bin
    containing one large file is bounded by target + that file."""
    # one_bucket: still one populated partition (the documented
    # |files|-row contract), but no WindowExec warning in the bench
    # log (functions/windows.py)
    w = (
        Window.partitionBy(one_bucket(F.col("file")))
        .orderBy("file")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        stats.withColumn("__cum", F.sum("size_bytes").over(w))
        .withColumn(
            "bin",
            F.floor((F.col("__cum") - F.col("size_bytes")) / F.lit(int(target_bytes)))
            .cast("bigint"),
        )
        .drop("__cum")
    )


def plan_summary(plan: DataFrame) -> DataFrame:
    """Per-bin rollup: files, bytes, rows — the review artifact a
    maintenance job logs before rewriting."""
    return plan.groupBy("bin").agg(
        F.count("*").alias("n_files"),
        F.sum("size_bytes").alias("bytes"),
        F.sum("n_rows").alias("n_rows"),
    )


def compact(
    spark: SparkSession,
    src: str | list[str],
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Rewrite ``src`` into ``dst`` with one output file per planned
    bin. Returns {"n_files_in", "n_bins", "n_rows"}.

    Plan shape: stats + plan are |files|-sized and CACHED (one
    `_metadata` listing job feeds every driver-side count); the data
    pass is one scan joined (broadcast — the plan frame is tiny) to
    its bin assignment, then ``repartitionByRange`` on bin: exactly
    one shuffle of the data. Range boundaries come from a reservoir
    sample, so two adjacent bins can in rare skewed samples share a
    task (one ~2× file, never lost rows) — the returned ``n_bins`` is
    the PLANNED count; callers needing the exact file count list the
    output."""
    stats = file_stats(spark, src)
    plan = compaction_plan(stats, target_bytes).cache()
    try:
        n_files = plan.count()  # materializes the cache
        n_bins = plan.select("bin").distinct().count()
        n_rows = plan.agg(F.sum("n_rows")).first()[0] or 0

        src_paths = [src] if isinstance(src, str) else list(src)
        data = spark.read.parquet(*src_paths).withColumn(
            "__file", F.col("_metadata.file_path")
        )
        binned = data.join(
            F.broadcast(
                plan.select(F.col("file").alias("__file"), "bin")
            ),
            "__file",
        ).drop("__file")
        (
            binned.repartitionByRange(max(n_bins, 1), "bin")
            .drop("bin")
            .write.mode("overwrite")
            .parquet(dst)
        )
    finally:
        plan.unpersist()
    return {"n_files_in": n_files, "n_bins": n_bins, "n_rows": int(n_rows)}
