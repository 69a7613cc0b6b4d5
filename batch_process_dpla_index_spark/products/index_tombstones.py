"""Shared tombstone (delete) machinery for the persisted indexes
(`products.ann_index`, `products.embedding_index`, and — via the
``datasets`` spec — the signature/bucket pairs of
`products.dedup_index` and `products.phash_index`).

A 100 TB corpus under compliance (takedown / opt-out) must be able to
remove single documents without rebuilding the whole index. This is
the snapshot log's merge/vacuum split (`products.snapshots`) applied
to an index artifact:

- **delete** = APPEND the ids to a small ``tombstones`` parquet
  dataset under ``index_dir``, each id stamped with the index's max
  ``ingest_batch`` at delete time (the WATERMARK). The append is
  O(|ids|) — no cell rewrite; the default manifest recount +
  threshold check is ONE column-pruned (id, ingest_batch) aggregate,
  skippable entirely with ``recount=False`` for the pure-O(|ids|)
  hot path.
- **serve** = every stored-cells read anti-joins the tombstone set:
  ``stored.id == t_id AND stored.ingest_batch <= t_max_batch``.
  The watermark makes append-after-delete well defined: a delete
  removes every copy of the id PRESENT at delete time; a later
  re-ingest of the same id is new data and serves normally (the
  takedown-then-re-opt-in flow), with no append-path bookkeeping.
- **compact** = physically rewrite the cells minus tombstoned rows
  once the tombstone fraction crosses a threshold, then clear the
  set — the vacuum step, using the rebuild products' failure-safe
  swap ordering (every crash window is loud, never silent drift;
  worst case after a crash between swap and tombstone-clear is a
  redundant anti-join against already-removed ids — a no-op).

Replay idempotence: re-running the same delete appends duplicate
tombstone rows; the serve-time anti-join is set-semantics (the set is
collapsed to one max-watermark row per id first), so duplicates are
harmless, and compaction clears them.

Scale: the tombstone set is delete-proportional, not
corpus-proportional. The serve-time anti-join equi-matches on the id,
so AQE broadcasts the (collapsed) tombstone side while it is small
and falls back to a shuffle join if a mass takedown ever grows it —
either way no plan rewrite is needed, and the compaction threshold
bounds how long a large set is carried.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.io.manifest import read_manifest, write_manifest


def keyed_repartition(df: DataFrame, n: "int | None", *cols: str) -> DataFrame:
    """Cluster ``df`` by ``cols`` for an artifact write. ``n=None``
    (the r17 default fleet-wide) keys the exchange WITHOUT pinning a
    partition count, so AQE's partition coalescing sizes the write by
    BYTES (``spark.sql.adaptive.advisoryPartitionSizeInBytes``) — one
    file at bench scale, advisory-sized files at 100 TB — instead of a
    constant 32 that is simultaneously too many files locally (32
    KB-sized files + a 32-task write stage per artifact) and too few
    at cluster scale (guide §2.2/§6: partition by size, not by a
    constant). An explicit int keeps the pinned legacy layout."""
    if n is None:
        return df.repartition(*[F.col(c) for c in cols])
    return df.repartition(n, *[F.col(c) for c in cols])


def parquet_rowcount(path: str) -> int:
    """Row count from the parquet FOOTERS, driver-side — no Spark job,
    no listing/scan stage (r18, guide §1.2: the count is metadata the
    writer already produced). Sums ``num_rows`` over every part file
    under ``path`` (Hive partition dirs included); at any scale this
    reads one footer per file, the same metadata volume the old
    ``spark.read.parquet(path).count()`` job fetched through tasks."""
    import glob as _glob

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )
    )


def _tombstones_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def has_tombstones(index_dir: str) -> bool:
    return os.path.isdir(_tombstones_dir(index_dir))


def clear_tombstones(index_dir: str) -> None:
    """Remove the tombstone set (idempotent) — called by build/rebuild
    in both index products so a fresh or rewritten cells dataset never
    inherits a stale delete set. THE one place that knows the layout:
    the products must not hand-roll the path (a layout change would
    silently miss their copies)."""
    import shutil

    shutil.rmtree(_tombstones_dir(index_dir), ignore_errors=True)


def read_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """(t_id, t_max_batch) — one row per deleted id, collapsed to the
    MAX watermark (each delete event covers batches <= its own
    watermark, so the union of events per id is exactly the max)."""
    if not has_tombstones(index_dir):
        return None
    return (
        spark.read.parquet(_tombstones_dir(index_dir))
        .groupBy("t_id")
        .agg(F.max("t_max_batch").alias("t_max_batch"))
    )


def apply_tombstones(
    spark: SparkSession, index_dir: str, stored: DataFrame, id_field: str
) -> DataFrame:
    """Anti-join the tombstone set out of a stored-cells frame.
    No tombstones dir → the frame passes through untouched (zero plan
    overhead for an index that never saw a delete). ``stored`` must
    still carry ``ingest_batch`` (pre-batch-layout indexes are treated
    as all batch 0)."""
    tombs = read_tombstones(spark, index_dir)
    if tombs is None:
        return stored
    batch = (
        F.col("ingest_batch")
        if "ingest_batch" in stored.columns
        else F.lit(0)
    )
    cond = (stored[id_field] == tombs["t_id"]) & (
        batch <= tombs["t_max_batch"]
    )
    return stored.join(tombs, cond, "left_anti")


def _ids_frame(spark: SparkSession, ids, id_col: str | None) -> DataFrame:
    """Normalize the caller's delete set to a one-column (t_id) frame.
    A DataFrame passes through (``id_col`` or its first column); a
    plain iterable of ints goes through the Arrow local-frame path
    (JVM LocalRelation — never a Python-pickled RDD)."""
    if isinstance(ids, DataFrame):
        col = id_col if id_col is not None else ids.columns[0]
        return ids.select(F.col(col).cast("bigint").alias("t_id"))
    from batch_process_dpla_index_spark.operators.relational import (
        _arrow_local_frame,
    )

    return _arrow_local_frame(
        spark, [(int(i),) for i in ids], "t_id bigint"
    )


#: dataset spec: (subdir, id_field, repartition_cols). ``None``
#: repartition_cols = auto (repartition on "cell" when the column is
#: present, else write as-is). The FIRST spec is authoritative: it is
#: one-row-per-id (cells for the vector indexes, signatures for the
#: dedup/phash indexes) and drives the watermark, the recount, and the
#: empty-survivors refusal; later specs (e.g. band buckets) are
#: compacted with the same anti-join but never counted.
_DatasetSpec = tuple[str, str, "list[str] | None"]


def _dataset_specs(
    id_field: str, datasets: "list[_DatasetSpec] | None"
) -> "list[_DatasetSpec]":
    return datasets if datasets is not None else [("cells", id_field, None)]


def delete_from_index(
    spark: SparkSession,
    index_dir: str,
    ids,
    id_field: str,
    id_col: str | None = None,
    compact_threshold: float = 0.2,
    cell_partitions: int | None = None,
    recount: bool = True,
    datasets: "list[_DatasetSpec] | None" = None,
) -> dict[str, str]:
    """Tombstone a set of ids out of a persisted index and update the
    manifest (live ``Record count`` + ``Tombstone count``). When the
    tombstoned fraction of stored rows reaches ``compact_threshold``,
    the cells are physically compacted in the same call (pass a
    threshold > 1 to defer compaction indefinitely; 0 forces it).

    ``ids``: a DataFrame (``id_col`` names the column; default its
    first) or an iterable of ints. ``id_field`` is the stored cells'
    id column ("id" for ann_index, "c_id" for embedding_index).

    Cost: the tombstone APPEND is O(|ids|) — no corpus pass. The
    manifest recount + threshold check is ONE column-pruned aggregate
    over the stored (id, ingest_batch) columns (a single job: total
    and live counted in the same pass via a left join against the
    delete-proportional tombstone set). For the 100 TB hot path where
    even that scan per takedown is unwanted, ``recount=False`` skips
    the count AND the threshold check entirely (pure O(|ids|)); the
    manifest then records ``Tombstone count = stale`` and compaction
    is driven explicitly (the occupancy/report job, or a forced
    ``compact``).

    ``datasets`` generalizes the layout for indexes that store MORE
    than one per-id dataset (dedup_index/phash_index keep signatures +
    band buckets): the first spec's dataset drives the watermark and
    the recount; compaction rewrites all of them. Default: the single
    ``cells`` dataset of the vector indexes.

    Returns the updated manifest."""
    specs = _dataset_specs(id_field, datasets)
    primary_dir, primary_id, _ = specs[0]
    id_field = primary_id
    stored = spark.read.parquet(os.path.join(index_dir, primary_dir))
    wm = 0
    if "ingest_batch" in stored.columns:
        # ingest_batch is a Hive PARTITION column on every write path,
        # so its max is the max over the partition directory names — a
        # driver-side listing, not an aggregate job (r18, guide §1.2).
        # Any surprise in the layout falls back to the old aggregate.
        try:
            wm = max(
                (
                    int(d.split("=", 1)[1])
                    for d in os.listdir(os.path.join(index_dir, primary_dir))
                    if d.startswith("ingest_batch=")
                ),
                default=0,
            )
        except (OSError, ValueError):
            wm_row = stored.agg(F.max("ingest_batch").alias("m")).first()
            wm = int(wm_row["m"] or 0)
    # repartition(1), never coalesce(1): coalesce would collapse any
    # upstream computation of a derived ids frame onto one task
    (
        _ids_frame(spark, ids, id_col)
        .select("t_id", F.lit(wm).cast("int").alias("t_max_batch"))
        .repartition(1)
        .write.mode("append")
        .parquet(_tombstones_dir(index_dir))
    )

    manifest = read_manifest(index_dir)
    if not recount:
        manifest["Tombstone count"] = "stale"
        # 'Record count' keeps its pre-delete value (we skipped the
        # scan that would refresh it) — mark it explicitly so a
        # manifest consumer (occupancy/report tooling) can detect the
        # unrecounted state instead of acting on an outdated live count
        manifest["Record count stale"] = "true"
        write_manifest(manifest, index_dir)
        return manifest
    tombs = read_tombstones(spark, index_dir)
    batch = (
        F.col("ingest_batch")
        if "ingest_batch" in stored.columns
        else F.lit(0)
    )
    cond = (stored[id_field] == tombs["t_id"]) & (
        batch <= tombs["t_max_batch"]
    )
    counts = (
        stored.join(tombs, cond, "left")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count(F.when(tombs["t_id"].isNull(), 1)).alias("live"),
        )
        .first()
    )
    total, live = int(counts["total"]), int(counts["live"])
    dead = total - live
    if total and dead and dead / total >= compact_threshold:
        return compact_index_tombstones(
            spark, index_dir, id_field,
            cell_partitions=cell_partitions, datasets=datasets,
        )
    manifest["Record count"] = str(live)
    manifest["Tombstone count"] = str(dead)
    manifest.pop("Record count stale", None)
    write_manifest(manifest, index_dir)
    return manifest


def compact_index_tombstones(
    spark: SparkSession,
    index_dir: str,
    id_field: str,
    cell_partitions: int | None = None,
    datasets: "list[_DatasetSpec] | None" = None,
) -> dict[str, str]:
    """Physically rewrite each stored dataset minus the tombstone set,
    then clear the set — the vacuum step. ``ingest_batch`` partitions
    are preserved row-for-row on the survivors, so replay pruning
    stays valid across the compaction.

    Failure-safe swap ordering (the rebuild products' convention):
    write ALL survivor datasets to sibling dirs first → move each live
    dataset aside → flip the manifest → move the new data to the live
    names → delete the old copies and the tombstone set LAST. A crash
    between the swap and the tombstone clear leaves a redundant
    anti-join against already-removed ids — a no-op, never data loss
    or resurrection; a crash mid-swap leaves a missing live dir, which
    is LOUD (unreadable) and recoverable from the ``__old`` copy.

    The record count comes from the FIRST dataset spec (one row per
    id); later datasets (band buckets) are rewritten with the same
    anti-join but never counted."""
    import shutil

    specs = _dataset_specs(id_field, datasets)
    n_live = 0
    staged: list[tuple[str, str, str]] = []  # (live, tmp, old)
    for i, (subdir, ds_id, part_cols) in enumerate(specs):
        live_dir = os.path.join(index_dir, subdir)
        tmp_dir = os.path.join(index_dir, subdir + "__compact")
        old_dir = os.path.join(index_dir, subdir + "__old")
        stored = spark.read.parquet(live_dir)
        live = apply_tombstones(spark, index_dir, stored, ds_id)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        if part_cols is None:
            part_cols = ["cell"] if "cell" in stored.columns else []
        writer = (
            keyed_repartition(live, cell_partitions, *part_cols)
            if part_cols
            else live
        )
        # empty-safe: a LATER dataset can legitimately compact to zero
        # rows (every bucket posting belonged to tombstoned ids while
        # their signatures survive via other batches' keys being
        # capped) — the i==0 refusal below covers only the per-id
        # dataset, and a zero-row partitionBy write would install an
        # unreadable live dir at the swap
        overwrite_dataset_readable(
            writer,
            tmp_dir,
            "ingest_batch" if "ingest_batch" in stored.columns else None,
        )
        if i == 0:
            # survivor count from the freshly WRITTEN footers — the
            # anti-join now runs ONCE, in the write; the old
            # persist+count+write shape paid a second materialization
            # of the survivor frame per dataset (guide §1.2: don't
            # compute things twice). r18: the footer read happens on
            # the driver (parquet_rowcount), not as a Spark job. The
            # empty refusal happens before any swap, so state is
            # unchanged: only the staging dir is written/removed here.
            n_live = parquet_rowcount(tmp_dir)
            if n_live == 0:
                # an empty dataset is unreadable (no part files, no
                # schema) — every later serve would crash obscurely;
                # refuse loudly instead
                shutil.rmtree(tmp_dir, ignore_errors=True)
                raise ValueError(
                    "compaction would remove every stored row; an "
                    "empty index is unreadable (rebuild refuses the "
                    "same way) — delete the index directory instead"
                )
        staged.append((live_dir, tmp_dir, old_dir))

    for live_dir, _tmp, old_dir in staged:
        shutil.rmtree(old_dir, ignore_errors=True)
        os.rename(live_dir, old_dir)
    manifest = read_manifest(index_dir)
    manifest["Record count"] = str(n_live)
    manifest["Tombstone count"] = "0"
    manifest.pop("Record count stale", None)
    write_manifest(manifest, index_dir)
    for live_dir, tmp_dir, _old in staged:
        os.rename(tmp_dir, live_dir)
    for _live, _tmp, old_dir in staged:
        shutil.rmtree(old_dir)
    shutil.rmtree(_tombstones_dir(index_dir), ignore_errors=True)
    return manifest


def overwrite_dataset_readable(
    df: DataFrame, out_dir: str, partition_col: str | None = None
) -> None:
    """Overwrite-write a dataset that MAY be empty. A zero-row
    ``partitionBy`` write lands no part files (only ``_SUCCESS``) and
    the dataset is unreadable on the next scan ("Unable to infer
    schema") — the crash class the build/compact empty guards refuse.
    Some empty datasets are VALID states though (a bucket dataset
    whose every posting was max_bucket-dropped or tombstone-compacted
    away): for those, rewrite ONE empty schema-carrying part file
    INSIDE a ``<partition_col>=0/`` directory (the column moves to the
    dir name, as Hive layout requires) so the dataset stays uniformly
    partitioned — a later ``partitionBy`` append then lands sibling
    ``<col>=N/`` dirs instead of mixing root-level part files with
    partition dirs, a layout that only reads by unspecified
    partition-discovery behavior (r14 advice)."""
    import glob as _glob

    w = df.write.mode("overwrite")
    if partition_col is not None:
        w = w.partitionBy(partition_col)
    w.parquet(out_dir)
    if not _glob.glob(
        os.path.join(out_dir, "**", "*.parquet"), recursive=True
    ):
        if partition_col is None:
            df.repartition(1).write.mode("overwrite").parquet(out_dir)
        else:
            df.drop(partition_col).repartition(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, f"{partition_col}=0"))


def capped_append_buckets(
    spark: SparkSession,
    index_dir: str,
    new_buckets: DataFrame,
    key_cols: "list[str]",
    max_bucket: int,
    current_batch: int,
    id_field: str = "id",
) -> "tuple[DataFrame, int]":
    """Enforce the manifest ``max_bucket`` cap on an APPEND (the ONE
    implementation behind dedup_index and phash_index, differing only
    in the bucket key columns): returns (capped new bucket rows,
    dropped-key count). Combined size per key = new rows + stored
    LIVE rows, where stored live means

    - the current batch's own partition is EXCLUDED — a checkpoint
      replay otherwise counts its first attempt's rows, pushes keys
      over the cap, and the dynamic partition overwrite then REPLACES
      the partition without them (silent permanent loss of candidates
      the first attempt legitimately kept);
    - tombstoned ids are anti-joined out (the serve-path read) — a
      takedown awaiting compaction otherwise inflates old_sz and
      spuriously drops legitimate new rows for the key.

    Cost stays batch-proportional: the stored side is semi-pruned by a
    broadcast of the new batch's keys before counting."""
    # r17 (guide §1.2/§2.4): two SMALL jobs + a driver merge instead of
    # one deep query tree. The old shape (new-size agg ⟕ stored-size
    # agg → filter → count, then the SAME tree again as the anti-join's
    # broadcast build) paid ~7 sequential AQE stage materializations
    # per append and computed the size join twice. Both aggregates are
    # batch-key-bounded — the per-key count frame was ALREADY broadcast
    # to every executor in the old plan, so the driver copy is the same
    # memory it always cost; the combine (new + stored-live > cap) is
    # exact integer arithmetic either side of the boundary.
    from pyspark.sql.types import StructType

    key_schema = StructType(
        [new_buckets.schema[c] for c in key_cols]
    )
    new_sz_rows = (
        new_buckets.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("new_sz"))
        .collect()
    )
    from batch_process_dpla_index_spark.operators.relational import (
        _arrow_local_frame,
    )

    batch_keys = _arrow_local_frame(
        spark, [tuple(r[c] for c in key_cols) for r in new_sz_rows],
        key_schema,
    )
    stored = spark.read.parquet(os.path.join(index_dir, "buckets")).where(
        F.col("ingest_batch") != int(current_batch)
    )
    # ``id_field`` names the stored buckets' id column for the
    # tombstone anti-join (r14 advice: hardcoding "id" would make a
    # future layout with a different bucket id column silently skip
    # takedown exclusion and spuriously drop new rows)
    stored = apply_tombstones(spark, index_dir, stored, id_field)
    stored_sz = {
        tuple(r[c] for c in key_cols): r["old_sz"]
        for r in (
            stored.join(F.broadcast(batch_keys), list(key_cols))
            .groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("old_sz"))
            .collect()
        )
    }
    dropped_keys = [
        tuple(r[c] for c in key_cols)
        for r in new_sz_rows
        if r["new_sz"] + stored_sz.get(tuple(r[c] for c in key_cols), 0)
        > int(max_bucket)
    ]
    n_dropped = len(dropped_keys)
    if not n_dropped:
        return new_buckets, 0
    dropped_df = _arrow_local_frame(spark, dropped_keys, key_schema)
    return (
        new_buckets.join(
            F.broadcast(dropped_df), list(key_cols), "left_anti"
        ),
        n_dropped,
    )
