"""Persisted near-dup index: the "store signatures alongside the
corpus" production pattern the in-line operators only simulate.

An ingest pipeline at 100 TB does not re-shingle the corpus per batch
— it maintains a signature/bucket index (built once, appended per
accepted batch) and dedupes each incoming batch against the index:

- :func:`build_dedup_index` materializes two parquet datasets under
  ``index_dir``: ``signatures`` (id, shingles, sig — the exact-verify
  side) and ``buckets`` (band, key, id — the LSH candidate side,
  repartitioned on the join key so batch lookups co-locate), plus a
  ``_MANIFEST`` recording the LSH parameters (ManifestWriter.scala:7-14
  convention). Cost: one corpus pass.
- :func:`incremental_dedup_indexed` shingles ONLY the new batch,
  explodes it to band keys, equi-joins the stored buckets, and
  exact-verifies against the stored shingle sets — identical output
  contract to ``operators.dedup.incremental_dedup`` (best corpus match
  per new doc at true Jaccard >= threshold), without touching corpus
  text. LSH parameters are never passed by the caller on the read
  path: they come from the manifest, so an index built with different
  (n, num_perm, bands) cannot be silently mis-queried.

Scale notes: per-batch cost is bands × |batch| explode + one shuffle
join against the bucket dataset (AQE broadcasts the batch side when
small); the ``max_bucket`` cap is applied to stored buckets at build
time (hot template clusters are dropped-and-logged once, not per
batch). Appending a batch = union-write its signatures/buckets into
the same layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.io.manifest import read_manifest, write_manifest
from batch_process_dpla_index_spark.operators.dedup import (
    _band_buckets,
    shingle_sets,
    with_minhash_signature,
)

#: tombstone dataset layout (products.index_tombstones spec): the
#: per-id signatures dataset is authoritative (watermark/recount);
#: buckets are compacted on the same anti-join, rewritten co-located
#: on the (band, key) join columns
_TOMBSTONE_DATASETS = [
    ("signatures", "id", []),
    ("buckets", "id", ["band", "key"]),
]


def build_dedup_index(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    index_dir: str,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 1000,
    use_pandas: bool = True,
    bucket_partitions: int | None = None,
) -> dict[str, str]:
    """One corpus pass → signatures + capped band buckets + manifest.

    Returns the manifest dict (also written to ``index_dir/_MANIFEST``).
    """
    rows = num_perm // bands
    sig = with_minhash_signature(
        shingle_sets(docs, text_col, id_col, n, use_pandas=use_pandas)
        .withColumnRenamed(id_col, "id"),
        num_perm,
        use_pandas,
    ).persist()
    n_docs = sig.count()
    if n_docs == 0:
        # zero-row parquet datasets are unreadable on the next query —
        # refuse loudly (the phash/ann/embedding index builds refuse
        # the same way) instead of writing a landmine
        sig.unpersist()
        raise ValueError(
            "build_dedup_index: input docs frame is empty; an empty "
            "index is unreadable — refuse to build it"
        )
    # Both datasets carry an ``ingest_batch`` Hive partition (0 at
    # build) so streaming appends land per-micro-batch partitions that
    # a checkpoint replay can overwrite idempotently.
    (
        sig.withColumn("ingest_batch", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(os.path.join(index_dir, "signatures"))
    )

    buckets = _band_buckets(sig, bands, rows)
    oversized = (
        buckets.groupBy("band", "key")
        .agg(F.count("*").alias("sz"))
        .filter(F.col("sz") > max_bucket)
        .select("band", "key")
    )
    # r17 (guide §1.2): collect the oversized keys ONCE — the old
    # count()-then-broadcast shape ran the bands×docs explode +
    # groupBy twice per build (manifest count, then again as the
    # anti-join's broadcast build). The key set is broadcast-bounded
    # by construction; with zero hot keys (the common case) the
    # anti-join drops out of the bucket-write plan entirely.
    dropped_keys = oversized.collect()
    n_dropped = len(dropped_keys)
    capped = buckets
    if n_dropped:
        from batch_process_dpla_index_spark.operators.relational import (
            _arrow_local_frame,
        )

        capped = buckets.join(
            F.broadcast(
                _arrow_local_frame(
                    sig.sparkSession,
                    [tuple(r) for r in dropped_keys],
                    oversized.schema,
                )
            ),
            ["band", "key"],
            "left_anti",
        )
    from batch_process_dpla_index_spark.products.index_tombstones import (
        keyed_repartition,
        overwrite_dataset_readable,
    )

    # co-locate bucket lookups: batch-side band keys hash-join into a
    # layout already partitioned on the join key (partition count AQE-
    # sized by bytes unless pinned). Empty-safe write: a degenerate
    # corpus (every band key oversized) caps away EVERY bucket row,
    # and a zero-row partitionBy write would land an unreadable
    # dataset that crashes the next query
    overwrite_dataset_readable(
        keyed_repartition(capped, bucket_partitions, "band", "key")
        .withColumn("ingest_batch", F.lit(0)),
        os.path.join(index_dir, "buckets"),
        "ingest_batch",
    )
    sig.unpersist()
    # a fresh build must not inherit a previous index's delete set (a
    # stale watermark-0 tombstone would silently delete the new batch-0
    # rows) — but clear it only AFTER the last dataset write, the
    # ann/embedding ordering (r14 advice): a crash BEFORE this point
    # leaves the old index intact WITH its tombstones (no resurrection
    # of taken-down ids); a crash after at worst over-deletes new
    # batch-0 rows until the build is re-run, which is fail-safe for a
    # compliance path.
    from batch_process_dpla_index_spark.products.index_tombstones import (
        clear_tombstones,
    )

    clear_tombstones(index_dir)
    manifest = {
        "shingle_n": str(n),
        "num_perm": str(num_perm),
        "bands": str(bands),
        "max_bucket": str(max_bucket),
        "Record count": str(n_docs),
        "Oversized buckets dropped": str(n_dropped),
    }
    write_manifest(manifest, index_dir)
    return manifest


def incremental_dedup_indexed(
    spark: SparkSession,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    index_dir: str,
    threshold: float = 0.5,
    use_pandas: bool = True,
    max_ingest_batch: int | None = None,
) -> DataFrame:
    """Dedupe a batch against a stored index — no corpus re-shingle.

    Output contract matches ``incremental_dedup``: (new_id, dup_of,
    jaccard), best corpus match per new doc, ties to smallest corpus id.

    ``max_ingest_batch`` bounds which stored partitions are queried
    (``ingest_batch <= max_ingest_batch``) — the replay-safety lever: a
    checkpoint-replayed micro-batch passes its own batch id so it never
    matches the signatures its FIRST attempt appended (without the
    bound, every replayed doc matches itself at J=1.0 and the replay
    lands an empty partition over the original rows — data loss).
    Partition pruning makes the bound free; ``None`` queries everything.
    """
    manifest = read_manifest(index_dir)
    n = int(manifest["shingle_n"])
    num_perm = int(manifest["num_perm"])
    bands = int(manifest["bands"])
    rows = num_perm // bands

    new_sig = with_minhash_signature(
        shingle_sets(new_docs, text_col, id_col, n, use_pandas=use_pandas)
        .withColumnRenamed(id_col, "id"),
        num_perm,
        use_pandas,
    ).persist()
    corp_buckets = spark.read.parquet(os.path.join(index_dir, "buckets"))
    corp_sig = spark.read.parquet(os.path.join(index_dir, "signatures"))
    if max_ingest_batch is not None:
        corp_buckets = corp_buckets.where(
            F.col("ingest_batch") <= int(max_ingest_batch)
        )
        corp_sig = corp_sig.where(
            F.col("ingest_batch") <= int(max_ingest_batch)
        )
    # serve-time takedown exclusion: anti-joining the SIGNATURES side
    # is sufficient — candidates from still-bucketed tombstoned ids die
    # at the inner verify join below (bucket rows are physically
    # removed at compaction); zero plan overhead with no tombstones dir
    from batch_process_dpla_index_spark.products.index_tombstones import (
        apply_tombstones,
    )

    corp_sig = apply_tombstones(spark, index_dir, corp_sig, "id")

    cand = (
        _band_buckets(new_sig, bands, rows)
        .alias("x")
        .join(corp_buckets.alias("y"), ["band", "key"])
        .select(F.col("x.id").alias("new_id"), F.col("y.id").alias("dup_of"))
        .distinct()
    )
    sa = new_sig.select(F.col("id").alias("new_id"), F.col("shingles").alias("sh_a"))
    sb = corp_sig.select(F.col("id").alias("dup_of"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "new_id")
        .join(sb, "dup_of")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # best match as ONE aggregate instead of row_number-over-window
    # (r18, guide §2.4/§2.3): max_by over struct(jaccard, -dup_of)
    # picks the exact (jaccard DESC, dup_of ASC) winner the old rn==1
    # filter kept (unique ordering key — no tie), and the winner's
    # jaccard IS max(jaccard). Plans as SortAggregate (struct buffer),
    # but the map-side partial shrinks the exchange to one row per
    # (task, key) where the window shuffled every verified pair.
    out = (
        verified.groupBy("new_id")
        .agg(
            F.max_by(
                "dup_of", F.struct(F.col("jaccard"), (-F.col("dup_of")))
            ).alias("dup_of"),
            F.round(F.max("jaccard"), 6).alias("jaccard"),
        )
        # r17 (guide §5 caching): callers that act on the matches and
        # then anti-join them (novel-set selection, survivor appends)
        # used to re-run the whole candidate+verify pipeline on the
        # second read; the frame is match-sized, so cache it.
        .persist()
    )
    # index 0 stays the batch-signature frame (the survivor-signatures
    # convention shared with phash_index); the self-handle rides
    # behind it so the caller's unpersist_deps releases both.
    out._cached_deps = [new_sig, out]  # type: ignore[attr-defined]
    return out


def append_to_dedup_index(
    batch_docs: DataFrame,
    text_col: str,
    id_col: str,
    index_dir: str,
    use_pandas: bool = True,
    ingest_batch: int = 1,
    idempotent: bool = False,
) -> None:
    """Append an accepted batch's signatures/buckets to the index under
    the ``ingest_batch`` partition (parameters come from the manifest so
    drift is impossible). ``idempotent=True`` switches to dynamic
    partition overwrite — a streaming checkpoint replay then REPLACES
    its own partition instead of appending a second copy; leave it off
    for ad-hoc batch appends (two appends under one ingest_batch value
    would otherwise clobber each other).

    The manifest's ``max_bucket`` cap is enforced on the append path
    (``index_tombstones.capped_append_buckets``, the ONE cap
    implementation shared with phash_index: combined new + stored-LIVE
    size per band key — own-partition excluded for replay stability,
    tombstones anti-joined out, stored side broadcast-semi-pruned to
    the batch's keys) — hot buckets dropped at build must not creep
    back in through appends. Dropped-key counts accumulate under
    ``Oversized buckets dropped (append)``."""
    manifest = read_manifest(index_dir)
    n = int(manifest["shingle_n"])
    num_perm = int(manifest["num_perm"])
    bands = int(manifest["bands"])
    max_bucket = int(manifest["max_bucket"])
    rows = num_perm // bands
    # localCheckpoint, not persist (r17, guide §5): a batch frame
    # whose lineage reads the index paths (e.g. survivors derived from
    # an indexed check) would have its cache invalidated by the first
    # dataset write below (Spark recaches-by-path on write), making
    # the second write re-run the whole upstream pipeline; the
    # checkpoint rebases the frame on materialized partitions. See
    # phash_index.append_to_phash_index for the full rationale.
    sig = with_minhash_signature(
        shingle_sets(batch_docs, text_col, id_col, n, use_pandas=use_pandas)
        .withColumnRenamed(id_col, "id"),
        num_perm,
        use_pandas,
    ).localCheckpoint(eager=True)

    def _write(df: DataFrame, name: str) -> None:
        writer = df.withColumn("ingest_batch", F.lit(int(ingest_batch))).write
        if idempotent:
            writer = writer.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            )
        else:
            writer = writer.mode("append")
        writer.partitionBy("ingest_batch").parquet(os.path.join(index_dir, name))

    _write(sig, "signatures")
    from batch_process_dpla_index_spark.products.index_tombstones import (
        capped_append_buckets,
    )

    new_buckets = _band_buckets(sig, bands, rows).persist()
    capped, n_dropped = capped_append_buckets(
        sig.sparkSession, index_dir, new_buckets, ["band", "key"],
        max_bucket, ingest_batch, id_field="id",
    )
    _write(capped, "buckets")
    new_buckets.unpersist()
    sig.unpersist()
    if n_dropped:
        prev = int(manifest.get("Oversized buckets dropped (append)", "0"))
        manifest["Oversized buckets dropped (append)"] = str(prev + n_dropped)
        write_manifest(manifest, index_dir)


def delete_from_dedup_index(
    spark: SparkSession,
    index_dir: str,
    ids,
    id_col: str | None = None,
    compact_threshold: float = 0.2,
    bucket_partitions: int | None = None,
    recount: bool = True,
) -> dict[str, str]:
    """Tombstone doc ids out of the index (takedown/opt-out) —
    O(|ids|) work, no signature/bucket rewrite until the tombstoned
    fraction reaches ``compact_threshold``. A delete removes every
    copy of the id PRESENT at delete time (watermarked on
    ``ingest_batch``); a later re-append of the same id is new data
    and serves normally. The serve path
    (:func:`incremental_dedup_indexed`) anti-joins the set out of the
    stored signatures, so a tombstoned doc can never be reported as a
    ``dup_of`` match again. Returns the updated manifest.

    Shared mechanics: ``products.index_tombstones`` (the ann/embedding
    index takedown path), parameterized with the signatures+buckets
    dataset layout."""
    from batch_process_dpla_index_spark.products.index_tombstones import (
        delete_from_index,
    )

    return delete_from_index(
        spark, index_dir, ids, "id", id_col=id_col,
        compact_threshold=compact_threshold,
        cell_partitions=bucket_partitions,
        recount=recount,
        datasets=_TOMBSTONE_DATASETS,
    )


def compact_dedup_index(
    spark: SparkSession, index_dir: str, bucket_partitions: int | None = None
) -> dict[str, str]:
    """Force the tombstone compaction regardless of fraction — the
    explicit vacuum step: signatures AND bucket postings of tombstoned
    ids are physically rewritten out under the failure-safe swap."""
    from batch_process_dpla_index_spark.products.index_tombstones import (
        compact_index_tombstones,
    )

    return compact_index_tombstones(
        spark, index_dir, "id",
        cell_partitions=bucket_partitions,
        datasets=_TOMBSTONE_DATASETS,
    )
