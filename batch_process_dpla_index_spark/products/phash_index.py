"""Persisted perceptual-dedup index: the blob twin of
``products.dedup_index`` (which stores MinHash signatures/buckets for
text). A multimodal ingest pipeline at 100 TB does not re-hash the
stored corpus per batch — it keeps each accepted blob's 60-bit
perceptual signature on disk and checks each incoming batch against
the stored banding. The fingerprint is modality-dispatched (r14):
``modality="image"`` uses the byte/pixel blockhash
(``multimodal.phash_images``), ``modality="audio"`` the PCM
energy-envelope blockhash (``multimodal.audio_phash``,
polarity-inversion invariant) — pinned in the manifest so an index
can never be probed under the wrong hasher:

- :func:`build_phash_index` materializes two parquet datasets under
  ``index_dir``: ``signatures`` (id, phash — the exact popcount-verify
  side) and ``buckets`` (band, val, id — the pigeonhole candidate
  side, repartitioned on the join key so batch lookups co-locate),
  plus a ``_MANIFEST`` pinning (bits, max_hamming, max_bucket) — the
  structural parameters that define banding geometry, so an index
  built under one Hamming budget can never be silently queried under
  another. Cost: one corpus Arrow pass (``multimodal.phash_images``).
- :func:`incremental_phash_dedup_indexed` hashes ONLY the new batch,
  explodes it to band keys, equi-joins the stored buckets, and
  popcount-verifies against the stored signatures — the banded
  prefilter is LOSSLESS by pigeonhole (``dedup.banded_hamming_pairs``
  contract, property-tested), so the output is exactly "best stored
  match per new blob within the Hamming budget".
- :func:`append_to_phash_index` lands an accepted batch's
  signatures/buckets under its ``ingest_batch`` partition (idempotent
  replay overwrite for the streaming path).

Both datasets carry the ``ingest_batch`` Hive partition (0 at build)
— the same replay-safety lever as dedup_index: a checkpoint-replayed
micro-batch queries only partitions ``<= max_ingest_batch`` so it can
never match the signatures its own first attempt appended.

Scale: per-batch cost is nbands × |batch| explode + one shuffle join
into the bucket layout (AQE broadcasts the batch side when small);
the ``max_bucket`` cap drops degenerate hot buckets (constant-content
blobs) at build time, once, with the count logged in the manifest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.io.manifest import read_manifest, write_manifest
from batch_process_dpla_index_spark.operators.multimodal import phash_images

#: tombstone dataset layout (products.index_tombstones spec): the
#: per-id signatures dataset is authoritative (watermark/recount);
#: buckets are compacted on the same anti-join, rewritten co-located
#: on the (band, val) join columns
_TOMBSTONE_DATASETS = [
    ("signatures", "id", []),
    ("buckets", "id", ["band", "val"]),
]


def _signature_fn(modality: str):
    """The modality → fingerprint dispatch (r14): every signature is a
    (id, phash bigint) frame through the same banding geometry, so ONE
    index implementation serves both perceptual modalities — the
    manifest pins ``modality`` exactly like (bits, max_hamming), so an
    audio index can never be silently probed with image hashes."""
    if modality == "image":
        return phash_images
    if modality == "audio":
        from batch_process_dpla_index_spark.operators.multimodal import (
            audio_phash,
        )

        return audio_phash
    raise ValueError(
        f"modality={modality!r}: the perceptual index supports "
        "'image' (byte/pixel blockhash) and 'audio' (PCM "
        "energy-envelope blockhash)"
    )


def _phash_bands(sig: DataFrame, bits: int, max_hamming: int) -> DataFrame:
    """(band, val, id): pigeonhole band keys for a (id, phash) frame —
    built from ``dedup.hamming_band_structs``, the ONE definition of
    the banding geometry, so the stored buckets and the in-line pair
    operator (``banded_hamming_pairs``) can never disagree on
    candidate generation."""
    from batch_process_dpla_index_spark.operators.dedup import (
        hamming_band_structs,
    )

    bands = hamming_band_structs("phash", bits, max_hamming)
    return sig.select(
        "id", "phash", F.explode(F.array(*bands)).alias("bk")
    ).select(
        F.col("bk.band").alias("band"), F.col("bk.val").alias("val"), "id"
    )


def build_phash_index(
    blobs: DataFrame,
    bin_col: str,
    id_col: str,
    index_dir: str,
    bits: int = 60,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    bucket_partitions: int | None = None,
    modality: str = "image",
) -> dict[str, str]:
    """One corpus Arrow pass → signatures + capped band buckets +
    manifest. Returns the manifest dict (also written to
    ``index_dir/_MANIFEST``). ``modality`` picks the fingerprint
    (``image`` = byte/pixel blockhash, ``audio`` = PCM energy-envelope
    blockhash — polarity-inversion-invariant, so a flipped-waveform
    re-master of a stored clip dedupes at hamming 0) and is pinned in
    the manifest alongside the banding geometry."""
    sig = _signature_fn(modality)(blobs, bin_col, id_col, bits).persist()
    n_blobs = sig.count()
    if n_blobs == 0:
        # a zero-row signatures/buckets dataset is unreadable on the
        # next query (no part files, no schema) — the same failure mode
        # the rebuild/compact guards in ann_index/embedding_index
        # refuse loudly; refuse here too instead of writing a landmine
        sig.unpersist()
        raise ValueError(
            "build_phash_index: input blobs frame is empty; an empty "
            "index is unreadable — refuse to build it"
        )
    (
        sig.withColumn("ingest_batch", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(os.path.join(index_dir, "signatures"))
    )
    buckets = _phash_bands(sig, bits, max_hamming)
    oversized = (
        buckets.groupBy("band", "val")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") > max_bucket)
        .select("band", "val")
    )
    # r17 (guide §1.2): collect the oversized keys ONCE — the old
    # count()-then-broadcast shape ran the bands explode + groupBy
    # twice per build (manifest count, then the anti-join's broadcast
    # build). The key set is broadcast-bounded by construction; with
    # zero hot keys the anti-join drops out of the write plan.
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
            ["band", "val"],
            "left_anti",
        )
    from batch_process_dpla_index_spark.products.index_tombstones import (
        keyed_repartition,
        overwrite_dataset_readable,
    )

    # empty-safe write: a degenerate corpus (every band key oversized,
    # e.g. all-identical blobs under a small cap) caps away EVERY
    # bucket row, and a zero-row partitionBy write would land an
    # unreadable dataset that crashes the next query
    overwrite_dataset_readable(
        keyed_repartition(capped, bucket_partitions, "band", "val")
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
    # batch-0 rows until the build is re-run — fail-safe for a
    # compliance path.
    from batch_process_dpla_index_spark.products.index_tombstones import (
        clear_tombstones,
    )

    clear_tombstones(index_dir)
    manifest = {
        "bits": str(bits),
        "max_hamming": str(max_hamming),
        "max_bucket": str(max_bucket),
        "modality": modality,
        "Record count": str(n_blobs),
        "Oversized buckets dropped": str(n_dropped),
    }
    write_manifest(manifest, index_dir)
    return manifest


def incremental_phash_dedup_indexed(
    spark: SparkSession,
    new_blobs: DataFrame,
    bin_col: str,
    id_col: str,
    index_dir: str,
    max_ingest_batch: int | None = None,
) -> DataFrame:
    """Dedupe a blob batch against the stored index — no corpus
    re-hash. Output: (new_id, dup_of, hamming), the best stored match
    per new blob (smallest Hamming, ties to smallest stored id) within
    the manifest-pinned budget. Banding parameters come from the
    manifest, never the caller, so a mis-parameterized query is
    impossible. ``max_ingest_batch`` prunes stored partitions for
    checkpoint-replay safety (see module docstring); ``None`` queries
    everything.

    The returned frame carries the batch-signature persist handle in
    ``_cached_deps`` — release with ``dedup.unpersist_deps`` after the
    action."""
    manifest = read_manifest(index_dir)
    bits = int(manifest["bits"])
    max_hamming = int(manifest["max_hamming"])
    # pre-r14 manifests carry no modality key → image (their builder)
    hasher = _signature_fn(manifest.get("modality", "image"))

    new_sig = hasher(new_blobs, bin_col, id_col, bits).persist()
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
        _phash_bands(new_sig, bits, max_hamming)
        .alias("x")
        .join(corp_buckets.alias("y"), ["band", "val"])
        .select(F.col("x.id").alias("new_id"), F.col("y.id").alias("dup_of"))
        # NO distinct (r18, guide §2.4): a pair surfaced by k bands is
        # verified k times — the verify is one bit_count over already-
        # joined longs, far cheaper than the exchange+aggregate a
        # distinct costs per serve action, and duplicate rows cannot
        # change the min_by winner below (the per-pair hamming is a
        # pure function of the pair). The TEXT serve keeps its
        # distinct: its verify is an array-intersection per row, where
        # k-fold duplication is real work.
    )
    sa = new_sig.select(F.col("id").alias("new_id"), F.col("phash").alias("ph_a"))
    sb = corp_sig.select(F.col("id").alias("dup_of"), F.col("phash").alias("ph_b"))
    verified = (
        cand.join(sa, "new_id")
        .join(sb, "dup_of")
        .withColumn(
            "hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    # best match as ONE aggregate instead of row_number-over-window
    # (r18, guide §2.4/§2.3): min_by over struct(hamming, dup_of)
    # picks the exact (hamming ASC, dup_of ASC) winner the old rn==1
    # filter kept (all-integer, unique ordering key), and the winner's
    # hamming IS min(hamming). Plans as SortAggregate (struct buffer),
    # but the map-side partial shrinks the exchange to one row per
    # (task, key) where the window shuffled every candidate row.
    out = (
        verified.groupBy("new_id")
        .agg(
            F.min_by(
                "dup_of", F.struct(F.col("hamming"), F.col("dup_of"))
            ).alias("dup_of"),
            F.min("hamming").alias("hamming"),
        )
        # r17 (guide §5 caching): the ingest hot path reads this frame
        # TWICE — the caller's action, then `survivor_signatures`'s
        # anti-join inside the append — and the second read used to
        # re-run the whole candidate+verify pipeline. The frame is
        # match-sized (bounded by the batch), so caching it is cheap
        # and the append becomes a cache scan.
        .persist()
    )
    # index 0 must stay the batch-signature frame (survivor_signatures
    # contract); the self-handle rides behind it so the caller's
    # unpersist_deps releases both.
    out._cached_deps = [new_sig, out]  # type: ignore[attr-defined]
    return out


def survivor_signatures(matches: DataFrame) -> DataFrame:
    """The (id, phash) frame for the blobs that SURVIVED a
    :func:`incremental_phash_dedup_indexed` check — the check step's
    persisted batch signatures minus the matched ids, ready to pass
    as ``signatures=`` to :func:`append_to_phash_index` so survivors
    are never perceptually hashed twice per batch. This is THE ONE
    place that reaches into the matches frame's ``_cached_deps``
    contract (r17 review: the streaming ingest and the bench target
    each hand-copied this 4-liner; two drifting copies would make the
    bench silently stop measuring the deployed hot path)."""
    batch_sigs = matches._cached_deps[0]  # type: ignore[attr-defined]
    return batch_sigs.join(
        matches.select(F.col("new_id").alias("id")), "id", "left_anti"
    )


def append_to_phash_index(
    batch_blobs: DataFrame,
    bin_col: str,
    id_col: str,
    index_dir: str,
    ingest_batch: int = 1,
    idempotent: bool = False,
    signatures: DataFrame | None = None,
) -> None:
    """Append an accepted batch's signatures/buckets under the
    ``ingest_batch`` partition (parameters from the manifest, so
    banding drift is impossible). ``idempotent=True`` = dynamic
    partition overwrite for streaming checkpoint replays; leave off
    for ad-hoc appends.

    ``signatures``: an already-computed (id, phash) frame for exactly
    these blobs (the embedding twin's ``assigned_cells`` pattern) —
    the ingest path passes the check step's persisted batch signatures
    so survivors are never perceptually hashed twice per micro-batch
    (the Arrow pass over the binary column is the pipeline's most
    expensive stage).

    The manifest's ``max_bucket`` cap is enforced on the APPEND path
    too (``index_tombstones.capped_append_buckets``, the ONE cap
    implementation shared with dedup_index): without it, hot buckets
    dropped at build time creep back in — or grow unboundedly —
    through appends, eroding the documented bound on per-batch
    probe-join cost. The stored side counts only LIVE rows for keys in
    the new batch (broadcast semi-prune; own-partition excluded so a
    checkpoint replay reaches the same drop decisions as its first
    attempt; tombstoned ids anti-joined out so a pending takedown
    can't spuriously drop new rows). Dropped-key counts accumulate
    under ``Oversized buckets dropped (append)`` in the manifest (a
    stat, not data: a checkpoint replay may recount it, but the bucket
    rows themselves stay idempotent under the partition overwrite)."""
    manifest = read_manifest(index_dir)
    bits = int(manifest["bits"])
    max_hamming = int(manifest["max_hamming"])
    max_bucket = int(manifest["max_bucket"])
    # localCheckpoint, not persist (r17, guide §5): the batch frame's
    # lineage reads the INDEX PATHS (survivor signatures derive from
    # the serve path's stored-parquet joins), and Spark invalidates
    # every cached plan referencing a path on write to it — so under a
    # plain persist the FIRST dataset write below evicted the cache and
    # the second write re-ran the whole candidate+verify pipeline.
    # Checkpointing rebases the frame on materialized partitions (no
    # path in the plan), making both writes cache-stable. Lineage is
    # truncated — a lost executor means re-running the append, which is
    # idempotent under the partition-overwrite replay contract.
    sig = (
        signatures.select("id", "phash")
        if signatures is not None
        else _signature_fn(manifest.get("modality", "image"))(
            batch_blobs, bin_col, id_col, bits
        )
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

    new_buckets = _phash_bands(sig, bits, max_hamming).persist()
    capped, n_dropped = capped_append_buckets(
        sig.sparkSession, index_dir, new_buckets, ["band", "val"],
        max_bucket, ingest_batch, id_field="id",
    )
    _write(capped, "buckets")
    new_buckets.unpersist()
    sig.unpersist()
    if n_dropped:
        prev = int(manifest.get("Oversized buckets dropped (append)", "0"))
        manifest["Oversized buckets dropped (append)"] = str(prev + n_dropped)
        write_manifest(manifest, index_dir)


def delete_from_phash_index(
    spark: SparkSession,
    index_dir: str,
    ids,
    id_col: str | None = None,
    compact_threshold: float = 0.2,
    bucket_partitions: int | None = None,
    recount: bool = True,
) -> dict[str, str]:
    """Tombstone image ids out of the index (takedown/opt-out — the
    compliance path that hits the IMAGE index first on a multimodal
    corpus) — O(|ids|) work, no signature/bucket rewrite until the
    tombstoned fraction reaches ``compact_threshold``. A delete
    removes every copy of the id PRESENT at delete time (watermarked
    on ``ingest_batch``); a later re-append of the same id is new data
    and serves normally. The serve path
    (:func:`incremental_phash_dedup_indexed`) anti-joins the set out
    of the stored signatures, so a tombstoned image can never be
    reported as a ``dup_of`` match again — and the dedup-on-ingest
    twin therefore never drops a NEW copy because of a taken-down
    stored one. Returns the updated manifest.

    Shared mechanics: ``products.index_tombstones``, parameterized
    with the signatures+buckets dataset layout."""
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


def compact_phash_index(
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
