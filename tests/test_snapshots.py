"""Versioned-dataset product (`products/snapshots.py`): commit log,
time travel, rollback, optimistic-concurrency conflicts, vacuum, and
transactional compaction."""

from __future__ import annotations

import os

import pytest

from batch_process_dpla_index_spark.products.snapshots import (
    CommitConflict,
    _commit,
    commit_append,
    commit_overwrite,
    compact_snapshot,
    history,
    latest_version,
    read_snapshot,
    rollback,
    snapshot_files,
    vacuum,
)


def _frame(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def _ids(spark, root, version=None):
    return sorted(
        r.k for r in read_snapshot(spark, root, version).collect()
    )


def test_append_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v0 = commit_append(_frame(spark, 0, 10), root)
    v1 = commit_append(_frame(spark, 10, 20), root)
    assert (v0, v1) == (0, 1)
    assert _ids(spark, root) == list(range(20))
    assert _ids(spark, root, version=0) == list(range(10))
    assert [e["op"] for e in history(root)] == ["append", "append"]


def test_overwrite_keeps_old_versions_readable(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 10), root)
    commit_overwrite(_frame(spark, 100, 105), root)
    assert _ids(spark, root) == list(range(100, 105))
    assert _ids(spark, root, version=0) == list(range(10))


def test_rollback_is_a_new_commit(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 10), root)
    commit_overwrite(_frame(spark, 100, 105), root)
    v = rollback(root, 0)
    assert v == 2
    assert _ids(spark, root) == list(range(10))
    # history is append-only: the overwrite version is still there
    assert _ids(spark, root, version=1) == list(range(100, 105))


def test_commit_conflict_detected_and_retried(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 5), root)
    # a racing writer claims version 1 out from under us
    _commit(root, "append", [], [], expected_version=0)
    with pytest.raises(CommitConflict):
        _commit(root, "append", [], [], expected_version=0)
    # the public API retries on fresh state and lands on version 2
    assert commit_append(_frame(spark, 5, 10), root) == 2
    assert _ids(spark, root) == list(range(10))


def test_vacuum_reaps_only_unreferenced_files(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 10), root)
    commit_overwrite(_frame(spark, 100, 105), root)
    deleted = vacuum(root, keep_versions=1)
    assert deleted  # version-0 files are gone
    assert _ids(spark, root) == list(range(100, 105))  # latest intact
    for f in snapshot_files(root):
        assert os.path.exists(f)


def test_compact_snapshot_transactional(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for i in range(6):
        commit_append(_frame(spark, i * 10, (i + 1) * 10).coalesce(2), root)
    before = latest_version(root)
    n_files_before = len(snapshot_files(root))
    v = compact_snapshot(spark, root, target_bytes=64 * 1024 * 1024)
    assert v == before + 1
    assert _ids(spark, root) == list(range(60))  # same rows
    assert len(snapshot_files(root)) < n_files_before  # fewer files
    # pre-compaction version still time-travelable until vacuum
    assert _ids(spark, root, version=before) == list(range(60))
    vacuum(root, keep_versions=1)
    assert _ids(spark, root) == list(range(60))


def test_zone_map_data_skipping(spark, tmp_path):
    root = str(tmp_path / "tbl")
    # three appends with disjoint key ranges, zone maps on k
    from batch_process_dpla_index_spark.products.snapshots import prune_files

    for lo in (0, 100, 200):
        commit_append(
            _frame(spark, lo, lo + 100).coalesce(2), root, stats_cols=["k"]
        )
    n_total = len(snapshot_files(root))
    kept, pruned = prune_files(root, [("k", ">=", 250)])
    assert pruned >= n_total - 2 and kept  # only the last batch survives
    got = sorted(
        r.k for r in read_snapshot(spark, root, predicates=[("k", ">=", 250)]).collect()
    )
    assert got == list(range(250, 300))  # pruning is exact, not lossy
    # equality inside a covered range
    got = read_snapshot(spark, root, predicates=[("k", "=", 150)]).collect()
    assert [r.k for r in got] == [150]


def test_zone_map_conservative_without_stats(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 50), root)  # no stats_cols
    from batch_process_dpla_index_spark.products.snapshots import prune_files

    kept, pruned = prune_files(root, [("k", ">=", 9999)])
    assert pruned == 0  # nothing proves non-match → nothing pruned
    # all-pruned predicate on a stats'd table still returns exact empty
    commit_overwrite(_frame(spark, 0, 10), root)
    commit_append(_frame(spark, 10, 20), root, stats_cols=["k"])
    got = read_snapshot(spark, root, predicates=[("k", ">", 10_000)]).collect()
    assert got == []


def test_vacuum_orphan_grace_protects_inflight_commits(spark, tmp_path):
    """Data files not yet referenced by any log entry (an in-flight
    commit writes files BEFORE its log entry) survive vacuum inside
    the grace period and are reaped once it expires."""
    import glob

    from batch_process_dpla_index_spark.products.snapshots import _DATA

    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 10), root)
    # simulate an in-flight commit: files on disk, no log entry yet
    orphan_dir = str(tmp_path / "tbl" / _DATA / "binflight")
    _frame(spark, 50, 60).coalesce(1).write.parquet(orphan_dir)
    n_orphans = len(glob.glob(orphan_dir + "/*.parquet"))
    assert n_orphans > 0
    assert vacuum(root, keep_versions=1) == []  # grace: nothing reaped
    assert len(glob.glob(orphan_dir + "/*.parquet")) == n_orphans
    # grace expired (orphan_grace_s=0): the lost-race files are reaped,
    # the committed snapshot is untouched
    deleted = vacuum(root, keep_versions=1, orphan_grace_s=0.0)
    assert len(deleted) == n_orphans
    assert _ids(spark, root) == list(range(10))


def test_streaming_ingest_to_snapshot_exactly_once(spark, tmp_path):
    """foreachBatch → commit_append lands each micro-batch as an
    atomic snapshot version; re-running against the same snapshot log
    with a fresh checkpoint (forcing full batch replay) commits
    nothing new — the stream_batch_id ledger makes replays no-ops."""
    from batch_process_dpla_index_spark.products.streaming_ingest import (
        ingest_to_snapshot_available,
    )

    src = str(tmp_path / "src")
    root = str(tmp_path / "tbl")
    df = _frame(spark, 0, 100)
    df.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    counts = ingest_to_snapshot_available(
        spark, src, schema, root, str(tmp_path / "ckpt1")
    )
    assert sum(counts.values()) == 100
    assert _ids(spark, root) == list(range(100))
    v_before = latest_version(root)

    # fresh checkpoint = every batch replays from scratch; the ledger
    # must swallow them all
    counts2 = ingest_to_snapshot_available(
        spark, src, schema, root, str(tmp_path / "ckpt2")
    )
    assert counts2 == {}
    assert latest_version(root) == v_before
    assert _ids(spark, root) == list(range(100))


def test_nonexistent_version_raises(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 10), root)
    with pytest.raises(ValueError, match="version 999 does not exist"):
        read_snapshot(spark, root, version=999)


def test_rollback_refuses_vacuumed_version(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 10), root)
    commit_overwrite(_frame(spark, 100, 105), root)
    vacuum(root, keep_versions=1)
    with pytest.raises(FileNotFoundError, match="already vacuumed"):
        rollback(root, 0)
    assert _ids(spark, root) == list(range(100, 105))  # table intact


def test_zone_maps_on_timestamp_column(spark, tmp_path):
    """Zone maps on non-JSON-native types (timestamps) serialize as
    ISO strings and still prune correctly — ISO lexicographic order
    equals temporal order."""
    import datetime as dt

    from batch_process_dpla_index_spark.products.snapshots import prune_files

    root = str(tmp_path / "tbl")
    for day in (1, 10, 20):
        rows = [(i, dt.datetime(2024, 1, day, i)) for i in range(5)]
        df = spark.createDataFrame(rows, ["k", "ts"]).coalesce(1)
        commit_append(df, root, stats_cols=["ts"])
    kept, pruned = prune_files(root, [("ts", ">=", dt.datetime(2024, 1, 15))])
    assert pruned == 2 and len(kept) == 1
    got = read_snapshot(
        spark, root, predicates=[("ts", ">=", dt.datetime(2024, 1, 15))]
    ).collect()
    assert len(got) == 5 and all(r.ts.day == 20 for r in got)


def test_checkpoint_replay_equivalence(spark, tmp_path):
    """Resolution through a checkpoint equals full-log replay: same
    files, same time travel, same zone-map pruning; versions behind
    the checkpoint stay reachable (the log is never pruned)."""
    from batch_process_dpla_index_spark.products.snapshots import (
        prune_files,
        snapshot_files as sf,
        write_checkpoint,
    )

    root = str(tmp_path / "tbl")
    for lo in (0, 100, 200):
        commit_append(
            _frame(spark, lo, lo + 100).coalesce(1), root, stats_cols=["k"]
        )
    full = sf(root)
    cp_v = write_checkpoint(root)
    assert cp_v == 2
    assert sf(root) == full  # checkpointed resolution identical
    commit_append(_frame(spark, 300, 400).coalesce(1), root, stats_cols=["k"])
    assert _ids(spark, root) == list(range(400))
    # time travel to a pre-checkpoint version still replays correctly
    assert _ids(spark, root, version=0) == list(range(100))
    # zone maps survive the checkpoint: stats from before AND after it
    kept, pruned = prune_files(root, [("k", ">=", 350)])
    assert len(kept) == 1 and pruned == 3


def test_auto_checkpoint_cadence(spark, tmp_path, monkeypatch):
    import glob

    from batch_process_dpla_index_spark.products import snapshots

    monkeypatch.setattr(snapshots, "CHECKPOINT_EVERY", 4)
    root = str(tmp_path / "tbl")
    for i in range(6):
        commit_append(_frame(spark, i * 10, i * 10 + 10).coalesce(1), root)
    cps = glob.glob(str(tmp_path / "tbl" / "_log" / "*.checkpoint.json"))
    assert len(cps) == 1 and cps[0].endswith("00000004.checkpoint.json")
    assert _ids(spark, root) == list(range(60))


def test_ledger_rides_checkpoint(spark, tmp_path):
    """The exactly-once ledger survives checkpointing: batch ids from
    before the checkpoint are found via its sidecar, newer ones via
    entry replay, and the replayed stream still commits nothing."""
    from batch_process_dpla_index_spark.products.snapshots import (
        committed_stream_batch_ids,
        write_checkpoint,
    )
    from batch_process_dpla_index_spark.products.streaming_ingest import (
        ingest_to_snapshot_available,
    )

    src = str(tmp_path / "src")
    root = str(tmp_path / "tbl")
    _frame(spark, 0, 50).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    counts = ingest_to_snapshot_available(
        spark, src, schema, root, str(tmp_path / "ck1")
    )
    assert sum(counts.values()) == 50
    write_checkpoint(root)
    commit_append(
        _frame(spark, 50, 60), root, params={"stream_batch_id": "post-cp"}
    )
    ids = committed_stream_batch_ids(root)
    assert "0" in ids and "post-cp" in ids
    # full replay against the checkpointed ledger: still a no-op
    assert ingest_to_snapshot_available(
        spark, src, schema, root, str(tmp_path / "ck2")
    ) == {}
    assert _ids(spark, root) == list(range(60))


def test_zone_map_tz_aware_predicate(spark, tmp_path):
    """A tz-aware predicate is normalized to UTC-naive before the
    lexicographic compare (the UTC-session Spark stats are UTC wall
    times), so the offset suffix can't corrupt pruning. Asserted at
    the prune_files level over MULTIPLE files — read_snapshot's
    keep-one-file schema fallback would otherwise mask a wrong
    all-pruned result on a single-file table."""
    import datetime as dt

    from batch_process_dpla_index_spark.products.snapshots import prune_files

    root = str(tmp_path / "tbl")
    for day in (10, 15):
        rows = [(i, dt.datetime(2024, 1, day, 5 + i)) for i in range(3)]
        commit_append(
            spark.createDataFrame(rows, ["k", "ts"]).coalesce(1),
            root,
            stats_cols=["ts"],
        )
    # 10:00+05:00 on the 15th == 05:00 UTC — the day-15 file matches
    # and must survive pruning; without the tz normalization its
    # '+05:00' suffix sorts past the stored naive hi bound and the
    # file would be (wrongly) pruned too
    aware = dt.datetime(
        2024, 1, 15, 10, 0, tzinfo=dt.timezone(dt.timedelta(hours=5))
    )
    kept, pruned = prune_files(root, [("ts", ">=", aware)])
    assert pruned == 1 and len(kept) == 1  # day-10 pruned, day-15 kept
    got = read_snapshot(spark, root, predicates=[("ts", ">=", aware)]).collect()
    assert sorted(r.k for r in got) == [0, 1, 2] and all(
        r.ts.day == 15 for r in got
    )


def test_zone_map_type_mismatch_never_prunes(spark, tmp_path):
    """A reader predicate whose value is incomparable with the stored
    stats (string vs int-column bounds and vice versa) must cost an
    over-read, not a TypeError: _may_match's conservative contract is
    'False only on proof of non-match'."""
    from batch_process_dpla_index_spark.products.snapshots import prune_files

    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 50).coalesce(1), root, stats_cols=["k"])
    for op in ("=", ">=", ">", "<=", "<"):
        kept, pruned = prune_files(root, [("k", op, "not-a-number")])
        assert pruned == 0 and kept  # mismatch → never prune, never raise


def test_commit_append_idempotency_key(spark, tmp_path):
    """The stream-ledger CAS: a second append carrying an
    already-committed idempotency key no-ops (returns None) — the
    multi-writer double-commit guard behind
    ingest_to_snapshot_available."""
    root = str(tmp_path / "tbl")
    v = commit_append(_frame(spark, 0, 10), root, params={"stream_batch_id": "7"},
                      idempotency_key="7")
    assert v == 0
    # rival writer replays the same batch
    assert commit_append(_frame(spark, 0, 10), root,
                         params={"stream_batch_id": "7"},
                         idempotency_key="7") is None
    assert latest_version(root) == 0  # no second version
    assert _ids(spark, root) == list(range(10))  # no duplicated rows
    # a DIFFERENT key still lands normally
    assert commit_append(_frame(spark, 10, 20), root,
                         params={"stream_batch_id": "8"},
                         idempotency_key="8") == 1


def test_commit_append_idempotency_mid_write_race(spark, tmp_path, monkeypatch):
    """The TOCTOU window: a rival lands the SAME key while our writer
    is inside _write_batch (after the ledger check). The pinned
    version CAS must trip, the ledger re-read must find the key, and
    our commit must no-op — no double-committed batch, ever."""
    from batch_process_dpla_index_spark.products import snapshots

    root = str(tmp_path / "tbl")
    real_write = snapshots._write_batch
    raced = {"done": False}

    def write_with_rival(df, r, tag):
        files = real_write(df, r, tag)
        if not raced["done"]:
            raced["done"] = True
            # rival writer lands key '7' while we're "still writing"
            rival = real_write(_frame(spark, 0, 10), r, "rivaltag")
            snapshots._commit(r, "append", rival, [], {"stream_batch_id": "7"})
        return files

    monkeypatch.setattr(snapshots, "_write_batch", write_with_rival)
    v = snapshots.commit_append(
        _frame(spark, 0, 10), root,
        params={"stream_batch_id": "7"}, idempotency_key="7",
    )
    assert v is None  # our attempt detected the rival and no-op'd
    assert snapshots.latest_version(root) == 0  # only the rival's commit
    assert _ids(spark, root) == list(range(10))  # rows not duplicated


def test_commit_append_idempotency_key_self_recorded(spark, tmp_path):
    """idempotency_key alone (no params) must still arm the ledger:
    the key is recorded into the commit's own params."""
    from batch_process_dpla_index_spark.products import snapshots

    root = str(tmp_path / "tbl")
    assert commit_append(_frame(spark, 0, 5), root, idempotency_key="k1") == 0
    assert "k1" in snapshots.committed_stream_batch_ids(root)
    assert commit_append(_frame(spark, 0, 5), root, idempotency_key="k1") is None
    assert _ids(spark, root) == list(range(5))


def test_cluster_by_tightens_zone_maps(spark, tmp_path):
    """Same rows, two layouts: round-robin (every file spans the whole
    key domain → zone maps prune nothing) vs cluster_by (files own
    disjoint ranges → a narrow predicate prunes all but one file).
    Results identical; pruning strictly better clustered."""
    from batch_process_dpla_index_spark.products.snapshots import prune_files

    df = _frame(spark, 0, 400)
    rr = str(tmp_path / "roundrobin")
    commit_append(df.repartition(4), rr, stats_cols=["k"])
    cl = str(tmp_path / "clustered")
    commit_append(df, cl, cluster_by=["k"], cluster_partitions=4)

    pred = [("k", ">=", 390)]
    kept_rr, pruned_rr = prune_files(rr, pred)
    kept_cl, pruned_cl = prune_files(cl, pred)
    assert pruned_rr == 0  # round-robin: every file's [min,max] matches
    assert pruned_cl >= len(kept_cl)  # clustered: most files proven out
    got = sorted(
        r.k for r in read_snapshot(spark, cl, predicates=pred).collect()
    )
    assert got == list(range(390, 400))  # pruning is exact
    # cluster_by implies stats on the cluster columns (no stats_cols passed)
    assert pruned_cl > 0


def test_merge_into_rewrites_only_touched_files(spark, tmp_path):
    """Copy-on-write MERGE: with a key-clustered table, a delta
    touching one file's range rewrites that file only — the commit's
    remove list stays a strict subset, untouched files survive by
    reference, and the result matches apply_changeset semantics."""
    from batch_process_dpla_index_spark.products import snapshots

    root = str(tmp_path / "tbl")
    # three clustered appends with disjoint ranges -> >= 3 files
    for lo in (0, 100, 200):
        commit_append(_frame(spark, lo, lo + 100), root,
                      cluster_by=["k"], cluster_partitions=2)
    n_files_before = len(snapshot_files(root))
    pre = snapshots.latest_version(root)

    changes = spark.createDataFrame(
        [(5, "U"), (7, "D"), (9999, "I")], ["k", "op"]
    )
    v = snapshots.merge_into(spark, changes, root, "k", cluster_by=["k"])
    assert v == pre + 1
    entry = snapshots.read_entry(root, v)
    assert entry["op"] == "merge"
    # only the 0-99 range files (plus none other) were rewritten
    assert 0 < len(entry["remove"]) < n_files_before
    got = sorted(r.k for r in read_snapshot(spark, root).collect())
    expect = sorted(set(range(300)) - {7} | {9999})
    assert got == expect
    # time travel: the pre-merge version still reads intact
    assert _ids(spark, root, version=pre) == list(range(300))


def test_merge_into_empty_table_and_pure_inserts(spark, tmp_path):
    from batch_process_dpla_index_spark.products import snapshots

    root = str(tmp_path / "tbl")
    changes = spark.createDataFrame([(1, "I"), (2, "U"), (3, "D")], ["k", "op"])
    v = snapshots.merge_into(spark, changes, root, "k", cluster_by=["k"])
    assert v == 0
    assert _ids(spark, root) == [1, 2]  # D on a missing key is a no-op
    # pure-insert delta outside every live (zone-mapped) range:
    # zero files rewritten — the merge is effectively an append
    ins = spark.createDataFrame([(50, "I"), (51, "I")], ["k", "op"])
    v2 = snapshots.merge_into(spark, ins, root, "k")
    entry = snapshots.read_entry(root, v2)
    assert entry["remove"] == []
    assert _ids(spark, root) == [1, 2, 50, 51]


def test_merge_into_without_stats_degrades_to_full_rewrite(spark, tmp_path):
    """No zone maps on the key -> every file is conservatively touched;
    the merge is a full rewrite but the result is still exact."""
    from batch_process_dpla_index_spark.products import snapshots

    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 100).coalesce(2), root)  # no stats
    changes = spark.createDataFrame([(0, "D"), (500, "I")], ["k", "op"])
    v = snapshots.merge_into(spark, changes, root, "k")
    entry = snapshots.read_entry(root, v)
    assert len(entry["remove"]) == len(
        snapshots.read_entry(root, 0)["add"]
    )  # all prior files rewritten
    assert _ids(spark, root) == list(range(1, 100)) + [500]


def test_snapshot_merge_cli(spark, tmp_path):
    """`jobs.py snapshot merge --key k --cluster-by k` end to end."""
    from batch_process_dpla_index_spark import jobs
    from batch_process_dpla_index_spark.products import snapshots

    root = str(tmp_path / "tbl")
    base = str(tmp_path / "base.parquet")
    delta = str(tmp_path / "delta.parquet")
    _frame(spark, 0, 100).coalesce(2).write.parquet(base)
    spark.createDataFrame([(1, "D"), (200, "I")], ["k", "op"]).write.parquet(delta)

    assert jobs.main(["snapshot", "append", root, "--input", base,
                      "--cluster-by", "k"]) == 0
    assert jobs.main(["snapshot", "merge", root, "--input", delta,
                      "--key", "k", "--cluster-by", "k"]) == 0
    assert snapshots.read_entry(root, 1)["op"] == "merge"
    assert _ids(spark, root) == sorted(set(range(100)) - {1} | {200})


def test_merge_into_after_all_delete_merge(spark, tmp_path):
    """A CDC stream may empty the table and repopulate it: an
    all-delete merge leaves a version with ZERO live files, and the
    next merge must behave like the empty-table case instead of
    crashing on an empty read."""
    from batch_process_dpla_index_spark.products import snapshots

    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 10).coalesce(1), root, cluster_by=["k"],
                  cluster_partitions=1)
    wipe = spark.createDataFrame([(k, "D") for k in range(10)], ["k", "op"])
    snapshots.merge_into(spark, wipe, root, "k")
    assert _ids(spark, root) == []
    refill = spark.createDataFrame([(7, "I"), (8, "I")], ["k", "op"])
    snapshots.merge_into(spark, refill, root, "k")
    assert _ids(spark, root) == [7, 8]
    # the strict zero-live-files case (an empty rewrite that produced
    # NO part files at all): forge it at the log level, then merge
    live = [os.path.relpath(f, root) for f in snapshot_files(root)]
    snapshots._commit(root, "merge", [], live)
    assert snapshot_files(root) == []
    v = snapshots.merge_into(
        spark, spark.createDataFrame([(42, "I")], ["k", "op"]), root, "k"
    )
    assert snapshots.read_entry(root, v)["remove"] == []
    assert _ids(spark, root) == [42]


def test_merge_into_timestamp_key_is_conservative(spark, tmp_path):
    """Zone bounds for timestamp columns are stored as ISO strings; a
    timestamp merge key must NOT be compared against them through a
    session-TZ-dependent cast — a shifted compare would silently skip
    a file (a corrupted merge, not an over-read). Such keys rewrite
    everything, correctly."""
    import datetime as dt

    from batch_process_dpla_index_spark.products import snapshots

    root = str(tmp_path / "tbl")
    rows = [(i, dt.datetime(2024, 1, 1 + i)) for i in range(4)]
    spark_df = spark.createDataFrame(rows, ["k", "ts"])
    commit_append(spark_df.coalesce(2), root, stats_cols=["ts"])
    n_files = len(snapshot_files(root))
    changes = spark.createDataFrame(
        [(9, dt.datetime(2024, 2, 1), "I")], ["k", "ts", "op"]
    )
    v = snapshots.merge_into(spark, changes, root, "ts")
    # conservative: ALL files rewritten (no zone-prune for timestamps)
    assert len(snapshots.read_entry(root, v)["remove"]) == n_files
    got = sorted(r.k for r in read_snapshot(spark, root).collect())
    assert got == [0, 1, 2, 3, 9]


def test_checkpoint_prunes_dead_file_stats(spark, tmp_path, monkeypatch):
    """Zone-map stats of files replaced by merges must not ride every
    future checkpoint — steady-state CDC would grow the sidecar
    without bound."""
    from batch_process_dpla_index_spark.products import snapshots

    monkeypatch.setattr(snapshots, "CHECKPOINT_EVERY", 4)
    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 40).coalesce(1), root, cluster_by=["k"],
                  cluster_partitions=1)
    for i in range(4):  # each merge replaces the single live file
        delta = spark.createDataFrame([(i, "U")], ["k", "op"])
        snapshots.merge_into(spark, delta, root, "k", cluster_by=["k"],
                             cluster_partitions=1)
    cp = snapshots._latest_checkpoint(root, None)
    assert cp is not None
    live = set(cp["files"])
    assert set(cp["stats"]) <= live  # no dead-file stats in the sidecar
    assert _ids(spark, root) == list(range(40))


def test_merge_randomized_against_model(spark, tmp_path):
    """Seeded randomized append/merge/compact sequence checked against
    an in-memory dict model after every operation — the model-based
    test for the CDC path (hypothesis-style, but one seeded run:
    per-example Spark jobs are too slow for example fan-out)."""
    import random

    from batch_process_dpla_index_spark.products import snapshots

    rng = random.Random(0xC0FFEE)
    root = str(tmp_path / "tbl")
    model: dict[int, int] = {}

    def check():
        got = {
            (r.k, r.v)
            for r in read_snapshot(spark, root).collect()
        } if snapshots.latest_version(root) is not None else set()
        assert got == set(model.items())

    for step in range(8):
        op = rng.choice(["append", "merge", "merge", "compact"])
        if op == "append" or snapshots.latest_version(root) is None:
            fresh = {
                k: rng.randrange(1000)
                for k in rng.sample(range(10_000), rng.randrange(1, 40))
                if k not in model
            }
            if not fresh:
                continue
            df = spark.createDataFrame(
                sorted(fresh.items()), ["k", "v"]
            )
            commit_append(df, root, cluster_by=["k"], cluster_partitions=2)
            model.update(fresh)
        elif op == "merge":
            keys = rng.sample(range(10_000), rng.randrange(1, 30))
            rows, ops = [], []
            for k in keys:
                o = rng.choice(["I", "U", "D"])
                v = rng.randrange(1000)
                rows.append((k, v, o))
                ops.append((k, v, o))
            df = spark.createDataFrame(rows, ["k", "v", "op"])
            snapshots.merge_into(
                spark, df, root, "k",
                cluster_by=["k"], cluster_partitions=2,
            )
            for k, v, o in ops:
                if o == "D":
                    model.pop(k, None)
                else:
                    model[k] = v
        else:
            snapshots.compact_snapshot(
                spark, root, target_bytes=64 * 1024 * 1024
            )
        check()


# --- schema evolution ------------------------------------------------------


def _ev_frames(spark):
    from pyspark.sql import functions as F

    old = spark.range(0, 3).select(F.col("id").alias("k"))
    new = spark.range(10, 13).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
    )
    return old, new


def test_append_new_column_reads_merged_with_nulls(spark, tmp_path):
    from batch_process_dpla_index_spark.products.snapshots import table_schema

    root = str(tmp_path / "tbl")
    old, new = _ev_frames(spark)
    commit_append(old, root)
    commit_append(new, root)
    df = read_snapshot(spark, root)
    assert df.columns == ["k", "extra"]  # first-appearance column order
    got = {r.k: r.extra for r in df.collect()}
    assert got == {0: None, 1: None, 2: None, 10: 20, 11: 22, 12: 24}
    # time travel shows the PRE-evolution schema
    assert read_snapshot(spark, root, version=0).columns == ["k"]
    assert [f.name for f in table_schema(root).fields] == ["k", "extra"]


def test_append_type_change_rejected_before_write(spark, tmp_path):
    from pyspark.sql import functions as F

    from batch_process_dpla_index_spark.products.snapshots import (
        SchemaEvolutionError,
    )

    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 3), root)
    bad = spark.range(3).select(F.col("id").cast("string").alias("k"))
    files_before = snapshot_files(root)
    with pytest.raises(SchemaEvolutionError, match="column 'k'"):
        commit_append(bad, root)
    # the gate fires BEFORE the batch write: no orphan files, no commit
    assert snapshot_files(root) == files_before
    assert latest_version(root) == 0


def test_merge_type_change_rejected_before_write(spark, tmp_path):
    """merge_into gets the same commit-time evolution gate as
    commit_append: a type-conflicting changeset fails the WRITE — it
    must not silently widen via unionByName, commit a conflicting
    __schema, and break every later read/append of the table."""
    from pyspark.sql import functions as F

    from batch_process_dpla_index_spark.products.snapshots import (
        SchemaEvolutionError,
        merge_into,
    )

    root = str(tmp_path / "tbl")
    commit_append(_frame(spark, 0, 3), root)
    bad = spark.range(3).select(
        F.col("id").cast("string").alias("k"), F.lit("U").alias("op")
    )
    files_before = snapshot_files(root)
    with pytest.raises(SchemaEvolutionError, match="column 'k'"):
        merge_into(spark, bad, root, "k")
    assert snapshot_files(root) == files_before  # no orphans, no commit
    assert latest_version(root) == 0
    # the table still reads and appends cleanly after the refused merge
    commit_append(_frame(spark, 3, 6), root)
    assert read_snapshot(spark, root).count() == 6


def test_overwrite_resets_schema_and_time_travel_keeps_both(spark, tmp_path):
    root = str(tmp_path / "tbl")
    old, new = _ev_frames(spark)
    commit_append(old, root)
    commit_append(new, root)
    commit_overwrite(old, root)  # drops 'extra' going forward
    assert read_snapshot(spark, root).columns == ["k"]
    assert read_snapshot(spark, root, version=1).columns == ["k", "extra"]


def test_evolved_schema_survives_checkpoint(spark, tmp_path):
    from batch_process_dpla_index_spark.products.snapshots import (
        write_checkpoint,
    )

    root = str(tmp_path / "tbl")
    old, new = _ev_frames(spark)
    commit_append(old, root)
    commit_append(new, root)
    write_checkpoint(root)
    commit_append(old, root)  # post-checkpoint entry, pre-evolution shape
    df = read_snapshot(spark, root)
    assert df.columns == ["k", "extra"]  # order preserved across the sidecar
    assert df.count() == 9


def test_rollback_restores_pre_evolution_schema(spark, tmp_path):
    root = str(tmp_path / "tbl")
    old, new = _ev_frames(spark)
    commit_append(old, root)
    commit_append(new, root)
    rollback(root, 0)
    assert read_snapshot(spark, root).columns == ["k"]


def test_compaction_refuses_heterogeneous_schemas(spark, tmp_path):
    from batch_process_dpla_index_spark.products.snapshots import (
        SchemaEvolutionError,
    )

    root = str(tmp_path / "tbl")
    old, new = _ev_frames(spark)
    commit_append(old, root)
    commit_append(new, root)
    with pytest.raises(
        SchemaEvolutionError, match="distinct recorded live file"
    ):
        compact_snapshot(spark, root, target_bytes=1 << 20)
    # uniform table still compacts, carrying its schema forward
    commit_overwrite(new, root)
    v = compact_snapshot(spark, root, target_bytes=1 << 20)
    assert read_snapshot(spark, root, version=v).columns == ["k", "extra"]


def test_merge_into_reads_evolved_table_uniformly(spark, tmp_path):
    from pyspark.sql import functions as F

    from batch_process_dpla_index_spark.products.snapshots import merge_into

    root = str(tmp_path / "tbl")
    old, new = _ev_frames(spark)
    commit_append(old, root)
    commit_append(new, root)
    changes = spark.createDataFrame(
        [(1, 99, "U"), (10, None, "D")], ["k", "extra", "op"]
    ).select(
        F.col("k").cast("bigint"),
        F.col("extra").cast("bigint"),
        F.col("op"),
    )
    merge_into(spark, changes, root, key="k")
    got = {r.k: r.extra for r in read_snapshot(spark, root).collect()}
    # old-file row 1 updated WITH the evolved column; 10 deleted;
    # untouched rows keep NULL extra
    assert got == {0: None, 1: 99, 2: None, 11: 22, 12: 24}


def test_compaction_refuses_legacy_plus_evolved_mix(spark, tmp_path, monkeypatch):
    """A live file with NO recorded schema mixed with recorded ones is
    as lossy to compact as two recorded schemas — and used to slip
    through the distinct-recorded-schemas check."""
    import batch_process_dpla_index_spark.products.snapshots as snap

    root = str(tmp_path / "tbl")
    old, new = _ev_frames(spark)
    # legacy commit: simulate a pre-feature entry with no __schema
    real_schema_json = snap._schema_json
    monkeypatch.setattr(snap, "_schema_json", lambda df: None)
    monkeypatch.setattr(
        snap, "_check_append_schema", lambda df, root: None
    )
    tag = "blegacy"
    add = snap._write_batch(old, root, tag)
    snap._commit(root, "append", add, [], {})
    monkeypatch.setattr(snap, "_schema_json", real_schema_json)
    commit_append(new, root)  # recorded, evolved
    with pytest.raises(
        snap.SchemaEvolutionError, match="unrecorded live file"
    ):
        compact_snapshot(spark, root, target_bytes=1 << 20)


def test_nullability_only_difference_still_compacts(spark, tmp_path):
    """parquet round trips flip nullable=false to true; that is not a
    schema change and must not block compaction (schemas are recorded
    nullability-normalized)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    df = spark.range(3).select(F.col("id").alias("k"))  # nullable=false
    commit_append(df, root)
    # same shape, read back from parquet: nullable=true
    back = read_snapshot(spark, root)
    commit_append(back, root)
    v = compact_snapshot(spark, root, target_bytes=1 << 20)
    assert read_snapshot(spark, root, version=v).count() == 6


def test_rollback_past_checkpoint_keeps_recorded_schemas(spark, tmp_path):
    """The review repro: checkpoint prunes removed files' schemas from
    the sidecar; a later rollback re-adds those files and must carry
    their schemas in ITS entry, or the evolved table silently demotes
    to footer-inference reads."""
    from batch_process_dpla_index_spark.products.snapshots import (
        table_schema,
        write_checkpoint,
    )

    root = str(tmp_path / "tbl")
    old, new = _ev_frames(spark)
    commit_append(old, root)  # v0
    commit_append(new, root)  # v1 (evolved)
    commit_overwrite(old, root)  # v2: evolution files now dead
    write_checkpoint(root)  # sidecar prunes v0/v1 file schemas
    rollback(root, 1)  # restore the evolved file set
    merged = table_schema(root)
    assert merged is not None, "rollback dropped recorded schemas"
    assert [f.name for f in merged.fields] == ["k", "extra"]
    assert read_snapshot(spark, root).columns == ["k", "extra"]


def test_legacy_raw_schema_entries_normalize_on_read(spark, tmp_path):
    """Entries written before nullability normalization carry raw
    jsonValue schemas; read-side canonicalization must treat them as
    equal to canonical re-records of the same logical schema."""
    import json as _json

    import batch_process_dpla_index_spark.products.snapshots as snap
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    df = spark.range(3).select(F.col("id").alias("k"))
    # v0: simulate a pre-upgrade entry with the RAW (nullable=false)
    # schema json
    add = snap._write_batch(df, root, "b0legacy")
    raw = _json.dumps(df.schema.jsonValue(), sort_keys=True)
    snap._commit(root, "append", add, [], {"__schema": raw})
    # v1: canonical re-record of the same logical schema (read-back
    # flips nullable=true)
    commit_append(read_snapshot(spark, root), root)
    v = compact_snapshot(spark, root, target_bytes=1 << 20)
    assert read_snapshot(spark, root, version=v).count() == 6


def test_rollback_past_checkpoint_keeps_zone_map_stats(spark, tmp_path):
    """Restored files must regain their zone maps, not just their
    schemas — otherwise reads of the restored version scan everything."""
    from pyspark.sql import functions as F

    from batch_process_dpla_index_spark.products.snapshots import (
        prune_files,
        write_checkpoint,
    )

    root = str(tmp_path / "tbl")
    lo = spark.range(0, 10).select(F.col("id").alias("k"))
    hi = spark.range(1000, 1010).select(F.col("id").alias("k"))
    commit_append(lo.coalesce(1), root, stats_cols=["k"])  # v0
    commit_append(hi.coalesce(1), root, stats_cols=["k"])  # v1
    commit_overwrite(lo.coalesce(1), root)  # v2: v0/v1 files dead
    write_checkpoint(root)  # prunes their stats from the sidecar
    rollback(root, 1)  # restore both stat-mapped files
    keep, pruned = prune_files(root, [("k", ">=", 1000)])
    # one file per append: lo's restored file is provably excluded
    # again (without the stats re-record this is 0), hi's survives
    assert pruned == 1 and len(keep) == 1
