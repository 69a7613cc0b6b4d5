"""Versioned parquet datasets: commit log, time travel, rollback,
vacuum, and transactional compaction ("table format lite").

The reference's monthly pipeline versions data by DATED PREFIX and
swaps whole directories (monthly_batch_emr.sh:41-111 sequencing;
JsonlDump.scala:72-74 delete-then-write) — readers between delete and
write see a torn dataset, and history costs a full copy per month.
This product provides the log-structured alternative every modern
lakehouse uses: data files are immutable, a JSON commit log records
(add, remove) file sets per version, and readers resolve a version's
EXACT file list before handing it to `spark.read.parquet(*files)`.

Why it scales:

- A commit is O(|files touched|) driver work + one atomic log-entry
  create. Appending a micro-batch to a 100 TB table writes the new
  parts and a 1 KB log entry — no rewrite, no listing.
- Readers never LIST the data directory (the log IS the listing), so
  eventually-consistent stores and in-flight writers can't tear a
  read; a version's file set is immutable forever.
- Rollback is a metadata commit (restore an old file set); vacuum is
  the only operation that deletes data, and only files unreferenced
  by ANY retained version.
- Concurrency: the next-version log entry is created with
  create-exclusive (O_EXCL), so two racing writers conflict on the
  same version number and the loser retries on fresh state —
  single-table optimistic concurrency, the object-store equivalent
  being a conditional put / DynamoDB-style log service behind the
  same seam.

Log layout under ``<root>/``::

    _log/00000000.json   {"version": 0, "op": "append",
                          "add": ["data/b0-<tag>/part-...parquet", ...],
                          "remove": [], "params": {...}}
    _log/00000001.json   ...
    data/b<version>-<tag>/part-*.parquet   (immutable once committed)
"""

from __future__ import annotations

import json
import logging
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_logger = logging.getLogger(__name__)

_LOG = "_log"
_DATA = "data"


def _fsync_dir(path: str) -> None:
    """Best-effort directory fsync so a just-linked entry survives
    power loss — without it the atomic link is atomic but not
    DURABLE, and a crash could drop a commit the streaming checkpoint
    already counts as delivered (silent data loss on replay).

    Best-effort because it runs AFTER the entry is already linked: on
    filesystems that reject directory fsync (FUSE/network mounts),
    raising here would report a commit that IS in the log as failed —
    and a caller retry would then duplicate the data. Durability
    degrades to the filesystem's own guarantee in that case."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


class SchemaEvolutionError(RuntimeError):
    """A write or read would silently change a column's TYPE (or
    compaction would collapse heterogeneous schemas). Adding columns
    is legal evolution; changing a column's type never is — it would
    corrupt merged reads quietly, so it fails loudly here."""


class CommitConflict(RuntimeError):
    """Another writer committed this version first; retry on fresh state."""


def _log_dir(root: str) -> str:
    return os.path.join(root, _LOG)


def _entry_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"{version:08d}.json")


def read_entry(root: str, version: int) -> dict:
    """One committed entry, by its derivable path — O(1), no directory
    scan (entries are immutable once linked)."""
    with open(_entry_path(root, version), encoding="utf-8") as fh:
        return json.load(fh)


def history(root: str, since_version: int | None = None) -> list[dict]:
    """Commit entries, version-ascending; ``since_version`` loads only
    entries with a STRICTLY GREATER version (the checkpoint replay
    path). Checkpoint sidecars (*.checkpoint.json) are not entries."""
    d = _log_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if not (name.endswith(".json") and name[:-5].isdigit()):
            continue
        if since_version is not None and int(name[:-5]) <= since_version:
            continue
        with open(os.path.join(d, name), encoding="utf-8") as fh:
            out.append(json.load(fh))
    return out


def latest_version(root: str) -> int | None:
    """Newest committed version — from the zero-padded log FILENAMES
    (no JSON parse), so commits stay O(listdir) as the log grows."""
    d = _log_dir(root)
    if not os.path.isdir(d):
        return None
    versions = [
        int(name[:-5])
        for name in os.listdir(d)
        if name.endswith(".json") and name[:-5].isdigit()
    ]
    return max(versions) if versions else None


#: auto-checkpoint cadence: every N commits, _commit materializes the
#: live file list into a sidecar so replay is O(N), not O(versions)
CHECKPOINT_EVERY = 64


def _checkpoint_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"{version:08d}.checkpoint.json")


def _latest_checkpoint(root: str, at_or_before: int | None) -> dict | None:
    """Newest checkpoint sidecar with version <= ``at_or_before``
    (None = no bound). Filename scan only; one JSON read."""
    d = _log_dir(root)
    if not os.path.isdir(d):
        return None
    best = None
    for name in os.listdir(d):
        if not name.endswith(".checkpoint.json"):
            continue
        v = int(name.split(".")[0])
        if (at_or_before is None or v <= at_or_before) and (
            best is None or v > best
        ):
            best = v
    if best is None:
        return None
    with open(_checkpoint_path(root, best), encoding="utf-8") as fh:
        return json.load(fh)


def write_checkpoint(root: str) -> int:
    """Materialize the CURRENT live file list (and unioned zone-map
    stats) into a checkpoint sidecar for the latest version. Replay
    then starts from the checkpoint instead of entry 0 — the log-
    compaction tier for long-lived tables. Idempotent and race-safe:
    a concurrent writer producing the same checkpoint loses the
    atomic link and that's fine (contents are identical)."""
    cur = latest_version(root)
    if cur is None:
        raise FileNotFoundError(f"no snapshot at {root}")
    # ONE pass: locate the previous checkpoint once, read the entries
    # after it once, and fold files + stats + the stream ledger
    # together — three separate checkpoint-resolving calls would
    # re-list and re-parse the same entries three times on the commit
    # hot path. Every field is bounded at `cur`, so two racing
    # writers checkpointing the same version produce byte-identical
    # sidecars (the premise of the lost-link tolerance below).
    prev = _latest_checkpoint(root, cur)
    live: list[str] = list(prev["files"]) if prev else []
    stats: dict = dict(prev["stats"]) if prev else {}
    schemas: dict = dict(prev.get("schemas", {})) if prev else {}
    if prev is not None and "stream_batch_ids" in prev:
        ids = set(prev["stream_batch_ids"])
    elif prev is not None:
        # legacy sidecar without a ledger: rebuild it up to the
        # checkpoint once from the full log
        ids = {
            e["params"]["stream_batch_id"]
            for e in history(root)
            if e["version"] <= prev["version"]
            and "stream_batch_id" in e.get("params", {})
        }
    else:
        ids = set()
    for e in history(root, since_version=prev["version"] if prev else None):
        if e["version"] > cur:
            break
        removed = set(e["remove"])
        live = [f for f in live if f not in removed]
        live.extend(e["add"])
        stats.update(e.get("params", {}).get("__stats", {}))
        sj = e.get("params", {}).get("__schema")
        if sj is not None:
            for f in e["add"]:
                schemas[f] = sj
        for f, s in _pairs(e.get("params", {}).get("__schemas", [])):
            schemas[f] = s
        b = e.get("params", {}).get("stream_batch_id")
        if b is not None:
            ids.add(b)
    # prune stats to LIVE files: with CDC merges, file removal is a
    # steady-state event, and carrying dead files' zone maps forward
    # would grow every future sidecar without bound. Safe for time
    # travel — a checkpoint only ever serves versions >= its own, and
    # a file removed before the checkpoint cannot be live at any of
    # them; readers of newer versions get newer files' stats from the
    # post-checkpoint entries.
    live_set = set(live)
    stats = {f: s for f, s in stats.items() if f in live_set}
    schemas = {f: s for f, s in schemas.items() if f in live_set}
    cp = {
        "version": cur,
        "files": live,
        "stats": stats,
        # ordered PAIR LIST, not an object: the sidecar is dumped with
        # sort_keys=True, which would scramble commit order inside an
        # object — and merged-schema column order is first-appearance
        # order, which must survive the checkpoint boundary
        "schemas": [[f, s] for f, s in schemas.items()],
        "stream_batch_ids": sorted(ids),
    }
    path = _checkpoint_path(root, cur)
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(cp, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        pass  # a racing writer checkpointed the same version
    finally:
        os.unlink(tmp)
    _fsync_dir(_log_dir(root))
    return cur


def committed_stream_batch_ids(root: str) -> set[str]:
    """All ``stream_batch_id`` params ever committed — the streaming
    exactly-once ledger. Checkpoint-accelerated: ids at-or-before the
    newest checkpoint come from its sidecar (older checkpoints
    without the field fall back to a full scan), then only newer
    entries are parsed."""
    cp = _latest_checkpoint(root, None)
    if cp is not None and "stream_batch_ids" in cp:
        ids = set(cp["stream_batch_ids"])
        entries = history(root, since_version=cp["version"])
    else:
        ids = set()
        entries = history(root)
    for e in entries:
        b = e.get("params", {}).get("stream_batch_id")
        if b is not None:
            ids.add(b)
    return ids


def snapshot_files(root: str, version: int | None = None) -> list[str]:
    """Resolve the exact file list at ``version`` (default: latest) by
    replaying (add − remove) through the log — starting from the
    newest checkpoint at or before ``version``, so resolution is
    O(commits since checkpoint). Paths are root-relative in the log,
    absolute in the return. Asking for a version newer than the log
    raises instead of silently serving the latest data under the
    wrong label."""
    newest = latest_version(root)
    if version is not None and (newest is None or version > newest):
        raise ValueError(
            f"version {version} does not exist at {root} (latest: {newest})"
        )
    cp = _latest_checkpoint(root, version if version is not None else newest)
    live: list[str] = list(cp["files"]) if cp else []  # commit order kept
    for entry in history(root, since_version=cp["version"] if cp else None):
        if version is not None and entry["version"] > version:
            break
        removed = set(entry["remove"])
        live = [f for f in live if f not in removed]
        live.extend(entry["add"])
    return [os.path.join(root, f) for f in live]


def _commit(root: str, op: str, add: list[str], remove: list[str],
            params: dict | None = None, expected_version: int | None = None) -> int:
    """Append one log entry with create-exclusive semantics.

    ``expected_version`` pins the optimistic check: the commit claims
    version expected+1 and raises :class:`CommitConflict` if that log
    entry already exists (a racing writer won). Callers re-read state
    and retry; data files are uniquely named so a loser's files are
    simply never referenced (vacuum reaps them).
    """
    os.makedirs(_log_dir(root), exist_ok=True)
    if expected_version is None:
        cur = latest_version(root)
        expected_version = -1 if cur is None else cur
    version = expected_version + 1
    entry = {
        "version": version,
        "op": op,
        "add": add,
        "remove": remove,
        "params": params or {},
    }
    # Two-phase publish so readers can NEVER observe a partial entry:
    # the full JSON is written (and fsynced) to a private temp file,
    # then os.link() atomically claims the final name — link fails
    # with EEXIST if a racing writer won, preserving the conflict
    # check, and a crash before the link leaves only an invisible
    # temp file, never a truncated log entry.
    path = _entry_path(root, version)
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(entry, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError as exc:
        raise CommitConflict(
            f"version {version} already committed by another writer"
        ) from exc
    finally:
        os.unlink(tmp)
    _fsync_dir(_log_dir(root))
    if version > 0 and version % CHECKPOINT_EVERY == 0:
        try:  # best-effort: a failed checkpoint never fails the commit
            write_checkpoint(root)
        except OSError:
            pass
    return version


def _write_batch(df: DataFrame, root: str, tag: str) -> list[str]:
    """Write df as immutable parts under data/<tag>/, return the
    root-relative file list (from the committed directory listing —
    the only list call, scoped to the files just written)."""
    batch_dir = os.path.join(root, _DATA, tag)
    df.write.parquet(batch_dir)
    rel = os.path.join(_DATA, tag)
    return sorted(
        os.path.join(rel, f)
        for f in os.listdir(batch_dir)
        if f.endswith(".parquet")
    )


def _json_scalar(v, comparing: bool = False):
    """Map a collected Spark scalar (store side) or a reader's
    predicate value (``comparing=True``) to the JSON zone-map form.
    Naive datetimes/dates become ISO-8601 strings — lexicographic
    order on the ISO form equals temporal order, so `_may_match`'s
    <=/>= comparisons stay correct; a tz-AWARE predicate is first
    normalized to UTC-naive (stats collected from a UTC-session Spark
    are UTC wall times — `session.ENGINE_CONFS` pins the session TZ),
    so the offset suffix can never corrupt the lexicographic compare.
    On the compare side anything lossy or unorderable (Decimal — its
    stored form is a rounded float — bytes, lists) maps to None,
    which `_may_match` treats as "never prune"; on the store side
    Decimal stats become floats usable against int/float predicates."""
    import datetime as _dt
    import decimal as _dec

    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dec.Decimal):
        return None if comparing else float(v)
    return None


def _zone_stats(
    spark: SparkSession, root: str, add: list[str], stats_cols: list[str]
) -> dict[str, dict[str, list]]:
    """Per-file [min, max] zone maps for ``stats_cols``, computed
    DISTRIBUTED over the just-written batch via the `_metadata` hidden
    column — one aggregate whose shuffle carries |batch files| rows.
    Stored in the commit entry so readers prune without opening a
    single parquet footer."""
    from pyspark.sql import functions as F

    paths = [os.path.join(root, f) for f in add]
    aggs = []
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__lo_{c}"))
        aggs.append(F.max(c).alias(f"__hi_{c}"))
    rows = (
        spark.read.parquet(*paths)
        .groupBy(F.col("_metadata.file_path").alias("__file"))
        .agg(*aggs)
        .collect()
    )
    by_base = {os.path.basename(f): f for f in add}
    out: dict[str, dict[str, list]] = {}
    for r in rows:
        rel = by_base[os.path.basename(r["__file"])]
        out[rel] = {
            c: [_json_scalar(r[f"__lo_{c}"]), _json_scalar(r[f"__hi_{c}"])]
            for c in stats_cols
        }
    return out


def _clustered(
    df: DataFrame, cluster_by: list[str], n_files: int | None = None
) -> DataFrame:
    """Range-partition + sort the batch by ``cluster_by`` before
    writing, so each file owns a DISJOINT slice of the key domain.
    Zone maps are only as good as the layout: on a randomly laid-out
    table every file's [min, max] spans the whole domain and a
    predicate prunes nothing; range-clustered, a point/range predicate
    prunes to O(matching files) — at 100 TB this is the difference
    between opening three footers and opening three million. One
    range-exchange per commit (Spark samples the keys to pick
    balanced bounds), amortized over every subsequent pruned read.

    The partition count is explicit (``n_files``, default
    ``spark.sql.shuffle.partitions``): an explicit count keeps AQE
    from coalescing the range exchange into one fat file (observed on
    small batches), and it is read from conf, NOT from
    ``df.rdd.getNumPartitions()`` — under AQE, touching ``df.rdd``
    materializes the final plan, which would EXECUTE the whole input
    (a merge's rewrite join) once just to count partitions and again
    for the write."""
    n = int(
        n_files
        if n_files is not None
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
        *cluster_by
    )


def commit_append(
    df: DataFrame,
    root: str,
    params: dict | None = None,
    stats_cols: list[str] | None = None,
    idempotency_key: str | None = None,
    cluster_by: list[str] | None = None,
    cluster_partitions: int | None = None,
) -> int | None:
    """Transactional append: new files become visible atomically with
    the log-entry create. Retries once on a concurrent commit.
    ``stats_cols`` attaches per-file min/max zone maps to the commit
    for data-skipping reads (:func:`read_snapshot` with a predicate).
    ``cluster_by`` range-partitions the batch before writing (see
    :func:`_clustered`) and implies zone maps on those columns;
    ``cluster_partitions`` sets the file count (default
    ``spark.sql.shuffle.partitions``).

    ``idempotency_key`` makes the append once-only against the
    ``stream_batch_id`` ledger (the key is recorded into the commit's
    params itself, so callers need not duplicate it): the version CAS
    is PINNED to the log head read before the ledger check, so any
    commit that lands during our batch write — including a rival
    writer landing this very key — forces :class:`CommitConflict`,
    after which the re-read ledger decides: key present → NO-OP
    (return ``None``), absent → re-pin and retry. There is no window
    in which a rival's same-key commit can land without tripping our
    CAS, because landing it necessarily claims the version slot we
    pinned. The abandoned attempt's data files are unreferenced and
    age out via ``vacuum``'s orphan grace."""
    expected: int | None = None
    if idempotency_key is not None:
        # pin the CAS BEFORE the ledger read: a same-key commit after
        # this point claims our pinned slot and surfaces as a conflict
        cur = latest_version(root)
        expected = -1 if cur is None else cur
        if idempotency_key in committed_stream_batch_ids(root):
            return None
    _check_append_schema(df, root)
    if cluster_by:
        df = _clustered(df, cluster_by, cluster_partitions)
        if stats_cols is None:
            stats_cols = list(cluster_by)
    tag = f"b{uuid.uuid4().hex[:12]}"
    add = _write_batch(df, root, tag)
    extra = dict(params or {})
    extra["__schema"] = _schema_json(df)
    if idempotency_key is not None:
        extra.setdefault("stream_batch_id", idempotency_key)
    if stats_cols and add:  # an empty batch has no files to map
        extra["__stats"] = _zone_stats(df.sparkSession, root, add, stats_cols)
    if idempotency_key is None:
        try:
            return _commit(root, "append", add, [], extra)
        except CommitConflict:
            return _commit(root, "append", add, [], extra)
    for _ in range(8):  # bounded CAS loop under contention
        try:
            return _commit(
                root, "append", add, [], extra, expected_version=expected
            )
        except CommitConflict:
            if idempotency_key in committed_stream_batch_ids(root):
                return None  # a rival writer landed this exact batch
            cur = latest_version(root)
            expected = -1 if cur is None else cur
    raise CommitConflict(
        f"append with idempotency_key={idempotency_key!r} lost the CAS 8 times"
    )


def commit_overwrite(df: DataFrame, root: str, params: dict | None = None) -> int:
    """Replace the table contents; prior versions stay readable (the
    removed files remain on disk until vacuum).

    The remove list is computed AT a pinned version and the commit
    claims exactly version+1 (``expected_version``), so a racing
    append between the read and the commit raises
    :class:`CommitConflict` instead of producing an "overwrite" that
    silently retains the racer's files; we then recompute the remove
    set on fresh state and retry once."""
    tag = f"b{uuid.uuid4().hex[:12]}"
    add = _write_batch(df, root, tag)
    params = {**(params or {}), "__schema": _schema_json(df)}
    for attempt in range(2):
        cur = latest_version(root)
        remove = (
            [os.path.relpath(f, root) for f in snapshot_files(root, cur)]
            if cur is not None
            else []
        )
        try:
            return _commit(
                root, "overwrite", add, remove, params,
                expected_version=-1 if cur is None else cur,
            )
        except CommitConflict:
            if attempt:
                raise
    raise AssertionError("unreachable")


#: merge-key Spark types whose zone-map bounds round-trip JSON exactly
#: and compare without implicit casts. Timestamps/dates are stored as
#: ISO strings, and comparing a timestamp column against them would go
#: through a SESSION-TZ-dependent cast — a silent shift there is not
#: an over-rewrite, it is a missed file and a corrupted merge, so any
#: type outside this set conservatively touches everything.
_MERGE_PRUNABLE_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "string",
}


def _touched_files(
    spark: SparkSession, root: str, version: int, changes: DataFrame, key: str
) -> tuple[list[str], list[str]]:
    """(touched, untouched) root-relative file lists for a changeset:
    a file is touched iff its ``key`` zone map admits at least one
    change key. Anything that would make that test unreliable — no
    stats recorded, non-scalar bounds, a key type whose stored bounds
    don't compare exactly (see ``_MERGE_PRUNABLE_TYPES``), or a failed
    membership join — conservatively touches the file: a merge may
    over-rewrite, never corrupt. The membership test is one broadcast
    range-join of the distinct change keys against the |files|-row
    bounds table — no data file is opened to decide."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    rels = [os.path.relpath(f, root) for f in snapshot_files(root, version)]
    key_type = changes.schema[key].dataType.simpleString()
    if key_type not in _MERGE_PRUNABLE_TYPES:
        _logger.warning(
            "merge_into: key %r has type %s whose zone bounds cannot be "
            "compared exactly — rewriting all %d files",
            key, key_type, len(rels),
        )
        return sorted(rels), []
    stats = _file_stats_at(root, version)
    bounded: list[tuple[str, object, object]] = []
    touched: set[str] = set()
    for rel in rels:
        b = stats.get(rel, {}).get(key)
        if (
            b
            and isinstance(b[0], (int, float, str))
            and isinstance(b[1], (int, float, str))
            and type(b[0]) is type(b[1])
        ):
            bounded.append((rel, b[0], b[1]))
        else:
            touched.add(rel)
    if bounded:
        try:
            bdf = spark.createDataFrame(bounded, ["__file", "__lo", "__hi"])
            hits = (
                changes.select(F.col(key).alias("__k"))
                .distinct()
                .join(
                    F.broadcast(bdf),
                    (F.col("__k") >= F.col("__lo"))
                    & (F.col("__k") <= F.col("__hi")),
                )
                .select("__file")
                .distinct()
                .collect()
            )
            touched |= {r["__file"] for r in hits}
        except AnalysisException:
            # bounds/key mismatch Catalyst can still reject at analysis
            # (e.g. numeric key vs str bounds from a reclustered table).
            # ONLY this narrow class degrades to full rewrite — a
            # transient executor failure must surface, not silently
            # schedule an O(table) rewrite.
            _logger.warning(
                "merge_into: zone-bound comparison rejected for key %r — "
                "rewriting all %d files", key, len(rels),
            )
            touched |= {rel for rel, _, _ in bounded}
    untouched = [r for r in rels if r not in touched]
    return sorted(touched), untouched


def merge_into(
    spark: SparkSession,
    changes: DataFrame,
    root: str,
    key: str,
    op_col: str = "op",
    params: dict | None = None,
    stats_cols: list[str] | None = None,
    cluster_by: list[str] | None = None,
    cluster_partitions: int | None = None,
) -> int:
    """MERGE a CDC changeset into the snapshot, copy-on-write at FILE
    granularity: only files whose ``key`` zone maps admit a change key
    are read and rewritten; every other file stays referenced as-is.
    ``changes`` carries the table columns plus ``op_col`` in
    {'I','U','D'} (the `apply_changeset` operator contract —
    operators/relational.py — which supplies the merge semantics:
    D drops the key, U/I replace-or-add).

    This is the scalable MERGE: a daily delta against a 100 TB table
    clustered by ``key`` (write with ``cluster_by``, which this
    function also accepts for the rewritten batch) touches the handful
    of files whose ranges the delta hits — the rewrite is O(delta ×
    overlap), not O(table). Without zone maps (or with a non-scalar
    key) every file is conservatively touched and the merge degrades
    to the correct-but-full rewrite.

    Concurrency follows `commit_overwrite`: the touched set is
    computed AT a pinned version and the commit claims exactly
    version+1, so a racing commit conflicts and the merge recomputes
    on fresh state (one retry). Time travel keeps the pre-merge
    version readable; vacuum eventually reaps replaced files.
    """
    from pyspark.sql import functions as F

    for attempt in range(2):
        # commit-time evolution gate, same as commit_append: a changeset
        # column whose type conflicts with the table's recorded type
        # must fail the WRITE (before any batch file exists) — not
        # silently widen via apply_changeset's unionByName and break
        # every subsequent read of the committed version
        _check_append_schema(changes.drop(op_col), root)
        cur = latest_version(root)
        live = snapshot_files(root, cur) if cur is not None else []
        if not live:
            # empty table (no versions yet, or the current version has
            # zero live files after an all-delete merge): the merge is
            # exactly the changeset's upserts
            empty = changes.where(F.lit(False)).drop(op_col)
            rewrite, touched = _apply(empty, changes, key, op_col), []
        else:
            touched, _untouched = _touched_files(spark, root, cur, changes, key)
            # evolved tables: touched files may carry different column
            # sets; the merged log schema makes the rewrite read them
            # uniformly (missing columns as NULL) instead of taking
            # whichever file's footer Spark samples first
            evolved = table_schema(root, cur)
            reader = spark.read.schema(evolved) if evolved else spark.read
            if touched:
                current = reader.parquet(
                    *[os.path.join(root, r) for r in touched]
                )
            else:
                # pure-insert delta: nothing overlaps, rewrite nothing.
                # Schema comes from the log (or ONE live file) —
                # listing/inferring over the whole table would cost
                # O(files) driver work in exactly the branch whose
                # point is to touch none
                current = reader.parquet(live[0]).where(F.lit(False))
            rewrite = _apply(current, changes, key, op_col)
        if cluster_by:
            rewrite = _clustered(rewrite, cluster_by, cluster_partitions)
            if stats_cols is None:
                stats_cols = list(cluster_by)
        tag = f"b{uuid.uuid4().hex[:12]}"
        add = _write_batch(rewrite, root, tag)
        extra = dict(params or {})
        extra["__schema"] = _schema_json(rewrite)
        if stats_cols and add:  # an all-delete rewrite can be empty
            extra["__stats"] = _zone_stats(spark, root, add, stats_cols)
        try:
            return _commit(
                root, "merge", add, list(touched), extra,
                expected_version=-1 if cur is None else cur,
            )
        except CommitConflict:
            if attempt:
                raise
            # loser's files are unreferenced; vacuum reaps them
    raise AssertionError("unreachable")


def _apply(snapshot: DataFrame, changes: DataFrame, key: str, op_col: str):
    from batch_process_dpla_index_spark.operators.relational import (
        apply_changeset,
    )

    return apply_changeset(snapshot, changes, key, op_col)


def _canon_dt(t):
    """Canonicalize a schema jsonValue tree: force every nullability
    flag true and drop metadata, recursively. Recorded schemas must
    compare by NAME+TYPE only — parquet reads come back nullable=true
    while in-memory frames may be nullable=false, and a raw-JSON
    comparison would call those 'different schemas' and (e.g.)
    spuriously block compaction of a type-uniform table."""
    if isinstance(t, dict):
        t = dict(t)
        kind = t.get("type")
        if kind == "struct":
            t["fields"] = [
                {
                    "name": f["name"],
                    "type": _canon_dt(f["type"]),
                    "nullable": True,
                    "metadata": {},
                }
                for f in t["fields"]
            ]
        elif kind == "array":
            t["elementType"] = _canon_dt(t["elementType"])
            t["containsNull"] = True
        elif kind == "map":
            t["keyType"] = _canon_dt(t["keyType"])
            t["valueType"] = _canon_dt(t["valueType"])
            t["valueContainsNull"] = True
    return t


def _schema_json(df: DataFrame) -> str:
    """Canonical JSON of a batch's schema (nullability-normalized,
    metadata-free), recorded into its commit's params (``__schema``)
    so readers can resolve every live file's schema from LOG METADATA
    — never by opening 100 TB of parquet footers the way
    ``mergeSchema`` would."""
    return json.dumps(_canon_dt(df.schema.jsonValue()), sort_keys=True)


def _file_schemas_at(root: str, version: int | None) -> dict[str, str]:
    """rel-file → schema JSON, resolved over the log up to ``version``
    (checkpoint-accelerated like :func:`_file_stats_at`). The map only
    ACCUMULATES: files are immutable, so a rollback that re-adds a
    file without re-recording ``__schema`` still resolves through the
    file's original commit."""
    bound = version if version is not None else latest_version(root)
    cp = _latest_checkpoint(root, bound)
    out: dict[str, str] = dict(cp.get("schemas", {})) if cp else {}
    for entry in history(root, since_version=cp["version"] if cp else None):
        if version is not None and entry["version"] > version:
            break
        sj = entry.get("params", {}).get("__schema")
        if sj is not None:
            for f in entry["add"]:
                out[f] = sj
        # per-file pair list (rollback re-adds files whose original
        # commits may sit below a checkpoint that pruned them); an
        # ordered LIST because _commit dumps entries sort_keys=True,
        # which would scramble a dict's commit order
        for f, s in _pairs(entry.get("params", {}).get("__schemas", [])):
            out[f] = s
    # normalize EVERY resolved schema through the canonicalizer: log
    # entries written before nullability normalization carry raw
    # jsonValue forms, and comparing those against canonical ones
    # would read a nullable-only difference as a schema change.
    # Memoized per distinct input string — thousands of files share a
    # handful of schemas, and this runs on the read/commit hot path.
    return {f: _canon_cached(s) for f, s in out.items()}


_CANON_CACHE: dict[str, str] = {}


def _canon_cached(s: str) -> str:
    c = _CANON_CACHE.get(s)
    if c is None:
        c = json.dumps(_canon_dt(json.loads(s)), sort_keys=True)
        _CANON_CACHE[s] = c
    return c


def _pairs(v):
    """Items of an ordered [[k, v], ...] pair list, tolerating the
    dict form older entries may carry."""
    return v.items() if isinstance(v, dict) else v


def table_schema(root: str, version: int | None = None):
    """Merged (evolved) schema of a snapshot version: the union of its
    live files' recorded schemas in commit order — new columns append,
    all fields nullable (older files read them as NULL), and a column
    recorded under two different TYPES raises
    :class:`SchemaEvolutionError`.

    Returns ``None`` when any live file predates schema recording
    (legacy table): callers fall back to plain schema inference.
    Pure log-metadata work, O(|commits| + |columns|) on the driver.
    """
    from pyspark.sql import types as T

    live = [os.path.relpath(f, root) for f in snapshot_files(root, version)]
    if not live:
        return None
    schemas = _file_schemas_at(root, version)
    if any(rel not in schemas for rel in live):
        return None
    live_set = set(live)
    fields: dict[str, T.StructField] = {}
    seen: set[str] = set()
    for rel, sj in schemas.items():  # insertion order == commit order
        if rel not in live_set or sj in seen:
            continue
        seen.add(sj)
        for f in T.StructType.fromJson(json.loads(sj)).fields:
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = T.StructField(f.name, f.dataType, True)
            elif prev.dataType != f.dataType:
                raise SchemaEvolutionError(
                    f"column {f.name!r} recorded as {prev.dataType.simpleString()} "
                    f"and {f.dataType.simpleString()} across live files of "
                    f"{root} (version={version})"
                )
    return T.StructType(list(fields.values()))


def _check_append_schema(df: DataFrame, root: str) -> None:
    """Commit-time evolution gate: new columns are fine, but a column
    whose type differs from the table's recorded type fails BEFORE any
    batch file is written (no orphans, no corrupt merged reads)."""
    try:
        existing = table_schema(root)
    except FileNotFoundError:
        return
    if existing is None:
        return
    from pyspark.sql import types as T

    # compare CANONICAL types (nullability/metadata normalized) — the
    # incoming in-memory frame may be nullable=false where parquet
    # reads are nullable=true, and that is not a type change
    incoming = T.StructType.fromJson(json.loads(_schema_json(df)))
    by_name = {f.name: f.dataType for f in existing.fields}
    for f in incoming.fields:
        prev = by_name.get(f.name)
        if prev is not None and prev != f.dataType:
            raise SchemaEvolutionError(
                f"append changes column {f.name!r} from "
                f"{prev.simpleString()} to {f.dataType.simpleString()}; "
                "write it under a new column name instead"
            )


def _file_stats_at(root: str, version: int | None) -> dict[str, dict[str, list]]:
    """rel-file → zone maps, unioned over the log up to ``version``
    (checkpoint-based: the sidecar carries the unioned stats at its
    version, then only newer entries are merged)."""
    bound = version if version is not None else latest_version(root)
    cp = _latest_checkpoint(root, bound)
    out: dict[str, dict[str, list]] = dict(cp["stats"]) if cp else {}
    for entry in history(root, since_version=cp["version"] if cp else None):
        if version is not None and entry["version"] > version:
            break
        out.update(entry.get("params", {}).get("__stats", {}))
    return out


def _may_match(stats: dict[str, list] | None, col: str, op: str, value) -> bool:
    """Conservative zone-map test: False ONLY when [min, max] proves no
    row in the file can satisfy the predicate. Missing stats, an
    unknown column, a NULL bound, or a type-mismatched predicate (int
    vs string-column stats, say) never prune — a reader mistake must
    cost an over-read, not a crash."""
    if not stats or col not in stats:
        return True
    lo, hi = stats[col]
    value = _json_scalar(value, comparing=True)
    if lo is None or hi is None or value is None:
        return True
    try:
        if op == "=":
            return lo <= value <= hi
        if op == ">=":
            return hi >= value
        if op == ">":
            return hi > value
        if op == "<=":
            return lo <= value
        if op == "<":
            return lo < value
    except TypeError:
        return True  # incomparable types: never prune
    return True  # unknown operator: never prune


def prune_files(
    root: str,
    predicates: list[tuple[str, str, object]],
    version: int | None = None,
) -> tuple[list[str], int]:
    """(surviving absolute files, number pruned) for AND-ed predicates
    ``(col, op, value)`` with op in {=, <, <=, >, >=}. Pure log-metadata
    work — no store I/O beyond the log read."""
    stats = _file_stats_at(root, version)
    files = snapshot_files(root, version)
    keep = []
    for f in files:
        rel = os.path.relpath(f, root)
        if all(_may_match(stats.get(rel), c, op, v) for c, op, v in predicates):
            keep.append(f)
    return keep, len(files) - len(keep)


def read_snapshot(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    predicates: list[tuple[str, str, object]] | None = None,
) -> DataFrame:
    """Time-travel read: the file list comes from the log, never from
    listing the data directory — immutable and tear-free.

    With ``predicates``, files whose zone maps prove no match are
    dropped from the scan BEFORE Spark sees them (driver-side data
    skipping on log metadata — at 100 TB a selective predicate reads a
    handful of files instead of the table), and the predicate is ALSO
    applied as a row filter, so results are exact regardless of how
    conservative the pruning was.

    Schema-evolved tables read under the version's MERGED log schema
    (:func:`table_schema`): files written before a column existed
    return NULL for it, no parquet footer is ever opened for schema
    discovery, and a column recorded under conflicting types raises
    instead of returning whichever file Spark sampled first. Legacy
    tables (no recorded schemas) keep the inferred-schema read."""
    from pyspark.sql import functions as F

    all_files = snapshot_files(root, version)
    if not all_files:
        raise FileNotFoundError(f"no snapshot at {root} (version={version})")
    if predicates:
        files, _ = prune_files(root, predicates, version)
        # every file pruned: keep one so the read still has a schema —
        # the row filter below makes the result (exactly) empty, and
        # parquet row-group stats skip its pages anyway
        files = files or all_files[:1]
    else:
        files = all_files
    merged = table_schema(root, version)
    reader = spark.read.schema(merged) if merged is not None else spark.read
    df = reader.parquet(*files)
    for c, op, v in predicates or []:
        expr = {
            "=": F.col(c) == v, "<": F.col(c) < v, "<=": F.col(c) <= v,
            ">": F.col(c) > v, ">=": F.col(c) >= v,
        }[op]
        df = df.where(expr)
    return df


def rollback(root: str, version: int) -> int:
    """Restore ``version``'s file set as a NEW commit (history is
    append-only; nothing is deleted).

    Raises FileNotFoundError when any of the target version's data
    files has been vacuumed — rollback only reaches versions inside
    the vacuum retention, and failing loudly here prevents committing
    a "restored" version that points at deleted files."""
    target = set(snapshot_files(root, version))
    missing = sorted(os.path.relpath(f, root) for f in target if not os.path.exists(f))
    if missing:
        raise FileNotFoundError(
            f"cannot roll back to version {version}: {len(missing)} data "
            f"file(s) already vacuumed (first: {missing[0]}); rollback is "
            "limited to versions within the vacuum retention"
        )
    current = set(snapshot_files(root))
    add = [os.path.relpath(f, root) for f in sorted(target - current)]
    remove = [os.path.relpath(f, root) for f in sorted(current - target)]
    params: dict = {"to_version": str(version)}
    # re-record the restored files' schemas AT the rollback entry: a
    # checkpoint written after their removal prunes them from the
    # sidecar, and without this the re-added files would resolve to no
    # schema — silently demoting an evolved table to footer inference.
    # Ordered pair list in the ORIGINAL commit order (iterate the
    # resolution map, which preserves it — `add` is filename-sorted
    # and would scramble merged-column order), because _commit dumps
    # params sort_keys=True and a dict would come back key-sorted.
    # Known limit: when the restore MIXES still-live files (which keep
    # their original map position) with re-added ones (which resolve
    # at this entry), the merged-schema COLUMN ORDER of the restored
    # version can differ from reading the target version directly —
    # the column SET and types are exact either way; order-sensitive
    # consumers should select by name.
    known = _file_schemas_at(root, version)
    add_set = set(add)
    restored = [[f, s] for f, s in known.items() if f in add_set]
    if restored:
        params["__schemas"] = restored
    # same re-record for zone-map stats: without it, restored files
    # resolve no stats and every read of the restored version scans
    # them all — a silent loss of the advertised data skipping
    known_stats = _file_stats_at(root, version)
    restored_stats = {f: known_stats[f] for f in add if f in known_stats}
    if restored_stats:
        params["__stats"] = restored_stats
    return _commit(root, "rollback", add, remove, params)


def vacuum(
    root: str, keep_versions: int = 1, orphan_grace_s: float = 86_400.0
) -> list[str]:
    """Delete data files unreferenced by the last ``keep_versions``
    versions. Returns deleted paths. The log itself is never pruned —
    history metadata is tiny.

    Two classes of deletable file, treated differently so vacuum can
    run concurrently with writers:

    - **logged but not retained** (in some version's add list, outside
      the horizon): safe to delete immediately — the log proves no
      retained version references them.
    - **never logged** (an in-flight commit writes its data files
      BEFORE its log entry exists; a lost commit race leaves the
      loser's files forever): deleted only when older than
      ``orphan_grace_s`` (mtime), so a commit in progress is never
      torn. Lost-race orphans age past the grace and get reaped on a
      later vacuum.
    """
    import time as _time

    h = history(root)
    if not h:
        return []
    horizon = [e["version"] for e in h][-keep_versions:]
    retained: set[str] = set()
    for v in horizon:
        retained.update(os.path.relpath(f, root) for f in snapshot_files(root, v))
    ever_logged: set[str] = set()
    for e in h:
        ever_logged.update(e["add"])
    now = _time.time()
    deleted = []
    data_root = os.path.join(root, _DATA)
    for dirpath, _dirs, files in os.walk(data_root):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, root)
            if rel in retained:
                continue
            if rel not in ever_logged:
                try:
                    if now - os.path.getmtime(full) < orphan_grace_s:
                        continue  # possibly an in-flight commit
                except OSError:
                    continue
            os.remove(full)
            deleted.append(rel)
    return sorted(deleted)


def compact_snapshot(
    spark: SparkSession, root: str, target_bytes: int, params: dict | None = None
) -> int:
    """Transactional small-file compaction: plan bins over the CURRENT
    snapshot's files (size-cumsum binning, `products/compaction.py`),
    rewrite them as one file per bin, and commit (add=compacted,
    remove=old) atomically. Readers on any version never see a torn
    table; the pre-compaction version stays time-travelable until
    vacuumed."""
    from batch_process_dpla_index_spark.products.compaction import compact

    cur = latest_version(root)
    if cur is None:
        raise FileNotFoundError(f"no snapshot at {root}")
    files = snapshot_files(root, cur)
    # compaction's bin rewriter reads each bin's files as-is; on a
    # schema-evolved table a bin mixing old and new files would
    # silently drop the columns its first-sampled file lacks. Refuse
    # loudly instead — rewrite to a uniform schema first (overwrite /
    # merge), then compact. A live file with NO recorded schema counts
    # as its own (unknown) schema class: a legacy+evolved mix is
    # exactly as lossy as two recorded schemas, and compacting it
    # would additionally stamp the output with a schema the data may
    # not contain. Pure-legacy tables (nothing recorded) keep the
    # pre-feature behavior.
    schemas = _file_schemas_at(root, cur)
    rels = [os.path.relpath(f, root) for f in files]
    live_schemas = {schemas[r] for r in rels if r in schemas}
    n_unrecorded = sum(1 for r in rels if r not in schemas)
    if len(live_schemas) > 1 or (live_schemas and n_unrecorded):
        raise SchemaEvolutionError(
            f"{root} has {len(live_schemas)} distinct recorded live file "
            f"schemas and {n_unrecorded} unrecorded live file(s); "
            "compaction would collapse them lossily — rewrite to a uniform "
            "schema before compacting"
        )
    tag = f"c{uuid.uuid4().hex[:12]}"
    out_dir = os.path.join(root, _DATA, tag)
    compact(spark, files, out_dir, target_bytes=target_bytes)
    add = sorted(
        os.path.join(_DATA, tag, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    remove = [os.path.relpath(f, root) for f in files]
    extra = {**(params or {}), "target_bytes": str(target_bytes)}
    if len(live_schemas) == 1:
        extra["__schema"] = next(iter(live_schemas))
    return _commit(
        root, "compact", add, remove, extra,
        expected_version=cur,
    )
