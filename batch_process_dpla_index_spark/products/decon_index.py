"""Persisted benchmark-signature index: fuzzy decontamination as a
MAINTAINED artifact, not a per-run benchmark recompute.

`operators/curation.py:fuzzy_decontaminate` screens a corpus against
an eval benchmark by building the benchmark's shingle sets + MinHash
signatures in-line. A training pipeline screens EVERY ingest batch
against the SAME (slowly-changing) benchmark suites — at that cadence
the benchmark side is a build-once artifact, and each batch pays only
its own delta cost. This product owns that lifecycle (the
overlap_index/dedup_index pattern — ManifestWriter.scala:7-14
manifest convention):

- :func:`build_decon_index`  — one benchmark pass → ``signatures``
  parquet ((id, shingles, sig) per benchmark item, single part file —
  eval suites are thousands of rows) + ``_MANIFEST`` pinning
  (shingle_n, num_perm, bands, text/id cols). Geometry parameters are
  never caller-passed on later paths: screens and appends read them
  from the manifest, so a batch can never be screened with a
  different banding than the index was built with.
- :func:`append_to_decon_index` — new benchmark items (a new eval
  suite) folded in at delta cost: signatures over the delta only,
  duplicate ids refused loudly (cross-index AND within the delta),
  and the stored rows are NEVER re-materialized — the delta lands as
  one new parquet part file via ``mode("append")`` (r16 VERDICT #3:
  the old path collected the whole store per append).
- :func:`screen_batch`       — (doc_id, bench_id, jaccard) for every
  batch doc whose TRUE shingle Jaccard against a stored benchmark
  item is >= threshold. Runs the EXACT code path of the in-line
  operator (``curation._fuzzy_screen``) with the benchmark side read
  from the artifact — pinned equal to a direct fuzzy_decontaminate
  run in pytest, so the stored-index screen cannot drift from the
  oracle-verified operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.io.manifest import (
    read_manifest,
    write_manifest,
)


def _sig_path(index_dir: str) -> str:
    return os.path.join(index_dir, "signatures")


def _bench_sig_frame(
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_perm: int,
    use_pandas: bool,
) -> DataFrame:
    """(id, shingles, sig) for the benchmark side — the same
    empty-set-dropping convention as fuzzy_decontaminate."""
    from batch_process_dpla_index_spark.operators.dedup import (
        shingle_sets,
        with_minhash_signature,
    )

    sets = (
        shingle_sets(benchmark, text_col, id_col, n, use_pandas=use_pandas)
        .where(F.size("shingles") > 0)
        .withColumnRenamed(id_col, "id")
    )
    return with_minhash_signature(sets, num_perm, use_pandas).select(
        "id", "shingles", "sig"
    )


def build_decon_index(
    benchmark: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    use_pandas: bool = True,
) -> dict[str, str]:
    """One benchmark pass → signature parquet + manifest.

    Returns the manifest dict (also written to ``index_dir/_MANIFEST``).
    Refuses an empty benchmark (a zero-row parquet dataset is
    unreadable on the next query — the dedup_index convention)."""
    sig = _bench_sig_frame(
        benchmark, id_col, text_col, n, num_perm, use_pandas
    )
    # repartition(1), not coalesce(1): coalesce folds the single-task
    # constraint into the signature stage (the overlap_index artifact
    # lesson); the artifact is |benchmark| rows — one part file keeps
    # every later read trivially cheap
    frame = sig.repartition(1).persist()
    n_items = frame.count()
    if n_items == 0:
        frame.unpersist()
        raise ValueError(
            "build_decon_index: benchmark frame has no non-empty "
            "documents; an empty index is unreadable — refuse to build"
        )
    frame.write.mode("overwrite").parquet(_sig_path(index_dir))
    frame.unpersist()
    manifest = {
        "Product": "decon-index",
        "Shingle n": str(n),
        "Num perm": str(num_perm),
        "Bands": str(bands),
        "Id col": id_col,
        "Text col": text_col,
        "Benchmark items": str(n_items),
    }
    write_manifest(manifest, index_dir)
    return manifest


def append_to_decon_index(
    new_items: DataFrame,
    index_dir: str,
    use_pandas: bool = True,
) -> dict[str, str]:
    """Fold a NEW eval suite into the stored index at delta cost.

    Geometry comes from the manifest (never the caller). Duplicate ids
    are refused loudly — BOTH against the stored index and WITHIN
    ``new_items`` itself (r16 ADVICE: an internally-duplicated id
    would be indexed twice and fan out duplicate (doc, bench) rows in
    every later screen) — because an id that means two different
    benchmark texts would silently corrupt every later screen.

    Delta-cost by construction (r16 VERDICT #3): the append
    materializes ONLY the delta — one new part file via parquet
    ``mode("append")`` — and never reads, collects, or rewrites the
    stored signature rows (the old path collected the ENTIRE store per
    append, an O(index) driver hop that grows with every eval suite
    ever indexed). The cross-index duplicate probe is a left-semi join
    against the stored ``id`` column only (column-pruned scan).
    Append-mode parquet commits through the job-level _temporary
    protocol: a crash mid-write leaves zero committed delta rows (and
    the stale manifest then matches the store), a crash between the
    commit and the manifest write under-counts only the manifest —
    which the next successful append repairs below by re-deriving
    "Benchmark items" from the artifact's own footer count rather
    than trusting the stored manifest number."""
    mf = read_manifest(index_dir)
    spark = new_items.sparkSession
    stored = spark.read.parquet(_sig_path(index_dir))
    stored_ids = stored.select("id")
    delta = _bench_sig_frame(
        new_items,
        mf["Id col"],
        mf["Text col"],
        int(mf["Shingle n"]),
        int(mf["Num perm"]),
        use_pandas,
    ).persist()
    try:
        n_delta = delta.count()
        if n_delta == 0:
            # empty delta = successful NO-OP, never an error (a suite
            # whose items all shingle to empty — e.g. label-only
            # benchmark rows shorter than the manifest's n — carried
            # nothing to index; the stored artifact and manifest are
            # untouched, matching the pre-r17 overwrite path's
            # behavior of rewriting the store unchanged)
            return dict(mf)
        n_distinct = delta.select("id").distinct().count()
        if n_distinct != n_delta:
            raise ValueError(
                "append_to_decon_index: new_items contains "
                f"internally duplicated ids ({n_delta - n_distinct} "
                "extra rows) — indexing an id twice would corrupt "
                "every later screen; de-duplicate the suite first"
            )
        dup = [
            r["id"]
            for r in delta.join(stored_ids, "id", "left_semi")
            .select("id")
            .limit(5)
            .collect()
        ]
        if dup:
            raise ValueError(
                f"append_to_decon_index: benchmark ids already indexed: "
                f"{dup} — re-ingesting an id with (possibly) different "
                "text would corrupt every later screen; delete/rebuild "
                "instead"
            )
        # one part file per append (deltas are eval-suite-sized); the
        # stored part files are never touched, so there is no
        # overwrite-while-reading-self hazard at all on this path
        delta.select(*stored.columns).repartition(1).write.mode(
            "append"
        ).parquet(_sig_path(index_dir))
    finally:
        delta.unpersist()
    manifest = dict(mf)
    # count from the artifact (parquet footer metadata), not
    # stored-manifest + n_delta: self-healing if a prior crash left
    # the manifest stale
    from batch_process_dpla_index_spark.products.index_tombstones import (
        parquet_rowcount,
    )

    manifest["Benchmark items"] = str(parquet_rowcount(_sig_path(index_dir)))
    write_manifest(manifest, index_dir)
    return manifest


def screen_batch(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    use_pandas: bool = True,
) -> DataFrame:
    """(id col, bench_id, jaccard) for every batch doc matching a
    stored benchmark item at TRUE Jaccard >= ``threshold`` — the exact
    in-line operator path (``curation._fuzzy_screen``) with the
    benchmark side read from the artifact; ZERO benchmark recompute.
    Persist handles ride ``_cached_deps``."""
    from batch_process_dpla_index_spark.operators.curation import (
        _fuzzy_screen,
    )

    mf = read_manifest(index_dir)
    bench_sig = spark.read.parquet(_sig_path(index_dir))
    return _fuzzy_screen(
        docs,
        bench_sig,
        id_col=mf["Id col"],
        text_col=mf["Text col"],
        n=int(mf["Shingle n"]),
        threshold=threshold,
        num_perm=int(mf["Num perm"]),
        bands=int(mf["Bands"]),
        max_bucket=max_bucket,
        use_pandas=use_pandas,
    )
