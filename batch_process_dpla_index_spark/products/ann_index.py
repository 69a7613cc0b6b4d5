"""Persisted ANN (IVF) index: build the coarse quantizer and cell
assignments once, serve query batches against them.

The similarity operators (`operators/similarity.py`) assign corpus
cells in-line per run; a production vector-search pipeline builds the
index once per corpus version and amortizes it over every query batch:

- :func:`build_ann_index`: learn a k-means codebook
  (``operators.clustering.kmeans_fit``, maximin seeding) or use the
  deterministic pseudo-random quantizer, assign every corpus vector to
  its nearest cell (one Arrow matmul pass), and write
  ``centroids`` + ``cells`` parquet datasets under ``index_dir`` with a
  ``_MANIFEST`` pinning (dim, n_cells, quantizer, metric). The cells
  dataset is repartitioned on ``cell`` so query-time cell groups read
  co-located.
- :func:`ann_query_indexed`: read the manifest + centroids (k×dim
  floats — the whole model fits on the driver), assign ONLY the query
  batch to its ``n_probe`` nearest cells, and score against the stored
  cells through the shared cell-grouped BLAS path
  (``operators.similarity.ivf_query_topk``). The corpus is never
  re-assigned.

Scale: index build is one corpus pass + k-means (bounded driver state:
k×dim). Query cost is |Q|×n_probe explode + one shuffle join into the
cell layout — independent of corpus re-processing. n_cells ~ √N keeps
cells bounded; growing the corpus = :func:`append_to_ann_index` (new
assignments under the same manifest-pinned codebook, one batch-sized
Arrow pass, per-batch ``ingest_batch`` partitions with idempotent
replay overwrite); re-learn on drift = :func:`rebuild_ann_index`
(re-fit the pinned quantizer on the live rows, surrogate-key
re-attach, failure-safe swap — :func:`ann_index_occupancy` is the
trigger's observable); takedown = :func:`delete_from_ann_index`
(manifest-logged tombstones anti-joined at serve time, compacted past
a threshold — `products.index_tombstones`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.io.manifest import read_manifest, write_manifest
from batch_process_dpla_index_spark.products.index_tombstones import (
    clear_tombstones,
    keyed_repartition,
)
from batch_process_dpla_index_spark.operators.similarity import (
    _imi_probe_split,
    ivf_cells_pandas,
    ivf_query_topk,
)


def _live_cells(spark: SparkSession, index_dir: str) -> DataFrame:
    """Stored cell rows minus the tombstone set — THE read every serve
    path (query/recall/PQ/occupancy) and every recount goes through,
    so a takedown (`delete_from_ann_index`) is invisible to no
    consumer. An index that never saw a delete passes through with
    zero plan overhead (no tombstones dir → plain scan)."""
    from batch_process_dpla_index_spark.products.index_tombstones import (
        apply_tombstones,
    )

    stored = spark.read.parquet(os.path.join(index_dir, "cells"))
    return apply_tombstones(spark, index_dir, stored, "id")


def delete_from_ann_index(
    spark: SparkSession,
    index_dir: str,
    ids,
    id_col: str | None = None,
    compact_threshold: float = 0.2,
    cell_partitions: int | None = None,
    recount: bool = True,
) -> dict[str, str]:
    """Tombstone ids out of the index (takedown/opt-out) — O(|ids|)
    work, no cell rewrite until the tombstoned fraction reaches
    ``compact_threshold`` (then the cells compact in the same call:
    physical rewrite of survivors, ingest_batch partitions preserved,
    failure-safe swap). A delete removes every copy of the id PRESENT
    at delete time; a later re-append of the same id is new data and
    serves normally. See `products.index_tombstones` for the shared
    mechanics. Returns the updated manifest."""
    from batch_process_dpla_index_spark.products.index_tombstones import (
        delete_from_index,
    )

    return delete_from_index(
        spark, index_dir, ids, "id", id_col=id_col,
        compact_threshold=compact_threshold,
        cell_partitions=cell_partitions,
        recount=recount,
    )


def compact_ann_index(
    spark: SparkSession, index_dir: str, cell_partitions: int | None = None
) -> dict[str, str]:
    """Force the tombstone compaction regardless of fraction — the
    explicit vacuum step."""
    from batch_process_dpla_index_spark.products.index_tombstones import (
        compact_index_tombstones,
    )

    return compact_index_tombstones(
        spark, index_dir, "id", cell_partitions=cell_partitions
    )


def _assign_storage_cells(
    vecs: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_cells: int,
    two_level_model=None,
    centroids=None,
) -> DataFrame:
    """(cell, id, vec): rank-1 storage assignment under the index's
    quantizer — THE one code path both :func:`build_ann_index` and
    :func:`append_to_ann_index` run, so build-time and append-time
    assignment cannot drift (a drifted copy would assign appended
    vectors to different cells than a rebuild would, silently
    desynchronizing serve-time probes from storage)."""
    if two_level_model is not None:
        from batch_process_dpla_index_spark.operators.clustering import (
            kmeans_assign_two_level,
        )

        coarse, fine, k_f = two_level_model
        return kmeans_assign_two_level(
            vecs, coarse, fine, k_f, id_col, vec_col, keep_vec=True
        ).select(F.col("cell").cast("int").alias("cell"), "id", "vec")
    return ivf_cells_pandas(
        vecs, id_col, vec_col, dim, n_cells, 1, centroids
    ).select(
        F.element_at("cells", 1).cast("int").alias("cell"), "id", "vec"
    )


def build_ann_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    dim: int = 64,
    n_cells: int = 16,
    learned: bool | str = True,
    kmeans_iters: int = 10,
    cell_partitions: int | None = None,
    pq_m: int | None = None,
    pq_k: int = 16,
    pq_iters: int = 3,
) -> dict[str, str]:
    """One corpus pass (+ k-means when ``learned``) → centroids, cell
    assignments, manifest. Returns the manifest dict.

    ``learned`` picks the coarse quantizer: ``True`` = flat
    maximin-seeded Lloyd's; ``"two-level"`` = the billion-scale path
    (√k coarse cells, then all fine codebooks at once — O(N·√k·dim)
    per training iteration). A two-level index PERSISTS the model —
    ``coarse_centroids`` + ``fine_centroids`` datasets and the
    fit-owned stride ``k_f`` in the manifest — and stores every
    vector under its global two-level cell id
    (``coarse_cell * k_f + fine_idx``), so serving routes through the
    IMI probe (`similarity._imi_probe_cells`): a query ranks k_c
    coarse centroids then only the probed cells' fine codebooks —
    O(√k·dim) per query where the flat layout pays O(k·dim) just to
    rank cells. NOTE the trained cell count can differ from the
    request in both directions (grid rounds up, under-full coarse
    cells train fewer fine centroids); the manifest records the true
    count and all serving reads the manifest, never the request.
    ``False`` = the deterministic pseudo-random quantizer (no
    training pass at all). Any other string raises — a typo like
    ``"two_level"`` must not silently train the flat path.

    ``pq_m`` turns on the IVF-PQ layout: m sub-codebooks train on the
    corpus (``operators.quantization.pq_train``), every stored row
    additionally carries its m-code array, and the codebooks persist
    under ``pq_codebooks`` — :func:`pq_query_indexed` then serves
    queries from codes alone (32× less data motion at the defaults),
    with the float vectors still in place for exact re-ranking."""
    spark = corpus.sparkSession
    if isinstance(learned, str) and learned != "two-level":
        # a typo ("two_level", "kmeans", ...) must fail loudly, not
        # silently train the flat-maximin branch (ADVICE round-11)
        raise ValueError(
            f"unrecognized quantizer string learned={learned!r}; "
            "expected True, False, or 'two-level'"
        )
    two_level_model = None
    if learned == "two-level":
        # billion-scale training path: √k coarse cells, then all fine
        # codebooks trained simultaneously within them — each training
        # iteration assigns at O(N·√k·dim) instead of O(N·k·dim)
        # (clustering.kmeans_fit_two_level; probe receipt in SCALE.md
        # round-11). The model PERSISTS in the index artifact and the
        # storage assign runs through the same two-level inference the
        # IMI serve path probes (one O(N·√k·dim) pass — the flat
        # flattening this branch used to do paid O(N·k·dim) to store
        # and left serving stuck at O(k·dim) per query).
        from batch_process_dpla_index_spark.operators.clustering import (
            kmeans_fit_two_level,
        )

        coarse, fine, k_f = kmeans_fit_two_level(
            corpus, id_col, vec_col, k=n_cells, n_iter=kmeans_iters
        )
        two_level_model = (coarse, fine, k_f)
        centroids = None
        # the index's true cell count is the number of TRAINED fine
        # centroids (global ids are strided coarse_cell*k_f+fine_idx,
        # with gaps where a coarse cell trained under-full) — it can
        # differ from the request in BOTH directions: under-full
        # coarse cells train fewer fine centroids, and a k_c that
        # doesn't divide n_cells rounds the grid UP to
        # k_c · ceil(n_cells/k_c) (the IMI convention — FAISS's IMI is
        # likewise a k_c×k_f grid, not an arbitrary k)
        n_cells = sum(len(m) for m in fine.values())
    elif learned:
        from batch_process_dpla_index_spark.operators.clustering import kmeans_fit

        centroids = kmeans_fit(
            corpus, id_col, vec_col, k=n_cells, n_iter=kmeans_iters
        )
    else:
        centroids = None

    stored = _assign_storage_cells(
        corpus, id_col, vec_col, dim, n_cells, two_level_model, centroids
    )
    codebooks = None
    if pq_m is not None:
        from batch_process_dpla_index_spark.operators.quantization import (
            pq_encode,
            pq_train,
        )

        codebooks = pq_train(
            corpus, id_col, vec_col, dim=dim, m=pq_m, k=pq_k, n_iter=pq_iters
        )
        codes = pq_encode(corpus, codebooks, id_col, vec_col)
        stored = stored.join(codes, "id")
    # Hive-partitioned by ingest_batch (0 at build), mirroring the
    # dedup/embedding index products: appends land per-batch
    # partitions a checkpoint replay can overwrite idempotently, and
    # serving reads are unchanged (every read path selects its
    # columns explicitly)
    (
        keyed_repartition(
            stored.withColumn("ingest_batch", F.lit(0)), cell_partitions, "cell"
        )
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(os.path.join(index_dir, "cells"))
    )
    # a rebuild into a dir that carried tombstones must not inherit
    # them — build overwrites the corpus, so the delete set is spent
    clear_tombstones(index_dir)
    # metadata artifacts go through the ARROW createDataFrame path
    # (relational._arrow_local_frame → JVM LocalRelation): a
    # list-of-tuples frame plans its write over a Python-pickled RDD
    # and pays a Python-worker round trip per write (~3.5 s each,
    # measured on the overlap-index refresh — the same class of cost,
    # twice, hid inside this product's bench time)
    from batch_process_dpla_index_spark.operators.relational import (
        _arrow_local_frame,
    )

    if codebooks is not None:
        _arrow_local_frame(
            spark,
            [
                (j, c, [float(x) for x in vec])
                for j, book in enumerate(codebooks)
                for c, vec in enumerate(book)
            ],
            "j int, code int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "pq_codebooks")
        )

    if two_level_model is not None:
        # persist the MODEL, not a flattened list: global cell ids are
        # strided with gaps, so a positional flat centroid list cannot
        # represent them — serving loads (coarse, fine, k_f) and probes
        # through the IMI path
        coarse, fine, k_f = two_level_model
        _arrow_local_frame(
            spark,
            [(c, [float(x) for x in v]) for c, v in enumerate(coarse)],
            "ccell int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "coarse_centroids")
        )
        _arrow_local_frame(
            spark,
            [
                (c, j, [float(x) for x in v])
                for c in sorted(fine)
                for j, v in enumerate(fine[c])
            ],
            "ccell int, fine int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "fine_centroids")
        )
    else:
        if centroids is None:
            from batch_process_dpla_index_spark.operators.similarity import (
                _centroid_matrix,
            )

            centroids = _centroid_matrix(dim, n_cells).tolist()
        _arrow_local_frame(
            spark,
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "centroids")
        )

    # count from the freshly written parquet footers — recounting the
    # unpersisted `stored` frame would re-run the whole encode DAG;
    # r18: read the footers on the driver (no Spark job)
    from batch_process_dpla_index_spark.products.index_tombstones import (
        parquet_rowcount,
    )

    n_vecs = parquet_rowcount(os.path.join(index_dir, "cells"))
    manifest = {
        "dim": str(dim),
        "n_cells": str(n_cells),
        "quantizer": (
            "kmeans-two-level"
            if learned == "two-level"
            else "kmeans-maximin" if learned else "pseudo-random"
        ),
        "metric": "cosine",
        "Record count": str(n_vecs),
    }
    if two_level_model is not None:
        # the stride is FIT-OWNED model state (not derivable from the
        # fine codebook widths when every cell trained under-full) —
        # pin it like the cell geometry so serving can never reconstruct
        # a different global-id convention than storage used
        manifest["k_f"] = str(two_level_model[2])
        manifest["coarse_k"] = str(len(two_level_model[0]))
    if pq_m is not None:
        manifest["pq_m"] = str(pq_m)
        manifest["pq_k"] = str(pq_k)
    write_manifest(manifest, index_dir)
    return manifest


def load_centroids(spark: SparkSession, index_dir: str) -> list[list[float]]:
    rows = (
        spark.read.parquet(os.path.join(index_dir, "centroids"))
        .orderBy("cell")
        .collect()
    )
    return [list(r["centroid"]) for r in rows]


def load_two_level_model(
    spark: SparkSession, index_dir: str
) -> tuple[list[list[float]], dict[int, list[list[float]]], int]:
    """(coarse, fine, k_f) of a two-level-built index — the exact shape
    `clustering.kmeans_fit_two_level` returned at build time. k·dim
    floats total: the whole model fits on the driver, like the flat
    centroid list."""
    manifest = read_manifest(index_dir)
    k_f = int(manifest["k_f"])
    coarse_rows = (
        spark.read.parquet(os.path.join(index_dir, "coarse_centroids"))
        .orderBy("ccell")
        .collect()
    )
    coarse = [list(r["centroid"]) for r in coarse_rows]
    fine_rows = (
        spark.read.parquet(os.path.join(index_dir, "fine_centroids"))
        .orderBy("ccell", "fine")
        .collect()
    )
    fine: dict[int, list[list[float]]] = {}
    for r in fine_rows:
        fine.setdefault(int(r["ccell"]), []).append(list(r["centroid"]))
    return coarse, fine, k_f


def load_pq_codebooks(spark: SparkSession, index_dir: str) -> list[list[list[float]]]:
    rows = (
        spark.read.parquet(os.path.join(index_dir, "pq_codebooks"))
        .orderBy("j", "code")
        .collect()
    )
    m = max(r["j"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    books: list[list[list[float]]] = [[None] * k for _ in range(m)]  # type: ignore[list-item]
    for r in rows:
        books[r["j"]][r["code"]] = list(r["centroid"])
    return books


def pq_query_indexed(
    spark: SparkSession,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-PQ serving: route each query to its ``n_probe`` nearest
    cells, ADC-score the PROBED cells' stored codes (the float vectors
    are never read), emit exact top-k per query over the probed set.

    Plan shape — the `_ivf_score_and_rank` union-with-role contract:
    stored rows shuffle ONCE carrying only (cell, id, m codes); query
    rows shuffle once per probe carrying their float vector (|Q|·
    n_probe rows — the small side). Each cell group then scores with
    one ADC gather. No stored×query cross product is ever
    materialized, which is what makes the m-bytes-per-stored-row
    motion claim true."""
    from pyspark.sql.window import Window

    import numpy as np

    from batch_process_dpla_index_spark.operators.quantization import (
        adc_score_topk,
        adc_tables,
    )

    manifest = read_manifest(index_dir)
    dim = int(manifest["dim"])
    n_cells = int(manifest["n_cells"])
    books = np.asarray(load_pq_codebooks(spark, index_dir), dtype="float64")

    if manifest["quantizer"] == "kmeans-two-level" and "k_f" in manifest:
        # IMI probe routing — same O(√k·dim) cell ranking as
        # ann_query_indexed (and the same "k_f" gate: pre-round-12
        # two-level builds stored the flat layout and serve flat); the
        # ADC scoring tail below is unchanged
        from batch_process_dpla_index_spark.operators.similarity import (
            _imi_probe_cells,
        )

        coarse, fine, k_f = load_two_level_model(spark, index_dir)
        p_c, p_f = _imi_probe_split(
            n_probe, n_cells, k_f, len(fine), None, None
        )
        probe_side = _imi_probe_cells(
            queries, coarse, fine, k_f, p_c, p_f, id_col, vec_col
        ).select(
            "cell",
            "role",
            "id",
            F.lit(None).cast("array<int>").alias("codes"),
            F.col("vec").alias("qvec"),
        )
    else:
        centroids = load_centroids(spark, index_dir)
        q_assigned = ivf_cells_pandas(
            queries, id_col, vec_col, dim, n_cells, n_probe, centroids
        )
        probe_side = q_assigned.select(
            F.explode("cells").alias("cell"),
            F.lit(1).alias("role"),
            F.col("id"),
            F.lit(None).cast("array<int>").alias("codes"),
            F.col("vec").alias("qvec"),
        ).withColumn("cell", F.col("cell").cast("int"))
    stored_side = (
        _live_cells(spark, index_dir)
        .select(
            "cell",
            F.lit(0).alias("role"),
            "id",
            "codes",
            F.lit(None).cast("array<double>").alias("qvec"),
        )
    )

    def score_cell(pdf):
        import pandas as pd

        st = pdf[pdf["role"] == 0]
        pr = pdf[pdf["role"] == 1]
        if not len(st) or not len(pr):
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "neighbor_id": pd.Series(dtype="int64"),
                 "dist2": pd.Series(dtype="float64")}
            )
        qids = pr["id"].to_numpy(dtype="int64")
        Q = np.asarray(list(pr["qvec"]), dtype="float64")
        ids = st["id"].to_numpy(dtype="int64")
        C = np.asarray(list(st["codes"]), dtype="int64")
        T = adc_tables(Q, books)
        out_q, out_id, out_d = adc_score_topk(T, qids, C, ids, k)
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_id, "dist2": out_d}
        )

    scored = (
        stored_side.unionByName(probe_side)
        .groupBy("cell")
        .applyInPandas(score_cell, "query_id bigint, neighbor_id bigint, dist2 double")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("dist2", 6).alias("dist2"), "rnk")
    )


def append_to_ann_index(
    spark: SparkSession,
    new_vecs: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    ingest_batch: int = 1,
    idempotent: bool = False,
    cell_partitions: int | None = None,
) -> dict[str, str]:
    """Grow the corpus under the SAME manifest-pinned quantizer — the
    append path the module docstring promises: one Arrow assign pass
    over the new batch (two-level inference when the manifest carries
    ``k_f``, the stored flat centroid list otherwise — never a
    re-train, never a corpus re-assign), PQ codes from the stored
    codebooks when the index is IVF-PQ, landed under the batch's
    ``ingest_batch`` partition. ``idempotent=True`` switches to
    dynamic partition overwrite so a replayed batch REPLACES its own
    partition instead of appending a second copy (the streaming-ingest
    replay convention shared with the dedup/embedding indexes).

    Refuses an index written before the batch-partitioned layout
    (mixed partitioned/unpartitioned parquet is unreadable) — rebuild
    those once to append. Re-learn on drift remains a rebuild.

    Returns the updated manifest (Record count recounted from the
    written footers)."""
    if int(ingest_batch) == 0:
        # 0 is the BUILD partition: an idempotent "append" there would
        # dynamic-overwrite the original corpus with the batch — the
        # silent data loss the loud-refusal convention exists to stop
        raise ValueError(
            "ingest_batch=0 is the build partition; appends start at 1"
        )
    manifest = read_manifest(index_dir)
    cells_path = os.path.join(index_dir, "cells")
    stored_schema = spark.read.parquet(cells_path).schema
    if "ingest_batch" not in stored_schema.names:
        raise ValueError(
            f"ANN index at {index_dir!r} predates the batch-partitioned "
            "cells layout; rebuild it once before appending"
        )
    dim = int(manifest["dim"])
    n_cells = int(manifest["n_cells"])
    if manifest["quantizer"] == "kmeans-two-level" and "k_f" in manifest:
        two_level_model = load_two_level_model(spark, index_dir)
        centroids = None
    else:
        two_level_model = None
        centroids = (
            load_centroids(spark, index_dir)
            if manifest["quantizer"] != "pseudo-random"
            else None
        )
    batch = _assign_storage_cells(
        new_vecs, id_col, vec_col, dim, n_cells, two_level_model, centroids
    )
    if "pq_m" in manifest:
        from batch_process_dpla_index_spark.operators.quantization import (
            pq_encode,
        )

        books = load_pq_codebooks(spark, index_dir)
        codes = pq_encode(new_vecs, books, id_col, vec_col)
        batch = batch.join(codes, "id")
    writer = keyed_repartition(
        batch.withColumn("ingest_batch", F.lit(int(ingest_batch))),
        cell_partitions if cell_partitions is None else min(n_cells, cell_partitions),
        "cell",
    ).write
    if idempotent:
        writer = writer.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        )
    else:
        writer = writer.mode("append")
    writer.partitionBy("ingest_batch").parquet(cells_path)
    # live count: tombstoned rows don't serve, so they don't count —
    # and an appended id that was deleted under an EARLIER watermark
    # counts again (append-after-delete resurrects by design)
    manifest["Record count"] = str(_live_cells(spark, index_dir).count())
    write_manifest(manifest, index_dir)
    return manifest


def ann_index_occupancy(
    spark: SparkSession, index_dir: str, design_point: int = 64
) -> dict[str, str]:
    """Rows-per-cell occupancy vs the design point — the observable
    behind the "re-learn on drift = rebuild" trigger (module
    docstring), mirroring `embedding_index.embedding_index_occupancy`
    so the product MOST likely to drift (it also pins PQ codebooks) is
    not the one without the trigger. Counts LIVE rows (tombstones
    excluded). One count aggregate over the stored cells (|cells|
    output rows → bounded driver reduce); ``needs_rebuild`` flags when
    mean occupancy over the manifest's cell count exceeds twice the
    design point."""
    manifest = read_manifest(index_dir)
    n_cells = int(manifest["n_cells"])
    per_cell = (
        _live_cells(spark, index_dir)
        .groupBy("cell")
        .count()
        .agg(
            F.sum("count").alias("n_vecs"),
            F.max("count").alias("max_cell"),
            F.count("*").alias("occupied"),
        )
        .first()
    )
    n_vecs = int(per_cell["n_vecs"] or 0)
    mean_occ = n_vecs / n_cells if n_cells else 0.0
    return {
        "n_vecs": str(n_vecs),
        "n_cells": str(n_cells),
        "occupied_cells": str(int(per_cell["occupied"] or 0)),
        "max_per_cell": str(int(per_cell["max_cell"] or 0)),
        "mean_per_cell": f"{mean_occ:.2f}",
        "design_point": str(design_point),
        "needs_rebuild": str(mean_occ > 2 * design_point),
    }


def rebuild_ann_index(
    spark: SparkSession,
    index_dir: str,
    n_cells: int | None = None,
    design_point: int = 64,
    kmeans_iters: int = 10,
    cell_partitions: int | None = None,
) -> dict[str, str]:
    """Re-fit the manifest-pinned quantizer on the stored LIVE vectors
    and re-assign every row under the new geometry (default cell
    count: resized back to the design point, ``max(16, n_vecs //
    design_point)``) — the rebuild the build-time ``n_cells`` pin and
    "re-learn on drift" defer to. Mirrors
    `embedding_index.rebuild_embedding_index`:

    - ``ingest_batch`` partitions preserved row-for-row (replay
      pruning stays valid); a pre-batch-layout index gains
      ``ingest_batch=0``, which is the one-time rebuild
      `append_to_ann_index`'s refusal message points at.
    - the re-attach joins on a ROW-UNIQUE surrogate key, never the
      stored id (append doesn't enforce id uniqueness across batches).
    - tombstoned rows are physically dropped and the delete set
      cleared (the takedown is spent in the rewrite).
    - PQ codes/codebooks carry through untouched — they encode the
      VECTORS, not the cell geometry, so re-assignment can't
      invalidate them.
    - quantizer type is manifest-pinned: a two-level index re-fits the
      two-level model (and re-persists coarse/fine + the new fit's
      ``k_f``); a flat-kmeans index re-fits flat; pseudo-random just
      re-derives the deterministic grid at the new cell count. A
      PRE-round-12 two-level index (flat-flattened layout, no ``k_f``)
      re-fits the true two-level model — rebuilding upgrades it to the
      IMI-served layout.

    Failure-safe swap (the family convention): new cells + new model
    artifacts land in sibling dirs, the live cells move aside FIRST
    (every read in the crash window fails loudly — never a probe under
    mismatched geometry), the manifest flips while cells is absent,
    then the new data takes the live names; old copies and the
    tombstone set are deleted LAST."""
    import shutil

    manifest = read_manifest(index_dir)
    dim = int(manifest["dim"])
    quantizer = manifest["quantizer"]
    cells_dir = os.path.join(index_dir, "cells")
    live = _live_cells(spark, index_dir)
    if "ingest_batch" not in live.columns:
        live = live.withColumn("ingest_batch", F.lit(0))
    # __rk minted once on a persisted frame (monotonically_increasing_id
    # is only stable for a fixed partition layout; keyed is consumed by
    # the re-assign AND the join-back)
    keyed = live.withColumn(
        "__rk", F.monotonically_increasing_id()
    ).persist()
    n_vecs = keyed.count()
    if n_vecs == 0:
        # a rebuild of a fully-tombstoned index would swap in an
        # UNREADABLE empty cells dataset and then delete the only
        # remaining copy — the same refusal compact_index_tombstones
        # makes, on the exact path its error message recommends
        keyed.unpersist()
        raise ValueError(
            "rebuild would produce an empty index (every stored row is "
            "tombstoned); an empty cells dataset is unreadable — delete "
            "the index directory instead"
        )
    new_cells = (
        int(n_cells) if n_cells is not None
        else max(16, n_vecs // design_point)
    )

    two_level_model = None
    centroids = None
    fit_input = keyed.select("__rk", F.col("vec").alias("__v"))
    if quantizer == "kmeans-two-level":
        from batch_process_dpla_index_spark.operators.clustering import (
            kmeans_fit_two_level,
        )

        coarse, fine, k_f = kmeans_fit_two_level(
            fit_input, "__rk", "__v", k=new_cells, n_iter=kmeans_iters
        )
        two_level_model = (coarse, fine, k_f)
        new_cells = sum(len(m) for m in fine.values())
    elif quantizer == "kmeans-maximin":
        from batch_process_dpla_index_spark.operators.clustering import (
            kmeans_fit,
        )

        centroids = kmeans_fit(
            fit_input, "__rk", "__v", k=new_cells, n_iter=kmeans_iters
        )
    elif quantizer != "pseudo-random":
        raise ValueError(f"unknown quantizer {quantizer!r} in manifest")

    reassigned = (
        _assign_storage_cells(
            fit_input, "__rk", "__v", dim, new_cells, two_level_model,
            centroids,
        )
        .select(F.col("cell"), F.col("id").alias("__rk"))
        .join(keyed.drop("cell"), "__rk")
        .drop("__rk")
    )
    tmp_cells = os.path.join(index_dir, "cells__rebuild")
    shutil.rmtree(tmp_cells, ignore_errors=True)
    (
        keyed_repartition(
            reassigned,
            cell_partitions if cell_partitions is None else min(new_cells, cell_partitions),
            "cell",
        )
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(tmp_cells)
    )
    keyed.unpersist()

    # new quantizer artifacts into sibling dirs
    from batch_process_dpla_index_spark.operators.relational import (
        _arrow_local_frame,
    )

    swaps: list[tuple[str, str]] = [(tmp_cells, cells_dir)]
    if two_level_model is not None:
        coarse, fine, k_f = two_level_model
        for name, rows, schema in (
            (
                "coarse_centroids",
                [(c, [float(x) for x in v]) for c, v in enumerate(coarse)],
                "ccell int, centroid array<double>",
            ),
            (
                "fine_centroids",
                [
                    (c, j, [float(x) for x in v])
                    for c in sorted(fine)
                    for j, v in enumerate(fine[c])
                ],
                "ccell int, fine int, centroid array<double>",
            ),
        ):
            tmp = os.path.join(index_dir, name + "__rebuild")
            _arrow_local_frame(spark, rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            swaps.append((tmp, os.path.join(index_dir, name)))
    else:
        if centroids is None:
            from batch_process_dpla_index_spark.operators.similarity import (
                _centroid_matrix,
            )

            centroids = _centroid_matrix(dim, new_cells).tolist()
        tmp = os.path.join(index_dir, "centroids__rebuild")
        _arrow_local_frame(
            spark,
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        swaps.append((tmp, os.path.join(index_dir, "centroids")))

    # swap: live cells aside first (index loudly unreadable from here),
    # manifest flips while cells is absent, new data takes the live
    # names, old copies + tombstones deleted LAST
    olds: list[str] = []
    for _tmp, dst in swaps:
        if os.path.isdir(dst):
            old = dst + "__old"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(dst, old)
            olds.append(old)
    manifest["rebuilt_from"] = manifest["n_cells"]
    manifest["n_cells"] = str(new_cells)
    manifest["Record count"] = str(n_vecs)
    manifest["Tombstone count"] = "0"
    if two_level_model is not None:
        manifest["k_f"] = str(two_level_model[2])
        manifest["coarse_k"] = str(len(two_level_model[0]))
    else:
        # a pre-r12 two-level index rebuilt as... never happens: the
        # quantizer pin routes two-level through the branch above; flat
        # pins never carry k_f
        manifest.pop("k_f", None)
        manifest.pop("coarse_k", None)
    write_manifest(manifest, index_dir)
    for tmp, dst in swaps:
        os.rename(tmp, dst)
    for old in olds:
        shutil.rmtree(old)
    if two_level_model is not None:
        # a pre-r12 two-level index carried a FLAT centroids dataset
        # (the flattened layout); the rebuilt index serves through
        # coarse/fine via the k_f gate, so the stale flat artifact is
        # dead weight — drop it
        shutil.rmtree(os.path.join(index_dir, "centroids"), ignore_errors=True)
    clear_tombstones(index_dir)
    return manifest


def ann_query_indexed(
    spark: SparkSession,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    k: int = 5,
    n_probe: int = 4,
    probe_coarse: int | None = None,
    probe_fine: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, score, rank) for each query vector
    against the stored index — quantizer parameters come from the
    manifest, never the caller.

    A two-level-built index serves through the IMI probe
    (`similarity._imi_probe_cells`): rank k_c coarse centroids, keep
    ``probe_coarse``, rank only those cells' fine codebooks, keep
    ``probe_fine`` each — per-query probe cost (k_c + p_c·k_f)·dim ≈
    O(√k·dim), vs the flat layout's O(k·dim) cell ranking. When the
    caller passes only the flat ``n_probe`` budget,
    :func:`_imi_probe_split` factors it (full budget ⇒ exact search,
    same calibration contract as the flat path). Scoring tail is the
    shared `_ivf_score_and_rank` either way."""
    manifest = read_manifest(index_dir)
    stored = _live_cells(spark, index_dir)
    # "k_f" gates the IMI route: indexes built by the pre-round-12
    # two-level format flattened the model to the FLAT layout (flat
    # centroids dataset + flat cell assignments, no persisted stride),
    # so they must keep serving flat — branching on the quantizer name
    # alone would send them into load_two_level_model and crash on
    # artifacts they never wrote
    if manifest["quantizer"] == "kmeans-two-level" and "k_f" in manifest:
        from batch_process_dpla_index_spark.operators.similarity import (
            _imi_probe_cells,
            _ivf_score_and_rank,
        )

        coarse, fine, k_f = load_two_level_model(spark, index_dir)
        p_c, p_f = _imi_probe_split(
            n_probe, int(manifest["n_cells"]), k_f, len(fine),
            probe_coarse, probe_fine,
        )
        probing = _imi_probe_cells(
            queries, coarse, fine, k_f, p_c, p_f, id_col, vec_col
        )
        stored_side = stored.select(
            F.col("cell").cast("int").alias("cell"),
            F.lit(0).alias("role"),
            "id",
            "vec",
        )
        return _ivf_score_and_rank(stored_side, probing, k)
    if probe_coarse is not None or probe_fine is not None:
        # silently ignoring the IMI widths on a flat-served index would
        # hand back n_probe behavior under an IMI-budget label
        raise ValueError(
            "probe_coarse/probe_fine only apply to a two-level index "
            f"(this one serves flat: quantizer={manifest['quantizer']!r}"
            f"{', pre-round-12 flattened layout' if manifest['quantizer'] == 'kmeans-two-level' else ''})"
        )
    dim = int(manifest["dim"])
    n_cells = int(manifest["n_cells"])
    centroids = load_centroids(spark, index_dir)
    return ivf_query_topk(
        stored,
        queries,
        id_col,
        vec_col,
        dim=dim,
        k=k,
        n_cells=n_cells,
        n_probe=n_probe,
        centroids=centroids,
    )


def ann_recall_indexed(
    spark: SparkSession,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    k: int = 5,
    n_probe: int = 4,
    probe_coarse: int | None = None,
    probe_fine: int | None = None,
) -> DataFrame:
    """Recall@k of the index's probe-limited serve path against
    brute-force truth over the STORED vectors — the probes-vs-recall
    tuning diagnostic (`operators.similarity.ann_recall_report`)
    surfaced at the product/CLI tier: build index → serve a query
    sample → compare to exact search, without the caller re-supplying
    the corpus (truth reads the index's own ``cells`` dataset, so the
    report can never silently grade against a different corpus than
    the index serves).

    Returns one row per query: (query_id, n_hits, recall_at_k).
    Probing every cell IS the exact search, so ``n_probe = n_cells``
    must report recall 1.0 — the calibration check the CLI prints.

    Scale contract: ``queries`` is a bounded sample (the brute-force
    truth side enforces that); both sides are ~|Q|·k rows into one
    broadcast equi-join."""
    from batch_process_dpla_index_spark.operators.similarity import (
        ann_recall_report,
        cosine_topk,
    )

    approx = ann_query_indexed(
        spark, queries, id_col, vec_col, index_dir, k=k, n_probe=n_probe,
        probe_coarse=probe_coarse, probe_fine=probe_fine,
    )
    stored = _live_cells(spark, index_dir).select(
        F.col("id").alias(id_col), F.col("vec").alias(vec_col)
    )
    truth = cosine_topk(stored, queries, id_col, vec_col, k=k)
    return ann_recall_report(truth, approx, k=k)
