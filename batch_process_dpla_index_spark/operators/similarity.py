"""Similarity search over embedding columns (array<float>).

Four tiers, one output contract (query_id, neighbor_id, score, rank):

- cosine_topk:        exact brute-force top-k. Default physical plan is
                      the Arrow/BLAS mapInPandas path (per-batch matmul
                      + local top-k — never materializes |Q|×|C|);
                      ``use_pandas=False`` keeps the pure-expression
                      reference tier.
- cosine_topk_pandas: the Arrow/BLAS plan itself (what the default
                      routes to).
- lsh_ann_topk:       random-hyperplane LSH (sign sketch) bucketing;
                      only bucket-sharing pairs are scored. Recall
                      tunable via (n_planes, n_tables); shuffle on
                      bucket keys only.
- ivf_topk:           inverted-file coarse quantization: single-cell
                      storage + n_probe query fan-out, per-cell Arrow
                      matmul scoring.

Plus embedding_near_dup (threshold pairs — the vector member of the
dedup family). Hyperplanes/centroids derive from the deterministic
h60 digest, so every tier is value-reproducible in the SQL oracle
without RNG state.

Known precision sensitivity (documented, accepted): the BLAS tiers
rank on raw float64 scores whose summation order (blocked dgemm)
differs from the SQL oracle's left-to-right fold, so two DISTINCT
candidates whose true cosines differ by less than ~1 ulp could rank
differently across engines, and a projection within an ulp of zero
could flip an LSH bucket bit. Exact ties (duplicate embeddings) are
safe — identical inputs produce identical dots in both engines and
the deterministic neighbor-id tie-break applies; the sub-ulp
near-tie case has never occurred on the fixtures and rounding-only
emission (round 6) keeps emitted values engine-identical. Ranking on
rounded scores both sides would close it fully and is the planned
follow-up if a fixture ever trips it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_process_dpla_index_spark.functions.vectors import cosine, dot


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    use_pandas: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, score, rank). Self-matches excluded.

    Physical strategy: the default routes through the Arrow/BLAS
    ``mapInPandas`` plan (:func:`cosine_topk_pandas`) — per-batch
    matmul with immediate local top-k, so only ``batches × |Q| × k``
    candidate rows ever reach a shuffle. ``use_pandas=False`` keeps the
    pure-expression plan (broadcast join + per-query window), which
    materializes |Q|×|C| scored rows into the window shuffle — exact
    and oracle-identical, but scale-capped; it stays as the reference
    tier for tests.
    """
    if use_pandas:
        return cosine_topk_pandas(corpus, queries, id_col, vec_col, k)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _h60_py(s: str) -> int:
    """Driver-side twin of functions.text.h60 (first 15 md5 hex chars)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _h60_unit(s: str) -> float:
    """h60 scaled to [-1, 1) — THE pseudo-random float generator behind
    every deterministic hyperplane/centroid/codebook component. One
    definition on purpose: the expression tiers, their numpy twins,
    and the SQL oracles must all regenerate bit-identical doubles, so
    the scaling constants live in exactly one place."""
    return (_h60_py(s) % 2_000_003) / 1_000_001.5 - 1.0


def _hyperplane(table: int, plane: int, dim: int):
    """Deterministic pseudo-random unit-free hyperplane: component d is
    h60('t|p|d') scaled to [-1, 1). Computed driver-side with hashlib
    (identical value to the in-plan h60) and embedded as plain float
    literals — ``dim × planes × tables`` md5 *expression nodes* in every
    plan was a round-1 compile hazard; literals are free."""
    return F.array(
        *[F.lit(_h60_unit(f"hp:{table}:{plane}:{d}")) for d in range(dim)]
    )


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """(id, table, bucket) sign-sketch buckets: bucket bit j = sign(v·p_j)."""
    out_rows = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("bigint")
        for j in range(n_planes):
            proj = dot(F.col(vec_col), _hyperplane(t, j, dim))
            bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        out_rows.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(F.array(*out_rows)).alias("tb"),
    ).select("id", "vec", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def lsh_ann_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    use_pandas: bool = False,
) -> DataFrame:
    """Approximate all-pairs top-k: score only bucket-sharing candidates.

    Output: (query_id, neighbor_id, score, rank) — a subset of the exact
    result with tunable recall. Shuffles on (table, bucket) then on
    query_id for the top-k window; never materializes all pairs.

    Physical strategy: ``use_pandas=True`` (what the registered query
    uses) does vectorized bucket assignment + sharded per-bucket
    matmul scoring with lossless group-local top-k — measured ~4× the
    expression plan at sf0.1 (1.3 s vs 5.1 s warm) and the gap widens
    with per-bucket candidate volume. The default expression plan
    stays as the zero-Python reference tier (same values, oracle-
    verified equal).
    """
    if use_pandas:
        b = lsh_buckets_pandas(corpus, id_col, vec_col, dim, n_planes, n_tables)
        pairs = _scored_bucket_pairs(b, ordered=False, k=k).dropDuplicates(
            ["id_a", "id_b"]
        )
        scored = pairs.select(
            F.col("id_a").alias("query_id"),
            F.col("id_b").alias("neighbor_id"),
            F.when(F.isnan("raw_score"), F.lit(None))
            .otherwise(F.col("raw_score"))
            .alias("score"),
        )
    else:
        # the self-join consumes the bucket frame twice; without the
        # persist the tables×planes interpreted dot-fold bucketing of
        # the whole corpus executes once per side (persist discipline:
        # any frame consumed twice is cached and released by the
        # caller's unpersist_deps)
        b = lsh_buckets(corpus, id_col, vec_col, dim, n_planes, n_tables).persist()
        cand = (
            b.alias("x")
            .join(b.alias("y"), ["table", "bucket"])
            .filter(F.col("x.id") != F.col("y.id"))
            .select(
                F.col("x.id").alias("query_id"),
                F.col("x.vec").alias("q_vec"),
                F.col("y.id").alias("neighbor_id"),
                F.col("y.vec").alias("c_vec"),
            )
            .distinct()
        )
        scored = cand.withColumn("score", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
    if not use_pandas:
        # local import: dedup imports _h60_py from this module
        from batch_process_dpla_index_spark.operators.dedup import (
            _with_cached_deps,
        )

        ranked = _with_cached_deps(ranked, [b])
    return ranked


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine — the Arrow/BLAS fast path for the brute tier.

    Same contract and results as :func:`cosine_topk`, different physical
    plan: the (small, broadcastable-by-contract) query side is collected
    to a dense float64 matrix and shipped in the UDF closure; the corpus
    streams through ``mapInPandas`` where each Arrow batch is scored
    against ALL queries with one BLAS matmul and immediately reduced to
    a per-batch top-k per query. Only ``batches × |Q| × k`` candidate
    rows reach the final window — never the |Q|×|C| materialization the
    expression form pays (the round-1 scale hazard). No shuffle until
    the tiny candidate set.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not q_rows:
        # np.array([]) is 1-D and the axis-1 reductions below would
        # raise; the expression tier returns an empty frame for an
        # empty query side, so this tier must too (same contract)
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, score double, rank int"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype="int64")
    q_mat = np.array([r[1] for r in q_rows], dtype="float64")
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    id_name, vec_name = id_col, vec_col

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            c_ids = pdf[id_name].to_numpy(dtype="int64")
            c_mat = np.array(list(pdf[vec_name]), dtype="float64")
            if c_mat.size == 0:
                continue
            c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
            denom = np.outer(c_norm, q_norm)
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.where(denom == 0, np.nan, (c_mat @ q_mat.T) / denom)
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = scores[:, j].copy()
                mask = c_ids != qid  # exclude self-matches
                ids_j, col = c_ids[mask], col[mask]
                if ids_j.size == 0:
                    continue
                order = np.lexsort((ids_j, -col))[:k]  # NaN sorts last
                out_q.extend([qid] * len(order))
                out_n.extend(ids_j[order])
                out_s.extend(col[order])
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "raw_score": pd.Series(out_s, dtype="float64"),
                }
            )

    cand = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _score, "query_id bigint, neighbor_id bigint, raw_score double"
    )
    # NaN marks zero-norm pairs; surface them as NULL (try_divide parity).
    scored = cand.withColumn(
        "score", F.when(F.isnan("raw_score"), F.lit(None)).otherwise(F.col("raw_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def embedding_near_dup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.3,
    n_planes: int = 8,
    n_tables: int = 4,
    use_pandas: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space member
    of the dedup family: (id_a < id_b, score) for pairs sharing an LSH
    bucket whose exact cosine ≥ threshold.

    Same 100 TB shape as :func:`lsh_ann_topk`: shuffle on bucket keys,
    candidate verification only — never all pairs. Recall is the LSH
    S-curve; the verification join makes precision exact. Default
    physical strategy is the per-bucket Arrow matmul (see
    lsh_ann_topk); ``use_pandas=False`` keeps the zero-Python
    expression plan.
    """
    if use_pandas:
        b = lsh_buckets_pandas(corpus, id_col, vec_col, dim, n_planes, n_tables)
        pairs = _scored_bucket_pairs(
            b, ordered=True, threshold=threshold
        ).dropDuplicates(["id_a", "id_b"])
        return pairs.select(
            "id_a", "id_b", F.round("raw_score", 6).alias("score")
        )
    from batch_process_dpla_index_spark.operators.dedup import _with_cached_deps

    # persist: the self-join reads the bucket frame twice (discipline:
    # caller releases via unpersist_deps)
    b = lsh_buckets(corpus, id_col, vec_col, dim, n_planes, n_tables).persist()
    cand = (
        b.alias("x")
        .join(b.alias("y"), ["table", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("x.vec").alias("vec_a"),
            F.col("y.id").alias("id_b"),
            F.col("y.vec").alias("vec_b"),
        )
        .distinct()
    )
    return _with_cached_deps(
        cand.withColumn("score", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", F.round("score", 6).alias("score")),
        [b],
    )


def _centroid(cell: int, dim: int):
    """Deterministic pseudo-random IVF centroid (same h60-literal scheme
    as the hyperplanes: computed driver-side, embedded as float
    literals — zero plan bloat)."""
    return F.array(
        *[
            F.lit(_h60_unit(f"ivf:{cell}:{d}"))
            for d in range(dim)
        ]
    )


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_cells: int = 16,
    n_probe: int = 1,
) -> DataFrame:
    """(id, vec, cells: array<int>) — the ``n_probe`` nearest coarse
    cells by dot product, nearest first. n_probe=1 is the storage
    assignment; queries probe more cells for recall."""
    scored = F.array(
        *[
            F.struct(
                dot(F.col(vec_col), _centroid(c, dim)).alias("d"),
                F.lit(c).alias("cell"),
            )
            for c in range(n_cells)
        ]
    )
    # lexicographic struct sort: by dot asc then cell asc → reverse for
    # best-first; ties break toward the higher cell id (deterministic).
    probes = F.slice(F.reverse(F.array_sort(scored)), 1, n_probe)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.transform(probes, lambda s: s.getField("cell")).alias("cells"),
    )


def _centroid_matrix(dim: int, n_cells: int):
    """numpy twin of :func:`_centroid` — identical float values."""
    import numpy as np

    return np.array(
        [
            [
                _h60_unit(f"ivf:{c}:{d}")
                for d in range(dim)
            ]
            for c in range(n_cells)
        ],
        dtype="float64",
    )


def _pseudo_random_two_level(dim: int, n_cells: int):
    """Group the flat pseudo-random centroid grid
    (:func:`_centroid_matrix`) into a two-level model over the SAME
    global cell-id space: fine cell ``c*k_f + j`` is flat row
    ``c*k_f + j``, coarse centroid ``c`` is the mean of its group's
    rows. Assignment through `clustering.kmeans_assign_two_level`
    then costs O(√k·dim) per row while cell ids stay exactly the flat
    quantizer's row indices — no training pass, and stored/probe
    sides agree by construction (both run the same two-level
    inference; a row near a group boundary may land one cell over vs
    the flat argmin — the standard IVF probe-width tradeoff).

    Returns ``(coarse, fine, k_f)`` in the `kmeans_fit_two_level`
    model shape."""
    import math

    M = _centroid_matrix(dim, n_cells)
    k_f = max(1, math.isqrt(n_cells))
    k_c = -(-n_cells // k_f)  # ceil
    coarse: list[list[float]] = []
    fine: dict[int, list[list[float]]] = {}
    for c in range(k_c):
        rows = M[c * k_f : min((c + 1) * k_f, n_cells)]
        fine[c] = rows.tolist()
        coarse.append(rows.mean(axis=0).tolist())
    return coarse, fine, k_f


def _imi_probe_split(
    n_probe: int,
    n_cells: int,
    k_f: int,
    n_trained_coarse: int,
    probe_coarse: int | None,
    probe_fine: int | None,
) -> tuple[int, int]:
    """Resolve a flat ``n_probe`` cell budget into the IMI's
    (coarse, fine) probe widths when the caller didn't pick them:
    a BALANCED split (p_c ≈ √n_probe coarse regions, p_f fine probes
    each, p_c·p_f ≥ n_probe) — probing one coarse region deeply loses
    to the flat index whenever a query sits near a coarse boundary,
    so budget goes to region diversity first (FAISS's IMI default
    shape). Calibration contract: ``n_probe ≥ n_cells`` (the
    full-probe request) probes every trained cell, so the serve is
    the exact search — the same property the flat path has."""
    import math

    if probe_coarse is not None and probe_fine is not None:
        return max(1, int(probe_coarse)), max(1, int(probe_fine))
    if probe_fine is not None:
        # one width given: the other derives from the n_probe budget —
        # defaulting it to FULL would silently pay the O(k·dim) scan
        # the IMI layout exists to avoid
        p_f = max(1, int(probe_fine))
        return min(n_trained_coarse, max(1, -(-n_probe // p_f))), p_f
    if probe_coarse is not None:
        p_c = max(1, int(probe_coarse))
        return p_c, min(k_f, max(1, -(-n_probe // p_c)))
    if n_probe >= n_cells:
        return n_trained_coarse, k_f
    p_c = min(n_trained_coarse, max(1, math.isqrt(max(1, n_probe - 1)) + 1))
    p_f = min(k_f, -(-n_probe // p_c))  # ceil, capped at the stride
    while p_c * p_f < n_probe and p_c < n_trained_coarse:
        p_c += 1  # k_f capped the fine width; widen coarse to cover
    return p_c, p_f


def _two_level_probe_blocks(
    mat, model, k_f: int, p_c: int, n_probe_fine: int, metric: str
):
    """Shared probe kernel of :func:`_imi_probe_cells` and
    :func:`two_level_cells_pandas`: rank the trained coarse centroids
    per row (keep ``p_c``), then rank only those cells' fine codebooks
    (keep ``n_probe_fine`` each, capped by ragged codebook width), and
    yield one ``(slot, rows, gcells)`` block per (probe slot, unique
    coarse cell) — ``slot`` the 0-based coarse probe rank (lets a
    uniform-width consumer scatter the block straight into column
    band ``slot*p_f:(slot+1)*p_f`` of a preallocated matrix), ``rows``
    the batch row indices in the block, ``gcells`` their
    (len(rows) × p_f) probed global cell ids. One BLAS matmul +
    one row-wise argsort per block; the per-row/per-candidate Python
    loop is the interpreted cost class this module bans from serve
    paths. ``metric``: "l2" = reduced-form d² asc, ties to the lower
    cell (trained k-means convention, numpy stable argsort — the SQL
    (d2, ccell) row_number twin); "dot" = dot DESC, ties to the
    HIGHER cell (`_cell_order`, the flat pseudo-random quantizer's
    scale-invariant convention)."""
    import numpy as np

    cell_of, cents, csq, fmats, fsq = model
    if metric == "dot":
        corder = _cell_order(mat @ cents.T)[:, :p_c]
    else:
        cd2 = csq[None, :] - 2.0 * (mat @ cents.T)
        corder = np.argsort(cd2, axis=1, kind="stable")[:, :p_c]
    for s in range(p_c):
        slot = cell_of[corder[:, s]]
        for c in np.unique(slot):
            rows = np.nonzero(slot == c)[0]
            fm = fmats[int(c)]
            p_f = min(n_probe_fine, fm.shape[0])
            if metric == "dot":
                order = _cell_order(mat[rows] @ fm.T)[:, :p_f]
            else:
                fd2 = fsq[int(c)][None, :] - 2.0 * (mat[rows] @ fm.T)
                order = np.argsort(fd2, axis=1, kind="stable")[:, :p_f]
            yield s, rows, int(c) * k_f + order


def two_level_cells_pandas(
    df: DataFrame,
    coarse,
    fine: dict[int, list[list[float]]],
    k_f: int,
    n_probe_coarse: int,
    n_probe_fine: int,
    id_col: str,
    vec_col: str,
    metric: str = "l2",
) -> DataFrame:
    """(id, vec, cells): each row's probed GLOBAL two-level cells in
    the `ivf_cells_pandas` output shape — ``cells[0]`` is the
    two-level rank-1 cell (best fine within the best coarse); under
    ``metric="l2"`` that is exactly
    `clustering.kmeans_assign_two_level`'s storage cell, so
    ``element_at(cells, 1)`` keeps working as the storage assignment.
    ``metric="dot"`` ranks by dot product DESC with ties toward the
    HIGHER cell id — the flat pseudo-random quantizer's `_cell_order`
    convention, which is scale-invariant like the flat path (an L2
    ranking over the untrained grid would change the metric the
    incremental-dedup family's stored cells were defined under).
    Remaining entries follow (coarse rank, fine rank) order. One Arrow
    pass; per-row cost (k_c + p_c·k_f)·dim ≈ O(√k·dim) vs the flat
    pass's O(k·dim)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from batch_process_dpla_index_spark.operators.clustering import (
        _two_level_model_arrays,
    )

    if metric not in ("l2", "dot"):
        raise ValueError(f"unknown metric {metric!r}; expected 'l2' or 'dot'")
    model = _two_level_model_arrays(coarse, fine, k_f)
    p_c = min(n_probe_coarse, len(model[0]))
    # Uniform fine-probe width (the common full-grid case — every
    # trained cell's codebook at least n_probe_fine wide, or all the
    # same narrower width): every block then lands in a fixed column
    # band of a preallocated matrix, so the probe lists assemble as
    # numpy scatters + ONE C-level tolist, not the per-row/per-cell
    # interpreted extend this module bans from serve paths.
    widths = {min(n_probe_fine, m.shape[0]) for m in model[3].values()}
    p_f_u = widths.pop() if len(widths) == 1 else None
    id_name, vec_name = id_col, vec_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_name]), dtype="float64")
            if p_f_u is not None:
                # full-grid fast path: blocks partition the rows within
                # each slot, so the matrix is completely filled
                out = np.empty((len(pdf), p_c * p_f_u), dtype="int64")
                for s, rows, gids in _two_level_probe_blocks(
                    mat, model, k_f, p_c, n_probe_fine, metric
                ):
                    out[rows, s * p_f_u:(s + 1) * p_f_u] = gids
                probe_lists = out.tolist()
            else:
                # ragged p_f (under-full fine codebooks) keeps the
                # per-row python assembly, still from the shared
                # kernel's numpy blocks
                probe_lists = [[] for _ in range(len(pdf))]
                for _s, rows, gids in _two_level_probe_blocks(
                    mat, model, k_f, p_c, n_probe_fine, metric
                ):
                    for r, row_gids in zip(rows, gids):
                        probe_lists[int(r)].extend(int(g) for g in row_gids)
            yield pd.DataFrame(
                {
                    "id": pdf[id_name].to_numpy(dtype="int64"),
                    "vec": pdf[vec_name],
                    "cells": probe_lists,
                }
            )

    vec_ddl = df.schema[vec_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        run, f"id bigint, vec {vec_ddl}, cells array<int>"
    )


def _cell_order(dots):
    """Row-wise coarse-cell ranking by (dot desc, cell desc) — THE IVF
    assignment tie-break. Every site that ranks cells (`ivf_cells_pandas`,
    `quantization.ivf_pq_topk`'s storage and probe sides) must call this
    one implementation, or a drifted copy silently desynchronizes the
    engine from the `_ivf_oracle` replay's `ORDER BY d DESC, cell DESC`."""
    import numpy as np

    cell_ids = np.arange(dots.shape[1])
    return np.lexsort((-np.tile(cell_ids, (dots.shape[0], 1)), -dots), axis=1)


def ivf_cells_pandas(
    df: DataFrame, id_col: str, vec_col: str, dim: int, n_cells: int, n_probe: int,
    centroids=None,
    include_vec: bool = True,
) -> DataFrame:
    """(id, vec, cells array<int>) via one Arrow pass: N×dim @ dim×cells
    matmul + per-row argsort — the vectorized twin of
    :func:`ivf_assign` (ties break toward the higher cell id, same as
    the expression form's struct-max). Pass ``centroids`` (k×dim, e.g.
    from ``operators.clustering.kmeans_fit``) to use a LEARNED coarse
    quantizer instead of the deterministic pseudo-random one.

    ``include_vec=False`` drops the vector from the OUTPUT (the
    assignment still reads it): Catalyst cannot prune mapInPandas
    output columns, so a consumer that only wants cell ids (e.g. the
    occupancy diagnostic) would otherwise pay N×dim floats of Arrow
    transfer back to the JVM for nothing."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    if centroids is not None:
        cents = np.asarray(centroids, dtype="float64").T  # dim × cells
    else:
        cents = _centroid_matrix(dim, n_cells).T  # dim × cells
    id_name, vec_name = id_col, vec_col

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_name]), dtype="float64")
            dots = mat @ cents  # N × cells
            order = _cell_order(dots)[:, :n_probe]
            out = {"id": pdf[id_name].to_numpy()}
            if include_vec:
                out["vec"] = pdf[vec_name]
            out["cells"] = [row.astype("int32").tolist() for row in order]
            yield pd.DataFrame(out)

    vec_ddl = df.schema[vec_col].dataType.simpleString()
    schema = (
        f"id bigint, vec {vec_ddl}, cells array<int>"
        if include_vec
        else "id bigint, cells array<int>"
    )
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(assign, schema)


def cell_occupancy(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = 16,
) -> DataFrame:
    """(cell, n_vecs, share, crowded): rows-per-cell occupancy of the
    IVF coarse quantizer — the observable behind the embedding-index
    rebuild trigger (`products.embedding_index.embedding_index_occupancy`
    surfaces the same numbers for a PERSISTED index; this is the
    in-line twin over a corpus frame, with per-cell resolution for
    skew diagnosis). ``crowded`` flags cells holding more than twice
    the mean occupancy — the skew that converts into probe-time hot
    cells and over-long per-cell scoring tasks.

    Plan shape: one Arrow assign pass (the hash-proven
    `ivf_cells_pandas` rank-1 path), one |cells|-row count aggregate
    (map-side partials), and a 1-row broadcast corpus-stats aggregate
    joined back (the bm25 corpus_stats shape, ranking.py) — zero
    single-partition window stages at ANY cell count, so the
    diagnostic itself can't become the skewed task it reports on."""
    # include_vec=False: only the rank-1 cell id crosses Arrow back to
    # the JVM (mapInPandas output can't be column-pruned by Catalyst —
    # the default shape would ship all N×dim floats for a 16-row
    # diagnostic)
    assigned = ivf_cells_pandas(
        corpus, id_col, vec_col, dim, n_cells, 1, include_vec=False
    )
    per = (
        assigned.select(F.element_at("cells", 1).cast("int").alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").cast("bigint").alias("n_vecs"))
    )
    # totals over |cells| rows collapse to ONE row — broadcast and join
    # instead of a partition-less window (which would drag every cell
    # row onto a single task; harmless at 16 cells, a straggler at the
    # N/64 adaptive cell counts a 100 TB corpus produces)
    totals = per.agg(
        F.sum("n_vecs").alias("__tot"), F.avg("n_vecs").alias("__avg")
    )
    return per.crossJoin(F.broadcast(totals)).select(
        "cell",
        "n_vecs",
        F.round(F.col("n_vecs") / F.col("__tot"), 6).alias("share"),
        (F.col("n_vecs") > 2 * F.col("__avg")).alias("crowded"),
    )


def ivf_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    centroids=None,
) -> DataFrame:
    """IVF approximate all-pairs top-k — the inverted-file scale path
    beside the hyperplane-LSH variant. ``centroids`` switches the
    coarse quantizer to a learned k-means codebook
    (``operators.clustering.kmeans_fit``) — the production IVF shape;
    recall improvement over the pseudo-random quantizer is pinned in
    tests/test_clustering.py.

    Storage side: every vector lives in its single nearest coarse cell.
    Query side: each vector probes its ``n_probe`` nearest cells.
    Physical shape: one Arrow pass assigns cells (N×cells matmul), one
    shuffle on the cell id groups each cell's stored+probing vectors
    into a single applyInPandas group scored with ONE BLAS matmul and
    reduced to a per-cell top-k — Arrow transfer is per-vector, never
    per-candidate-pair (the expression form paid an interpreted 64-dim
    fold per pair: 5× slower at sf0.1). At 100 TB, n_cells scales ~√N
    so both the shuffle and each group stay bounded.
    """
    from batch_process_dpla_index_spark.operators.dedup import _with_cached_deps

    # persist: stored + probing both read the Arrow assignment frame —
    # unpersisted, the full-corpus N×cells matmul pass would execute
    # once per union branch (caller releases via unpersist_deps)
    assigned = ivf_cells_pandas(
        corpus, id_col, vec_col, dim, n_cells, n_probe, centroids
    ).persist()
    stored = assigned.select(
        F.element_at("cells", 1).alias("cell"),
        F.lit(0).alias("role"),
        F.col("id"),
        F.col("vec"),
    )
    probing = assigned.select(
        F.explode("cells").alias("cell"), F.lit(1).alias("role"), F.col("id"), F.col("vec")
    )
    return _with_cached_deps(_ivf_score_and_rank(stored, probing, k), [assigned])


def _ivf_score_and_rank(stored: DataFrame, probing: DataFrame, k: int) -> DataFrame:
    """Shared IVF scoring tail: union the (cell, role, id, vec) sides,
    one applyInPandas BLAS matmul per cell, global per-query top-k.
    ``stored`` rows carry role=0, ``probing`` rows role=1; a stored row
    never scores against itself (neighbor_id == query_id is masked)."""
    import numpy as np
    import pandas as pd

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        st = pdf[pdf["role"] == 0]
        pr = pdf[pdf["role"] == 1]
        if not len(st) or not len(pr):
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "neighbor_id": pd.Series(dtype="int64"),
                 "raw_score": pd.Series(dtype="float64")}
            )
        c_ids = st["id"].to_numpy(dtype="int64")
        q_ids = pr["id"].to_numpy(dtype="int64")
        c_mat = np.array(list(st["vec"]), dtype="float64")
        q_mat = np.array(list(pr["vec"]), dtype="float64")
        c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
        q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
        denom = np.outer(q_norm, c_norm)
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(denom == 0, np.nan, (q_mat @ c_mat.T) / denom)
        out_q, out_n, out_s = [], [], []
        for i, qid in enumerate(q_ids):
            col = scores[i]
            mask = c_ids != qid
            ids_i, col = c_ids[mask], col[mask]
            if not ids_i.size:
                continue
            order = np.lexsort((ids_i, -col))[:k]
            out_q.extend([qid] * len(order))
            out_n.extend(ids_i[order])
            out_s.extend(col[order])
        return pd.DataFrame(
            {"query_id": pd.Series(out_q, dtype="int64"),
             "neighbor_id": pd.Series(out_n, dtype="int64"),
             "raw_score": pd.Series(out_s, dtype="float64")}
        )

    cand = (
        stored.unionByName(probing)
        .groupBy("cell")
        .applyInPandas(score_cell, "query_id bigint, neighbor_id bigint, raw_score double")
    )
    scored = cand.withColumn(
        "score", F.when(F.isnan("raw_score"), F.lit(None)).otherwise(F.col("raw_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivf_query_topk(
    stored: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    centroids=None,
) -> DataFrame:
    """Query-vs-corpus IVF top-k against PRE-ASSIGNED corpus cells.

    ``stored`` is (cell int, id, vec) — e.g. read back from the
    persisted ANN index (``products.ann_index``) so the corpus is never
    re-assigned per query batch. Only the query side pays the
    centroid matmul (bands of ~|Q| rows); the join work is the same
    one cell-grouped applyInPandas as :func:`ivf_topk`. With
    ``queries == corpus`` and the same quantizer this reproduces
    ``ivf_topk`` exactly (pinned in tests).
    """
    q_assigned = ivf_cells_pandas(
        queries, id_col, vec_col, dim, n_cells, n_probe, centroids
    )
    probing = q_assigned.select(
        F.explode("cells").alias("cell"),
        F.lit(1).alias("role"),
        F.col("id"),
        F.col("vec"),
    )
    stored_side = stored.select(
        F.col("cell").cast("int").alias("cell"),
        F.lit(0).alias("role"),
        F.col("id"),
        F.col("vec"),
    )
    return _ivf_score_and_rank(stored_side, probing, k)


def _imi_probe_cells(
    df: DataFrame,
    coarse,
    fine: dict[int, list[list[float]]],
    k_f: int,
    n_probe_coarse: int,
    n_probe_fine: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(cell, role=1, id, vec): each query's p_c·p_f probed GLOBAL
    two-level cells — rank the coarse centroids (d2 asc, cell asc:
    numpy stable argsort, the SQL (d2, ccell) row_number twin), keep
    p_c, then rank the fine centroids within each probed coarse cell
    and keep p_f. One Arrow pass; per-row work (k_c + p_c·k_f)·dim."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from batch_process_dpla_index_spark.operators.clustering import (
        _two_level_model_arrays,
    )

    # shared with kmeans_assign_two_level: same trained-cell
    # restriction and the same stride-collision guard
    model = _two_level_model_arrays(coarse, fine, k_f)
    p_c = min(n_probe_coarse, len(model[0]))
    id_name, vec_name = id_col, vec_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_name]), dtype="float64")
            ids = pdf[id_name].to_numpy(dtype="int64")
            vals = pdf[vec_name].to_numpy()
            # exploded (cell, id, vec) rows assembled from the shared
            # probe kernel's numpy blocks (l2: trained-model ranking,
            # ties to the lower cell — the SQL (d2, ccell) twin)
            id_parts, vec_parts, cell_parts = [], [], []
            for _s, rows, gids in _two_level_probe_blocks(
                mat, model, k_f, p_c, n_probe_fine, "l2"
            ):
                rep = np.repeat(rows, gids.shape[1])
                id_parts.append(ids[rep])
                vec_parts.append(vals[rep])
                cell_parts.append(gids.reshape(-1).astype("int32"))
            if not id_parts:
                continue
            yield pd.DataFrame(
                {
                    "cell": pd.Series(
                        np.concatenate(cell_parts), dtype="int32"
                    ),
                    "id": pd.Series(np.concatenate(id_parts), dtype="int64"),
                    "vec": np.concatenate(vec_parts),
                }
            )

    vec_ddl = df.schema[vec_col].dataType.simpleString()
    return (
        df.select(F.col(id_col), F.col(vec_col))
        .mapInPandas(run, f"cell int, id bigint, vec {vec_ddl}")
        .select("cell", F.lit(1).alias("role"), "id", "vec")
    )


def imi_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    coarse_k: int = 4,
    n_iter: int = 2,
    coarse_iter: int = 2,
    n_probe_coarse: int = 2,
    n_probe_fine: int = 2,
    update_grid: int = 10**6,
) -> DataFrame:
    """Inverted-multi-index (IMI) approximate all-pairs top-k: ANN
    serving THROUGH the two-level coarse quantizer — the serve-side
    completion of `clustering.kmeans_fit_two_level` (which fixed the
    training assign pass) for k beyond ~10⁵ cells, where even RANKING
    a flat centroid list per query is O(k·dim). Here a query ranks
    k_c coarse centroids, keeps ``n_probe_coarse``, ranks only THOSE
    cells' fine codebooks and keeps ``n_probe_fine`` each — per-query
    probe cost (k_c + p_c·k_f)·dim ≈ O(√k·dim), probing p_c·p_f global
    cells.

    Storage side: every corpus vector lives in its two-level global
    cell (`kmeans_assign_two_level`, fixed-stride ids). Scoring tail
    is the hash-proven `_ivf_score_and_rank` (one applyInPandas BLAS
    matmul per cell, per-cell top-k, global (score DESC, id ASC)
    rank). The whole chain — integer-grid two-level fit, probe
    rankings, strict-fold cosine — replays as unrolled DuckDB CTEs
    (`_imi_topk_oracle` composes `_two_level_cte_chain` with the
    `_ivf_oracle` serving conventions).

    At 100 TB: two Arrow passes over the corpus (store-assign +
    probe), one shuffle on the global cell id; cells stay bounded by
    sizing k for constant cell population exactly as the flat IVF
    path does."""
    from batch_process_dpla_index_spark.operators.clustering import (
        kmeans_assign_two_level,
        kmeans_fit_two_level,
    )

    coarse, fine, k_f = kmeans_fit_two_level(
        corpus, id_col, vec_col, k=n_cells, coarse_k=coarse_k,
        n_iter=n_iter, coarse_iter=coarse_iter, init="hash",
        update_grid=update_grid, tol=0.0,
    )
    stored = kmeans_assign_two_level(
        corpus, coarse, fine, k_f, id_col, vec_col, keep_vec=True
    ).select("cell", F.lit(0).alias("role"), "id", "vec")
    probing = _imi_probe_cells(
        corpus, coarse, fine, k_f, n_probe_coarse, n_probe_fine,
        id_col, vec_col,
    )
    return _ivf_score_and_rank(stored, probing, k)


def _hyperplane_matrix(dim: int, n_planes: int, n_tables: int):
    """numpy twin of :func:`_hyperplane` — identical float values.
    Shape: (n_tables, dim, n_planes)."""
    import numpy as np

    return np.array(
        [
            [
                [
                    _h60_unit(f"hp:{t}:{j}:{d}")
                    for j in range(n_planes)
                ]
                for d in range(dim)
            ]
            for t in range(n_tables)
        ],
        dtype="float64",
    )


def lsh_buckets_pandas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """(id, vec, table, bucket) via one Arrow pass: a single
    N×dim @ dim×(tables·planes) matmul replaces tables×planes
    interpreted dot folds per row (vectorized twin of
    :func:`lsh_buckets`, same sign convention: bit j set when
    v·p_j ≥ 0)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    planes = _hyperplane_matrix(dim, n_planes, n_tables)
    weights = (1 << np.arange(n_planes)).astype("int64")
    id_name, vec_name = id_col, vec_col

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_name]), dtype="float64")
            ids = pdf[id_name].to_numpy(dtype="int64")
            out_id, out_vec, out_t, out_b = [], [], [], []
            for t in range(n_tables):
                proj = mat @ planes[t]  # N × planes
                buckets = ((proj >= 0) @ weights).astype("int64")
                out_id.extend(ids)
                out_vec.extend(pdf[vec_name])
                out_t.extend([t] * len(ids))
                out_b.extend(buckets)
            yield pd.DataFrame(
                {
                    "id": pd.Series(out_id, dtype="int64"),
                    "vec": out_vec,
                    "table": pd.Series(out_t, dtype="int32"),
                    "bucket": pd.Series(out_b, dtype="int64"),
                }
            )

    vec_ddl = df.schema[vec_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        assign, f"id bigint, vec {vec_ddl}, table int, bucket bigint"
    )


def _scored_bucket_pairs(
    buckets: DataFrame,
    ordered: bool,
    k: int | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Per-(table, bucket) Arrow scoring: one matmul per group, emit
    (id_a, id_b, raw_score) in-bucket pairs (a<b when ``ordered``,
    else both directions), deduped across tables by the caller. Arrow
    transfer is per-vector, never per-pair.

    Lossless group-local pruning: ``k`` keeps only each query's k best
    within a bucket (a candidate's global rank over the union of
    buckets is ≥ its rank within any single bucket, so dropped rows
    can never enter the global top-k); ``threshold`` drops
    sub-threshold pairs early (NaN/zero-norm scores fail the
    comparison, matching the NULL-drop semantics of the expression
    form).

    Physical grouping is (table, bucket mod n_shards) — per-Arrow-group
    overhead amortizes over ~|buckets|/n_shards buckets (1024 singleton
    groups cost ~7 s of pure per-group overhead at sf0.1), while each
    group stays bounded at scale; the exact per-bucket split happens in
    pandas inside the group."""
    import numpy as np
    import pandas as pd

    n_shards = 8

    def score_bucket(ids: "np.ndarray", mat: "np.ndarray", out):
        norm = np.sqrt((mat * mat).sum(axis=1))
        denom = np.outer(norm, norm)
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(denom == 0, np.nan, (mat @ mat.T) / denom)
        if k is not None:
            for i, qid in enumerate(ids):
                col = scores[i]
                mask = ids != qid
                ids_i, col_i = ids[mask], col[mask]
                order = np.lexsort((ids_i, -col_i))[:k]
                out[0].extend([qid] * len(order))
                out[1].extend(ids_i[order])
                out[2].extend(col_i[order])
            return
        ii, jj = np.meshgrid(np.arange(len(ids)), np.arange(len(ids)), indexing="ij")
        keep = ids[ii] < ids[jj] if ordered else ids[ii] != ids[jj]
        if threshold is not None:
            with np.errstate(invalid="ignore"):
                keep = keep & (scores >= threshold)  # NaN fails → dropped
        out[0].extend(ids[ii[keep]])
        out[1].extend(ids[jj[keep]])
        out[2].extend(scores[keep])

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        out = ([], [], [])
        for _, grp in pdf.groupby("bucket", sort=False):
            if len(grp) >= 2:
                score_bucket(
                    grp["id"].to_numpy(dtype="int64"),
                    np.array(list(grp["vec"]), dtype="float64"),
                    out,
                )
        return pd.DataFrame(
            {"id_a": pd.Series(out[0], dtype="int64"),
             "id_b": pd.Series(out[1], dtype="int64"),
             "raw_score": pd.Series(out[2], dtype="float64")}
        )

    sharded = buckets.withColumn("shard", F.pmod("bucket", F.lit(n_shards)))
    return sharded.groupBy("table", "shard").applyInPandas(
        score_shard, "id_a bigint, id_b bigint, raw_score double"
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the
    top-k most-similar corpus vectors whose LABEL DIFFERS — the pairs
    a contrastive/embedding trainer wants as negatives precisely
    because the model currently scores them like positives.

    Label semantics are null-safe: a NULL corpus label counts as
    differing from any non-NULL query label (IS DISTINCT FROM), so
    unlabeled vectors can still serve as negatives.

    Plan: the query side is a bounded mining batch by contract, so it
    broadcasts into one scan of the corpus; per-query top-k is a
    |Q|-partition window over scored candidates. At mining-fleet
    scale the corpus side routes through the ANN tiers first (IVF
    cells / LSH buckets shrink the candidate set per query) and this
    operator runs on the survivors — the expression tier here IS the
    exact re-scorer of that pipeline.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("neighbor_label"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("neighbor_id"))
        & ~F.col("neighbor_label").eqNullSafe(F.col("q_label")),
    ).withColumn("score", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    out_dim: int = 16,
    salt: str = "rp",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: each output component
    is the dot product with a deterministic pseudo-random plane (the
    h60-unit family — same machinery as the LSH hyperplanes, so the
    projection is bit-reproducible across engines, runs and
    partitionings). The standard dimensionality-reduction step before
    ANN indexing or clustering when the raw embedding is wider than
    the recall target needs.

    Pure per-row expression — planes are driver-side float literals
    (out_dim × dim of them), no broadcast frame, no shuffle, and the
    projection stays inside the scan stage at any corpus size.

    Returns (id_col, proj array<double>).
    """
    from batch_process_dpla_index_spark.functions.vectors import dot

    def plane(j: int):
        return F.array(
            *[F.lit(_h60_unit(f"{salt}:{j}:{d}")) for d in range(dim)]
        )

    proj = F.array(*[dot(F.col(vec_col), plane(j)) for j in range(out_dim)])
    return df.where(F.col(vec_col).isNotNull()).select(
        id_col, proj.alias("proj")
    )


def ann_recall_report(
    truth: DataFrame,
    approx: DataFrame,
    k: int,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Recall@k of an approximate ANN result against exact truth —
    the tuning diagnostic every ANN deployment reads before trading
    probes for latency (FAISS's convention: recall = |approx ∩ truth|
    / k per query).

    Both inputs are (query_col, neighbor_col, ...) top-k frames —
    e.g. :func:`cosine_topk` as truth and :func:`ivf_topk` /
    :func:`lsh_ann_topk` / `quantization.pq_topk` as the approximate
    side. Returns one row per truth query: (query_id, n_hits,
    recall_at_k), n_hits an exact BIGINT and recall one divide at
    6dp — nothing float-fragile to pin.

    Plan shape at any scale: recall is always evaluated over a
    BOUNDED query sample (the truth side's brute-force cost enforces
    that), so this is one broadcast equi-join between two ~|Q|·k-row
    frames plus one group aggregate — the two ANN computations feeding
    it dominate at every SF.
    """
    t = truth.select(
        F.col(query_col).alias("query_id"),
        F.col(neighbor_col).alias("neighbor_id"),
    )
    a = (
        approx.select(
            F.col(query_col).alias("query_id"),
            F.col(neighbor_col).alias("neighbor_id"),
        )
        # a buggy ANN that emits a (query, neighbor) pair twice would
        # otherwise double-count the hit and report recall_at_k > 1
        # silently; the frame is already the small/broadcast side, so
        # the dedup is free
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("__hit", F.lit(1))
    )
    return (
        t.join(F.broadcast(a), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.lit(float(k)),
                6,
            ).alias("recall_at_k"),
        )
    )


def incremental_semantic_dedup(
    new: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_cells: int = 16,
    n_probe: int = 2,
    threshold: float = 0.3,
    two_level_threshold: int | None = None,
) -> DataFrame:
    """Ingest-time EMBEDDING dedup: check a new batch of vectors
    against the stored corpus through the pinned IVF coarse cells —
    the embedding-space twin of `dedup.incremental_dedup` (which does
    the same for text through LSH buckets). The corpus is never
    self-joined and never rescanned beyond one assign pass: stored
    vectors live in their rank-1 cell, each NEW vector probes its
    ``n_probe`` nearest cells (probing wider than storage recovers
    boundary neighbors, the standard IVF recall lever), and cosine is
    evaluated only inside probed-cell ∩ stored-cell pairs.

    Returns one row per new vector: (id, cell, n_matches, is_new,
    best_match_id, best_score) — ``cell`` the new vector's own storage
    cell, ``best_match_id`` the highest-cosine corpus match at
    ``threshold`` (score DESC, id ASC tie-break — the `_ivf_oracle`
    ranking convention), NULL when ``is_new``.

    Cross-engine exactness: cell assignment rides `ivf_cells_pandas`
    (the Arrow/BLAS pass `ivf_topk` is hash-proven on, same
    `_cell_order` d DESC / cell DESC tie-break as the oracle replay),
    and the THRESHOLD compare — the one place a ulp could flip a
    row — uses the strict-fold cosine expression that is bit-identical
    to the oracle's list_reduce.

    Plan shape at 100 TB: one Arrow assign pass per side (N×cells
    BLAS matmul — at very large n_cells route through the two-level
    coarse quantizer, `clustering.kmeans_fit_two_level` /
    `kmeans_assign_two_level`: O(√cells) per row), one shuffle on cell, per-task
    work bounded by |stored cell| × |batch∩cell|. Size n_cells for
    CONSTANT stored-cell population (≈ corpus/64): pair work is then
    DELTA-proportional; a fixed cell count would leave it
    |batch|·|corpus|/n_cells — quadratic under co-growth (measured
    25× at the 10× probe before the adaptive sizing).

    That two-level routing is automatic: ``n_cells >=
    two_level_threshold`` groups the SAME pseudo-random centroid grid
    into a two-level model (`_pseudo_random_two_level` — global cell
    ids unchanged, no training pass) and both sides assign through it
    at O(√cells·dim) per row. With the constant-population sizing the
    switch engages around a 65k·threshold-row corpus; every
    verification SF resolves to n_cells = 32 ≪ threshold, so the
    oracle's flat-argmin geometry replays unchanged. Above it, cell
    boundaries are the two-level approximation's — consistent across
    stored/probe sides by construction, the usual IVF recall-vs-probe
    tradeoff otherwise.
    """
    from batch_process_dpla_index_spark.operators.dedup import _with_cached_deps

    if two_level_threshold is None:
        from batch_process_dpla_index_spark.operators.clustering import (
            TWO_LEVEL_ROUTING_THRESHOLD as two_level_threshold,
        )
    if n_cells >= two_level_threshold:
        coarse, fine, k_f = _pseudo_random_two_level(dim, n_cells)
        # metric="dot" on BOTH sides: the flat quantizer ranks cells by
        # dot product (scale-invariant, `_cell_order`), so the
        # two-level inference must too — an L2 ranking would break the
        # scale-invariance the near-dup matching relies on
        stored = two_level_cells_pandas(
            corpus, coarse, fine, k_f, 1, 1, id_col, vec_col, metric="dot"
        ).select(
            F.element_at("cells", 1).alias("cell"),
            F.col("id").alias("c_id"),
            F.col("vec").alias("c_vec"),
        )
        p_c, p_f = _imi_probe_split(n_probe, n_cells, k_f, len(fine), None, None)
        assigned = two_level_cells_pandas(
            new, coarse, fine, k_f, p_c, p_f, id_col, vec_col, metric="dot"
        ).persist()
        return _with_cached_deps(
            match_assigned_against_stored(assigned, stored, threshold),
            [assigned],
        )

    stored = ivf_cells_pandas(
        corpus, id_col, vec_col, dim, n_cells, n_probe=1
    ).select(
        F.element_at("cells", 1).alias("cell"),
        F.col("id").alias("c_id"),
        F.col("vec").alias("c_vec"),
    )
    # persisted: the probe explode and the rank-1 base both read it —
    # unpersisted, the batch assign matmul would run twice
    assigned = ivf_cells_pandas(
        new, id_col, vec_col, dim, n_cells, n_probe=n_probe
    ).persist()
    return _with_cached_deps(
        match_assigned_against_stored(assigned, stored, threshold), [assigned]
    )


def match_assigned_against_stored(
    assigned: DataFrame, stored: DataFrame, threshold: float
) -> DataFrame:
    """Score an assigned batch against stored cell rows — the shared
    core of :func:`incremental_semantic_dedup` (in-line, corpus given
    as a DataFrame) and ``products.embedding_index``'s indexed read
    path (stored cells come from parquet, no corpus recompute).

    ``assigned`` is (id, vec, cells array<int>) — the batch through
    :func:`ivf_cells_pandas` with its probe list, ideally persisted by
    the caller (two consumers below). ``stored`` is (cell, c_id,
    c_vec) — each corpus vector in its rank-1 storage cell. Cosine is
    evaluated only inside probed-cell ∩ stored-cell pairs; ranking is
    score DESC, id ASC (the `_ivf_oracle` convention). Returns one row
    per batch vector: (id, cell, n_matches, is_new, best_match_id,
    best_score)."""
    from batch_process_dpla_index_spark.functions.vectors import cosine

    probing = assigned.select(
        F.col("id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.explode("cells").alias("cell"),
    )
    scored = (
        probing.join(stored, "cell")
        .where(F.col("q_id") != F.col("c_id"))
        .withColumn("__cos", cosine(F.col("q_vec"), F.col("c_vec")))
        .where(F.col("__cos") >= F.lit(float(threshold)))
    )
    # winner pick as ONE aggregate instead of row_number-over-window
    # + groupBy (r18, guide §2.4/§2.3): max_by over struct(__cos,
    # -c_id) is the lexicographic (score DESC, id ASC) winner — the
    # exact row the old window's rn==1 selected (Spark orders NaN
    # greatest on both paths, the ordering key is unique per row, and
    # __cos is never NULL past the threshold filter) — and the
    # winner's score IS max(__cos). Plans as SortAggregate (struct
    # buffer), but the map-side partial shrinks the exchange and the
    # separate Window+groupBy pair collapses to one aggregate.
    matches = scored.groupBy("q_id").agg(
        F.count("*").cast("bigint").alias("n_matches"),
        F.max_by("c_id", F.struct(F.col("__cos"), (-F.col("c_id")))).alias(
            "best_match_id"
        ),
        F.round(F.max("__cos"), 6).alias("best_score"),
    )
    base = assigned.select(
        F.col("id"), F.element_at("cells", 1).alias("cell")
    )
    return (
        base.join(matches, base["id"] == matches["q_id"], "left")
        .select(
            "id",
            "cell",
            F.coalesce(F.col("n_matches"), F.lit(0)).cast("bigint").alias(
                "n_matches"
            ),
            (F.coalesce(F.col("n_matches"), F.lit(0)) == 0).alias("is_new"),
            "best_match_id",
            "best_score",
        )
    )
