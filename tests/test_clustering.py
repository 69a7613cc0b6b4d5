"""K-means (Lloyd's) operator: exact recovery on separable blobs,
monotone inertia, deterministic seeding, learned-IVF wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_process_dpla_index_spark.operators.clustering import (
    _assign_cells,
    kmeans_assign,
    kmeans_fit,
)
from batch_process_dpla_index_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _blobs(spark, n_per=40, dim=8):
    """3 well-separated blobs around (0..), (10..), (-10..) with a
    deterministic per-row jitter."""
    rows = []
    centers = [[0.0] * dim, [10.0] * dim, [-10.0] * dim]
    for b, c in enumerate(centers):
        for i in range(n_per):
            jitter = [((i * 7 + d * 13 + b * 31) % 10) / 20.0 for d in range(dim)]
            rows.append((b * 1000 + i, [c[d] + jitter[d] for d in range(dim)]))
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"), centers


def test_kmeans_recovers_separable_blobs(spark):
    df, centers = _blobs(spark)
    cents = kmeans_fit(df, "vec_id", "embedding", k=3, n_iter=15)
    got = kmeans_assign(df, cents, "vec_id", "embedding")
    # every blob lands in exactly one cell, cells don't mix blobs
    rows = got.withColumn("blob", (F.col("id") / 1000).cast("int")).collect()
    blob_to_cell = {}
    for r in rows:
        blob_to_cell.setdefault(r["blob"], set()).add(r["cell"])
    assert all(len(cells) == 1 for cells in blob_to_cell.values())
    assert len({c for s in blob_to_cell.values() for c in s}) == 3
    # learned centroids sit near the true centers (jitter mean ≈ 0.225)
    for c in centers:
        best = min(sum((a - b) ** 2 for a, b in zip(c, cand)) for cand in cents)
        assert best < 1.0


def test_kmeans_inertia_decreases(spark):
    df, _ = _blobs(spark)

    def inertia(n_iter):
        cents = kmeans_fit(df, "vec_id", "embedding", k=3, n_iter=n_iter)
        return (
            kmeans_assign(df, cents, "vec_id", "embedding")
            .agg(F.sum("dist2").alias("j")).collect()[0]["j"]
        )

    j1, j5 = inertia(1), inertia(5)
    assert j5 <= j1 + 1e-9


def test_kmeans_deterministic(spark):
    df, _ = _blobs(spark)
    a = kmeans_fit(df, "vec_id", "embedding", k=3, n_iter=5)
    b = kmeans_fit(df, "vec_id", "embedding", k=3, n_iter=5)
    assert a == b


def test_kmeans_fit_driver_tier_matches_distributed(spark, monkeypatch):
    """The r17 full-fit driver tier must produce BIT-IDENTICAL
    centroids to the distributed Lloyd loop on the grid path (exact
    integer sums commute; assign/seeding expressions are shared), for
    both the flat and the two-level fit — otherwise clustering results
    would depend on corpus size crossing the seeding bound."""
    import batch_process_dpla_index_spark.operators.clustering as cl

    emb = load_table(spark, SF_DIR, "embeddings")

    def fit_both():
        flat = cl.kmeans_fit(
            emb, "vec_id", "embedding", k=8, n_iter=3,
            update_grid=10**6, tol=0.0,
        )
        two = cl.kmeans_fit_two_level(
            emb, "vec_id", "embedding", k=9, n_iter=2, coarse_iter=2,
            init="hash", update_grid=10**6, tol=0.0,
        )
        return flat, two

    a_flat, a_two = fit_both()
    monkeypatch.setattr(cl, "_SEED_DRIVER_MAX_ROWS", 0)
    b_flat, b_two = fit_both()
    assert a_flat == b_flat
    assert a_two[0] == b_two[0]  # coarse centroids
    assert a_two[1] == b_two[1]  # fine codebooks per cell
    assert a_two[2] == b_two[2]  # stride


def test_maximin_driver_tier_matches_distributed(spark, monkeypatch):
    """The r17 driver-side seeding tier must pick BIT-IDENTICAL seeds
    to the distributed per-pass scan — same expanded-form d2, same
    (dist2 desc, id asc) total order — or kmeans results would depend
    on corpus size crossing ``_SEED_DRIVER_MAX_ROWS``."""
    import batch_process_dpla_index_spark.operators.clustering as cl

    emb = load_table(spark, SF_DIR, "embeddings")
    a = cl._maximin_seeds(emb, "vec_id", "embedding", k=5)
    monkeypatch.setattr(cl, "_SEED_DRIVER_MAX_ROWS", 0)
    b = cl._maximin_seeds(emb, "vec_id", "embedding", k=5)
    assert a == b


def test_learned_ivf_on_fixture_embeddings(spark):
    """End-to-end on the real fixture table: train k=8 centroids, every
    vector gets a cell, cells are populated (no degenerate solution),
    assignment agrees with the operator's own argmin."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, n_iter=5)
    assert len(cents) == 8 and len(cents[0]) == 64
    assigned = kmeans_assign(emb, cents, "vec_id", "embedding")
    n = emb.count()
    assert assigned.count() == n
    n_cells = assigned.select("cell").distinct().count()
    assert n_cells >= 4  # near-random fixture vectors spread out
    again = _assign_cells(emb, "vec_id", "embedding", cents).select("id", "cell")
    assert assigned.select("id", "cell").exceptAll(again).count() == 0


def test_learned_centroids_improve_ivf_recall(spark):
    """IVF with a k-means codebook must match or beat the pseudo-random
    quantizer's top-1 recall at the same (n_cells, n_probe) budget —
    the reason the training path exists."""
    from batch_process_dpla_index_spark.operators.similarity import cosine_topk, ivf_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, emb, "vec_id", "embedding", k=1).collect()
    }
    cents = kmeans_fit(emb, "vec_id", "embedding", k=16, n_iter=5)

    def recall(centroids):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, "vec_id", "embedding", dim=64, k=1,
                n_cells=16, n_probe=4, centroids=centroids,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_random, r_learned = recall(None), recall(cents)
    assert r_learned >= r_random - 0.02  # never materially worse
    assert r_learned >= 0.3


# ---- product quantization ----


def test_pq_codes_shape_range_and_determinism(spark):
    from batch_process_dpla_index_spark.operators.quantization import (
        pq_encode,
        pq_train,
    )
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    books = pq_train(emb, dim=64, m=8, k=16, n_iter=3)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    codes = {r.id: r.codes for r in pq_encode(emb, books).collect()}
    assert len(codes) == emb.count()
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in codes.values())
    # pure function of (corpus, params): second run identical
    books2 = pq_train(emb, dim=64, m=8, k=16, n_iter=3)
    assert books == books2
    codes2 = {r.id: r.codes for r in pq_encode(emb, books2).collect()}
    assert codes == codes2


def test_pq_train_driver_tier_matches_distributed(spark, monkeypatch):
    """The r17 pq_train driver tier must agree with the distributed
    loop: identical seeding/assign total orders; the per-(subspace,
    code) mean sums accumulate in a different order, so centroids are
    compared at 1e-9 (far above the final-ulp envelope, far below any
    code-assignment boundary on this fixture) and the resulting CODES
    must match exactly."""
    import batch_process_dpla_index_spark.operators.clustering as cl
    from batch_process_dpla_index_spark.operators.quantization import (
        pq_encode,
        pq_train,
    )
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    a = pq_train(emb, dim=64, m=8, k=16, n_iter=3)
    monkeypatch.setattr(cl, "_SEED_DRIVER_MAX_ROWS", 0)
    b = pq_train(emb, dim=64, m=8, k=16, n_iter=3)
    for j in range(8):
        for c in range(16):
            for x, y in zip(a[j][c], b[j][c]):
                assert abs(x - y) < 1e-9
    ca = {r.id: r.codes for r in pq_encode(emb, a).collect()}
    cb = {r.id: r.codes for r in pq_encode(emb, b).collect()}
    assert ca == cb


def test_pq_topk_recall_beats_chance(spark):
    """ADC over PQ codes must recover a meaningful share of the exact
    L2 top-5 (measured 0.22 mean on the synthetic fixture — ~9x the
    0.025 chance level for 5 of ~200; pinned well below measurement)."""
    import numpy as np

    from batch_process_dpla_index_spark.operators.quantization import (
        pq_topk,
        pq_train,
    )
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows])
    books = pq_train(emb, dim=64, m=8, k=16, n_iter=4)
    got = pq_topk(emb, books, k=5, n_queries=25).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(by_q) == 25 and all(len(v) == 5 for v in by_q.values())
    recalls = []
    for qid, approx in by_q.items():
        qi = int(np.where(ids == qid)[0][0])
        d = ((X - X[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        exact = set(ids[np.argsort(d)[:5]].tolist())
        recalls.append(len(exact & approx) / 5)
    assert sum(recalls) / len(recalls) >= 0.12


def test_pq_train_rejects_indivisible_dim(spark):
    import pytest as _pytest

    from batch_process_dpla_index_spark.operators.quantization import pq_train
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    with _pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, dim=64, m=7)


def test_ivfpq_persisted_index_roundtrip(spark, tmp_path):
    """IVF-PQ layout of the persisted ANN index: codes + codebooks
    persist beside the float cells, the manifest pins (pq_m, pq_k),
    and code-only serving returns a full deterministic top-k that
    substantially overlaps the float-path results on the same probes
    (measured 0.344 on the fixture; pinned below with margin)."""
    from batch_process_dpla_index_spark.products import ann_index
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "ivfpq")
    man = ann_index.build_ann_index(
        emb, "vec_id", "embedding", idx, pq_m=8, learned=False
    )
    assert man["pq_m"] == "8" and man["pq_k"] == "16"
    q = emb.orderBy("vec_id").limit(25)
    pq1 = ann_index.pq_query_indexed(spark, q, "vec_id", "embedding", idx, k=5, n_probe=4)
    rows = pq1.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(by_q) == 25 and all(len(v) == 5 for v in by_q.values())
    # deterministic serving
    rows2 = ann_index.pq_query_indexed(
        spark, q, "vec_id", "embedding", idx, k=5, n_probe=4
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    # meaningful agreement with the float path over the same probes
    fl = ann_index.ann_query_indexed(spark, q, "vec_id", "embedding", idx, k=5, n_probe=4)
    fl_q: dict = {}
    for r in fl.collect():
        fl_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    overlap = [len(by_q[qd] & fl_q.get(qd, set())) / 5 for qd in by_q]
    assert sum(overlap) / len(overlap) >= 0.2


def test_ivf_pq_topk_subset_of_full_adc_and_cell_routing(spark):
    """The composite's contract: every emitted pair's neighbor is
    stored in a cell the query probes; dist2 for a shared pair equals
    the exhaustive ADC scan's value bit-for-bit (same tables, same
    tree-sum — routing prunes candidates, never changes distances);
    and reruns are identical."""
    from batch_process_dpla_index_spark.operators.quantization import (
        ivf_pq_topk,
        pq_pinned_codebooks,
        pq_topk,
    )
    from batch_process_dpla_index_spark.operators.similarity import (
        ivf_cells_pandas,
    )
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    books = pq_pinned_codebooks()
    got = ivf_pq_topk(emb, books, k=5, n_queries=25).collect()
    assert got, "composite returned no rows"
    # k rows per query with contiguous ranks
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))

    # cell routing: neighbor's storage cell ∈ query's probed cells
    cells = {
        r.id: r.cells
        for r in ivf_cells_pandas(
            emb, "vec_id", "embedding", 64, 16, 4
        ).collect()
    }
    for r in got:
        assert cells[r.neighbor_id][0] in cells[r.query_id], (
            r.query_id,
            r.neighbor_id,
        )

    # shared pairs score identically to the exhaustive ADC scan
    full = {
        (r.query_id, r.neighbor_id): r.dist2
        for r in pq_topk(emb, books, k=200, n_queries=25).collect()
    }
    shared = [
        r for r in got if (r.query_id, r.neighbor_id) in full
    ]
    assert shared, "no overlap with the exhaustive scan"
    for r in shared:
        assert r.dist2 == full[(r.query_id, r.neighbor_id)]

    # deterministic rerun
    again = ivf_pq_topk(emb, books, k=5, n_queries=25).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_cluster_silhouette_bounds_cells_and_separation(spark):
    """Silhouette is in [-1, 1], the cell column equals kmeans_assign's
    bit-for-bit, and a synthetic corpus of two far-separated blobs
    scores near-perfect (+1) while every vector keeps a2 < b2."""
    from batch_process_dpla_index_spark.operators.clustering import (
        cluster_silhouette,
        kmeans_assign,
        kmeans_fit,
    )
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = kmeans_fit(
        emb, "vec_id", "embedding", k=8, n_iter=3, init="hash",
        update_grid=10**6, tol=0.0,
    )
    sil = cluster_silhouette(emb, cents).collect()
    assert len(sil) == emb.count()
    assert all(-1.0 <= r.silhouette <= 1.0 for r in sil)
    want_cells = {
        r.id: r.cell for r in kmeans_assign(emb, cents).collect()
    }
    assert all(want_cells[r.id] == r.cell for r in sil)

    # two blobs 100 apart in dim 0, jitter 0.01: simplified silhouette
    # must read as near-perfect separation
    rows = [
        (i, [float(100 * (i % 2)) + 0.01 * (i % 7), 0.0, 0.0, 0.0])
        for i in range(40)
    ]
    blobs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    two = kmeans_fit(
        blobs, "vec_id", "embedding", k=2, n_iter=3, init="hash",
        update_grid=10**6, tol=0.0,
    )
    bs = cluster_silhouette(blobs, two).collect()
    assert all(r.silhouette > 0.99 for r in bs)
    assert all(r.a2 < r.b2 for r in bs)


def test_ivf_pq_topk_learned_centroids_and_dim_guards(spark):
    """The learned-quantizer form (kmeans_fit coarse centroids — the
    production IVF-PQ) returns the full k-per-query shape, and both
    mis-configuration paths fail with the curated ValueError instead
    of a raw numpy matmul error."""
    import pytest as _pytest

    from batch_process_dpla_index_spark.operators.clustering import kmeans_fit
    from batch_process_dpla_index_spark.operators.quantization import (
        ivf_pq_topk,
        pq_pinned_codebooks,
    )
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    books = pq_pinned_codebooks()
    cents = kmeans_fit(
        emb, "vec_id", "embedding", k=16, n_iter=2, init="hash",
        update_grid=10**6, tol=0.0,
    )
    got = ivf_pq_topk(
        emb, books, k=5, n_queries=10, n_cells=16, n_probe=4, centroids=cents
    ).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(by_q) == 10 and all(len(v) == 5 for v in by_q.values())

    with _pytest.raises(ValueError, match="dim=32 != m\\*dsub"):
        ivf_pq_topk(emb, books, dim=32)
    with _pytest.raises(ValueError, match="centroids are 4-dim"):
        ivf_pq_topk(emb, books, centroids=[[0.0] * 4] * 16)


def test_cluster_silhouette_rejects_single_centroid(spark):
    import pytest as _pytest

    from batch_process_dpla_index_spark.operators.clustering import (
        cluster_silhouette,
    )
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    with _pytest.raises(ValueError, match="needs >= 2 centroids"):
        cluster_silhouette(emb, [[0.0] * 64])


def test_two_level_kmeans_structure_and_refinement(spark):
    """Two-level fit on the fixture embeddings: global cell ids follow
    the fixed stride (cell = coarse_cell*k_f + fine, fine in [0, k_f)),
    every row is assigned exactly once, and the fine level genuinely
    refines — mean d² under the two-level model is below the
    coarse-only model's (the reason to pay for the second level)."""
    from batch_process_dpla_index_spark.operators.clustering import (
        kmeans_assign_two_level,
        kmeans_fit_two_level,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    coarse, fine, k_f = kmeans_fit_two_level(
        emb, "vec_id", "embedding", k=16, coarse_k=4, n_iter=2,
        coarse_iter=2, init="hash", update_grid=10**6, tol=0.0,
    )
    assert len(coarse) == 4 and set(fine) <= set(range(4))
    assert k_f == 4  # ceil(k / k_c) — the fit-owned stride
    out = kmeans_assign_two_level(
        emb, coarse, fine, k_f, "vec_id", "embedding"
    ).persist()
    try:
        rows = out.collect()
        assert len(rows) == emb.count()
        for r in rows:
            f = r["cell"] - r["coarse_cell"] * k_f
            assert 0 <= f < len(fine[r["coarse_cell"]])
        two_level_mean = out.agg(F.avg("dist2")).collect()[0][0]
    finally:
        out.unpersist()
    coarse_mean = (
        kmeans_assign(emb, coarse, "vec_id", "embedding")
        .agg(F.avg("dist2"))
        .collect()[0][0]
    )
    assert two_level_mean < coarse_mean


def test_two_level_assign_routes_around_untrained_cell(spark):
    """A coarse cell that trained no fine codebook (empty at fit time,
    kept its seed centroid) must not be servable: vectors nearest to it
    route to their nearest TRAINED coarse cell instead of KeyError-ing
    the Arrow worker."""
    from batch_process_dpla_index_spark.operators.clustering import (
        kmeans_assign_two_level,
    )

    coarse = [[0.0, 0.0], [10.0, 10.0], [-10.0, -10.0]]
    fine = {  # cell 1 has no fine codebook
        0: [[0.0, 0.0], [1.0, 1.0]],
        2: [[-10.0, -10.0]],
    }
    df = spark.createDataFrame(
        [(1, [9.5, 9.5]), (2, [0.2, 0.2]), (3, [-9.0, -9.0])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    got = {
        r["id"]: (r["coarse_cell"], r["cell"])
        for r in kmeans_assign_two_level(df, coarse, fine, 2).collect()
    }
    # vec 1 is nearest the untrained cell 1 -> routed to trained cell 0
    # (d2 to [0,0] = 180.5 < d2 to [-10,-10] = 760.5), fine argmin [1,1]
    assert got[1] == (0, 1)
    assert got[2] == (0, 0)
    assert got[3] == (2, 2 * 2 + 0)  # stride k_f = 2

    # the stride is the FIT's, not derivable from the codebooks: with
    # every cell under-full, a max-width guess would shift global ids
    # off the documented convention (the review repro); and a stride
    # narrower than the widest codebook must be refused, not collide
    import pytest as _pytest

    got3 = {
        r["id"]: r["cell"]
        for r in kmeans_assign_two_level(df, coarse, fine, 3).collect()
    }
    assert got3[3] == 2 * 3 + 0  # stride 3: cell ids follow k_f, not max
    with _pytest.raises(ValueError, match="stride"):
        kmeans_assign_two_level(df, coarse, fine, 1).collect()


def test_imi_topk_full_probe_equals_exact(spark):
    """IMI with every coarse and fine cell probed IS the exact search:
    its (query, neighbor, score, rank) output must equal brute-force
    cosine_topk row-for-row on the fixture; and the registry's bounded
    2x2 probe must emit exactly top-k rows per query with legal ranks."""
    from batch_process_dpla_index_spark.operators.similarity import (
        cosine_topk,
        imi_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    full = imi_topk(
        emb, "vec_id", "embedding", k=5, n_cells=16, coarse_k=4,
        n_iter=2, coarse_iter=2, n_probe_coarse=4, n_probe_fine=4,
    )
    exact = cosine_topk(emb, emb, "vec_id", "embedding", k=5)
    got = sorted(map(tuple, full.collect()))
    want = sorted(map(tuple, exact.collect()))
    assert got == want and len(got) == emb.count() * 5

    bounded = imi_topk(
        emb, "vec_id", "embedding", k=5, n_cells=16, coarse_k=4,
        n_iter=2, coarse_iter=2, n_probe_coarse=2, n_probe_fine=2,
    ).collect()
    per_q = {}
    for r in bounded:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(rs) == list(range(1, len(rs) + 1)) and len(rs) <= 5
               for rs in per_q.values())
    # bounded probing is a subset of the exact candidate space
    want_set = {(r[0], r[1]) for r in want}
    hits = sum((r["query_id"], r["neighbor_id"]) in want_set for r in bounded)
    assert 0 < hits <= len(bounded)
