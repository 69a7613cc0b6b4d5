"""Product quantization (PQ) for embedding columns — the compression
tier of large-scale ANN (IVF-PQ): vectors become ``m`` small codes
(one per subspace), queries scan codes with asymmetric distance
computation (ADC) lookup tables instead of raw floats.

Why this matters at 100 TB: raw float32 embeddings are 4·dim bytes per
row; PQ codes are ``m`` bytes (m=8, 256-way codebooks ≈ 32× smaller
for dim=64), so the candidate scan becomes memory-bandwidth-cheap and
the full-precision vectors are only touched for re-ranking (not
implemented here — the codes ARE the approximation tier, the exact
re-rank is `cosine_topk` on the shortlist).

Spark-first shape:

- **Training** runs ALL ``m`` sub-codebooks in the same jobs: the
  corpus explodes once into (subspace, subvector) rows, and each
  Lloyd's iteration is ONE map-side-combined aggregate over
  (subspace, code, dimension) — m·k·dsub rows shuffled per iteration,
  never the corpus. Seeding is deterministic (smallest ``h60(id|j)``
  digests per subspace — the one-pass 'hash' init of
  `clustering.kmeans_fit`).
- **Encoding** is one Arrow pass with the m×k×dsub codebook tensor in
  the closure (tiny: 8·16·8 floats), emitting ``array<int>`` codes.
- **Query** broadcasts the query matrix (the `cosine_topk` contract:
  queries fit in a broadcast; the corpus side is unbounded), builds
  per-query ADC tables once per batch, and gathers code distances
  with numpy fancy indexing — per batch O(|Q|·m·k + |Q|·rows·m), no
  |Q|×|corpus| float matrix ever materializes.

Determinism: seeding, iteration count, and tie-breaks are pure
functions of (corpus, params) — same codes on every run/partitioning.
Float k-means prevents a cross-engine SQL oracle (documented; the
driver records the rows-only check); recall against the exact scorer
and run-to-run determinism are pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_process_dpla_index_spark.functions.text import h60


def _subvector_rows(df: DataFrame, id_col: str, vec_col: str, dim: int, m: int):
    """(id, j, subvec): explode each vector into its m subspace slices
    — a narrow projection (slice + posexplode), no shuffle."""
    dsub = dim // m
    slices = F.array(
        *[F.slice(F.col(vec_col), j * dsub + 1, dsub) for j in range(m)]
    )
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(slices).alias("j", "subvec")
    )


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    n_iter: int = 5,
) -> list[list[list[float]]]:
    """Train the m sub-codebooks (k centroids of dim/m floats each).
    Returns ``codebooks[j][c]`` — driver-side, it IS the model
    (m·k·dsub floats; 8·16·8 = 1024 for the defaults).

    Every Lloyd's iteration is ONE aggregate over the exploded
    (subspace, subvector) frame; empty cells keep their previous
    centroid (the `kmeans_fit` convention)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    import numpy as np

    sub = _subvector_rows(df, id_col, vec_col, dim, m)

    # deterministic one-pass seeding: per subspace, the k subvectors
    # with smallest h60(id|j) — one window over the exploded frame
    w = Window.partitionBy("j").orderBy(F.col("__h").asc(), F.col("id").asc())
    seeds = (
        sub.withColumn(
            "__h", h60(F.concat_ws("|", F.col("id").cast("string"), F.col("j")))
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("j", "__rn", "subvec")
        .collect()
    )
    books = np.zeros((m, k, dsub), dtype="float64")
    seen = np.zeros((m, k), dtype=bool)
    for r in seeds:
        books[r["j"], r["__rn"] - 1] = r["subvec"]
        seen[r["j"], r["__rn"] - 1] = True
    if not seen.all():
        raise ValueError(f"corpus has fewer than k={k} rows")

    for _ in range(n_iter):
        assigned = _assign_codes_rows(sub, books)
        stats = (
            assigned.select("j", "code", F.posexplode("subvec").alias("pos", "x"))
            .groupBy("j", "code", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_books = books.copy()
        for r in stats:
            new_books[r["j"], r["code"], r["pos"]] = r["s"] / r["n"]
        if float(((new_books - books) ** 2).max()) <= 1e-12:
            books = new_books
            break
        books = new_books
    return [[list(map(float, c)) for c in book] for book in books]


def _assign_codes_rows(sub: DataFrame, books) -> DataFrame:
    """(id, j, subvec, code): nearest sub-centroid per exploded row —
    Arrow batches against the in-closure codebook tensor."""
    import numpy as np

    books = np.asarray(books, dtype="float64")

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(list(pdf["subvec"]), dtype="float64")
            J = pdf["j"].to_numpy()
            codes = np.empty(len(pdf), dtype="int32")
            for j in np.unique(J):
                mask = J == j
                d = ((X[mask, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[mask] = d.argmin(axis=1)
            pdf = pdf.copy()
            pdf["code"] = codes
            yield pdf

    dsub = books.shape[2]
    return sub.mapInPandas(
        assign, f"id bigint, j int, subvec array<double>, code int"
    )


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): one narrow Arrow pass; each vector is
    sliced and matched against its subspace codebook in-batch."""
    import numpy as np

    books = np.asarray(codebooks, dtype="float64")
    m, k, dsub = books.shape

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(list(pdf[vec_col]), dtype="float64")
            n = len(pdf)
            codes = np.empty((n, m), dtype="int32")
            for j in range(m):
                sl = X[:, j * dsub : (j + 1) * dsub]
                d = ((sl[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "codes": list(codes.tolist())}
            )

    return df.select(id_col, vec_col).mapInPandas(encode, "id bigint, codes array<int>")


def pq_topk(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_queries: int | None = 25,
) -> DataFrame:
    """Approximate all-pairs top-k by ADC over PQ codes: every stored
    row is scored against every query through the m lookup tables —
    the compressed-domain scan of IVF-PQ (here over the full corpus;
    compose with `ivf_topk`'s cell routing for the two-level form).

    The query set (first ``n_queries`` ids, or all when None) must fit
    in a broadcast — the `cosine_topk` contract. Per Arrow batch the
    work is table build O(|Q|·m·k_sub) + gather O(|Q|·rows·m); only
    per-batch top-k rows leave Python, and the global top-k compiles
    to one TakeOrdered."""
    import numpy as np

    books = np.asarray(codebooks, dtype="float64")
    m, ksub, dsub = books.shape
    codes = pq_encode(df, codebooks, id_col, vec_col)

    qdf = df.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    if n_queries is not None:
        qdf = qdf.orderBy("qid").limit(n_queries)
    qrows = qdf.collect()
    qids = np.asarray([r["qid"] for r in qrows], dtype="int64")
    Q = np.asarray([list(r["qvec"]) for r in qrows], dtype="float64")
    # ADC tables: T[q, j, c] = ||Q[q, j-th slice] - books[j][c]||^2
    T = np.stack(
        [
            ((Q[:, j * dsub : (j + 1) * dsub][:, None, :] - books[j][None, :, :]) ** 2).sum(
                axis=2
            )
            for j in range(m)
        ],
        axis=1,
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            C = np.asarray(list(pdf["codes"]), dtype="int64")  # rows × m
            ids = pdf["id"].to_numpy()
            # dist[q, r] = sum_j T[q, j, C[r, j]]
            dist = T[:, np.arange(m)[None, :], C].sum(axis=2)
            local_k = min(k + 1, dist.shape[1])
            idx = np.argpartition(dist, local_k - 1, axis=1)[:, :local_k]
            out_q, out_id, out_d = [], [], []
            for qi in range(len(qids)):
                for ri in idx[qi]:
                    if ids[ri] == qids[qi]:
                        continue
                    out_q.append(qids[qi])
                    out_id.append(ids[ri])
                    out_d.append(dist[qi, ri])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_id, "dist2": out_d}
            )

    scored = codes.mapInPandas(score, "query_id bigint, neighbor_id bigint, dist2 double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("dist2", 6).alias("dist2"), "rnk")
    )
