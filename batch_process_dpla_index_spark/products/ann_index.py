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
cells bounded; growing the corpus = append new assignments under the
same manifest-pinned codebook, re-learn on drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.io.manifest import read_manifest, write_manifest
from batch_process_dpla_index_spark.operators.similarity import (
    ivf_cells_pandas,
    ivf_query_topk,
)


def build_ann_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    dim: int = 64,
    n_cells: int = 16,
    learned: bool = True,
    kmeans_iters: int = 10,
    cell_partitions: int = 32,
) -> dict[str, str]:
    """One corpus pass (+ k-means when ``learned``) → centroids, cell
    assignments, manifest. Returns the manifest dict."""
    spark = corpus.sparkSession
    if learned:
        from batch_process_dpla_index_spark.operators.clustering import kmeans_fit

        centroids = kmeans_fit(
            corpus, id_col, vec_col, k=n_cells, n_iter=kmeans_iters
        )
    else:
        centroids = None

    assigned = ivf_cells_pandas(corpus, id_col, vec_col, dim, n_cells, 1, centroids)
    stored = assigned.select(
        F.element_at("cells", 1).cast("int").alias("cell"), "id", "vec"
    )
    stored.repartition(cell_partitions, "cell").write.mode("overwrite").parquet(
        os.path.join(index_dir, "cells")
    )

    if centroids is None:
        from batch_process_dpla_index_spark.operators.similarity import (
            _centroid_matrix,
        )

        centroids = _centroid_matrix(dim, n_cells).tolist()
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark.createDataFrame(
        cent_rows, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))

    n_vecs = stored.count()
    manifest = {
        "dim": str(dim),
        "n_cells": str(n_cells),
        "quantizer": "kmeans-maximin" if learned else "pseudo-random",
        "metric": "cosine",
        "Record count": str(n_vecs),
    }
    write_manifest(manifest, index_dir)
    return manifest


def load_centroids(spark: SparkSession, index_dir: str) -> list[list[float]]:
    rows = (
        spark.read.parquet(os.path.join(index_dir, "centroids"))
        .orderBy("cell")
        .collect()
    )
    return [list(r["centroid"]) for r in rows]


def ann_query_indexed(
    spark: SparkSession,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """(query_id, neighbor_id, score, rank) for each query vector
    against the stored index — quantizer parameters come from the
    manifest, never the caller."""
    manifest = read_manifest(index_dir)
    dim = int(manifest["dim"])
    n_cells = int(manifest["n_cells"])
    centroids = load_centroids(spark, index_dir)
    stored = spark.read.parquet(os.path.join(index_dir, "cells"))
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
