"""Training-data export product: quality gate → deterministic global
shuffle → sharded, order-stable parquet + manifest.

The writer side of ``operators/curation.global_shuffle`` — the final
stage of a training-data pipeline, shaped like the reference's dated
product writers (ParquetDump.scala:115-126 write conventions,
manifest per `_MANIFEST` discipline) but with the ordering contract
LLM training runs need:

- every surviving doc gets ``shuffle_key = h60(seed || doc_id)`` and
  ``shard = pmod(shuffle_key, n_shards)``;
- rows are hash-repartitioned BY SHARD (one shuffle, even fan-out —
  NOT a global range sort) and sorted within each shard by
  shuffle_key via sortWithinPartitions — a per-partition spillable
  sort, no second exchange;
- re-running with the same seed reproduces byte-identical shard
  contents on any cluster size, because order is a pure function of
  (seed, doc_id) and shard files are written with
  partitionBy("shard").

At 100 TB: one shuffle total (by shard id, uniformly distributed by
construction), per-shard external sort, parallel parquet writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.io.manifest import write_manifest
from batch_process_dpla_index_spark.operators.curation import (
    global_shuffle,
    quality_gate,
)


def export_training_shards(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    seed: str = "seed0",
    n_shards: int = 8,
    gate: bool = True,
    sentence_dedup_first: bool = False,
    mixture: tuple[str, dict[str, float], int] | None = None,
    semantic_collapse: tuple | None = None,
) -> dict[str, str]:
    """Run the curation chain and write ordered shard files.

    Full chain (each stage optional, composed in pipeline order):
    semantic collapse → corpus-wide sentence dedup → quality gate →
    domain-mixture sampling (``mixture`` = (domain_col, weights,
    token_budget)) → deterministic global shuffle → sharded ordered
    parquet. Every stage is itself oracle-verified as a registry
    query; this product is the write-side composition. Semantic
    collapse runs FIRST because the embeddings describe the original
    documents — collapsing after sentence dedup would judge rewritten
    text against vectors computed on text that no longer exists.

    ``semantic_collapse`` = (embeddings, vec_col, threshold[, n_emb]):
    the
    SemDeDup curation step — ``operators.dedup.semantic_dedup`` groups
    transitive near-dup vectors within coarse cells and each group
    collapses to its closest-to-centroid representative; docs whose
    embedding is a non-representative group member are dropped BEFORE
    the quality gate. The embeddings frame must carry ``doc_id``; docs
    with no embedding row pass through untouched (nothing to judge).
    Cell count scales for constant cell population (k = max(32,
    N//64)), keeping the pair stage linear in N at any corpus size.

    Returns the manifest dict (also written as ``_MANIFEST``).
    """
    kept = docs
    sd = None
    sem = None
    n_collapsed = 0
    if semantic_collapse is not None:
        from batch_process_dpla_index_spark.operators.dedup import semantic_dedup

        # optional 4th element: a pre-computed embedding count, so a
        # caller that already knows |emb| (ingest stats, manifest)
        # skips the extra sizing action over unpersisted lineage —
        # without it this stage pays two bounded extra actions (the
        # k-sizing count here + the n_collapsed semi-join below)
        emb, vec_col, sem_threshold = semantic_collapse[:3]
        n_emb = (
            int(semantic_collapse[3])
            if len(semantic_collapse) > 3 and semantic_collapse[3] is not None
            else emb.count()
        )
        k = max(32, n_emb // 64)
        sem = semantic_dedup(
            emb, "doc_id", vec_col, k=k, n_iter=3, threshold=sem_threshold
        )
        dropped = sem.where(~F.col("kept")).select(
            F.col("id").alias("doc_id")
        )
        # one bounded action for the manifest stat (reads the persisted
        # cell assignment, not the doc corpus twice)
        n_collapsed = kept.join(dropped, "doc_id", "left_semi").count()
        kept = kept.join(dropped, "doc_id", "left_anti")
    if sentence_dedup_first:
        from batch_process_dpla_index_spark.operators.dedup import sentence_dedup

        sd = sentence_dedup(kept)
        deduped = sd.select("doc_id", "text")
        # re-attach the non-text columns (dedup reassembles text only)
        others = [c for c in kept.columns if c not in ("text",)]
        kept = kept.select(*others).join(deduped, "doc_id")
    if gate:
        kept = quality_gate(kept)
    if mixture is not None:
        from batch_process_dpla_index_spark.operators.curation import (
            mixture_plan,
            mixture_sample,
        )

        domain_col, weights, budget = mixture
        plan = mixture_plan(kept, domain_col, weights, budget)
        # The sampling digest must NOT reuse the shuffle seed verbatim:
        # both would hash h60(seed|doc_id), and since n_shards divides
        # 1e6, survivors of a low ppm rate all share small residues →
        # shard = residue % n_shards collapses into the first few
        # shards (empirically: rate_ppm=4, n_shards=8 leaves shards
        # 4-7 EMPTY). A derived salt decorrelates the two decisions
        # while keeping the whole chain a pure function of `seed`.
        kept = mixture_sample(kept, plan, domain_col, "doc_id", seed=seed + "|mix")
    shuffled = global_shuffle(kept, "doc_id", seed=seed, n_shards=n_shards)
    # hash-partition by shard id: two shard ids may collide into one
    # task (fine — partitionBy still splits the files and the leading
    # "shard" sort key keeps each file internally ordered); at real
    # n_shards (hundreds+) hashing evens out.
    ordered = shuffled.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", "shuffle_key"
    )
    ordered.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    if sd is not None or sem is not None:
        # the write above materialized the dedups — release the
        # persisted sentence explode / cell assignment before read-back
        from batch_process_dpla_index_spark.operators.dedup import unpersist_deps

        if sd is not None:
            unpersist_deps(sd)
        if sem is not None:
            unpersist_deps(sem)
    # manifest doc count from the freshly written parquet footers,
    # driver-side (r18) — the old read-back count job re-listed and
    # re-scanned the shard dataset it had just produced
    from batch_process_dpla_index_spark.products.index_tombstones import (
        parquet_rowcount,
    )

    n_docs = parquet_rowcount(out_dir)
    opts = {
        "Seed": seed,
        "Shards": str(n_shards),
        "Gate": str(gate),
        "Sentence dedup": str(sentence_dedup_first),
        "Semantic collapse": (
            "none"
            if semantic_collapse is None
            else f"threshold={semantic_collapse[2]} dropped={n_collapsed}"
        ),
        "Mixture": "none" if mixture is None else (
            f"{mixture[0]}:{sorted(mixture[1].items())}@{mixture[2]}"
        ),
        "Total doc count": str(n_docs),
    }
    write_manifest(opts, out_dir)
    return opts
