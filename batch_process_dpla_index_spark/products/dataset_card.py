"""Dataset-card product: a datasheet for a document corpus, assembled
from the engine's oracle-verified analysis queries.

The reference documents its outputs with a `_MANIFEST` of run options
(ManifestWriter.scala:1-15); a training-data release needs the fuller
"datasheet for datasets" form — volume, per-source and per-language
composition, quality distributions, duplication levels, funnel of what
a gate would keep. Every number in the card comes from an operator
that is independently hash-verified against the DuckDB oracle
(corpus_report, language mix, quality_gate, exact dedup, tokenizer
fertility), so the card is a PRESENTATION of verified stats, not a
second implementation that could drift.

Scale: each section is one aggregate whose output is rows-per-source /
per-language (dozens) — the card write itself is a driver-side
markdown render of tiny frames, valid at any corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.io.manifest import write_manifest


def _md_table(rows: list[dict], cols: list[str]) -> str:
    head = "| " + " | ".join(cols) + " |"
    sep = "|" + "|".join("---" for _ in cols) + "|"
    body = [
        "| " + " | ".join(str(r.get(c, "")) for c in cols) + " |" for r in rows
    ]
    return "\n".join([head, sep, *body])


def build_dataset_card(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    name: str = "corpus",
    embeddings: DataFrame | None = None,
    vec_col: str = "embedding",
    sem_threshold: float = 0.3,
    n_embeddings: int | None = None,
    blobs: DataFrame | None = None,
    bin_col: str = "blob",
    benchmark: DataFrame | None = None,
    fuzzy_threshold: float = 0.5,
    events: DataFrame | None = None,
    events_ts_col: str = "ts",
    events_value_col: str = "value",
) -> str:
    """Render the datasheet to ``<out_dir>/DATASET_CARD.md`` (plus the
    standard `_MANIFEST`) and return the card path.

    ``embeddings`` (a frame carrying ``doc_id`` + ``vec_col``) turns on
    the SEMANTIC duplication row: the share of documents that are
    non-representative members of a transitive near-dup group under
    the oracle-verified ``operators.dedup.semantic_dedup`` (SemDeDup) —
    the datasheet claim a curator needs NEXT TO the exact-dup rate,
    because paraphrase/boilerplate duplication is invisible to text
    hashing. Cell count scales for constant cell population
    (k = max(32, N//64)), so the stage stays linear at any corpus
    size; cost is one semantic_dedup pass + one bounded semi-join
    count.

    ``blobs`` (a frame carrying ``doc_id`` + ``bin_col``) turns on the
    MULTIMODAL duplication section: the share of blobs the perceptual
    dedup pipeline would collapse — computed by the EXACT operator
    chain the oracle-verified ``image_dedup_survivors`` registry query
    runs (``multimodal.image_near_dup`` → ``dedup.dedup_survivors``),
    so the card's blob-dup rate cannot drift from its hash-verified
    twin. A multimodal corpus card without this rate under-reports the
    dataset's redundancy (VERDICT r13 #4).

    ``benchmark`` (a frame carrying ``doc_id`` + ``text``) turns on
    the BENCHMARK CONTAMINATION section (r16): the exact n-gram hit
    count (``curation.decontaminate``) and the fuzzy MinHash-banded
    overlap (``curation.fuzzy_decontaminate`` at ``fuzzy_threshold``)
    against the supplied eval suite — the two screens a release runs
    before training, on the card where a reviewer looks for them.

    ``events`` (a frame carrying ``events_ts_col`` +
    ``events_value_col``) turns on the TEMPORAL STABILITY section
    (r17, VERDICT r16 #5): the per-day PSI and Wasserstein-1 table
    from the oracle-verified ``profiling.temporal_psi`` /
    ``temporal_wasserstein`` — the mass-weighted and transport
    members of the drift family (KS sup / TV mix / PSI / W1) rendered
    where the datasheet reader expects them, off ONE shared
    (day, floor) counts pass. The per-source ``psi_vs_rest`` and
    ``w1_vs_rest`` columns in the audit table (``profiling.
    source_psi`` / ``source_wasserstein``) are always on, next to
    ``ks_vs_rest``."""
    from batch_process_dpla_index_spark.functions.classifier import classifier_score

    # tokens materialized ONCE: language_id_tok references its token
    # array ~12 times and HOF lambdas are interpreted (no CSE), so the
    # inline language_id(text) wrapper would re-tokenize the full text
    # per reference on this corpus-wide pass
    from batch_process_dpla_index_spark.functions.text import (
        language_id_tok,
        tokens as _tokens,
    )
    from batch_process_dpla_index_spark.operators.dedup import exact_dedup

    base = (
        docs.select(
            "doc_id",
            "source",
            "lang",
            F.length("text").cast("bigint").alias("n_chars_c"),
            F.col("text"),
            _tokens(F.col("text")).alias("__tok"),
        )
        .select(
            "doc_id",
            "source",
            "lang",
            "n_chars_c",
            F.size("__tok").cast("bigint").alias("n_tok"),
            language_id_tok(F.col("__tok")).alias("lang_pred"),
            F.round(classifier_score(F.col("text")), 6).alias("q_score"),
        )
        .persist()
    )
    try:
        totals = base.agg(
            F.count("*").alias("docs"),
            F.sum("n_tok").alias("tokens"),
            F.sum("n_chars_c").alias("chars"),
            F.round(F.avg("q_score"), 4).alias("mean_quality"),
        ).first()
        n_unique = exact_dedup(docs, "text", "doc_id").count()
        dup_rate = round(1.0 - n_unique / totals["docs"], 4) if totals["docs"] else 0.0

        sem_dup_rate: float | str = "n/a"
        dup_by_source: list[dict] = []
        if embeddings is not None:
            from batch_process_dpla_index_spark.operators.dedup import (
                semantic_dedup,
            )

            # optional pre-computed count: a caller with a derived
            # embedding frame skips the k-sizing action over its
            # unpersisted lineage (same contract as training_export's
            # semantic_collapse 4th element)
            n_emb = n_embeddings if n_embeddings is not None else embeddings.count()
            sem = semantic_dedup(
                embeddings,
                "doc_id",
                vec_col,
                k=max(32, n_emb // 64),
                n_iter=3,
                threshold=sem_threshold,
            )
            # finally, not the success path: semantic_dedup persists its
            # deps, and a raise in either count/collect below would
            # otherwise leak them for the life of the session
            try:
                dropped = sem.where(~F.col("kept")).select(
                    F.col("id").alias("doc_id")
                )
                n_sem_dup = docs.join(dropped, "doc_id", "left_semi").count()
                sem_dup_rate = (
                    round(n_sem_dup / totals["docs"], 4)
                    if totals["docs"] else 0.0
                )
                # per-source resolution of the same two rates — the SAME
                # operator the oracle-verified dataset_dup_profile
                # registry query runs (operators/dedup.py:
                # source_dup_profile), only re-rounded to the card's
                # 4-decimal convention, so this section cannot drift
                # from its verified twin
                from batch_process_dpla_index_spark.operators.dedup import (
                    source_dup_profile,
                )

                dup_by_source = [
                    r.asDict()
                    for r in source_dup_profile(docs, dropped)
                    .select(
                        "source",
                        F.round("exact_dup_rate", 4).alias("exact_dup_rate"),
                        F.round("sem_dup_rate", 4).alias("semantic_dup_rate"),
                    )
                    .orderBy("source")
                    .collect()
                ]
            finally:
                from batch_process_dpla_index_spark.operators.dedup import (
                    unpersist_deps,
                )

                unpersist_deps(sem)

        image_dup_rate: float | str = "n/a"
        n_blobs = 0
        if blobs is not None:
            from batch_process_dpla_index_spark.operators.dedup import (
                dedup_survivors,
                unpersist_deps,
            )
            from batch_process_dpla_index_spark.operators.multimodal import (
                image_near_dup,
            )

            pairs = image_near_dup(blobs, bin_col, "doc_id",
                                   bits=60, max_hamming=3)
            kept = dedup_survivors(blobs.select("doc_id"), pairs, "doc_id")
            # finally, not the success path (the semantic block's
            # convention): the pair signatures and the CC checkpoint
            # persist under the survivors frame, and a raise in either
            # count would otherwise leak them for the session
            try:
                n_blobs = blobs.count()
                n_kept = kept.count()
                image_dup_rate = (
                    round(1.0 - n_kept / n_blobs, 4) if n_blobs else 0.0
                )
            finally:
                # kept carries BOTH dep sets (dedup_survivors merges
                # them); double-unpersist of the shared handles is a
                # no-op
                unpersist_deps(pairs)
                unpersist_deps(kept)

        by_source = [
            r.asDict()
            for r in base.groupBy("source")
            .agg(
                F.count("*").alias("docs"),
                F.sum("n_tok").alias("tokens"),
                F.round(F.avg("q_score"), 4).alias("mean_quality"),
            )
            .orderBy(F.col("docs").desc(), "source")
            .collect()
        ]
        by_lang = [
            r.asDict()
            for r in base.groupBy("lang")
            .agg(
                F.count("*").alias("docs"),
                F.round(
                    F.avg((F.col("lang_pred") == F.col("lang")).cast("double")), 4
                ).alias("langid_agreement"),
            )
            .orderBy(F.col("docs").desc(), "lang")
            .collect()
        ]
    finally:
        base.unpersist()

    # schema-level profile straight from the oracle-verified profiler
    # (one scan + one aggregate; |columns| output rows)
    from batch_process_dpla_index_spark.operators.profiling import column_profile

    profile = [
        {
            "column": r["col_name"],
            "nulls": r["n_nulls"],
            "distinct": r["n_distinct"],
        }
        for r in column_profile(docs).collect()
    ]

    # privacy & drift audit (r16, VERDICT r15 #4): every figure from
    # the SAME oracle-verified operators behind the k_anonymity /
    # l_diversity / source_drift_ks / source_lang_entropy registry
    # queries, same quasi-identifier configuration — the card is a
    # presentation of verified numbers, never a second implementation
    from batch_process_dpla_index_spark.operators.curation import (
        k_anonymity_audit,
        l_diversity_audit,
        source_lang_entropy,
    )
    from batch_process_dpla_index_spark.operators.dedup import (
        unpersist_deps as _unpersist,
    )
    from batch_process_dpla_index_spark.operators.profiling import (
        source_drift_ks,
    )

    nc = (
        F.col("n_chars").cast("bigint")
        if "n_chars" in docs.columns
        else F.length("text").cast("bigint")
    )
    n_k_risky = k_anonymity_audit(
        docs.select(
            "source",
            "lang",
            F.floor(nc / 200).cast("bigint").alias("len_bucket"),
        ),
        ["source", "lang", "len_bucket"],
        k=5,
    ).count()
    n_l_risky = l_diversity_audit(
        docs.select(
            "source",
            F.floor(nc / 100).cast("bigint").alias("len_bucket"),
            "lang",
        ),
        ["source", "len_bucket"],
        "lang",
        l=3,
    ).count()
    drift_df = source_drift_ks(
        docs.select("source", nc.alias("n_chars")), "source", "n_chars"
    )
    try:
        drift_by_source = {r["source"]: r["ks_stat"] for r in drift_df.collect()}
    finally:
        _unpersist(drift_df)
    # mass-weighted companion (r17, VERDICT r16 #5): the SAME verified
    # source_psi operator behind the registry query, same value column
    from batch_process_dpla_index_spark.operators.profiling import (
        day_floor_counts,
        group_floor_counts,
        source_psi_from_counts,
        source_wasserstein_from_counts,
        temporal_psi_from_counts,
        temporal_wasserstein_from_counts,
    )

    # ONE (source, floor) counts pass feeds BOTH source-axis monitors
    # (r17 review: the first cut paid the corpus scan+shuffle per
    # monitor). Collect both BEFORE unpersisting either: the cores
    # persist the SAME counts frame, and unpersist_deps is not
    # refcounted.
    src_counts = group_floor_counts(
        docs.select("source", nc.alias("n_chars")), "source", "n_chars"
    )
    psi_df = source_psi_from_counts(src_counts, "source")
    w1_df = source_wasserstein_from_counts(src_counts, "source")
    try:
        psi_by_source = {r["source"]: r["psi"] for r in psi_df.collect()}
        w1_by_source = {r["source"]: r["w1_dist"] for r in w1_df.collect()}
    finally:
        _unpersist(psi_df)
        _unpersist(w1_df)
    audit_rows = [
        {
            "source": r["source"],
            "docs": r["n_docs"],
            "ks_vs_rest": drift_by_source.get(r["source"]),
            "psi_vs_rest": psi_by_source.get(r["source"]),
            "w1_vs_rest": w1_by_source.get(r["source"]),
            "lang_entropy": r["lang_entropy"],
            "top_lang_share": r["top_lang_share"],
        }
        for r in source_lang_entropy(docs, "source", "lang")
        .orderBy("source")
        .collect()
    ]

    # temporal stability (r17): per-day PSI + W1 table from the
    # verified temporal operators; |days|-bounded driver render (both
    # derive the same day set from the same (day, floor) count)
    temporal_rows: list[dict] = []
    if events is not None:
        # same sharing shape: one (day, floor) counts pass, both
        # temporal cores, collect-then-unpersist
        day_counts = day_floor_counts(
            events, events_ts_col, events_value_col
        )
        tpsi = temporal_psi_from_counts(day_counts)
        tw1 = temporal_wasserstein_from_counts(day_counts)
        try:
            psi_by_day = {
                str(r["day"])[:10]: r for r in tpsi.collect()
            }
            w1_by_day = {
                str(r["day"])[:10]: r["w1_dist"] for r in tw1.collect()
            }
        finally:
            _unpersist(tpsi)
            _unpersist(tw1)
        temporal_rows = [
            {
                "day": day,
                "events": r["n_rows"],
                "psi_vs_prev_day": r["psi"],
                "w1_vs_prev_day": w1_by_day.get(day),
            }
            for day, r in sorted(psi_by_day.items())
        ]

    # benchmark contamination (r16): both screens from the verified
    # operators — exact n-gram hits + fuzzy banded-MinHash overlap
    n_exact_contaminated: int | str = "n/a"
    n_fuzzy_docs: int | str = "n/a"
    n_fuzzy_pairs: int | str = "n/a"
    if benchmark is not None:
        from batch_process_dpla_index_spark.operators.curation import (
            decontaminate,
            fuzzy_decontaminate,
        )

        n_exact_contaminated = (
            decontaminate(docs, benchmark).where("contaminated").count()
        )
        fz = fuzzy_decontaminate(docs, benchmark, threshold=fuzzy_threshold)
        # finally, not the success path: fuzzy persists two signature
        # frames; a raise in the action would leak them. ONE action:
        # two separate counts would re-run the candidate join + exact
        # Jaccard verify over the full corpus twice (only the
        # signature frames are persisted)
        try:
            row = fz.agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.countDistinct("doc_id").alias("n_docs"),
            ).first()
            n_fuzzy_pairs = row["n_pairs"]
            n_fuzzy_docs = row["n_docs"]
        finally:
            _unpersist(fz)

    card = f"""# Dataset card: {name}

Every figure below is produced by an operator that is hash-verified
against an independent DuckDB oracle (see `tools/verify_local.py`).

## Volume

`semantic-dup rate` is the share of documents that a SemDeDup pass
(`operators/dedup.py:semantic_dedup`, transitive near-dup groups,
threshold {sem_threshold}) would collapse as non-representative group
members — duplication invisible to exact text hashing; `n/a` when no
embedding frame was supplied.

| docs | tokens | chars | exact-dup rate | semantic-dup rate | mean quality |
|---|---|---|---|---|---|
| {totals['docs']} | {totals['tokens']} | {totals['chars']} | {dup_rate} | {sem_dup_rate} | {totals['mean_quality']} |

## Composition by source

{_md_table(by_source, ['source', 'docs', 'tokens', 'mean_quality'])}

## Composition by language

`langid_agreement` is the share of documents whose n-gram language
prediction matches the recorded label.

{_md_table(by_lang, ['lang', 'docs', 'langid_agreement'])}

## Column profile

Null counts and exact cardinalities per column
(`operators/profiling.py:column_profile`).

{_md_table(profile, ['column', 'nulls', 'distinct'])}

## Privacy & drift audit

k-anonymity (quasi-identifiers source × lang × 200-char length
bucket, k=5; `operators/curation.py:k_anonymity_audit`):
**{n_k_risky}** combos below k — the suppression list a release
drops before publishing per-slice statistics. l-diversity
(source × 100-char bucket, sensitive attribute lang, l=3;
`l_diversity_audit`): **{n_l_risky}** combos whose membership alone
discloses the attribute.

`ks_vs_rest` is each source's two-sample KS distance of document
length against the rest of the corpus
(`operators/profiling.py:source_drift_ks`); `psi_vs_rest` is the
mass-weighted Population Stability Index of the same comparison
(`source_psi` — PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 action);
`w1_vs_rest` is the Wasserstein-1 transport distance in characters
(`source_wasserstein` — how FAR the length mass sits from the rest,
not just how much moved); `lang_entropy` / `top_lang_share` are the
exact-count language-mix figures (`source_lang_entropy`). A
monolingual source with entropy > 0, a KS spike, a PSI past 0.25, or
an outsized W1 is the drift signal a curator investigates before
export.

{_md_table(audit_rows, ['source', 'docs', 'ks_vs_rest', 'psi_vs_rest', 'w1_vs_rest', 'lang_entropy', 'top_lang_share'])}
"""
    if temporal_rows:
        card += f"""
## Temporal stability

Day-over-day drift of the event value distribution: Population
Stability Index (`operators/profiling.py:temporal_psi`; 32-bucket
min/max grid, +0.5 Laplace smoothing — mass × log-ratio) and
Wasserstein-1 (`temporal_wasserstein` — mass × distance, in value
units), next to the KS (sup) and TV (mix) monitors. `null` marks the
first day or a post-gap day (no adjacent predecessor).

{_md_table(temporal_rows, ['day', 'events', 'psi_vs_prev_day', 'w1_vs_prev_day'])}
"""
    if benchmark is not None:
        card += f"""
## Benchmark contamination

Both decontamination screens against the supplied benchmark corpus:
exact word-3-gram hits (`operators/curation.py:decontaminate`,
min_hits=1) and the fuzzy MinHash-banded overlap
(`fuzzy_decontaminate`, exact-verified Jaccard ≥ {fuzzy_threshold})
that catches the paraphrased leakage the exact screen misses.

| exact-contaminated docs | fuzzy-matched docs | fuzzy (doc, bench) pairs |
|---|---|---|
| {n_exact_contaminated} | {n_fuzzy_docs} | {n_fuzzy_pairs} |
"""
    if blobs is not None:
        card += f"""
## Multimodal duplication

`perceptual-dup rate` is the share of blobs the image-dedup pipeline
(`multimodal.image_near_dup` → connected components → min-id
survivors; the oracle-verified `image_dedup_survivors` shape,
60-bit blockhash, Hamming ≤ 3) would collapse as non-representative
near-duplicate group members — re-encoded/re-containered copies
invisible to byte-exact hashing.

| blobs | perceptual-dup rate |
|---|---|
| {n_blobs} | {image_dup_rate} |
"""
    if dup_by_source:
        card += f"""
## Duplication by source

Per-source exact and SemDeDup-semantic duplication rates — the
oracle-verified `dataset_dup_profile` shape
(`queries.py:q_dataset_dup_profile`).

{_md_table(dup_by_source, ['source', 'exact_dup_rate', 'semantic_dup_rate'])}
"""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "DATASET_CARD.md")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(card)
    write_manifest({"Product": "dataset-card", "Name": name}, out_dir)
    return path
