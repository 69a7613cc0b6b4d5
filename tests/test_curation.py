"""Curation operators: decontamination, quality gate, global shuffle.

Behavioral contracts (planted contamination is found, gates drop the
right rows, shuffle order is a pure function of seed+key) plus the
plan-shape audits that make them safe at 100 TB: benchmark side
broadcast, corpus side never re-shuffled beyond the matched-row count,
quality gate and shuffle-key assignment fully narrow.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.operators.curation import (
    decontaminate,
    global_shuffle,
    quality_gate,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_decontaminate_planted_overlap(spark):
    corpus = _mk_docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content about spark plans"),
            (3, "quick brown fox sightings were reported today"),
        ],
    )
    bench = _mk_docs(spark, [(100, "a quick brown fox appeared")])
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(corpus, bench, n=3).collect()
    }
    # docs 1 and 3 share the 3-gram "quick brown fox"; doc 2 is clean
    assert out[1] == (1, True)
    assert out[3] == (1, True)
    assert out[2] == (0, False)


def test_decontaminate_empty_benchmark(spark):
    corpus = _mk_docs(spark, [(1, "some text here ok")])
    bench = _mk_docs(spark, [(9, "")])  # normalizes to zero shingles
    rows = decontaminate(corpus, bench).collect()
    assert len(rows) == 1 and rows[0]["contaminated"] is False


def test_decontaminate_min_hits_threshold(spark):
    corpus = _mk_docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    bench = _mk_docs(spark, [(9, "alpha beta gamma delta")])
    # overlap = {"alpha beta gamma", "beta gamma delta"} -> 2 hits
    strict = decontaminate(corpus, bench, n=3, min_hits=3).collect()[0]
    loose = decontaminate(corpus, bench, n=3, min_hits=2).collect()[0]
    assert strict["n_hits"] == 2 and strict["contaminated"] is False
    assert loose["contaminated"] is True


def test_quality_gate_drops_degenerate_docs(spark):
    docs = _mk_docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog near a river bank"),
            (2, "a b"),  # too few tokens
            (3, "spam " * 200),  # repetition ratio ~1
            (4, "!!! ??? $$$ %%% ^^^ &&& *** ((( ))) @@@"),  # punct noise
        ],
    )
    kept = quality_gate(docs).select("doc_id").collect()
    assert {r["doc_id"] for r in kept} == {1}


def test_quality_gate_emits_metrics(spark):
    docs = _mk_docs(
        spark, [(1, "the quick brown fox jumps over the lazy dog today")]
    )
    row = quality_gate(docs).collect()[0]
    assert row["n_tokens"] == 10
    assert 2.0 <= row["mean_token_len"] <= 12.0
    assert row["repetition_ratio"] == 0.0


def test_global_shuffle_deterministic_and_even(docs):
    a = global_shuffle(docs, "doc_id", seed="s1", n_shards=8)
    b = global_shuffle(docs, "doc_id", seed="s1", n_shards=8)
    assert a.collect() == b.collect()
    shards = {r["shard"] for r in a.select("shard").distinct().collect()}
    assert shards <= set(range(8)) and len(shards) >= 6  # spread, 500 docs
    # a different seed produces a different order
    c = global_shuffle(docs, "doc_id", seed="s2", n_shards=8)
    ka = [r["shuffle_key"] for r in a.orderBy("doc_id").collect()]
    kc = [r["shuffle_key"] for r in c.orderBy("doc_id").collect()]
    assert ka != kc
    # keys are collision-free over the corpus (60-bit digest)
    assert a.select("shuffle_key").distinct().count() == a.count()


# --- plan audits -----------------------------------------------------------


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_broadcasts_benchmark_only(spark, docs):
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    plan = _executed(decontaminate(corpus, bench))
    # benchmark shingles go through a BroadcastExchange; the corpus
    # side must NOT sort-merge against it
    assert "BroadcastExchange" in plan, plan
    # the per-doc hit count is the only hash shuffle; the corpus scan
    # itself never exchanges before the broadcast join
    first_join = plan.index("BroadcastHashJoin")
    assert "Exchange hashpartitioning" not in plan[first_join:].split(
        "BroadcastHashJoin"
    )[0]


def test_quality_gate_is_narrow(spark, docs):
    plan = _executed(quality_gate(docs))
    assert "Exchange" not in plan, plan
    assert "*(" in plan, plan  # whole-stage codegen stages present
    # the gate must be the Generate barrier over aliased metric columns,
    # not a Filter (a Filter is pushed below the metric projection and
    # re-derives the token split inline — measured 50× slower)
    assert "Generate explode" in plan, plan
    assert "Filter (" not in plan, plan  # no Filter node (scan's PushedFilters line is fine)


def test_global_shuffle_is_narrow(spark, docs):
    plan = _executed(global_shuffle(docs, "doc_id"))
    assert "Exchange" not in plan, plan


# --- training export product ----------------------------------------------


def test_training_export_reproducible_ordered_shards(spark, docs, tmp_path):
    from batch_process_dpla_index_spark.io.manifest import read_manifest
    from batch_process_dpla_index_spark.products.training_export import (
        export_training_shards,
    )

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    opts = export_training_shards(spark, docs, out_a, seed="s1", n_shards=4)
    export_training_shards(spark, docs, out_b, seed="s1", n_shards=4)

    back_a = spark.read.parquet(out_a)
    back_b = spark.read.parquet(out_b)
    # identical contents across re-runs (order is a pure fn of seed+id)
    rows_a = [r.asDict() for r in back_a.orderBy("shuffle_key").collect()]
    rows_b = [r.asDict() for r in back_b.orderBy("shuffle_key").collect()]
    assert rows_a == rows_b and len(rows_a) > 0

    # every shard directory's file is internally sorted by shuffle_key
    import glob

    shard_dirs = sorted(glob.glob(out_a + "/shard=*"))
    assert len(shard_dirs) == 4
    for d in shard_dirs:
        keys = [r["shuffle_key"] for r in spark.read.parquet(d).collect()]
        assert keys == sorted(keys) and len(keys) > 0

    # manifest written and consistent
    mf = read_manifest(out_a)
    assert mf["Seed"] == "s1" and int(mf["Total doc count"]) == len(rows_a)
    assert opts["Shards"] == "4"

    # a different seed produces a different order
    out_c = str(tmp_path / "c")
    export_training_shards(spark, docs, out_c, seed="s2", n_shards=4)
    order_a = [r["doc_id"] for r in rows_a]
    order_c = [
        r["doc_id"]
        for r in spark.read.parquet(out_c).orderBy("shuffle_key").collect()
    ]
    assert order_a != order_c and sorted(order_a) == sorted(order_c)


def test_quality_gate_runs_in_streaming(spark, docs, tmp_path):
    """quality_gate is a narrow scan->project->generate pipeline, so the
    SAME builder must run unchanged as a Structured Streaming transform
    and converge to the batch result once the source drains."""
    from batch_process_dpla_index_spark.streaming.windows import run_stream_to_batch

    src = str(tmp_path / "docs_stream")
    docs.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    got = run_stream_to_batch(
        quality_gate(stream).select("doc_id", "n_tokens"),
        "qgate_stream",
        output_mode="append",
    )
    want = quality_gate(spark.read.parquet(src)).select("doc_id", "n_tokens")
    assert sorted(got.collect()) == sorted(want.collect())


def test_boilerplate_stats_semantics(spark):
    from batch_process_dpla_index_spark.operators.curation import boilerplate_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h unique one tail"),
            (2, "a b c d e f g h other content words"),
            (3, "totally different text with no repeats"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in boilerplate_stats(docs, "text", "doc_id", seg_tokens=8, min_docs=2).collect()
    }
    # Empty doc excluded; docs 1 and 2 share their first 8-token segment.
    assert set(out) == {1, 2, 3}
    assert out[1].n_segments == 2 and out[1].n_boilerplate == 1
    assert out[2].n_segments == 2 and out[2].n_boilerplate == 1
    assert out[3].n_boilerplate == 0
    assert abs(out[1].boilerplate_ratio - 0.5) < 1e-9


def test_mixture_plan_rates(spark):
    from batch_process_dpla_index_spark.operators.curation import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a", "en"), (2, "b c d e", "en"), (3, "x y", "de"), (4, "z", "xx")],
        "doc_id long, text string, lang string",
    )
    plan = {r.domain: r for r in mixture_plan(docs, "lang", {"en": 0.5, "de": 0.5}, 4).collect()}
    # en: 5 tokens, target 2 -> 400000 ppm; de: 2 tokens, target 2 -> capped 1e6
    assert plan["en"].n_tokens == 5 and plan["en"].rate_ppm == 400_000
    assert plan["de"].rate_ppm == 1_000_000
    # unweighted domain: rate 0 (excluded from the mixture)
    assert plan["xx"].weight == 0.0 and plan["xx"].rate_ppm == 0


def test_mixture_sample_deterministic_and_rate_faithful(spark, docs):
    from batch_process_dpla_index_spark.operators.curation import (
        mixture_plan,
        mixture_sample,
    )

    weights = {"en": 0.5, "de": 0.2, "fr": 0.15, "es": 0.1, "zh": 0.05}
    plan = mixture_plan(docs, "lang", weights, 10_000)
    a = sorted(r.doc_id for r in mixture_sample(docs, plan, "lang").select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in mixture_sample(docs.repartition(7), plan, "lang").select("doc_id").collect()
    )
    assert a == b and len(a) > 0  # partitioning-independent
    # rate-0 domains contribute nothing
    none_plan = mixture_plan(docs, "lang", {}, 10_000)
    assert mixture_sample(docs, none_plan, "lang").count() == 0


def test_domain_cap_equals_single_window(spark, docs):
    """The salted two-phase top-N must be row-identical to the naive
    single-window form (the total order makes the pre-prune lossless)."""
    from pyspark.sql.window import Window

    from batch_process_dpla_index_spark.operators.curation import domain_cap

    got = domain_cap(docs, "lang", "doc_id", cap=7, quality_col="n_chars", n_salts=4).select(
        "doc_id", "lang", "rank_in_domain"
    )
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    want = (
        docs.withColumn("rank_in_domain", F.row_number().over(w))
        .where(F.col("rank_in_domain") <= 7)
        .select("doc_id", "lang", "rank_in_domain")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_mixture_sample_is_broadcast_narrow(spark, docs):
    """The plan join must broadcast (|domains| rows) — no shuffle of
    the corpus side beyond the plan's own tiny aggregate."""
    from batch_process_dpla_index_spark.operators.curation import (
        mixture_plan,
        mixture_sample,
    )

    plan = mixture_plan(docs, "lang", {"en": 0.5}, 1000)
    sampled = mixture_sample(docs, plan, "lang")
    p = sampled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_unigram_lm_reference_model_and_oov(spark):
    """Scoring under a REFERENCE corpus model: OOV terms get the
    smoothing mass (c=0), and a distribution-matching doc outscores a
    gibberish one."""
    import math

    from batch_process_dpla_index_spark.operators.curation import unigram_lm_scores

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(50)],
        "doc_id long, text string",
    )
    ref_counts = (
        ref.select(F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zyx qwv jkl")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_lm_scores(docs, counts=ref_counts).collect()}
    assert out[1].n_terms == 3 and out[2].n_terms == 3
    assert out[1].lm_score > out[2].lm_score  # in-distribution wins
    # OOV exact value: every term unseen -> log2(alpha) - log2(N + alpha*V)
    n, v = 50 * 6, 5  # 300 tokens, vocab {the,cat,sat,on,mat}
    want = math.log2(1.0) - math.log2(n + v)
    assert abs(out[2].lm_score - round(want, 6)) < 1e-9


def test_mixture_plan_zero_and_null_token_domains(spark):
    """ANSI-mode regression: a domain whose docs are all empty or NULL
    text must plan rate 0 (not DIVIDE_BY_ZERO, not keep-everything)."""
    from batch_process_dpla_index_spark.operators.curation import (
        mixture_plan,
        mixture_sample,
    )

    docs = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "", "junk"), (3, None, "nulls")],
        "doc_id long, text string, lang string",
    )
    plan = {r.domain: r for r in mixture_plan(docs, "lang", {"en": 1.0, "junk": 1.0, "nulls": 1.0}, 4).collect()}
    assert plan["junk"].n_tokens == 0 and plan["junk"].rate_ppm == 0
    assert plan["nulls"].n_tokens == 0 and plan["nulls"].rate_ppm == 0
    assert plan["en"].rate_ppm == 1_000_000
    kept = mixture_sample(docs, mixture_plan(docs, "lang", {"en": 1.0, "junk": 1.0, "nulls": 1.0}, 4), "lang")
    assert {r.doc_id for r in kept.collect()} == {1}


def test_mixture_plan_huge_budget_no_overflow(spark):
    """rate arithmetic must survive 100T-token budgets (the old
    integer form overflowed int64 at target_tokens > ~9.2e12)."""
    from batch_process_dpla_index_spark.operators.curation import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a b c", "en")], "doc_id long, text string, lang string"
    )
    plan = mixture_plan(docs, "lang", {"en": 0.5}, 20_000_000_000_000).collect()[0]
    assert plan.target_tokens == 10_000_000_000_000
    assert plan.rate_ppm == 1_000_000  # capped: corpus far smaller than target


def test_mixture_sample_tolerates_reserved_column_names(spark):
    """docs columns named domain/rate_ppm must survive the plan join."""
    from batch_process_dpla_index_spark.operators.curation import (
        mixture_plan,
        mixture_sample,
    )

    docs = spark.createDataFrame(
        [(1, "x y z", "en", "keepme", 7)],
        "doc_id long, text string, lang string, domain string, rate_ppm int",
    )
    plan = mixture_plan(docs.select("doc_id", "text", "lang"), "lang", {"en": 1.0}, 100)
    out = mixture_sample(docs, plan, "lang").collect()
    assert len(out) == 1 and out[0].domain == "keepme" and out[0].rate_ppm == 7


def test_training_export_full_curation_chain(spark, docs, tmp_path):
    """End-to-end: sentence dedup → gate → mixture sample → shuffle →
    shards. Counts shrink monotonically through the chain, the
    manifest records every stage, and a re-run with the same seed is
    byte-identical."""
    from batch_process_dpla_index_spark.io.manifest import read_manifest
    from batch_process_dpla_index_spark.products.training_export import (
        export_training_shards,
    )

    weights = {"en": 0.6, "de": 0.4}
    out = str(tmp_path / "full_chain")
    opts = export_training_shards(
        spark, docs, out,
        seed="chain0", n_shards=4,
        gate=True, sentence_dedup_first=True,
        mixture=("lang", weights, 5_000),
    )
    n = int(opts["Total doc count"])
    assert 0 < n < docs.count()
    man = read_manifest(out)
    assert man["Sentence dedup"] == "True" and man["Mixture"].startswith("lang:")
    landed = spark.read.parquet(out)
    # only weighted languages survive the mixture
    assert {r.lang for r in landed.select("lang").distinct().collect()} <= set(weights)
    # reproducibility: same seed → identical shard contents
    out2 = str(tmp_path / "full_chain2")
    export_training_shards(
        spark, docs, out2, seed="chain0", n_shards=4,
        gate=True, sentence_dedup_first=True, mixture=("lang", weights, 5_000),
    )
    a = sorted(map(tuple, spark.read.parquet(out).collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).collect()))
    assert a == b


def test_training_export_semantic_collapse(spark, docs, tmp_path):
    """The SemDeDup curation step: docs whose embedding is a
    non-representative member of a semantic near-dup group are dropped
    before the gate; representatives and embedding-less docs survive.
    The exported id set must equal operators.dedup.semantic_dedup's
    kept-set intersected with the gated corpus."""
    from batch_process_dpla_index_spark.operators.dedup import (
        semantic_dedup,
        unpersist_deps,
    )
    from batch_process_dpla_index_spark.products.training_export import (
        export_training_shards,
    )
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    # embeddings keyed by doc_id; leave doc_ids >= 400 embedding-less
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select(F.col("vec_id").alias("doc_id"), "embedding")
        .where(F.col("doc_id") < 400)
    )
    out = str(tmp_path / "sem_collapse")
    opts = export_training_shards(
        spark, docs, out,
        seed="sem0", n_shards=4, gate=False,
        semantic_collapse=(emb, "embedding", 0.3),
    )
    assert opts["Semantic collapse"].startswith("threshold=0.3 dropped=")
    landed_ids = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}

    sd = semantic_dedup(emb, "doc_id", "embedding", k=32, n_iter=3, threshold=0.3)
    not_kept = {r.id for r in sd.where(~F.col("kept")).select("id").collect()}
    unpersist_deps(sd)
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert not_kept  # the fixture actually has near-dup groups
    assert landed_ids == all_ids - not_kept
    # embedding-less docs passed through untouched
    assert landed_ids & {i for i in all_ids if i >= 400} == {
        i for i in all_ids if i >= 400
    }


def test_export_mixture_seed_decorrelated_from_shards():
    """Pure-Python replay of the export chain's two digests: with the
    OLD scheme (same seed for sampling and shuffle), every survivor of
    a tiny ppm rate has residue < rate_ppm, so shard = residue % 8
    can only hit shards 0..rate_ppm-1. The shipped '|mix' salt must
    spread survivors across the full shard range (fixed seed → this
    is deterministic, not statistical)."""
    from batch_process_dpla_index_spark.operators.similarity import _h60_py

    rate_ppm, n_shards, n_keys = 4, 8, 2_000_000
    old_shards, new_shards = set(), set()
    for k in range(n_keys):
        shuffle_key = _h60_py(f"seed0|{k}")
        if shuffle_key % 1_000_000 < rate_ppm:  # old: same digest
            old_shards.add(shuffle_key % n_shards)
        if _h60_py(f"seed0|mix|{k}") % 1_000_000 < rate_ppm:  # shipped
            new_shards.add(shuffle_key % n_shards)
    assert old_shards and old_shards <= set(range(rate_ppm))  # the collapse
    assert max(new_shards) >= rate_ppm  # decorrelated: reaches high shards


def test_char_entropy_exact_values(spark):
    from pyspark.sql import functions as F

    from batch_process_dpla_index_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [("aaaa",), ("ab",), ("abca",), ("",)], "s string"
    ).select("s", F.round(char_entropy(F.col("s")), 9).alias("h"))
    got = {r["s"]: r["h"] for r in df.collect()}
    assert got["aaaa"] == 0.0
    assert got["ab"] == 1.0
    # counts a:2,b:1,c:1 -> H = log2(4) - (2*log2(2))/4 = 2 - 0.5 = 1.5
    assert got["abca"] == 1.5
    assert got[""] is None


def test_dsir_weights_prefer_target_like_docs(spark):
    from pyspark.sql import functions as F

    from batch_process_dpla_index_spark.operators.curation import dsir_weights

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps", "en"),
            (2, "the lazy brown dog sleeps", "en"),
            (3, "der schnelle braune fuchs springt", "de"),
            (4, "the quick brown fox runs", "de"),  # target-like text, wrong label
        ],
        "doc_id long, text string, lang string",
    )
    out = dsir_weights(docs, docs.filter(F.col("lang") == "en"))
    w = {r["doc_id"]: r["dsir_weight"] for r in out.collect()}
    # docs sharing the target (en) vocabulary outscore the German one,
    # including doc 4 whose LABEL is de but whose text is target-like —
    # DSIR scores text, not metadata
    assert w[1] > w[3] and w[2] > w[3] and w[4] > w[3]
    assert all(r["n_terms"] == 5 for r in out.collect())


def test_leakage_safe_split_never_straddles_clusters(spark):
    from batch_process_dpla_index_spark.operators.curation import (
        leakage_safe_split,
    )
    from batch_process_dpla_index_spark.operators.dedup import unpersist_deps

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 41)], "doc_id bigint, text string"
    )
    # two multi-doc near-dup clusters (one a chain: 1-2, 2-3 — the CC
    # fixpoint, not just pair grouping, must keep it together) + a
    # 2-cycle; everything else is a singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    out = leakage_safe_split(docs, pairs, "doc_id", val_fraction=0.5)
    rows = out.collect()
    unpersist_deps(out)
    assert len(rows) == 40  # every doc labeled, singletons included
    by_cluster: dict[int, set[str]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["split"])
    # THE leakage property: one split side per cluster, no straddle
    assert all(len(sides) == 1 for sides in by_cluster.values())
    sizes = {r["doc_id"]: r["n_members"] for r in rows}
    assert sizes[1] == sizes[2] == sizes[3] == 3
    assert sizes[10] == sizes[11] == 2
    assert sizes[40] == 1
    # singletons fall back to the per-doc hash split -> both sides occur
    singleton_sides = {r["split"] for r in rows if r["n_members"] == 1}
    assert singleton_sides == {"train", "val"}


def test_leakage_safe_split_deterministic_and_cluster_keyed(spark):
    from batch_process_dpla_index_spark.operators.curation import (
        leakage_safe_split,
    )
    from batch_process_dpla_index_spark.operators.dedup import unpersist_deps

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 21)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame([(4, 5)], "id_a bigint, id_b bigint")
    a = leakage_safe_split(docs, pairs, "doc_id")
    got_a = sorted((r["doc_id"], r["split"]) for r in a.collect())
    unpersist_deps(a)
    b = leakage_safe_split(docs, pairs, "doc_id")
    got_b = sorted((r["doc_id"], r["split"]) for r in b.collect())
    unpersist_deps(b)
    assert got_a == got_b  # pure function of (salt, cluster id)
    # the pair (4,5) shares cluster min(4,5)=4 -> doc 5's bucket is
    # keyed on 4, identical side to doc 4 by construction
    sides = dict(got_a)
    assert sides[4] == sides[5]


def test_domain_quality_rank_is_per_domain(spark):
    from batch_process_dpla_index_spark.operators.curation import (
        domain_quality_rank,
    )

    good = "the quick brown fox jumps over the lazy dog again and again today"
    bad = "x!!! y??? z***"
    df = spark.createDataFrame(
        [
            (1, good, "a"),
            (2, bad, "a"),
            (3, good, "b"),
            (4, bad, "b"),
            (5, None, "b"),  # NULL text is excluded, not ranked
        ],
        "doc_id bigint, text string, source string",
    )
    rows = {r["doc_id"]: r for r in domain_quality_rank(df).collect()}
    assert 5 not in rows and len(rows) == 4
    # ranks are computed within each domain independently: both
    # domains see the same (low, high) pattern
    assert rows[1]["pct_rank"] == 1.0 and rows[2]["pct_rank"] == 0.0
    assert rows[3]["pct_rank"] == 1.0 and rows[4]["pct_rank"] == 0.0
    assert rows[1]["quality"] > rows[2]["quality"]


def test_ngram_novelty_detects_regurgitation(spark):
    from batch_process_dpla_index_spark.operators.curation import ngram_novelty

    ref = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id bigint, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # all 3-grams in ref
            (2, "totally novel words here now"),  # none in ref
            (3, ""),                              # no shingles
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_novelty(docs, ref, n=3).collect()}
    assert rows[1]["novelty"] == 0.0
    assert rows[2]["novelty"] == 1.0
    assert rows[3]["n_shingles"] == 0 and rows[3]["novelty"] is None
    assert rows[1]["n_seen"] == rows[1]["n_shingles"] == 2


def test_fuzzy_decontaminate_catches_near_copy(spark):
    """A verbatim copy and a light paraphrase of a benchmark item are
    flagged with their EXACT shingle Jaccard; an unrelated doc is not —
    the normalized-similarity screen, vs decontaminate's absolute
    hit-count (which a couple of common trigrams can trip)."""
    from batch_process_dpla_index_spark.operators.curation import (
        fuzzy_decontaminate,
    )
    from batch_process_dpla_index_spark.operators.dedup import unpersist_deps

    bench_text = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the fence and the birds sing in the garden"
    )
    near_copy = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the fence and the birds sing in the yard"
    )
    corpus = _mk_docs(
        spark,
        [
            (1, bench_text),  # verbatim copy -> jaccard 1.0
            (2, near_copy),  # one word changed -> high jaccard
            (3, "completely unrelated content about spark physical plans"),
        ],
    )
    bench = _mk_docs(spark, [(100, bench_text)])
    df = fuzzy_decontaminate(corpus, bench, threshold=0.5)
    rows = {r["doc_id"]: r for r in df.collect()}
    unpersist_deps(df)
    assert set(rows) == {1, 2}
    assert rows[1]["bench_id"] == 100 and rows[1]["jaccard"] == 1.0
    # 23 tokens -> 21 distinct trigrams each; the last-word swap breaks
    # only the final trigram: |∩| = 20, |∪| = 22
    assert rows[2]["jaccard"] == pytest.approx(round(20 / 22, 6), abs=1e-6)


def test_fuzzy_decontaminate_empty_text_never_matches(spark):
    """Empty/degenerate texts produce all-NULL signatures and empty
    shingle sets; they must never pair (the dedup tier's NULL-signature
    contract carries over through the shared kernel)."""
    from batch_process_dpla_index_spark.operators.curation import (
        fuzzy_decontaminate,
    )
    from batch_process_dpla_index_spark.operators.dedup import unpersist_deps

    corpus = _mk_docs(spark, [(1, ""), (2, "a b")])
    bench = _mk_docs(spark, [(100, ""), (101, "x y")])
    df = fuzzy_decontaminate(corpus, bench, threshold=0.0)
    rows = df.collect()
    unpersist_deps(df)
    assert rows == []


def test_fuzzy_decontaminate_benchmark_side_broadcast(spark):
    """Plan audit: the benchmark's buckets and shingle sets reach the
    corpus through BroadcastExchange/BroadcastHashJoin — the corpus is
    never shuffled against the eval suite (the decontaminate scale
    contract, kept by the fuzzy variant)."""
    from batch_process_dpla_index_spark.operators.curation import (
        fuzzy_decontaminate,
    )
    from batch_process_dpla_index_spark.operators.dedup import unpersist_deps

    corpus = _mk_docs(
        spark, [(i, f"token{i} alpha beta gamma delta") for i in range(1, 40)]
    )
    bench = _mk_docs(spark, [(100, "alpha beta gamma delta epsilon")])
    df = fuzzy_decontaminate(corpus, bench, threshold=0.1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    unpersist_deps(df)


def test_contamination_screened_matches_full_matrix_on_flagged(spark):
    """The two-tier screen must agree EXACTLY with the full
    contamination_matrix on every pair it flags (same n_shared and
    containment; est_jaccard = the source_overlap estimate) — tier 2
    is a restriction of the verified matrix, never a reimplementation
    that could drift."""
    from batch_process_dpla_index_spark.operators.curation import (
        contamination_matrix,
        contamination_screened,
    )
    from batch_process_dpla_index_spark.operators.dedup import unpersist_deps
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    screened = contamination_screened(docs, est_threshold=0.0625)
    got = {
        (r["source_a"], r["source_b"]): (r["n_shared"], r["containment"])
        for r in screened.collect()
    }
    unpersist_deps(screened)
    assert got, "fixture must flag at least one pair"
    # exact_all_pairs=True: the all-pairs tier is explicit-opt-in
    # since r17 (the default delegates to the screened plan)
    full = contamination_matrix(docs, exact_all_pairs=True)
    want = {
        (r["source_a"], r["source_b"]): (r["n_shared"], r["containment"])
        for r in full.collect()
    }
    unpersist_deps(full)
    for pair, vals in got.items():
        assert want[pair] == vals, (pair, vals, want[pair])

    # the DEFAULT path == screened minus the est column, exactly
    dflt = contamination_matrix(docs)
    got_dflt = {
        (r["source_a"], r["source_b"]): (r["n_shared"], r["containment"])
        for r in dflt.collect()
    }
    assert set(dflt.columns) == {
        "source_a", "source_b", "n_shared", "containment"
    }
    unpersist_deps(dflt)
    assert got_dflt == got


def test_contamination_screened_disjoint_sources_empty(spark):
    """Sources with disjoint vocabularies are cleared by the sketch
    tier: zero flagged pairs, zero output — the whole point of the
    screen (tier 2's posting join never runs over cleared sources)."""
    from batch_process_dpla_index_spark.operators.curation import (
        contamination_screened,
    )
    from batch_process_dpla_index_spark.operators.dedup import unpersist_deps

    rows = [
        (i, f"s{s}", " ".join(f"w{s}_{i}_{j}" for j in range(12)))
        for s in range(4)
        for i in range(5)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    df = contamination_screened(docs, est_threshold=0.0625)
    out = df.collect()
    unpersist_deps(df)
    assert out == []


def test_contamination_matrix_exact_matches_duckdb_oracle(spark):
    """The explicit-opt-in ALL-PAIRS tier keeps independent oracle
    coverage after the r17 delegation (review finding: the registry's
    contamination_matrix oracle now replays the screened plan, so a
    regression in the exact posting self-join — still the truth side
    of the restriction-agreement test — would otherwise be guarded
    only by hand fixtures). Replays ORACLE_CONTAMINATION_MATRIX_EXACT
    in DuckDB over the same parquet and pins exact tuple equality."""
    import duckdb

    from batch_process_dpla_index_spark.operators.curation import (
        contamination_matrix,
    )
    from batch_process_dpla_index_spark.operators.dedup import unpersist_deps
    from batch_process_dpla_index_spark.oracles import (
        ORACLE_CONTAMINATION_MATRIX_EXACT,
    )
    from batch_process_dpla_index_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    got_df = contamination_matrix(docs, exact_all_pairs=True)
    got = sorted(map(tuple, got_df.collect()))
    unpersist_deps(got_df)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        ORACLE_CONTAMINATION_MATRIX_EXACT
    ).fetchall()))
    assert got == want and len(got) > 0
