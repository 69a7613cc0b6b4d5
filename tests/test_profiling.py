"""Unit coverage for the round-6 profiling / linkage / graph / sketch
operators (`operators/profiling.py`, `operators/linkage.py`,
`operators/graph.py`, `operators/sketches.py`) — invariants and edge
cases the sf-fixture oracles don't isolate: null accounting, the
approx-distinct escape hatch, perfect correlations, SNM window and
block semantics, rank-mass conservation with and without dangling
nodes, the Misra–Gries lower-bound/merge guarantees."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.operators.analytics import decayed_counts
from batch_process_dpla_index_spark.operators.graph import pagerank
from batch_process_dpla_index_spark.operators.linkage import (
    sorted_neighborhood_pairs,
)
from batch_process_dpla_index_spark.operators.profiling import (
    column_profile,
    corr_matrix,
)
from batch_process_dpla_index_spark.operators.sketches import (
    heavy_hitters,
    mg_summaries,
)


# --- column_profile --------------------------------------------------------


def test_column_profile_null_and_distinct_accounting(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (3, "b", 2.5)],
        ["k", "s", "v"],
    )
    prof = {r["col_name"]: r for r in column_profile(df).collect()}
    assert prof["k"]["n_rows"] == 4
    assert prof["k"]["n_nulls"] == 0
    assert prof["k"]["n_distinct"] == 3
    assert (prof["k"]["min_num"], prof["k"]["max_num"]) == (1.0, 3.0)
    assert prof["k"]["min_str"] is None  # numeric column: no string bounds
    assert prof["s"]["n_nulls"] == 1
    assert prof["s"]["n_distinct"] == 2  # NULL excluded
    assert (prof["s"]["min_str"], prof["s"]["max_str"]) == ("a", "b")
    assert prof["s"]["min_num"] is None
    assert prof["v"]["n_nulls"] == 1
    assert prof["v"]["n_distinct"] == 2


def test_column_profile_timestamp_bounds_are_chronological(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 2, 0, 0, 0, 999999),),
            (dt.datetime(2024, 1, 10, 5, 0, 0, 1),),
            (dt.datetime(2024, 1, 2, 0, 0, 0, 999998),),
        ],
        ["ts"],
    )
    row = column_profile(df).collect()[0]
    # microsecond-resolution canonicalization: sub-second-distinct
    # timestamps stay distinct, bounds are the true min/max
    assert row["n_distinct"] == 3
    assert row["min_str"] == "2024-01-02 00:00:00.999998"
    assert row["max_str"] == "2024-01-10 05:00:00.000001"


def test_column_profile_approx_escape_hatch(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 10).alias("m")
    )
    prof = {
        r["col_name"]: r
        for r in column_profile(df, exact_distinct=False).collect()
    }
    # HLL at default rsd: within 5% of truth for these cardinalities
    assert abs(prof["m"]["n_distinct"] - 10) <= 1
    assert abs(prof["id"]["n_distinct"] - 1000) <= 50


# --- corr_matrix -----------------------------------------------------------


def test_corr_matrix_perfect_and_inverse(spark):
    df = spark.range(50).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2 + 1).cast("double").alias("y"),
        (-F.col("id")).cast("double").alias("z"),
    )
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert len(got) == 3  # k(k-1)/2
    assert got[("x", "y")] == pytest.approx(1.0)
    assert got[("x", "z")] == pytest.approx(-1.0)
    assert got[("y", "z")] == pytest.approx(-1.0)


# --- decayed_counts --------------------------------------------------------


def test_decayed_counts_half_life_semantics(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, t0, 10.0),
            (1, t0 + dt.timedelta(days=7), 4.0),  # ref event: weight 1
            (2, None, 99.0),  # undatable: excluded entirely
        ],
        ["user_id", "ts", "value"],
    )
    rows = {r["user_id"]: r for r in decayed_counts(df).collect()}
    assert set(rows) == {1}
    # newest event weighs 1.0, the 7-day-old one exactly one half-life
    assert rows[1]["decayed_n"] == pytest.approx(1.5, abs=1e-6)
    assert rows[1]["decayed_value"] == pytest.approx(4.0 + 0.5 * 10.0, abs=1e-6)
    assert rows[1]["n_events"] == 2


def test_decayed_counts_null_value_counts_but_adds_zero(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, None)], schema="user_id long, ts timestamp, value double"
    )
    row = decayed_counts(df).collect()[0]
    assert row["decayed_n"] == pytest.approx(1.0, abs=1e-6)
    assert row["decayed_value"] == pytest.approx(0.0, abs=1e-6)


# --- sorted_neighborhood_pairs ---------------------------------------------


def test_snm_finds_window_local_matches_only(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha"),
            (2, "alphb"),  # distance 1 from alpha, adjacent in sort
            (3, "alzzz"),  # same block 'a', far in edit distance
            (4, "beta"),  # different block: never compared to 'a*'
            (5, "betz"),  # distance 1 from beta
        ],
        ["k", "nm"],
    )
    pairs = {
        (r["key_a"], r["key_b"], r["distance"])
        for r in sorted_neighborhood_pairs(
            df, "k", "nm", window=2, max_distance=2
        ).collect()
    }
    assert (1, 2, 1) in pairs
    assert (4, 5, 1) in pairs
    # cross-block pair (a* vs b*) must not appear even when close
    assert all(not (a in (1, 2, 3) and b in (4, 5)) for a, b, _ in pairs)


def test_snm_window_bound_caps_comparisons(spark):
    # 5 identical strings, window=1: only the 4 adjacent pairs emit,
    # never the transitive ones — the O(n·w) contract
    df = spark.createDataFrame([(i, "same") for i in range(5)], ["k", "nm"])
    pairs = sorted_neighborhood_pairs(df, "k", "nm", window=1, max_distance=0)
    got = {(r["key_a"], r["key_b"]) for r in pairs.collect()}
    assert got == {(0, 1), (1, 2), (2, 3), (3, 4)}


# --- pagerank --------------------------------------------------------------


def _rank_sum(rows):
    return sum(r["rank"] for r in rows)


def test_pagerank_uniform_on_symmetric_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    rows = pagerank(edges, iterations=5).collect()
    assert _rank_sum(rows) == pytest.approx(1.0, abs=1e-9)
    for r in rows:
        assert r["rank"] == pytest.approx(1.0 / 3.0, abs=1e-9)


def test_pagerank_dangling_mass_conserved(spark):
    # 'c' has no out-edges: without the dangling fold, total mass
    # leaks each iteration and the ranks stop summing to 1
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"]
    )
    rows = pagerank(edges, iterations=6).collect()
    assert _rank_sum(rows) == pytest.approx(1.0, abs=1e-9)
    ranks = {r["node"]: r["rank"] for r in rows}
    assert ranks["c"] > ranks["b"] > 0  # sink accumulates most mass


def test_pagerank_weighted_edges_shift_mass(spark):
    edges = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        ["src", "dst", "w"],
    )
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges, weight_col="w", iterations=10).collect()
    }
    assert ranks["b"] > ranks["c"]  # 90% of a's vote flows to b


def test_graph_driver_tiers_match_distributed(spark, monkeypatch):
    """The r17 driver tiers must reproduce the distributed loops:
    label propagation bit-exactly (all-integer), pagerank/HITS to well
    under the 6dp emit-rounding grain (per-node float sums accumulate
    in a different order — the same cross-engine envelope the oracle
    contract absorbs). Graphs exercise dangling mass, weights, and
    mode-label ties."""
    import batch_process_dpla_index_spark.operators.graph as gr

    pr_edges = spark.createDataFrame(
        # dangling node d, parallel edge a->b, weights
        [("a", "b", 2.0), ("a", "b", 1.0), ("b", "c", 1.0),
         ("c", "a", 3.0), ("a", "d", 1.0)],
        ["src", "dst", "w"],
    )
    hits_edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")],
        ["src", "dst"],
    )
    lpa_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)],
        "src BIGINT, dst BIGINT",
    )

    def run_all():
        pr = {
            r["node"]: r["rank"]
            for r in gr.pagerank(
                pr_edges, weight_col="w", iterations=6
            ).collect()
        }
        hs = {
            r["node"]: (r["authority"], r["hub"])
            for r in gr.hits_scores(hits_edges, iterations=4).collect()
        }
        lp_df = gr.label_propagation(lpa_edges, iterations=4)
        lp = {r["node"]: r["community"] for r in lp_df.collect()}
        from batch_process_dpla_index_spark.operators.dedup import (
            unpersist_deps,
        )

        unpersist_deps(lp_df)
        return pr, hs, lp

    pr_a, hs_a, lp_a = run_all()
    monkeypatch.setattr(gr, "_GRAPH_DRIVER_MAX_EDGES", 0)
    pr_b, hs_b, lp_b = run_all()
    assert lp_a == lp_b  # integer labels: bit-exact
    assert set(pr_a) == set(pr_b) and set(hs_a) == set(hs_b)
    for k in pr_a:
        assert pr_a[k] == pytest.approx(pr_b[k], abs=1e-12)
    for k in hs_a:
        assert hs_a[k][0] == pytest.approx(hs_b[k][0], abs=1e-12)
        assert hs_a[k][1] == pytest.approx(hs_b[k][1], abs=1e-12)


# --- Misra–Gries heavy hitters ---------------------------------------------


def test_mg_summaries_are_lower_bounds_with_exact_totals(spark):
    items = spark.createDataFrame(
        [("x",)] * 50 + [("y",)] * 30 + [(f"z{i}",) for i in range(40)],
        ["item"],
    ).repartition(4)
    rows = mg_summaries(items, "item", capacity=8).collect()
    sentinel_total = sum(r["lb"] for r in rows if r["item"] is None)
    assert sentinel_total == 120
    merged: dict[str, int] = {}
    for r in rows:
        if r["item"] is not None:
            merged[r["item"]] = merged.get(r["item"], 0) + r["lb"]
    # lower-bound property, and the undercount is within N/(cap+1)
    assert merged.get("x", 0) <= 50
    assert merged.get("y", 0) <= 30
    assert merged.get("x", 0) >= 50 - math.ceil(120 / 9)
    assert merged.get("y", 0) >= 30 - math.ceil(120 / 9)


def test_heavy_hitters_exact_topk_with_proof(spark):
    rows = []
    for i in range(20):
        rows += [(f"hot{i:02d}",)] * (200 - 5 * i)
    rows += [(f"cold{i}",) for i in range(500)]
    items = spark.createDataFrame(rows, ["item"]).repartition(8)
    got = heavy_hitters(items, "item", k=10, capacity=100).collect()
    assert [r["item"] for r in got] == [f"hot{i:02d}" for i in range(10)]
    assert [r["n_exact"] for r in got] == [200 - 5 * i for i in range(10)]
    assert [r["rank"] for r in got] == list(range(1, 11))
    assert all(r["mg_bound_ok"] for r in got)


def test_heavy_hitters_flags_insufficient_capacity(spark):
    # near-uniform domain with capacity far below the distinct count:
    # the k-th exact count can't dominate the MG error bound, so the
    # proof flag must come back False rather than silently lying
    items = spark.createDataFrame(
        [(f"u{i % 400}",) for i in range(1200)], ["item"]
    ).repartition(4)
    got = heavy_hitters(items, "item", k=10, capacity=20).collect()
    assert got and not any(r["mg_bound_ok"] for r in got)


# --- robust_outliers / quantile_bins ---------------------------------------


def test_robust_outliers_flags_only_the_spike(spark):
    from batch_process_dpla_index_spark.operators.profiling import (
        robust_outliers,
    )

    rows = [("a", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 1000]]
    rows += [("b", 5.0), ("b", None)]  # NULL value: excluded entirely
    df = spark.createDataFrame(rows, schema="k string, v double")
    got = {r["k"]: r for r in robust_outliers(df, "k", "v").collect()}
    assert got["a"]["n"] == 8
    assert got["a"]["n_outliers"] == 1  # the 1000 spike, nothing else
    assert got["a"]["med"] == pytest.approx(10.5)
    # group b: single non-null value, MAD 0, no outliers, NULL dropped
    assert got["b"]["n"] == 1
    assert got["b"]["n_outliers"] == 0


def test_robust_outliers_resists_what_zscore_misses(spark):
    # one huge outlier inflates stddev enough that 3-sigma misses a
    # second, smaller outlier; MAD still flags both
    vals = [10.0] * 30 + [11.0] * 30 + [9.0] * 30 + [50.0, 100000.0]
    df = spark.createDataFrame(
        [("a", v) for v in vals], schema="k string, v double"
    )
    from batch_process_dpla_index_spark.operators.profiling import (
        robust_outliers,
    )

    row = robust_outliers(df, "k", "v").collect()[0]
    assert row["n_outliers"] == 2


def test_quantile_bins_equal_frequency(spark):
    from pyspark.sql import functions as F

    from batch_process_dpla_index_spark.operators.profiling import (
        quantile_bins,
    )

    df = spark.range(1000).select((F.col("id") + 1).cast("double").alias("v"))
    rows = quantile_bins(df, "v", n_bins=10).collect()
    assert [r["bin"] for r in rows] == list(range(1, 11))
    # exact deciles over 1..1000: every bin holds ~100 rows (edge ties
    # go down, so counts are exactly 100 each up to interpolation)
    assert all(abs(r["n"] - 100) <= 1 for r in rows)
    assert sum(r["n"] for r in rows) == 1000
    means = [r["mean_value"] for r in rows]
    assert means == sorted(means)  # bins are ordered value ranges


def test_column_profile_bigint_beyond_double_precision(spark):
    # adjacent 64-bit IDs above 2^53 collapse to one double; distinct
    # counting must canonicalize the RAW value, not the double
    df = spark.createDataFrame(
        [(9007199254740993,), (9007199254740994,)], schema="k long"
    )
    row = column_profile(df).collect()[0]
    assert row["n_distinct"] == 2


def test_corr_matrix_rejects_duplicate_columns(spark):
    df = spark.range(5).select(
        F.col("id").cast("double").alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    with pytest.raises(ValueError, match="duplicate column"):
        corr_matrix(df, ["x", "y", "x"])


def test_pagerank_releases_checkpoint_storage(spark, monkeypatch):
    """DataFrame.unpersist is a no-op on checkpointed frames; the
    operator must release its intermediate iteration checkpoints
    itself and hand back a WORKING release handle for the final one.
    Pins the DISTRIBUTED loop (the r17 driver tier persists
    nothing)."""
    import batch_process_dpla_index_spark.operators.graph as gr
    from batch_process_dpla_index_spark.operators.dedup import unpersist_deps

    monkeypatch.setattr(gr, "_GRAPH_DRIVER_MAX_EDGES", 0)
    sc = spark.sparkContext
    before = set(dict(sc._jsc.getPersistentRDDs()))
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    df = pagerank(edges, iterations=4)
    df.collect()
    leaked = set(dict(sc._jsc.getPersistentRDDs())) - before
    assert len(leaked) <= 1  # only the final checkpoint outlives the call
    unpersist_deps(df)
    assert set(dict(sc._jsc.getPersistentRDDs())) - before == set()


def test_connected_components_releases_checkpoint_storage(spark, monkeypatch):
    """Same contract as pagerank: intermediate fixpoint checkpoints
    are released inside the operator, and the survivors' deps carry a
    WORKING handle for the final one. Pins the DISTRIBUTED loop (the
    driver union-find tier persists nothing to release)."""
    import batch_process_dpla_index_spark.operators.dedup as dd
    from batch_process_dpla_index_spark.operators.dedup import (
        connected_components,
        unpersist_deps,
    )

    monkeypatch.setattr(dd, "_CC_DRIVER_MAX_EDGES", 0)
    sc = spark.sparkContext
    before = set(dict(sc._jsc.getPersistentRDDs()))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    labels = connected_components(pairs)
    labels.collect()
    leaked = set(dict(sc._jsc.getPersistentRDDs())) - before
    assert len(leaked) <= 1
    unpersist_deps(labels)
    assert set(dict(sc._jsc.getPersistentRDDs())) - before == set()


def test_profile_cli(spark, tmp_path, capsys):
    """`jobs.py profile` end to end: stdout report and the single-file
    header CSV, exact and approx paths."""
    import csv

    from batch_process_dpla_index_spark import jobs

    src = str(tmp_path / "t.parquet")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("m")
    ).write.parquet(src)

    assert jobs.main(["profile", src]) == 0
    out = capsys.readouterr().out
    assert "k: rows=100 nulls=0 distinct=100" in out
    assert "m: rows=100 nulls=0 distinct=7" in out

    out_csv = str(tmp_path / "prof.csv")
    assert jobs.main(["profile", src, "--out-csv", out_csv, "--approx"]) == 0
    import glob

    parts = glob.glob(out_csv + "/part-*.csv")
    assert len(parts) == 1  # coalesce(1): one part file
    with open(parts[0], newline="", encoding="utf-8") as fh:
        rows = {r["col_name"]: r for r in csv.DictReader(fh)}
    assert set(rows) == {"k", "m"}
    assert abs(int(rows["m"]["n_distinct"]) - 7) <= 1  # HLL tolerance


def test_degenerate_params_fail_loud(spark):
    """Contract-named ValueErrors, not opaque executor/agg errors
    (repo loud-validation convention): quantile_bins with <2 bins,
    heavy_hitters/mg_summaries with non-positive k/capacity, pagerank
    on an empty edge list."""
    import pytest

    from batch_process_dpla_index_spark.operators.graph import pagerank
    from batch_process_dpla_index_spark.operators.profiling import quantile_bins
    from batch_process_dpla_index_spark.operators.sketches import (
        heavy_hitters,
        mg_summaries,
    )

    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="n_bins"):
        quantile_bins(df, "v", n_bins=1)
    with pytest.raises(ValueError, match="capacity"):
        mg_summaries(df, "v", capacity=0)
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "v", k=0)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "v", capacity=-1)
    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(empty, "src", "dst")


def test_multipass_snm_recovers_leading_char_typos(spark):
    """A first-character typo pair lands in different blocks, so the
    forward pass cannot see it BY CONSTRUCTION; the reversed second
    pass recovers it (the multi-pass recall story the linkage module
    docstring documents)."""
    from batch_process_dpla_index_spark.operators.linkage import (
        multipass_snm_pairs,
        sorted_neighborhood_pairs,
    )

    rows = [
        ("a", "hello world"),
        ("b", "jello world"),   # leading-char typo of 'a'
        ("c", "hello worlds"),  # same-block near-dup of 'a'
        ("d", "zzz unrelated"),
    ]
    df = spark.createDataFrame(rows, ["k", "t"])
    fwd = {
        (r["key_a"], r["key_b"])
        for r in sorted_neighborhood_pairs(df, "k", "t", 3, 3).collect()
    }
    multi = {
        (r["key_a"], r["key_b"])
        for r in multipass_snm_pairs(df, "k", "t", 3, 3).collect()
    }
    assert ("a", "c") in fwd and ("a", "b") not in fwd
    assert {("a", "b"), ("a", "c")} <= multi
    assert not any("d" in p for p in multi)
    # distances survive the canonicalize+dedup fold
    d = {(r["key_a"], r["key_b"]): r["distance"]
         for r in multipass_snm_pairs(df, "k", "t", 3, 3).collect()}
    assert d[("a", "b")] == 1 and d[("a", "c")] == 1


def test_skipgram_cooc_counts(spark):
    """Known-answer skip-gram counts: unordered pairs within max_skip,
    self-pairs dropped, multiplicity kept, min_count floor applied."""
    from batch_process_dpla_index_spark.operators.analytics import skipgram_cooc

    df = spark.createDataFrame(
        [("a b c a",), ("x y",), ("",), ("solo",)], ["text"]
    )
    got = {
        (r["w_a"], r["w_b"]): r["n_cooc"]
        for r in skipgram_cooc(
            df, F.split(F.col("text"), " "), max_skip=4, min_count=1
        ).collect()
    }
    # 'a b c a': ab,ac,(aa drop),bc,ba,ca -> ab:2 ac:2 bc:1; 'x y' -> xy:1
    assert got == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 1, ("x", "y"): 1}
    floored = {
        (r["w_a"], r["w_b"])
        for r in skipgram_cooc(
            df, F.split(F.col("text"), " "), max_skip=4, min_count=2
        ).collect()
    }
    assert floored == {("a", "b"), ("a", "c")}


def test_benford_profile_closed_form(spark):
    from pyspark.sql import functions as F

    from batch_process_dpla_index_spark.operators.profiling import (
        benford_profile,
    )

    # 2 values leading with 1, 1 with 2; zero/negative/NULL dropped
    df = spark.createDataFrame(
        [(123.45,), (1999.99,), (25.0,), (0.0,), (-500.0,), (None,)],
        "v double",
    )
    rows = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n"] == 2 and rows[2]["n"] == 1
    assert rows[1]["observed_p"] == round(2 / 3, 6)
    import math

    assert rows[1]["benford_p"] == round(math.log10(2.0), 6)


def test_benford_profile_digit_is_scale_invariant(spark):
    from batch_process_dpla_index_spark.operators.profiling import (
        benford_profile,
    )

    # same leading digit whether the amount is 9.99 or 999.0 — the
    # cent-grid snap must not shift the first significant digit
    df = spark.createDataFrame([(9.99,), (999.0,), (0.09,)], "v double")
    rows = {r["digit"]: r["n"] for r in benford_profile(df, "v").collect()}
    assert rows == {9: 3}


def test_winsorized_stats_clamps_outlier(spark):
    from batch_process_dpla_index_spark.operators.profiling import (
        winsorized_stats,
    )

    vals = [float(x) for x in range(1, 20)] + [10_000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    row = winsorized_stats(df, "k", "v", lo=0.05, hi=0.95).collect()[0]
    assert row["n"] == 20
    # the 10k outlier is clamped to the interpolated p95 (~518 for
    # this 20-value set), so the winsorized mean falls back toward
    # the bulk while the raw mean is dragged up ~500
    assert row["mean_raw"] > 500
    assert row["mean_winsor"] < 40
    assert row["sd_winsor"] < row["sd_raw"]
    assert row["p_lo"] <= row["p_hi"]


def test_benford_profile_sub_cent_values_never_divide_by_zero(spark):
    from batch_process_dpla_index_spark.operators.profiling import (
        benford_profile,
    )

    # 0.004 snaps to 0 cents — it must be DROPPED, not become digit 0
    # (whose benford_p would be 1/0, job-aborting under ANSI)
    df = spark.createDataFrame([(0.004,), (0.3,), (123.0,)], "v double")
    rows = {r["digit"]: r["n"] for r in benford_profile(df, "v").collect()}
    assert rows == {1: 1, 3: 1}


def test_embedding_dim_profile_closed_form(spark):
    from batch_process_dpla_index_spark.operators.profiling import (
        embedding_dim_profile,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 10.0]), (2, [3.0, 10.0]), (3, None)],
        "vec_id bigint, embedding array<float>",
    )
    rows = {r["pos"]: r for r in embedding_dim_profile(df, "embedding").collect()}
    assert set(rows) == {0, 1}           # NULL vector contributes nothing
    assert rows[0]["n"] == 2 and rows[0]["mean_v"] == 2.0
    assert rows[0]["sd_v"] == 1.0        # population stddev of {1,3}
    assert (rows[0]["min_v"], rows[0]["max_v"]) == (1.0, 3.0)
    assert rows[1]["sd_v"] == 0.0        # dead dimension shows up as sd 0


def test_gini_concentration_hand_values(spark):
    """Perfect equality scores 0; one giant among zeros scores
    2 - (n+1)/n (the sorted-rank identity, hand-checked); an all-zero
    group pins to 0.0."""
    from batch_process_dpla_index_spark.operators.profiling import (
        gini_concentration,
    )

    rows = [
        ("eq", 1, 5), ("eq", 2, 5), ("eq", 3, 5),
        ("skew", 4, 0), ("skew", 5, 0), ("skew", 6, 10),
        ("zero", 7, 0), ("zero", 8, 0),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, n_chars bigint")
    got = {r.source: r for r in gini_concentration(df).collect()}
    assert got["eq"].gini == 0.0 and got["eq"].sum_value == 15
    # si = 3*10 = 30; 2*30/(3*10) - 4/3 = 0.666667
    assert got["skew"].gini == 0.666667
    assert got["zero"].gini == 0.0 and got["zero"].sum_value == 0
