"""Dataset profiling: per-column statistics and numeric correlation.

The reference ships a schema-introspection helper (SchemaTest,
reference entry points traced in SURVEY.md §3) that answers "what
columns exist"; a warehouse also needs "what is IN them". These
operators produce the datasheet numbers — null rates, cardinalities,
bounds, pairwise correlations — that gate ingest and feed the dataset
card (`products/dataset_card.py`).

Scale design (100 TB):

- ``column_profile`` canonicalizes every profiled column into ONE long
  (col_name, value_num, value_str, is_null) frame via an inline
  array-of-structs explode — no per-column scan, no driver loop over
  ``.collect()``; the table is read once, the explode is a
  partition-local map, and the single shuffle is the (col_name) agg.
  Exact ``count(DISTINCT …)`` is the verifiable default; the 100 TB
  escape hatch is ``exact_distinct=False``, which swaps in
  ``approx_count_distinct`` (HLL, one pass, no distinct expand) —
  the same sketch-vs-exact trade documented for approx_distinct_users.
- ``corr_matrix`` computes all pairwise Pearson correlations in ONE
  aggregate pass over the table (k·(k-1)/2 corr expressions share a
  single scan; Catalyst evaluates them in the same partial-aggregate),
  then unpivots the 1-row result driver-side — the matrix is k², a
  constant, so the reshape never touches executors.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def column_profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str).

    Every column is canonicalized to a (value_num, value_str) pair —
    numerics keep their double value (bounds emitted rounded 6),
    strings keep the raw value, timestamps are formatted as ISO
    microsecond strings (lexicographic order == time order, so min/max
    stay meaningful). Distinct counts are over the canonical value and
    exclude NULLs.

    One table scan; the explode is map-side; one shuffle keyed by
    col_name. ``exact_distinct=False`` switches to
    ``approx_count_distinct`` for the 100 TB case where the exact
    distinct expand (2 aggregate phases per distinct column) is the
    dominant cost.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    fields = {f.name: f.dataType for f in df.schema.fields}
    structs = []
    for c in cols:
        dt = fields[c]
        if isinstance(dt, _NUMERIC):
            num = F.col(c).cast("double")
            s = F.lit(None).cast("string")
            # distinct counts canonicalize the RAW value's string form,
            # not the double: bigint IDs beyond 2^53 are distinct longs
            # that collapse to one double, and the oracle counts
            # DISTINCT over the raw column
            canon = F.col(c).cast("string")
        elif isinstance(dt, (T.TimestampType, T.DateType)):
            num = F.lit(None).cast("double")
            # ISO with full microseconds: lexicographic == chronological,
            # and distinct-over-canonical stays exact (a seconds-level
            # format would collapse sub-second-distinct timestamps)
            s = F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            canon = s
        else:
            num = F.lit(None).cast("double")
            s = F.col(c).cast("string")
            canon = s
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                num.alias("value_num"),
                s.alias("value_str"),
                canon.alias("canon"),
                F.col(c).isNull().alias("is_null"),
            )
        )
    long = df.select(F.explode(F.array(*structs)).alias("v")).select("v.*")
    n_distinct = (
        F.count_distinct(F.col("canon"))
        if exact_distinct
        else F.approx_count_distinct(F.col("canon"))
    )
    return (
        long.groupBy("col_name")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("is_null").cast("long")).alias("n_nulls"),
            n_distinct.alias("n_distinct"),
            F.round(F.min("value_num"), 6).alias("min_num"),
            F.round(F.max("value_num"), 6).alias("max_num"),
            F.min("value_str").alias("min_str"),
            F.max("value_str").alias("max_str"),
        )
        .orderBy("col_name")
    )


def corr_matrix(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """All pairwise Pearson correlations of ``columns`` in one
    aggregate pass: (col_a, col_b, corr) for a < b (column order as
    given), corr rounded 6.

    The k·(k-1)/2 ``corr`` expressions share one scan and one
    partial-aggregate — no per-pair jobs, no VectorAssembler detour.
    The 1×k² result is reshaped with a driver-side unpivot (stack over
    a one-row frame), which is free.
    """
    cols = list(columns)
    if len(set(cols)) != len(cols):
        raise ValueError(f"corr_matrix: duplicate column names in {cols}")
    aggs = []
    pairs = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols[i + 1:], i + 1):
            alias = f"__corr_{i}_{j}"
            aggs.append(F.round(F.corr(a, b), 6).alias(alias))
            pairs.append((a, b, alias))
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{a}', '{b}', {alias}" for a, b, alias in pairs
    )
    return wide.select(
        F.expr(
            f"stack({len(pairs)}, {stack_expr}) AS (col_a, col_b, corr)"
        )
    ).orderBy("col_a", "col_b")


def robust_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier summary via median/MAD (the
    median-absolute-deviation rule: |x − med| > k·1.4826·MAD), the
    resistant alternative to z-scores when the metric itself has
    outliers — a mean/stddev gate moves with the outliers it is
    trying to catch; the median does not.

    Returns (key, n, med, mad, n_outliers) rounded 6, ordered by key.

    Plan: exact ``percentile`` needs the group's values together, so
    this is the honest two-round shape — groupBy(key) median,
    broadcast the |keys|-row stats back, groupBy(key) MAD, broadcast
    again, one final count aggregate. Three hash exchanges of the
    CORPUS at most (the stats frames are |keys| rows and broadcast);
    for the approximate-at-scale variant swap ``percentile`` for
    ``approx_percentile`` and lose cross-engine exactness, not shape.
    """
    from batch_process_dpla_index_spark.operators.dedup import _with_cached_deps

    # both the filtered base and the deviation frame feed two subtrees
    # each (median + deviations; MAD + flags) — persist per the repo's
    # consumed-twice discipline, released by the caller's
    # unpersist_deps. Project to the two live columns FIRST: a cache
    # materializes its plan's full output (pruning does not reach
    # through InMemoryRelation), and pinning every column of a 100 TB
    # table to save a two-column re-scan is the wrong trade
    base = (
        df.select(key_col, value_col)
        .where(F.col(value_col).isNotNull())
        .persist()
    )
    med = base.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = (
        base.join(F.broadcast(med), key_col)
        .withColumn("__adev", F.abs(F.col(value_col) - F.col("med")))
        .persist()
    )
    mad = dev.groupBy(key_col).agg(
        F.expr("percentile(__adev, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), key_col).withColumn(
        "__is_out",
        (F.col("__adev") > F.lit(k) * F.lit(1.4826) * F.col("mad")).cast("long"),
    )
    out = (
        flagged.groupBy(key_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum("__is_out").alias("n_outliers"),
        )
        .orderBy(key_col)
    )
    return _with_cached_deps(out, [base, dev])


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Equal-frequency discretization: exact decile (or n-bin)
    boundaries from ONE percentile aggregate, then per-bin occupancy
    and means — the feature-binning profile (and the monotone-edge
    histogram `price_histogram`'s equal-width twin).

    A global ``ntile`` window would funnel the corpus through one
    partition; this is the scale-safe shape — one aggregate produces
    the n_bins−1 boundaries, they fold into the row expression as a
    broadcast 1-row frame, and ONE groupBy(bin) aggregates. Bin b
    holds rows with value > edge[b-1] and <= edge[b] (NULLs dropped);
    ties on an edge go DOWN, mirroring the oracle exactly.

    The source is deliberately scanned TWICE (edge pass + binning
    pass) rather than persisted: both scans prune to the one value
    column, and caching the corpus to save a pruned columnar re-read
    is the worse trade at 100 TB (pinned in test_plans).

    Returns (bin, n, mean_value) rounded 6 for bins 1..n_bins.
    """
    if n_bins < 2:
        raise ValueError(f"quantile_bins: n_bins must be >= 2, got {n_bins}")
    ps = [i / n_bins for i in range(1, n_bins)]
    # ONE array-argument percentile, not n_bins-1 scalar aggregates:
    # each exact-percentile expression buffers the whole column in its
    # own counts map, so the scalar form paid (n_bins-1)× the
    # aggregation state and merge work for identical results — every
    # element interpolates from the same sorted buffer with the same
    # arithmetic as its scalar twin (r17, guide §1.2; measured 3.6 s →
    # sub-second warm at sf0.1). The post-agg select keeps the 1-row
    # (__e0..__eN) shape the broadcast fold below expects.
    edges = df.agg(
        F.expr(
            f"percentile({value_col}, "
            f"array({', '.join(repr(p) for p in ps)}))"
        ).alias("__es")
    ).select(
        *[F.col("__es")[i].alias(f"__e{i}") for i in range(len(ps))]
    )
    bin_expr = F.lit(1)
    for i in range(len(ps)):
        bin_expr = bin_expr + (F.col(value_col) > F.col(f"__e{i}")).cast("int")
    return (
        df.where(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(edges))
        .select(bin_expr.alias("bin"), F.col(value_col).alias("__v"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("__v"), 6).alias("mean_value"),
        )
        .orderBy("bin")
    )


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic synthetic/fabricated-numeric-data screen (a generated or
    tampered amount column drifts from log10(1 + 1/d); organic
    multi-scale amounts follow it).

    Digit extraction is engine-portable by construction: the value is
    snapped to an exact cent grid (``round(x·100)`` as BIGINT) and the
    leading digit read from the integer's decimal string — the leading
    significant digit is invariant under ×100, and bigint→string never
    goes scientific, unlike double→string. A float ``log10``-based
    digit would disagree across engines at powers of ten.

    Plan: one partial+final hash aggregate to 9 digit rows; the total
    for the observed shares re-aggregates THAT 9-row frame (a second
    corpus scan for a COUNT would be the wrong trade). Returns
    (digit, n, observed_p, benford_p, abs_dev) ordered by digit.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        df.where(F.col(value_col).isNotNull())
        # gate on the SNAPPED grid, not the raw value: a positive
        # amount below half a cent rounds to 0 cents, whose 'digit' 0
        # would put 1/0 into benford_p (job-aborting under ANSI)
        .where(cents >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("__total"))
    benford_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("observed_p"),
            F.round(benford_p, 6).alias("benford_p"),
            F.round(
                F.abs(F.col("n") / F.col("__total") - benford_p), 6
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


def winsorized_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorized moments: exact lo/hi percentiles, then the
    mean/stddev of the CLAMPED values next to the raw ones — the
    outlier-robust summary feeding reward/quality-score normalization
    (a handful of runaway values otherwise own the z-scale).

    Plan shape mirrors ``robust_outliers``: one groupBy(key) percentile
    aggregate produces the |keys|-row bounds frame, it broadcasts back
    (groups are bounded by the key domain, never data-proportional),
    and ONE final aggregate computes raw and winsorized moments
    together — two corpus exchanges total, both map-side-combined.
    Population stddev on purpose: its one-pass parity across engines
    is proven (value_percentiles); price-scale outputs round 2.
    """
    base = df.select(key_col, value_col).where(F.col(value_col).isNotNull())
    # one array-argument percentile per group, not two scalar
    # aggregates — halves the per-group value buffers for identical
    # bounds (the quantile_bins rationale)
    bounds = base.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, array({lo!r}, {hi!r}))").alias(
            "__b"
        )
    ).select(
        key_col,
        F.col("__b")[0].alias("__lo"),
        F.col("__b")[1].alias("__hi"),
    )
    clamped = base.join(F.broadcast(bounds), key_col).withColumn(
        "__w",
        F.greatest(F.least(F.col(value_col), F.col("__hi")), F.col("__lo")),
    )
    return (
        clamped.groupBy(key_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("__lo"), 2).alias("p_lo"),
            F.round(F.first("__hi"), 2).alias("p_hi"),
            F.round(F.avg(value_col), 2).alias("mean_raw"),
            F.round(F.avg("__w"), 2).alias("mean_winsor"),
            F.round(F.stddev_pop(value_col), 2).alias("sd_raw"),
            F.round(F.stddev_pop("__w"), 2).alias("sd_winsor"),
        )
        .orderBy(key_col)
    )


def embedding_dim_profile(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension statistics of an embedding column: n, mean,
    stddev, min, max for every vector position — the datasheet for a
    vector corpus (a collapsed dimension, a scale-drifted batch, or a
    dead ReLU channel shows up here before it poisons ANN recall).

    One posexplode (a narrow per-row expansion, dim rows per vector)
    and ONE hash aggregate keyed by position — the aggregate output is
    |dim| rows regardless of corpus size. Floats widen to double
    before the moments so both engines accumulate in the same type.
    """
    ex = df.where(F.col(vec_col).isNotNull()).select(
        F.posexplode(vec_col).alias("pos", "__v")
    )
    return (
        ex.select("pos", F.col("__v").cast("double").alias("__v"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("__v"), 6).alias("mean_v"),
            F.round(F.stddev_pop("__v"), 6).alias("sd_v"),
            F.round(F.min("__v"), 6).alias("min_v"),
            F.round(F.max("__v"), 6).alias("max_v"),
        )
        .orderBy("pos")
    )


def gini_concentration(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """(group, n_rows, sum_value, gini): per-group Gini coefficient of
    ``value_col`` via the sorted-rank identity
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n — the concentration diagnostic a
    mixing pipeline reads per source (is one domain's length budget
    dominated by a few giant documents?).

    Everything before the final expression is INTEGER-exact: ranks
    come from one per-group window over the (value, tiebreak) total
    order and both Σ are BIGINT sums, so the only float work is two
    divides and one subtract on exact integers — deterministic
    cross-engine with no association to pin. One shuffle (the group
    window; the aggregate reuses its partitioning). All-zero or empty
    groups pin gini to 0.0.

    NULL ``value_col`` rows are dropped BEFORE ranking: a NULL length
    carries no budget but would inflate n in the identity, and the two
    engines default to opposite NULL sort ends (Spark NULLS FIRST,
    DuckDB NULLS LAST) so real values would get different ranks. The
    tiebreak order is pinned NULLS FIRST on both sides for the same
    reason."""
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("x").asc(), F.col(tiebreak_col).asc_nulls_first())
    )
    ranked = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("bigint").alias("x"),
        F.col(tiebreak_col),
    ).withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("grp")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("x").alias("sum_value"),
            F.sum(F.col("rk") * F.col("x")).alias("__si"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_rows",
            "sum_value",
            F.when(
                F.col("sum_value") > 0,
                F.round(
                    2.0 * F.col("__si")
                    / (F.col("n_rows") * F.col("sum_value"))
                    - (F.col("n_rows") + 1.0) / F.col("n_rows"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("gini"),
        )
    )


def _bucket_capped_counts(
    counts: DataFrame,
    key_col: str | list[str],
    n_buckets: int,
    out_col: str,
    with_width: bool = False,
):
    """THE one min/max equal-width bucket cap shared by every drift
    monitor (r16 review: three hand-synchronized copies is how the
    "shared bucket rule" guarantee silently breaks). Input: a
    (key_col, x, c) counts frame with BIGINT x. width =
    ceil(span/n_buckets), span = xmax − xmin + 1, computed
    int64-exactly as (xmax − xmin + n_buckets) div n_buckets; x ≥ xmin
    so div == floor. Returns (bucketed, raw) where ``bucketed`` is the
    (key_col, out_col, c) re-aggregate and ``raw`` is the PERSISTED
    input (two consumers: min/max + rebucket) whose handle the caller
    must ride in ``_cached_deps``."""
    c0 = counts.persist()
    nb = int(n_buckets)
    # (with_width=True additionally carries the shared grid width as a
    # constant ``w`` column — the transport metrics need it to convert
    # bucket distance back to value units; the KS/PSI monitors don't)
    # loud span guard (r16 ADVICE): the width expression below needs
    # xmax - xmin + nb to fit int64; under non-ANSI arithmetic a
    # sentinel-extreme pair (e.g. Long.MIN/MAX) would silently WRAP it
    # and every bucket — and the KS/PSI built on them — would be wrong
    # with no error. Checked overflow-free on the 1-row min/max frame:
    # span can only exceed 2^63-1-nb when xmin <= nb (else
    # xmax - xmin < 2^63-1-nb already), and in that branch
    # (2^63-1-nb) + xmin itself cannot overflow.
    _maxl = (1 << 63) - 1
    mm = F.broadcast(
        c0.agg(F.min("x").alias("xmin"), F.max("x").alias("xmax")).select(
            F.when(
                (F.col("xmin") <= F.lit(nb))
                & (F.col("xmax") > F.lit(_maxl - nb) + F.col("xmin")),
                F.raise_error(
                    F.lit(
                        "_bucket_capped_counts: value span exceeds "
                        f"2^63-1-{nb}; equal-width bucketing would wrap "
                        "int64 — refuse rather than drift silently"
                    )
                ).cast("bigint"),
            )
            .otherwise(F.col("xmin"))
            .alias("xmin"),
            "xmax",
        )
    )
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    bucket = F.expr(f"(x - xmin) div ((xmax - xmin + {nb}) div {nb})")
    width = F.expr(f"(xmax - xmin + {nb}) div {nb}")
    cols = [*keys, bucket.cast("bigint").alias(out_col), "c"]
    if with_width:
        cols.append(width.cast("bigint").alias("w"))
    aggs = [F.sum("c").alias("c")]
    if with_width:
        aggs.append(F.max("w").alias("w"))
    cb = (
        c0.crossJoin(mm)
        .select(*cols)
        .groupBy(*keys, out_col)
        .agg(*aggs)
    )
    return cb, c0


def day_floor_counts(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """The ONE corpus-proportional (day, x, c) RAW-floor count every
    temporal drift monitor starts from — build it once and feed
    several ``*_from_counts`` cores (the dataset card's shape) instead
    of paying the scan+shuffle per monitor."""
    return df.where(F.col(value_col).isNotNull()).groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("day"),
        F.floor(F.col(value_col)).cast("bigint").alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))


def group_floor_counts(
    df: DataFrame, group_col: str = "source", value_col: str = "n_chars"
) -> DataFrame:
    """The source-axis twin of :func:`day_floor_counts`: one
    (group, x, c) RAW-floor count feeding the ``source_*_from_counts``
    cores."""
    return df.where(F.col(value_col).isNotNull()).groupBy(
        F.col(group_col).alias(group_col),
        F.floor(F.col(value_col)).cast("bigint").alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))


def _dense_key_grid(cb, key_col: str | list[str], n_col: str):
    """THE dense (key × observed-bucket) grid every bucketed drift
    monitor builds off a `_bucket_capped_counts` re-aggregate (r17
    review: the PSI/W1 twins had grown five hand-synchronized copies
    of this scaffolding — the same silent-drift hazard the r16 bucket
    cap refactor removed). Per-key totals (broadcast), global observed
    bucket set, left-join + zero-fill: returns (key_col..., b, n_col,
    c_cur) with every observed key carrying every observed bucket.
    ``key_col`` may be a composite (list) key — the drift-attribution
    monitors key on (segment, day)."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    g = cb.groupBy(*keys).agg(F.sum("c").alias(n_col))
    bs = cb.select("b").distinct()
    return (
        bs.crossJoin(F.broadcast(g))
        .join(cb.select(*keys, "b", "c"), [*keys, "b"], "left")
        .select(
            *keys,
            "b",
            n_col,
            F.coalesce(F.col("c"), F.lit(0)).alias("c_cur"),
        )
    )


#: bucket-ordered sorted-fold pair shared by the PSI/W1 monitors: the
#: per-key term list is collected WITH its bucket id, sorted, and
#: left-folded so both engines add identical doubles in identical
#: order (the adamic_adar float-association discipline)
def _terms_agg():
    return F.sort_array(
        F.collect_list(F.struct("b", F.col("__term").alias("t")))
    ).alias("__terms")


def _fold_terms():
    return F.aggregate(
        F.col("__terms"), F.lit(0.0), lambda acc, s: acc + s["t"]
    )


def source_drift_ks(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    n_buckets: int = 8192,
) -> DataFrame:
    """(group, n_rows, ks_stat): two-sample Kolmogorov–Smirnov distance
    between each group's ``value_col`` distribution and the REST of the
    corpus — the distribution-drift monitor a training-data pipeline
    runs per ingest source (a crawler that silently started returning
    truncated pages moves its length ECDF long before quality scores
    notice).

    Everything up to the final divide is INTEGER-exact: the per-group
    and global ECDFs are cumulative BIGINT counts over the dense
    (group × bucket) grid, and the KS sup-difference is taken over the
    common-denominator integer numerator
    |cum_g·(N−n_g) − (cum_all−cum_g)·n_g| — one double division per
    group at the very end, deterministic cross-engine with no float
    association to pin. Requires N < ~3e9 so the cross products stay
    in int64.

    The grid is CAPPED at ``n_buckets`` equal-width integer buckets
    (r16, VERDICT r15 #2): bucket = (x − xmin) div width with
    width = ceil(span / n_buckets), span = xmax − xmin + 1, computed
    integer-exactly as (xmax − xmin + n_buckets) div n_buckets — so
    the grid never grows with distinct raw values, and every window
    frame is bounded by construction (per-group cumulative ≤ n_buckets
    rows; per-bucket global sum = |groups| rows). Range precondition:
    xmax − xmin < 2^63 − n_buckets (sentinel-extreme values spanning
    most of int64 would wrap the width expression; real value domains
    are nowhere near). When span ≤ n_buckets the width is 1
    and the statistic equals the exact distinct-value KS; wider spans
    evaluate the same sup at bucket right-edges (grid resolution, not
    approximation — the ECDF counts stay exact). The global cumulative
    needs NO unpartitioned window: over the dense grid,
    cum_all(b) = Σ_groups cum_g(grp, b), a bucket-partitioned window —
    zero single-partition WindowExec in the plan (pinned by
    tests/test_plans.py).

    Scale: ONE corpus-proportional shuffle — the (group, value) count;
    the bucketed re-aggregate ``cb`` (≤ |groups|·n_buckets rows) is
    PERSISTED so its four consumers (group totals, bucket list, grid
    join, grand total) read the grid-sized aggregate instead of
    re-scanning the corpus (the first cut's plan had four parquet
    scans). The persist handle rides in ``_cached_deps`` — release
    with ``dedup.unpersist_deps`` after the action. Groups covering
    the whole corpus (n_g = N) emit NULL KS — there is no "rest" to
    drift from."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
    )

    c = df.where(F.col(value_col).isNotNull()).groupBy(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("bigint").alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cb, c = _bucket_capped_counts(c, "grp", n_buckets, "b")
    cb = cb.persist()
    g = cb.groupBy("grp").agg(F.sum("c").alias("n_g"))
    bs = cb.select("b").distinct()
    n_total = F.broadcast(cb.agg(F.sum("c").alias("n_total")))
    grid = bs.crossJoin(F.broadcast(g))
    w_grp = (
        Window.partitionBy("grp")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        grid.join(cb, ["grp", "b"], "left")
        .select(
            "grp",
            "n_g",
            "b",
            F.sum(F.coalesce(F.col("c"), F.lit(0)))
            .over(w_grp)
            .alias("cum_g"),
        )
        .withColumn(
            # dense grid ⇒ the global ECDF is the column sum of the
            # per-group ECDFs at each bucket — no global-order window
            "cum_all",
            F.sum("cum_g").over(Window.partitionBy("b")),
        )
        .crossJoin(n_total)
    )
    num = F.abs(
        F.col("cum_g") * (F.col("n_total") - F.col("n_g"))
        - (F.col("cum_all") - F.col("cum_g")) * F.col("n_g")
    )
    out = (
        cum.groupBy("grp", "n_g", "n_total")
        .agg(F.max(num).alias("__num"))
        .select(
            F.col("grp").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_rows"),
            F.when(
                F.col("n_g") < F.col("n_total"),
                F.round(
                    F.col("__num").cast("double")
                    / (
                        F.col("n_g") * (F.col("n_total") - F.col("n_g"))
                    ).cast("double"),
                    6,
                ),
            ).alias("ks_stat"),
        )
        .orderBy(group_col)
    )
    return _with_cached_deps(out, [c, cb])


def embedding_centroid_drift(
    df: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """(label, n_vecs, cos_to_global, drift): per-label embedding
    centroid and its cosine against the GLOBAL centroid — the vector
    twin of `source_drift_ks` (an encoder change or a poisoned batch
    shifts a label's centroid away from the corpus before ANN recall
    visibly degrades; 1 − cos is the drift score).

    ONE corpus pass: the (label, pos) sums/counts aggregate is the
    only corpus-proportional work, PERSISTED at |labels|·dim rows; the
    global centroid derives from those sums (sum-of-label-sums), never
    a second scan. Portability: per-cell and global means are ROUNDED
    to 6 dp before the cosine on BOTH engines, with the oracle
    replaying the same label-first summation shape — the remaining
    within-group order sensitivity is last-ulp and absorbed by the
    rounds (the embedding_dim_profile precedent). Release the persist
    handle with ``dedup.unpersist_deps`` after the action."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
    )

    ex = df.where(F.col(vec_col).isNotNull()).select(
        F.col(label_col).alias("lbl"),
        F.posexplode(vec_col).alias("pos", "__v"),
    ).select("lbl", "pos", F.col("__v").cast("double").alias("v"))
    sums = ex.groupBy("lbl", "pos").agg(
        F.sum("v").alias("s_lp"),
        F.count(F.lit(1)).cast("bigint").alias("n_lp"),
    ).persist()
    per_label = sums.select(
        "lbl",
        "pos",
        "n_lp",
        F.round(F.col("s_lp") / F.col("n_lp"), 6).alias("m_lp"),
    )
    global_mean = sums.groupBy("pos").agg(
        F.round(F.sum("s_lp") / F.sum("n_lp"), 6).alias("m_gp")
    )
    j = per_label.join(F.broadcast(global_mean), "pos")
    cos = F.col("__dot") / F.sqrt(F.col("__nl") * F.col("__ng"))
    out = (
        j.groupBy("lbl")
        .agg(
            F.max("n_lp").alias("n_vecs"),
            F.sum(F.col("m_lp") * F.col("m_gp")).alias("__dot"),
            F.sum(F.col("m_lp") * F.col("m_lp")).alias("__nl"),
            F.sum(F.col("m_gp") * F.col("m_gp")).alias("__ng"),
        )
        .select(
            F.col("lbl").alias(label_col),
            F.col("n_vecs"),
            F.round(cos, 6).alias("cos_to_global"),
            F.round(F.lit(1.0) - cos, 6).alias("drift"),
        )
        .orderBy(label_col)
    )
    return _with_cached_deps(out, [sums])


def temporal_drift_ks(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    n_buckets: int = 8192,
) -> DataFrame:
    """(day, n_rows, n_prev, ks_stat): day-over-day two-sample KS
    distance of the ``value_col`` distribution — the temporal twin of
    :func:`source_drift_ks` (a pipeline pushing daily batches watches
    THIS number; a collector change shows up as one spiked day).

    Values are floored to BIGINT and the grid is CAPPED at
    ``n_buckets`` equal-width integer buckets exactly as in
    :func:`source_drift_ks` (r16: (x − xmin) div ceil(span/n_buckets),
    pure int64 — width 1, i.e. the exact distinct-floor grid, whenever
    the span fits), so per-day window frames are bounded by
    construction and never grow with distinct raw values. The ECDF
    comparison then follows the source_drift_ks discipline:
    cumulative BIGINT counts over the dense (day × bucket) grid, sup
    over the common-denominator integer numerator
    |cum_d·n_prev − cum_prev·n_d|, ONE double divide per day. The
    previous day comes from a LAG over the dense grid (partitioned by
    bucket, ordered by day) with an exact day-adjacency check — never
    a self-join, which would recompute the grid twice (the first cut;
    2.6 s of stage overhead at sf0.001). A day with no predecessor
    (the first day, or the day after a gap) emits NULL.

    Scale: one corpus-proportional shuffle (the (day, bucket) count,
    persisted — ride ``_cached_deps``, release with
    ``dedup.unpersist_deps``); the grid is |days|·|buckets| metadata.
    Int64 bound: n_day·n_prev < 2^63 holds for any day under ~3e9
    rows."""
    c0 = df.where(F.col(value_col).isNotNull()).groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("day"),
        F.floor(F.col(value_col)).cast("bigint").alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return temporal_drift_ks_from_counts(c0, n_buckets)


def temporal_drift_ks_from_counts(
    counts: DataFrame, n_buckets: int = 8192
) -> DataFrame:
    """Bucket cap + KS core over a prepared (day, x, c) RAW-floor
    counts frame — THE one path shared by :func:`temporal_drift_ks`
    and the streaming twin's drained window counts
    (``streaming/windows.py:streaming_value_counts``), so stream and
    batch agree bit-for-bit at ANY value span. Feeding
    :func:`ks_drift_from_counts` directly would diverge from the batch
    operator once the floor span exceeds ``n_buckets`` (r16 review
    finding) — the re-bucket must be replayed over drained counts too.

    The bucket rule is :func:`source_drift_ks`'s: width =
    ceil(span / n_buckets) with span = xmax − xmin + 1, computed
    int64-exactly as (xmax − xmin + n_buckets) div n_buckets; width
    is 1 (identity grid, up to a constant shift that the KS statistic
    is invariant to) whenever span ≤ n_buckets. Requires
    xmax − xmin < 2^63 − n_buckets (sentinel-extreme values would wrap
    the span; real metric domains are nowhere near). The raw counts
    frame is persisted (min/max + rebucket consumers); handles ride
    ``_cached_deps``."""
    c, c0 = _bucket_capped_counts(counts, "day", n_buckets, "x")
    out = ks_drift_from_counts(c)
    out._cached_deps = [c0] + list(out._cached_deps)
    return out


def ks_drift_from_counts(counts: DataFrame) -> DataFrame:
    """The day-over-day KS core over a prepared (day, x, c)
    BUCKETED-counts frame. Callers holding raw floor counts (the batch
    operator, the streaming twin's drained windows) must go through
    :func:`temporal_drift_ks_from_counts`, which replays the shared
    bucket cap first — this core assumes its grid is already bounded.
    The counts frame is persisted here (three consumers); release via
    ``_cached_deps``/``unpersist_deps``."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
    )

    c = counts.persist()
    g = c.groupBy("day").agg(F.sum("c").alias("n_day"))
    xs = c.select("x").distinct()
    grid = xs.crossJoin(F.broadcast(g))
    w_day = (
        Window.partitionBy("day")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.join(c, ["day", "x"], "left").select(
        "day",
        "n_day",
        "x",
        F.sum(F.coalesce(F.col("c"), F.lit(0))).over(w_day).alias("cum_d"),
    )
    w_x = Window.partitionBy("x").orderBy("day")
    adjacent = F.lag("day").over(w_x) == F.col("day") - F.expr(
        "INTERVAL 1 DAY"
    )
    lagged = cum.select(
        "day",
        "n_day",
        F.when(adjacent, F.lag("n_day").over(w_x)).alias("n_prev"),
        F.when(
            adjacent,
            F.abs(
                F.col("cum_d") * F.lag("n_day").over(w_x)
                - F.lag("cum_d").over(w_x) * F.col("n_day")
            ),
        ).alias("__num"),
    )
    out = (
        lagged.groupBy("day", "n_day")
        .agg(
            F.max("n_prev").alias("n_prev"),
            F.max("__num").alias("__num"),
        )
        .select(
            "day",
            F.col("n_day").cast("bigint").alias("n_rows"),
            F.col("n_prev").cast("bigint").alias("n_prev"),
            F.round(
                F.col("__num").cast("double")
                / (F.col("n_day") * F.col("n_prev")).cast("double"),
                6,
            ).alias("ks_stat"),
        )
        .orderBy("day")
    )
    return _with_cached_deps(out, [c])


def event_mix_drift(
    df: DataFrame,
    ts_col: str = "ts",
    cat_col: str = "event_type",
) -> DataFrame:
    """(day, n_rows, n_prev, tv_dist): day-over-day total-variation
    distance of the ``cat_col`` mix — the categorical companion of
    :func:`temporal_drift_ks` (a feed dropping one event type moves
    the mix long before volumes alarm).

    TV = ½·Σ_cat |p_d − p_prev| computed as the INTEGER sum
    Σ|c_d·n_prev − c_prev·n_d| with one double divide by 2·n_d·n_prev
    at the end — deterministic cross-engine. The dense (category ×
    day) grid makes a LAG (partitioned by category, ordered by day,
    exact day-adjacency checked) yield the previous day's count —
    categories absent on either day contribute their full count via
    the grid's zero rows, with no self-join. One corpus shuffle (the
    (day, cat) count, PERSISTED — its three consumers (day totals,
    category list, grid join) read the metadata aggregate, never the
    corpus again; ride ``_cached_deps``, release with
    ``dedup.unpersist_deps``); the rest is |days|·|cats| metadata.
    First day (or post-gap day) emits NULL.

    The TV arithmetic lives in :func:`mix_drift_from_counts` so the
    STREAMING twin (``streaming/windows.py:streaming_mix_counts`` —
    tumbling day-window counts maintained online) feeds its drained
    counts through the IDENTICAL code path — zero drift-math
    divergence risk between batch and stream."""
    c = df.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("day"),
        F.col(cat_col).alias("cat"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return mix_drift_from_counts(c)


def mix_drift_from_counts(counts: DataFrame) -> DataFrame:
    """The day-over-day total-variation core over a prepared
    (day, cat, c) counts frame — shared verbatim by the batch operator
    (:func:`event_mix_drift`) and the streaming twin's drained window
    counts. The counts frame is persisted here (three consumers);
    release via ``_cached_deps``/``unpersist_deps``."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
    )

    c = counts.persist()
    g = c.groupBy("day").agg(F.sum("c").alias("n_day"))
    cats = c.select("cat").distinct()
    grid = cats.crossJoin(F.broadcast(g))
    dense = grid.join(c, ["day", "cat"], "left").select(
        "day",
        "cat",
        "n_day",
        F.coalesce(F.col("c"), F.lit(0)).alias("c_cur"),
    )
    w_cat = Window.partitionBy("cat").orderBy("day")
    adjacent = F.lag("day").over(w_cat) == F.col("day") - F.expr(
        "INTERVAL 1 DAY"
    )
    lagged = dense.select(
        "day",
        "n_day",
        F.when(adjacent, F.lag("n_day").over(w_cat)).alias("n_prev"),
        F.when(
            adjacent,
            F.abs(
                F.col("c_cur") * F.lag("n_day").over(w_cat)
                - F.lag("c_cur").over(w_cat) * F.col("n_day")
            ),
        ).alias("__num"),
    )
    out = (
        lagged.groupBy("day", "n_day")
        .agg(
            F.max("n_prev").alias("n_prev"),
            F.sum("__num").alias("__num"),
        )
        .select(
            "day",
            F.col("n_day").cast("bigint").alias("n_rows"),
            F.col("n_prev").cast("bigint").alias("n_prev"),
            F.round(
                F.col("__num").cast("double")
                / (
                    F.lit(2) * F.col("n_day") * F.col("n_prev")
                ).cast("double"),
                6,
            ).alias("tv_dist"),
        )
        .orderBy("day")
    )
    return _with_cached_deps(out, [c])


def temporal_psi(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    n_buckets: int = 32,
) -> DataFrame:
    """(day, n_rows, n_prev, psi): day-over-day Population Stability
    Index of the ``value_col`` distribution — the mass-weighted
    companion of :func:`temporal_drift_ks` (r16). KS is a sup metric
    (one bad bucket dominates); TV (:func:`event_mix_drift`) is
    categorical; PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) is the industry
    drift score that weights every bucket by how much mass moved —
    the triad a monitoring datasheet publishes together. Rule of
    thumb: psi < 0.1 stable, 0.1-0.25 moderate, > 0.25 action.

    Grid: values floor to BIGINT then bucket by the shared min/max
    equal-width rule (``n_buckets`` defaults to the conventional ~30,
    NOT the KS monitors' 8192 — PSI is a coarse-bucket score by
    definition). Laplace smoothing (+0.5 per bucket, +B/2 per day
    total, B = the observed bucket count) keeps every term defined on
    zero-count buckets. Determinism discipline: the smoothed shares
    are exact IEEE divisions of exactly-representable operands (c+0.5
    and n+B/2 for n < 2^52), so both engines feed ln() bit-identical
    doubles with NO rounding step (a pre-log 6 dp round would zero an
    empty bucket's share once a day holds ~1M rows — ln(0)); the
    per-day sum is a SORTED fold over the bucket-ordered term list
    (the adamic_adar convention) — no float-association drift. The previous day
    comes from a LAG over the dense (bucket × day) grid with an exact
    day-adjacency check, the :func:`ks_drift_from_counts` shape; the
    first day (or a post-gap day) emits NULL.

    Scale: ONE corpus-proportional shuffle (the (day, floor) count,
    persisted); everything downstream is |days|·n_buckets metadata.
    Release the persist via ``_cached_deps``/``unpersist_deps``."""
    return temporal_psi_from_counts(
        day_floor_counts(df, ts_col, value_col), n_buckets
    )


def temporal_psi_from_counts(
    counts: DataFrame, n_buckets: int = 32
) -> DataFrame:
    """Bucket cap + PSI core over a prepared (day, x, c) RAW-floor
    counts frame — shared by :func:`temporal_psi` and the streaming
    twin's drained window counts
    (``streaming/windows.py:streaming_value_counts``), the
    :func:`temporal_drift_ks_from_counts` pattern: the drained raw
    counts replay the SAME bucketing, so stream and batch agree
    bit-for-bit at any value span."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
    )

    cb, c0 = _bucket_capped_counts(counts, "day", n_buckets, "b")
    cb = cb.persist()
    dense = (
        _dense_key_grid(cb, "day", "n_day")
        # the grid is DENSE (every day carries every observed bucket),
        # so the global bucket count is the per-day row count — a
        # day-partitioned window, no join back onto the cb lineage.
        # Named nbk, NOT "B": both engines resolve case-insensitively
        # and "B" collides with the bucket column "b"
        .withColumn(
            "nbk",
            F.count(F.lit(1)).over(Window.partitionBy("day")).cast("bigint"),
        )
    )
    w_b = Window.partitionBy("b").orderBy("day")
    adjacent = F.lag("day").over(w_b) == F.col("day") - F.expr(
        "INTERVAL 1 DAY"
    )
    # shares stay RAW doubles: (c+0.5) and (n+nbk/2.0) are exactly
    # representable and IEEE division is correctly rounded, so both
    # engines compute bit-identical shares with no rounding step —
    # and a 6 dp round would zero the smoothed share of an empty
    # bucket once a day holds ~1M rows, feeding ln(0) (r16 review)
    p6 = (F.col("c_cur") + F.lit(0.5)) / (
        F.col("n_day") + F.col("nbk") / F.lit(2.0)
    )
    q6 = (F.lag("c_cur").over(w_b) + F.lit(0.5)) / (
        F.lag("n_day").over(w_b) + F.col("nbk") / F.lit(2.0)
    )
    lagged = dense.select(
        "day",
        "b",
        "n_day",
        F.when(adjacent, F.lag("n_day").over(w_b)).alias("n_prev"),
        F.when(adjacent, (p6 - q6) * F.log(p6 / q6)).alias("__term"),
    )
    out = (
        lagged.groupBy("day", "n_day")
        .agg(F.max("n_prev").alias("n_prev"), _terms_agg())
        .select(
            "day",
            F.col("n_day").cast("bigint").alias("n_rows"),
            F.col("n_prev").cast("bigint").alias("n_prev"),
            F.when(
                F.col("n_prev").isNotNull(),
                F.round(_fold_terms(), 6),
            ).alias("psi"),
        )
        .orderBy("day")
    )
    return _with_cached_deps(out, [c0, cb])


def drift_attribution(
    df: DataFrame,
    ts_col: str = "ts",
    seg_col: str = "event_type",
    value_col: str = "value",
    n_buckets: int = 32,
) -> DataFrame:
    """(segment, day, n_rows, n_prev, psi): day-over-day PSI of the
    ``value_col`` distribution computed PER SEGMENT — the attribution
    step after a corpus-level monitor fires (r17). `temporal_psi`
    tells the operator THAT yesterday's value mix shifted;
    drift_attribution tells them WHICH segment (ingest feed, event
    type, pipeline) drove it — the segment whose per-segment PSI
    spiked on the same day. Segments are compared on the ONE shared
    global min/max grid (`_bucket_capped_counts` over the whole
    counts frame), so per-segment scores are comparable to each other
    and to the corpus-level monitor's shape.

    Float discipline is exactly :func:`temporal_psi`'s (+0.5 Laplace
    smoothing over each (segment, day)'s observed-bucket count, raw
    IEEE shares, bucket-ordered sorted fold); the previous day is a
    LAG over the dense (segment × day × bucket) grid with an exact
    day-adjacency check — a segment's first day, or a day following a
    gap IN THAT SEGMENT, emits NULL.

    Scale: ONE corpus-proportional shuffle (the (segment, day, floor)
    count, persisted); the grid is |segments|·|days|·n_buckets
    metadata with (segment, day)- and (segment, bucket)-partitioned
    windows only. Release via ``_cached_deps``/``unpersist_deps``."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
    )

    counts = (
        df.where(
            F.col(value_col).isNotNull() & F.col(seg_col).isNotNull()
        )
        .groupBy(
            F.col(seg_col).alias("seg"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            F.floor(F.col(value_col)).cast("bigint").alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cb, c0 = _bucket_capped_counts(counts, ["seg", "day"], n_buckets, "b")
    cb = cb.persist()
    dense = _dense_key_grid(cb, ["seg", "day"], "n_sd").withColumn(
        "nbk",
        F.count(F.lit(1))
        .over(Window.partitionBy("seg", "day"))
        .cast("bigint"),
    )
    w_sb = Window.partitionBy("seg", "b").orderBy("day")
    adjacent = F.lag("day").over(w_sb) == F.col("day") - F.expr(
        "INTERVAL 1 DAY"
    )
    p = (F.col("c_cur") + F.lit(0.5)) / (
        F.col("n_sd") + F.col("nbk") / F.lit(2.0)
    )
    q = (F.lag("c_cur").over(w_sb) + F.lit(0.5)) / (
        F.lag("n_sd").over(w_sb) + F.col("nbk") / F.lit(2.0)
    )
    lagged = dense.select(
        "seg",
        "day",
        "b",
        "n_sd",
        F.when(adjacent, F.lag("n_sd").over(w_sb)).alias("n_prev"),
        F.when(adjacent, (p - q) * F.log(p / q)).alias("__term"),
    )
    out = (
        lagged.groupBy("seg", "day", "n_sd")
        .agg(F.max("n_prev").alias("n_prev"), _terms_agg())
        .select(
            F.col("seg").alias(seg_col),
            "day",
            F.col("n_sd").cast("bigint").alias("n_rows"),
            F.col("n_prev").cast("bigint").alias("n_prev"),
            F.when(
                F.col("n_prev").isNotNull(),
                F.round(_fold_terms(), 6),
            ).alias("psi"),
        )
        .orderBy(seg_col, "day")
    )
    return _with_cached_deps(out, [c0, cb])


def temporal_wasserstein(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    n_buckets: int = 32,
) -> DataFrame:
    """(day, n_rows, n_prev, w1_dist): day-over-day Wasserstein-1
    (earth-mover) distance of the ``value_col`` distribution — the
    TRANSPORT member of the drift family (r17), next to KS (sup of
    CDF gaps), TV (mix distance) and PSI (mass × log-ratio). W1
    weights drift by how FAR mass moved, in value units: a
    distribution that shifts by 1000 chars reads 1000× the W1 of the
    same mass shifting by one bucket, where KS and PSI read the two
    identically. Both CDFs are step functions that change only at
    OBSERVED buckets, so on the shared equal-width grid the exact
    closed form is W1 = width · Σ_b |CDF_cur(b) − CDF_prev(b)| ·
    (next_b − b): each |CDF gap| persists across the run of empty
    buckets up to the next observed one, and skipping that run-length
    weight would silently under-report the distance whenever the
    observed buckets are sparse (the whole point of a transport
    metric).

    Float determinism is STRONGER than PSI's here: per-day CDFs are
    exact integer cumulative counts divided once by n_day (no float
    accumulation at all — IEEE division of exact operands is
    correctly rounded on both engines), term differences are single
    IEEE ops, and the per-day sum is a bucket-ordered sorted fold;
    only the final figure rounds (6 dp). First/gap days emit NULL
    (no adjacent predecessor), the PSI convention.

    Scale: ONE corpus-proportional shuffle (the (day, floor) count,
    persisted); the grid is |days|·n_buckets metadata with
    day-partitioned and bucket-partitioned windows only — zero
    unpartitioned windows. Release via ``_cached_deps``/
    ``unpersist_deps``."""
    return temporal_wasserstein_from_counts(
        day_floor_counts(df, ts_col, value_col), n_buckets
    )


def temporal_wasserstein_from_counts(
    counts: DataFrame, n_buckets: int = 32
) -> DataFrame:
    """Bucket cap + W1 core over a prepared (day, x, c) RAW-floor
    counts frame — shared by :func:`temporal_wasserstein` and the
    streaming twin's drained window counts
    (``streaming/windows.py:streaming_value_counts``), the
    :func:`temporal_psi_from_counts` pattern: drained raw counts
    replay the SAME bucketing, so stream and batch agree bit-for-bit
    at any value span."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
    )

    cb, c0 = _bucket_capped_counts(counts, "day", n_buckets, "b",
                                   with_width=True)
    cb = cb.persist()
    ww = F.broadcast(cb.agg(F.max("w").alias("w")))
    wd = (
        Window.partitionBy("day")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dense = _dense_key_grid(
        cb.select("day", "b", "c"), "day", "n_day"
    ).withColumn(
        # exact integer cumulative count per day — the CDF numerator
        "cum_c", F.sum("c_cur").over(wd).cast("bigint")
    )
    w_b = Window.partitionBy("b").orderBy("day")
    adjacent = F.lag("day").over(w_b) == F.col("day") - F.expr(
        "INTERVAL 1 DAY"
    )
    # run-length weight: the CDF gap at b persists over the empty
    # buckets up to the next OBSERVED bucket (day-partitioned window;
    # the grid is dense per day, so the gap is the same every day;
    # top bucket -> 0, where both CDFs are 1 anyway)
    wd2 = Window.partitionBy("day").orderBy("b")
    gap = F.coalesce(F.lead("b").over(wd2) - F.col("b"), F.lit(0))
    # ONE division per CDF point: exact int / exact int, correctly
    # rounded identically on both engines; no float accumulation
    p = F.col("cum_c") / F.col("n_day")
    q = F.lag("cum_c").over(w_b) / F.lag("n_day").over(w_b)
    lagged = dense.select(
        "day",
        "b",
        "n_day",
        F.when(adjacent, F.lag("n_day").over(w_b)).alias("n_prev"),
        F.when(adjacent, F.abs(p - q) * gap).alias("__term"),
    )
    out = (
        lagged.groupBy("day", "n_day")
        .agg(F.max("n_prev").alias("n_prev"), _terms_agg())
        .crossJoin(ww)
        .select(
            "day",
            F.col("n_day").cast("bigint").alias("n_rows"),
            F.col("n_prev").cast("bigint").alias("n_prev"),
            F.when(
                F.col("n_prev").isNotNull(),
                F.round(F.col("w") * _fold_terms(), 6),
            ).alias("w1_dist"),
        )
        .orderBy("day")
    )
    return _with_cached_deps(out, [c0, cb])


def source_wasserstein(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    n_buckets: int = 32,
) -> DataFrame:
    """(group, n_rows, w1_dist): Wasserstein-1 (earth-mover) distance
    of each group's ``value_col`` distribution against the REST of the
    corpus — the source-axis twin of :func:`temporal_wasserstein`,
    completing the drift matrix ({source, temporal} × {KS sup, PSI,
    W1 transport}; r17). A source whose lengths shifted FAR (a crawler
    suddenly returning truncated pages) reads W1 proportional to the
    shift size in value units, where KS and PSI only see that mass
    moved, not how far.

    Same grid and float discipline as :func:`temporal_wasserstein`:
    shared min/max bucket cap, exact integer cumulative counts (own
    and rest = corpus − own, both exact), ONE division per CDF point,
    |p − q| weighted by the run length to the next observed bucket,
    bucket-ordered sorted fold, final figure = width × sum rounded 6.
    Groups covering the whole corpus emit NULL (no rest). Scale: ONE
    corpus-proportional shuffle; |groups|·n_buckets grid metadata;
    group-/bucket-partitioned windows only. Release via
    ``_cached_deps``/``unpersist_deps``."""
    return source_wasserstein_from_counts(
        group_floor_counts(df, group_col, value_col), group_col, n_buckets
    )


def source_wasserstein_from_counts(
    counts: DataFrame, group_col: str = "source", n_buckets: int = 32
) -> DataFrame:
    """Bucket cap + W1 core over a prepared (group_col, x, c)
    RAW-floor counts frame — factored so one counts pass can feed
    both source-axis monitors (the dataset card's shape, r17
    review)."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
    )

    c = counts.withColumnRenamed(group_col, "grp")
    cb, c0 = _bucket_capped_counts(c, "grp", n_buckets, "b",
                                   with_width=True)
    cb = cb.persist()
    ww = F.broadcast(cb.agg(F.max("w").alias("w")))
    n_tot = F.broadcast(cb.agg(F.sum("c").cast("bigint").alias("n_total")))
    wg = (
        Window.partitionBy("grp")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dense = (
        _dense_key_grid(cb.select("grp", "b", "c"), "grp", "n_g")
        .crossJoin(n_tot)
        # per-bucket corpus totals from a bucket-partitioned window
        # (the source_psi shape — never an unpartitioned fold), then
        # exact integer cumulatives per group for own AND corpus
        .withColumn("c_all", F.sum("c_cur").over(Window.partitionBy("b")))
        .withColumn("cum_g", F.sum("c_cur").over(wg).cast("bigint"))
        .withColumn("cum_all", F.sum("c_all").over(wg).cast("bigint"))
    )
    wl = Window.partitionBy("grp").orderBy("b")
    gap = F.coalesce(F.lead("b").over(wl) - F.col("b"), F.lit(0))
    p = F.col("cum_g") / F.col("n_g")
    q = (F.col("cum_all") - F.col("cum_g")) / (
        F.col("n_total") - F.col("n_g")
    )
    terms = dense.select(
        "grp",
        "n_g",
        "b",
        "n_total",
        F.when(
            F.col("n_g") < F.col("n_total"), F.abs(p - q) * gap
        ).alias("__term"),
    )
    out = (
        terms.groupBy("grp", "n_g", "n_total")
        .agg(_terms_agg())
        .crossJoin(ww)
        .select(
            F.col("grp").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_rows"),
            F.when(
                F.col("n_g") < F.col("n_total"),
                F.round(F.col("w") * _fold_terms(), 6),
            ).alias("w1_dist"),
        )
        .orderBy(group_col)
    )
    return _with_cached_deps(out, [c0, cb])


def source_psi(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    n_buckets: int = 32,
) -> DataFrame:
    """(group, n_rows, psi): Population Stability Index of each
    group's ``value_col`` distribution against the REST of the corpus
    — the mass-weighted companion of :func:`source_drift_ks`, closing
    the drift matrix ({source, temporal} × {KS sup, PSI}; r16). A
    source whose length mix quietly diverges moves PSI before the KS
    sup spikes on any single bucket; the 0.1/0.25 rule-of-thumb
    thresholds make it the datasheet number.

    Same grid discipline as :func:`temporal_psi`: values floor to
    BIGINT, the shared min/max bucket cap (:func:`_bucket_capped_
    counts`, n_buckets defaults to the conventional ~30), +0.5
    Laplace smoothing keeps every share positive, shares stay RAW
    IEEE doubles (exactly-representable operands — a pre-log round
    would zero an empty bucket's share at scale), per-group sum is a
    bucket-ordered SORTED fold. The rest-of-corpus counts derive from
    the dense grid as C_b − c_g (total per bucket minus own), never a
    second scan; groups covering the whole corpus emit NULL (no rest
    to compare against).

    Scale: ONE corpus-proportional shuffle (the (group, value) count,
    persisted); downstream is |groups|·n_buckets metadata. Release
    via ``_cached_deps``/``unpersist_deps``."""
    return source_psi_from_counts(
        group_floor_counts(df, group_col, value_col), group_col, n_buckets
    )


def source_psi_from_counts(
    counts: DataFrame, group_col: str = "source", n_buckets: int = 32
) -> DataFrame:
    """Bucket cap + PSI core over a prepared (group_col, x, c)
    RAW-floor counts frame — factored so one counts pass can feed
    both source-axis monitors (the dataset card's shape, r17
    review)."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
    )

    c = counts.withColumnRenamed(group_col, "grp")
    cb, c0 = _bucket_capped_counts(c, "grp", n_buckets, "b")
    cb = cb.persist()
    n_tot = F.broadcast(cb.agg(F.sum("c").cast("bigint").alias("n_total")))
    dense = (
        _dense_key_grid(cb, "grp", "n_g")
        .crossJoin(n_tot)
        # dense grid: per-bucket corpus totals and the observed bucket
        # count come from bucket-/group-partitioned windows (a
        # lit-keyed global window would fold unpartitioned — the
        # one_bucket lesson; and "nbk", not "B": case-insensitive
        # resolution collides with "b")
        .withColumn("c_all", F.sum("c_cur").over(Window.partitionBy("b")))
        .withColumn(
            "nbk",
            F.count(F.lit(1)).over(Window.partitionBy("grp")).cast("bigint"),
        )
    )
    p = (F.col("c_cur") + F.lit(0.5)) / (
        F.col("n_g") + F.col("nbk") / F.lit(2.0)
    )
    q = (F.col("c_all") - F.col("c_cur") + F.lit(0.5)) / (
        F.col("n_total") - F.col("n_g") + F.col("nbk") / F.lit(2.0)
    )
    terms = dense.select(
        "grp",
        "n_g",
        "b",
        "n_total",
        F.when(
            F.col("n_g") < F.col("n_total"), (p - q) * F.log(p / q)
        ).alias("__term"),
    )
    out = (
        terms.groupBy("grp", "n_g", "n_total")
        .agg(_terms_agg())
        .select(
            F.col("grp").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_rows"),
            F.when(
                F.col("n_g") < F.col("n_total"),
                F.round(_fold_terms(), 6),
            ).alias("psi"),
        )
        .orderBy(group_col)
    )
    return _with_cached_deps(out, [c0, cb])
