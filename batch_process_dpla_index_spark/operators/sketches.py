"""Mergeable frequency sketches: Misra–Gries heavy hitters.

``approx_distinct_users`` (HLL) covers cardinality; the other sketch a
100 TB pipeline leans on is FREQUENCY — "the top-k tokens / URLs /
user-agents" — where the naive exact plan shuffles every distinct item.
The Misra–Gries summary (Misra & Gries '82; merge property per
Agarwal et al., PODS '12) is the textbook mergeable answer: each
partition keeps at most ``capacity`` counters, summaries add up, and
the merged counter ``g(x)`` under-counts the true frequency ``f(x)``
by at most ``N/(capacity+1)`` — enough to ENUMERATE a provable
superset of the true top-k without ever shuffling the full item
domain.

Two-pass plan, both passes scale-honest:

1. **Sketch pass** — ``mapInPandas`` folds each partition into a
   ≤capacity-entry MG summary (Arrow-batched, O(capacity) memory,
   zero shuffle); the summaries (|partitions|·capacity rows, NOT
   O(distinct)) merge with one tiny groupBy.
2. **Exact pass** — the candidate set (≤capacity items) broadcasts
   back as a semi-join filter, and exact counts aggregate ONLY
   matching rows: map-side partial aggregation sees at most
   |candidates| groups per task, so the exchange carries
   |partitions|·|candidates| rows, independent of the item domain.

The result is EXACT top-k counts (hash-verifiable against any engine)
plus a per-run proof flag ``mg_bound_ok``: true iff the k-th exact
count strictly exceeds the best possible frequency of every
non-candidate (``g_k − 1`` for summarized items, ``⌊N/(cap+1)⌋`` for
never-summarized ones) — i.e. the sketch provably captured the true
top-k, not just probably. A false flag means capacity was too small
for the skew; raise it and re-run.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summaries(
    items: DataFrame, item_col: str, capacity: int = 400
) -> DataFrame:
    """Per-partition Misra–Gries summaries: (item, lb) rows with at
    most ``capacity`` items per partition, plus one ``item IS NULL``
    sentinel per partition carrying that partition's total item count
    (needed for the merged error bound; NULL input items are dropped).

    ``lb`` is the partition-local MG counter — a LOWER bound on the
    partition-local frequency, under-counting by at most
    ``n_partition/(capacity+1)``.
    """
    cap = int(capacity)
    if cap < 1:
        raise ValueError(f"mg_summaries: capacity must be >= 1, got {capacity}")

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_total = 0
        for pdf in batches:
            col = pdf[item_col].dropna()
            n_total += len(col)
            for item, cnt in col.value_counts().items():
                c = int(cnt)
                if item in counters:
                    counters[item] += c
                elif len(counters) < cap:
                    counters[item] = c
                else:
                    # decrement-all by the new item's full batch count,
                    # bounded by the smallest surviving counter (the
                    # batched form of MG's one-at-a-time decrement)
                    dec = min(c, min(counters.values()))
                    counters = {
                        k: v - dec for k, v in counters.items() if v > dec
                    }
                    if c > dec:
                        counters[item] = c - dec
        out = pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "lb": [int(v) for v in counters.values()] + [n_total],
            }
        )
        yield out

    return items.select(F.col(item_col).alias(item_col)).mapInPandas(
        fold, schema="item string, lb long"
    )


def heavy_hitters(
    items: DataFrame, item_col: str, k: int = 20, capacity: int = 400
) -> DataFrame:
    """Exact top-k items by frequency, found via an MG candidate sweep
    instead of a full-domain shuffle.

    Returns (item, n_exact, rank, mg_bound_ok) ordered by rank —
    exact counts with a deterministic (count desc, item asc)
    tie-break, so the output is engine-independent whenever
    ``mg_bound_ok`` holds. Driver traffic is bounded: two scalar
    aggregates (N, g_k) and one ≤capacity-row candidate collect —
    never O(distinct).
    """
    if k < 1:
        raise ValueError(f"heavy_hitters: k must be >= 1, got {k}")
    if capacity < 1:
        raise ValueError(
            f"heavy_hitters: capacity must be >= 1, got {capacity}"
        )
    items = items.where(F.col(item_col).isNotNull()).persist()
    summary = mg_summaries(items, item_col, capacity).persist()

    n_items = (
        summary.where(F.col("item").isNull()).agg(F.sum("lb")).collect()[0][0]
        or 0
    )
    err = n_items / (capacity + 1)
    merged = (
        summary.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("lb").alias("g"))
    )
    top_g = merged.orderBy(F.col("g").desc(), F.col("item").asc()).limit(k)
    g_vals = [r["g"] for r in top_g.collect()]
    g_k = g_vals[-1] if len(g_vals) == k else 0
    candidates = merged.where(F.col("g") >= F.lit(g_k - err)).select("item")

    exact = (
        items.join(F.broadcast(candidates), on=items[item_col] == candidates["item"], how="left_semi")
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("item").asc())
        .limit(k)
    )
    rows = exact.collect()
    min_topk = rows[-1]["n_exact"] if len(rows) == k else 0
    # best possible f(x) of anything we did NOT count exactly
    non_candidate_ub = max(g_k - 1, math.floor(err))
    bound_ok = min_topk > non_candidate_ub

    # every action ran eagerly above (two scalar collects + the k-row
    # top-k), so the caches are done working by the time we return —
    # release them here instead of riding deps to the caller
    spark = items.sparkSession
    items.unpersist()
    summary.unpersist()
    from batch_process_dpla_index_spark.operators.relational import (
        _arrow_local_frame,
    )

    return _arrow_local_frame(
        spark,
        [
            (r["item"], r["n_exact"], i + 1, bool(bound_ok))
            for i, r in enumerate(rows)
        ],
        "item string, n_exact long, rank int, mg_bound_ok boolean",
    )
