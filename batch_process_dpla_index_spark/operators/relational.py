"""Thin relational helpers over the star schema.

The reference has no joins at all (SURVEY.md §2.4) — these are the
extension surface: broadcast/sort-merge equi-joins, semi/anti, top-k.
They are deliberately thin: the value is the enforced *physical* shape
(broadcast small dims, single-shuffle top-k), not new semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_dim(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Equi-join a fact table against a dimension, broadcasting the dim.

    At 100 TB the fact side never fits a shuffle comfortably; every dim
    under the broadcast threshold must ship to executors instead.
    """
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_anti")


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """Global top-k: per-partition local top-k then a single-reduce merge —
    Spark's TakeOrderedAndProject does exactly this for orderBy+limit, so
    declare it and let the planner pick that physical operator."""
    return df.orderBy(*order_cols).limit(k)
