"""Field-presence / quality-flag macros (the MQ scoring vocabulary).

Re-expresses the reference's 16 CASE-WHEN presence flags
(MqReports.scala:25-87) as composable Column combinators: a flag is
1 when a field is meaningfully populated, else 0, and flags are then
mean-aggregated per group into completeness scores.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def present_array_ref(col: Column) -> Column:
    """Reference-compatible presence flag: 0 only for an *empty* array —
    NULL arrays score 1, matching MqReports.scala's ``size(x) == 0``-only
    test under legacy ``size(null) = -1`` semantics (the CASE has no
    null branch, so a NULL array falls through to 1). The itemdata SQL
    in quality/mq.py encodes the same rule; this combinator is the
    Column-API form for callers composing flags outside that SQL."""
    return F.when(col.isNotNull() & (F.size(col) == 0), 0).otherwise(1)


def present_string(col: Column) -> Column:
    """1 when non-null and non-blank."""
    return F.when(col.isNull() | (F.trim(col) == ""), 0).otherwise(1)


def like_any(col: Column, patterns: list[str]) -> Column:
    """1 when any LIKE pattern matches (the open-rights test shape,
    MqReports.scala:66-69)."""
    cond = None
    for p in patterns:
        c = col.like(p)
        cond = c if cond is None else (cond | c)
    return F.when(col.isNotNull() & cond, 1).otherwise(0)
