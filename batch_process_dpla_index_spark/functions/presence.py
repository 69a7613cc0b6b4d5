"""Field-presence / quality-flag macros (the MQ scoring vocabulary).

Re-expresses the reference's 16 CASE-WHEN presence flags
(MqReports.scala:25-87) as composable Column combinators: a flag is
1 when a field is meaningfully populated, else 0, and flags are then
mean-aggregated per group into completeness scores.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def present_scalar(col: Column) -> Column:
    """1 when non-null (MqReports.scala pattern: `when x is null then 0`)."""
    return F.when(col.isNull(), 0).otherwise(1)


def present_array(col: Column) -> Column:
    """1 when non-null and non-empty (`when size(x) == 0 ... then 0`).

    NOTE — deliberate divergence from the reference: MqReports.scala's
    ``case when size(x) == 0 then 0 else 1`` scores a NULL array as 1
    (legacy ``size(null) = -1`` falls through the CASE). We treat NULL
    as absent, which is the semantically-correct completeness score.
    Use :func:`present_array_ref` when byte-parity with the reference's
    scores is required.
    """
    return F.when(col.isNull() | (F.size(col) == 0), 0).otherwise(1)


def present_array_ref(col: Column) -> Column:
    """Reference-compatible presence flag: 0 only for an *empty* array —
    NULL arrays score 1, matching MqReports.scala's ``size(x) == 0``-only
    test under legacy ``size(null) = -1`` semantics."""
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
