"""Data-layout operators: Z-order (Morton) clustering keys and the
range-partitioned sorted writer that exploits them.

Why this matters at 100 TB: parquet scan pruning is driven by
per-file/row-group min-max statistics. Sorting by one column gives
perfect pruning on that column and none on the others; interleaving
the bits of k bucketed dimensions into one Morton key and sorting by
it gives every dimension partial locality, so selective filters on
ANY of the k columns skip most files. This is the same layout idea as
Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed as plain Spark
expressions + a repartitionByRange write — no table format required.

The key is a fixed chain of shift/mask/or terms (bits × k literals) —
whole-stage-codegen-friendly, zero Python, reproducible in ANSI SQL
(the DuckDB oracle runs the identical arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column into an integer rank 0..2^bits-1 over
    [lo, hi] (clamped). Caller supplies the range — at scale these are
    known domain bounds or come from a cheap pre-agg; a narrow
    expression keeps the layout job one-pass."""
    n = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi - lo))
        * F.lit(n + 1)
    )
    return F.least(F.lit(n), F.greatest(F.lit(0), scaled)).cast("bigint")


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave ``bits`` bits of each already-
    bucketized integer column. Bit b of column i lands at position
    b*k + i. Pure bitwise expression — codegen'd, portable."""
    k = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(
    df: DataFrame,
    zkey: Column,
    out_path: str,
    n_files: int = 8,
) -> None:
    """Cluster by the Z-order key and write: repartitionByRange on the
    key (range boundaries from a sampled sketch — one pass), sort
    within each range partition, parquet out. Every output file then
    covers a compact Z-range = a compact hyper-rectangle in the
    bucketed dimension space, which is what makes min-max pruning fire
    on every interleaved column."""
    (
        df.withColumn("__z", zkey)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
