"""Z-order layout: interleave correctness + the pruning-locality claim.

The point of Z-ordering is quantitative: after clustering by the
Morton key, per-file min-max ranges must be narrow on EVERY
interleaved dimension (single-column sort gives narrow ranges on that
column only). The locality test writes the same frame sorted by x
alone vs Z-ordered and compares per-file y-spreads from the real
parquet footer statistics — the exact signal scan pruning uses.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.operators.layout import (
    bucketize,
    write_zordered,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(5, 3)], "x bigint, y bigint")
    z = df.select(zorder_key([F.col("x"), F.col("y")], 3).alias("z")).collect()
    # x=0b101, y=0b011 -> bits x0,y0,x1,y1,x2,y2 = 1,1,0,1,1,0 -> 0b011011
    assert z[0]["z"] == 0b011011 == 27


def test_bucketize_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (99.9,), (150.0,)], "v double"
    )
    got = [
        r["b"]
        for r in df.select(
            bucketize(F.col("v"), 0.0, 100.0, 8).alias("b")
        ).collect()
    ]
    assert got[0] == 0 and got[1] == 0 and got[4] == 255
    assert got[2] == 128 and got[3] == 255  # 99.9/100*256 = 255.7 -> clamp


def _per_file_spread(path: str, col: str) -> float:
    """Mean (max-min) of a column across part files, from footer stats."""
    spreads = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spreads.append(max(maxs) - min(mins))
    return sum(spreads) / len(spreads)


def test_zorder_layout_narrows_every_dimension(spark, tmp_path):
    n, side = 20_000, 128
    base = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        ((F.col("id") * 7919) % side).alias("y"),
    )
    x_sorted = str(tmp_path / "xsort")
    zordered = str(tmp_path / "zord")
    (
        base.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(x_sorted)
    )
    write_zordered(
        base, zorder_key([F.col("x"), F.col("y")], 7), zordered, n_files=8
    )

    # same rows either way
    assert spark.read.parquet(zordered).count() == n

    y_spread_xsort = _per_file_spread(x_sorted, "y")
    y_spread_zord = _per_file_spread(zordered, "y")
    x_spread_zord = _per_file_spread(zordered, "x")
    # x-only sort leaves y unpruned (full range per file); Z-order must
    # narrow BOTH dimensions materially
    assert y_spread_xsort > 0.9 * (side - 1)
    assert y_spread_zord < 0.75 * y_spread_xsort
    assert x_spread_zord < 0.75 * (side - 1)
