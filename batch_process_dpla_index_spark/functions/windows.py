"""Window-spec helpers.

``one_bucket`` exists for the repo's BOUNDED single-partition windows
(frames whose row count is capped by contract: |stages| rungs,
≤k candidates, |files| stats rows). A bare ``Window.orderBy`` is the
right plan for those — but WindowExec logs a no-partition warning for
every one, and ~60 cosmetic warnings per bench run would let a REAL
unpartitioned window hide in the noise. ``partitionBy(F.lit(0))``
does NOT fix this on Spark 4: the optimizer folds literal partition
keys out of the window spec and the executed plan is unpartitioned
again (verified: `Exchange SinglePartition` + warning). So the key
must be constant-VALUED but not constant-FOLDABLE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def one_bucket(col: Column) -> Column:
    """A constant-0 partition key Catalyst cannot fold away:
    ``pmod(hash(col), 1)`` is 0 for every row but depends on a real
    column, so the window keeps a partition spec (no WindowExec
    warning) while still moving all rows to ONE populated partition —
    exactly the documented bounded-frame plan, minus the log noise.
    Use ONLY where the frame is bounded by contract; an unbounded
    frame behind this key is the same scale bug as a bare
    ``Window.orderBy``, just quieter."""
    return F.pmod(F.hash(col), F.lit(1))
