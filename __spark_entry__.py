"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registries live inside the package:
- ``batch_process_dpla_index_spark.queries.QUERIES``
- ``batch_process_dpla_index_spark.oracles.ORACLES``
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from batch_process_dpla_index_spark.oracles import ORACLES
from batch_process_dpla_index_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MQ-reports-shaped presence scoring over documents
    (SURVEY.md §7 step 1 — scan → CASE presence flags → hash agg),
    the reference's core analytical query re-expressed on the
    fixture corpus (MqReports.scala:22-134 analog)."""
    return QUERIES["doc_presence_scores"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (same column
    names/aliases — the driver hashes values under sorted columns)."""
    return dict(ORACLES)
