"""Bucketed co-located join: writing both sides bucketed on the join
key lets a sort-merge join run with ZERO exchanges — the pre-shuffled
layout is the 100 TB answer for repeated fact-fact joins (SURVEY.md
'Partitioning & shuffle': bucketing for co-located joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_bucketed_join_no_shuffle(spark):
    # uses the session's default warehouse (spark-warehouse/ under cwd —
    # a static conf that cannot move at runtime); tables dropped after
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("ord_b")
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and it still computes the right thing
        expected = li.join(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
