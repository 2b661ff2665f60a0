"""Bucketed co-located join (SURVEY §4.2 / 100TB design): writing both
join sides bucketed+sorted on the key lets Catalyst plan a SortMergeJoin
with NO Exchange — at cluster scale this removes the dominant shuffle of
repeated fact-fact joins (e.g. postings-doclen style or orders-lineitem).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    for name in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .saveAsTable("b_lineitem")
    )
    (
        od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .saveAsTable("b_orders")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bl = spark.table("b_lineitem")
        bo = spark.table("b_orders")
        q = (
            bl.join(bo, bl.l_orderkey == bo.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("cnt"))
        )
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        # no shuffle feeds the join: the only Exchange allowed is the
        # post-join groupBy
        pre_join = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan

        # result correctness vs the unbucketed join
        expected = {
            (r["o_orderpriority"], r["cnt"])
            for r in li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        got = {(r["o_orderpriority"], r["cnt"]) for r in q.collect()}
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("b_lineitem", "b_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
