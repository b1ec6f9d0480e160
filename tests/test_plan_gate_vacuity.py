"""Vacuity controls for the plan-gate suite (r5 verdict item 5).

A negative plan gate (`assert "X" not in plan`) is only evidence if the
pattern CAN appear under the explain mode the gate reads — otherwise it
passes forever, even after the regression it was written to catch
(twice found in this repo: `"Exchange hashpartitioning"` never appears
in formatted mode, fixed r4; `"partitionBy=[event_type], "` never
appears in any mode, fixed r6). This file pins one POSITIVE control per
negative pattern used in tests/test_plans.py: a tiny deliberately-bad
plan that must contain the pattern under the same explain mode. If a
Spark upgrade renames an operator or changes explain formatting, the
control fails here, pointing at every gate that just went vacuous.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.plans import plan_string


@contextmanager
def _conf(spark, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def _pair(spark):
    # keys are NON-unique (id % 7): Catalyst knows spark.range ids are
    # distinct and elides the aggregation exchange entirely for a
    # unique grouping key — which would make the Exchange controls
    # vacuous about vacuity.
    a = spark.range(100).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 2).alias("x")
    )
    b = spark.range(100).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 3).alias("y")
    )
    return a, b


def test_cartesian_product_is_matchable(spark):
    # gates: q_join_broadcast/q_join_multiway/... assert NOT CartesianProduct
    a, b = _pair(spark)
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        plan = plan_string(a.crossJoin(b))
    assert "CartesianProduct" in plan, plan[:1500]


def test_broadcast_nested_loop_join_is_matchable(spark):
    # gates: contamination / tpch q2/q20/q21 assert NOT BroadcastNestedLoopJoin
    a, b = _pair(spark)
    plan = plan_string(a.join(b, a.x < b.y))
    assert "BroadcastNestedLoopJoin" in plan, plan[:1500]


def test_sort_merge_join_is_matchable(spark):
    # gates: q_agg_spearman / q_llm_forget_cascade assert NOT SortMergeJoin
    a, b = _pair(spark)
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        plan = plan_string(a.join(b, "k"))
    assert "SortMergeJoin" in plan, plan[:1500]


def test_exchange_is_matchable_formatted(spark):
    # gate: q_join_bucketed asserts NOT "Exchange" in formatted mode
    a, _ = _pair(spark)
    plan = plan_string(a.groupBy("k").count())
    assert "Exchange" in plan, plan[:1500]


def test_exchange_hashpartitioning_is_matchable_simple(spark):
    # gates counting "Exchange hashpartitioning" read SIMPLE mode —
    # formatted mode never inlines the expression (the r4 vacuity bug).
    a, _ = _pair(spark)
    plan = plan_string(a.groupBy("k").count(), "simple")
    assert "Exchange hashpartitioning" in plan, plan[:1500]
    # and the formatted-mode absence that caused the r4 bug still holds,
    # so any gate reading formatted mode for this string is vacuous:
    assert "Exchange hashpartitioning" not in plan_string(a.groupBy("k").count())


def test_rangepartitioning_is_matchable(spark):
    # gate: q_sort_within_partitions asserts NOT rangepartitioning
    a, _ = _pair(spark)
    plan = plan_string(a.orderBy("x"))
    assert "rangepartitioning" in plan, plan[:1500]


def test_hashpartitioning_user_id_is_matchable(spark):
    # gates: q_ts_rsi/q_ts_bollinger/q_join_asof_nearest count
    # "hashpartitioning(user_id" occurrences in formatted mode.
    df = spark.range(100).select(
        (F.col("id") % 7).alias("user_id"), F.col("id").alias("v")
    )
    plan = plan_string(df.groupBy("user_id").agg(F.sum("v")))
    assert "hashpartitioning(user_id" in plan, plan[:1500]


def test_flatmapgroups_in_pandas_is_matchable(spark):
    # gate: q_llm_embed_covariance asserts NOT FlatMapGroupsInPandas
    df = spark.range(20).select((F.col("id") % 2).alias("g"), "id")

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    out = df.groupBy("g").applyInPandas(f, "g long, id long")
    assert "FlatMapGroupsInPandas" in plan_string(out), plan_string(out)[:1500]


def test_windowspecdefinition_partition_args_are_matchable(spark):
    # gate: test_range_frame_window_is_bucket_partitioned reads the
    # windowspecdefinition argument list. Both directions must be
    # producible: event_type followed by bucket (good) and event_type
    # followed by the order column (the degradation the gate catches).
    from pyspark.sql import Window

    df = spark.range(100).select(
        (F.col("id") % 3).alias("event_type"),
        (F.col("id") % 5).alias("bucket"),
        F.col("id").alias("cents"),
    )
    good = df.withColumn(
        "s",
        F.sum("cents").over(
            Window.partitionBy("event_type", "bucket").orderBy("cents")
        ),
    )
    bad = df.withColumn(
        "s",
        F.sum("cents").over(Window.partitionBy("event_type").orderBy("cents")),
    )
    gp = plan_string(good)
    bp = plan_string(bad)
    assert re.search(r"windowspecdefinition\(event_type#\d+\w*, bucket#", gp), gp[:1500]
    m = re.findall(r"windowspecdefinition\(event_type#\d+\w*, (\w+)#", bp)
    assert m and all(a != "bucket" for a in m), bp[:1500]
    # the RETIRED pattern really is unmatchable — documents why the old
    # `"partitionBy=[event_type], " not in plan` assertion was vacuous:
    assert "partitionBy=[" not in gp and "partitionBy=[" not in bp


def test_takeordered_and_window_group_limit_are_matchable(spark):
    # positive-direction gates (assert pattern IS present) fail loudly
    # when vacuous, but pin the two operator spellings most likely to
    # drift across Spark versions anyway.
    from pyspark.sql import Window

    a, _ = _pair(spark)
    assert "TakeOrderedAndProject" in plan_string(a.orderBy("x").limit(5))
    w = Window.partitionBy("k").orderBy("x")
    top = (
        a.withColumn("rn", F.row_number().over(w)).where("rn <= 2")
    )
    assert "WindowGroupLimit" in plan_string(top)


def test_single_partition_is_matchable_simple(spark):
    # gates: test_skewed_hot_key_range_joins asserts NOT "SinglePartition"
    # in simple mode — prove the token CAN appear there: a partition-less
    # window funnels everything through one Exchange SinglePartition.
    from pyspark.sql import Window

    a, _ = _pair(spark)
    bad = a.withColumn(
        "r", F.row_number().over(Window.orderBy("x"))
    )
    plan = plan_string(bad, "simple")
    assert "SinglePartition" in plan, plan[:1500]
