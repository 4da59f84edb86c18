"""Plan-shape assertions — the 100 TB design contract: filters push
down to the scan, columns prune, small joins broadcast, top-k avoids
global sort, aggregations combine map-side."""

from __future__ import annotations

from pyspark.sql import functions as F

from vega_spark.plans import inspect as I
from vega_spark.tables import load_table


def test_filter_pushdown_to_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    assert I.has_pushed_filter(q, "l_orderkey"), I.plan_text(q)


def test_column_pruning_reaches_reader(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    assert I.scan_reads_only(q, {"l_orderkey", "l_quantity"}, "lineitem"), \
        I.plan_text(q)


def test_small_join_broadcasts(spark, sf_dir):
    from vega_spark.operators.joins import join
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    q = join(li, o, on=F.col("l_orderkey") == F.col("o_orderkey"),
             broadcast_right=True)
    assert I.uses_broadcast_join(q), I.plan_text(q)


def test_topk_plans_take_ordered(spark, sf_dir):
    from vega_spark.operators.topk import top
    li = load_table(spark, sf_dir, "lineitem")
    q = top(li.select("l_extendedprice"), 10, ["l_extendedprice"])
    assert I.uses_take_ordered(q), I.plan_text(q)


def test_groupby_has_partial_aggregate(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    assert I.has_partial_aggregate(q), I.plan_text(q)


def test_registry_flagship_plan_is_one_exchange(spark, sf_dir):
    # weblog_agg: scan → partial agg → single exchange → final agg
    from vega_spark.registry import QUERIES
    q = QUERIES["weblog_agg"](spark, sf_dir)
    assert I.count_exchanges(q) <= 1, I.plan_text(q)
