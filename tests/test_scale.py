"""Scale primitives: bucketed co-located joins must not shuffle; salted
aggregation must spread hot keys without changing results."""

from __future__ import annotations

from pyspark.sql import functions as F

from plan_spark.catalog import table
from plan_spark.operators.scale import (
    explain_has_exchange_between_scans_and_join,
    publish_bucketed,
    salted_agg,
)
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    od = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    publish_bucketed(spark, li, "li_bkt", ["l_orderkey"], buckets=8)
    publish_bucketed(
        spark,
        od.withColumnRenamed("o_orderkey", "l_orderkey"),
        "od_bkt",
        ["l_orderkey"],
        buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: at real scale neither side fits in
        # a broadcast, which is exactly when bucketing pays off
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_bkt").join(spark.table("od_bkt"), "l_orderkey")
        # the shuffle was paid at write time; the join itself must not add one
        assert not explain_has_exchange_between_scans_and_join(joined)
        # and the co-located join returns the same rows as the shuffled one
        plain = li.join(
            od.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS od_bkt")


def test_salted_agg_matches_plain(spark):
    od = table(spark, SF_DIR, "orders")
    got = {
        r.o_custkey: r.sum_o_orderkey
        for r in salted_agg(od, "o_custkey", "o_orderkey", "sum").collect()
    }
    want = {
        r.o_custkey: r.s
        for r in od.groupBy("o_custkey").agg(F.sum("o_orderkey").alias("s")).collect()
    }
    assert got == want


def test_salted_count_and_minmax(spark):
    od = table(spark, SF_DIR, "orders")
    got = {
        r.o_custkey: r.count_o_orderkey
        for r in salted_agg(od, "o_custkey", "o_orderkey", "count").collect()
    }
    want = {
        r.o_custkey: r.n
        for r in od.groupBy("o_custkey").agg(F.count("o_orderkey").alias("n")).collect()
    }
    assert got == want
    gmin = {
        r.o_custkey: r.min_o_orderdate
        for r in salted_agg(od, "o_custkey", "o_orderdate", "min").collect()
    }
    wmin = {
        r.o_custkey: r.m
        for r in od.groupBy("o_custkey").agg(F.min("o_orderdate").alias("m")).collect()
    }
    assert gmin == wmin
