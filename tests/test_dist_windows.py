"""Scalable distribution windows (r11): w_dist's plain
partitionBy(event_type) window sorts each ~5-value group in ONE task
(40× at sf10 — single-task sorts over 2M+ rows). The bucketed exact-rank
formulation (_dist_windows_scalable) must be BIT-IDENTICAL to the window
functions on any input — bucketing is load balance, never semantics —
so the driver oracle stays green whichever path the size gate picks."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _plain(ev):
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


def _rows(df):
    return sorted(
        (r.event_type, r.event_id, r.value, r.quartile, r.pct_rank, r.cdist)
        for r in df.collect()
    )


class TestDistWindowsScalable:
    @pytest.mark.parametrize("sf", ["0.001", "0.01"])
    def test_bit_identical_on_fixture(self, spark, sf):
        from plan_spark.queries.pipeline_ops import _dist_windows_scalable
        from plan_spark.catalog import table

        ev = table(spark, f"/root/testdata/sf{sf}", "events")
        assert _rows(_dist_windows_scalable(ev)) == _rows(_plain(ev))

    def test_edge_group_sizes(self, spark):
        """Groups of size 1..6 hit every ntile uneven-bucket case (n<k,
        n=k, n%k in 0..3) and percent_rank's single-row 0.0 rule."""
        from plan_spark.queries.pipeline_ops import _dist_windows_scalable

        rows = []
        eid = 0
        for g, size in enumerate([1, 2, 3, 4, 5, 6]):
            for i in range(size):
                rows.append((eid, f"t{g}", float((i * 37) % 11)))
                eid += 1
        # duplicate VALUES inside a group: the event_id tiebreak must
        # keep ranks unique and both paths must agree on the tie order
        rows += [(eid + i, "ties", 1.0) for i in range(8)]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        assert _rows(_dist_windows_scalable(ev)) == _rows(_plain(ev))

    def test_few_buckets_and_many(self, spark):
        from plan_spark.queries.pipeline_ops import _dist_windows_scalable
        from plan_spark.catalog import table

        ev = table(spark, "/root/testdata/sf0.001", "events")
        want = _rows(_plain(ev))
        for nb in (2, 8, 64):
            assert _rows(_dist_windows_scalable(ev, n_buckets=nb)) == want

    def test_gate_routes_large_inputs(self, spark, monkeypatch):
        """Past the size gate w_dist takes the scalable path and the
        driver-facing output is unchanged."""
        import plan_spark.queries.pipeline_ops as po

        sf = "/root/testdata/sf0.001"
        baseline = _rows(po.w_dist(spark, sf))
        monkeypatch.setattr(po, "_DIST_SMALL_N", 10)
        po._N_EVENTS_CACHE.pop(sf, None)
        forced = _rows(po.w_dist(spark, sf))
        po._N_EVENTS_CACHE.pop(sf, None)
        assert forced == baseline


class TestTopKPrePrune:
    """w_topn / distinct_kmv (r11): the per-input-partition local top-k
    prune before the few-valued global window — exact on adversarial tie
    layouts (the global answer is a subset of the union of local
    answers, with the deterministic tiebreak aligning tie order)."""

    def test_topn_exact_under_ties(self, spark):
        from pyspark.sql import Window

        rows = [(i, "P%d" % (i % 3), float((i * 7) % 5)) for i in range(400)]
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
        ).repartition(8)
        w = Window.partitionBy("o_orderpriority").orderBy(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        plain = (
            df.select(
                "o_orderpriority", "o_orderkey", "o_totalprice",
                F.row_number().over(w).alias("rn"),
            ).filter(F.col("rn") <= 3)
        )
        w_local = Window.partitionBy("o_orderpriority", "_pid").orderBy(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        pruned = (
            df.withColumn("_pid", F.spark_partition_id())
            .withColumn("_rl", F.row_number().over(w_local))
            .filter(F.col("_rl") <= 3)
            .select(
                "o_orderpriority", "o_orderkey", "o_totalprice",
                F.row_number().over(w).alias("rn"),
            )
            .filter(F.col("rn") <= 3)
        )
        key = lambda r: (r.o_orderpriority, r.rn, r.o_orderkey)
        assert sorted(map(key, plain.collect())) == sorted(
            map(key, pruned.collect())
        )

    def test_live_rows_match_plain_formulations(self, spark):
        """The registered rows vs their pre-prune-free formulations on
        the fixture (belt and braces on top of the DuckDB oracle)."""
        from pyspark.sql import Window

        from plan_spark.catalog import table
        from plan_spark.queries.analytics import w_topn

        sf = "/root/testdata/sf0.001"
        got = [
            (r.o_orderpriority, r.rn, r.o_orderkey)
            for r in w_topn(spark, sf).collect()
        ]
        ords = table(spark, sf, "orders")
        w = Window.partitionBy("o_orderpriority").orderBy(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        want = [
            (r.o_orderpriority, r.rn, r.o_orderkey)
            for r in ords.select(
                "o_orderpriority", "o_orderkey",
                F.row_number().over(w).alias("rn"),
            )
            .filter(F.col("rn") <= 3)
            .orderBy("o_orderpriority", "rn")
            .collect()
        ]
        assert got == want


class TestPercentileBucketedRank:
    def test_gate_routes_and_matches(self, spark, monkeypatch):
        import plan_spark.queries.pipeline_ops as po

        sf = "/root/testdata/sf0.001"
        po._N_EVENTS_CACHE.pop(sf, None)
        base = [tuple(r) for r in po.percentile_exact(spark, sf).collect()]
        monkeypatch.setattr(po, "_DIST_SMALL_N", 10)
        po._N_EVENTS_CACHE.pop(sf, None)
        forced = [tuple(r) for r in po.percentile_exact(spark, sf).collect()]
        po._N_EVENTS_CACHE.pop(sf, None)
        assert forced == base and len(base) > 0
