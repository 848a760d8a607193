"""Row-granular bitmap index tests (reference bitmap_index.go:20-130 —
per-value row bitmaps answering EqualityQuery -> row IDs): run-table
build parity, driver/distributed probe agreement, deletion-vector
composition, buffered insert + compact invariance, automatic scan routing
and its composition with the btree index."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from plan_spark.dataset import Dataset
from plan_spark.indexes.bitmap import BitmapIndex


def _tmp(name: str) -> str:
    d = os.path.join(tempfile.gettempdir(), "plan_spark_test_bitmap", name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(os.path.dirname(d), exist_ok=True)
    return d


def test_build_probe_parity_and_runs_compress(spark):
    """equality_query must return exactly the matching ids; a value whose
    rows are CONTIGUOUS in id space must compress to a handful of runs
    (the RLE payoff), while keystats reports exact per-value counts."""
    # ids 0..999 -> value 'a' (one run); 1000..1999 -> alternating 'b'/'c'
    df = spark.range(0, 2000).select(
        F.col("id"),
        F.when(F.col("id") < 1000, F.lit("a"))
        .when(F.col("id") % 2 == 0, F.lit("b"))
        .otherwise(F.lit("c"))
        .alias("grp"),
    )
    idx = BitmapIndex.build(
        spark, df, key_col="grp", id_col="id", path=_tmp("bm_build"), n_runs=3
    )
    got_a = sorted(r.id for r in idx.equality_query("a").collect())
    assert got_a == list(range(1000))
    runs_a = idx.equality_runs("a")
    assert runs_a == [(0, 999)], f"contiguous value must be one run: {runs_a}"
    got_b = sorted(r.id for r in idx.in_query(["b"]).collect())
    assert got_b == list(range(1000, 2000, 2))
    ks = idx.keystats()
    assert ks["a"] == (1000, 1)
    assert ks["b"][0] == 500 and ks["c"][0] == 500
    # driver and distributed probe faces agree (same files, same semantics)
    dr = [
        i for lo, hi in idx.in_runs(["b", "c"]) for i in range(lo, hi + 1)
    ]
    assert sorted(dr) == list(range(1000, 2000))


def test_insert_compact_invariance(spark):
    """Buffered inserts are visible to every probe face immediately;
    compact() folds them into the runs (merging adjacency) without
    changing any answer — and never expands runs back to rows."""
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("grp")
    )
    idx = BitmapIndex.build(
        spark, df, key_col="grp", id_col="id", path=_tmp("bm_ins"), n_runs=2
    )
    extra = spark.range(100, 140).select(
        F.col("id"), F.lit("1").alias("grp")
    )
    idx.insert(extra, key_col="grp", id_col="id")
    want = sorted(list(range(1, 100, 4)) + list(range(100, 140)))
    assert sorted(r.id for r in idx.equality_query("1").collect()) == want
    assert idx.pending_rows() == 40
    idx.compact(n_runs=2)
    assert idx.pending_rows() == 0
    assert sorted(r.id for r in idx.equality_query("1").collect()) == want
    # the 40 contiguous inserted ids merged into one run
    tail = [r for r in idx.equality_runs("1") if r[0] >= 100]
    assert tail == [(100, 139)]
    # keystats refreshed by compact
    assert idx.keystats()["1"][0] == len(want)


def test_dataset_lifecycle_and_deletion_vectors(spark):
    """create_index(kind='bitmap') on a row_ids dataset builds the
    persisted run table through the manifest commit path; a DELETE after
    the build leaves the index a sound SUPERSET — take_rows and the
    filtered scan drop the deleted ids via merge-on-read."""
    path = _tmp("bm_ds")
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).cast("string").alias("grp"),
        (F.col("id") * 3).alias("v"),
    )
    ds = Dataset.create(spark, path, df.repartition(4), row_ids=True)
    ds.create_index("bm", kind="bitmap", column="grp")
    desc = ds.manifest.indexes["bm"]
    assert desc["path"], "row_ids dataset must get the row-granular table"
    assert desc["params"]["id_col"] == "_rowid"
    ds.delete("k % 16 = 3")  # half of grp '3' gone, index unaware
    idx = ds.open_index("bm")
    ids = [i for lo, hi in idx.equality_runs("3") for i in range(lo, hi + 1)]
    assert len(ids) == 500  # superset: deleted ids still listed (sound)
    hits = ds.take_rows(ids, columns=["k"])
    got = sorted(r.k for r in hits.collect())
    want = sorted(k for k in range(4000) if k % 8 == 3 and k % 16 != 3)
    assert got == want, "take_rows must drop deletion-vectored ids"
    # the interval form is the contract's native currency: identical rows
    # with NO per-row id expansion anywhere (driver work is O(runs))
    got_runs = sorted(
        r.k
        for r in ds.take_rows(runs=idx.equality_runs("3"), columns=["k"]).collect()
    )
    assert got_runs == want, "take_rows(runs=...) must equal the ids form"
    # degenerate inputs: empty runs -> empty frame; overlapping runs merge
    assert ds.take_rows(runs=[], columns=["k"]).count() == 0
    merged = ds.take_rows(runs=[(10, 20), (15, 30), (31, 40)], columns=["k"])
    assert merged.count() == ds.take_rows(runs=[(10, 40)], columns=["k"]).count()
    with pytest.raises(ValueError):
        ds.take_rows([1, 2], runs=[(1, 2)])
    with pytest.raises(ValueError):
        ds.take_rows()
    # the normal filtered-scan face composes the same way
    n = ds.to_df(filters=[("grp", "=", "3")]).count()
    assert n == len(want)


def test_row_granularity_beats_fragment_pruning(spark):
    """The honest-partial closure: with a RARE value interleaved through
    EVERY fragment, fragment-granular structures (zonemaps, distinct sets)
    prune nothing — the scan still reads every row — while the row-granular
    probe addresses exactly the matching rows (orders of magnitude fewer).
    This is the reference's EqualityQuery -> row IDs contract."""
    path = _tmp("bm_rows")
    df = spark.range(0, 8000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 400 == 7, F.lit("rare"))
        .otherwise((F.col("id") % 4).cast("string"))
        .alias("grp"),
    )
    ds = Dataset.create(spark, path, df.repartition(4), row_ids=True)
    ds.create_index("bm", kind="bitmap", column="grp")
    sel, _ = ds.plan_scan([("grp", "=", "rare")], use_indexes=False)
    frag_rows = sum(f.rows for f in sel)
    assert frag_rows == 8000, "interleaved rare value defeats fragment pruning"
    runs = ds.open_index("bm").equality_runs("rare")
    probed = sum(hi - lo + 1 for lo, hi in runs)
    assert probed == 20
    assert probed * 100 <= frag_rows, "row probe must read ~1/400 of the rows"
    ids = [i for lo, hi in runs for i in range(lo, hi + 1)]
    got = sorted(r.k for r in ds.take_rows(ids, columns=["k"]).collect())
    assert got == sorted(k for k in range(8000) if k % 400 == 7)


def test_auto_routing_and_btree_composition(spark):
    """IndexPlannerV2 composition with a bitmap member
    (index_planner.go:27-75): grp='0' lives in fragments {0,2} (bitmap
    hit set), b=42 in fragments {0,1} (btree hit set); the conjunctive
    filter must intersect to fragment 0 and still return exact rows."""
    path = _tmp("bm_compose")

    def frag(i):
        return spark.range(0, 100).select(
            F.lit(str(i % 2)).alias("grp"),
            (F.col("id") * 2 + (i // 2)).alias("b"),
        ).coalesce(1)

    ds = Dataset.create(spark, path, frag(0), row_ids=True)
    for i in (1, 2, 3):
        ds.append(frag(i))
    ds.create_index("ig", kind="bitmap", column="grp")
    ds.create_index("ib", kind="btree", column="b")
    assert len(ds.plan_scan("grp = '0'", use_indexes=True)[0]) == 2
    assert len(ds.plan_scan("b = 42", use_indexes=True)[0]) == 2
    sel_both, _ = ds.plan_scan("grp = '0' AND b = 42", use_indexes=True)
    assert len(sel_both) == 1, "bitmap x btree must intersect to one fragment"
    got = [(r.grp, r.b) for r in ds.to_df(filters="grp = '0' AND b = 42").collect()]
    assert got == [("0", 42)]


def test_refresh_index_inserts_new_rows(spark):
    """refresh_index on an append-stale bitmap index buffers exactly the
    new fragments' (key, rowid) pairs and restores freshness + routing;
    the in-conjunct IN face composes values by union at probe time."""
    path = _tmp("bm_refresh")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("string").alias("grp")
    )
    ds = Dataset.create(spark, path, df.coalesce(1), row_ids=True)
    ds.create_index("bm", kind="bitmap", column="grp")
    ds.append(
        spark.range(1000, 1200).select(
            F.col("id").alias("k"), F.lit("9").alias("grp")
        ).coalesce(1)
    )
    assert not ds.index_fresh("bm")
    ds.refresh_index("bm")
    assert ds.index_fresh("bm")
    idx = ds.open_index("bm")
    assert idx.pending_rows() == 200
    got = sorted(r.id for r in idx.in_query(["9"]).collect())
    assert got == list(range(1000, 1200))
    # routing after refresh: the brand-new value maps to the new fragment
    sel, _ = ds.plan_scan([("grp", "=", "9")])
    assert len(sel) == 1
    assert ds.to_df(filters=[("grp", "=", "9")]).count() == 200


def test_no_row_ids_falls_back_to_fragment_sets(spark):
    """Without stable row ids there is nothing for runs to address: the
    legacy fragment-granular declaration still lands (distinct sets prune
    files) but no persisted table is built and open_index refuses."""
    import pytest

    path = _tmp("bm_legacy")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("grp")
    )
    ds = Dataset.create(spark, path, df.coalesce(1))
    ds.create_index("bm", kind="bitmap", column="grp")
    assert ds.manifest.indexes["bm"]["path"] is None
    assert "grp" in ds.manifest.bitmap_columns
    with pytest.raises(ValueError, match="nothing to open"):
        ds.open_index("bm")


def test_take_rows_large_id_list_uses_join_path(spark):
    """A >10k-id take_rows must return exactly the right rows through the
    broadcast-semi-join fallback (a literal IN list that size bloats the
    plan linearly at 100 TB probe scales)."""
    path = _tmp("bm_bigids")
    df = spark.range(0, 30_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("string").alias("grp")
    )
    # range-partitioned + sorted so the assigned row id == k exactly
    # (the ds_rowid_take convention), letting the assert address by value
    ds = Dataset.create(
        spark,
        path,
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        row_ids=True,
    )
    want = list(range(0, 30_000, 2))  # 15k ids -> join path
    got = ds.take_rows(want, columns=["k"])
    assert "isin" not in got._jdf.queryExecution().optimizedPlan().toString().lower()
    ks = sorted(r.k for r in got.collect())
    assert ks == sorted(want)
