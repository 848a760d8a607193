"""Property-based soundness for the scalar/spatial indexes: for ANY probe,
the fence-pruned read must return exactly what a full filter over the base
data returns — a fence that wrongly excludes a run file would silently
drop rows, which is the one failure mode these indexes must never have
(reference btree_index_test.go / rtree_index_test.go probe the same
invariant on their in-memory trees)."""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from plan_spark.indexes.btree import BtreeIndex
from plan_spark.indexes.rtree import RtreeIndex

# bounded grids so probes regularly hit file boundaries and exact fence
# min/max values (the off-by-one-prone cases)
_key = st.integers(min_value=0, max_value=120).map(float)
_coord = st.integers(min_value=0, max_value=40).map(float)


@pytest.fixture(scope="module")
def corpus(spark):
    # keys collide across files on purpose (id*13 % 120 wraps) and the
    # coords quantize onto a lattice so boxes touch run MBRs exactly
    return spark.range(0, 3000).select(
        F.col("id"),
        ((F.col("id") * 13) % 120).cast("double").alias("key"),
        ((F.col("id") * 7) % 41).cast("double").alias("x"),
        ((F.col("id") * 11) % 41).cast("double").alias("y"),
    ).cache()


@pytest.fixture(scope="module")
def bt(spark, corpus):
    return BtreeIndex.build(
        spark, corpus, key_col="key", id_col="id",
        path=tempfile.mkdtemp(prefix="plan_spark_btprop_"), n_runs=5,
    )


@pytest.fixture(scope="module")
def rt(spark, corpus):
    return RtreeIndex.build(
        spark, corpus, x_col="x", y_col="y", id_col="id",
        path=tempfile.mkdtemp(prefix="plan_spark_rtprop_"), n_runs=6,
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=_key, b=_key)
def test_btree_range_probe_sound(corpus, bt, a, b):
    lo, hi = min(a, b), max(a, b)
    got = sorted(r.id for r in bt.range_query(lo, hi).collect())
    exp = sorted(
        r.id for r in corpus.filter(F.col("key").between(lo, hi)).collect()
    )
    assert got == exp


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ax=_coord, ay=_coord, bx=_coord, by=_coord)
def test_rtree_box_probe_sound(corpus, rt, ax, ay, bx, by):
    x0, x1, y0, y1 = min(ax, bx), max(ax, bx), min(ay, by), max(ay, by)
    got = sorted(r.id for r in rt.range_search(x0, y0, x1, y1).collect())
    exp = sorted(
        r.id
        for r in corpus.filter(
            F.col("x").between(x0, x1) & F.col("y").between(y0, y1)
        ).collect()
    )
    assert got == exp
