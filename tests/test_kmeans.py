"""Distributed Lloyd k-means (operators/kmeans.py): convergence, assignment
consistency, determinism, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from plan_spark.catalog import table
from plan_spark.operators import kmeans
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def test_fit_converges_and_reduces_inertia(spark, emb):
    cents, iters = kmeans.fit(emb, vec_col="v", k=4, max_iter=15, tol=1e-9)
    assert len(cents) == 4 and all(len(c) == 64 for c in cents)
    assert 1 <= iters <= 15

    seeds = [
        [float(x) for x in r[0]]
        for r in emb.orderBy("vec_id").select("v").limit(4).collect()
    ]
    inertia0 = (
        kmeans.assign(emb, seeds, vec_col="v").agg(F.sum("dist2")).first()[0]
    )
    inertia1 = (
        kmeans.assign(emb, cents, vec_col="v").agg(F.sum("dist2")).first()[0]
    )
    # Lloyd monotonically decreases inertia vs the seed assignment
    assert inertia1 < inertia0


def test_assignment_covers_every_row_once(spark, emb):
    cents, _ = kmeans.fit(emb, vec_col="v", k=4, max_iter=5)
    a = kmeans.assign(emb, cents, vec_col="v")
    assert a.count() == emb.count()
    assert a.select("vec_id").distinct().count() == emb.count()
    ks = {r[0] for r in a.select("centroid").distinct().collect()}
    assert ks.issubset(set(range(4)))


def test_fit_is_deterministic(spark, emb):
    c1, i1 = kmeans.fit(emb, vec_col="v", k=3, max_iter=6)
    c2, i2 = kmeans.fit(emb, vec_col="v", k=3, max_iter=6)
    assert i1 == i2
    assert c1 == c2  # no RNG anywhere: bit-identical centroids


def test_assign_plan_has_no_python_and_no_corpus_sort(spark, emb):
    cents = [[0.0] * 64, [1.0] * 64]
    a = kmeans.assign(emb, cents, vec_col="v")
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # JVM-only scoring
    assert "Window" not in plan  # argmax is an aggregate, not a window sort
    assert "BroadcastExchange" in plan  # centroids broadcast, corpus never


def test_fit_raises_on_too_few_rows(spark, emb):
    tiny = emb.limit(2)
    with pytest.raises(ValueError):
        kmeans.fit(tiny, vec_col="v", k=5, max_iter=3)


def test_assign_keeps_duplicate_rows_as_observations(spark):
    """The argmax groups on the unique id, not every column: exact duplicate
    vectors under different ids stay separate observations (standard Lloyd
    weighting — collapsing them would bias the centroid update)."""
    rows = [(0, [0.0, 0.0]), (1, [9.0, 9.0]), (2, [0.0, 0.0]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    a = kmeans.assign(df, [[0.0, 0.0], [9.0, 9.0]], vec_col="v", id_col="id")
    got = a.collect()
    assert len(got) == 4  # no duplicate collapse
    assert {r.id: r.centroid for r in got} == {0: 0, 1: 1, 2: 0, 3: 0}
    # fit (seeds = ids 0,1): the triple-weighted origin holds centroid 0
    # exactly at the origin — a collapsed-duplicate update would not
    cents, _ = kmeans.fit(df, vec_col="v", k=2, max_iter=3, seed_col="id")
    assert cents[0] == [0.0, 0.0] and cents[1] == [9.0, 9.0]
