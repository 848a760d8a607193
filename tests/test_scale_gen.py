"""tests/scale_gen.py — the ×N join-consistent fixture scaler (committed
in r10 after two rounds of inline use; the sf1/sf10 decade fixtures that
back BASELINE.md's scaling curve come from it)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.scale_gen import COPIED_ASIS, SCALED, scale

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scaled") / "sf2x")
    scale(spark, SRC, dst, factor=2)
    return dst


def test_counts_scale_by_factor(spark, scaled_dir):
    for t in SCALED:
        n0 = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        n1 = spark.read.parquet(f"{scaled_dir}/{t}.parquet").count()
        assert n1 == 2 * n0, f"{t}: {n0} -> {n1}"
    for t in COPIED_ASIS:
        n0 = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        n1 = spark.read.parquet(f"{scaled_dir}/{t}.parquet").count()
        assert n1 == n0, f"{t} must copy as-is"


def test_foreign_keys_still_resolve(spark, scaled_dir):
    """The whole point of per-DOMAIN offsets: every scaled fact key must
    still hit its scaled dimension — a lineitem referencing a partkey
    that no part row carries would silently shrink every join."""
    li = spark.read.parquet(f"{scaled_dir}/lineitem.parquet")
    for dim, dk, fk in [
        ("part", "p_partkey", "l_partkey"),
        ("supplier", "s_suppkey", "l_suppkey"),
        ("orders", "o_orderkey", "l_orderkey"),
    ]:
        d = spark.read.parquet(f"{scaled_dir}/{dim}.parquet")
        dangling = li.join(d, F.col(fk) == F.col(dk), "left_anti").count()
        assert dangling == 0, f"{fk}: {dangling} dangling references"
    o = spark.read.parquet(f"{scaled_dir}/orders.parquet")
    c = spark.read.parquet(f"{scaled_dir}/customer.parquet")
    assert o.join(c, F.col("o_custkey") == F.col("c_custkey"), "left_anti").count() == 0


def test_keys_unique_and_schema_stable(spark, scaled_dir):
    for t, k in [("part", "p_partkey"), ("orders", "o_orderkey"),
                 ("customer", "c_custkey"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")]:
        df = spark.read.parquet(f"{scaled_dir}/{t}.parquet")
        assert df.select(k).distinct().count() == df.count(), f"{t}.{k} not unique"
        src_schema = spark.read.parquet(f"{SRC}/{t}.parquet").schema
        assert df.schema == src_schema, f"{t} schema drifted"


def test_varied_content_not_degenerate(spark, scaled_dir):
    """Copies must not be byte-identical in the text/vector families —
    dedup/LSH operators would otherwise measure a degenerate corpus."""
    docs = spark.read.parquet(f"{scaled_dir}/documents.parquet")
    n_docs = docs.count()
    assert docs.select("text").distinct().count() > n_docs * 0.9
    emb = spark.read.parquet(f"{scaled_dir}/embeddings.parquet")
    # perturbed copies differ from originals elementwise
    assert emb.select(F.col("embedding")[0].alias("x")).distinct().count() > (
        emb.count() * 0.9
    )
