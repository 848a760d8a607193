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


class TestRealisticProfile:
    """scale_realistic (r11): the duplication-profile knob — 5% heavy-tail
    boilerplate (near-dup in every copy), 25% light dup (2-5 copies),
    70% unique — so sf10 dedup numbers measure a crawl-corpus regime,
    not the adversarial everyone-has-99-twins artifact."""

    @pytest.fixture(scope="class")
    def real_dir(self, spark, tmp_path_factory):
        from tests.scale_gen import scale_realistic

        dst = str(tmp_path_factory.mktemp("realdup") / "sf10x")
        scale_realistic(spark, SRC, dst, factor=10)
        return dst

    def test_counts_and_keys(self, spark, real_dir):
        for t, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
            src_n = spark.read.parquet(f"{SRC}/{t}.parquet").count()
            df = spark.read.parquet(f"{real_dir}/{t}.parquet")
            assert df.count() == 10 * src_n
            assert df.select(key).distinct().count() == 10 * src_n

    def test_unique_class_shares_no_text(self, spark, real_dir):
        """A class>=30 original's 10 copies are pairwise-different texts
        with (near-)disjoint token sets."""
        df = spark.read.parquet(f"{real_dir}/documents.parquet")
        src_n = spark.read.parquet(f"{SRC}/documents.parquet").count()
        import math

        base = 10 ** math.ceil(math.log10(src_n + 2))
        fam = df.filter(F.pmod(F.col("doc_id"), F.lit(base)) == 31).select(
            "doc_id", "text"
        )
        rows = fam.collect()
        assert len(rows) == 10
        texts = [r.text for r in rows]
        assert len(set(texts)) == 10
        toksets = [set(t.split()) for t in texts]
        # copy 0 keeps the original text; copies 1..9 are md5-token builds
        for i in range(1, 10):
            for j in range(i + 1, 10):
                inter = toksets[i] & toksets[j]
                assert len(inter) <= 1, (i, j, inter)

    def test_heavy_class_is_near_dup_family(self, spark, real_dir):
        df = spark.read.parquet(f"{real_dir}/documents.parquet")
        src_n = spark.read.parquet(f"{SRC}/documents.parquet").count()
        import math

        base = 10 ** math.ceil(math.log10(src_n + 2))
        fam = [
            r.text
            for r in df.filter(
                F.pmod(F.col("doc_id"), F.lit(base)) == 3
            ).collect()
        ]
        assert len(fam) == 10
        stems = {t.split(" variant")[0] for t in fam}
        assert len(stems) == 1  # all ten share the original stem

    def test_unique_embeddings_are_uncorrelated(self, spark, real_dir):
        """cosine(copy_i, copy_j) for a unique-class vector's copies stays
        far from 1 (fresh directions), while a heavy-class vector's
        copies stay near 1 (small perturbation)."""
        import math

        import numpy as np

        src_n = spark.read.parquet(f"{SRC}/embeddings.parquet").count()
        base = 10 ** math.ceil(math.log10(src_n + 2))
        df = spark.read.parquet(f"{real_dir}/embeddings.parquet")

        def fam(orig):
            rows = df.filter(
                F.pmod(F.col("vec_id"), F.lit(base)) == orig
            ).collect()
            return [np.array(r.embedding, dtype=float) for r in rows]

        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        uniq = fam(31)
        assert len(uniq) == 10
        sims = [cos(uniq[i], uniq[j]) for i in range(1, 9) for j in range(i + 1, 10)]
        assert max(sims) < 0.8, max(sims)
        heavy = fam(3)
        sims_h = [cos(heavy[0], heavy[j]) for j in range(1, 10)]
        assert min(sims_h) > 0.95, min(sims_h)
