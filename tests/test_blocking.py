"""Hot-bucket discipline gates (r10 verdict #1 — the round's one measured
scale failure: the LSH bucket self-join's O(Σ bucket²) pair graph spilled
the sf10 sweep's disk).

1. band_star_edges: EXACT component equivalence with the full bucket
   clique — on adversarial bucket layouts — at O(n) edges per bucket.
2. bounded_band_pairs: bit-identical to the unbounded self-join when no
   bucket exceeds the cap; bounded per-bucket emission on a planted hot
   bucket (the pytest gate the verdict asked for); hub connectivity keeps
   a hot bucket of true near-dups in ONE component after rescoring.
3. The live faces: dedup_clusters / dedup_apply / dedup_embed_clusters
   still match their DuckDB oracles at sf0.001 (the full sf0.01 check is
   the driver's; this is the in-repo guard).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F


def _components(pairs):
    """Reference union-find over collected (da, db) pairs."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _bands_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, band int, bkey long")


class TestBandStarEdges:
    def test_components_equal_clique_components(self, spark):
        """Star-to-min edges give EXACTLY the clique graph's components,
        including nodes bridging buckets across bands."""
        from plan_spark.operators.blocking import band_star_edges

        rows = (
            # bucket A: {1,2,3}; bucket B: {3,4}; bridge through 3
            [(i, 0, 100) for i in (1, 2, 3)]
            + [(i, 1, 200) for i in (3, 4)]
            # separate component {10, 11}
            + [(i, 0, 300) for i in (10, 11)]
            # singleton bucket contributes nothing
            + [(99, 2, 400)]
        )
        bands = _bands_df(spark, rows)
        star = band_star_edges(bands, "doc_id").collect()
        clique = [
            (a, b)
            for _, grp in itertools.groupby(
                sorted(rows, key=lambda r: (r[1], r[2])), key=lambda r: (r[1], r[2])
            )
            for a, b in itertools.combinations(sorted(g[0] for g in grp), 2)
        ]
        assert _components([(r.da, r.db) for r in star]) == _components(clique)
        # node sets identical too (singleton bucket absent from both)
        star_nodes = {x for r in star for x in (r.da, r.db)}
        assert star_nodes == {1, 2, 3, 4, 10, 11}
        # and the star is linear: a k-bucket emits k-1 edges, not k(k-1)/2
        assert len(star) == 2 + 1 + 1  # {1,2,3} + {3,4} + {10,11}

    def test_star_linear_in_hot_bucket(self, spark):
        from plan_spark.operators.blocking import band_star_edges

        n = 500
        bands = _bands_df(spark, [(i, 0, 7) for i in range(n)])
        edges = band_star_edges(bands, "doc_id")
        assert edges.count() == n - 1  # vs n(n-1)/2 = 124750 for the clique


class TestBoundedBandPairs:
    def test_identical_below_cap(self, spark):
        from plan_spark.operators.blocking import bounded_band_pairs

        rows = [(i, b, i % 5) for i in range(40) for b in range(2)]
        bands = _bands_df(spark, rows)
        exact = {
            (r.da, r.db)
            for r in bounded_band_pairs(bands, "doc_id", None).collect()
        }
        capped = {
            (r.da, r.db)
            for r in bounded_band_pairs(bands, "doc_id", 64).collect()
        }
        assert exact == capped and len(exact) > 0

    def test_bounded_emission_on_hot_bucket(self, spark):
        """The planted-hot-bucket gate: one 500-row bucket, cap 32 —
        per-bucket pair count must be O(n·cap), nowhere near n²/2."""
        from plan_spark.operators.blocking import bounded_band_pairs

        n, cap = 500, 32
        bands = _bands_df(spark, [(i, 0, 7) for i in range(n)])
        got = bounded_band_pairs(bands, "doc_id", cap)
        cnt = got.count()
        assert cnt <= n * cap + n, cnt  # bound: sub-bucket pairs + star
        assert cnt < n * (n - 1) // 4, cnt  # decisively below the clique
        # hub star present: the bucket min connects to every other row
        hub_deg = got.filter(F.col("da") == 0).count()
        assert hub_deg == n - 1

    def test_hot_bucket_of_true_neardups_stays_one_component(self, spark):
        """Rescoring survives the cap: when a hot bucket IS a true dup
        group (all pairwise-similar), hub edges all pass the rescore and
        min-label components still produce ONE cluster."""
        from plan_spark.operators.blocking import bounded_band_pairs
        from plan_spark.operators.components import min_label_components

        n, cap = 300, 16
        bands = _bands_df(spark, [(i, b, 7) for i in range(n) for b in range(4)])
        pairs = bounded_band_pairs(bands, "doc_id", cap)
        # "rescore" = keep all (every pair in the bucket is a true dup)
        labels = min_label_components(pairs)
        assert labels.select("label").distinct().count() == 1
        assert labels.count() == n


class TestLiveFacesStillOracleExact:
    """The three cluster faces after the blocking change, vs DuckDB."""

    @pytest.mark.parametrize(
        "name", ["dedup_clusters", "dedup_apply", "dedup_embed_clusters"]
    )
    def test_matches_oracle_sf0001(self, spark, name):
        import duckdb

        from plan_spark.registry import load_all

        REGISTRY = load_all()
        sf = "/root/testdata/sf0.001"
        q = REGISTRY[name]
        sp = q.fn(spark, sf).toPandas()
        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        ora = con.execute(q.oracle).df()
        assert len(sp) > 0, "vacuous"
        sp = sp[sorted(sp.columns)].astype(str)
        ora = ora[sorted(ora.columns)].astype(str)
        assert sorted(map(tuple, sp.values.tolist())) == sorted(
            map(tuple, ora.values.tolist())
        )


class TestAdaptiveBandWidth:
    """r11: the 6-bit band key space (64 buckets/band) saturates at large
    N — candidates are O(N²/64) on ANY duplication profile (both sf10
    sweeps measured disk exhaustion on the listing face). Past
    _LSH_SMALL_N the same 24 signature bits regroup into 2x12-bit bands;
    below it (every driver-oracle scale) the grouping — and the output —
    is bit-identical to the DuckDB oracle's 4x6."""

    def test_band_keys_grouping(self, spark):
        from plan_spark.queries.vector_ops import _band_keys

        bits = {f"b{i}": (i % 2) for i in range(24)}  # 0101... pattern
        df = spark.createDataFrame(
            [tuple(bits.values())], ", ".join(f"b{i} int" for i in range(24))
        )
        k6 = df.select(*[c.alias(f"k{i}") for i, c in enumerate(_band_keys(6))])
        r = k6.collect()[0]
        assert [r.k0, r.k1, r.k2, r.k3] == [0b010101] * 4
        k12 = df.select(*[c.alias(f"k{i}") for i, c in enumerate(_band_keys(12))])
        r = k12.collect()[0]
        assert [r.k0, r.k1] == [0b010101010101] * 2

    def test_wide_bands_emit_subset_of_exact_pairs(
        self, spark, tmp_path, monkeypatch
    ):
        """Force the saturated path on a twin-planted fixture (scale()'s
        1%-perturbation copies — near-identical signatures): the 2x12
        candidate set rescored is a non-empty SUBSET of the 4x6 exact
        pair set (a 12-bit agreement implies both 6-bit halves agree, so
        wider bands only ever drop candidates), and the planted twin
        pairs survive the widening."""
        import plan_spark.queries.vector_ops as vo
        from tests.scale_gen import scale

        sf = str(tmp_path / "x2")
        scale(spark, "/root/testdata/sf0.001", sf, factor=2)
        exact = {
            (r.da, r.db)
            for r in vo._embed_neardup_pairs(spark, sf).collect()
        }
        monkeypatch.setattr(vo, "_LSH_SMALL_N", 10)
        wide = {
            (r.da, r.db)
            for r in vo._embed_neardup_pairs(spark, sf).collect()
        }
        assert wide, "saturated path must stay non-vacuous"
        assert wide <= exact
        # the planted twins (orig, orig + offset) are in the wide set
        twins = {(a, b) for a, b in wide if b - a >= 1000}
        assert len(twins) >= 400, len(twins)  # ~500 planted twin pairs
