"""Hot-bucket discipline for LSH band blocking (r10 verdict #1).

Every LSH dedup front end in this repo blocks candidates by (band, bkey)
buckets and self-joins within the bucket. That join's work and shuffle
bytes are O(Σ bucket²): fine when buckets are small, a measured
scale-killer when they are not — the r10 sf10 sweep (200k vectors, every
one carrying 99 planted near-twins, 64 possible keys per band) spilled
the pair-graph shuffle past the box's free disk. Heavy boilerplate
duplication is exactly the regime corpus dedup exists for, so the bucket
self-join must be BOUNDED, not excused.

Two disciplines, chosen by what the caller does with the pairs:

- :func:`band_star_edges` — for UNVERIFIED band graphs feeding connected
  components (the text cluster faces): a bucket is a clique in the
  candidate graph, and a clique's components are exactly preserved by a
  star to the bucket minimum. O(n) edges per bucket, EXACT component
  semantics at every scale (no cap, no tradeoff).

- :func:`bounded_band_pairs` — for candidate sets that are RESCORED
  before use (the embedding cluster face verifies exact cosine): buckets
  above ``cap`` are split by a secondary hash into ceil(n/cap)
  sub-buckets — full pairs within each sub-bucket — plus one star edge
  per row to the bucket minimum so the bucket stays connectable through
  its hub. Per-row emission is O(cap); the emitted set is a SUBSET of
  the unbounded candidates, so after rescoring the edge set is a subset
  of the exact edge set — components can only split, never merge wrongly.
  Below the cap the output is bit-identical to the unbounded self-join
  (the driver-oracle scales never reach the cap; see the callers' cap
  constants).

Reference capability anchor: storage2's incremental index discipline
(/root/reference/pkg/storage2/incremental_index.go:28) — never rebuild
(or materialize) the quadratic thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_star_edges(bands: DataFrame, id_col: str) -> DataFrame:
    """(da < db) edges spanning every (band, bkey) bucket by a star to
    the bucket's minimum id.

    For a consumer that treats bucket co-membership ITSELF as an edge
    (no rescoring), the bucket is a clique, and the star preserves its
    connected components exactly — so downstream component labels are
    identical to the full self-join's at O(n) edges per bucket instead
    of O(n²). The node set is also identical: every member of a size>=2
    bucket appears (as hub or leaf); singleton buckets contribute no
    nodes in either formulation.

    ``bands`` is checkpointed first: it feeds both the hub aggregate and
    the join side, and its lineage is the caller's full LSH signature
    pipeline — without the checkpoint that pipeline executes twice (the
    two consumers' subtrees differ, so ReuseExchange cannot merge
    them). The materialized frame is (band, bkey, id) — tiny next to
    recomputing shingles/minhashes at any scale."""
    bands = bands.localCheckpoint(eager=True)
    hubs = bands.groupBy("band", "bkey").agg(
        F.min(id_col).alias("_hub"), F.count(F.lit(1)).alias("_n")
    )
    return (
        bands.join(hubs.filter(F.col("_n") >= 2), ["band", "bkey"])
        .filter(F.col(id_col) != F.col("_hub"))
        .select(F.col("_hub").alias("da"), F.col(id_col).alias("db"))
        .distinct()
    )


def bounded_band_pairs(
    bands: DataFrame, id_col: str, cap: int | None
) -> DataFrame:
    """Distinct (da < db) candidate pairs from (band, bkey) buckets with
    per-bucket emission bounded to O(cap) per row.

    ``cap=None`` is the exact unbounded self-join. With a cap, buckets of
    size <= cap emit their full pair set (exact); hotter buckets are
    split by a secondary hash (xxhash64 of the id) into ceil(n/cap)
    sub-buckets — full pairs within each — plus one star edge per row to
    the bucket minimum. Callers MUST rescore candidates (the cluster
    faces verify exact similarity), so the hub edges only ever add true
    edges and the bound only ever drops candidate pairs another band can
    still surface: a recall-bounded approximation above the cap,
    bit-identical below it."""
    a = bands.select(F.col(id_col).alias("da"), "band", "bkey")
    b = bands.select(F.col(id_col).alias("db"), "band", "bkey")
    if cap is None:
        return (
            a.join(b, ["band", "bkey"])
            .filter(F.col("da") < F.col("db"))
            .select("da", "db")
            .distinct()
        )
    sizes = bands.groupBy("band", "bkey").agg(
        F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_hub")
    )
    sized = bands.join(sizes, ["band", "bkey"])
    nsub = F.ceil(F.col("_n") / F.lit(cap)).cast("int")
    sub = F.when(F.col("_n") <= cap, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(F.col(id_col)), nsub).cast("int")
    )
    keyed = sized.select(id_col, "band", "bkey", sub.alias("_sub"))
    ka = keyed.select(F.col(id_col).alias("da"), "band", "bkey", "_sub")
    kb = keyed.select(F.col(id_col).alias("db"), "band", "bkey", "_sub")
    within = (
        ka.join(kb, ["band", "bkey", "_sub"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
    )
    star = (
        sized.filter((F.col("_n") > cap) & (F.col(id_col) != F.col("_hub")))
        .select(F.col("_hub").alias("da"), F.col(id_col).alias("db"))
    )
    return within.unionByName(star).distinct()
