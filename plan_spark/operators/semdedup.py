"""SemDeDup: cluster embeddings, drop within-cluster semantic near-dups.

Capability anchor: Abbas et al. 2023 ("SemDeDup") — the embedding-space
analogue of the reference's near-dup pipeline, composing a k-means
assignment with per-cluster pairwise cosine. The reference's vector side
(ivf_index.go kmeans partitions + distance_metrics.go cosine) supplies the
building blocks; this operator is the curation-pipeline face.

Scale contract: the pair generation self-joins ON THE CLUSTER KEY — one
shuffle co-partitions both sides and the quadratic term is bounded per
cluster (sum of c_i^2). **K is the scale knob**: SemDeDup's recipe holds the
EXPECTED CLUSTER SIZE constant as the corpus grows (their K ~ 11k for 100M
docs ~ 9k docs/cluster), so the pair join stays O(N * target_size) total —
linear in the corpus for a fixed target size, never O(N^2). Pass either
``k`` directly or ``target_cluster_size`` (k = ceil(N / target)); the
registered fixture query (queries/vector_ops.py semdedup) is one
instantiation of this operator with fixed seed centroids so the DuckDB
oracle stays exact.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _sq(a):
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )


def _cos(a, b):
    return _dot(a, b) / F.sqrt(_sq(a) * _sq(b))


def assign_cosine(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid by cosine, lowest-c_id tiebreak, as a struct-max
    AGGREGATE (partial aggregation collapses the N*K scored rows map-side
    before the single id shuffle — never a corpus-sized window sort).

    ``e`` is (vec_id, v); ``cents`` is (c_id, cv), broadcast by contract
    (K rows). Returns (vec_id, v, c_id, cos_sim)."""
    sims = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "c_id", _cos(F.col("cv"), F.col("v")).alias("cos_sim")
    )
    return (
        sims.groupBy("vec_id", "v")
        .agg(
            F.max(
                F.struct(
                    F.col("cos_sim").alias("cos_sim"), (-F.col("c_id")).alias("neg_c")
                )
            ).alias("m")
        )
        .select(
            "vec_id",
            "v",
            (-F.col("m.neg_c")).alias("c_id"),
            F.col("m.cos_sim").alias("cos_sim"),
        )
    )


def resolve_k(
    n_rows: int, k: int | None = None, target_cluster_size: int | None = None
) -> int:
    """The scale knob: explicit ``k`` wins; else k = ceil(N / target size)
    (SemDeDup's constant-expected-cluster-size recipe, which keeps the
    per-cluster pair join linear in the corpus)."""
    if k is not None:
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        return k
    if target_cluster_size is None:
        raise ValueError("pass k= or target_cluster_size=")
    if target_cluster_size < 1:
        raise ValueError(f"target_cluster_size must be >= 1, got {target_cluster_size}")
    return max(1, math.ceil(n_rows / target_cluster_size))


def semdedup_flags(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.4,
    k: int | None = None,
    target_cluster_size: int | None = None,
    centroids: DataFrame | None = None,
    persist: bool = True,
) -> DataFrame:
    """Flag within-cluster semantic near-duplicates.

    Returns (``id_col``, c_id, is_dup): ``is_dup`` is true for every row
    that has a LOWER-id cluster-mate at cosine >= ``tau`` — keep the
    ``~is_dup`` rows (one representative per near-dup set, deterministic).

    ``persist=True`` (default) caches the assignment relation, which feeds
    both sides of the pair join plus the output — one corpus scan instead
    of three. The cached blocks belong to the RETURNED plan and live until
    the caller's session clears them (bench.py clears between queries);
    long-lived pipeline callers embedding this mid-DAG should pass
    ``persist=False`` (or clearCache afterwards) to avoid accumulating
    cached assignments across many invocations.

    ``centroids``: a (c_id, cv) DataFrame to assign against (the fixture
    oracle path, and the persisted-index path where centroids already
    exist). When absent, k is resolved (see resolve_k) and seed centroids
    are the k lowest-id vectors — deterministic, no RNG, and at corpus
    scale the caller runs operators.kmeans.fit / MLlib KMeans first and
    passes the result here.
    """
    e = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if centroids is None:
        n = e.count()
        kk = resolve_k(n, k=k, target_cluster_size=target_cluster_size)
        centroids = (
            e.orderBy("vec_id")
            .limit(kk)  # k rows — the window below sorts k rows, not the corpus
            .select(
                (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("c_id"),
                F.col("v").alias("cv"),
            )
        )
    else:
        cols = centroids.columns
        centroids = centroids.select(
            F.col(cols[0]).alias("c_id"),
            F.col(cols[1]).cast("array<double>").alias("cv"),
        )
    # per-vector norm computed ONCE here (and cached with the assignment):
    # the pair join then scores dot / (na * nb) instead of re-folding both
    # squared norms per pair — 1/3 of the higher-order-function work on the
    # quadratic stage (the oracle computes the identical expression, so the
    # tau boundary stays bit-stable)
    m = assign_cosine(e, centroids).select(
        "vec_id", "v", "c_id", F.sqrt(_sq(F.col("v"))).alias("nrm")
    )
    if persist:
        # LAZY persist (plan-only callers must not trigger a corpus scan);
        # ownership of the cached blocks passes to the caller — see docstring
        m = m.persist()
    a = m.select(
        "c_id", F.col("vec_id").alias("a_id"), F.col("v").alias("av"),
        F.col("nrm").alias("na"),
    )
    b = m.select(
        "c_id", F.col("vec_id").alias("b_id"), F.col("v").alias("bv"),
        F.col("nrm").alias("nb"),
    )
    dropped = (
        a.join(b, "c_id")  # co-partitioned on the cluster key: ONE shuffle
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            _dot(F.col("av"), F.col("bv")) / (F.col("na") * F.col("nb")) >= tau
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        m.join(dropped, "vec_id", "left")
        .select(
            F.col("vec_id").alias(id_col),
            "c_id",
            F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
        )
    )
