"""Distributed Lloyd k-means over an embedding column.

Reference capability anchor: the reference trains IVF partitions with an
in-memory single-node k-means inside the index builder
(/root/reference/pkg/storage2/ivf_index.go, incremental_index.go) — here the
trainer itself is a distributed DataFrame job, so it scales to corpora that
do not fit one machine (the 100 TB topic-bucketing / curation case).

Shape per iteration (all JVM-side, no Python in the hot path):

1. Broadcast the k current centroids (an Arrow local relation — k rows,
   metadata-sized by definition).
2. Assignment: corpus x centroids scored with sequential higher-order-fn
   folds; per-vector argmax as a struct-max AGGREGATE, so partial
   aggregation collapses the N*k scored rows map-side before the single
   vector-id shuffle (never a corpus-sized window sort).
3. Update: posexplode the assigned vectors and average per (cluster,
   dimension) — map-side combined into k*dim cells, collected driver-side
   (k*dim doubles: metadata-sized, the same class as IVF's centroid pull).
4. Stop when no centroid moved more than ``tol`` (squared L2), or after
   ``max_iter`` rounds.

The per-iteration assignment kernel is exactly the driver-gated
``kmeans_assign`` query (queries/vector_ops.py) — this module adds the loop
and convergence, which SQL cannot express (pytest-gated instead:
tests/test_kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plan_spark.localrel import local_df
from plan_spark.session import driver_sized


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _sq(a):
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )


def assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "v",
    id_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment (squared L2, lowest-id tiebreak).

    ``id_col`` must be a UNIQUE row key (defaults to the first non-vector
    column). The argmax groups on this key alone — grouping on every column
    would collapse exact-duplicate rows into one observation and silently
    de-weight them relative to standard Lloyd's.

    Returns ``df``'s columns plus ``centroid`` (int) and ``dist2`` (double).
    One broadcast join + one struct-max aggregate; the corpus shuffles once
    on its own key column, never on the scored cross product.
    """
    spark = df.sparkSession
    if id_col is None:
        id_col = next((c for c in df.columns if c != vec_col), None)
        if id_col is None:
            raise ValueError(
                "assign() needs a unique id column besides the vector; "
                f"DataFrame has only {df.columns}"
            )
    c = local_df(
        spark,
        [(i, [float(x) for x in v]) for i, v in enumerate(centroids)],
        "c_id int, cv array<double>",
    )
    scored = df.crossJoin(F.broadcast(c)).withColumn(
        "dist2",
        _sq(F.col(vec_col)) - 2 * _dot(F.col("cv"), F.col(vec_col)) + _sq(F.col("cv")),
    )
    carried = [c_ for c_ in df.columns if c_ != id_col]
    best = (
        scored.groupBy(id_col)
        .agg(
            F.min(
                F.struct(F.col("dist2").alias("dist2"), F.col("c_id").alias("c_id"))
            ).alias("m"),
            # every grouped row is the SAME input row scored against a
            # different centroid, so first() is deterministic in value
            *[F.first(c_).alias(c_) for c_ in carried],
        )
        .select(
            *df.columns,
            F.col("m.c_id").alias("centroid"),
            F.col("m.dist2").alias("dist2"),
        )
    )
    return best


def fit(
    df: DataFrame,
    vec_col: str = "v",
    k: int = 8,
    max_iter: int = 20,
    tol: float = 1e-6,
    seed_col: str | None = None,
) -> tuple[list[list[float]], int]:
    """Lloyd's algorithm. Seeds are the k rows with the lowest ``seed_col``
    values (deterministic — no RNG, reproducible across runs/engines);
    defaults to the first column of ``df``. ``seed_col`` doubles as the
    unique row key the assignment argmax groups on — it must be unique, or
    duplicate rows would merge (see assign()).

    Returns (centroids, iterations_run). ``df`` is cached for the loop and
    unpersisted before returning.
    """
    seed_col = seed_col or df.columns[0]
    dim_probe = df.select(F.size(vec_col).alias("d")).first()
    if dim_probe is None:
        raise ValueError("cannot fit k-means on an empty DataFrame")
    seeds = [
        [float(x) for x in r[0]]
        for r in df.orderBy(seed_col).select(vec_col).limit(k).collect()
    ]
    if len(seeds) < k:
        raise ValueError(f"need at least k={k} rows, got {len(seeds)}")
    data = df.select(seed_col, vec_col).cache()
    try:
        centroids = seeds
        for it in range(1, max_iter + 1):
            a = assign(data, centroids, vec_col=vec_col, id_col=seed_col)
            # per-(cluster, dimension) mean: explode to k*dim cells map-side
            # driver_sized: k*dim cells reach the driver; AQE would split
            # the groupBy into 2 jobs per Lloyd iteration for no benefit
            with driver_sized(data.sparkSession):
                cells = (
                    a.select("centroid", F.posexplode(vec_col).alias("pos", "x"))
                    .groupBy("centroid", "pos")
                    .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
                    .collect()
                )
            new_c = [list(c) for c in centroids]  # empty clusters keep position
            by_cluster: dict[int, list[tuple[int, float, int]]] = {}
            for r in cells:
                by_cluster.setdefault(r["centroid"], []).append(
                    (r["pos"], r["sx"], r["n"])
                )
            for cid, triples in by_cluster.items():
                vec = new_c[cid]
                for pos, sx, n in triples:
                    vec[pos] = sx / n
            shift = max(
                sum((x - y) ** 2 for x, y in zip(old, new))
                for old, new in zip(centroids, new_c)
            )
            centroids = new_c
            if shift <= tol:
                return centroids, it
        return centroids, max_iter
    finally:
        data.unpersist()
