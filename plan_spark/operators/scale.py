"""Scale primitives: bucketed co-located joins and salted skew aggregation.

These are the two levers the 100 TB deployment pulls that small-scale runs
never see (SURVEY.md §7 "hard parts"):

- BUCKETING: write both join sides bucketed by the join key; Spark then
  sort-merge-joins them with NO Exchange on either side — the shuffle is
  paid once at write time and amortized over every subsequent join. The
  reference has no equivalent (single node); this is the Spark-native
  replacement for its in-memory hash-join build (executor_join.go:12).
- SALTING: a hot grouping key overwhelms one reducer; salt the key into N
  subkeys, aggregate partially per subkey (parallel), then merge the N
  partials. AQE's skew-join handles JOIN skew automatically; aggregation
  skew still wants explicit salt when a single key dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def publish_bucketed(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    buckets: int = 8,
) -> None:
    """Persist df as a bucketed+sorted table in the session catalog.

    Joins/aggregations on ``bucket_cols`` between tables bucketed the same
    way run without any Exchange (verified in tests/test_scale.py)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.bucketBy(buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(name)
    )


def salted_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    agg: str = "sum",
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: (key, salt) partial -> key final.

    Correct for decomposable aggregates (sum/count/min/max). The partial
    phase spreads a hot key over ``salt`` reducers; the final phase merges
    ``salt`` rows per key — never a single giant reducer."""
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}[agg]
    partial_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[agg]
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "__salt")
        .agg(partial_fn(agg_col).alias("__partial"))
    )
    return partial.groupBy(key).agg(merge("__partial").alias(f"{agg}_{agg_col}"))


def explain_has_exchange_between_scans_and_join(df: DataFrame) -> bool:
    """True if the plan shuffles either side before its (sort-merge) join —
    the thing bucketing exists to eliminate."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_at = plan.find("SortMergeJoin")
    if join_at < 0:
        return True
    return "Exchange" in plan[join_at:]
