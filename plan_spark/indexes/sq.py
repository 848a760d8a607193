"""Scalar-quantization index: per-dimension uniform grid, codes-only storage.

Reference: storage2's SQ quantizer (/root/reference/pkg/storage2/
sq_quantizer.go:29-38) — each float dimension is quantized to an 8-bit level
on a [min, max] grid learned from the data. Spark-first redesign:

- BUILD: one distributed pass computes per-dimension min/max (posexplode ->
  groupBy pos: `dim` distinct keys, map-side combined, so the shuffle carries
  dim*partitions rows no matter how many vectors). Vectors are encoded as
  array<smallint> levels — 2 bytes/dim on disk vs 8 for float64 (Parquet
  bit-packs the 8-bit range further). At 100 TB of embeddings the search
  scan reads the codes column only.
- SEARCH (asymmetric): candidates stay quantized; each is scored against the
  full-precision query as L2(query, dequantized(codes)) computed entirely
  JVM-side with zip_with/aggregate over the codes array — the float vector
  column is never read at query time, and no Python runs per row.

Unlike PQ (whose codebooks mix dimensions), SQ preserves each dimension to
1/2^bits of its range, so recall at 8 bits is near-exact — the classic
storage/recall middle ground between raw floats and PQ.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from plan_spark.session import driver_sized


class SqIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)

    # ------------------------------------------------------------- build
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        df: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        path: str | None = None,
        bits: int = 8,
        metric: str = "l2",
    ) -> "SqIndex":
        """``metric``: "l2" grids raw vectors; "cosine" L2-normalizes first
        (unit-sphere L2 ≡ cosine ranking); "dot" grids raw and scores with
        the asymmetric inner product (reference distance_metrics.go:12-96)."""
        if metric not in ("l2", "cosine", "dot"):
            raise ValueError(f"unknown metric {metric!r}")
        idx = cls(spark, path)
        os.makedirs(idx.path, exist_ok=True)
        levels = (1 << bits) - 1
        e = df.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        if metric == "cosine":
            from plan_spark.indexes.hnsw import _unit

            e = _unit(e, "v")
        with driver_sized(spark):
            stats = (
                e.select(F.posexplode("v").alias("pos", "x"))
                .groupBy("pos")
                .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
                .orderBy("pos")
                .collect()
            )
        mins = [r.lo for r in stats]
        # zero-range dimensions get scale 1.0 so encode maps them to level 0
        scales = [((r.hi - r.lo) / levels) or 1.0 for r in stats]
        with open(os.path.join(idx.path, "grid.json"), "w") as fh:
            json.dump(
                {"bits": bits, "metric": metric, "mins": mins, "scales": scales}, fh
            )
        enc = F.zip_with(
            F.zip_with("v", F.lit(mins), lambda x, lo: x - lo),
            F.lit(scales),
            lambda d, s: F.least(
                F.lit(levels), F.greatest(F.lit(0), F.round(d / s).cast("int"))
            ).cast("smallint"),
        )
        e.select("id", enc.alias("codes")).write.mode("overwrite").parquet(
            os.path.join(idx.path, "codes")
        )
        return idx

    # ------------------------------------------------------------- search
    def _meta(self) -> dict:
        with open(os.path.join(self.path, "grid.json")) as fh:
            return json.load(fh)

    def codes(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "codes"))

    def search(self, queries: DataFrame, top_k: int = 10) -> DataFrame:
        """Top-k by asymmetric scoring: full-precision queries (q_id, qv)
        vs dequantized candidate codes, under the BUILD metric. queries is
        small (broadcast); per-candidate scoring is a codegen'd
        zip_with/aggregate chain. Output: (q_id, c_id, rank,
        <approx_l2sq|approx_dot>); under cosine the query is normalized
        JVM-side and ranked by unit-sphere L2."""
        meta = self._meta()
        mins, scales = meta["mins"], meta["scales"]
        metric = meta.get("metric", "l2")
        score_col = "approx_dot" if metric == "dot" else "approx_l2sq"
        q = queries.select("q_id", F.col("qv").cast("array<double>").alias("qv"))
        if metric == "cosine":
            from plan_spark.indexes.hnsw import _unit

            q = _unit(q, "qv")
        # dequantized[i] = mins[i] + codes[i]*scales[i]
        deq = F.zip_with(
            F.zip_with("codes", F.lit(scales), lambda c, s: c.cast("double") * s),
            F.lit(mins),
            lambda cs, lo: cs + lo,
        )
        if metric == "dot":
            score = F.aggregate(
                F.zip_with(F.col("qv"), deq, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        else:
            score = F.aggregate(
                F.zip_with(F.col("qv"), deq, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        scored = (
            self.codes()
            .join(F.broadcast(q))
            .select("q_id", F.col("id").alias("c_id"), score.alias(score_col))
            .filter(F.col("q_id") != F.col("c_id"))
        )
        order = F.desc(score_col) if metric == "dot" else F.asc(score_col)
        w = Window.partitionBy("q_id").orderBy(order, F.asc("c_id"))
        return (
            scored.select(
                "q_id", "c_id", score_col, F.row_number().over(w).alias("rank")
            )
            .filter(F.col("rank") <= top_k)
            .select("q_id", "c_id", "rank", score_col)
        )
