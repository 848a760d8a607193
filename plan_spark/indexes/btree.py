"""BTree scalar index: range-partitioned sorted runs + file fences.

Reference: storage2 BTreeIndex (/root/reference/pkg/storage2/btree_index.go:12-130
— NewBTreeIndex / EqualityQuery / RangeQuery / Insert returning row IDs).
The reference keeps an in-memory B-tree of key -> rowIDs; the Spark-first
analog of "B-tree over a distributed corpus" is the LSM/Lance shape:

- runs/   (parquet)  — (key, id) range-partitioned ON key and sorted within
  each file, so every file owns a disjoint key interval (the "leaf level").
- fences.parquet     — per-file (file, min_key, max_key, n) — the "inner
  nodes": a file-count-sized table that routes a probe to the leaf files
  that can contain it.
- pending/ (parquet) — unsorted buffered inserts (reference
  incremental_index.go buffered adds); compact() folds them into the runs.

A probe reads fences (metadata-sized), selects the overlapping run files,
and scans ONLY those paths — at 100 TB an equality probe touches one file
(plus parquet row-group pruning inside it, since the file is sorted by
key); a range probe touches ceil(selectivity * n_files). No shuffle at
query time; the single build-time shuffle is the repartitionByRange.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BtreeIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)

    # ------------------------------------------------------------- build
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        df: DataFrame,
        key_col: str,
        id_col: str,
        path: str | None = None,
        n_runs: int = 8,
    ) -> "BtreeIndex":
        """One range-shuffle: (key, id) pairs land in ``n_runs`` files with
        disjoint sorted key intervals. At 100 TB pick n_runs so each run is
        a few hundred MB; the fence table stays n_runs rows either way."""
        idx = cls(spark, path)
        os.makedirs(idx.path, exist_ok=True)
        pairs = df.select(
            F.col(key_col).alias("key"), F.col(id_col).alias("id")
        )
        (
            pairs.repartitionByRange(n_runs, "key")
            .sortWithinPartitions("key")
            .write.mode("overwrite")
            .parquet(os.path.join(idx.path, "runs"))
        )
        idx._write_fences()
        return idx

    def _write_fences(self) -> None:
        """Per-file min/max/count — one metadata-cheap agg over the runs
        (columnar scan of the key column only)."""
        runs = self.spark.read.parquet(os.path.join(self.path, "runs"))
        (
            runs.groupBy(F.input_file_name().alias("file"))
            .agg(
                F.min("key").alias("min_key"),
                F.max("key").alias("max_key"),
                F.count("*").alias("n"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(self.path, "fences.parquet"))
        )

    # ------------------------------------------------------------- search
    def _probe_files(self, lo, hi) -> list[str] | None:
        """Fence routing: the run files whose [min,max] interval intersects
        [lo, hi] (None = unbounded side). Returns None when every file
        matches (read the whole runs dir — cheaper than listing paths)."""
        # the fence table is n_runs rows BY CONSTRUCTION (file-count-sized,
        # never row-count-sized) — one collect, route driver-side
        fences = self.spark.read.parquet(
            os.path.join(self.path, "fences.parquet")
        ).collect()
        hit = [
            r.file
            for r in fences
            if (lo is None or r.max_key >= lo) and (hi is None or r.min_key <= hi)
        ]
        return None if len(hit) == len(fences) else hit

    def _scan(self, files: list[str] | None) -> DataFrame:
        if files is None:
            base = self.spark.read.parquet(os.path.join(self.path, "runs"))
        elif not files:
            base = self.spark.createDataFrame(
                [], self.spark.read.parquet(os.path.join(self.path, "runs")).schema
            )
        else:
            base = self.spark.read.parquet(*files)
        pend = os.path.join(self.path, "pending")
        if os.path.isdir(pend) and any(
            f.endswith(".parquet") for f in os.listdir(pend)
        ):
            base = base.unionByName(self.spark.read.parquet(pend))
        return base

    def range_query(self, lo=None, hi=None) -> DataFrame:
        """(id, key) rows with lo <= key <= hi (either bound optional) —
        reference btree_index.go:89 RangeQuery. Fence-pruned file list +
        the same predicate pushed into the parquet scan (row-group pruning
        inside each sorted run)."""
        out = self._scan(self._probe_files(lo, hi))
        if lo is not None:
            out = out.filter(F.col("key") >= F.lit(lo))
        if hi is not None:
            out = out.filter(F.col("key") <= F.lit(hi))
        return out.select("id", "key")

    def equality_query(self, value) -> DataFrame:
        """Reference btree_index.go:111 EqualityQuery — a degenerate range."""
        return self.range_query(value, value)

    # ------------------------------------------------------------- insert
    def insert(self, df: DataFrame, key_col: str, id_col: str) -> "BtreeIndex":
        """Buffered insert (reference btree_index.go:132 Insert, buffered as
        in incremental_index.go): appended unsorted, scanned by every probe
        (the buffer is small by policy), folded in by compact()."""
        df.select(F.col(key_col).alias("key"), F.col(id_col).alias("id")).write.mode(
            "append"
        ).parquet(os.path.join(self.path, "pending"))
        return self

    def compact(self, n_runs: int = 8) -> "BtreeIndex":
        """Fold pending into the runs: rebuild from runs+pending (one range
        shuffle over the index pairs — never the base table)."""
        import shutil

        merged = self._scan(None)
        tmp = os.path.join(self.path, "runs_tmp")
        (
            merged.repartitionByRange(n_runs, "key")
            .sortWithinPartitions("key")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        shutil.rmtree(os.path.join(self.path, "runs"))
        os.rename(tmp, os.path.join(self.path, "runs"))
        shutil.rmtree(os.path.join(self.path, "pending"), ignore_errors=True)
        self._write_fences()
        return self
