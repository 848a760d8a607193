"""Row-granular bitmap index: per-value row-id RUNS (RLE bitmaps).

Reference: storage2 BitmapIndex (/root/reference/pkg/storage2/bitmap_index.go:20-130
— per-value compressed row bitmaps; EqualityQuery returns row IDs). The
Spark-first analog of "a roaring bitmap per distinct value" is a run-length
table: for each (value, maximal-ish run of consecutive row ids) one row
``(key, lo, hi, n)``. Low-NDV columns compress extremely well under RLE —
a fragment whose rows all share one value is ONE run — and runs are the
natural currency for routing (they stab fragment row-id intervals directly,
without ever expanding to per-row ids).

Layout (all under the index dir):
- runs/          (parquet) — (key, lo, hi, n) range-partitioned on
  (key, lo) and sorted within each file, so a probe for one value touches
  the files owning that key's range only.
- fences.parquet — per-run-file (file, min_key, max_key, n) routing table
  (file-count-sized), same machinery as the btree index.
- keystats.parquet — per-VALUE (key, n_rows, n_runs): the NDV-sized
  cardinality table (the reference bitmap's GetCardinality), giving the
  scan planner an EXACT selectivity estimate for equality/IN conjuncts —
  sharper than any min/max fence arithmetic.
- pending/       (parquet) — buffered raw (key, id) inserts (reference
  incremental_index.go shape, same as btree); probes fold them in as
  singleton runs; compact() merges them into the runs WITHOUT expanding
  existing runs back to rows (interval union, runs-count work).

Scale notes (100 TB): the build is one shuffle on (key, blk) where
``blk = id div BLOCK`` bounds every window partition to BLOCK rows — a
billion-row value never lands in one task (runs may split at block
boundaries, which costs at most rows/BLOCK extra runs and changes no
answer). Probes are fence-routed file reads; nothing row-count-sized ever
reaches the driver — drivers see RUNS, executors see runs + explode.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from plan_spark.faults import fault_point
from plan_spark.indexes.btree import (
    crash_artifacts,
    fences_stale,
    finish_fold,
    footer_fences,
    probe_file_list,
    publish_fences,
    read_fences,
    recover_dir,
    snapshot_pending,
    swap_dir,
    write_fold_marker,
)

# window partitions during the build are bounded to this many rows; runs
# never span a block boundary (bounded split overhead, see module doc)
_BLOCK = 1 << 20


class BitmapIndex:
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
        n_runs: int = 4,
    ) -> "BitmapIndex":
        """One shuffle on (key, id-block): consecutive ids per value become
        (key, lo, hi, n) run rows via the id - row_number() islands trick,
        windowed inside fixed-size id blocks so no task ever holds more
        than _BLOCK rows regardless of value skew."""
        idx = cls(spark, path)
        os.makedirs(idx.path, exist_ok=True)
        pairs = df.select(
            F.col(key_col).alias("key"), F.col(id_col).cast("long").alias("id")
        ).filter(F.col("key").isNotNull())
        blk = F.floor(F.col("id") / F.lit(_BLOCK)).alias("blk")
        w = Window.partitionBy("key", "blk").orderBy("id")
        runs = (
            pairs.select("key", "id", blk)
            # id - row_number is constant exactly along a consecutive-id run
            .withColumn("grp", F.col("id") - F.row_number().over(w))
            # (key, blk) clustering satisfies the (key, blk, grp) groupBy —
            # no second shuffle; grp is constant within a block-local run
            .groupBy("key", "blk", "grp")
            .agg(
                F.min("id").alias("lo"),
                F.max("id").alias("hi"),
                F.count(F.lit(1)).alias("n"),
            )
            .select("key", "lo", "hi", "n")
        )
        idx._write_runs(runs, n_runs)
        return idx

    def _write_runs(self, runs: DataFrame, n_runs: int) -> None:
        (
            runs.repartitionByRange(n_runs, "key", "lo")
            .sortWithinPartitions("key", "lo")
            .write.mode("overwrite")
            .parquet(os.path.join(self.path, "runs"))
        )
        self._write_meta()

    def _write_meta(self) -> None:
        """fences (per-file key range + data-row count) and keystats
        (per-value row/run counts). Both metadata-sized: fences is
        file-count rows; keystats is NDV rows, read from the runs files
        driver-side (runs tables are runs-count-sized by construction)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        runs_dir = os.path.join(self.path, "runs")
        fen = footer_fences(runs_dir, ["key"])
        # n in the fence = DATA rows covered by the file's runs (cost
        # estimates are about data rows, not run rows)
        data_n, stats = [], {}
        for f, _s, _n in fen:
            t = pq.read_table(f, columns=["key", "n"])
            data_n.append(sum(t["n"].to_pylist()))
            for k, n in zip(t["key"].to_pylist(), t["n"].to_pylist()):
                rows, cnt = stats.get(k, (0, 0))
                stats[k] = (rows + n, cnt + 1)
        # keystats FIRST, fences LAST: fences.parquet is the staleness
        # sentinel the crash recovery keys on (fences_stale in
        # _recover_runs), so it must be the COMMIT point of the meta pair —
        # a crash between the two publishes then leaves fences stale and
        # the next probe rebuilds both; the reverse order would leave fresh
        # fences over stale keystats forever
        keys = sorted(stats)
        publish_fences(
            pa.table(
                {
                    "key": keys,
                    "n_rows": [stats[k][0] for k in keys],
                    "n_runs": [stats[k][1] for k in keys],
                }
            ),
            os.path.join(self.path, "keystats.parquet"),
        )
        # crash window between the meta pair's two publishes: keystats is
        # new, fences still old -> stale -> the next probe rebuilds BOTH
        fault_point("bitmap.meta_mid")
        publish_fences(
            pa.table(
                {
                    "file": [f for f, _, _ in fen],
                    "min_key": [s["key"][0] for _, s, _ in fen],
                    "max_key": [s["key"][1] for _, s, _ in fen],
                    "n": data_n,
                }
            ),
            os.path.join(self.path, "fences.parquet"),
        )

    # ------------------------------------------------------------- meta
    def keystats(self) -> dict:
        """{value: (n_rows, n_runs)} — the NDV-sized cardinality table."""
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(self.path, "keystats.parquet"))
        return {
            k: (r, c)
            for k, r, c in zip(
                t["key"].to_pylist(), t["n_rows"].to_pylist(), t["n_runs"].to_pylist()
            )
        }

    def pending_rows(self) -> int:
        """Buffered-insert row count from parquet footers (no Spark job)."""
        import pyarrow.parquet as pq

        pend = os.path.join(self.path, "pending")
        if not os.path.isdir(pend):
            return 0
        return sum(
            pq.ParquetFile(os.path.join(pend, f)).metadata.num_rows
            for f in os.listdir(pend)
            if f.endswith(".parquet")
        )

    def _recover_runs(self) -> None:
        """Self-heal after a crash inside compact()'s swap (mirror of
        BtreeIndex._recover_runs): restore runs/ from runs_old/ if the
        crash hit between the two renames, and rebuild fences+keystats
        from the current runs' footers if the crash hit before the meta
        rewrite (they would otherwise name replaced files forever).
        A crash before the pending cleanup leaves folded singletons that
        probes also read — benign: in_runs interval-unions and the query
        faces apply distinct()."""
        if not crash_artifacts(self.path):
            return  # clean index: zero cost beyond three stat calls
        recover_dir(self.path, "runs")
        if fences_stale(os.path.join(self.path, "fences.parquet")):
            self._write_meta()

    # ------------------------------------------------------------- search
    def _probe_files(self, values) -> list[str] | None:
        self._recover_runs()  # crashed-compact self-heal before routing
        fences = read_fences(os.path.join(self.path, "fences.parquet"))
        hit = [
            r.file
            for r in fences
            if r.min_key is None
            or r.max_key is None
            or any(r.min_key <= v <= r.max_key for v in values)
        ]
        return None if len(hit) == len(fences) else hit

    @staticmethod
    def _merge_runs(runs: list[tuple[int, int]]) -> list[tuple[int, int]]:
        """Union of [lo, hi] intervals, merging overlaps AND adjacency."""
        out: list[tuple[int, int]] = []
        for lo, hi in sorted(runs):
            if out and lo <= out[-1][1] + 1:
                out[-1] = (out[-1][0], max(out[-1][1], hi))
            else:
                out.append((lo, hi))
        return out

    def in_runs(self, values) -> list[tuple[int, int]]:
        """Driver-side probe: row-id runs for ``key IN values`` — the
        fence-selected run files plus the pending buffer read with pyarrow
        (zero Spark jobs; reference index_selector.go probes indexes in the
        planning process too). Output size is runs-count, never row-count.
        Deleted rows may still appear inside a run (supersets are sound —
        the deletion-vector anti-join drops them at scan/take time)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        values = list(values)
        if not values:
            return []
        files = probe_file_list(self.path, self._probe_files(values))
        vset = pa.array(values)
        out: list[tuple[int, int]] = []
        for f in files:
            if os.path.dirname(f).endswith("pending"):
                t = pq.read_table(f, columns=["key", "id"])
                t = t.filter(pc.is_in(t["key"], value_set=vset))
                out.extend((i, i) for i in t["id"].to_pylist())
            else:
                t = pq.read_table(f, columns=["key", "lo", "hi"])
                t = t.filter(pc.is_in(t["key"], value_set=vset))
                out.extend(zip(t["lo"].to_pylist(), t["hi"].to_pylist()))
        return self._merge_runs(out)

    def equality_runs(self, value) -> list[tuple[int, int]]:
        return self.in_runs([value])

    def runs_df(self, values) -> DataFrame:
        """Distributed probe face: (lo, hi) run rows for ``key IN values``
        — fence-pruned runs scan plus pending singletons, for when the run
        count itself is too large to route driver-side."""
        values = list(values)
        self._recover_runs()  # crashed-compact self-heal before any read
        runs_dir = os.path.join(self.path, "runs")
        if not values:
            # isin() with zero operands is invalid SQL; the contract matches
            # in_runs([]) — no values, no runs (reachable when contradictory
            # equality conjuncts intersect to the empty set upstream)
            return self.spark.createDataFrame(
                [], self.spark.read.parquet(runs_dir).schema
            ).select("lo", "hi")
        files = self._probe_files(values)
        if files is None:
            base = self.spark.read.parquet(runs_dir)
        elif not files:
            base = self.spark.createDataFrame(
                [], self.spark.read.parquet(runs_dir).schema
            )
        else:
            base = self.spark.read.parquet(*files)
        out = base.filter(F.col("key").isin(*values)).select("lo", "hi")
        pend = os.path.join(self.path, "pending")
        if os.path.isdir(pend) and any(
            f.endswith(".parquet") for f in os.listdir(pend)
        ):
            p = (
                self.spark.read.parquet(pend)
                .filter(F.col("key").isin(*values))
                .select(F.col("id").alias("lo"), F.col("id").alias("hi"))
            )
            out = out.unionByName(p)
        return out

    def equality_query(self, value) -> DataFrame:
        """Reference bitmap_index.go EqualityQuery — matching row IDs as a
        DataFrame(id). Runs expand executor-side (explode over sequence);
        the driver never sees row-count-sized data."""
        return (
            self.runs_df([value])
            .select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("id"))
            .distinct()
        )

    def in_query(self, values) -> DataFrame:
        return (
            self.runs_df(list(values))
            .select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("id"))
            .distinct()
        )

    # ------------------------------------------------------------- insert
    def insert(self, df: DataFrame, key_col: str, id_col: str) -> "BitmapIndex":
        """Buffered insert (reference incremental_index.go shape): raw
        (key, id) pairs appended unsorted; probes fold them in as singleton
        runs; compact() merges. keystats stays build-time (estimates only —
        pending_rows() lets planners account for the buffered tail)."""
        df.select(
            F.col(key_col).alias("key"), F.col(id_col).cast("long").alias("id")
        ).filter(F.col("key").isNotNull()).write.mode("append").parquet(
            os.path.join(self.path, "pending")
        )
        return self

    def compact(self, n_runs: int = 4) -> "BitmapIndex":
        """Fold pending into the runs WITHOUT expanding intervals to rows:
        union (existing runs + pending singletons), then interval-union per
        (key, block) — runs-count work end to end."""
        import shutil

        self._recover_runs()  # finish any interrupted predecessor first
        runs_dir = os.path.join(self.path, "runs")
        cur = self.spark.read.parquet(runs_dir)
        # Snapshot the pending files BEFORE reading: an insert()/
        # refresh_index() landing between read and cleanup appends new part
        # files, and folding the whole dir would silently discard them —
        # routing would then wrongly prune fragments containing those rows.
        # Only the files actually folded into this merge are deleted below.
        pend_files = snapshot_pending(self.path)
        if pend_files:
            p = self.spark.read.parquet(*pend_files).select(
                "key",
                F.col("id").alias("lo"),
                F.col("id").alias("hi"),
                F.lit(1).cast("long").alias("n"),
            )
            cur = cur.unionByName(p)
        blk = F.floor(F.col("lo") / F.lit(_BLOCK)).alias("blk")
        w = Window.partitionBy("key", "blk").orderBy("lo", "hi")
        prevmax = F.max("hi").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        merged = (
            cur.select("key", "lo", "hi", "n", blk)
            .withColumn(
                "brk",
                F.when(
                    prevmax.isNull() | (F.col("lo") > prevmax + 1), F.lit(1)
                ).otherwise(F.lit(0)),
            )
            .withColumn(
                "grp",
                F.sum("brk").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .groupBy("key", "blk", "grp")
            # n re-sums exactly because pending ids are NEW rows (stable row
            # ids are never reused), so overlap only happens run-vs-run from
            # a prior compact, which the adjacency merge handles with
            # hi-lo+1 re-derivation below being unnecessary: runs from the
            # build are exact and disjoint per key
            .agg(
                F.min("lo").alias("lo"),
                F.max("hi").alias("hi"),
                F.sum("n").alias("n"),
            )
            .select("key", "lo", "hi", "n")
        )
        tmp = os.path.join(self.path, "runs_tmp")
        (
            merged.repartitionByRange(n_runs, "key", "lo")
            .sortWithinPartitions("key", "lo")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        write_fold_marker(tmp, pend_files)
        swap_dir(self.path, tmp, "runs", "bitmap.swap_mid")
        # crash window: new runs live (fold marker inside), fences/keystats
        # still name the old files — recovery finishes the fold and
        # rebuilds the meta from footers
        fault_point("bitmap.before_meta")
        self._write_meta()
        # remove exactly the folded pending files; concurrent appends survive
        finish_fold(self.path)
        return self
