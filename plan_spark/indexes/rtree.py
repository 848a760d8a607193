"""RTree spatial index: z-order-packed runs + per-file bounding boxes.

Reference: storage2 RTreeIndex (/root/reference/pkg/storage2/rtree_index.go:17-370
— NewRTreeIndex / RangeSearch (intersects) / ContainsSearch /
NearestNeighbors returning row IDs). The reference keeps an in-memory
R-tree of bounding boxes; the Spark-first analog is STR-style spatial
packing:

- runs/   (parquet) — (id, xmin, xmax, ymin, ymax) range-partitioned on a
  bit-interleaved z-value of the box center, so spatially-near boxes land
  in the same file ("leaf nodes" with tight MBRs).
- fences.parquet    — per-file MBR (file, xlo, xhi, ylo, yhi, n): the inner
  nodes. File-count-sized; probes route driver-side.
- pending/          — buffered inserts, folded in by compact().

Points index as degenerate boxes (min == max). A box probe prunes to the
files whose MBR intersects the query, then applies the exact predicate
inside the scan — at 100 TB a selective box reads O(result) files, and
query time does no shuffle. kNN walks files in min-distance order and
stops once the kth-best distance beats the next file's MBR distance —
the classic branch-and-bound over the packed leaves, with file count
(not row count) driving the driver-side loop.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plan_spark.faults import fault_point
from plan_spark.session import driver_sized


def _interleave(bx, by):
    """Bit-interleave two 16-bit bucket columns into a z-value."""
    z = F.lit(0).cast("bigint")
    for j in range(16):
        z = (
            z
            + F.shiftleft(F.shiftright(bx, j).bitwiseAND(F.lit(1)).cast("bigint"), 2 * j)
            + F.shiftleft(F.shiftright(by, j).bitwiseAND(F.lit(1)).cast("bigint"), 2 * j + 1)
        )
    return z


class RtreeIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)

    # ------------------------------------------------------------- build
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        df: DataFrame,
        x_col: str,
        y_col: str,
        id_col: str,
        path: str | None = None,
        n_runs: int = 8,
        x2_col: str | None = None,
        y2_col: str | None = None,
    ) -> "RtreeIndex":
        """Pack boxes into ``n_runs`` spatially-coherent files. Points:
        pass (x_col, y_col); boxes: also (x2_col, y2_col) as the max
        corner. One global min/max agg fixes the z-grid, one range shuffle
        packs — the same two-job build cost as the z-order compactor."""
        idx = cls(spark, path)
        os.makedirs(idx.path, exist_ok=True)
        # rows with any NULL coordinate are not indexed (no box to place;
        # an all-NULL run would also have no footer stats to fence with)
        boxes = df.select(
            F.col(id_col).alias("id"),
            F.col(x_col).cast("double").alias("xmin"),
            F.col(x2_col or x_col).cast("double").alias("xmax"),
            F.col(y_col).cast("double").alias("ymin"),
            F.col(y2_col or y_col).cast("double").alias("ymax"),
        ).filter(
            F.col("xmin").isNotNull() & F.col("xmax").isNotNull()
            & F.col("ymin").isNotNull() & F.col("ymax").isNotNull()
        )
        with driver_sized(spark):
            b = boxes.agg(
                F.min("xmin").alias("xlo"), F.max("xmax").alias("xhi"),
                F.min("ymin").alias("ylo"), F.max("ymax").alias("yhi"),
            ).collect()[0]
        xlo, ylo = b.xlo or 0.0, b.ylo or 0.0
        xspan = ((b.xhi or 0.0) - xlo) or 1.0
        yspan = ((b.yhi or 0.0) - ylo) or 1.0

        def bucket(center, lo, span):
            return F.least(
                F.lit(65535),
                F.greatest(
                    F.lit(0),
                    F.floor((center - F.lit(lo)) / F.lit(span) * 65536).cast("int"),
                ),
            )

        cx = (F.col("xmin") + F.col("xmax")) / 2
        cy = (F.col("ymin") + F.col("ymax")) / 2
        (
            boxes.withColumn(
                "__z", _interleave(bucket(cx, xlo, xspan), bucket(cy, ylo, yspan))
            )
            .repartitionByRange(n_runs, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode("overwrite")
            .parquet(os.path.join(idx.path, "runs"))
        )
        idx._write_fences()
        return idx

    def _write_fences(self) -> None:
        """Per-file MBRs from the parquet FOOTERS — no Spark job, O(files)
        metadata reads (see btree.footer_fences). The MBR combines min of
        the min-corner columns with max of the max-corner columns."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from plan_spark.indexes.btree import footer_fences, publish_fences

        rows = footer_fences(
            os.path.join(self.path, "runs"), ["xmin", "xmax", "ymin", "ymax"]
        )
        publish_fences(
            pa.table(
                {
                    "file": [f for f, _, _ in rows],
                    "xlo": [s["xmin"][0] for _, s, _ in rows],
                    "xhi": [s["xmax"][1] for _, s, _ in rows],
                    "ylo": [s["ymin"][0] for _, s, _ in rows],
                    "yhi": [s["ymax"][1] for _, s, _ in rows],
                    "n": [n for _, _, n in rows],
                }
            ),
            os.path.join(self.path, "fences.parquet"),
        )

    # ------------------------------------------------------------- search
    def _fences(self):
        from plan_spark.indexes.btree import read_fences

        self._recover_runs()  # crashed-compact self-heal before routing
        return read_fences(os.path.join(self.path, "fences.parquet"))

    def _recover_runs(self) -> None:
        """Self-heal after a crash inside compact()'s swap (see
        BtreeIndex._recover_runs): restore runs_old/ when runs/ vanished,
        and rebuild fences from the current runs' footers when they name
        replaced files (crash between the swap and the fence rewrite)."""
        from plan_spark.indexes.btree import (
            crash_artifacts,
            fences_stale,
            recover_dir,
        )

        if not crash_artifacts(self.path):
            return  # clean index: zero cost beyond three stat calls
        recover_dir(self.path, "runs")
        if fences_stale(os.path.join(self.path, "fences.parquet")):
            self._write_fences()

    def _scan(self, files: list[str] | None) -> DataFrame:
        self._recover_runs()
        if files is None:
            base = self.spark.read.parquet(os.path.join(self.path, "runs"))
        elif not files:
            # schema from the runs dir, not a literal — ids may be strings
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

    def _mbr_hit_files(self, qxmin, qymin, qxmax, qymax) -> list | None:
        """MBR fence routing: run files whose box intersects the query box
        (None = every file hit — read the runs dir wholesale). Shared by
        the distributed range_search and the driver-side range_ids so the
        two faces prune identically."""
        fences = self._fences()
        hit = [
            r.file
            for r in fences
            # unknown-stat fences are never pruned (soundness)
            if None in (r.xlo, r.xhi, r.ylo, r.yhi)
            or (r.xhi >= qxmin and r.xlo <= qxmax and r.yhi >= qymin and r.ylo <= qymax)
        ]
        return None if len(hit) == len(fences) else hit

    def range_search(self, qxmin, qymin, qxmax, qymax) -> DataFrame:
        """Boxes INTERSECTING the query box (reference rtree_index.go:260
        RangeSearch). File-level MBR pruning, then the exact intersect
        predicate pushed into the pruned scan."""
        files = self._mbr_hit_files(qxmin, qymin, qxmax, qymax)
        return self._scan(files).filter(
            (F.col("xmax") >= F.lit(qxmin))
            & (F.col("xmin") <= F.lit(qxmax))
            & (F.col("ymax") >= F.lit(qymin))
            & (F.col("ymin") <= F.lit(qymax))
        )

    def range_ids(self, qxmin, qymin, qxmax, qymax) -> list:
        """Driver-side box probe (BtreeIndex.range_ids analogue): the
        MBR-fence-selected run files plus the pending buffer are read with
        pyarrow — no Spark job — and the ids of intersecting boxes
        returned as a list. Latency-right only for bounded probes (the
        scan planner gates on the fence row estimate); wide boxes keep the
        distributed range_search."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from plan_spark.indexes.btree import probe_file_list

        self._recover_runs()
        files = probe_file_list(
            self.path, self._mbr_hit_files(qxmin, qymin, qxmax, qymax)
        )
        out: list = []
        for f in files:
            t = pq.read_table(f, columns=["id", "xmin", "xmax", "ymin", "ymax"])
            mask = pc.and_(
                pc.and_(pc.greater_equal(t["xmax"], qxmin), pc.less_equal(t["xmin"], qxmax)),
                pc.and_(pc.greater_equal(t["ymax"], qymin), pc.less_equal(t["ymin"], qymax)),
            )
            out.extend(t.filter(mask)["id"].to_pylist())
        return out

    def range_search_df(self, boxes: DataFrame) -> DataFrame:
        """Batch box probe: ``boxes`` is a DataFrame (box_id, qxmin, qymin,
        qxmax, qymax) that never touches the driver — the offline face
        (range_search is the online path with per-probe MBR file pruning).
        ONE scan of the runs serves every box via a broadcast theta join on
        the intersect predicate; the single pass amortizes over the batch.
        Output: the stored box columns plus box_id."""
        rows = self._scan(None)
        b = boxes.select("box_id", "qxmin", "qymin", "qxmax", "qymax")
        return (
            rows.join(
                F.broadcast(b),
                (F.col("xmax") >= F.col("qxmin"))
                & (F.col("xmin") <= F.col("qxmax"))
                & (F.col("ymax") >= F.col("qymin"))
                & (F.col("ymin") <= F.col("qymax")),
            )
            .select("box_id", "id", "xmin", "xmax", "ymin", "ymax")
        )

    def contains_search(self, qxmin, qymin, qxmax, qymax) -> DataFrame:
        """Boxes fully CONTAINED in the query box (rtree_index.go:296
        ContainsSearch) — same pruning, tighter predicate."""
        return self.range_search(qxmin, qymin, qxmax, qymax).filter(
            (F.col("xmin") >= F.lit(qxmin))
            & (F.col("xmax") <= F.lit(qxmax))
            & (F.col("ymin") >= F.lit(qymin))
            & (F.col("ymax") <= F.lit(qymax))
        )

    def nearest_neighbors(self, x: float, y: float, k: int) -> list[tuple]:
        """Branch-and-bound kNN (rtree_index.go:332 NearestNeighbors):
        visit files in ascending MBR-min-distance order; stop when the
        kth-best found distance is <= the next unvisited file's MBR
        distance. Returns [(id, dist)] ascending — k is small by contract
        (point-lookup API, like take_rows), so the result is driver-sized;
        each visited file is scanned with a Spark job that reduces to its
        own top-k before collecting."""

        def mbr_dist(r) -> float:
            if None in (r.xlo, r.xhi, r.ylo, r.yhi):
                return 0.0  # unknown stats: must always visit
            # sqrt(dx*dx + dy*dy), the SAME arithmetic as the candidate
            # scoring expression below — hypot rounds differently in the
            # last ulp, which could mis-prune a file at an exact boundary
            dx = max(r.xlo - x, 0.0, x - r.xhi)
            dy = max(r.ylo - y, 0.0, y - r.yhi)
            return math.sqrt(dx * dx + dy * dy)

        order = sorted(self._fences(), key=mbr_dist)
        # d*d, not pow(d,2): multiplication is bit-deterministic across
        # engines, so the returned distances hash-match a SQL oracle
        dx = F.greatest(F.col("xmin") - x, F.lit(0.0), F.lit(x) - F.col("xmax"))
        dy = F.greatest(F.col("ymin") - y, F.lit(0.0), F.lit(y) - F.col("ymax"))
        dist = F.sqrt(dx * dx + dy * dy)
        best: list[tuple] = []  # (dist, id) ascending

        def topk(batch) -> None:
            rows = (
                batch.select("id", dist.alias("d"))
                .orderBy(F.asc("d"), F.asc("id"))
                .limit(k)
                .collect()
            )
            best[:] = sorted(best + [(row.d, row.id) for row in rows])[:k]

        # the pending buffer has no fences: always scanned, up front (so an
        # index whose runs are empty still answers from buffered inserts)
        pend = os.path.join(self.path, "pending")
        if os.path.isdir(pend) and any(
            f.endswith(".parquet") for f in os.listdir(pend)
        ):
            topk(self.spark.read.parquet(pend))
        for r in order:
            # strict <: a file whose MBR distance EQUALS the kth-best must
            # still be visited — it may hold an equal-distance point with a
            # smaller id, and the (dist, id) tiebreak decides top-k
            if len(best) >= k and best[k - 1][0] < mbr_dist(r):
                break
            topk(self.spark.read.parquet(r.file))
        return [(i, d) for d, i in best]

    # ------------------------------------------------------------- insert
    def insert(
        self,
        df: DataFrame,
        x_col: str,
        y_col: str,
        id_col: str,
        x2_col: str | None = None,
        y2_col: str | None = None,
    ) -> "RtreeIndex":
        """Buffered insert (rtree_index.go:146 Insert): appended unsorted,
        scanned by every probe, folded in by compact()."""
        df.select(
            F.col(id_col).alias("id"),
            F.col(x_col).cast("double").alias("xmin"),
            F.col(x2_col or x_col).cast("double").alias("xmax"),
            F.col(y_col).cast("double").alias("ymin"),
            F.col(y2_col or y_col).cast("double").alias("ymax"),
        ).filter(
            F.col("xmin").isNotNull() & F.col("xmax").isNotNull()
            & F.col("ymin").isNotNull() & F.col("ymax").isNotNull()
        ).write.mode("append").parquet(os.path.join(self.path, "pending"))
        return self

    def compact(self, n_runs: int = 8) -> "RtreeIndex":
        """Re-pack runs + a SNAPSHOT of the pending files (one range
        shuffle over the index rows); the fold marker in the new runs dir
        lets recovery finish the pending cleanup after a crash, so folded
        rows are never readable twice (see btree.write_fold_marker)."""
        import shutil
        import uuid

        from plan_spark.indexes.btree import (
            finish_fold,
            snapshot_pending,
            swap_dir,
            write_fold_marker,
        )

        self._recover_runs()  # finish any interrupted predecessor first
        # a crashed compact strands its uuid-named rebuild dir (a full
        # index copy); single-maintainer means any one present here is
        # stale — reclaim before building another
        for fn in os.listdir(self.path):
            if fn.startswith("rebuild_"):
                shutil.rmtree(os.path.join(self.path, fn), ignore_errors=True)
        pend_files = snapshot_pending(self.path)
        merged = self.spark.read.parquet(os.path.join(self.path, "runs"))
        if pend_files:
            merged = merged.unionByName(self.spark.read.parquet(*pend_files))
        tmp = os.path.join(self.path, f"rebuild_{uuid.uuid4().hex[:8]}")
        RtreeIndex.build(
            self.spark, merged, "xmin", "ymin", "id",
            path=tmp, n_runs=n_runs, x2_col="xmax", y2_col="ymax",
        )
        write_fold_marker(os.path.join(tmp, "runs"), pend_files)
        swap_dir(self.path, os.path.join(tmp, "runs"), "runs", "rtree.swap_mid")
        # crash window: new runs live, fences still name the old files —
        # fences_stale() triggers the rebuild on the next probe (fences
        # store absolute paths, so the rebuild's own fences in tmp are
        # useless and self._write_fences recomputes from the final dir)
        fault_point("rtree.before_fences")
        self._write_fences()
        shutil.rmtree(tmp, ignore_errors=True)
        finish_fold(self.path)  # remove exactly the folded pending files
        return self
