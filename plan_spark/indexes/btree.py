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
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plan_spark.faults import fault_point


def probe_file_list(index_path: str, files: list | None) -> list:
    """Materialized file list for a driver-side probe: the given
    fence-selected run files (or EVERY run file under ``runs/`` when fences
    cannot prune) plus the pending buffer. Shared by BtreeIndex.range_ids
    and RtreeIndex.range_ids so the pyarrow faces and the Spark _scan can
    never drift on which files a probe must read."""
    if files is None:
        runs = os.path.join(index_path, "runs")
        files = [
            os.path.join(runs, f) for f in os.listdir(runs) if f.endswith(".parquet")
        ]
    else:
        files = list(files)
    pend = os.path.join(index_path, "pending")
    if os.path.isdir(pend):
        files += [
            os.path.join(pend, f) for f in os.listdir(pend) if f.endswith(".parquet")
        ]
    return files


def read_fences(path: str) -> list:
    """Load the fence table as attribute-accessible rows, without a Spark
    job: it is a single local parquet file of O(n_runs) rows."""
    import types

    import pyarrow.parquet as pq

    return [
        types.SimpleNamespace(**d) for d in pq.read_table(path).to_pylist()
    ]


def publish_fences(table, path: str) -> None:
    """Atomic fence publish: temp sibling + rename, so a probe racing a
    rebuild (fence self-heal runs on the READ path after a crashed
    compact) sees the old table or the new one, never a torn or absent
    file."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path)  # Spark-written dir artifact from older builds
    tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


_TMP_RX = None  # compiled lazily; recover paths must stay import-light


def sweep_dead_tmps(dir_path: str) -> None:
    """Reclaim ``*.tmp.<pid>.<tid>`` / ``*.cas.<pid>.<tid>`` residue from
    CRASHED publishers: a process dying between the temp write and
    os.replace strands a full-size temp that nothing else removes (the
    engine sweeps the analogous catalog temps; index dirs had no sweep,
    and the commit handlers' control-object temps — LocalCommitHandler
    ``.tmp.`` / CasCommitHandler ``.cas.`` — strand identically in the
    dataset control dirs, so vacuum/cleanup_expired sweep those too).
    Only temps whose embedded pid is dead are removed — a LIVE
    publisher's in-flight temp (fence self-heal runs on the read path, so
    concurrent publishers are legal) is never yanked out from under its
    os.replace. Pid reuse can delay one sweep until the recycled pid
    exits; residue stays bounded."""
    global _TMP_RX
    if _TMP_RX is None:
        import re

        _TMP_RX = re.compile(r"\.(?:tmp|cas)\.(\d+)\.\d+$")
    try:
        names = os.listdir(dir_path)
    except OSError:
        return
    for fn in names:
        m = _TMP_RX.search(fn)
        if not m:
            continue
        pid = int(m.group(1))
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
            continue  # owner alive — temp may be in flight
        except ProcessLookupError:
            pass
        except OSError:
            continue  # EPERM etc: pid exists under another uid — leave it
        try:
            os.remove(os.path.join(dir_path, fn))
        except OSError:
            pass  # a concurrent sweeper won


def write_fold_marker(tmp_runs_dir: str, pend_files: list[str]) -> None:
    """Record the pending files a compact folded into ``tmp_runs_dir`` —
    INSIDE the new runs dir, so the marker becomes visible atomically with
    the rename swap. A crash after the swap but before the pending cleanup
    would otherwise leave probes reading the folded rows TWICE (runs and
    pending) — a silent wrong answer from the raw probe faces;
    finish_fold() completes the interrupted removal instead. Spark ignores
    ``_``-prefixed files in a parquet directory and footer_fences filters
    on ``.parquet``, so the marker never pollutes reads."""
    import json

    with open(os.path.join(tmp_runs_dir, "_folded.json"), "w") as fh:
        json.dump([os.path.basename(f) for f in pend_files], fh)


def finish_fold(index_path: str, dir_name: str = "runs") -> None:
    """Complete a (possibly interrupted) compact's pending cleanup: remove
    every pending file the fold marker (inside ``dir_name`` — runs for the
    scalar indexes, nodes for the graph indexes) names, then the marker.
    Idempotent and crash-safe at every step — file removals are
    existence-checked and the marker goes last."""
    import json

    marker = os.path.join(index_path, dir_name, "_folded.json")
    if not os.path.exists(marker):
        return
    try:
        with open(marker) as fh:
            names = json.load(fh)
    except (OSError, ValueError):
        return  # unreadable marker: leave it; the next compact's swap
        # replaces the whole runs dir (marker included) with a fresh one
    pend = os.path.join(index_path, "pending")
    for fn in names:
        try:
            os.remove(os.path.join(pend, fn))
        except FileNotFoundError:
            pass
    try:
        os.remove(marker)
    except FileNotFoundError:
        pass  # a concurrent recovery finished first


def snapshot_pending(index_path: str) -> list[str]:
    """The sorted pending parquet files at this instant — the exact fold
    set a compact merges and later removes. Snapshotting (instead of
    reading the dir wholesale) is what lets concurrent inserts land new
    files without being silently discarded by the cleanup."""
    pend = os.path.join(index_path, "pending")
    if not os.path.isdir(pend):
        return []
    return [
        os.path.join(pend, f)
        for f in sorted(os.listdir(pend))
        if f.endswith(".parquet")
    ]


def recover_dir(index_path: str, name: str) -> None:
    """Crash recovery for a rename-aside-swapped directory ``name`` —
    shared by every index family so a fix lands everywhere at once
    (three hand-rolled copies had already diverged):

    - ``name``/ missing with ``name``_old/ present: the swap died between
      its two renames — restore. The rename is GUARDED: two concurrent
      recoverers race benignly (the loser's ENOENT is swallowed; state is
      correct either way), and a reader firing inside a healthy compact's
      two-syscall swap window must never crash the read.
    - both present: the swap completed but the crash hit before the _old
      cleanup — reclaim the full-size leftover copy now instead of
      waiting for a compact that may never run.
    - finally, finish the folded-pending removal the marker records.
    """
    import shutil

    cur = os.path.join(index_path, name)
    old = cur + "_old"
    if not os.path.isdir(cur) and os.path.isdir(old):
        try:
            os.rename(old, cur)
        except OSError:
            pass  # a concurrent recoverer won the restore
    elif os.path.isdir(cur) and os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)
    finish_fold(index_path, dir_name=name)
    sweep_dead_tmps(index_path)  # crashed publish_fences residue


def swap_dir(index_path: str, new_dir: str, name: str, fault_site: str) -> None:
    """Rename-aside publish of ``new_dir`` as ``index_path``/``name``:
    current goes aside to ``name``_old, the replacement renames in, the
    aside copy is reclaimed. A crash at any point is recoverable by
    recover_dir on the next read. The two-syscall window where ``name``
    is absent is shared with a racing reader's recovery: if that reader
    restores _old first, THIS compact's rename-in fails loudly with
    OSError — the documented retry-the-compact outcome (single-maintainer
    compaction, readers never crash, never a silent wrong answer)."""
    import shutil

    cur = os.path.join(index_path, name)
    old = cur + "_old"
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    os.rename(cur, old)
    fault_point(fault_site)
    os.rename(new_dir, cur)
    shutil.rmtree(old, ignore_errors=True)


def crash_artifacts(index_path: str) -> bool:
    """Cheap probe-path trigger (3 stat calls) for the crashed-compact
    recovery sweep: every crash image inside compact()'s dangerous windows
    leaves at least one of these on disk, because runs_old/ is removed only
    AFTER the fence rewrite and the fold marker only after that. When none
    is present the index is clean and probes skip the fences_stale read
    entirely — recovery must not tax the hot path."""
    runs = os.path.join(index_path, "runs")
    return (
        not os.path.isdir(runs)
        or os.path.isdir(os.path.join(index_path, "runs_old"))
        or os.path.exists(os.path.join(runs, "_folded.json"))
        or not os.path.exists(os.path.join(index_path, "fences.parquet"))
    )


def fences_stale(path: str) -> bool:
    """True when the fence table is missing, unreadable, or names a file
    that no longer exists — the on-disk states a crash between compact()'s
    rename swap and the fence rewrite leaves behind."""
    if not os.path.exists(path):
        return True
    try:
        return any(not os.path.exists(r.file) for r in read_fences(path))
    except Exception:
        return True  # torn/garbled table: rebuild from footers


def footer_fences(
    runs_dir: str, columns: list[str]
) -> list[tuple[str, dict, int]]:
    """[(file, {col: (min, max)}, n_rows)] for every data file under
    ``runs_dir``, read from parquet FOOTERS (no Spark job; O(files) metadata
    reads). Numeric/temporal footer stats are exact by the parquet spec;
    BYTE_ARRAY (string) stats may be writer-truncated, so those fall back
    to an exact single-column read of that file. Zero-row files carry no
    fence (nothing to route to them)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out: list[tuple[str, dict, int]] = []
    for fn in sorted(os.listdir(runs_dir)):
        if not fn.endswith(".parquet"):
            continue
        f = os.path.join(runs_dir, fn)
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        stats: dict = {}
        for col in columns:
            ci = idx[col]
            exact = md.schema.column(ci).physical_type != "BYTE_ARRAY"
            mn = mx = None
            ok = True
            for ri in range(md.num_row_groups):
                st = md.row_group(ri).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            if not (ok and exact):
                mm = pc.min_max(pq.read_table(f, columns=[col]).column(0))
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            stats[col] = (mn, mx)
        out.append((f, stats, md.num_rows))
    return out


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
        # NULL keys are not indexed (the reference B-tree never receives
        # them either — SQL predicates on NULL don't match); an all-NULL run
        # would also have no footer stats to fence with
        pairs = df.select(
            F.col(key_col).alias("key"), F.col(id_col).alias("id")
        ).filter(F.col("key").isNotNull())
        (
            pairs.repartitionByRange(n_runs, "key")
            .sortWithinPartitions("key")
            .write.mode("overwrite")
            .parquet(os.path.join(idx.path, "runs"))
        )
        idx._write_fences()
        return idx

    def _write_fences(self) -> None:
        """Per-file min/max/count from the parquet FOOTERS — no Spark job:
        O(files) footer reads (a few KB each; pyarrow speaks local/S3/HDFS
        alike), which at 100 TB is still file-count work, not row-count
        work. Numeric/temporal footer stats are exact; string stats can be
        truncated by the writer, so string keys fall back to an exact
        single-column read of that file."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = footer_fences(os.path.join(self.path, "runs"), ["key"])
        publish_fences(
            pa.table(
                {
                    "file": [f for f, _, _ in rows],
                    "min_key": [s["key"][0] for _, s, _ in rows],
                    "max_key": [s["key"][1] for _, s, _ in rows],
                    "n": [n for _, _, n in rows],
                }
            ),
            os.path.join(self.path, "fences.parquet"),
        )

    # ------------------------------------------------------------- search
    def _probe_files(self, lo, hi) -> list[str] | None:
        """Fence routing: the run files whose [min,max] interval intersects
        [lo, hi] (None = unbounded side). Returns None when every file
        matches (read the whole runs dir — cheaper than listing paths)."""
        self._recover_runs()  # crashed-compact self-heal before routing
        # the fence table is n_runs rows BY CONSTRUCTION (file-count-sized,
        # never row-count-sized) — one local metadata read, route driver-side
        fences = read_fences(os.path.join(self.path, "fences.parquet"))
        hit = [
            r.file
            for r in fences
            # a fence with unknown stats can never be pruned (soundness)
            if r.min_key is None
            or r.max_key is None
            or ((lo is None or r.max_key >= lo) and (hi is None or r.min_key <= hi))
        ]
        return None if len(hit) == len(fences) else hit

    def _recover_runs(self) -> None:
        """Self-heal after a crash inside compact()'s swap: if runs/ is
        missing but runs_old/ exists, the crash hit between the two
        renames — restore the old runs (pending was not yet cleared, so no
        data is lost; the interrupted compact simply never happened). If
        the fence table names a file the swap replaced (crash between the
        second rename and the fence rewrite), rebuild it from the current
        runs' footers — O(files) work, published atomically. Duplicates
        from a crash before the pending cleanup are benign: every consumer
        folds probe output into a hit SET / interval union."""
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

    def range_ids(self, lo=None, hi=None, in_vals=None) -> list:
        """Driver-side point/range probe: the fence-selected run files plus
        the pending buffer are read with pyarrow (no Spark job) and the
        matching row ids returned as a Python list. Correct at any scale
        but LATENCY-right only when the caller has bounded the match count
        (the scan planner gates on the fence row estimate); large ranges
        should keep using range_query's distributed scan. This is the
        reference's probe shape — IndexSelector reads the B-tree in the
        planning process (index_selector.go:36-78), not via a query job."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if in_vals is not None and not in_vals:
            return []  # `k IN ()` matches nothing
        self._recover_runs()
        files = probe_file_list(self.path, self._probe_files(lo, hi))
        filters = []
        if lo is not None:
            filters.append(("key", ">=", lo))
        if hi is not None:
            filters.append(("key", "<=", hi))
        out: list = []
        for f in files:
            t = pq.read_table(f, columns=["id", "key"], filters=filters or None)
            if in_vals is not None:
                t = t.filter(pc.is_in(t["key"], value_set=pa.array(in_vals)))
            out.extend(t["id"].to_pylist())
        return out

    # --------------------------------------------------------- batch probe
    def range_query_df(self, ranges: DataFrame) -> DataFrame:
        """Batch probe: ``ranges`` is a DataFrame (range_id, lo, hi) that
        never touches the driver — the offline face (range_query is the
        online path, whose driver-side fence routing prunes files per
        probe). ONE scan of the runs serves every range via a broadcast
        range join: per-file pruning doesn't apply across an unbounded
        range set, but the single pass amortizes over the batch, which is
        the correct trade at 10^6 probes. Output: (range_id, id, key)."""
        pairs = self._scan(None)
        r = ranges.select("range_id", "lo", "hi")
        return (
            pairs.join(
                F.broadcast(r),
                (F.col("key") >= F.col("lo")) & (F.col("key") <= F.col("hi")),
            )
            .select("range_id", "id", "key")
        )

    # ------------------------------------------------------------- insert
    def insert(self, df: DataFrame, key_col: str, id_col: str) -> "BtreeIndex":
        """Buffered insert (reference btree_index.go:132 Insert, buffered as
        in incremental_index.go): appended unsorted, scanned by every probe
        (the buffer is small by policy), folded in by compact()."""
        df.select(F.col(key_col).alias("key"), F.col(id_col).alias("id")).filter(
            F.col("key").isNotNull()
        ).write.mode("append").parquet(os.path.join(self.path, "pending"))
        return self

    def compact(self, n_runs: int = 8) -> "BtreeIndex":
        """Fold pending into the runs: rebuild from runs + a SNAPSHOT of the
        pending files (one range shuffle over the index pairs — never the
        base table). Exactly the snapshotted files are removed afterwards,
        via the fold marker written into the new runs dir — so a crash at
        any point either never happened, or is completed by the next
        probe's recovery; folded rows are never readable twice."""
        import shutil

        self._recover_runs()  # finish any interrupted predecessor first
        pend_files = snapshot_pending(self.path)
        merged = self.spark.read.parquet(os.path.join(self.path, "runs"))
        if pend_files:
            merged = merged.unionByName(self.spark.read.parquet(*pend_files))
        tmp = os.path.join(self.path, "runs_tmp")
        (
            merged.repartitionByRange(n_runs, "key")
            .sortWithinPartitions("key")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        write_fold_marker(tmp, pend_files)
        # rename-aside swap (swap_dir): a crash at any point leaves a state
        # recover_dir restores on the next probe; "btree.swap_mid" fires in
        # the runs-absent window
        swap_dir(self.path, tmp, "runs", "btree.swap_mid")
        # crash window: new runs live (fold marker inside), fences still
        # describe the old file names — recovery finishes the fold and
        # rebuilds fences from footers
        fault_point("btree.before_fences")
        self._write_fences()
        finish_fold(self.path)  # remove exactly the folded pending files
        return self
