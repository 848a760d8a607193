"""Sharded HNSW vector index: per-shard navigable-small-world graphs.

Reference: storage2's HNSW (/root/reference/pkg/storage2/hnsw_index.go:12-46)
— a hierarchical graph walked greedily from a top-level entry point. An HNSW
graph is an inherently single-machine pointer structure, so the Spark-first
deployment shards it: vectors hash-partition into S independent shards, each
shard builds its own graph IN PARALLEL inside applyInPandas (numpy; no graph
ever crosses an executor boundary), and a search fans the query out to every
shard's graph, then merges the per-shard top-k — the same scatter-gather
every distributed ANN service (e.g. sharded HNSW deployments) uses.

Scale shape: build is one shuffle (groupBy shard) + embarrassingly parallel
graph construction; search reads S small graph partitions in parallel and
touches ~ef log N nodes per shard, never the whole corpus. Vectors are
L2-normalized at build and query time so graph distances (L2 on the unit
sphere) are monotone with cosine similarity — results align with the exact
cosine operators (knn_brute).

This is the one index family where the hot path is Python (Arrow-batched
pandas, per shard — never per row): graph walks are pointer-chasing that
DataFrame algebra cannot express; everything around them (sharding,
persistence, fan-out, merge) is DataFrame-native.
"""

from __future__ import annotations

import heapq
import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_NODES_SCHEMA = (
    "shard int, id long, v array<double>, level int, nbrs array<array<long>>"
)


def _write_meta(path: str, **meta) -> None:
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)


def _read_pending(spark: SparkSession, path: str) -> DataFrame | None:
    """(id, v) rows buffered by insert(), or None when the buffer is empty."""
    p = os.path.join(path, "pending")
    if not os.path.isdir(p) or not any(
        f.endswith(".parquet") for f in os.listdir(p)
    ):
        return None
    return spark.read.parquet(p)


def _score_pending(
    pending: DataFrame, qitems, allow, k: int, metric: str = "cosine",
    score_col: str = "cos_sim",
) -> DataFrame:
    """Exact scoring of every query against the (small by invariant) insert
    buffer — the unindexed tail is searched exhaustively, mirroring the
    reference's buffered incremental index (incremental_index.go:28-253).
    Under cosine, buffer vectors are L2-normalized at insert time so the
    plain dot IS the cosine; l2/dot buffers hold raw vectors."""
    qlist = [(int(qid), [float(x) for x in qv]) for qid, qv in qitems]

    def score(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            X = np.asarray(list(pdf["v"]), dtype=np.float64)
            ids = pdf["id"].to_numpy()
            out = {"q_id": [], "c_id": [], score_col: []}
            for qid, qv in qlist:
                q = np.asarray(qv, dtype=np.float64)
                if metric == "l2":
                    sims = -np.linalg.norm(X - q, axis=1)  # higher = better
                else:
                    sims = X @ q
                order = np.argsort(-sims, kind="stable")[: k + 1]
                for j in order:
                    cid = int(ids[j])
                    if cid == qid or (allow is not None and cid not in allow):
                        continue
                    out["q_id"].append(qid)
                    out["c_id"].append(cid)
                    out[score_col].append(
                        -float(sims[j]) if metric == "l2" else float(sims[j])
                    )
            yield pd.DataFrame(out)

    return pending.mapInPandas(score, f"q_id long, c_id long, {score_col} double")


def _dist_fn(metric, np):
    """Graph distance for the chosen metric (reference
    distance_metrics.go:12-96 — L2/Cosine/Dot per index). Cosine uses
    squared L2 over unit vectors (monotone with cosine); dot uses the
    negative inner product (the standard MIPS-as-distance trick)."""
    if metric == "dot":
        return lambda x, q: -float(np.dot(x, q))
    return lambda x, q: float(np.sum((x - q) ** 2))


def _search_layer(qv, entry_pts, ef, adj, X, np, dist=None):
    """Best-first beam search over one graph layer. Returns [(d, node)]
    ascending, at most ef entries."""
    if dist is None:
        dist = _dist_fn("l2", np)
    visited = set(entry_pts)
    cand, best = [], []
    for e in entry_pts:
        d = dist(X[e], qv)
        heapq.heappush(cand, (d, e))
        heapq.heappush(best, (-d, e))
    while cand:
        d, e = heapq.heappop(cand)
        if best and d > -best[0][0]:
            break
        for nb in adj.get(e, ()):
            if nb in visited:
                continue
            visited.add(nb)
            dn = dist(X[nb], qv)
            if len(best) < ef or dn < -best[0][0]:
                heapq.heappush(cand, (dn, nb))
                heapq.heappush(best, (-dn, nb))
                if len(best) > ef:
                    heapq.heappop(best)
    return sorted((-d, e) for d, e in best)


def _unit(df: DataFrame, col: str) -> DataFrame:
    """L2-normalize an array<double> column JVM-side (epsilon-guarded) —
    the one normalization used by every cosine-geometry index path."""
    return (
        df.withColumn(
            "__n",
            F.greatest(
                F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, b: a + b * b)),
                F.lit(1e-12),
            ),
        )
        .withColumn(col, F.transform(col, lambda x: x / F.col("__n")))
        .drop("__n")
    )


def _graph_from_pdf(pdf, np):
    """Rehydrate one persisted shard/cluster graph from its pandas frame.
    Returns (X, ids, adj, entry, max_lvl)."""
    X = np.asarray(list(pdf["v"]), dtype=np.float64)
    ids = pdf["id"].to_numpy()
    pos = {int(v): i for i, v in enumerate(ids)}
    levels = pdf["level"].to_numpy()
    max_lvl = int(levels.max())
    adj = [dict() for _ in range(max_lvl + 1)]
    for i, per_level in enumerate(pdf["nbrs"]):
        for lv, lst in enumerate(per_level):
            adj[lv][i] = [pos[int(x)] for x in lst if int(x) in pos]
    return X, ids, adj, int(np.argmax(levels)), max_lvl


def _walk_pdf(pdf, qiter, metric, score_col, k, beam, allow, np):
    """Walk one graph partition for every query in ``qiter`` ((qid, np
    vector) pairs, already in the metric's geometry). The single walk body
    behind the online search closures AND the batch cogroup closures —
    identical results by construction. Returns a column dict."""
    out = {"q_id": [], "c_id": [], score_col: []}
    if not len(pdf):
        return out
    dist = _dist_fn(metric, np)
    X, ids, adj, entry, max_lvl = _graph_from_pdf(pdf, np)
    for qid, qv in qiter:
        qid = int(qid)
        qv = np.asarray(qv, dtype=np.float64)
        ep = [entry]
        for lv in range(max_lvl, 0, -1):
            ep = [_search_layer(qv, ep, 1, adj[lv], X, np, dist)[0][1]]
        kept = 0
        for d2, e in _search_layer(qv, ep, beam, adj[0], X, np, dist):
            cid = int(ids[e])
            if cid == qid or (allow is not None and cid not in allow):
                continue
            out["q_id"].append(qid)
            out["c_id"].append(cid)
            if metric == "cosine":
                # unit vectors: d2 = 2 - 2 cos  =>  cos = 1 - d2/2
                out[score_col].append(1.0 - d2 / 2.0)
            elif metric == "l2":
                out[score_col].append(float(np.sqrt(max(d2, 0.0))))
            else:  # dot: graph distance is the negative inner product
                out[score_col].append(-d2)
            kept += 1
            if kept > k:
                break
    return out


def _build_graph(X, m, ef_construction, seed, np, dist=None):
    """Construct an HNSW graph over rows of X (pre-normalized iff cosine).
    Returns (levels: int array, adj: list[dict[node, list[node]]])."""
    if dist is None:
        dist = _dist_fn("l2", np)
    n = len(X)
    rng = np.random.default_rng(seed)
    m_l = 1.0 / np.log(m)
    levels = np.minimum(
        np.floor(-np.log(rng.random(n)) * m_l).astype(int), 12
    )
    adj: list[dict[int, list[int]]] = [dict() for _ in range(int(levels.max()) + 1)]
    entry, max_lvl = 0, int(levels[0])
    for lv in range(max_lvl + 1):
        adj[lv][0] = []
    for i in range(1, n):
        lvl = int(levels[i])
        ep = [entry]
        for lv in range(max_lvl, lvl, -1):
            ep = [_search_layer(X[i], ep, 1, adj[lv], X, np, dist)[0][1]]
        for lv in range(min(lvl, max_lvl), -1, -1):
            res = _search_layer(X[i], ep, ef_construction, adj[lv], X, np, dist)
            nbrs = [e for _, e in res[:m]]
            adj[lv][i] = nbrs
            for nb in nbrs:  # bidirectional links, pruned to 2m by distance
                lst = adj[lv].setdefault(nb, [])
                lst.append(i)
                if len(lst) > 2 * m:
                    lst.sort(key=lambda x: dist(X[nb], X[x]))
                    del lst[2 * m :]
            ep = [e for _, e in res]
        if lvl > max_lvl:
            for lv in range(max_lvl + 1, lvl + 1):
                adj[lv].setdefault(i, [])
            entry, max_lvl = i, lvl
    return levels, adj


class HnswIndex:
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
        n_shards: int = 4,
        m: int = 8,
        ef_construction: int = 64,
        seed: int = 42,
        metric: str = "cosine",
    ) -> "HnswIndex":
        """``metric`` ("cosine" | "l2" | "dot") fixes the graph geometry at
        build time (reference distance_metrics.go:12-96 — the metric is an
        index property, not a query option): cosine L2-normalizes and walks
        unit-sphere L2; l2 walks raw L2; dot walks negative inner product."""
        if metric not in ("cosine", "l2", "dot"):
            raise ValueError(f"unknown metric {metric!r}")
        idx = cls(spark, path)
        os.makedirs(idx.path, exist_ok=True)
        e = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
            .cast("int")
            .alias("shard"),
        )

        def build_shard(pdf):
            import numpy as np
            import pandas as pd

            # id-sorted: graph construction order (and therefore the graph)
            # depends only on shard CONTENT, never on shuffle arrival order —
            # makes incremental compact() bit-identical to a fresh build
            pdf = pdf.sort_values("id").reset_index(drop=True)
            X = np.asarray(list(pdf["v"]), dtype=np.float64)
            if metric == "cosine":
                X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            shard = int(pdf["shard"].iloc[0])
            levels, adj = _build_graph(
                X, m, ef_construction, seed + shard, np, _dist_fn(metric, np)
            )
            ids = pdf["id"].to_numpy()
            nbrs = [
                [[int(ids[nb]) for nb in adj[lv].get(i, ())]
                 for lv in range(int(levels[i]) + 1)]
                for i in range(len(X))
            ]
            return pd.DataFrame(
                {
                    "shard": shard,
                    "id": ids,
                    "v": [list(row) for row in X],
                    "level": levels,
                    "nbrs": nbrs,
                }
            )

        (
            e.groupBy("shard")
            .applyInPandas(build_shard, _NODES_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(os.path.join(idx.path, "nodes"))
        )
        _write_meta(
            idx.path, n_shards=n_shards, m=m, ef_construction=ef_construction,
            seed=seed, metric=metric,
        )
        import shutil

        shutil.rmtree(os.path.join(idx.path, "pending"), ignore_errors=True)
        return idx

    # ------------------------------------------------------- incremental
    # ------------------------------------------------------- batch search
    def search_df(
        self,
        queries: DataFrame,
        id_col: str = "q_id",
        vec_col: str = "qv",
        top_k: int = 10,
        ef: int = 48,
    ) -> DataFrame:
        """Batch scatter-gather: queries stay a DataFrame end to end — a
        10^6-query batch never lands on the driver (the collected-dict
        search() is the online path; this is the offline one).

        Shape: queries replicate S ways (one row per shard — the inherent
        scatter of sharded ANN), cogroup(shard) pairs each shard's graph
        with exactly the queries routed to it inside ONE applyInPandas (the
        graph is rebuilt per task from its partition — nothing crosses the
        driver), and a window merges the S*k candidates per query. The
        pending buffer is scored exactly via a broadcast JVM fold join.
        Output matches search(): (q_id, c_id, rank, <score>)."""
        import numpy as np

        meta = _read_meta(self.path)
        metric = meta.get("metric", "cosine")
        score_col = {"cosine": "cos_sim", "l2": "l2_dist", "dot": "dot_sim"}[metric]
        n_shards = int(meta["n_shards"])
        q = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        if metric == "cosine":
            q = _unit(q, "qv")
        # scatter: one (q_id, qv, shard) row per shard — S tiny literal rows,
        # the queries themselves never leave the executors
        qs = q.crossJoin(
            self.spark.range(n_shards).select(F.col("id").cast("int").alias("shard"))
        )
        k, beam = top_k, max(ef, top_k + 1)

        def walk(nodes_pdf, q_pdf):
            import numpy as np
            import pandas as pd

            if not len(q_pdf):
                return pd.DataFrame({"q_id": [], "c_id": [], score_col: []})
            return pd.DataFrame(
                _walk_pdf(
                    nodes_pdf, zip(q_pdf["q_id"], q_pdf["qv"]), metric,
                    score_col, k, beam, None, np,
                )
            )

        per_shard = (
            self.nodes()
            .groupBy("shard")
            .cogroup(qs.groupBy("shard"))
            .applyInPandas(walk, f"q_id long, c_id long, {score_col} double")
        )
        pending = _read_pending(self.spark, self.path)
        if pending is not None:
            # exact tail scan, DataFrame-shaped: broadcast the (small by
            # invariant) buffer against the query stream. Scores are JVM
            # folds (numpy BLAS in _score_pending may associate differently
            # in the last ulp) — the parity tests gate on ranks, not bits.
            pv = F.broadcast(
                pending.select(F.col("id").alias("c_id"), F.col("v").alias("cv"))
            )
            dot = F.aggregate(
                F.zip_with("qv", "cv", lambda x, y: x * y),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            if metric == "l2":
                expr = F.sqrt(
                    F.aggregate(
                        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0),
                        lambda a, b: a + b,
                    )
                )
            else:  # cosine (both sides unit) and dot are plain inner products
                expr = dot
            tail = (
                q.crossJoin(pv)
                .filter(F.col("c_id") != F.col("q_id"))
                .select("q_id", "c_id", expr.alias(score_col))
            )
            per_shard = per_shard.unionByName(tail)
        order = F.asc(score_col) if metric == "l2" else F.desc(score_col)
        w = Window.partitionBy("q_id").orderBy(order, F.asc("c_id"))
        return (
            per_shard.select(
                "q_id", "c_id", score_col, F.row_number().over(w).alias("rank")
            )
            .filter(F.col("rank") <= top_k)
            .select("q_id", "c_id", "rank", score_col)
        )

    def insert(
        self,
        df: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        rebuild_frac: float = 0.25,
    ) -> "HnswIndex":
        """Buffered incremental insert (reference incremental_index.go:28-253
        applied to HNSW): new vectors append to a pending buffer that
        search() scans exactly and merges with the graph walk; once the
        buffer exceeds ``rebuild_frac`` of the graph, compact() re-shards —
        graph quality never degrades because the graphs are only ever built
        whole. Buffer rows are stored in the index's geometry: normalized
        under cosine, raw under l2/dot."""
        norm = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        if _read_meta(self.path).get("metric", "cosine") == "cosine":
            norm = _unit(norm, "v")
        norm.write.mode("append").parquet(os.path.join(self.path, "pending"))
        # recovery BEFORE listing pending: a crashed compact's fold marker
        # means finish_fold is about to delete folded pending files — a
        # listing snapshotted first would make the count() below read
        # paths recovery just removed (Spark FileNotFound)
        self._recover_nodes()
        pending = _read_pending(self.spark, self.path)
        n_graph = self.nodes().count()
        if pending is not None and pending.count() > rebuild_frac * max(n_graph, 1):
            self.compact()
        return self

    def compact(self) -> "HnswIndex":
        """Fold the pending buffer into the sharded graphs (the reference's
        background re-shard): rebuild from nodes + a SNAPSHOT of the
        pending files with the persisted build parameters, into a staging
        dir, then rename-aside swap — the previous build-in-place
        overwrite left a crash mid-write with a partial nodes dir and no
        recovery (silently missing vectors in every later probe).
        Deterministic given content (id-sorted builds)."""
        import shutil

        from plan_spark.indexes.btree import (
            finish_fold,
            snapshot_pending,
            swap_dir,
            write_fold_marker,
        )

        self._recover_nodes()  # finish any interrupted predecessor first
        meta = _read_meta(self.path)
        pend_files = snapshot_pending(self.path)
        merged = self.nodes().select("id", "v")
        if pend_files:
            merged = merged.unionByName(
                self.spark.read.parquet(*pend_files).select("id", "v")
            )
        merged = merged.localCheckpoint(eager=True)  # read before the swap
        tmp = os.path.join(self.path, "compact_tmp")
        shutil.rmtree(tmp, ignore_errors=True)  # stale crashed-compact dir
        HnswIndex.build(
            self.spark, merged, id_col="id", vec_col="v", path=tmp,
            n_shards=meta["n_shards"], m=meta["m"],
            ef_construction=meta["ef_construction"], seed=meta["seed"],
            metric=meta.get("metric", "cosine"),
        )
        write_fold_marker(os.path.join(tmp, "nodes"), pend_files)
        swap_dir(self.path, os.path.join(tmp, "nodes"), "nodes", "hnsw.swap_mid")
        shutil.rmtree(tmp, ignore_errors=True)
        finish_fold(self.path, dir_name="nodes")
        return self

    def _recover_nodes(self) -> None:
        """Self-heal after a crash inside compact()'s swap: restore nodes/
        from nodes_old/, reclaim a completed swap's leftover copy, and
        finish the folded-pending removal so probes never read folded
        vectors twice (duplicate candidates would displace real neighbours
        from a top-k beam). See btree.recover_dir for the race contract."""
        from plan_spark.indexes.btree import recover_dir

        recover_dir(self.path, "nodes")

    # ------------------------------------------------------------- search
    def nodes(self) -> DataFrame:
        self._recover_nodes()
        return self.spark.read.parquet(os.path.join(self.path, "nodes"))

    def search(
        self,
        query_vecs: dict[int, list[float]],
        top_k: int = 10,
        ef: int = 48,
        allowed_ids: set[int] | None = None,
    ) -> DataFrame:
        """Scatter-gather top-k: every shard walks its graph for every query
        (applyInPandas per shard, queries closed over — they are small), then
        one window merges the S*k candidates per query down to k.
        Output: (q_id, c_id, rank, cos_sim).

        ``allowed_ids`` composes a prefilter with the graph walk (reference
        prefilter.go:14-74): traversal still uses every node for routing
        (filtered-HNSW keeps the graph connected), but only allowed ids are
        collected into the beam's result set — the hnswlib filter-function
        pattern. Pass a generous ``ef`` when the filter is very selective.

        The score column follows the BUILD metric: cos_sim (desc) under
        cosine, l2_dist (asc) under l2, dot_sim (desc) under dot."""
        import numpy as np

        metric = _read_meta(self.path).get("metric", "cosine")
        score_col = {"cosine": "cos_sim", "l2": "l2_dist", "dot": "dot_sim"}[metric]
        qitems = [
            (int(qid), np.asarray(qv, dtype=np.float64)) for qid, qv in query_vecs.items()
        ]
        if metric == "cosine":
            qitems = [
                (qid, qv / max(float(np.linalg.norm(qv)), 1e-12)) for qid, qv in qitems
            ]
        k, beam = top_k, max(ef, top_k + 1)
        allow = frozenset(int(x) for x in allowed_ids) if allowed_ids is not None else None

        def search_shard(pdf):
            import numpy as np
            import pandas as pd

            return pd.DataFrame(
                _walk_pdf(pdf, qitems, metric, score_col, k, beam, allow, np)
            )

        per_shard = self.nodes().groupBy("shard").applyInPandas(
            search_shard, f"q_id long, c_id long, {score_col} double"
        )
        pending = _read_pending(self.spark, self.path)
        if pending is not None:
            per_shard = per_shard.unionByName(
                _score_pending(pending, qitems, allow, k, metric, score_col)
            )
        order = F.asc(score_col) if metric == "l2" else F.desc(score_col)
        w = Window.partitionBy("q_id").orderBy(order, F.asc("c_id"))
        return (
            per_shard.select(
                "q_id", "c_id", score_col, F.row_number().over(w).alias("rank")
            )
            .filter(F.col("rank") <= top_k)
            .select("q_id", "c_id", "rank", score_col)
        )
