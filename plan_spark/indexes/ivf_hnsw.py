"""IVF-HNSW composite vector index: KMeans coarse partitions, one HNSW
graph PER CLUSTER.

Reference: storage2's composite index
(/root/reference/pkg/storage2/ivf_hnsw_index.go:16-83) — kmeans prunes the
search to nprobe partitions, then each partition is searched by its own HNSW
graph instead of exhaustively. This is the production ANN default: IVF gives
disk locality + pruning, HNSW gives sub-linear search inside each partition.

Spark-first composition of the two existing designs:

- build  = IvfIndex's distributed KMeans assignment (indexes/ivf.py) feeding
  HnswIndex's per-group graph construction (indexes/hnsw.py) — one shuffle
  (groupBy cluster), graphs built in parallel inside applyInPandas, nodes
  persisted PARTITIONED BY cluster.
- search = IvfIndex's driver-side centroid probe (k rows — query-sized) →
  partition-pruned scan of ONLY the probed cluster directories → per-cluster
  graph walks (each cluster walks only the queries that probed it) → one
  window merge. At 100 TB a search reads nprobe/k of the index files and
  touches ~ef·log(N/k) vectors per probed cluster; the corpus never shuffles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from plan_spark.localrel import local_df

from plan_spark.indexes.hnsw import (
    _build_graph,
    _read_meta,
    _read_pending,
    _score_pending,
    _search_layer,
    _unit,
    _walk_pdf,
    _write_meta,
)

_NODES_SCHEMA = (
    "cluster int, id long, v array<double>, level int, nbrs array<array<long>>"
)


def _make_build_cluster(m: int, ef_construction: int, seed: int):
    """Per-cluster HNSW graph builder (applyInPandas body), id-sorted so the
    graph depends only on cluster content — shared by build() and compact()."""

    def build_cluster(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("id").reset_index(drop=True)
        X = np.asarray(list(pdf["v"]), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        cluster = int(pdf["cluster"].iloc[0])
        levels, adj = _build_graph(X, m, ef_construction, seed + cluster, np)
        ids = pdf["id"].to_numpy()
        nbrs = [
            [[int(ids[nb]) for nb in adj[lv].get(i, ())]
             for lv in range(int(levels[i]) + 1)]
            for i in range(len(X))
        ]
        return pd.DataFrame(
            {
                "cluster": cluster,
                "id": ids,
                "v": [list(row) for row in X],
                "level": levels,
                "nbrs": nbrs,
            }
        )

    return build_cluster


class IvfHnswIndex:
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
        k: int = 16,
        max_iter: int = 8,
        m: int = 8,
        ef_construction: int = 64,
        seed: int = 42,
    ) -> "IvfHnswIndex":
        """Distributed build: MLlib KMeans fits/assigns the coarse clusters,
        then each cluster builds its HNSW graph in parallel (applyInPandas —
        a graph never crosses an executor boundary)."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        idx = cls(spark, path)
        os.makedirs(idx.path, exist_ok=True)
        e = df.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        feat = e.withColumn("features", array_to_vector("v"))
        # random init (see IvfIndex.build): saves the k-means|| init's ~7
        # driver round-trips per build; recall floors gate the quality
        model = KMeans(k=k, seed=seed, maxIter=max_iter, initMode="random").fit(feat)
        # Arrow local relation, NOT createDataFrame(list-of-tuples): the
        # pickled-RDD path measured ~4.8 s just to write k centroid rows
        cents = local_df(
            spark,
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "cluster int, cv array<double>",
        )
        cents.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(idx.path, "centroids.parquet")
        )
        assigned = model.transform(feat).select(
            "id", "v", F.col("prediction").alias("cluster")
        )

        (
            assigned.groupBy("cluster")
            .applyInPandas(
                _make_build_cluster(m, ef_construction, seed), _NODES_SCHEMA
            )
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(os.path.join(idx.path, "nodes"))
        )
        _write_meta(idx.path, m=m, ef_construction=ef_construction, seed=seed)
        import shutil

        shutil.rmtree(os.path.join(idx.path, "pending"), ignore_errors=True)
        return idx

    # ------------------------------------------------------- incremental
    def insert(
        self,
        df: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        rebuild_frac: float = 0.25,
    ) -> "IvfHnswIndex":
        """Buffered incremental insert (reference incremental_index.go:28-253):
        new vectors land in a pending buffer that search() scans exactly and
        merges with the probed-cluster graph walks; past ``rebuild_frac`` of
        the indexed size, compact() folds the buffer in. Centroids stay
        FIXED across compactions (the coarse quantizer is refit only by a
        full build) — standard incremental-IVF semantics."""
        norm = _unit(
            df.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            ),
            "v",
        )
        norm.write.mode("append").parquet(os.path.join(self.path, "pending"))
        # recovery BEFORE listing pending: a crashed compact's fold marker
        # means finish_fold is about to delete folded files — a listing
        # snapshotted first would read paths recovery just removed
        self._recover_nodes()
        pending = _read_pending(self.spark, self.path)
        n_graph = self.nodes().count()
        if pending is not None and pending.count() > rebuild_frac * max(n_graph, 1):
            self.compact()
        return self

    def compact(self) -> "IvfHnswIndex":
        """Fold the pending buffer into the per-cluster graphs: assign each
        buffered vector to its cosine-nearest (fixed) centroid, then rebuild
        only with the persisted graph parameters. Existing nodes keep their
        cluster, so assignment churn is impossible; id-sorted builds make
        the result identical to building from the merged assignment."""
        import numpy as np

        from plan_spark.indexes.btree import snapshot_pending

        self._recover_nodes()  # finish any interrupted predecessor first
        pend_files = snapshot_pending(self.path)
        if not pend_files:
            return self
        pending = self.spark.read.parquet(*pend_files)
        meta = _read_meta(self.path)
        c_rows = sorted(self.centroids().collect(), key=lambda r: r.cluster)
        C = np.array([r.cv for r in c_rows], dtype=np.float64)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        clusters = [int(r.cluster) for r in c_rows]

        def assign(it):
            import numpy as np
            import pandas as pd

            for pdf in it:
                if not len(pdf):
                    continue
                X = np.asarray(list(pdf["v"]), dtype=np.float64)
                nearest = np.argmax(X @ Cn.T, axis=1)
                yield pd.DataFrame(
                    {
                        "cluster": [clusters[j] for j in nearest],
                        "id": pdf["id"].to_numpy(),
                        "v": pdf["v"],
                    }
                )

        assigned_pending = pending.mapInPandas(
            assign, "cluster int, id long, v array<double>"
        )
        merged = (
            self.nodes()
            .select("cluster", "id", "v")
            .unionByName(assigned_pending)
            .localCheckpoint(eager=True)  # read fully before the swap
        )
        # staging + rename-aside swap (scalar-index shape): the previous
        # in-place overwrite left a crash mid-write with a partial nodes
        # dir and no recovery; the fold marker lets _recover_nodes finish
        # the pending cleanup so folded vectors are never candidates twice
        import shutil

        from plan_spark.indexes.btree import (
            finish_fold,
            swap_dir,
            write_fold_marker,
        )

        tmp = os.path.join(self.path, "nodes_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            merged.groupBy("cluster")
            .applyInPandas(
                _make_build_cluster(
                    meta["m"], meta["ef_construction"], meta["seed"]
                ),
                _NODES_SCHEMA,
            )
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(tmp)
        )
        write_fold_marker(tmp, pend_files)
        swap_dir(self.path, tmp, "nodes", "ivf_hnsw.swap_mid")
        finish_fold(self.path, dir_name="nodes")
        return self

    def _recover_nodes(self) -> None:
        """Self-heal after a crash inside compact()'s swap (see
        btree.recover_dir for the restore/leftover/fold contract)."""
        from plan_spark.indexes.btree import recover_dir

        recover_dir(self.path, "nodes")

    # ------------------------------------------------------- batch search
    def search_df(
        self,
        queries: DataFrame,
        id_col: str = "q_id",
        vec_col: str = "qv",
        top_k: int = 5,
        nprobe: int = 4,
        ef: int = 48,
    ) -> DataFrame:
        """Batch composite search: queries stay a DataFrame end to end (the
        offline shape — search()'s driver-side probe is the online path for
        bounded query sets).

        Shape: routing = queries × broadcast(k centroid rows) → per-query
        top-nprobe window (query-sized); cogroup(cluster) pairs each probed
        cluster's graph with exactly the queries that probed it inside ONE
        applyInPandas; the pending tail is scored exactly via a broadcast
        JVM-fold join; one window merges. A 10^6-query batch never touches
        the driver. Output matches search(): (q_id, c_id, rank, cos_sim)."""
        q = _unit(
            queries.select(
                F.col(id_col).alias("q_id"),
                F.col(vec_col).cast("array<double>").alias("qv"),
            ),
            "qv",
        )
        # deliberately NOT ivf._cos: queries are unit vectors here (_unit
        # above), so the |a| factor is dropped from the norm — sharing
        # ivf's two-norm expression would change the float op sequence and
        # break bit-parity with the online path's scores
        cos = lambda a, b: F.aggregate(  # noqa: E731
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
        ) / F.sqrt(
            F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
        )  # |a| = 1 by construction
        wp = Window.partitionBy("q_id").orderBy(F.desc("pscore"), F.asc("cluster"))
        probes = (
            q.crossJoin(F.broadcast(self.centroids()))
            .select("q_id", "qv", "cluster", cos(F.col("qv"), F.col("cv")).alias("pscore"))
            .select("q_id", "qv", "cluster", F.row_number().over(wp).alias("pr"))
            .filter(F.col("pr") <= nprobe)
            .select("q_id", "qv", "cluster")
        )
        k, beam = top_k, max(ef, top_k + 1)

        def walk(nodes_pdf, q_pdf):
            import numpy as np
            import pandas as pd

            if not len(q_pdf):
                return pd.DataFrame({"q_id": [], "c_id": [], "cos_sim": []})
            return pd.DataFrame(
                _walk_pdf(
                    nodes_pdf, zip(q_pdf["q_id"], q_pdf["qv"]), "cosine",
                    "cos_sim", k, beam, None, np,
                )
            )

        per = (
            self.nodes()
            .groupBy("cluster")
            .cogroup(probes.groupBy("cluster"))
            .applyInPandas(walk, "q_id long, c_id long, cos_sim double")
        )
        pending = _read_pending(self.spark, self.path)
        if pending is not None:
            pv = F.broadcast(
                pending.select(F.col("id").alias("c_id"), F.col("v").alias("cv"))
            )
            tail = (
                q.crossJoin(pv)
                .filter(F.col("c_id") != F.col("q_id"))
                .select(
                    "q_id",
                    "c_id",
                    F.aggregate(
                        F.zip_with("qv", "cv", lambda x, y: x * y),
                        F.lit(0.0),
                        lambda a, b: a + b,
                    ).alias("cos_sim"),  # both sides unit vectors
                )
            )
            per = per.unionByName(tail)
        w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
        return (
            per.select("q_id", "c_id", "cos_sim", F.row_number().over(w).alias("rank"))
            .filter(F.col("rank") <= top_k)
            .select("q_id", "c_id", "rank", "cos_sim")
        )

    # ------------------------------------------------------------- search
    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "centroids.parquet"))

    def nodes(self) -> DataFrame:
        self._recover_nodes()
        return self.spark.read.parquet(os.path.join(self.path, "nodes"))

    def search(
        self,
        query_vecs: dict[int, list[float]],
        top_k: int = 5,
        nprobe: int = 4,
        ef: int = 48,
        allowed_ids: set[int] | None = None,
    ) -> DataFrame:
        """Coarse prune + per-cluster graph walk + merge.

        The centroid probe runs driver-side (k rows by construction, like
        IvfIndex.search); each probed cluster walks ONLY the queries that
        probed it. ``allowed_ids`` composes a prefilter exactly as in
        HnswIndex.search (reference prefilter.go:14-74): routing uses all
        nodes, only allowed ids enter the result beam.
        Output: (q_id, c_id, rank, cos_sim)."""
        import numpy as np

        if not query_vecs:
            return self.spark.createDataFrame(
                [], "q_id long, c_id long, rank int, cos_sim double"
            )
        c_rows = sorted(self.centroids().collect(), key=lambda r: r.cluster)
        C = np.array([r.cv for r in c_rows], dtype=np.float64)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        per_cluster: dict[int, list[tuple[int, list[float]]]] = {}
        qitems: list[tuple[int, "np.ndarray"]] = []
        for qid, qv in query_vecs.items():
            q = np.asarray(qv, dtype=np.float64)
            q = q / max(float(np.linalg.norm(q)), 1e-12)
            qitems.append((int(qid), q))
            sims = Cn @ q
            for j in np.argsort(-sims, kind="stable")[:nprobe]:
                per_cluster.setdefault(int(c_rows[j].cluster), []).append(
                    (int(qid), [float(x) for x in q])
                )
        probed = sorted(per_cluster)
        k, beam = top_k, max(ef, top_k + 1)
        allow = frozenset(int(x) for x in allowed_ids) if allowed_ids is not None else None

        def search_cluster(pdf):
            import numpy as np
            import pandas as pd

            cluster = int(pdf["cluster"].iloc[0])
            qitems = per_cluster.get(cluster, ())
            if not qitems:
                return pd.DataFrame({"q_id": [], "c_id": [], "cos_sim": []})
            return pd.DataFrame(
                _walk_pdf(pdf, qitems, "cosine", "cos_sim", k, beam, allow, np)
            )

        per = (
            self.nodes()
            .filter(F.col("cluster").isin(probed))  # partition-pruned on disk
            .groupBy("cluster")
            .applyInPandas(search_cluster, "q_id long, c_id long, cos_sim double")
        )
        pending = _read_pending(self.spark, self.path)
        if pending is not None:
            # the unindexed tail is searched exactly, for every query —
            # buffered rows are findable the moment insert() returns
            per = per.unionByName(_score_pending(pending, qitems, allow, k))
        w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
        return (
            per.select("q_id", "c_id", "cos_sim", F.row_number().over(w).alias("rank"))
            .filter(F.col("rank") <= top_k)
            .select("q_id", "c_id", "rank", "cos_sim")
        )
