"""Connected components by min-label propagation, size-gated two ways.

The shared graph core of the near-dup CLUSTER faces (MinHash-LSH text
clusters in queries/text_ops.py, sign-LSH embedding clusters in
queries/vector_ops.py): given the blocked pair list any LSH front end
emits, label every node with the minimum id of its component — the
canonical keeper.

Two regimes (the r11 job-count finding: the iterative loop cost ~25
scheduler round-trips per invocation on graphs of a few thousand edges):

- **Small graphs** (≤ ``single_threshold`` edges, the same gate that
  previously picked coalesce(1)): ONE Spark job — a single-task
  ``mapInPandas`` runs vectorized min-label propagation with pointer
  jumping (numpy, O(E·log D)) over the whole edge list and emits
  (node, label) directly. Executor-side, never a driver loop; exact
  same fixpoint as the iterative path (tests/test_components.py proves
  equality on adversarial chain/star/multi-component graphs).

- **Large graphs**: the distributed loop. Spark has no recursive CTE, so
  components converge by rounds: each node takes the min of its own and
  its neighbours' labels until a fixpoint (<= graph diameter rounds; LSH
  dup clusters are near-cliques, so 2-3 rounds in practice).
  localCheckpoint truncates per-round lineage. Every round is one join +
  one groupBy on the EDGE list — O(dup pairs), already blocked by the
  LSH front end — never on the corpus.

The edge list itself is checkpointed BEFORE symmetrization (r11): the
sym frame unions two projections of the same pair pipeline, and without
the checkpoint both branches re-executed the full LSH front end (the
union's subtrees differ in projection order, so ReuseExchange cannot
dedup them) — the single most expensive part of every cluster face ran
twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _single_task_components(edges: DataFrame) -> DataFrame:
    """(node, label) in ONE single-task Spark job: vectorized min-label
    propagation with pointer jumping over the full (gated-small) edge
    list. numpy's sorted ``unique`` makes index order = id order, so the
    minimum component INDEX is the minimum node id."""

    def uf(batches):
        import numpy as np
        import pandas as pd

        das, dbs = [], []
        for pdf in batches:
            das.append(pdf["da"].to_numpy(dtype="int64", copy=False))
            dbs.append(pdf["db"].to_numpy(dtype="int64", copy=False))
        if not das:
            return
        a = np.concatenate(das)
        b = np.concatenate(dbs)
        if len(a) == 0:
            return
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ea, eb = inv[: len(a)], inv[len(a):]
        parent = np.arange(len(nodes), dtype=np.int64)
        while True:
            # one propagation step: every edge endpoint takes the min of
            # the two endpoint labels (labels only ever decrease, and the
            # component minimum is a fixpoint, so this converges)
            m = np.minimum(parent[ea], parent[eb])
            new = parent.copy()
            np.minimum.at(new, ea, m)
            np.minimum.at(new, eb, m)
            changed = not np.array_equal(new, parent)
            # pointer jumping halves the remaining diameter per round
            parent = new[new]
            if not changed:
                break
        yield pd.DataFrame({"node": nodes, "label": nodes[parent]})

    return edges.coalesce(1).mapInPandas(uf, "node long, label long")


def min_label_components(
    edges: DataFrame, single_threshold: int = 2_000_000
) -> DataFrame:
    """(node, label) for every node appearing in ``edges`` (columns
    ``da``, ``db``); label = min node id of its connected component.
    Isolated nodes (no edges) are absent — callers treat them as their
    own singleton clusters."""
    # checkpoint the PAIR pipeline once: everything downstream (the gate
    # count, both union branches of sym, every propagation round) reads
    # the materialized edge list instead of re-running the LSH front end
    edges = edges.select("da", "db").localCheckpoint(eager=True)
    # the single-task path is numpy-int64 only: non-integral ids (string
    # doc keys) and mismatched endpoint types fall through to the
    # distributed loop, which handles any orderable type — and its output
    # is cast back to the input id type so which side of the gate a graph
    # lands on never changes the schema
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    da_t, db_t = (f.dataType for f in edges.schema.fields)
    integral = isinstance(da_t, (ByteType, ShortType, IntegerType, LongType)) and (
        da_t == db_t
    )
    if integral and edges.count() <= single_threshold:
        out = _single_task_components(edges)
        if not isinstance(da_t, LongType):
            out = out.select(
                F.col("node").cast(da_t).alias("node"),
                F.col("label").cast(da_t).alias("label"),
            )
        return out
    sym = edges.select(F.col("da").alias("a"), F.col("db").alias("b")).unionByName(
        edges.select(F.col("db").alias("a"), F.col("da").alias("b"))
    )
    # past the gate the loop keeps hash partitioning on the join key,
    # because the edge list of a 100 TB corpus is billions of rows
    sym = sym.repartition("a").localCheckpoint(eager=True)
    # round 1 fused into the init: with label(node) == node, the first
    # propagation is just min(node, min(neighbors)) — one groupBy, no join
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("mb"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("mb")).alias("label"),
        )
        .repartition("node")
        .localCheckpoint(eager=True)
    )
    while True:
        neigh = (
            sym.join(labels, sym.a == labels.node)
            .groupBy("b")
            .agg(F.min("label").alias("nlabel"))
        )
        # fold the convergence flag into the same frame: one count on the
        # checkpointed result replaces a join against the previous labels
        new_labels = (
            labels.join(neigh, labels.node == neigh.b, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("new_label"),
                (F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label")).alias(
                    "chg"
                ),
            )
            .withColumnRenamed("new_label", "label")
            .repartition("node")
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels
