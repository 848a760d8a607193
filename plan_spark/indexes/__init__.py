"""Persistent secondary indexes: build once, search many.

Reference parity: storage2's index lifecycle — a vector index or FTS index
is BUILT from table data, PERSISTED beside it, and then served many queries
(/root/reference/pkg/storage2/ivf_index.go:12-28, fts_index.go:154-330,
fts_persistence.go, incremental_index.go:28-253). The ad-hoc operators in
plan_spark.queries rebuild per query (correctness surface); these classes
are the deployment surface where the build cost amortizes.
"""

from plan_spark.indexes.bq import BqIndex
from plan_spark.indexes.ivf import IvfIndex
from plan_spark.indexes.fts import FtsIndex
from plan_spark.indexes.hnsw import HnswIndex
from plan_spark.indexes.ivf_hnsw import IvfHnswIndex
from plan_spark.indexes.pq import IvfPqIndex, PqIndex
from plan_spark.indexes.sq import SqIndex

__all__ = [
    "BqIndex", "IvfIndex", "FtsIndex", "HnswIndex", "IvfHnswIndex",
    "PqIndex", "IvfPqIndex", "SqIndex",
]
