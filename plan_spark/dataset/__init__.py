"""Versioned dataset layer — manifest-versioned Parquet tables.

PySpark-native re-design of the reference's storage2/SDK surface
(/root/reference/sdk/dataset.go:96-213, pkg/storage2/manifest.go:17-43):
versioned snapshots, append/overwrite/delete/update/merge, deletion
vectors, time travel, tags, optimistic-concurrency commits with a
conflict/rebase matrix, compaction and vacuum — with all data operations
as Spark jobs and all metadata operations as driver-side JSON.
"""

from plan_spark.dataset.dataset import ConflictError, Dataset, DuplicateBatchError

__all__ = ["Dataset", "ConflictError", "DuplicateBatchError"]
