"""plan_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference system (daviszhen/plan: a Go single-node SQL kernel + a
versioned columnar lakehouse store), re-expressed Spark-first:

- SQL / DataFrame query surface (scans, filters, joins, aggregation, windows,
  set ops, subqueries)  -> declarative DataFrame plans optimized by Catalyst.
- Versioned dataset layer (append/overwrite/delete/update/merge, time travel,
  tags, compaction, vacuum)  -> manifest-versioned Parquet (plan_spark.plans).
- Search & LLM-data-pipeline operators (dedup, similarity/KNN, BM25 full-text
  search, text analysis, multimodal plumbing)  -> DataFrame compositions with
  vectorized pandas UDFs only where built-ins run out.

Design stance: declare the logical plan with DataFrame/SQL, let Catalyst +
Tungsten choose the physical strategy; every operator is written to survive a
1000-executor / 100 TB deployment (partition-parallel, broadcast-aware,
no driver-side materialization).
"""

from plan_spark.session import get_spark
from plan_spark.registry import REGISTRY, load_all

__all__ = ["get_spark", "REGISTRY", "load_all"]
__version__ = "0.1.0"
