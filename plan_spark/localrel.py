"""Arrow-backed local relations.

``spark.createDataFrame(list_of_tuples, schema)`` parallelizes through the
pickled-RDD path: defaultParallelism slivers, per-row Python serialization,
and a measurably slow BroadcastExchange (~6 s observed for a 40-row probe
table on local[32], vs ~0.3 s via Arrow). Every small driver-side table the
engine broadcasts in a query hot path (index probes, PQ lookup tables,
LSH weight matrices, band/bucket tables) must go through pandas+Arrow
instead — that is the whole purpose of this helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Create a small local DataFrame via the Arrow (pandas) path.

    ``rows`` are bound to ``schema`` positionally, exactly like the
    list-of-tuples form of ``createDataFrame``.
    """
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(rows), schema)
