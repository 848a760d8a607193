"""Declared query over the multimodal plumbing (operators/multimodal.py).

The stub decoder derives features from md5(payload), which DuckDB can
replicate over encode(text) — so even the pandas-UDF path is oracle-checked
end-to-end (schema, Arrow binary transfer, per-partition batching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plan_spark.catalog import table
from plan_spark.operators.multimodal import attach_payload, decode_features
from plan_spark.registry import register

# hex pair -> byte value, as portable SQL (instr is 1-based in both engines)
def _byte_sql(i: int) -> str:
    c1 = f"substr(md5_hex, {2 * i + 1}, 1)"
    c2 = f"substr(md5_hex, {2 * i + 2}, 1)"
    return (
        f"CAST((instr('0123456789abcdef', {c1}) - 1) * 16 "
        f"+ (instr('0123456789abcdef', {c2}) - 1) AS DOUBLE)"
    )


_MM_SQL = f"""
WITH m AS (
  SELECT doc_id, 'text/plain' AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS md5_hex
  FROM documents)
SELECT doc_id, media_type, n_bytes, md5_hex AS checksum,
       {_byte_sql(0)} AS f0, {_byte_sql(1)} AS f1,
       {_byte_sql(2)} AS f2, {_byte_sql(3)} AS f3
FROM m
ORDER BY doc_id
"""


@register("multimodal_features", oracle=_MM_SQL, tags=("multimodal", "pandas_udf"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Arrow batches -> vectorized (stub) decoder ->
    typed feature columns. The only Python in the engine's hot paths, and
    it is Arrow-batched mapInPandas, never row-at-a-time."""
    docs = table(spark, sf_dir, "documents")
    media = attach_payload(docs)
    feats = decode_features(media)
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "checksum",
        F.col("feat")[0].alias("f0"),
        F.col("feat")[1].alias("f1"),
        F.col("feat")[2].alias("f2"),
        F.col("feat")[3].alias("f3"),
    ).orderBy("doc_id")
