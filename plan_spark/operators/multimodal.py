"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs via mapInPandas.

North-star surface (BASELINE.json): treat image/audio/video as binary
columns. The container has no media libraries, so the actual decode is a
clearly-marked STUB (deterministic fake features / NotImplementedError for
real codecs) — but the Spark-side plumbing is real and tested: binary
columns flow through Arrow batches, the UDF is vectorized per partition,
schemas are explicit, and nothing ever materializes on the driver.

Scale: mapInPandas streams Arrow record batches per partition — memory is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob
sizes; repartition upstream controls decode parallelism.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, checksum string, "
    "feat array<double>"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture: the text
    re-encoded as a binary payload with typed metadata — the schema a real
    ingest (image bytes + exif-like metadata) would have."""
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("raw_size"),
        ).alias("meta"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Run the (stub) decoder over the binary column via mapInPandas.

    The batch function is NESTED so cloudpickle ships it by value — workers
    never need this package on their import path (the harness may drive the
    session from any cwd)."""

    def _decode_batch(it: Iterator) -> Iterator:
        # STUB decoder (vectorized): real image/audio decode would go here
        # (PIL/torchaudio etc. are not installed in this container). Emits
        # deterministic features derived from the payload bytes so the
        # pipeline is end-to-end testable; production swaps this closure.
        import pandas as pd

        for pdf in it:
            feats = []
            checks = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                digest = hashlib.md5(b).digest()
                checks.append(hashlib.md5(b).hexdigest())
                # fake 4-dim "embedding" from digest bytes — deterministic
                feats.append([float(x) for x in digest[:4]])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "checksum": checks,
                    "feat": feats,
                }
            )

    return media.mapInPandas(_decode_batch, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB frame sampler signature for video payloads: in this container it
    raises at execution time for non-text media; plumbing kept so the plan
    (binary in -> binary frames out) is schema-checked."""

    def _sample(it: Iterator) -> Iterator:
        for pdf in it:
            if (pdf["media_type"] != "text/plain").any():
                raise NotImplementedError(
                    "video frame decode requires media libs not present in "
                    "this container"
                )
            yield pdf[["doc_id", "media_type", "payload"]]

    return media.mapInPandas(
        _sample, schema="doc_id bigint, media_type string, payload binary"
    )


def resize(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """STUB image resize: real decode->resample->encode needs PIL (absent in
    this container), so payloads are deterministically truncated/padded to
    width*height bytes as a stand-in — the Spark-side contract (binary in,
    binary out + updated metadata, Arrow-batched per partition) is real."""
    n = width * height

    def _resize(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                out.append((b + b"\0" * n)[:n])  # deterministic fake resample
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(
        _resize,
        schema="doc_id bigint, media_type string, payload binary, "
        "width int, height int",
    )
