"""Streaming sink into the versioned dataset layer.

Net-new integration the reference cannot express (its storage2 tables have
no streaming writer): each micro-batch commits one manifest version via the
dataset's optimistic-commit protocol, so a streaming ingest produces the
same auditable version chain as batch writers — and concurrent batch
writers rebase against it.

Exactly-once over replays: the micro-batch id is recorded INSIDE the
manifest commit (``Manifest.stream_state``, threaded through
``Dataset.append(stream_commit=...)``), so data + dedupe marker are one
atomic O_EXCL manifest create. A crash between the data write and the
marker cannot happen (they are the same file), and concurrent writers —
another stream, a batch writer, or a racing replay of this stream — settle
through the optimistic-commit rebase: exactly one replay of a given
(stream_id, batch_id) wins, the rest see DuplicateBatchError and skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from plan_spark.dataset import Dataset
from plan_spark.dataset.dataset import DuplicateBatchError


def append_stream(
    sdf: DataFrame,
    dataset_path: str,
    checkpoint: str,
    dedupe_batches: bool = True,
    available_now: bool = True,
    stream_id: str = "default",
):
    """Start a streaming append into the dataset at ``dataset_path``.

    Returns the StreamingQuery; callers await it. The dataset must exist
    (create it with the stream's schema first). ``stream_id`` names this
    logical stream in the dataset's per-stream batch watermark: replays of
    the same stream (same or fresh checkpoint — batch ids restart at 0)
    dedupe against it, while two genuinely different streams appending to
    the same dataset should pass distinct ids so both make progress."""

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        ds = Dataset.open(batch_df.sparkSession, dataset_path)
        if not dedupe_batches:
            ds.append(batch_df)
            return
        if ds.manifest.stream_state.get(stream_id, -1) >= batch_id:
            return  # fast path: replayed batch, data already committed
        try:
            ds.append(batch_df, stream_commit=(stream_id, batch_id))
        except DuplicateBatchError:
            # lost the race to a concurrent replay of the same batch — the
            # data is in; our orphaned fragment files fall to vacuum()
            return

    writer = (
        sdf.writeStream.foreachBatch(_commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
