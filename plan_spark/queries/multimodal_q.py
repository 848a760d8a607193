"""Declared query over the multimodal plumbing (operators/multimodal.py).

The stub decoder derives features from md5(payload), which DuckDB can
replicate over encode(text) — so even the pandas-UDF path is oracle-checked
end-to-end (schema, Arrow binary transfer, per-partition batching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plan_spark.catalog import table
from plan_spark.operators.multimodal import (
    attach_bmp_payload,
    attach_payload,
    decode_features,
    resize,
)
from plan_spark.registry import register

# the BMP fixture's pixel formula (operators/multimodal.attach_bmp_payload):
# pixel i of doc d = 32 + (d*7 + i*13) % 95 — printable ASCII, so DuckDB
# reproduces the channel means AND the md5 of the decoded pixel stream
_BMP_W, _BMP_H = 16, 16
_BMP_N = _BMP_W * _BMP_H * 3

_MM_SQL = f"""
WITH px AS (
  SELECT doc_id, i, 32 + (doc_id * 7 + i * 13) % 95 AS v
  FROM documents, unnest(range(0, {_BMP_N})) AS u(i))
SELECT doc_id,
       CAST({_BMP_W} AS BIGINT) AS width,
       CAST({_BMP_H} AS BIGINT) AS height,
       md5(string_agg(chr(CAST(v AS INTEGER)), '' ORDER BY i)) AS checksum,
       CAST(SUM(CASE WHEN i % 3 = 0 THEN v END) AS DOUBLE) / {_BMP_W * _BMP_H}
         AS mean_r,
       CAST(SUM(CASE WHEN i % 3 = 1 THEN v END) AS DOUBLE) / {_BMP_W * _BMP_H}
         AS mean_g,
       CAST(SUM(CASE WHEN i % 3 = 2 THEN v END) AS DOUBLE) / {_BMP_W * _BMP_H}
         AS mean_b,
       CAST(SUM(v) AS DOUBLE) / {_BMP_N} AS mean_all
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""


@register("multimodal_features", oracle=_MM_SQL, tags=("multimodal", "pandas_udf"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode on the hash path: every document gets a genuine
    16x16 24-bit BMP payload (real header, bottom-up rows, BGR, padding —
    operators/multimodal.attach_bmp_payload), and decode_features parses
    the file back with the pure-stdlib codec to emit exact per-channel
    means + the md5 of the DECODED pixel stream. The oracle rebuilds the
    pixels from the generator formula — so any header-offset, row-order,
    channel-swizzle, or padding bug in the decoder breaks the hash.
    Arrow-batched mapInPandas, never row-at-a-time."""
    docs = table(spark, sf_dir, "documents")
    media = attach_bmp_payload(docs, _BMP_W, _BMP_H)
    feats = decode_features(media)
    return feats.select(
        "doc_id",
        F.lit(_BMP_W).cast("bigint").alias("width"),
        F.lit(_BMP_H).cast("bigint").alias("height"),
        "checksum",
        F.col("feat")[0].alias("mean_r"),
        F.col("feat")[1].alias("mean_g"),
        F.col("feat")[2].alias("mean_b"),
        F.col("feat")[3].alias("mean_all"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Frame sampling: the video-processing shape (decode -> sample every k-th
# fixed-size frame -> per-frame features) over the opaque payload column.
# One input row fans out to N frame rows INSIDE the Arrow batch — the
# 1->many mapInPandas contract a real frame extractor needs.
# ---------------------------------------------------------------------------

_FRAME, _STRIDE_B = 256, 512
_FRAME_DOCS = 300


def _frame_kernels():
    """THE byte-window sampler, built fresh per query call so closures
    capture NESTED functions: cloudpickle ships nested functions BY VALUE,
    while a module-level function would ship as an importable reference —
    and workers must never need plan_spark on their import path (the
    operators/multimodal.py convention). Returns (frame_windows,
    frame_checksums): the one extraction kernel every frame-shaped
    operator shares (same slicing, same stride semantics, fixed here)."""

    def frame_windows(pdf, frame: int, stride: int):
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            for idx, off in enumerate(range(0, len(b), stride)):
                yield doc_id, idx, off, b[off : off + frame]

    def frame_checksums(pdf, frame: int, stride: int):
        import hashlib as _h

        for doc_id, _idx, _off, w in frame_windows(pdf, frame, stride):
            yield doc_id, _h.md5(w).hexdigest()

    return frame_windows, frame_checksums

_FRAMES_SQL = f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < {_FRAME_DOCS}),
off AS (
  SELECT doc_id, text, unnest(range(1, length(text) + 1, {_STRIDE_B})) AS o
  FROM d)
SELECT doc_id,
       CAST((o - 1) / {_STRIDE_B} AS BIGINT) AS frame_idx,
       CAST(o - 1 AS BIGINT) AS frame_off,
       CAST(length(substr(text, o, {_FRAME})) AS BIGINT) AS n_bytes,
       md5(substr(text, o, {_FRAME})) AS checksum
FROM off
ORDER BY doc_id, frame_idx
"""


@register("multimodal_frames", oracle=_FRAMES_SQL, tags=("multimodal", "pandas_udf"))
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled fixed-size frames from the binary payload (every other
    256-byte window), one output row per frame with offset/size/checksum —
    the exact plumbing shape of video frame extraction, with the codec
    replaced by byte slicing (the fixture is ASCII, so the oracle's
    character windows are byte-identical).

    Scale: mapInPandas streams Arrow batches per partition; the 1->N fanout
    happens inside the batch (no explode shuffle), memory bounded by
    maxRecordsPerBatch x frame count per doc, and the corpus never touches
    the driver."""
    import pandas as pd  # noqa: F401 (cloudpickle ships the closure)

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _FRAME_DOCS)
    media = attach_payload(docs)

    _fw, _ = _frame_kernels()

    def _frames(it):
        import hashlib as _h

        import pandas as _pd

        for pdf in it:
            rows = {
                "doc_id": [],
                "frame_idx": [],
                "frame_off": [],
                "n_bytes": [],
                "checksum": [],
            }
            for doc_id, idx, off, w in _fw(pdf, _FRAME, _STRIDE_B):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(idx)
                rows["frame_off"].append(off)
                rows["n_bytes"].append(len(w))
                rows["checksum"].append(_h.md5(w).hexdigest())
            yield _pd.DataFrame(rows)

    out = media.mapInPandas(
        _frames,
        "doc_id bigint, frame_idx bigint, frame_off bigint, n_bytes bigint, "
        "checksum string",
    )
    return out.orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# Audio-shape features: windowed RMS over the payload interpreted as a
# sample stream — the decode -> window -> per-window scalar feature shape
# of audio processing (and, with a 2-D block index, of image resize).
# ---------------------------------------------------------------------------

_WIN = 64
_AUDIO_DOCS = 200

_AUDIO_SQL = f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < {_AUDIO_DOCS}),
off AS (
  SELECT doc_id, text, unnest(range(1, length(text) + 1, {_WIN})) AS o
  FROM d),
w AS (SELECT doc_id, o, substr(text, o, {_WIN}) AS win FROM off),
s AS (
  SELECT doc_id, o, ascii(substr(win, i, 1)) AS b
  FROM w, unnest(range(1, length(win) + 1)) AS u(i))
SELECT doc_id,
       CAST((o - 1) / {_WIN} AS BIGINT) AS window_idx,
       COUNT(*) AS n_samples,
       sqrt(CAST(SUM(b * b) AS DOUBLE) / COUNT(*)) AS rms
FROM s GROUP BY doc_id, o
ORDER BY doc_id, window_idx
"""


@register("multimodal_audio", oracle=_AUDIO_SQL, tags=("multimodal", "pandas_udf"))
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS over the payload sample stream (64-byte windows): the
    audio feature-extraction shape with the codec replaced by raw bytes.
    RMS is sqrt(exact-integer sum / count), so the doubles are engine-
    identical without any decimal routing.

    Scale: the window fanout and the per-window reduction both happen
    inside the Arrow batch (numpy over the byte buffer) — no explode
    shuffle, no Python-per-row; a real resampler/filterbank swaps into the
    same closure."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _AUDIO_DOCS)
    media = attach_payload(docs)

    def _rms(it):
        import math as _m

        import pandas as _pd

        for pdf in it:
            rows = {"doc_id": [], "window_idx": [], "n_samples": [], "rms": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx, off in enumerate(range(0, len(b), _WIN)):
                    w = b[off : off + _WIN]
                    sq = sum(x * x for x in w)
                    rows["doc_id"].append(doc_id)
                    rows["window_idx"].append(idx)
                    rows["n_samples"].append(len(w))
                    rows["rms"].append(_m.sqrt(sq / len(w)))
            yield _pd.DataFrame(rows)

    out = media.mapInPandas(
        _rms, "doc_id bigint, window_idx bigint, n_samples bigint, rms double"
    )
    return out.orderBy("doc_id", "window_idx")


# ---------------------------------------------------------------------------
# Image-resize shape: the payload as a row-major W-wide byte raster,
# nearest-neighbor downsampled 2x through the REAL BMP codec (decode ->
# resample -> re-encode -> decode).
# ---------------------------------------------------------------------------

_RESIZE_DOCS = 400
_RSZ_W, _RSZ_H = 8, 8  # 16x16 BMP -> 8x8 nearest-neighbor (exact 2x)
_RSZ_N = _RSZ_W * _RSZ_H * 3

# output pixel j: c = j%3, x2 = (j/3)%W2, y2 = (j/3)/W2; nearest-neighbor
# source index = (y2*H//H2 * W + x2*W//W2)*3 + c over the generator formula
_RESIZE_SQL = f"""
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < {_RESIZE_DOCS}),
px AS (
  SELECT doc_id, j,
         32 + (doc_id * 7
               + (((j // 3) // {_RSZ_W}) * {_BMP_H // _RSZ_H} * {_BMP_W}
                  + ((j // 3) % {_RSZ_W}) * {_BMP_W // _RSZ_W}) * 39
               + (j % 3) * 13) % 95 AS v
  FROM d, unnest(range(0, {_RSZ_N})) AS u(j))
SELECT doc_id,
       CAST({_RSZ_W} AS BIGINT) AS width,
       CAST({_RSZ_H} AS BIGINT) AS height,
       md5(string_agg(chr(CAST(v AS INTEGER)), '' ORDER BY j)) AS checksum,
       CAST(SUM(CASE WHEN j % 3 = 0 THEN v END) AS DOUBLE) / {_RSZ_W * _RSZ_H}
         AS mean_r,
       CAST(SUM(v) AS DOUBLE) / {_RSZ_N} AS mean_all
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""


@register("multimodal_resize", oracle=_RESIZE_SQL, tags=("multimodal", "pandas_udf"))
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode -> resample -> encode -> decode on the hash path: each
    document's genuine 16x16 BMP is decoded, nearest-neighbor downsampled
    to 8x8, RE-ENCODED as a valid BMP (operators/multimodal.resize), and
    decoded AGAIN by decode_features — so the emitted channel means and
    decoded-pixel md5 certify the full round trip, not just one parse.
    The oracle computes every output pixel from the generator formula via
    the same integer nearest-neighbor map.

    Scale: per-payload work stays in the pandas closure (no per-pixel
    explode shuffle); a filtering resampler (PIL/opencv) swaps into the
    same closure with the same contract."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _RESIZE_DOCS)
    media = attach_bmp_payload(docs, _BMP_W, _BMP_H)
    small = resize(media, _RSZ_W, _RSZ_H).select("doc_id", "media_type", "payload")
    feats = decode_features(small)
    return feats.select(
        "doc_id",
        F.lit(_RSZ_W).cast("bigint").alias("width"),
        F.lit(_RSZ_H).cast("bigint").alias("height"),
        "checksum",
        F.col("feat")[0].alias("mean_r"),
        F.col("feat")[3].alias("mean_all"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Cross-video duplicate-frame detection: the frame-extraction plumbing above
# composed with checksum-level dedup — the standard video near-dup pipeline
# (sample frames -> perceptual/exact fingerprint -> bucket -> per-asset
# duplication accounting), with the codec stubbed to byte slicing.
# ---------------------------------------------------------------------------

_DF_FRAME, _DF_STRIDE = 64, 64
_DF_DOCS = 300

_MM_DEDUP_SQL = f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < {_DF_DOCS}),
off AS (
  SELECT doc_id, unnest(range(1, length(text) + 1, {_DF_STRIDE})) AS o, text
  FROM d),
f AS (SELECT doc_id, md5(substr(text, o, {_DF_FRAME})) AS checksum FROM off),
g AS (SELECT checksum, COUNT(DISTINCT doc_id) AS nd FROM f GROUP BY checksum)
SELECT f.doc_id,
       COUNT(*) AS n_frames,
       CAST(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_frames,
       CAST(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS dup_frac
FROM f JOIN g ON f.checksum = g.checksum
GROUP BY f.doc_id
ORDER BY doc_id
"""


@register("multimodal_dedup", oracle=_MM_DEDUP_SQL, tags=("multimodal", "dedup"))
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-asset duplicate-frame accounting: frames sampled from each
    binary payload inside the Arrow batch (the multimodal_frames plumbing,
    64-byte frames), fingerprinted, and a frame is a duplicate when its
    checksum appears in >= 2 distinct assets. Per asset: frame count,
    duplicated-frame count, duplicated fraction — the signal that drives
    intro/outro/watermark removal and near-dup video collapse.

    Scale shape: extraction is mapInPandas (1->N inside the batch, no
    explode shuffle); the checksum aggregate is one shuffle (map-side
    combinable), the duplicate flag joins frames back on the SAME checksum
    partitioning (shuffle_hash pinned — the flag table is
    frame-proportional, never broadcastable), and the per-asset rollup is
    one doc-keyed shuffle. Identical dataflow to dup_passages one layer
    down the stack (bytes, not tokens)."""
    import pandas as pd  # noqa: F401 (cloudpickle ships the closure)

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _DF_DOCS)
    media = attach_payload(docs)

    _, _fc = _frame_kernels()

    def _frames(it):
        import pandas as _pd

        for pdf in it:
            rows = {"doc_id": [], "checksum": []}
            for doc_id, cs in _fc(pdf, _DF_FRAME, _DF_STRIDE):
                rows["doc_id"].append(doc_id)
                rows["checksum"].append(cs)
            yield _pd.DataFrame(rows)

    # the frame table feeds BOTH the checksum aggregate and the join probe
    # inside ONE job — lazy persist does not dedupe concurrent computation
    # (dedup_simhash's lesson), so materialize first or the Python
    # extraction runs twice. Checksum rows are far smaller than payloads:
    # caching them is cheap at any scale, re-decoding is not.
    f = media.mapInPandas(_frames, "doc_id bigint, checksum string").persist()
    f.count()
    g = f.groupBy("checksum").agg(F.count_distinct("doc_id").alias("nd"))
    return (
        f.join(g.hint("shuffle_hash"), "checksum")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_frames"),
            (
                F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )
