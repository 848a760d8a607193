"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs via mapInPandas.

North-star surface (BASELINE.json): treat image/audio/video as binary
columns. One REAL codec ships pure-stdlib: 24-bit uncompressed BMP
(encode + decode, bottom-up and top-down variants, row padding) — so the
image family (decode -> features, decode -> resample -> encode) runs on
real encoded bytes end to end. Formats that genuinely need media libraries
absent from this container (JPEG, H.264, ...) remain clearly-marked STUBS
(deterministic fakes / NotImplementedError). The Spark-side plumbing is
identical for both: binary columns flow through Arrow batches, the UDF is
vectorized per partition, schemas are explicit, and nothing ever
materializes on the driver.

Scale: mapInPandas streams Arrow record batches per partition — memory is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob
sizes; repartition upstream controls decode parallelism.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bmp_codec():
    """Factory returning (encode, decode) for 24-bit uncompressed BMP —
    NESTED functions, so a pandas-UDF closure that captures them ships
    them BY VALUE via cloudpickle (workers never need plan_spark on their
    import path; the module-level factory is the repo's convention).

    encode(width, height, rgb) -> bytes: ``rgb`` is row-major top-down
    R,G,B bytes (len == width*height*3). Output is the standard layout:
    14-byte file header + 40-byte BITMAPINFOHEADER, rows stored BOTTOM-UP
    in B,G,R order, each row zero-padded to a 4-byte boundary.

    decode(b) -> (width, height, rgb): accepts both bottom-up (positive
    biHeight) and top-down (negative biHeight) files and returns row-major
    top-down R,G,B bytes; raises ValueError on non-BMP magic, bit depths
    other than 24, or compressed payloads.

    Pixel shuffles (row flip, BGR<->RGB swizzle, stride padding) are numpy
    reshape/slice — integer copies only, bit-identical to the per-row
    reference loops they replaced, and they keep the inner loop out of
    Python at real image sizes (numpy ships on every pandas executor)."""
    import struct

    import numpy as np

    def encode(width: int, height: int, rgb: bytes) -> bytes:
        if len(rgb) != width * height * 3:
            raise ValueError(
                f"rgb length {len(rgb)} != {width}x{height}x3"
            )
        row_raw = width * 3
        pad = (-row_raw) % 4
        row_size = row_raw + pad
        img_size = row_size * height
        out = bytearray()
        out += struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
        out += struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
            2835, 2835, 0, 0,
        )
        img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
        rows = np.zeros((height, row_size), dtype=np.uint8)
        # flip vertically (bottom-up storage) and swizzle RGB -> BGR
        rows[:, :row_raw] = img[::-1, :, ::-1].reshape(height, row_raw)
        out += rows.tobytes()
        return bytes(out)

    def decode(b: bytes):
        if len(b) < 54 or b[:2] != b"BM":
            raise ValueError("not a BMP file (bad magic)")
        data_off = struct.unpack_from("<I", b, 10)[0]
        hdr_size, width, height = struct.unpack_from("<Iii", b, 14)
        planes, bpp = struct.unpack_from("<HH", b, 26)
        compression = struct.unpack_from("<I", b, 30)[0]
        if hdr_size < 40:
            raise ValueError(f"unsupported BMP header size {hdr_size}")
        if bpp != 24:
            raise ValueError(f"unsupported BMP bit depth {bpp} (24 only)")
        if compression != 0:
            raise ValueError(f"unsupported BMP compression {compression}")
        top_down = height < 0
        height = abs(height)
        if width <= 0 or height <= 0:
            raise ValueError(f"invalid BMP dimensions {width}x{height}")
        row_raw = width * 3
        row_size = row_raw + ((-row_raw) % 4)
        if len(b) < data_off + row_size * height:
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            b, dtype=np.uint8, count=row_size * height, offset=data_off
        ).reshape(height, row_size)
        img = rows[:, :row_raw].reshape(height, width, 3)[:, :, ::-1]  # BGR->RGB
        if not top_down:
            img = img[::-1]  # bottom-up storage -> top-down rows
        return width, height, img.tobytes()

    return encode, decode

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


def attach_bmp_payload(docs: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Fixture generator writing REAL encoded bytes: one width x height
    24-bit BMP per document, pixel values from the deterministic formula
    ``32 + (doc_id*7 + i*13) % 95`` (printable ASCII range, so a SQL
    oracle can reproduce both the channel statistics AND the md5 of the
    decoded pixel stream with chr/string_agg). The payload on the wire is
    a genuine BMP file — header, bottom-up rows, padding — which only a
    real decoder can read back."""
    enc, _ = bmp_codec()
    n = width * height * 3

    def _gen(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        # i*13 term is doc-independent: one arange per batch, the d*7
        # offset added per doc — same integers as the scalar formula
        base = (np.arange(n, dtype=np.int64) * 13)

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                px = (32 + (d * 7 + base) % 95).astype(np.uint8).tobytes()
                payloads.append(enc(width, height, px))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/bmp",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(
        _gen, schema="doc_id bigint, media_type string, payload binary"
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Run the decoder over the binary column via mapInPandas:
    ``image/bmp`` payloads take the REAL codec (header parse, bottom-up
    row order, BGR swizzle, padding) and emit exact channel statistics —
    feat = [mean_r, mean_g, mean_b, mean_all] with the checksum being the
    md5 of the DECODED pixel stream (so a wrong decode can never hash
    right); ``text/plain`` keeps the documented stub (md5-derived fake
    features — the placeholder for formats whose codecs aren't in this
    container); anything else is a loud NotImplementedError.

    The batch function is NESTED so cloudpickle ships it by value — workers
    never need this package on their import path (the harness may drive the
    session from any cwd)."""
    _, dec = bmp_codec()

    def _decode_batch(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            checks = []
            for media_type, payload in zip(pdf["media_type"], pdf["payload"]):
                b = bytes(payload)
                if media_type == "image/bmp":
                    w, h, rgb = dec(b)
                    checks.append(hashlib.md5(rgb).hexdigest())
                    npx = w * h
                    # exact integer channel sums (int64, no float accum),
                    # divided in Python — identical to the scalar-loop
                    # result, so oracle hashes are unchanged
                    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
                    csum = px.sum(axis=0, dtype=np.int64)
                    feats.append(
                        [
                            int(csum[0]) / npx,
                            int(csum[1]) / npx,
                            int(csum[2]) / npx,
                            int(csum.sum()) / (npx * 3),
                        ]
                    )
                elif media_type == "text/plain":
                    # STUB for codec-less formats: deterministic fake
                    # features from the payload digest (production swaps
                    # a real decoder into this closure, like the BMP arm)
                    digest = hashlib.md5(b).digest()
                    checks.append(hashlib.md5(b).hexdigest())
                    feats.append([float(x) for x in digest[:4]])
                else:
                    raise NotImplementedError(
                        f"no codec for {media_type!r} in this container "
                        "(image/bmp and text/plain are supported)"
                    )
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
    """Frame sampler: for ``image/bmp`` payloads it REALLY decodes and
    emits every ``every_n``-th pixel row re-encoded as a 1-row BMP (the
    1 -> many frame-extraction contract on real bytes); video codecs
    (H.264 etc.) are genuinely absent from this container, so any other
    media type raises at execution time — plumbing kept so the plan
    (binary in -> binary frames out) is schema-checked."""
    enc, dec = bmp_codec()

    def _sample(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = {"doc_id": [], "media_type": [], "payload": []}
            for doc_id, media_type, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if media_type == "image/bmp":
                    w, h, rgb = dec(bytes(payload))
                    for y in range(0, h, every_n):
                        rows["doc_id"].append(doc_id)
                        rows["media_type"].append(media_type)
                        rows["payload"].append(
                            enc(w, 1, rgb[y * w * 3 : (y + 1) * w * 3])
                        )
                elif media_type == "text/plain":
                    rows["doc_id"].append(doc_id)
                    rows["media_type"].append(media_type)
                    rows["payload"].append(bytes(payload))
                else:
                    raise NotImplementedError(
                        "video frame decode requires media libs not "
                        "present in this container"
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        _sample, schema="doc_id bigint, media_type string, payload binary"
    )


def resize(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize. ``image/bmp`` runs the REAL pipeline — decode,
    nearest-neighbor resample to width x height, re-encode — so the output
    payload is again a valid BMP file (y_src = y*h_in//h_out,
    x_src = x*w_in//w_out; exact integer arithmetic, no resample
    filtering, so an oracle can reproduce every output pixel). Other media
    types keep the documented STUB (truncate/pad to width*height bytes) —
    the Spark-side contract (binary in, binary out + updated metadata,
    Arrow-batched per partition) is identical for both."""
    n = width * height
    enc, dec = bmp_codec()

    def _resize(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        # the nearest-neighbor source grid depends only on target dims,
        # so index vectors are computed once per (w_in, h_in) shape
        ys_cache: dict[tuple[int, int], tuple] = {}

        for pdf in it:
            out = []
            for media_type, payload in zip(pdf["media_type"], pdf["payload"]):
                b = bytes(payload)
                if media_type == "image/bmp":
                    w_in, h_in, rgb = dec(b)
                    key = (w_in, h_in)
                    if key not in ys_cache:
                        ys_cache[key] = (
                            np.arange(height, dtype=np.int64) * h_in // height,
                            np.arange(width, dtype=np.int64) * w_in // width,
                        )
                    ys, xs = ys_cache[key]
                    img = np.frombuffer(rgb, dtype=np.uint8).reshape(
                        h_in, w_in, 3
                    )
                    # integer fancy-indexing == y*h_in//h_out per pixel —
                    # bit-identical to the scalar nearest-neighbor loop
                    px = img[ys][:, xs]
                    out.append(enc(width, height, px.tobytes()))
                else:
                    # STUB resample for codec-less formats
                    out.append((b + b"\0" * n)[:n])
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
