"""Pure-stdlib BMP codec (operators/multimodal.bmp_codec): spec compliance
against hand-built golden bytes (not just self-roundtrip), padding, both row
orders, loud rejection of unsupported variants, and the real decode ->
nearest-neighbor resample -> encode pipeline."""

from __future__ import annotations

import random
import struct

import pytest

from plan_spark.operators.multimodal import bmp_codec

ENC, DEC = bmp_codec()


def _golden_2x2() -> bytes:
    """A 2x2 24-bit BMP built field-by-field from the spec, bottom-up:
    top row = red, green; bottom row = blue, white."""
    # rows are 2*3=6 bytes + 2 pad; pixel order in file: BOTTOM row first
    img = (
        b"\xff\x00\x00" + b"\xff\xff\xff" + b"\x00\x00"  # blue(BGR), white
        + b"\x00\x00\xff" + b"\x00\xff\x00" + b"\x00\x00"  # red(BGR), green
    )
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return hdr + info + img


def test_decode_golden_bytes():
    w, h, rgb = DEC(_golden_2x2())
    assert (w, h) == (2, 2)
    # top-down RGB: red, green / blue, white
    assert rgb == bytes(
        [255, 0, 0, 0, 255, 0] + [0, 0, 255, 255, 255, 255]
    )


def test_encode_matches_golden_bytes():
    rgb = bytes([255, 0, 0, 0, 255, 0] + [0, 0, 255, 255, 255, 255])
    assert ENC(2, 2, rgb) == _golden_2x2()


def test_top_down_variant_decodes():
    """Negative biHeight = top-down storage: same pixels, no row flip."""
    g = bytearray(_golden_2x2())
    struct.pack_into("<i", g, 22, -2)  # height := -2
    # rows are now interpreted FIRST row first: swap them to keep the image
    g[54:62], g[62:70] = g[62:70], g[54:62]
    w, h, rgb = DEC(bytes(g))
    assert (w, h) == (2, 2)
    assert rgb == DEC(_golden_2x2())[2]


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 4), (16, 16), (7, 3)])
def test_roundtrip_with_padding(w, h):
    """Widths 3, 5, 7 force 1-3 pad bytes per row — the classic corruption
    point for hand-rolled BMP code."""
    rng = random.Random(42 + w * 100 + h)
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    enc = ENC(w, h, rgb)
    assert len(enc) == 54 + ((w * 3 + 3) & ~3) * h
    assert DEC(enc) == (w, h, rgb)


def test_rejects_bad_inputs():
    with pytest.raises(ValueError, match="bad magic"):
        DEC(b"PNG" + b"\0" * 60)
    with pytest.raises(ValueError, match="rgb length"):
        ENC(2, 2, b"\0" * 5)
    g = bytearray(_golden_2x2())
    struct.pack_into("<H", g, 28, 8)  # bpp := 8
    with pytest.raises(ValueError, match="bit depth"):
        DEC(bytes(g))
    g = bytearray(_golden_2x2())
    struct.pack_into("<I", g, 30, 1)  # compression := RLE8
    with pytest.raises(ValueError, match="compression"):
        DEC(bytes(g))
    with pytest.raises(ValueError, match="truncated"):
        DEC(_golden_2x2()[:-4])


def test_nearest_neighbor_resize_pipeline(spark):
    """decode -> NN resample -> re-encode through the Spark operator equals
    the naive per-pixel reference on real encoded inputs."""
    from plan_spark.operators.multimodal import resize

    w_in, h_in, w_out, h_out = 6, 4, 3, 2
    rng = random.Random(7)
    rgb = bytes(rng.randrange(256) for _ in range(w_in * h_in * 3))
    media = spark.createDataFrame(
        [(1, "image/bmp", ENC(w_in, h_in, rgb))],
        "doc_id bigint, media_type string, payload binary",
    )
    out = resize(media, w_out, h_out).collect()[0]
    assert (out.width, out.height) == (w_out, h_out)
    got_w, got_h, got = DEC(bytes(out.payload))
    assert (got_w, got_h) == (w_out, h_out)
    want = bytearray()
    for y in range(h_out):
        for x in range(w_out):
            src = ((y * h_in // h_out) * w_in + (x * w_in // w_out)) * 3
            want += rgb[src : src + 3]
    assert got == bytes(want)


def test_frame_sample_emits_row_bmps(spark):
    """frame_sample on image/bmp really decodes and re-encodes 1-row BMPs."""
    from plan_spark.operators.multimodal import frame_sample

    w, h = 4, 6
    rgb = bytes(range(w * h * 3 % 256)) * 0 + bytes(
        (i * 11) % 256 for i in range(w * h * 3)
    )
    media = spark.createDataFrame(
        [(9, "image/bmp", ENC(w, h, rgb))],
        "doc_id bigint, media_type string, payload binary",
    )
    frames = frame_sample(media, every_n=2).collect()
    assert len(frames) == 3  # rows 0, 2, 4
    for k, row in enumerate(sorted(frames, key=lambda r: bytes(r.payload))):
        fw, fh, frgb = DEC(bytes(row.payload))
        assert (fw, fh) == (w, 1)
    decoded = {DEC(bytes(r.payload))[2] for r in frames}
    want = {rgb[y * w * 3 : (y + 1) * w * 3] for y in (0, 2, 4)}
    assert decoded == want
