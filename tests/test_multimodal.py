"""Multimodal binary-column plumbing: Arrow-batched pandas UDF pipelines
over opaque payloads — schemas, batch shapes, and determinism are real even
where the codec itself is stubbed (no media libs in this container)."""

from __future__ import annotations

import pytest

from plan_spark.catalog import table
from plan_spark.operators.multimodal import (
    attach_payload,
    decode_features,
    frame_sample,
    resize,
)
from tests.conftest import SF_DIR


def _media(spark):
    return attach_payload(table(spark, SF_DIR, "documents").limit(50))


def test_decode_features_deterministic(spark):
    m = _media(spark)
    a = {r.doc_id: (r.checksum, tuple(r.feat)) for r in decode_features(m).collect()}
    b = {r.doc_id: (r.checksum, tuple(r.feat)) for r in decode_features(m).collect()}
    assert a == b and len(a) == 50
    assert all(len(v[1]) == 4 for v in a.values())


def test_resize_contract(spark):
    out = resize(_media(spark), width=8, height=8).collect()
    assert len(out) == 50
    assert all(len(bytes(r.payload)) == 64 for r in out)
    assert all((r.width, r.height) == (8, 8) for r in out)


def test_frame_sample_raises_on_video(spark):
    from pyspark.sql import functions as F

    fake_video = _media(spark).withColumn("media_type", F.lit("video/mp4"))
    with pytest.raises(Exception, match="NotImplementedError|frame decode"):
        frame_sample(fake_video).collect()


def test_frame_sample_passthrough_on_text(spark):
    assert frame_sample(_media(spark)).count() == 50
