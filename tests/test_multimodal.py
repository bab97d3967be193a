"""Multimodal binary-column pipeline (multimodal/binary_ops.py): the
Arrow mapInPandas plumbing with the deterministic fake codec, and the
optional real-codec path (Pillow) when the library is importable —
same batch loop, same schema, so codec choice changes zero plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.multimodal.binary_ops import (
    HAS_REAL_CODEC,
    attach_payload,
    decode_features,
    decode_image,
    resize_images,
    sample_frames,
)


def _media(spark):
    df = spark.createDataFrame(
        [(1, "hello multimodal world"), (2, "x" * 700)], "doc_id long, text string"
    )
    return attach_payload(df)


def test_fake_decode_schema_and_determinism(spark):
    rows = {r["doc_id"]: r for r in decode_features(_media(spark)).collect()}
    assert rows[1]["byte_len"] == len(b"hello multimodal world")
    assert rows[2]["width"] == 700 % 640 and rows[2]["height"] == (700 // 7) % 480
    assert rows[1]["caption"].startswith("decoded:")
    again = {r["doc_id"]: r for r in decode_features(_media(spark)).collect()}
    assert rows == again


def test_resize_and_frames_fanout(spark):
    resized = {r["doc_id"]: r for r in resize_images(_media(spark)).collect()}
    assert 1 <= resized[2]["out_width"] <= 256 and 1 <= resized[2]["out_height"] <= 256
    frames = sample_frames(_media(spark), n_frames=4).collect()
    assert len(frames) == 2 * 4
    assert all(f["frame"] for f in frames)


def test_real_codec_unavailable_raises(spark):
    if HAS_REAL_CODEC:
        pytest.skip("real codec present; covered by the round-trip test")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_features(_media(spark), codec="real")


@pytest.mark.skipif(not HAS_REAL_CODEC, reason="Pillow not installed")
def test_real_codec_round_trip(spark):
    """When Pillow is importable: encode a tiny real PNG, push it
    through the SAME mapInPandas loop with codec='real', and get the
    true dimensions back."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(png), "image/png")],
                               "doc_id long, payload binary, mime string")
    row = decode_features(df, codec="real").collect()[0]
    assert (row["width"], row["height"]) == (17, 9)
    assert row["byte_len"] == len(png)
    assert "PNG" in row["caption"]
