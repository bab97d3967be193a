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
    decode_image_builtin,
    resize_images,
    sample_frames,
)


def make_bmp(w: int, h: int) -> bytes:
    """Minimal valid uncompressed 24-bit BMP (BITMAPINFOHEADER),
    rows padded to 4 bytes."""
    import struct

    row = w * 3
    pad = (4 - row % 4) % 4
    pixels = (b"\x00\x80\xff" * w + b"\x00" * pad) * h
    header_len = 14 + 40
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    file_header = struct.pack("<2sIHHI", b"BM", header_len + len(pixels), 0, 0, header_len)
    return file_header + info + pixels


def make_ppm(w: int, h: int) -> bytes:
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + b"\x10\x20\x30" * (w * h)


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


def test_builtin_codec_decodes_real_formats():
    """The dependency-free codec must read true dimensions out of real
    BMP and PPM byte streams (incl. negative-height top-down BMPs and
    header comments in PPM), and refuse anything else."""
    bmp = make_bmp(17, 9)
    assert decode_image_builtin(bmp) == (len(bmp), 17, 9, "decoded:BMP:bgr")

    import struct

    top_down = bytearray(bmp)
    struct.pack_into("<i", top_down, 22, -9)
    assert decode_image_builtin(bytes(top_down))[1:3] == (17, 9)

    ppm = make_ppm(23, 7)
    assert decode_image_builtin(ppm) == (len(ppm), 23, 7, "decoded:PPM:rgb")

    with pytest.raises(NotImplementedError):
        decode_image_builtin(b"\x89PNG\r\n\x1a\n....")

    # unterminated PPM comment → honest malformed-header error
    with pytest.raises(NotImplementedError):
        decode_image_builtin(b"P6\n# truncated comment with no newline")

    # OS/2 BITMAPCOREHEADER (info size 12) packs 16-bit dims at other
    # offsets — must refuse rather than parse garbage
    import struct as _s

    core = b"BM" + _s.pack("<IHHI", 26 + 6, 0, 0, 26) + _s.pack("<IHHHH", 12, 17, 9, 1, 24)
    with pytest.raises(NotImplementedError):
        decode_image_builtin(core + b"\x00" * 64)


def test_real_decode_round_trip(spark):
    """A REAL decode through the SAME mapInPandas loop, in every
    container: Pillow when importable, else the builtin BMP/PPM codec
    — true dimensions come back either way (no skip)."""
    codec = "real" if HAS_REAL_CODEC else "builtin"
    bmp, ppm = make_bmp(17, 9), make_ppm(23, 7)
    df = spark.createDataFrame(
        [(1, bytearray(bmp), "image/bmp"), (2, bytearray(ppm), "image/x-portable-pixmap")],
        "doc_id long, payload binary, mime string",
    )
    rows = {r["doc_id"]: r for r in decode_features(df, codec=codec).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (17, 9)
    assert (rows[2]["width"], rows[2]["height"]) == (23, 7)
    assert rows[1]["byte_len"] == len(bmp) and rows[2]["byte_len"] == len(ppm)
    assert all(r["caption"].startswith("decoded:") for r in rows.values())


def test_wav_roundtrip_and_validation(spark):
    """Audio path: _wav_bytes emits a spec-valid RIFF/WAVE PCM-16 file;
    _parse_wav walks chunks and recovers the exact samples; malformed
    or non-PCM payloads raise instead of parsing garbage."""
    import struct

    import numpy as np

    from lavasmart_bank_sync_etl_spark.multimodal.binary_ops import (
        _parse_wav, _wav_bytes, audio_frame_energy, synth_audio,
    )

    samples = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
    wav = _wav_bytes(samples, sample_rate=16000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    rate, channels, decoded = _parse_wav(wav)
    assert (rate, channels) == (16000, 1)
    assert np.array_equal(decoded, samples)

    with pytest.raises(NotImplementedError):
        _parse_wav(b"OggS" + b"\x00" * 40)
    # 8-bit PCM: valid container, unsupported sample format
    eight_bit = bytearray(wav)
    struct.pack_into("<H", eight_bit, 34, 8)
    with pytest.raises(NotImplementedError):
        _parse_wav(bytes(eight_bit))

    # end-to-end: frame RMS of a known constant signal
    df = spark.createDataFrame([(3,)], "doc_id long")
    rows = audio_frame_energy(synth_audio(df), frame=256).collect()
    # doc 3 -> 1024 + 3*256 = 1792 samples -> 7 full frames
    assert len(rows) == 7
    assert all(r["frame_samples"] == 256 for r in rows)
    assert all(0 <= r["rms"] <= 32768 for r in rows)


def test_ppm_parser_never_mis_decodes_fuzzed_bytes():
    """Hostile-input contract for the raster parser (jl2 philosophy):
    arbitrary byte mutations either decode to a consistent raster or
    raise NotImplementedError — never a crash of another class, never
    a silently wrong-sized raster."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from lavasmart_bank_sync_etl_spark.multimodal.binary_ops import (
        _parse_ppm, _ppm_bytes,
    )

    base = _ppm_bytes(np.arange(18 * 16, dtype=np.uint8).reshape(16, 18))

    @settings(max_examples=200, deadline=None)
    @given(
        pos=st.integers(min_value=0, max_value=len(base) - 1),
        val=st.integers(min_value=0, max_value=255),
        cut=st.integers(min_value=0, max_value=len(base)),
    )
    def fuzz(pos, val, cut):
        mutated = bytearray(base[:cut])
        if pos < len(mutated):
            mutated[pos] = val
        try:
            w, h, maxval, rgb = _parse_ppm(bytes(mutated))
        except NotImplementedError:
            return  # the documented rejection path
        assert rgb.shape == (h, w, 3) and maxval == 255

    fuzz()


def test_synth_frames_planted_reupload_detected(spark):
    """mm6's operator contract on a handcrafted corpus: every video
    emits exactly n_frames real PPM frames keyed video·16+f, the
    dup_every-th video is a bit-exact re-upload of its predecessor
    (all 4 frame payloads equal), and non-dup videos share no frame
    payload with their neighbors."""
    from lavasmart_bank_sync_etl_spark.multimodal.binary_ops import (
        _parse_ppm, synth_frames,
    )

    d = spark.range(0, 22).select(F.col("id").alias("doc_id"))
    rows = synth_frames(d, n_frames=4, dup_every=10).collect()
    assert len(rows) == 22 * 4
    by_frame = {r["doc_id"]: bytes(r["payload"]) for r in rows}
    # every payload is a parseable 18x16 PPM
    w, h, _, _ = _parse_ppm(by_frame[0])
    assert (w, h) == (18, 16)
    for vid in (10, 20):
        for f in range(4):
            assert by_frame[vid * 16 + f] == by_frame[(vid - 1) * 16 + f], (vid, f)
    for vid in (5, 13):
        for f in range(4):
            assert by_frame[vid * 16 + f] != by_frame[(vid - 1) * 16 + f], (vid, f)


def test_mm6_reuploads_rank_at_full_match(spark):
    """End-to-end mm6 on a small slice: every planted re-upload pair
    (d-1, d) for d % 10 == 0 appears with match_frac 1.0."""
    from lavasmart_bank_sync_etl_spark.queries import QUERIES

    out = QUERIES["mm6_video_frame_dedup"](spark, "/root/testdata/sf0.001")
    got = {(r["video_a"], r["video_b"]): r for r in out.collect()}
    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    planted = [(d - 1, d) for d in range(10, n_docs, 10)]
    assert planted, "fixture should plant at least one re-upload"
    for pair in planted:
        assert pair in got, pair
        assert got[pair]["matched_frames"] == 4
        assert got[pair]["match_frac"] == 1.0


def test_mm8_exactly_one_cut_per_video_at_shot_start(spark):
    """mm8 planted truth: with 3-frame shots over 6 frames, every
    video has 5 transitions — stills (hamming 0, no cut) everywhere
    except the single shot start at fidx 3, which must be a cut."""
    from lavasmart_bank_sync_etl_spark.queries import QUERIES

    out = QUERIES["mm8_shot_boundaries"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert len(rows) == n_docs * 5  # 5 transitions per 6-frame video
    by_video = {}
    for r in rows:
        by_video.setdefault(r["video_id"], []).append(r)
    assert len(by_video) == n_docs
    for vid, rs in by_video.items():
        cuts = [r for r in rs if r["is_cut"]]
        stills = [r for r in rs if not r["is_cut"]]
        assert [r["fidx"] for r in cuts] == [3], vid
        assert len(stills) == 4 and all(r["hamming"] == 0 for r in stills), vid


def test_mm8_plan_one_scan_partitioned_window(spark):
    """mm8's scale claims, plan-pinned: one scan of documents (the
    frame synth is plan-side fan-out, not a second read), the lag
    window is partitioned by video (never a SinglePartition global
    sort), and the Hamming comparison is JVM expressions — no Python
    eval node beyond the declared decode/hash mapInPandas stages."""
    from tests.test_plans import plan_of
    from lavasmart_bank_sync_etl_spark.queries import QUERIES

    df = QUERIES["mm8_shot_boundaries"](spark, "/root/testdata/sf0.001")
    tree = df._jdf.queryExecution().executedPlan().toString()
    assert tree.count("Scan parquet") == 1
    plan = plan_of(df)
    assert "SinglePartition" not in plan
    assert "Window" in plan
    assert tree.count("MapInPandas") == 2  # synth + dhash, nothing else
    assert "BatchEvalPython" not in plan  # no row-at-a-time UDF
