"""Multimodal column handling (BASELINE.json north-star).

Media (image/audio/video) are opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partitioning — is real and tested; the
actual codec step is stubbed (no media libs in this container) behind
``decode_image`` / a deterministic fake used by the pipeline, per the
build contract.

Scale notes: payloads stay columnar in Arrow batches end-to-end; the
pandas iterator processes one batch at a time so executor memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — resize
that, not the code, when payloads grow. Feature extraction is
embarrassingly parallel: no shuffle at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

#: Output schema of the decode/feature stage.
DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("byte_len", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("caption", StringType()),
])

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
])


try:  # real codec is optional — this container ships no media libs
    from PIL import Image as _PILImage  # type: ignore

    HAS_REAL_CODEC = True
except ImportError:  # pragma: no cover - exercised in PIL-less containers
    _PILImage = None
    HAS_REAL_CODEC = False


def decode_image(payload: bytes) -> tuple[int, int, int, str]:
    """Real codec entry point: Pillow when importable (same signature
    as the deterministic fake — (byte_len, width, height, caption)),
    NotImplementedError otherwise. Audio/video analogs would plug
    torchaudio/ffmpeg here; everything around this call (batching,
    schema, partitioning) is production-shaped either way."""
    if not HAS_REAL_CODEC:
        raise NotImplementedError("media codecs not available in this environment")
    import io

    with _PILImage.open(io.BytesIO(payload)) as img:
        w, h = img.size
        return len(payload), int(w), int(h), f"decoded:{img.format or ''}:{img.mode}"


def decode_image_builtin(payload: bytes) -> tuple[int, int, int, str]:
    """Dependency-free REAL decode for the two classic uncompressed
    raster formats — enough to run an actual decode in containers
    without Pillow (same (byte_len, width, height, caption) contract):

    - BMP: 'BM' magic; width/height are little-endian int32 at byte
      offsets 18/22 of the BITMAPINFOHEADER (height may be negative
      for top-down rows — dimensions are |height|).
    - PPM (binary 'P6'): ASCII header tokens width, height, maxval,
      with '#' comments legal anywhere between them.

    Anything else raises NotImplementedError — that's the honest
    boundary where Pillow/ffmpeg would plug in.
    """
    import struct

    if payload[:2] == b"BM" and len(payload) >= 26:
        # only info-header layouts whose width/height live at 18/22 as
        # int32 (BITMAPINFOHEADER + V2-V5); OS/2 BITMAPCOREHEADER packs
        # 16-bit dims at different offsets and must not parse silently
        (info_size,) = struct.unpack_from("<I", payload, 14)
        if info_size not in (40, 52, 56, 108, 124):
            raise NotImplementedError(
                f"BMP info-header size {info_size} unsupported (BITMAPINFOHEADER family only)"
            )
        w, h = struct.unpack_from("<ii", payload, 18)
        return len(payload), int(abs(w)), int(abs(h)), "decoded:BMP:bgr"
    if payload[:2] == b"P6":
        tokens: list[int] = []
        pos = 2
        while len(tokens) < 3 and pos < len(payload):
            c = payload[pos : pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":
                nl = payload.find(b"\n", pos)
                if nl < 0:
                    break  # unterminated comment → malformed-header error below
                pos = nl + 1
            elif c.isdigit():
                end = pos
                while payload[end : end + 1].isdigit():
                    end += 1
                tokens.append(int(payload[pos:end]))
                pos = end
            else:
                break
        if len(tokens) == 3:
            return len(payload), tokens[0], tokens[1], "decoded:PPM:rgb"
        raise NotImplementedError("malformed PPM header")
    raise NotImplementedError(
        "builtin codec handles uncompressed BMP/PPM only — other formats "
        "need Pillow (codec='real')"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for decode_image used by the tested
    pipeline: pseudo-dimensions from the byte length, caption from the
    content hash. Reproducible in ANSI SQL for the oracle."""
    n = len(payload)
    digest = hashlib.md5(payload).hexdigest()
    return n, n % 640, (n // 7) % 480, f"decoded:{digest[:8]}"


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata
    — the ingest shape any real media table would have."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def decode_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads via
    ``mapInPandas`` — the one justified Python stage (codecs are
    Python-side by nature). Batch-at-a-time iterator keeps memory
    bounded.

    ``codec``: 'fake' (deterministic, oracle-reproducible — the
    default test/driver surface), 'builtin' (pure-Python uncompressed
    BMP/PPM — a real decode with zero dependencies), or 'real'
    (Pillow, when importable). All three share the batch loop and
    schema, so swapping codecs changes zero plumbing."""
    if codec == "real" and not HAS_REAL_CODEC:
        raise NotImplementedError("codec='real' requires Pillow in the executor env")
    decode = {
        "real": decode_image,
        "builtin": decode_image_builtin,
        "fake": _fake_decode,
    }[codec]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": pd.Series([f[0] for f in feats], dtype="int64"),
                    "width": pd.Series([f[1] for f in feats], dtype="int32"),
                    "height": pd.Series([f[2] for f in feats], dtype="int32"),
                    "caption": [f[3] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("out_width", IntegerType()),
    StructField("out_height", IntegerType()),
    StructField("resized", BinaryType()),
])


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage: aspect-preserving downscale to ``max_side``.

    Real implementation would decode → resample → re-encode via
    Pillow inside the same batch loop; here the codec is the
    deterministic fake (dims from byte length, payload truncated
    proportionally) so the Spark plumbing — Arrow batch shape, binary
    output column, bounded memory — is exercised end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "out_width": [], "out_height": [], "resized": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                _, w, h, _ = _fake_decode(b)
                scale = min(max_side / max(w, h, 1), 1.0)
                ow, oh = max(int(w * scale), 1), max(int(h * scale), 1)
                out["doc_id"].append(doc_id)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["resized"].append(b[: max(int(len(b) * scale), 1)])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "out_width": pd.Series(out["out_width"], dtype="int32"),
                    "out_height": pd.Series(out["out_height"], dtype="int32"),
                    "resized": out["resized"],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_offset", LongType()),
    StructField("frame", BinaryType()),
])


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Frame-sampling stage: emit ``n_frames`` evenly-spaced frames per
    payload — a 1→N ``mapInPandas`` (the video analog of explode).

    Real implementation seeks keyframes via ffmpeg; the fake slices
    evenly-spaced byte windows. Output fan-out is bounded (N per
    input), so downstream partition sizing is predictable: rows × N."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(b) - 1, 0))
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame"].append(b[off : off + frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_offset": pd.Series(out["frame_offset"], dtype="int64"),
                    "frame": out["frame"],
                }
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: real (dependency-free) RIFF/WAVE PCM encode + decode
# ---------------------------------------------------------------------------

WAV_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
])

def _wav_bytes(samples, sample_rate: int = 8000) -> bytes:
    """Canonical 44-byte PCM WAV: RIFF header + 'fmt ' (PCM, mono,
    16-bit) + 'data' chunk of little-endian int16 samples."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    return b"".join([
        b"RIFF", struct.pack("<I", 36 + n), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                             sample_rate * 2, 2, 16),
        b"data", struct.pack("<I", n),
        pcm,
    ])


def _parse_wav(payload: bytes):
    """Decode a PCM WAV: validate RIFF/WAVE magic, walk chunks to
    'fmt ' (must be PCM 16-bit) and 'data', return (sample_rate,
    channels, int16 sample array). Raises on anything non-PCM — the
    honest boundary where torchaudio/ffmpeg would plug in."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM-16 supported (format={audio_format}, bits={bits})"
        )
    return sample_rate, channels, np.frombuffer(data, dtype="<i2")


def synth_audio(
    df: DataFrame, id_col: str = "doc_id", silence_gate: bool = False
) -> DataFrame:
    """Synthesize a REAL WAV binary per row: sample i of doc d is
    ``((d*2654435761 + i*40503) mod 65536) - 32768`` (pure integer —
    reproducible in ANSI SQL), n_samples = 1024 + (d mod 4)*256.
    Stands in for reading an audio table; the payload is a genuine
    RIFF/WAVE file any audio tool can open.

    ``silence_gate=True`` zeroes every sample whose 256-sample frame
    index j satisfies ``j mod 4 < 2`` — deterministic quiet spans for
    the segmentation operator (mm7), same construction discipline as
    the base formula."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for d in ids:
                n = 1024 + (int(d) % 4) * 256
                i = np.arange(n, dtype=np.int64)
                s = (int(d) * 2654435761 + i * 40503) % 65536 - 32768
                if silence_gate:
                    s = np.where((i // 256) % 4 < 2, 0, s)
                payloads.append(_wav_bytes(s))
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": payloads,
                "mime": ["audio/wav"] * len(payloads),
            })

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=WAV_SCHEMA
    )


def audio_frame_energy(media: DataFrame, frame: int = 256) -> DataFrame:
    """Audio feature extraction with a REAL decode: parse the WAV
    header (magic, chunk walk, PCM-16 check), ``np.frombuffer`` the
    samples, and emit per-frame RMS. Arrow-batched ``mapInPandas``,
    no shuffle — bounded memory per batch, embarrassingly parallel
    at 100 TB."""
    import numpy as np

    from pyspark.sql.types import DoubleType

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_samples", LongType()),
        StructField("rms", DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_samples": [], "rms": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, samples = _parse_wav(bytes(payload))
                sq = samples.astype(np.int64) ** 2
                for fi in range(0, len(samples), frame):
                    chunk = sq[fi : fi + frame]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi // frame)
                    out["frame_samples"].append(len(chunk))
                    # int64 sum is exact; one division + sqrt + round —
                    # bit-identical to the oracle's arithmetic
                    out["rms"].append(
                        round(float(np.sqrt(int(chunk.sum()) / len(chunk))), 4)
                    )
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "frame_samples": pd.Series(out["frame_samples"], dtype="int64"),
                "rms": pd.Series(out["rms"], dtype="float64"),
            })

    return media.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Images: real (dependency-free) PPM encode + full decode + perceptual hash
# ---------------------------------------------------------------------------

PPM_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
])

DHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("dhash_bits", StringType()),
    StructField("ones", IntegerType()),
])

_DHASH_W, _DHASH_H = 18, 16  # synth raster; 2x2-averages to the 9x8 dHash grid


def _ppm_bytes(gray) -> bytes:
    """Encode a 2-D uint8 grayscale array as a REAL binary P6 PPM
    (each gray value tripled to RGB) — any image tool can open it."""
    import numpy as np

    h, w = gray.shape
    header = f"P6\n{w} {h}\n255\n".encode()
    rgb = np.repeat(gray.astype(np.uint8).reshape(h, w, 1), 3, axis=2)
    return header + rgb.tobytes()


def _ppm_bytes_stack(gray_stack) -> list[bytes]:
    """``_ppm_bytes`` for an (n, h, w) stack: one vectorized RGB
    expansion for the whole batch, then one memcpy-sized tobytes per
    frame — byte-identical output to mapping ``_ppm_bytes`` over the
    stack (same header, same tripled-gray raster), without n reshape/
    repeat round-trips through tiny arrays (guide §4.2)."""
    import numpy as np

    n, h, w = gray_stack.shape
    header = f"P6\n{w} {h}\n255\n".encode()
    rgb = np.repeat(gray_stack.astype(np.uint8)[..., None], 3, axis=3)
    flat = rgb.reshape(n, -1)
    return [header + row.tobytes() for row in flat]


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Scan a P6 header: returns (w, h, maxval, raster_offset);
    malformed input raises (the jl2 quarantine philosophy — never
    silently mis-decode)."""
    if payload[:2] != b"P6":
        raise NotImplementedError("not a binary PPM (P6) payload")
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise NotImplementedError("malformed PPM header")
            pos = nl + 1
        elif c.isdigit():
            end = pos
            while payload[end : end + 1].isdigit():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
        else:
            raise NotImplementedError("malformed PPM header")
    if len(tokens) != 3 or not payload[pos : pos + 1].isspace():
        raise NotImplementedError("malformed PPM header")
    pos += 1  # single whitespace after maxval, then the raster
    w, h, maxval = tokens
    return w, h, maxval, pos


def _parse_ppm(payload: bytes):
    """Full P6 decode: header tokens (comments legal) + raw raster.
    Returns (w, h, maxval, HxWx3 uint8 array); malformed input
    raises."""
    import numpy as np

    w, h, maxval, pos = _ppm_header(payload)
    need = w * h * 3
    raster = payload[pos : pos + need]
    if maxval != 255 or len(raster) != need:
        raise NotImplementedError("unsupported or truncated PPM raster")
    return w, h, maxval, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def synth_images(df: DataFrame, dup_every: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL 18×16 grayscale P6 PPM per row: pixel (x, y)
    of doc d has value ``((d*31 + y*18 + x) * 7) mod 256`` (pure
    integer — reproducible in ANSI SQL). Every ``dup_every``-th doc
    carries an exact COPY of the previous doc's image (effective id =
    d−1), planting the duplicates the perceptual hash must find."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # raster coordinates shared across the batch; the per-row gray
        # formula is IDENTICAL to the previous per-row mgrid form,
        # evaluated once for the whole (n, h, w) stack (guide §4.2)
        y, x = np.mgrid[0:_DHASH_H, 0:_DHASH_W]
        lin = (y * _DHASH_W + x)[None, :, :]
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            iv = ids.to_numpy(dtype="int64")
            eff = np.where((iv % dup_every == 0) & (iv > 0), iv - 1, iv)
            gray = ((eff[:, None, None] * 31 + lin) * 7) % 256
            payloads = _ppm_bytes_stack(gray)
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": payloads,
                "mime": ["image/x-portable-pixmap"] * len(payloads),
            })

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=PPM_SCHEMA
    )


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash with a REAL decode: parse the full
    PPM raster, grayscale (channel 0 — synth images are gray),
    integer 2×2 block-mean downsample to a 9×8 grid, then one bit per
    horizontally adjacent cell pair (``grid[r][c] < grid[r][c+1]``) —
    64 bits as a '0'/'1' string, byte-order-free and sign-safe across
    engines. All integer arithmetic (floor-div by 4), so the SQL
    oracle reproduces the hash bit-for-bit from the pixel formula;
    a match proves encode → decode → downsample → hash is faithful.
    Arrow-batched ``mapInPandas``; only (id, 64-char hash) leaves the
    stage — at 100 TB of images the shuffle carries hashes, payloads
    stay columnar at rest (the dd1 principle for pixels)."""
    import numpy as np

    def _hash_stack(gray: "np.ndarray") -> tuple[list[str], "np.ndarray"]:
        """dHash a (n, h, w) uint8 stack in one vectorized pass —
        IDENTICAL arithmetic to the per-row form, batched on axis 0.
        Returns (bit strings, ones counts)."""
        g = gray.astype(np.int64)
        grid = (
            g[:, 0::2, 0::2] + g[:, 0::2, 1::2]
            + g[:, 1::2, 0::2] + g[:, 1::2, 1::2]
        ) // 4  # (n, h/2, w/2)
        bits = (grid[:, :, :-1] < grid[:, :, 1:])  # (n, h/2, w/2 - 1)
        flat = bits.reshape(len(g), -1)
        chars = np.where(flat, np.uint8(ord("1")), np.uint8(ord("0")))
        strings = [row.tobytes().decode("ascii") for row in chars]
        return strings, flat.sum(axis=1).astype(np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # The hot path is vectorized over the whole Arrow batch (guide
        # §4.2): rasters in a corpus overwhelmingly share one header
        # ("P6\n<w> <h>\n255\n" from a single synth/transcode profile),
        # so after one full _parse_ppm the remaining rows only pay a
        # prefix compare, one frombuffer view each, and a stacked
        # numpy dHash. Rows whose header differs (mixed sizes,
        # malformed input) fall back to the per-row decode, preserving
        # the exact per-row error behavior. The previous per-row loop
        # (parse + tiny-array numpy + 64-way string join per image)
        # was allocation-bound, not compute-bound.
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            header: bytes | None = None
            dims: tuple[int, int] | None = None
            fast_idx: list[int] = []
            slow_idx: list[int] = []
            for i, b in enumerate(payloads):
                if header is None:
                    w, h, maxval, raster_off = _ppm_header(b)
                    if maxval != 255 or len(b) < raster_off + w * h * 3:
                        raise NotImplementedError(
                            "unsupported or truncated PPM raster"
                        )
                    header = b[:raster_off]
                    dims = (w, h)
                    fast_idx.append(i)
                elif b[: len(header)] == header and len(b) == len(header) + dims[0] * dims[1] * 3:
                    fast_idx.append(i)
                else:
                    slow_idx.append(i)
            n = len(payloads)
            bit_strings: list[str | None] = [None] * n
            ones = np.zeros(n, dtype=np.int64)
            if fast_idx:
                w, h = dims
                off = len(header)
                # channel 0 of each RGB triple == grayscale (synth
                # images are gray; matches the per-row rgb[:, :, 0])
                stack = np.stack([
                    np.frombuffer(payloads[i], np.uint8, count=w * h * 3, offset=off)[0::3]
                    for i in fast_idx
                ]).reshape(len(fast_idx), h, w)
                strings, counts = _hash_stack(stack)
                for j, i in enumerate(fast_idx):
                    bit_strings[i] = strings[j]
                    ones[i] = counts[j]
            for i in slow_idx:
                w, h, _, rgb = _parse_ppm(payloads[i])
                strings, counts = _hash_stack(rgb[None, :, :, 0])
                bit_strings[i] = strings[0]
                ones[i] = counts[0]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "dhash_bits": bit_strings,
                "ones": pd.Series(ones, dtype="int32"),
            })

    return media.mapInPandas(run, schema=DHASH_SCHEMA)


def _synth_ppm_frames(df: DataFrame, n_frames: int, content_ids, id_col: str) -> DataFrame:
    """Shared frame-synthesis kernel for ``synth_frames`` /
    ``synth_shot_frames``: only the (video, frame) → content-id map
    differs between them, and the raster formula below must stay
    BIT-IDENTICAL to the arithmetic the shared ``_mm_hash_ctes``
    oracle chain regenerates (queries_llm) — one body, one formula,
    so a tweak cannot silently break one query's oracle parity.
    ``content_ids(ids, fidx)`` takes the batch's video ids (n,) and
    frame indices (F,) and returns the (n·F,) content-id vector."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        y, x = np.mgrid[0:_DHASH_H, 0:_DHASH_W]  # shared raster coords
        lin = (y * _DHASH_W + x)[None, :, :]
        mix = ((x + 3) * (y + 5))[None, :, :]
        fidx = np.arange(n_frames, dtype=np.int64)
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype="int64")
            cids = content_ids(ids, fidx)
            # one vectorized raster computation for the whole batch
            gray = (
                (cids[:, None, None] * 31 + lin) * 7
                + mix * (cids % 97)[:, None, None]
            ) % 256
            out_ids = (ids[:, None] * 16 + fidx).ravel()
            payloads = _ppm_bytes_stack(gray)
            yield pd.DataFrame({
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "payload": payloads,
                "mime": ["video/x-frames+ppm"] * len(payloads),
            })

    return df.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        run, schema=PPM_SCHEMA
    )


def synth_frames(
    df: DataFrame, n_frames: int = 4, dup_every: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a REAL "video" per row as ``n_frames`` 18×16 binary
    P6 PPM frames (a 1→N ``mapInPandas``, ``sample_frames``' fan-out
    shape with genuine rasters): frame f of video d carries content id
    ``eff·16+f`` where ``eff = d−1`` for every ``dup_every``-th video
    (a bit-exact RE-UPLOAD of its predecessor — the planted
    cross-video duplicates) and ``eff = d`` otherwise. Pixel (x, y)
    is ``((cid·31 + y·18 + x)·7 + (x+3)·(y+5)·(cid mod 97)) mod 256``
    — the multiplicative mixing term keeps distinct frames' dHashes
    distinct (the plain gradient of ``synth_images`` collapses to
    ~64 hash classes, which would drown the pair join in
    collisions), and stays pure integer so ANSI SQL reproduces every
    pixel. Output rows are keyed ``doc_id = video·16 + frame`` so the
    unmodified ``image_dhash`` stage consumes them directly."""
    def content_ids(ids, fidx):
        import numpy as np

        base = np.where((ids % dup_every == 0) & (ids > 0), ids - 1, ids)
        return (base[:, None] * 16 + fidx).ravel()

    return _synth_ppm_frames(df, n_frames, content_ids, id_col)


def synth_shot_frames(
    df: DataFrame, n_frames: int = 6, shot_len: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """``synth_frames``' within-video twin for shot-boundary work
    (mm8): each video is ``n_frames`` real P6 PPM frames grouped into
    SHOTS of ``shot_len`` — frame f shows content id
    ``video·16 + (f // shot_len)·shot_len``, so consecutive frames
    inside a shot are bit-identical (a still segment) and the content
    changes exactly at shot starts. Same raster arithmetic as
    ``synth_frames`` (pure integer, ANSI-SQL-reproducible), same 1→N
    ``mapInPandas`` fan-out, same ``doc_id = video·16 + frame`` keying
    into the unmodified ``image_dhash`` stage."""
    def content_ids(ids, fidx):
        shot_base = (fidx // shot_len) * shot_len
        return (ids[:, None] * 16 + shot_base).ravel()

    return _synth_ppm_frames(df, n_frames, content_ids, id_col)
