"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata, processed via
``mapInPandas`` in Arrow batches — the Spark-side schema, partitioning, UDF
signatures, and batch shapes are all real and tested.

REAL codecs (pure struct/NumPy, no external libraries needed):

- image: uncompressed 24-bit BI_RGB **BMP** (standard header, 4-byte row
  padding, bottom-up rows; grayscale = integer RGB mean)
- audio: **WAV** RIFF PCM16 (chunk walk for fmt/data; "intensity" = mean
  absolute amplitude scaled to [0, 255]; width = samples/channel,
  height = channels)
- video: **YUV4MPEG2 (.y4m)** C420 (textual header + FRAME-delimited planar
  frames; grayscale = Y plane)

Compressed formats (JPEG/PNG/MP3/H.264) genuinely need codec libraries that
do not ship in this container; payloads that are none of the above raise
NotImplementedError — that is the only remaining stub. The legacy
deterministic "FAKE" header format is still accepted (fake=True) so old
fixtures keep working.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, n_frames int"
)
FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "mean_intensity double, feature binary"
)

_KINDS = {"image": 0, "audio": 1, "video": 2}
_KIND_NAMES = {v: k for k, v in _KINDS.items()}


def make_fake_media(media_id: int, kind: str, seed: int = 42) -> bytes:
    rng = np.random.default_rng([seed, media_id])
    w, h = int(rng.integers(4, 64)), int(rng.integers(4, 64))
    frames = 1 if kind == "image" else int(rng.integers(2, 16))
    pixels = rng.integers(0, 256, size=w * h * frames, dtype=np.uint8)
    return (
        b"FAKE"
        + struct.pack("<BHHH", _KINDS[kind], w, h, frames)
        + pixels.tobytes()
    )


def generate_media(spark, n: int, seed: int = 42, num_partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (media_id, kind, payload, width, height, n_frames)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = list(_KINDS)
        for batch in batches:
            rows = []
            for i in batch["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = make_fake_media(i, kind, seed)
                _, w, h, fr = struct.unpack("<BHHH", payload[4:11])
                rows.append((i, kind, payload, w, h, fr))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height", "n_frames"],
            )

    return spark.range(0, n, 1, num_partitions).mapInPandas(gen, MEDIA_SCHEMA)


def generate_real_media(
    spark, n: int, seed: int = 42, num_partitions: int = 8
) -> DataFrame:
    """Deterministic table of GENUINE media payloads (BMP / WAV / Y4M),
    metadata filled by actually decoding what was encoded."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = list(_KINDS)
        for batch in batches:
            rows = []
            for i in batch["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = make_real_media(i, kind, seed)
                k, w, h, fr, _ = _decode_payload(payload, allow_fake=False)
                assert k == kind
                rows.append((i, kind, payload, w, h, fr))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height", "n_frames"],
            )

    return spark.range(0, n, 1, num_partitions).mapInPandas(gen, MEDIA_SCHEMA)


# ------------------------------------------------------------ real encoders
def make_bmp(pixels_rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> standard uncompressed 24-bit BMP bytes."""
    h, w, _ = pixels_rgb.shape
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4-byte boundary
    img_size = row_bytes * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_bytes - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        # BMP stores BGR
        rows.append(pixels_rgb[y, :, ::-1].tobytes() + pad)
    return header + dib + b"".join(rows)


def make_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """(channels, n) int16 -> RIFF WAVE PCM16 bytes (interleaved)."""
    ch, n = samples.shape
    inter = samples.T.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(inter), b"WAVE")
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(inter)) + inter
    )


def make_y4m(frames_y: np.ndarray, fps: int = 25) -> bytes:
    """(n_frames, h, w) uint8 luma (even h, w) -> YUV4MPEG2 C420 bytes
    (chroma planes set to neutral 128)."""
    fr, h, w = frames_y.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    uv = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = [head]
    for f in range(fr):
        out.append(b"FRAME\n" + frames_y[f].tobytes() + uv + uv)
    return b"".join(out)


def make_real_media(media_id: int, kind: str, seed: int = 42) -> bytes:
    """Deterministic genuine BMP / WAV / Y4M payload for a media id."""
    rng = np.random.default_rng([seed, media_id])
    if kind == "image":
        w, h = int(rng.integers(4, 64)), int(rng.integers(4, 64))
        return make_bmp(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
    if kind == "audio":
        ch = int(rng.integers(1, 3))
        n = int(rng.integers(256, 4096))
        return make_wav(rng.integers(-32768, 32768, size=(ch, n), dtype=np.int16))
    w, h = int(rng.integers(2, 32)) * 2, int(rng.integers(2, 32)) * 2
    fr = int(rng.integers(2, 16))
    return make_y4m(rng.integers(0, 256, size=(fr, h, w), dtype=np.uint8))


# ------------------------------------------------------------ real decoders
def _decode_bmp(b: bytes) -> tuple[str, int, int, int, np.ndarray]:
    magic, _fsize, _r1, _r2, off = struct.unpack_from("<2sIHHI", b, 0)
    hdr_size, w, h_signed, _planes, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}: only 24-bit BI_RGB supported")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, np.uint8, row_bytes * h, off).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        bgr = bgr[::-1]  # bottom-up storage
    gray = bgr.astype(np.uint16).sum(axis=2) // 3  # integer RGB mean
    return "image", w, h, 1, gray.astype(np.uint8)[None, :, :]


def _decode_wav(b: bytes) -> tuple[str, int, int, int, np.ndarray]:
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, ch, bits = 12, None, None
    data = None
    while pos + 8 <= len(b):
        cid, sz = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            _fmt, ch, _sr, _bps, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if _fmt != 1 or bits != 16:
                raise NotImplementedError(f"WAV fmt={_fmt} bits={bits}: only PCM16 supported")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if not ch or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    samples = np.frombuffer(data, "<i2").reshape(-1, ch).T  # (ch, n)
    n = samples.shape[1]
    # "intensity" image: |amplitude| scaled to [0, 255], one row per channel
    gray = (np.abs(samples.astype(np.int32)) * 255 // 32767).astype(np.uint8)
    return "audio", n, ch, 1, gray[None, :, :]


def _decode_y4m(b: bytes) -> tuple[str, int, int, int, np.ndarray]:
    nl = b.index(b"\n")
    params = b[:nl].decode().split()
    if params[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    for p in params[1:]:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("C") and p[1:] not in ("420", "420jpeg", "420mpeg2"):
            raise NotImplementedError(f"y4m chroma {p}: only C420 supported")
    if not w or not h:
        raise ValueError("malformed y4m header: missing W/H")
    frame_sz = w * h + 2 * (w // 2) * (h // 2)
    frames = []
    pos = nl + 1
    while pos < len(b):
        fnl = b.index(b"\n", pos)
        if b[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed y4m: expected FRAME marker")
        if fnl + 1 + frame_sz > len(b):
            raise ValueError("malformed y4m: truncated frame")
        y = np.frombuffer(b, np.uint8, w * h, fnl + 1).reshape(h, w)
        frames.append(y)
        pos = fnl + 1 + frame_sz
    return "video", w, h, len(frames), np.stack(frames)


def _decode_payload(payload: bytes, allow_fake: bool) -> tuple[str, int, int, int, np.ndarray]:
    """Sniff the container magic and decode; grayscale frames out."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:9] == b"YUV4MPEG2":
        return _decode_y4m(payload)
    if payload[:4] == b"FAKE" and allow_fake:
        return _decode_fake(payload)
    raise NotImplementedError(
        "unrecognized/compressed media container: only BMP, WAV(PCM16), "
        "YUV4MPEG2 decode without external codec libraries"
    )


def _decode_fake(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    if payload[:4] != b"FAKE":
        raise ValueError("not a fake-media payload")
    kind, w, h, fr = struct.unpack("<BHHH", payload[4:11])
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=11).reshape(fr, h, w)
    return _KIND_NAMES[kind], w, h, fr, pixels


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """media(media_id, payload, ...) -> per-item features via mapInPandas.

    Emits (media_id, kind, width, height, n_frames, mean_intensity, feature)
    where feature is an 8x8 downsampled first-frame thumbnail (the
    feature-extraction batch shape a real pipeline would use).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                kind, w, h, fr, px = _decode_payload(bytes(payload), allow_fake=fake)
                first = px[0].astype(np.float64)
                ys = np.linspace(0, h - 1, 8).astype(int)
                xs = np.linspace(0, w - 1, 8).astype(int)
                thumb = first[np.ix_(ys, xs)].astype(np.uint8)
                rows.append(
                    (int(mid), kind, w, h, fr, float(px.mean()), thumb.tobytes())
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height", "n_frames",
                    "mean_intensity", "feature",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2, fake: bool = False) -> DataFrame:
    """video rows -> one row per sampled frame (frame_idx, frame binary)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                kind, w, h, fr, px = _decode_payload(bytes(payload), allow_fake=fake)
                if kind != "video":
                    continue
                for fi in range(0, fr, every):
                    ids.append(int(mid))
                    idxs.append(fi)
                    frames.append(px[fi].tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.select("media_id", "payload").mapInPandas(
        gen, "media_id long, frame_idx int, frame binary"
    )

# ------------------------------------------------------- lossless round-trip
# Raw (lossless) decoders: unlike _decode_* above — which emit grayscale
# analysis frames — these recover the EXACT encoder inputs, so
# re-encoding must reproduce the payload byte-for-byte. That makes
# encode/decode a provable inverse pair, checkable by a pinned SQL oracle
# (the payload bytes themselves are not SQL-synthesizable).


def _raw_bmp(b: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB, top-down (make_bmp's input shape)."""
    _magic, _fsize, _r1, _r2, off = struct.unpack_from("<2sIHHI", b, 0)
    _hdr, w, h_signed, _planes, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, np.uint8, row_bytes * h, off).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def _raw_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((channels, n) int16 samples, sample_rate)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, ch, rate, data = 12, None, None, None
    while pos + 8 <= len(b):
        cid, sz = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt, ch, rate, _bps, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt != 1 or bits != 16:
                raise NotImplementedError(f"WAV fmt={fmt} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if not ch or data is None:
        raise ValueError("malformed WAV")
    return np.frombuffer(data, "<i2").reshape(-1, ch).T.copy(), int(rate)


def _raw_y4m(b: bytes) -> tuple[np.ndarray, int]:
    """Y4M bytes -> ((n_frames, h, w) uint8 luma, fps). C420 with neutral
    chroma only (what make_y4m writes); non-neutral chroma is not lossless
    for the luma-only re-encoder, so it raises."""
    nl = b.index(b"\n")
    params = b[:nl].decode().split()
    w = h = fps = None
    for p in params[1:]:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("F"):
            fps = int(p[1:].split(":")[0])
    if not w or not h or not fps:
        raise ValueError("malformed y4m header")
    cw, chh = w // 2, h // 2
    frames = []
    pos = nl + 1
    while pos < len(b):
        fnl = b.index(b"\n", pos)
        y = np.frombuffer(b, np.uint8, w * h, fnl + 1).reshape(h, w)
        uv = np.frombuffer(b, np.uint8, 2 * cw * chh, fnl + 1 + w * h)
        if not (uv == 128).all():
            raise NotImplementedError("non-neutral chroma: luma round-trip only")
        frames.append(y)
        pos = fnl + 1 + w * h + 2 * cw * chh
    return np.stack(frames), fps


def expected_media_features(n: int, seed: int = 42) -> list[tuple]:
    """Construction-derived oracle rows for ``decode_media`` over
    ``generate_real_media(n, seed)`` — computed WITHOUT calling any encoder
    or decoder, so pinning against it proves the BMP/WAV/Y4M containers
    round-trip content exactly (not merely that the same code ran twice).

    Mirrors only (a) ``make_real_media``'s RNG draw sequence (kind by
    ``media_id % 3``, dimensions from ``default_rng([seed, media_id])``) and
    (b) the DOCUMENTED analysis-frame semantics from the module docstring:
    image grayscale = floor RGB mean per pixel, audio intensity =
    ``|amp| * 255 // 32767``, video = raw Y plane. Intensity is returned as
    the exact integer SUM over all analysis-frame cells (no floats anywhere,
    so the SQL comparison is integer-exact).

    Returns [(media_id, kind, width, height, n_frames, intensity_sum)].
    """
    kinds = list(_KINDS)
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        rng = np.random.default_rng([seed, i])
        if kind == "image":
            w, h = int(rng.integers(4, 64)), int(rng.integers(4, 64))
            rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            isum = int((rgb.astype(np.uint16).sum(axis=2) // 3).sum())
            fr = 1
        elif kind == "audio":
            ch = int(rng.integers(1, 3))
            ns = int(rng.integers(256, 4096))
            samples = rng.integers(-32768, 32768, size=(ch, ns), dtype=np.int16)
            isum = int((np.abs(samples.astype(np.int32)) * 255 // 32767).sum())
            w, h, fr = ns, ch, 1
        else:
            w, h = int(rng.integers(2, 32)) * 2, int(rng.integers(2, 32)) * 2
            fr = int(rng.integers(2, 16))
            frames = rng.integers(0, 256, size=(fr, h, w), dtype=np.uint8)
            isum = int(frames.sum(dtype=np.int64))
        rows.append((i, kind, w, h, fr, isum))
    return rows


def _container_len(kind: str, w: int, h: int, fr: int) -> int:
    """Closed-form byte length of a payload our encoders produce for the
    given decoded dimensions — an arithmetic cross-check on the decode,
    independent of pixel/sample content."""
    if kind == "image":
        return 54 + ((w * 3 + 3) & ~3) * h
    if kind == "audio":
        return 44 + 2 * h * w  # h = channels, w = samples/channel
    head = len(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n")
    return head + fr * (6 + w * h + 2 * (w // 2) * (h // 2))


def roundtrip_media(media: DataFrame) -> DataFrame:
    """(media_id, payload, ...) -> per-item round-trip verdicts.

    Emits (media_id, kind, byte_len, len_ok, roundtrip_ok):

    - ``len_ok``: len(payload) equals the closed-form container-length
      formula evaluated on the DECODED dimensions,
    - ``roundtrip_ok``: re-encoding the raw decode (exact pixels/samples,
      not the grayscale analysis frames) reproduces the payload
      byte-for-byte.

    Any decode failure yields ok=0 rather than raising, so corrupt
    payloads surface as counts, not job failures.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                b = bytes(payload)
                try:
                    kind, w, h, fr, _ = _decode_payload(b, allow_fake=False)
                    len_ok = len(b) == _container_len(kind, w, h, fr)
                    if kind == "image":
                        enc = make_bmp(_raw_bmp(b))
                    elif kind == "audio":
                        enc = make_wav(*_raw_wav(b))
                    else:
                        enc = make_y4m(*_raw_y4m(b))
                    rt_ok = enc == b
                except (ValueError, NotImplementedError, struct.error):
                    kind, len_ok, rt_ok = "invalid", False, False
                rows.append((int(mid), kind, len(b), int(len_ok), int(rt_ok)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "byte_len", "len_ok", "roundtrip_ok"],
            )

    return media.select("media_id", "payload").mapInPandas(
        gen, "media_id long, kind string, byte_len long, len_ok int, roundtrip_ok int"
    )
