"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata, processed via
``mapInPandas`` in Arrow batches — the Spark-side schema, partitioning, UDF
signatures, and batch shapes are real and tested. The actual codec step is
STUBBED: no image/audio libraries ship in this container, so ``decode_media``
either raises NotImplementedError (real mode) or runs a deterministic fake
decoder (``fake=True``) that parses the engine's own fake header format. Swap
``_decode_real`` for a Pillow/ffmpeg call on a real cluster; nothing else
changes.

Fake payload format (produced by make_fake_media): b"FAKE" + kind byte
(0=image,1=audio,2=video) + uint16 width + uint16 height + uint16 n_frames +
deterministic pixel bytes.
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


def _decode_real(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding requires Pillow/ffmpeg, not present in this "
        "container; use fake=True or plug a codec in here"
    )


def _decode_fake(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    assert payload[:4] == b"FAKE", "not a fake-media payload"
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
                if not fake:
                    _decode_real(bytes(payload))
                kind, w, h, fr, px = _decode_fake(bytes(payload))
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
                if not fake:
                    _decode_real(bytes(payload))
                kind, w, h, fr, px = _decode_fake(bytes(payload))
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
