from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from pagerank_spark.functions.multimodal import (
    decode_media,
    generate_media,
    sample_frames,
)


def test_media_generation_deterministic(spark):
    a = generate_media(spark, 30, seed=1).orderBy("media_id").collect()
    b = generate_media(spark, 30, seed=1, num_partitions=3).orderBy("media_id").collect()
    assert a == b
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}


def test_decode_fake_features(spark):
    media = generate_media(spark, 30, seed=1)
    feats = decode_media(media, fake=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert 0.0 <= r["mean_intensity"] <= 255.0
        assert len(bytes(r["feature"])) == 64  # 8x8 thumbnail
    # metadata round-trips through the decode
    meta = {r["media_id"]: (r["width"], r["height"], r["n_frames"]) for r in feats}
    src = {r["media_id"]: (r["width"], r["height"], r["n_frames"]) for r in media.collect()}
    assert meta == src


def test_decode_unrecognized_container_is_stubbed(spark):
    # the FAKE header format is not a real container; with allow_fake off the
    # decoder must refuse rather than guess (compressed formats land here too)
    media = generate_media(spark, 3, seed=1)
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_media(media, fake=False).collect()


def test_real_codecs_roundtrip():
    """BMP / WAV / Y4M encode->decode round-trips exactly (no Spark)."""
    import numpy as np

    from pagerank_spark.functions.multimodal import (
        _decode_payload,
        make_bmp,
        make_wav,
        make_y4m,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)  # odd w: padding
    kind, w, h, fr, px = _decode_payload(make_bmp(img), allow_fake=False)
    assert (kind, w, h, fr) == ("image", 7, 13, 1)
    assert np.array_equal(px[0], img.astype(np.uint16).sum(axis=2) // 3)

    wav = rng.integers(-32768, 32768, size=(2, 500), dtype=np.int16)
    kind, w, h, fr, px = _decode_payload(make_wav(wav), allow_fake=False)
    assert (kind, w, h, fr) == ("audio", 500, 2, 1)
    assert np.array_equal(px[0], np.abs(wav.astype(np.int32)) * 255 // 32767)

    vid = rng.integers(0, 256, size=(5, 6, 8), dtype=np.uint8)
    kind, w, h, fr, px = _decode_payload(make_y4m(vid), allow_fake=False)
    assert (kind, w, h, fr) == ("video", 8, 6, 5)
    assert np.array_equal(px, vid)


def test_real_media_pipeline(spark):
    """generate_real_media -> decode_media(fake=False) end-to-end: genuine
    containers decoded by the real parsers inside the Arrow UDF."""
    from pagerank_spark.functions.multimodal import generate_real_media

    media = generate_real_media(spark, 30, seed=1)
    feats = decode_media(media, fake=False).collect()
    assert len(feats) == 30
    assert {r["kind"] for r in feats} == {"image", "audio", "video"}
    meta = {r["media_id"]: (r["width"], r["height"], r["n_frames"]) for r in feats}
    src = {r["media_id"]: (r["width"], r["height"], r["n_frames"]) for r in media.collect()}
    assert meta == src
    frames = sample_frames(media, every=2, fake=False).collect()
    assert len(frames) > 0 and all(r["frame_idx"] % 2 == 0 for r in frames)


def test_sample_frames(spark):
    media = generate_media(spark, 30, seed=1)
    frames = sample_frames(media, every=2, fake=True)
    rows = frames.collect()
    assert all(r["frame_idx"] % 2 == 0 for r in rows)
    vids = media.filter(F.col("kind") == "video").collect()
    expected = sum(int(np.ceil(r["n_frames"] / 2)) for r in vids)
    assert len(rows) == expected
    # frame payload size = width*height of its video
    wh = {r["media_id"]: r["width"] * r["height"] for r in vids}
    assert all(len(bytes(r["frame"])) == wh[r["media_id"]] for r in rows)


def test_roundtrip_media(spark):
    """Lossless raw decode -> re-encode reproduces every payload
    byte-for-byte, and the closed-form container-length formula holds on
    the decoded dimensions; a corrupted payload surfaces as ok=0 counts
    instead of failing the job."""
    from pagerank_spark.functions.multimodal import (
        generate_real_media,
        roundtrip_media,
    )

    media = generate_real_media(spark, 24, seed=7)
    rows = roundtrip_media(media).collect()
    assert len(rows) == 24
    assert all(r["len_ok"] == 1 and r["roundtrip_ok"] == 1 for r in rows)
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}

    # corrupt: truncate each payload mid-body
    corrupt = media.select(
        "media_id", F.expr("substring(payload, 1, 20)").alias("payload")
    )
    bad = roundtrip_media(corrupt).collect()
    assert len(bad) == 24
    assert all(r["roundtrip_ok"] == 0 for r in bad)
