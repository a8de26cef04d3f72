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


def test_decode_real_is_stubbed(spark):
    media = generate_media(spark, 3, seed=1)
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_media(media, fake=False).collect()


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
