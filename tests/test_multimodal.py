"""Multimodal plumbing: binaryFile ingestion, Catalyst magic sniffing,
digest dedup, and the stubbed decode pipelines (schema/batch contract)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media_dir(spark):
    d = tempfile.mkdtemp()
    files = {
        "a.png": b"\x89PNG\r\n\x1a\n" + b"\x00" * 64,
        "b.jpg": b"\xff\xd8\xff\xe0" + b"\x01" * 128,
        "c.bin": b"garbage-bytes" * 10,
        "dup.png": b"\x89PNG\r\n\x1a\n" + b"\x00" * 64,  # same bytes as a.png
    }
    for name, blob in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(blob)
    yield d


def test_read_binary_and_sniff(spark, media_dir):
    from datamancer_spark.operators.multimodal import read_binary_dir, with_media_metadata

    df = with_media_metadata(read_binary_dir(spark, media_dir))
    kinds = {
        os.path.basename(r["path"]): r["media"]["kind"] for r in df.collect()
    }
    assert kinds["a.png"] == "image/png"
    assert kinds["b.jpg"] == "image/jpeg"
    assert kinds["c.bin"] == "application/octet-stream"
    sizes = {os.path.basename(r["path"]): r["media"]["size_bytes"] for r in df.collect()}
    assert sizes["a.png"] == 72


def test_media_dedup(spark, media_dir):
    from datamancer_spark.operators.multimodal import media_dedup, read_binary_dir

    agg = media_dedup(read_binary_dir(spark, media_dir))
    dups = [r for r in agg.collect() if r["n_dups"] == 2]
    assert len(dups) == 1
    assert os.path.basename(dups[0]["keep_path"]) == "a.png"


def test_decode_images_stub_contract(spark, media_dir):
    from datamancer_spark.operators.multimodal import decode_images, read_binary_dir

    src = read_binary_dir(spark, media_dir, glob="*.png")
    out = decode_images(src, allow_fake=True)
    rows = out.collect()
    assert len(rows) == 2
    assert out.columns == ["path", "width", "height", "channels", "mean_intensity"]
    # deterministic: identical bytes → identical fake decode
    by_name = {os.path.basename(r["path"]): (r["width"], r["height"]) for r in rows}
    assert by_name["a.png"] == by_name["dup.png"]
    assert all(64 <= r["width"] < 576 for r in rows)


def test_decode_images_requires_codec_or_fake(spark, media_dir):
    from datamancer_spark.operators.multimodal import decode_images, read_binary_dir

    src = read_binary_dir(spark, media_dir)
    with pytest.raises(NotImplementedError):
        decode_images(src)  # no PIL in this container, no fake requested


def test_sample_frames_bounded(spark, media_dir):
    from datamancer_spark.operators.multimodal import read_binary_dir, sample_frames

    src = read_binary_dir(spark, media_dir, glob="c.bin")
    out = sample_frames(src, every_n=10, max_frames=4, allow_fake=True)
    rows = out.collect()
    assert 1 <= len(rows) <= 4
    assert rows[0]["frame_idx"] == 0 and len(rows[0]["frame_bytes"]) == 16


def test_audio_features_stub(spark, media_dir):
    from datamancer_spark.operators.multimodal import audio_features, read_binary_dir

    out = audio_features(read_binary_dir(spark, media_dir, glob="b.jpg"), allow_fake=True)
    r = out.collect()[0]
    assert r["sample_rate"] == 16000 and len(r["loudness"]) == 8
