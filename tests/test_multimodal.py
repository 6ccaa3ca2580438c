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


class TestRealHeaderParsers:
    """image_dimensions / wav_metadata parse REAL container headers
    (hand-constructed to-spec bytes) with no codec library — PNG/GIF/BMP
    and canonical WAV entirely in Catalyst, JPEG via the stdlib marker
    walk."""

    @staticmethod
    def _samples():
        import struct

        png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
               + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
        gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
        bmp = b"BM" + b"\x00" * 12 + struct.pack("<III", 40, 800, 600)
        jpeg = (b"\xff\xd8"
                + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"   # APP0
                + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"      # SOF0
                + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9)
        wav = (b"RIFF" + struct.pack("<I", 36 + 88200) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
               + b"data" + struct.pack("<I", 88200))
        junk = b"\x00\x01\x02 not a media file"
        return png, gif, bmp, jpeg, wav, junk

    def test_image_dimensions_all_formats(self, spark):
        from datamancer_spark.operators.multimodal import image_dimensions

        png, gif, bmp, jpeg, wav, junk = self._samples()
        df = spark.createDataFrame(
            [("p.png", png), ("g.gif", gif), ("b.bmp", bmp),
             ("j.jpg", jpeg), ("x.bin", junk)],
            "path string, content binary",
        )
        out = {r["path"]: (r["width"], r["height"])
               for r in image_dimensions(df).collect()}
        assert out["p.png"] == (640, 480)
        assert out["g.gif"] == (320, 200)
        assert out["b.bmp"] == (800, 600)
        assert out["j.jpg"] == (640, 480)
        assert out["x.bin"] == (None, None)

    def test_png_leg_is_pure_catalyst(self, spark):
        from datamancer_spark.operators.multimodal import (
            bmp_dimensions, gif_dimensions, png_dimensions,
        )
        from pyspark.sql import functions as F

        png, gif, bmp, *_ = self._samples()
        df = spark.createDataFrame(
            [("a", png)], "path string, content binary"
        ).select(
            png_dimensions(F.col("content")).alias("d")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan

    def test_truncated_jpeg_yields_null(self, spark):
        from datamancer_spark.operators.multimodal import image_dimensions

        df = spark.createDataFrame(
            [("t.jpg", b"\xff\xd8\xff\xc0\x00")],
            "path string, content binary",
        )
        row = image_dimensions(df).collect()[0]
        assert row["width"] is None and row["height"] is None

    def test_wav_metadata(self, spark):
        from datamancer_spark.operators.multimodal import wav_metadata

        *_, wav, junk = self._samples()
        df = spark.createDataFrame(
            [("a.wav", wav), ("x.bin", junk)],
            "path string, content binary",
        )
        out = {r["path"]: r for r in wav_metadata(df).collect()}
        a = out["a.wav"]
        assert (a["channels"], a["sample_rate"], a["bits_per_sample"]) == (2, 44100, 16)
        assert abs(a["duration_s"] - 0.5) < 1e-9
        x = out["x.bin"]
        assert x["sample_rate"] is None and x["duration_s"] is None

    def test_wav_is_pure_catalyst(self, spark):
        from datamancer_spark.operators.multimodal import wav_metadata

        *_, wav, _ = self._samples()
        df = spark.createDataFrame([("a.wav", wav)], "path string, content binary")
        plan = wav_metadata(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan


class TestTopDownBmp:
    def test_negative_height_reports_magnitude(self, spark):
        """biHeight is SIGNED: top-down BMPs store -height. The parser
        must sign-extend and report the magnitude, not ~4.29e9."""
        import struct

        from pyspark.sql import functions as F

        from datamancer_spark.operators.multimodal import bmp_dimensions

        td = b"BM" + b"\x00" * 12 + struct.pack("<IIi", 40, 800, -600)
        df = spark.createDataFrame([("t.bmp", td)], "path string, content binary")
        row = df.select(bmp_dimensions(F.col("content")).alias("d")).collect()[0]
        assert row["d"]["width"] == 800
        assert row["d"]["height"] == 600
