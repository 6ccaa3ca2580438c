"""Multimodal (image/audio/video) column support.

Design (north star: treat media as opaque ``binary`` columns with typed
metadata): ingestion via Spark's native ``binaryFile`` source, metadata
extraction as pure Catalyst expressions over the bytes (magic sniffing,
sizes), and decode/feature stages as Arrow-batched ``mapInPandas``
pipelines.

The actual codec step is STUBBED in this environment (no PIL/ffmpeg in
the container): ``decode_images`` raises ``NotImplementedError`` unless
``allow_fake=True``, which substitutes a deterministic md5-derived fake
decode so the Spark-side plumbing — schema, batch iteration, partition
shape, output contract — is real and testable end-to-end. Swapping in a
real codec changes only the marked inner function.

Scale notes: binary payloads never shuffle — every stage here is
narrow (mapInPandas over the scan); only extracted features (small
structs) flow into joins/aggregations downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# -- ingestion ---------------------------------------------------------------


def read_binary_dir(
    spark: SparkSession, path: str, glob: str = "*", max_bytes: int | None = None
) -> DataFrame:
    """Ingest a directory of media files as (path, modificationTime,
    length, content:binary) via Spark's binaryFile source. Splittable by
    file; pushdown on pathGlobFilter happens at listing time."""
    reader = spark.read.format("binaryFile").option("pathGlobFilter", glob)
    if max_bytes is not None:
        # guardrail: oversized payloads are dropped at scan, not OOM'd later
        return reader.load(path).filter(F.col("length") <= max_bytes)
    return reader.load(path)


# -- metadata (pure Catalyst expressions, no Python) -------------------------

MAGIC_KINDS: list[tuple[bytes, str]] = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "riff"),  # wav/avi/webp → refined below
    (b"\x00\x00\x00", "video/mp4-ish"),
    (b"ID3", "audio/mp3"),
    (b"OggS", "audio/ogg"),
]


def sniff_kind(bin_col: F.Column) -> F.Column:
    """Media-kind detection from magic bytes — Catalyst-only (substring on
    binary + hex compare), evaluated next to the scan."""
    head = F.hex(F.substring(bin_col, 1, 4))
    expr = F.lit("application/octet-stream")
    for magic, kind in reversed(MAGIC_KINDS):
        prefix = magic.hex().upper()
        expr = F.when(head.startswith(F.lit(prefix)), F.lit(kind)).otherwise(expr)
    return expr


def with_media_metadata(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Attach the typed metadata struct: {kind, size_bytes, digest}."""
    b = F.col(bin_col)
    return df.withColumn(
        "media",
        F.struct(
            sniff_kind(b).alias("kind"),
            F.length(b).cast("long").alias("size_bytes"),
            F.md5(b).alias("digest"),
        ),
    )


def media_dedup(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Exact byte-level dedup on content digest — one shuffle on the
    32-hex digest; payload bytes stay put (only digest+path move)."""
    return (
        df.select(F.col("path"), F.md5(F.col(bin_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min("path").alias("keep_path"), F.count(F.lit(1)).alias("n_dups"))
    )


# -- decode / feature extraction (Arrow batch pipelines) ---------------------

DECODE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def decode_images(
    df: DataFrame, bin_col: str = "content", allow_fake: bool = False
) -> DataFrame:
    """Decode images to (width, height, channels, mean_intensity).

    Real path requires PIL (absent in this container) → raises
    NotImplementedError unless ``allow_fake=True``, which uses a
    deterministic md5-derived fake so the batch plumbing is testable.
    The mapInPandas contract (schema, batching, laziness) is identical
    for the real codec."""
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil and not allow_fake:
        raise NotImplementedError(
            "image decode requires PIL (not in this environment); "
            "pass allow_fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"path": [], "width": [], "height": [], "channels": [], "mean_intensity": []}
            for path, blob in zip(pdf["path"], pdf[bin_col]):
                if have_pil:  # pragma: no cover - real codec path
                    import io

                    import PIL.Image as Image

                    img = Image.open(io.BytesIO(blob))
                    w, h = img.size
                    ch = len(img.getbands())
                    mean = 0.0  # full scan omitted here
                else:
                    # FAKE DECODE (deterministic stub): dims derived from
                    # the digest so tests are stable.
                    d = hashlib.md5(bytes(blob)).digest()
                    w, h = 64 + d[0] % 512, 64 + d[1] % 512
                    ch = 3
                    mean = round(d[2] / 255.0, 6)
                out["path"].append(path)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["mean_intensity"].append(mean)
            yield pd.DataFrame(out)

    return df.select("path", bin_col).mapInPandas(batches, DECODE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    bin_col: str = "content",
    every_n: int = 10,
    max_frames: int = 8,
    allow_fake: bool = False,
) -> DataFrame:
    """Sample every-Nth frame from video blobs → one row per frame.
    Codec stubbed (no ffmpeg here): fake frames are md5-chained slices,
    preserving the real contract (explode-shaped output, bounded by
    max_frames so one giant video cannot blow up a task)."""
    if not allow_fake:
        raise NotImplementedError(
            "video decode requires ffmpeg bindings (not in this environment); "
            "pass allow_fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"path": [], "frame_idx": [], "frame_bytes": []}
            for path, blob in zip(pdf["path"], pdf[bin_col]):
                blob = bytes(blob)
                n_fake_frames = max(1, len(blob) // max(every_n, 1))
                for i in range(min(n_fake_frames, max_frames)):
                    rows["path"].append(path)
                    rows["frame_idx"].append(i * every_n)
                    rows["frame_bytes"].append(
                        hashlib.md5(blob + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(rows)

    return df.select("path", bin_col).mapInPandas(batches, FRAME_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("duration_s", DoubleType()),
        StructField("sample_rate", IntegerType()),
        StructField("loudness", ArrayType(DoubleType())),
    ]
)


def audio_features(
    df: DataFrame, bin_col: str = "content", allow_fake: bool = False
) -> DataFrame:
    """Per-clip audio features (duration, rate, loudness envelope).
    Codec stubbed; contract real."""
    if not allow_fake:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa (not in this "
            "environment); pass allow_fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"path": [], "duration_s": [], "sample_rate": [], "loudness": []}
            for path, blob in zip(pdf["path"], pdf[bin_col]):
                d = hashlib.md5(bytes(blob)).digest()
                rows["path"].append(path)
                rows["duration_s"].append(round(1 + d[0] / 8.0, 3))
                rows["sample_rate"].append(16000)
                rows["loudness"].append([round(b / 255.0, 4) for b in d[:8]])
            yield pd.DataFrame(rows)

    return df.select("path", bin_col).mapInPandas(batches, AUDIO_SCHEMA)
