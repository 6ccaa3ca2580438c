"""Multimodal (image/audio/video) column support.

Design (north star: treat media as opaque ``binary`` columns with typed
metadata): ingestion via Spark's native ``binaryFile`` source, metadata
extraction as pure Catalyst expressions over the bytes (magic sniffing,
sizes), and decode/feature stages as Arrow-batched ``mapInPandas``
pipelines.

Two tiers:

- **Header metadata — REAL.** Container headers are plain bytes, so
  ``image_dimensions`` (PNG/GIF/BMP in pure Catalyst, JPEG via a
  stdlib marker walk) and ``wav_metadata`` (canonical RIFF layout in
  pure Catalyst) parse actual on-disk formats with no codec library.
- **Pixel/sample decode — REAL for every image format plus PCM audio,
  stubbed only where a codec is genuinely unavoidable.** PNG pixels
  (stdlib zlib + filter inversion), baseline JPEG pixels (own
  entropy/IDCT pipeline, ``operators.jpegcodec``), PCM + G.711
  A-law/mu-law WAV samples, animated-GIF frames (stdlib LZW), and
  MJPEG-in-AVI video frames (RIFF walk + the JPEG decoder) decode for
  real, as do FLAC (``operators.flaccodec``) and MPEG-1 audio Layers
  I/III — real MP3 samples (``operators.mpegaudio``, late r7; see its
  docstring for the refusal set), and Ogg Vorbis
  (``operators.vorbiscodec``, r9), and lossless WebP
  (``operators.webpcodec``, r9). Compressed video codecs (mp4/webm,
  non-MJPEG AVI) and Ogg Opus audio DECODE
  needs ffmpeg (absent here) — those rows yield NULLs, or a
  deterministic md5-derived fake under ``allow_fake=True`` so the
  Spark-side plumbing — schema, batch iteration, partition shape,
  output contract — stays testable end-to-end. Swapping in a real
  codec changes only the marked inner function.

  r9 determination on Opus specifically (why it stays refused while
  Vorbis was closed): Opus is NOT self-describing — CELT's PVQ band
  probability model and SILK's LTP/LSF codebooks are large
  spec-constant PDF tables driving a range coder, with no Kraft-style
  structural self-check (a range coder accepts ANY probability table
  and silently decodes plausible noise from a wrong one). Same gate
  failure as the MP3 ESC tables (``mpeghuff.py``) and the video
  probability tables (``sample_frames``); metadata (rate/channels/
  duration via the Ogg page walk) stays real.

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
    BooleanType,
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
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
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


def media_decode_coverage(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Per-container decode-coverage report (r6 advice #8): what
    fraction of each media container this engine can actually SCREEN —
    produce pixels/samples for perceptual (dHash) dedup — versus
    metadata-only. A pipeline that runs
    ``audio_dhash_pairs``/``dhash_pairs`` must report "N% of blobs
    screenable" instead of silently screening the decodable minority.

    Screenability is CAPABILITY BY CONTAINER/CODEC from the cheap
    header walks (no full decode attempt): PNG/JPEG/GIF/BMP images →
    pixels (all baseline + progressive-JPEG profiles decode;
    uncompressed BMP since r9, RLE refuses); WAV
    PCM/G.711/IMA-ADPCM and FLAC → samples (per the fmt chunk /
    flaccodec); MP3 → samples when every frame's side info stays
    within the MPEG-1 Layer I/III feature set this engine decodes
    (``mpegaudio.mpeg_stream_supported``, late r7); Ogg Vorbis →
    samples when the setup header parses inside the r9 feature set
    (``vorbiscodec.vorbis_stream_supported``); Ogg Opus / MP4 / WebM /
    WebP → metadata only; MJPEG AVI → frames
    (fourcc walked in the header region). Individually malformed
    blobs still fail at decode time and surface as NULL features
    there. Output: (container, n, n_screenable, screenable_frac),
    one small row per container — aggregate-only, nothing
    corpus-sized moves."""
    from ..functions.rounding import prnd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"container": [], "screenable": []}
            for blob in pdf[bin_col]:
                blob = bytes(blob)
                container, screen = _classify_decode_tier(blob)
                out["container"].append(container)
                out["screenable"].append(screen)
            yield pd.DataFrame(out)

    rows = df.select(bin_col).mapInPandas(
        batches,
        StructType(
            [
                StructField("container", StringType()),
                StructField("screenable", BooleanType()),
            ]
        ),
    )
    return (
        rows.groupBy("container")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("screenable").cast("long"))
            .cast("long")
            .alias("n_screenable"),
        )
        .select(
            "container",
            "n",
            "n_screenable",
            prnd(F.col("n_screenable") / F.col("n"), 6).alias(
                "screenable_frac"
            ),
        )
    )


def _classify_decode_tier(blob: bytes):
    """(container, screenable) for one blob — header walks only."""
    import struct as _struct

    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return ("png", True)
    if blob[:3] == b"\xff\xd8\xff":
        return ("jpeg", True)
    if blob[:4] == b"GIF8":
        return ("gif", True)
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiffcodec import tiff_supported

        # r9: baseline TIFF (none/PackBits/LZW strips, 8-bit) decodes
        # for real; fax/JPEG-in-TIFF/tiled/16-bit stay metadata-only
        return ("tiff", tiff_supported(blob))
    if blob[:2] == b"BM" and len(blob) >= 54:
        hdr_size = _struct.unpack("<I", blob[14:18])[0]
        if hdr_size in (40, 52, 56, 108, 124):
            bpp = _struct.unpack("<H", blob[28:30])[0]
            comp = _struct.unpack("<I", blob[30:34])[0]
            # r9: uncompressed BI_RGB (and default-mask BITFIELDS)
            # decode for real; RLE stays metadata-only
            return (
                "bmp",
                bpp in (1, 4, 8, 24, 32) and comp in (0, 3),
            )
    if len(blob) >= 12 and blob[:4] == b"RIFF":
        sub = blob[8:12]
        if sub == b"WAVE":
            pos = 12
            while pos + 8 <= len(blob):
                cid = blob[pos : pos + 4]
                ln = _struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
                if cid == b"fmt " and ln >= 16:
                    # guard the slice: a truncated blob may declare
                    # ln >= 16 yet end before pos+24 (ADVICE r7)
                    body = blob[pos + 8 : pos + 8 + ln]
                    if len(body) < 16:
                        return ("wav", False)
                    afmt, _ch, _r, _br, _ba, bits = _struct.unpack(
                        "<HHIIHH", body[:16]
                    )
                    return ("wav", _wav_fmt_decodable(afmt, bits))
                pos += 8 + ln + (ln & 1)
            return ("wav", False)
        if sub == b"AVI ":
            # MJPEG streams decode via avi_mjpeg_frames; other fourccs
            # (compressed video) are metadata-only. Real strh/strf walk
            # (r7) — a substring sniff can miss or false-positive
            return ("avi", avi_video_fourcc(blob) == "MJPG")
        if sub == b"WEBP":
            from .webpcodec import webp_supported

            # r9: lossless VP8L decodes for real when the stream avoids
            # the refused neighbor-distance table — a true capability
            # walk of the symbol stream, not container sniffing; lossy
            # VP8 stays metadata-only (compressed-video determination)
            return ("webp", webp_supported(blob))
        return ("riff", False)
    if blob[:4] == b"fLaC":
        return ("flac", True)  # r7: flaccodec decodes samples for real
    if len(blob) >= 12 and blob[:4] == b"FORM" and blob[8:12] in (
        b"AIFF", b"AIFC"
    ):
        comm = _aiff_comm(blob)
        return (
            "aiff",
            comm is not None and comm[4].lower() in _AIFC_DECODABLE,
        )
    if blob[:4] == b"OggS":
        from .vorbiscodec import vorbis_stream_supported

        # r9: Vorbis decodes for real; the capability walk parses the
        # three header packets only (floor 1 / residue 0-2 / mapping 0)
        return ("ogg", vorbis_stream_supported(blob))
    if blob[:3] == b"ID3" or (
        len(blob) > 1 and blob[0] == 0xFF and (blob[1] & 0xE0) == 0xE0
    ):
        # the ADTS layer bits (00) also satisfy the loose MPEG sync —
        # a chained frame-length walk (r10) disambiguates before the
        # per-frame MPEG side-info screen runs
        if adts_metadata(blob) is not None:
            return ("aac/adts", False)
        from .mpegaudio import mpeg_stream_supported

        return ("mp3", mpeg_stream_supported(blob))
    if len(blob) >= 12 and blob[4:8] == b"ftyp":
        return ("mp4", False)
    if blob[:4] == b"\x1a\x45\xdf\xa3":
        return ("webm", False)
    return ("unknown", False)


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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def png_decode_array(blob: bytes):
    """Pure-stdlib PNG pixel decode returning the PIXELS: zlib-inflate
    the IDAT stream and invert the per-scanline filters
    (None/Sub/Up/Average/Paeth) per the PNG spec §9. Supports every
    legal depth — 8/16-bit everywhere (16-bit downsampled to the high
    byte) and the sub-byte 1/2/4-bit packings for grayscale (scaled to
    8-bit) and palette (r7; bit-unpacked MSB-first per spec §7.2) —
    Adam7 interlacing, and all five color types (gray, RGB, palette,
    gray+alpha, RGBA): the COMPLETE baseline PNG profile matrix.
    Returns ``(width, height, channels, pixels)`` with pixels an
    (h, w, channels) uint8 ndarray — alpha dropped, palette expanded
    through PLTE to RGB — or ``None`` for non-PNG / malformed input.
    ``png_decode_pixels`` wraps this for summary stats; ``image_dhash``
    consumes the array."""
    import struct
    import zlib

    import numpy as np

    if len(blob) < 33 or blob[:8] != _PNG_SIG:
        return None
    pos, idat, meta, plte = 8, [], None, None
    try:
        while pos + 8 <= len(blob):
            ln, typ = struct.unpack(">I4s", blob[pos : pos + 8])
            data = blob[pos + 8 : pos + 8 + ln]
            if len(data) < ln:
                return None
            if typ == b"IHDR":
                meta = struct.unpack(">IIBBBBB", data)
            elif typ == b"PLTE":
                plte = data
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
            pos += 12 + ln  # len + type + data + crc
        if meta is None or not idat:
            return None
        w, h, depth, ctype, comp, filt, interlace = meta
        nch = _PNG_CHANNELS.get(ctype)
        # sub-byte depths (1/2/4) are legal for grayscale and palette
        # only (spec 11.2.2); 16-bit palette does not exist
        depth_ok = depth in (8, 16) or (
            depth in (1, 2, 4) and ctype in (0, 3)
        )
        if (
            not depth_ok or interlace not in (0, 1)
            or comp != 0 or filt != 0
            or nch is None or w == 0 or h == 0
            or (ctype == 3 and depth == 16)
        ):
            return None
        raw = zlib.decompress(b"".join(idat))
    except Exception:
        return None
    sub_byte = depth < 8
    # filtering operates on BYTES: for sub-byte depths the left
    # neighbor is the previous byte (bpp=1), spec 9.2
    bpp = 1 if sub_byte else nch * (depth // 8)

    def unfilter(off: int, wpx: int, hpx: int):
        """Invert scanline filters for one (sub)image starting at byte
        ``off``; returns (bytes_consumed, (hpx, stride) uint8 array)
        or None on malformed input. stride is the FILTERED byte width:
        bit-packed for sub-byte depths (ceil(wpx*nch*depth/8))."""
        stride = (
            (wpx * nch * depth + 7) // 8 if sub_byte else wpx * bpp
        )
        if len(raw) - off < hpx * (stride + 1):
            return None
        sub = np.empty((hpx, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.intc)
        p = off
        for y in range(hpx):
            f = raw[p]
            line = bytearray(raw[p + 1 : p + 1 + stride])
            p += 1 + stride
            if f == 1:  # Sub: left-pixel running sum = per-channel
                # cumsum mod 256 (vectorized; 0.08s -> ~0 on 512² RGB).
                # Average/Paeth stay sequential — their left operand is
                # the halved/predicted OUTPUT, not a plain prefix sum
                # (all-Paeth 512² RGB measures 0.38s: fine for Arrow
                # batches; swap a codec in for throughput-critical use)
                a = (
                    np.frombuffer(bytes(line), dtype=np.uint8)
                    .reshape(-1, bpp)  # rows of left-neighbor units
                    .astype(np.int64)
                )
                line = bytearray(
                    (np.cumsum(a, axis=0) % 256).astype(np.uint8).tobytes()
                )
            elif f == 2:  # Up: vectorized add of the prior scanline
                line = bytearray(
                    ((np.frombuffer(bytes(line), dtype=np.uint8) + prev) & 255)
                    .astype(np.uint8)
                    .tobytes()
                )
            elif f == 3:  # Average
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + ((a + int(prev[i])) >> 1)) & 255
            elif f == 4:  # Paeth predictor
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    b = int(prev[i])
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[i] = (line[i] + pred) & 255
            elif f != 0:
                return None
            sub[y] = np.frombuffer(bytes(line), dtype=np.uint8)
            prev = sub[y].astype(np.intc)
        return p - off, sub

    def samples(sub: np.ndarray, wpx: int) -> np.ndarray:
        """(hpx, stride) filtered bytes -> (hpx, wpx*nch, unit) sample
        array. Sub-byte depths unpack MSB-first d-bit fields and drop
        the final byte's padding bits (spec 7.2); byte depths pass
        through."""
        if not sub_byte:
            return sub.reshape(sub.shape[0], wpx, bpp)
        bits = np.unpackbits(sub, axis=1)
        ns = wpx * nch
        b = bits[:, : ns * depth].reshape(sub.shape[0], ns, depth)
        w8 = 1 << np.arange(depth - 1, -1, -1)
        return (b * w8).sum(axis=2).astype(np.uint8)[:, :, None]

    unit = bpp if not sub_byte else nch
    if interlace == 0:
        got = unfilter(0, w, h)
        if got is None:
            return None
        full = samples(got[1], w)
    else:  # Adam7: seven sub-images scattered onto the full grid
        full = np.zeros((h, w, unit), dtype=np.uint8)
        off = 0
        for (x0, y0, dx, dy) in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty pass has no scanlines
            got = unfilter(off, pw, ph)
            if got is None:
                return None
            consumed, sub = got
            off += consumed
            full[y0::dy, x0::dx] = samples(sub, pw)
    if depth == 16:  # high byte of each big-endian 16-bit sample
        full = full.reshape(h, w, nch, 2)[:, :, :, 0]
    if ctype == 0 and sub_byte:
        # scale d-bit gray to 8-bit (255 / (2^d - 1), exact integers)
        full = (full.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    if ctype == 3:  # palette: expand indices through PLTE to RGB
        if plte is None or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idxs = full.reshape(-1)
        if idxs.max(initial=0) >= len(pal):
            return None
        return (w, h, 3, pal[idxs].reshape(h, w, 3))
    px = full.reshape(h, w, nch)
    color = px[:, :, :-1] if ctype in (4, 6) else px  # drop alpha
    return (w, h, nch, color)


def png_decode_pixels(blob: bytes):
    """Summary-stat wrapper over ``png_decode_array``: returns
    ``(width, height, channels, mean_intensity)`` with mean over the
    non-alpha samples in [0, 1], or ``None`` for undecodable input —
    callers treat that as undecodable, never as an error."""
    decoded = png_decode_array(blob)
    if decoded is None:
        return None
    w, h, nch, px = decoded
    return (w, h, nch, round(float(px.mean()) / 255.0, 6))


def decode_image_blob(blob: bytes):
    """ONE image blob → ``(width, height, channels, pixels uint8
    (h, w, ch))`` or ``None`` — the pure-Python decode chain shared by
    every image kernel and by the codec-backend verification oracle
    (``operators/codecbackend.py``). Format walk: PNG → baseline/
    progressive JPEG → GIF (first frame) → BMP → TIFF → lossless
    WebP. No codec library anywhere; ``None`` means undecodable (an
    unsupported format or a loud decode refusal), never an error."""
    import numpy as np

    from .jpegcodec import jpeg_decode_array

    decoded = png_decode_array(blob)
    if decoded is None:
        decoded = jpeg_decode_array(blob)
    if decoded is None:
        first = next(iter(gif_decode_frames(blob, max_frames=1)), None)
        if first is not None:
            _, w, h, rgb = first
            decoded = (
                w, h, 3,
                np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3),
            )
    if decoded is None:
        decoded = bmp_decode_array(blob)
    if decoded is None and blob[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiffcodec import tiff_decode_array

        decoded = tiff_decode_array(blob)
    if decoded is None and blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        from .webpcodec import vp8l_decode_array

        decoded = vp8l_decode_array(blob)
    return decoded


def decode_images(
    df: DataFrame,
    bin_col: str = "content",
    allow_fake: bool = False,
    on_unsupported: str = "null",
    backend=None,
) -> DataFrame:
    """Decode images to (width, height, channels, mean_intensity).

    The real-decode chain (``decode_image_blob``: PNG, JPEG, GIF, BMP,
    TIFF, lossless WebP — no codec library) runs through the pluggable
    batch backend interface (``operators/codecbackend.py``);
    ``backend`` accepts an ``ImageDecodeBackend`` instance or a
    registered name, defaulting to the pure-Python reference (or the
    ``DATAMANCER_IMAGE_BACKEND`` env var). An accelerated backend must
    pass ``validate_image_backend`` (bit-for-bit pixel equality vs the
    reference) before use. Blobs no backend can decode fall through to
    PIL when present; without PIL, ``allow_fake=True`` substitutes a
    deterministic md5-derived fake, and otherwise the row comes back
    with NULL metrics (``on_unsupported="null"``, the default — at
    100 TB one undecodable blob must never kill the job; pass
    ``on_unsupported="error"`` to fail fast instead). Arrow-batched
    mapInPandas either way — the UDF boundary is per-batch, so a C
    backend slots in without touching plan shape."""
    if on_unsupported not in ("null", "error"):
        raise ValueError(f"on_unsupported must be null|error, got {on_unsupported!r}")
    from .codecbackend import resolve_image_backend

    backend = resolve_image_backend(backend)

    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"path": [], "width": [], "height": [], "channels": [], "mean_intensity": []}
            blobs = [bytes(b) for b in pdf[bin_col]]
            results = backend.decode_batch(blobs)
            for path, blob, res in zip(pdf["path"], blobs, results):
                if res is not None:
                    w, h, ch, px = res
                    mean = round(float(px.mean()) / 255.0, 6)
                elif have_pil:  # pragma: no cover - real codec path
                    import io

                    import numpy as np
                    import PIL.Image as Image

                    img = Image.open(io.BytesIO(blob))
                    w, h = img.size
                    ch = len(img.getbands())
                    mean = round(
                        float(np.asarray(img, dtype=np.float64).mean())
                        / 255.0,
                        6,
                    )
                elif allow_fake:
                    # FAKE DECODE (deterministic stub): dims derived from
                    # the digest so tests are stable.
                    d = hashlib.md5(blob).digest()
                    w, h = 64 + d[0] % 512, 64 + d[1] % 512
                    ch = 3
                    mean = round(d[2] / 255.0, 6)
                elif on_unsupported == "error":
                    raise NotImplementedError(
                        f"decode beyond the no-codec-library chain "
                        f"requires PIL (not in this environment): {path}"
                    )
                else:
                    w = h = ch = mean = None
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


def avi_mjpeg_frames(blob: bytes, every_n: int = 1, max_frames: int = 64):
    """REAL video frame decode for MJPEG-in-AVI — the one mainstream
    video profile that needs no codec library, because the container is
    a plain RIFF chunk list and every frame is an independent baseline
    JPEG (``jpegcodec.jpeg_decode_array``). Walks RIFF('AVI ') →
    LIST('movi') → '##dc'/'##db' chunks, decodes every ``every_n``-th
    frame, yields ``(frame_idx, width, height, rgb_bytes)`` like
    ``gif_decode_frames``. Compressed codecs inside AVI (and mp4/webm
    containers) still return nothing — those genuinely need ffmpeg."""
    import struct

    from .jpegcodec import jpeg_decode_array

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return
    pos = 12
    movi = None
    try:
        while pos + 8 <= len(blob):
            cid = blob[pos : pos + 4]
            ln = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
            if cid == b"LIST" and blob[pos + 8 : pos + 12] == b"movi":
                movi = (pos + 12, pos + 8 + ln)
                break
            pos += 8 + ln + (ln & 1)
        if movi is None:
            return
        p, end = movi
        frame_idx = 0
        emitted = 0
        while p + 8 <= end and emitted < max_frames:
            cid = blob[p : p + 4]
            ln = struct.unpack("<I", blob[p + 4 : p + 8])[0]
            if cid[2:4] in (b"dc", b"db"):
                if frame_idx % every_n == 0:
                    decoded = jpeg_decode_array(blob[p + 8 : p + 8 + ln])
                    if decoded is not None:
                        w, h, ch, px = decoded
                        if ch == 1:
                            import numpy as np

                            px = np.repeat(px, 3, axis=2)
                        yield (frame_idx, w, h, px.tobytes())
                        emitted += 1
                frame_idx += 1
            p += 8 + ln + (ln & 1)
    except Exception:
        return


def sample_frames(
    df: DataFrame,
    bin_col: str = "content",
    every_n: int = 10,
    max_frames: int = 8,
    allow_fake: bool = False,
) -> DataFrame:
    """Sample every-Nth frame from animation/video blobs → one row per
    frame (explode-shaped output, bounded by max_frames so one giant
    clip cannot blow up a task). Animated GIF decodes FOR REAL with the
    stdlib LZW decoder (``gif_decode_frames``; frame_bytes is the RGB24
    canvas after compositing), and MJPEG-in-AVI video decodes FOR REAL
    too (``avi_mjpeg_frames`` — RIFF walk + the baseline JPEG decoder);
    compressed video codecs (mp4/webm, non-MJPEG AVI) are refused —
    those rows are dropped, or get md5-chained fake frames under
    ``allow_fake=True``.

    r9 DETERMINATION on compressed-video decode (the carried r7 #2
    gap): VP8/VP9/AV1 and H.264 all entropy-code against LARGE
    spec-constant tables (VP8's default coefficient-probability
    tables, H.264's CAVLC code tables / CABAC context initializers)
    that fail the same verifiable-transcription standard the MP3 ESC
    tables failed (mpeghuff.py) — unlike Huffman length vectors they
    carry no Kraft-style structural self-check at all, so a
    mis-remembered probability silently decodes plausible-looking
    garbage forever. Vorbis was closable because its tables travel in
    the stream (vorbiscodec.py, r9); Theora shares that property but
    is ~absent from modern crawls. Until real source material or a
    conformance stream enters the environment, compressed video stays
    a LOUD refusal: containers yield metadata + codec ids
    (``video_metadata``), ``media_decode_coverage`` reports the
    unscreenable fraction, and curation never silently drops what it
    cannot read."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"path": [], "frame_idx": [], "frame_bytes": []}
            for path, blob in zip(pdf["path"], pdf[bin_col]):
                blob = bytes(blob)
                if blob[:4] == b"GIF8":
                    # decode sequentially (compositing needs every frame)
                    # but EMIT only every-Nth, capped at max_frames
                    emitted = 0
                    for idx, w, h, rgb in gif_decode_frames(
                        blob, max_frames=every_n * max_frames
                    ):
                        if idx % every_n:
                            continue
                        rows["path"].append(path)
                        rows["frame_idx"].append(idx)
                        rows["frame_bytes"].append(rgb)
                        emitted += 1
                        if emitted >= max_frames:
                            break
                    continue
                if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
                    for idx, w, h, rgb in avi_mjpeg_frames(
                        blob, every_n=every_n, max_frames=max_frames
                    ):
                        rows["path"].append(path)
                        rows["frame_idx"].append(idx)
                        rows["frame_bytes"].append(rgb)
                    continue
                if not allow_fake:
                    continue  # undecodable without ffmpeg: drop the row
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


_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
             (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]


def _tdiv(a: int, b: int) -> int:
    """C-style integer division (truncate toward zero) — the MS-ADPCM
    reference arithmetic; Python's // floors, which drifts the
    predictor feedback loop on negative values."""
    q = abs(a) // b
    return -q if a < 0 else q


def _ms_adpcm_decode(data: bytes, block_align: int, channels: int = 1):
    """MS ADPCM (WAV fmt 2, r7): per block, one predictor-coefficient
    index + initial delta + two warmup int16s per channel, then 4-bit
    codes (high nibble first, channels alternating in stereo):
    sample = trunc((s1*c1 + s2*c2)/256) + signed_code*delta, delta
    adapted via the 16-entry table with a floor of 16. Returns the
    mono-mixed float array in [-1, 1] or None."""
    import struct as st

    import numpy as np

    if channels not in (1, 2) or block_align < 7 * channels + 1:
        return None
    out = []
    for b0 in range(0, len(data) - block_align + 1, block_align):
        blk = data[b0 : b0 + block_align]
        pred = list(blk[:channels])
        if any(p >= len(_MS_COEFS) for p in pred):
            return None
        off = channels
        delta = list(st.unpack_from("<" + "h" * channels, blk, off))
        off += 2 * channels
        s1 = list(st.unpack_from("<" + "h" * channels, blk, off))
        off += 2 * channels
        s2 = list(st.unpack_from("<" + "h" * channels, blk, off))
        off += 2 * channels
        chans = [[s2[c], s1[c]] for c in range(channels)]
        ci = 0
        for byte in blk[off:]:
            for nib in (byte >> 4, byte & 0xF):
                c = ci % channels
                ci += 1
                c1, c2 = _MS_COEFS[pred[c]]
                p = _tdiv(chans[c][-1] * c1 + chans[c][-2] * c2, 256)
                signed = nib - 16 if nib >= 8 else nib
                s = max(-32768, min(32767, p + signed * delta[c]))
                chans[c].append(s)
                delta[c] = max(16, _tdiv(_MS_ADAPT[nib] * delta[c], 256))
        n = min(len(ch) for ch in chans)
        arr = np.array([ch[:n] for ch in chans], dtype=np.float64)
        out.append(arr.mean(axis=0) / 32768.0)
    if not out:
        return None
    return np.concatenate(out)


def _ima_adpcm_decode(data: bytes, block_align: int, channels: int = 1):
    """IMA ADPCM (WAV fmt 0x11) decode — a pure table codec, no library
    needed: per block, a 4-byte header PER CHANNEL (16-bit predictor
    seed + step index), then the channels' nibble streams interleaved
    in 4-byte words (8 samples of channel 0, 8 of channel 1, ...), low
    nibble first within each byte. Returns channel-mixed float64
    samples in [-1, 1] or None for malformed blocks."""
    if channels < 1 or block_align < 4 * channels + 1:
        return None
    import numpy as np

    def run(nibbles, pred, idx, out):
        for nib in nibbles:
            step = _IMA_STEPS[idx]
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
            out.append(pred)
        return pred, idx

    chans = [[] for _ in range(channels)]
    for b0 in range(0, len(data) - block_align + 1, block_align):
        block = data[b0 : b0 + block_align]
        preds, idxs = [], []
        for c in range(channels):
            preds.append(
                int.from_bytes(block[4 * c : 4 * c + 2], "little", signed=True)
            )
            idx = block[4 * c + 2]
            if idx > 88:
                return None
            idxs.append(idx)
            chans[c].append(preds[c])
        body = block[4 * channels :]
        # 4-byte word groups round-robin across channels
        for w0 in range(0, len(body) - 3, 4 * channels):
            for c in range(channels):
                word = body[w0 + 4 * c : w0 + 4 * c + 4]
                if len(word) < 4:
                    break
                nibs = []
                for byte in word:
                    nibs.append(byte & 0x0F)
                    nibs.append(byte >> 4)
                preds[c], idxs[c] = run(nibs, preds[c], idxs[c], chans[c])
    if not chans[0]:
        return None
    n = min(len(c) for c in chans)
    mix = np.mean(
        np.stack([np.asarray(c[:n], dtype=np.float64) for c in chans]), axis=0
    )
    return mix / 32768.0


def wav_decode_array(blob: bytes):
    """Pure-stdlib WAV decode returning the SAMPLES: walks the RIFF
    chunk list, reads the fmt descriptor, and decodes integer PCM
    (8/16/24/32-bit), IEEE float PCM (fmt 3), plus the G.711 telephony
    codecs (A-law fmt 6, mu-law fmt 7 — pure companding formulas),
    MS ADPCM (fmt 2) and IMA ADPCM (fmt 0x11, a
    pure table codec, mono/stereo) — no codec library anywhere — with numpy.
    Returns ``(sample_rate, mono)`` with mono
    a float64 array in [-1, 1] (channel-mixed), or ``None`` for
    non-WAV / compressed (mp3/ADPCM/...) / malformed input.
    ``wav_decode_samples`` wraps this for the RMS envelope;
    ``audio_dhash`` consumes the array."""
    import struct

    import numpy as np

    if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, ln = blob[pos : pos + 4], struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        body = blob[pos + 8 : pos + 8 + ln]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_fmt, channels, rate, _brate, _balign, bits = fmt
    if channels == 0 or rate == 0:
        return None
    if audio_fmt in (6, 7):  # G.711 A-law / mu-law: formula codecs
        usable = len(data) - (len(data) % channels)
        if usable <= 0 or bits != 8:
            return None
        enc = np.frombuffer(data[:usable], dtype=np.uint8).astype(np.int64)
        if audio_fmt == 7:  # mu-law (ITU-T G.711): invert the companding
            u = ~enc & 0xFF
            sign = np.where(u & 0x80, -1.0, 1.0)
            exp = (u >> 4) & 7
            man = u & 0x0F
            mag = ((man.astype(np.float64) * 2 + 33) * (2.0 ** exp)) - 33
            x = sign * mag / 8031.0
        else:  # A-law (sign bit 1 = POSITIVE — opposite of mu-law)
            a = enc ^ 0x55
            sign = np.where(a & 0x80, 1.0, -1.0)
            exp = (a >> 4) & 7
            man = (a & 0x0F).astype(np.float64)
            mag = np.where(
                exp == 0, man * 2 + 1, (man * 2 + 33) * (2.0 ** (exp - 1))
            )
            x = sign * mag / 4096.0
        mono = x.reshape(-1, channels).mean(axis=1)
        return (int(rate), mono)
    if audio_fmt == 17:  # IMA ADPCM (table codec), mono or stereo
        mono = _ima_adpcm_decode(data, _balign, channels)
        if mono is None:
            return None
        return (int(rate), mono)
    if audio_fmt == 2:  # MS ADPCM (r7: predictor-coefficient codec)
        mono = _ms_adpcm_decode(data, _balign, channels)
        if mono is None:
            return None
        return (int(rate), mono)
    if audio_fmt == 3:  # IEEE float PCM (r7)
        dt = {32: np.float32, 64: np.float64}.get(bits)
        if dt is None:
            return None
        width = bits // 8
        usable = len(data) - (len(data) % (width * channels))
        if usable <= 0:
            return None
        x = np.frombuffer(data[:usable], dtype=dt).astype(np.float64)
        mono = x.reshape(-1, channels).mean(axis=1)
        return (int(rate), np.clip(mono, -1.0, 1.0))
    if audio_fmt != 1:  # perceptual codecs (mp3 etc.) need a codec lib
        return None
    if bits == 24:  # 3-byte little-endian signed samples (r7)
        usable = len(data) - (len(data) % (3 * channels))
        if usable <= 0:
            return None
        raw = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, 3)
        v = (
            raw[:, 0].astype(np.int64)
            | (raw[:, 1].astype(np.int64) << 8)
            | (raw[:, 2].astype(np.int64) << 16)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
        mono = x.reshape(-1, channels).mean(axis=1)
        return (int(rate), mono)
    dt = {8: np.uint8, 16: np.int16, 32: np.int32}.get(bits)
    if dt is None:
        return None
    width = bits // 8
    usable = len(data) - (len(data) % (width * channels))
    if usable <= 0:
        return None
    x = np.frombuffer(data[:usable], dtype=dt).astype(np.float64)
    if bits == 8:  # 8-bit WAV is unsigned, centered at 128
        x = x - 128.0
    x /= float(2 ** (bits - 1) if bits > 8 else 128)
    mono = x.reshape(-1, channels).mean(axis=1)
    return (int(rate), mono)


def _aifc_ima4_decode(data: bytes, channels: int):
    """Apple IMA4 (AIFC 'ima4', r7): 34-byte packets, channel-
    interleaved — 2-byte big-endian preamble (top 9 bits the int16
    predictor seed, low 7 the step index) + 32 nibble bytes (low
    nibble first), 64 samples per packet. Same step/index tables as
    WAV IMA ADPCM. Returns mono-mixed float64 in [-1, 1] or None."""
    import numpy as np

    if channels < 1 or len(data) < 34 * channels:
        return None
    chans = [[] for _ in range(channels)]
    pos = 0
    while pos + 34 * channels <= len(data):
        for c in range(channels):
            pkt = data[pos + 34 * c : pos + 34 * (c + 1)]
            pre = int.from_bytes(pkt[:2], "big")
            pred = pre & 0xFF80
            if pred >= 0x8000:
                pred -= 0x10000
            idx = pre & 0x7F
            if idx > 88:
                return None
            out = chans[c]
            for byte in pkt[2:]:
                for nib in (byte & 0xF, byte >> 4):  # low nibble first
                    step = _IMA_STEPS[idx]
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    pred = pred - diff if nib & 8 else pred + diff
                    pred = max(-32768, min(32767, pred))
                    idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
                    out.append(pred)
        pos += 34 * channels
    if not chans[0]:
        return None
    arr = np.array(chans, dtype=np.float64) / 32768.0
    return arr.mean(axis=0)


def _read_extended80(b: bytes) -> float:
    """IEEE 754 80-bit extended float (big-endian) — AIFF's sample-rate
    encoding: 1 sign + 15 exponent bits, then a 64-bit mantissa with an
    EXPLICIT integer bit. Corrupt exponents must yield 0.0, never an
    exception: this runs inside mapInPandas kernels where one bad blob
    must not kill the task (a large exponent field would otherwise
    raise OverflowError in 2.0**exp)."""
    import struct

    if len(b) < 10:
        return 0.0
    se = struct.unpack(">H", b[:2])[0]
    mant = struct.unpack(">Q", b[2:10])[0]
    if se & 0x7FFF == 0 and mant == 0:
        return 0.0
    exp = (se & 0x7FFF) - 16383
    if se & 0x8000 or exp < -63 or exp > 63:
        # negative, denormal-tiny, infinity/NaN (0x7FFF), or absurdly
        # large: no legal audio rate lives here
        return 0.0
    return mant * 2.0 ** (exp - 63)


# AIFC compression fourccs aiff_decode_array turns into samples; the
# single authority the coverage/metadata tiers share
_AIFC_DECODABLE = frozenset(
    [b"none", b"\x00\x00\x00\x00", b"sowt", b"fl32", b"alaw", b"ulaw",
     b"ima4"]
)


def _aiff_comm(blob: bytes):
    """The COMM facts every AIFF consumer needs — one chunk walk shared
    by ``aiff_decode_array``, ``audio_container_metadata`` and
    ``_classify_decode_tier`` (previously triplicated, a drift hazard):
    ``(channels, frames, bits, rate, comp)`` with rate validated to a
    plausible audio range (0 excluded), or ``None``."""
    import struct

    if len(blob) < 12 or blob[:4] != b"FORM" or blob[8:12] not in (
        b"AIFF", b"AIFC"
    ):
        return None
    pos = 12
    while pos + 8 <= len(blob):
        ln = struct.unpack(">I", blob[pos + 4 : pos + 8])[0]
        if blob[pos : pos + 4] == b"COMM":
            body = blob[pos + 8 : pos + 8 + ln]
            if len(body) < 18:
                return None
            ch, frames, bits = struct.unpack(">HIH", body[:8])
            rate = _read_extended80(body[8:18])
            comp = body[18:22] if len(body) >= 22 else b"NONE"
            if not (0 < rate <= 10_000_000):
                return None  # corrupt/absurd rate: unusable metadata
            return (ch, frames, bits, int(round(rate)), comp)
        pos += 8 + ln + (ln & 1)
    return None


def aiff_decode_array(blob: bytes):
    """AIFF / AIFC sample decode — pure stdlib+numpy like the WAV path:
    FORM chunk walk, COMM (channels, frames, bits, 80-bit extended
    sample rate, AIFC compression fourcc), SSND PCM. Covers big-endian
    integer PCM 8/16/24/32 ('NONE'), little-endian 16-bit ('sowt'),
    32-bit float ('fl32'), and G.711 ('alaw'/'ulaw' via the WAV-path
    companding formulas). Returns ``(sample_rate, mono float64)`` or
    ``None``."""
    import struct

    import numpy as np

    comm = _aiff_comm(blob)
    if comm is None:
        return None
    ch, _frames, bits, rate, comp = comm
    if ch == 0:
        return None
    data = None
    pos = 12
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        ln = struct.unpack(">I", blob[pos + 4 : pos + 8])[0]
        body = blob[pos + 8 : pos + 8 + ln]
        if cid == b"SSND" and len(body) >= 8:
            off = struct.unpack(">I", body[:4])[0]
            data = body[8 + off :]
            break
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if data is None:
        return None
    if comp in (b"alaw", b"ALAW", b"ulaw", b"ULAW"):
        # reuse the WAV G.711 path by wrapping as fmt 6/7
        fmt = 6 if comp.lower() == b"alaw" else 7
        wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, fmt, ch, rate,
                                       rate * ch, ch, 8)
               + b"data" + struct.pack("<I", len(data)) + data)
        return wav_decode_array(wav)
    if comp == b"fl32" or comp == b"FL32":
        usable = len(data) - (len(data) % (4 * ch))
        if usable <= 0:
            return None
        x = np.frombuffer(data[:usable], dtype=">f4").astype(np.float64)
        return (rate, np.clip(x.reshape(-1, ch).mean(axis=1), -1.0, 1.0))
    if comp == b"sowt":  # little-endian 16-bit PCM (Mac convention)
        dt = "<i2"
        width = 2
        denom = float(1 << 15)
    elif comp in (b"NONE", b"\x00\x00\x00\x00"):
        if bits == 24:
            usable = len(data) - (len(data) % (3 * ch))
            if usable <= 0:
                return None
            raw = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, 3)
            v = (
                (raw[:, 0].astype(np.int64) << 16)
                | (raw[:, 1].astype(np.int64) << 8)
                | raw[:, 2].astype(np.int64)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
            return (rate, x.reshape(-1, ch).mean(axis=1))
        dt = {8: ">i1", 16: ">i2", 32: ">i4"}.get(bits)
        if dt is None:
            return None
        width = bits // 8
        denom = float(1 << (bits - 1))
    elif comp == b"ima4":
        mono = _aifc_ima4_decode(data, ch)
        if mono is None:
            return None
        return (rate, mono)
    else:
        return None  # other compressed AIFC codecs
    usable = len(data) - (len(data) % (width * ch))
    if usable <= 0:
        return None
    x = np.frombuffer(data[:usable], dtype=dt).astype(np.float64) / denom
    return (rate, x.reshape(-1, ch).mean(axis=1))


def audio_decode_array(blob: bytes):
    """Samples from ANY container this engine decodes: WAV
    (integer PCM / G.711 A-law+mu-law / MS+IMA ADPCM) via
    ``wav_decode_array``, AIFF/AIFC via ``aiff_decode_array`` (r7),
    FLAC via the pure-stdlib ``flaccodec.flac_decode_array`` (r7),
    MPEG-1 audio Layers I/III — real MP3 sample decode — via
    ``mpegaudio.mpeg_audio_decode_array`` (late r7; see that module's
    docstring for the exact refusal set: Layer II, LSF,
    and frames selecting unshipped Huffman tables — intensity stereo
    decodes exactly under the mono contract since r9), and Ogg
    Vorbis via ``vorbiscodec.vorbis_decode_array`` (r9: floor 1 +
    residues 0/1/2 + mapping 0 — the feature set real encoders emit;
    Opus and exotic setups refuse). Returns ``(sample_rate, mono
    float64 in [-1, 1])`` or ``None`` for undecodable input."""
    got = wav_decode_array(blob)
    if got is not None:
        return got
    if blob[:4] == b"FORM":
        return aiff_decode_array(blob)
    if blob[:4] == b"fLaC":
        from .flaccodec import flac_decode_array

        return flac_decode_array(blob)
    if blob[:4] == b"OggS":
        from .vorbiscodec import vorbis_decode_array

        return vorbis_decode_array(blob)
    if blob[:4] == b"RIFF":
        return None  # non-WAVE RIFF is video
    if blob[:3] == b"ID3" or (
        len(blob) > 1 and blob[0] == 0xFF and (blob[1] & 0xE0) == 0xE0
    ):
        # same mp3 gate as _classify_decode_tier; the decoder itself
        # re-validates (two consecutive frames) before trusting a sync
        from .mpegaudio import mpeg_audio_decode_array

        return mpeg_audio_decode_array(blob)
    return None


def wav_decode_samples(blob: bytes, envelope_bins: int = 8):
    """RMS-envelope wrapper over ``audio_decode_array`` (WAV family +
    FLAC): returns ``(duration_s, sample_rate, loudness)`` where
    loudness is an ``envelope_bins``-segment RMS envelope normalized to
    [0, 1] (mono-mixed), or ``None`` for undecodable input — callers
    treat that as undecodable, never as an error."""
    import numpy as np

    decoded = audio_decode_array(blob)
    if decoded is None:
        return None
    rate, mono = decoded
    n = len(mono)
    duration = n / rate
    edges = np.linspace(0, n, envelope_bins + 1, dtype=np.int64)
    env = [
        round(float(np.sqrt(np.mean(mono[a:b] ** 2))), 6) if b > a else 0.0
        for a, b in zip(edges[:-1], edges[1:])
    ]
    return (round(duration, 6), int(rate), env)


def audio_features(
    df: DataFrame,
    bin_col: str = "content",
    allow_fake: bool = False,
    envelope_bins: int = 8,
    backend=None,
) -> DataFrame:
    """Per-clip audio features (duration, sample rate, RMS loudness
    envelope). The WAV family (integer PCM, G.711, IMA ADPCM), FLAC,
    AIFF/AIFC, MPEG-1 Layer I/III (real MP3, late r7) and Ogg Vorbis
    (r9) decode FOR REAL with stdlib + numpy through the pluggable
    batch backend interface (``operators/codecbackend.py``; ``backend``
    = instance, registered name, or the ``DATAMANCER_AUDIO_BACKEND``
    env var — default pure-Python reference). Ogg Opus and the
    documented MPEG refusal set come back NULL, or md5-derived fakes
    under ``allow_fake=True``. Arrow-batched mapInPandas; the UDF
    boundary is per-batch, so an accelerated backend slots in without
    touching plan shape."""
    import numpy as np

    from .codecbackend import resolve_audio_backend

    backend = resolve_audio_backend(backend)

    def _envelope(rate, mono):
        n = len(mono)
        edges = np.linspace(0, n, envelope_bins + 1, dtype=np.int64)
        env = [
            round(float(np.sqrt(np.mean(mono[a:b] ** 2))), 6)
            if b > a
            else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
        return (round(n / rate, 6), int(rate), env)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"path": [], "duration_s": [], "sample_rate": [], "loudness": []}
            blobs = [bytes(b) for b in pdf[bin_col]]
            results = backend.decode_batch(blobs)
            for path, blob, res in zip(pdf["path"], blobs, results):
                if res is not None:
                    dur, rate, env = _envelope(res[0], res[1])
                elif allow_fake:
                    d = hashlib.md5(blob).digest()
                    dur = round(1 + d[0] / 8.0, 3)
                    rate = 16000
                    env = [round(b / 255.0, 4) for b in d[:envelope_bins]]
                else:
                    dur = rate = env = None
                rows["path"].append(path)
                rows["duration_s"].append(dur)
                rows["sample_rate"].append(rate)
                rows["loudness"].append(env)
            yield pd.DataFrame(rows)

    return df.select("path", bin_col).mapInPandas(batches, AUDIO_SCHEMA)


# -- REAL header metadata (no codec libraries needed) ------------------------
#
# Pixel/sample DECODE needs PIL/ffmpeg (absent here, stubbed above) — but
# container HEADERS are plain bytes. These parsers are real, not stubs:
# PNG/GIF/BMP dimensions and canonical WAV metadata are pure Catalyst
# expressions (substring on binary + hex + conv, evaluated JVM-side next
# to the scan); JPEG needs a marker walk (variable-length segments), done
# with the stdlib only in an Arrow-batched mapInPandas.


def _be_u32(b: F.Column, pos: int) -> F.Column:
    """Big-endian uint32 at 1-based byte offset ``pos`` of a binary col."""
    return F.conv(F.hex(F.substring(b, pos, 4)), 16, 10).cast("long")


def _le_u32(b: F.Column, pos: int) -> F.Column:
    """Little-endian uint32: byte-swap via per-byte hex concat."""
    return F.conv(
        F.concat(*[F.hex(F.substring(b, pos + i, 1)) for i in (3, 2, 1, 0)]),
        16,
        10,
    ).cast("long")


def _le_u16(b: F.Column, pos: int) -> F.Column:
    return F.conv(
        F.concat(F.hex(F.substring(b, pos + 1, 1)), F.hex(F.substring(b, pos, 1))),
        16,
        10,
    ).cast("long")


def png_dimensions(b: F.Column) -> F.Column:
    """(width, height) struct from a PNG's IHDR chunk — the IHDR data
    always starts at byte 17 (8 sig + 4 len + 4 type). NULL if not PNG."""
    return F.when(
        F.hex(F.substring(b, 1, 4)) == F.lit(b"\x89PNG".hex().upper()),
        F.struct(
            _be_u32(b, 17).alias("width"), _be_u32(b, 21).alias("height")
        ),
    )


def gif_dimensions(b: F.Column) -> F.Column:
    """(width, height) from a GIF logical screen descriptor (LE u16 at
    bytes 7-10). NULL if not GIF."""
    return F.when(
        F.substring(b, 1, 4).cast("string") == "GIF8",
        F.struct(
            _le_u16(b, 7).alias("width"), _le_u16(b, 9).alias("height")
        ),
    )


def bmp_dimensions(b: F.Column) -> F.Column:
    """(width, height) from a BITMAPINFOHEADER (LE i32 at bytes 19-26).
    NULL if not BMP. biHeight is SIGNED — top-down BMPs store a negative
    height, so sign-extend the 32-bit value and report its magnitude
    (a raw unsigned read would claim heights near 4.29e9)."""
    raw_h = _le_u32(b, 23)
    signed_h = F.when(
        raw_h > F.lit((1 << 31) - 1), raw_h - F.lit(1 << 32)
    ).otherwise(raw_h)
    return F.when(
        F.substring(b, 1, 2).cast("string") == "BM",
        F.struct(
            _le_u32(b, 19).alias("width"), F.abs(signed_h).alias("height")
        ),
    )


def bmp_decode_array(blob: bytes):
    """REAL BMP pixel decode (r9) — uncompressed BI_RGB (and the
    equivalent default-mask BITFIELDS) at 1/4/8-bit palette or
    24/32-bit BGR(x) depths, bottom-up or top-down rows, 4-byte row
    padding. RLE4/RLE8 and exotic masks refuse (``None``) — same loud
    posture as every decoder here. Returns ``(w, h, 3, px uint8
    (h, w, 3))`` or ``None``."""
    import struct as _struct

    import numpy as np

    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    try:
        data_off = _struct.unpack("<I", blob[10:14])[0]
        hdr_size = _struct.unpack("<I", blob[14:18])[0]
        if hdr_size not in (40, 52, 56, 108, 124):
            return None  # BITMAPCOREHEADER and friends: refuse
        w, h = _struct.unpack("<ii", blob[18:26])
        bpp = _struct.unpack("<H", blob[28:30])[0]
        comp = _struct.unpack("<I", blob[30:34])[0]
        top_down = h < 0
        h = abs(h)
        if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
            return None
        if comp == 3 and bpp == 32 and hdr_size >= 52:
            masks = _struct.unpack("<III", blob[54:66])
            if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
                return None
        elif comp != 0:
            return None  # RLE / exotic bitfields: refuse
        if bpp not in (1, 4, 8, 24, 32):
            return None
        stride = ((w * bpp + 31) // 32) * 4
        need = data_off + stride * h
        if need > len(blob):
            return None
        if bpp <= 8:
            n_pal = _struct.unpack("<I", blob[46:50])[0] or (1 << bpp)
            pal_off = 14 + hdr_size
            pal = np.frombuffer(
                blob[pal_off : pal_off + 4 * n_pal], dtype=np.uint8
            ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRA quads -> RGB
            if len(pal) < n_pal:
                return None
        rows = np.frombuffer(
            blob[data_off : data_off + stride * h], dtype=np.uint8
        ).reshape(h, stride)
        if not top_down:
            rows = rows[::-1]
        if bpp == 24:
            px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()
        elif bpp == 32:
            px = (
                rows[:, : w * 4].reshape(h, w, 4)[:, :, :3][:, :, ::-1]
            ).copy()
        else:
            if bpp == 8:
                idx = rows[:, :w]
            elif bpp == 4:
                nib = np.repeat(rows, 2, axis=1)
                nib[:, 0::2] >>= 4
                nib[:, 1::2] &= 0x0F
                idx = nib[:, :w]
            else:  # 1-bit
                bits = np.unpackbits(rows, axis=1)
                idx = bits[:, :w]
            if int(idx.max()) >= n_pal:
                return None
            px = pal[idx]
        return (w, h, 3, px)
    except (ValueError, _struct.error):
        return None


def _u8(b: F.Column, pos: int) -> F.Column:
    return F.conv(F.hex(F.substring(b, pos, 1)), 16, 10).cast("long")


def webp_dimensions(b: F.Column) -> F.Column:
    """(width, height) from a WebP container — all three variants, pure
    Catalyst (fixed offsets): lossy VP8 (14-bit LE dims after the
    9D 01 2A start code), lossless VP8L (14-bit packed fields of the
    LE u32 after the 0x2F signature), extended VP8X (24-bit LE
    canvas-minus-one). NULL if not WebP / unrecognized variant."""
    is_webp = (F.substring(b, 1, 4).cast("string") == "RIFF") & (
        F.substring(b, 9, 4).cast("string") == "WEBP"
    )
    four = F.substring(b, 13, 4).cast("string")
    vp8_ok = F.hex(F.substring(b, 24, 3)) == "9D012A"
    vp8 = F.struct(
        (_le_u16(b, 27) % 16384).alias("width"),
        (_le_u16(b, 29) % 16384).alias("height"),
    )
    u = _le_u32(b, 22)
    vp8l_ok = _u8(b, 21) == 0x2F
    vp8l = F.struct(
        ((u % 16384) + 1).alias("width"),
        ((F.floor(u / 16384).cast("long") % 16384) + 1).alias("height"),
    )
    w24 = _le_u16(b, 25) + _u8(b, 27) * 65536
    h24 = _le_u16(b, 28) + _u8(b, 30) * 65536
    vp8x = F.struct((w24 + 1).alias("width"), (h24 + 1).alias("height"))
    return F.when(
        is_webp,
        F.when((four == "VP8 ") & vp8_ok, vp8)
        .when((four == "VP8L") & vp8l_ok, vp8l)
        .when(four == "VP8X", vp8x),
    )


JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xCF + 1)
) - {0xC4, 0xC8, 0xCC}  # SOFn, excluding DHT/JPG/DAC


def _jpeg_dims(blob: bytes) -> tuple[int, int] | None:
    """Walk JPEG segments to the first SOFn frame header (stdlib only).
    Height/width are big-endian u16 at offsets 3/5 of the SOF payload."""
    if len(blob) < 4 or blob[0] != 0xFF or blob[1] != 0xD8:
        return None
    i = 2
    n = len(blob)
    while i + 4 <= n:
        if blob[i] != 0xFF:
            i += 1  # padding/garbage: resync
            continue
        marker = blob[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers have no length field
            continue
        if i + 4 > n:
            return None
        seg_len = (blob[i + 2] << 8) | blob[i + 3]
        if marker in JPEG_SOF_MARKERS:
            if i + 9 > n:
                return None
            h = (blob[i + 5] << 8) | blob[i + 6]
            w = (blob[i + 7] << 8) | blob[i + 8]
            return (w, h)
        i += 2 + seg_len
    return None


IMAGE_DIMS_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def image_dimensions(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """REAL image dimensions from container headers — no codec library.

    PNG/GIF/BMP/WebP (all three WebP variants) parse as pure Catalyst
    expressions (JVM-side, next to
    the scan, zero Python); JPEG (variable-length marker walk) and
    TIFF (variable-offset IFD walk, r9) route through an Arrow-batched
    stdlib parser — and only those rows. Output: (path, kind, width,
    height); width/height NULL when the container is unrecognized or
    truncated.

    Scale shape: the Catalyst branch is a narrow projection; the
    walked branch is mapInPandas over a filtered scan — payload bytes
    never shuffle, and the union is of two narrow legs."""
    b = F.col(bin_col)
    kind = sniff_kind(b)
    base = df.select("path", b.alias("_b"), kind.alias("kind"))
    catalyst = (
        base.filter(~F.col("kind").isin("image/jpeg", "image/tiff"))
        .select(
            "path",
            "kind",
            F.coalesce(
                png_dimensions(F.col("_b")),
                gif_dimensions(F.col("_b")),
                bmp_dimensions(F.col("_b")),
                webp_dimensions(F.col("_b")),
            ).alias("_d"),
        )
        .select(
            "path",
            "kind",
            F.col("_d.width").alias("width"),
            F.col("_d.height").alias("height"),
        )
    )

    def walked_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .tiffcodec import tiff_dims

        for pdf in it:
            rows = {"path": [], "kind": [], "width": [], "height": []}
            for path, kind, blob in zip(pdf["path"], pdf["kind"], pdf["_b"]):
                blob = bytes(blob)
                dims = (
                    _jpeg_dims(blob)
                    if kind == "image/jpeg"
                    else tiff_dims(blob)
                )
                rows["path"].append(path)
                rows["kind"].append(kind)
                rows["width"].append(dims[0] if dims else None)
                rows["height"].append(dims[1] if dims else None)
            yield pd.DataFrame(rows)

    walked = base.filter(
        F.col("kind").isin("image/jpeg", "image/tiff")
    ).mapInPandas(walked_batches, IMAGE_DIMS_SCHEMA)
    return catalyst.unionByName(walked)


def wav_metadata(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """REAL WAV (RIFF) metadata from the canonical header layout —
    pure Catalyst, no audio library: channels (LE u16 @ byte 23),
    sample_rate (LE u32 @ 25), bits_per_sample (LE u16 @ 35), and
    duration from the data-chunk size when the layout is canonical
    (fmt chunk of length 16 at byte 13, data chunk directly after —
    the layout every standard PCM writer emits). Non-canonical or
    non-WAV rows yield NULLs rather than wrong numbers: the 'WAVE'
    tag, fmt length, and 'data' tag are all checked."""
    b = F.col(bin_col)
    is_riff_wave = (
        (F.substring(b, 1, 4).cast("string") == "RIFF")
        & (F.substring(b, 9, 4).cast("string") == "WAVE")
        & (F.substring(b, 13, 4).cast("string") == "fmt ")
        & (_le_u32(b, 17) == 16)  # canonical PCM fmt chunk
        & (F.substring(b, 37, 4).cast("string") == "data")
    )
    channels = _le_u16(b, 23)
    rate = _le_u32(b, 25)
    bits = _le_u16(b, 35)
    data_size = _le_u32(b, 41)
    bytes_per_s = rate * channels * (bits / F.lit(8.0))
    return df.select(
        "path",
        F.when(is_riff_wave, channels).alias("channels"),
        F.when(is_riff_wave, rate).alias("sample_rate"),
        F.when(is_riff_wave, bits).alias("bits_per_sample"),
        F.when(
            is_riff_wave & (bytes_per_s > 0),
            F.round(data_size / bytes_per_s, 6),
        ).alias("duration_s"),
    )


def _gif_lzw_decode(min_code_size: int, data: bytes, expected: int):
    """GIF-variant LZW decode (little-endian bit packing, CLEAR/END
    codes, 12-bit max code width). Returns index bytes or None."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    table = list(base)
    prev = None
    out = bytearray()
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + width <= total_bits and len(out) < expected:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None  # corrupt stream
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out[:expected]) if len(out) >= expected else None


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode_frames(blob: bytes, max_frames: int = 64):
    """Pure-stdlib animated-GIF decode: walks the GIF87a/89a block
    stream, LZW-decodes each image descriptor, handles local/global
    color tables, interlacing, frame offsets, transparency, and
    disposal methods 2 (restore-to-background) and 3 (restore-previous)
    scoped to the frame's rect — GCE state resets to spec defaults after
    every image block — compositing every frame onto the logical
    canvas. Yields ``(frame_idx, width, height, rgb_bytes)`` with
    rgb_bytes the full RGB24 canvas after that frame. Returns
    immediately (no yield) for non-GIF/corrupt input."""
    import struct

    if len(blob) < 13 or blob[:4] != b"GIF8":
        return
    w, h = struct.unpack("<HH", blob[6:10])
    flags, bg_idx = blob[10], blob[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = blob[pos : pos + 3 * n]
        pos += 3 * n
    canvas = bytearray(
        (gct[3 * bg_idx : 3 * bg_idx + 3] if gct and 3 * bg_idx + 3 <= len(gct) else b"\x00\x00\x00")
        * (w * h)
    )
    transparent, disposal = None, 0
    frame_idx = 0
    try:
        while pos < len(blob) and frame_idx < max_frames:
            b0 = blob[pos]
            if b0 == 0x3B:  # trailer
                return
            if b0 == 0x21:  # extension
                label = blob[pos + 1]
                pos += 2
                if label == 0xF9 and blob[pos] >= 4:  # graphic control
                    packed = blob[pos + 1]
                    disposal = (packed >> 2) & 7
                    transparent = blob[pos + 4] if packed & 1 else None
                while blob[pos]:  # skip sub-blocks
                    pos += 1 + blob[pos]
                pos += 1
                continue
            if b0 != 0x2C:  # unknown block: bail rather than misparse
                return
            fx, fy, fw, fh = struct.unpack("<HHHH", blob[pos + 1 : pos + 9])
            fflags = blob[pos + 9]
            pos += 10
            table = gct
            if fflags & 0x80:
                n = 2 << (fflags & 7)
                table = blob[pos : pos + 3 * n]
                pos += 3 * n
            if table is None:
                return
            min_code = blob[pos]
            pos += 1
            data = bytearray()
            while blob[pos]:
                ln = blob[pos]
                data += blob[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idxs = _gif_lzw_decode(min_code, bytes(data), fw * fh)
            if idxs is None:
                return
            # disposal 3 (restore-previous): snapshot the canvas BEFORE
            # compositing so the frame's rect can be rolled back after
            prev_canvas = bytes(canvas) if disposal == 3 else None
            if fflags & 0x40:  # interlaced: reorder rows
                rows = [idxs[r * fw : (r + 1) * fw] for r in range(fh)]
                ordered: list[bytes | None] = [None] * fh
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for r in range(start, fh, step):
                        ordered[r] = rows[src]
                        src += 1
                idxs = b"".join(ordered)  # type: ignore[arg-type]
            for r in range(fh):
                cy = fy + r
                if cy >= h:
                    break
                for c in range(fw):
                    cx = fx + c
                    if cx >= w:
                        break
                    pi = idxs[r * fw + c]
                    if pi == transparent or 3 * pi + 3 > len(table):
                        continue
                    off = 3 * (cy * w + cx)
                    canvas[off : off + 3] = table[3 * pi : 3 * pi + 3]
            yield (frame_idx, w, h, bytes(canvas))
            frame_idx += 1
            # disposal applies to the FRAME RECT only (restoring the
            # whole canvas corrupted partial-frame animations — later
            # frames' pixels outside this rect must survive)
            if disposal == 2 and gct is not None:  # restore rect to bg
                bg = (
                    gct[3 * bg_idx : 3 * bg_idx + 3]
                    if 3 * bg_idx + 3 <= len(gct)
                    else b"\x00\x00\x00"
                )
                for r in range(fh):
                    cy = fy + r
                    if cy >= h:
                        break
                    row_w = min(fw, w - fx)
                    if row_w > 0:
                        off = 3 * (cy * w + fx)
                        canvas[off : off + 3 * row_w] = bg * row_w
            elif disposal == 3 and prev_canvas is not None:
                for r in range(fh):
                    cy = fy + r
                    if cy >= h:
                        break
                    row_w = min(fw, w - fx)
                    if row_w > 0:
                        off = 3 * (cy * w + fx)
                        canvas[off : off + 3 * row_w] = prev_canvas[
                            off : off + 3 * row_w
                        ]
            # a following image block with NO graphic-control extension
            # must see spec defaults, not this frame's settings
            transparent, disposal = None, 0
    except (IndexError, struct.error):
        return


FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("frame_idx", LongType()),
        StructField("mean_intensity", DoubleType()),
        StructField("motion", DoubleType()),
    ]
)


def frame_features(
    df: DataFrame,
    bin_col: str = "content",
    max_frames: int = 64,
) -> DataFrame:
    """Per-frame features over REAL decoded animation frames (GIF via
    the stdlib LZW decoder): mean RGB intensity in [0,1] and ``motion``
    — mean absolute per-pixel difference vs the previous frame (0 for
    the first frame; the standard cheap scene-change / static-clip
    signal used to pick representative frames before an expensive
    captioning or embedding stage). Non-GIF rows are skipped (no
    codec); Arrow-batched mapInPandas, one task per partition of
    blobs — features, not pixels, are what shuffles downstream."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"path": [], "frame_idx": [], "mean_intensity": [], "motion": []}
            for path, blob in zip(pdf["path"], pdf[bin_col]):
                prev = None
                for idx, w, h, rgb in gif_decode_frames(
                    bytes(blob), max_frames=max_frames
                ):
                    arr = np.frombuffer(rgb, dtype=np.uint8).astype(np.float64)
                    rows["path"].append(path)
                    rows["frame_idx"].append(idx)
                    rows["mean_intensity"].append(round(float(arr.mean()) / 255.0, 6))
                    rows["motion"].append(
                        0.0
                        if prev is None
                        else round(float(np.abs(arr - prev).mean()) / 255.0, 6)
                    )
                    prev = arr
            yield pd.DataFrame(rows)

    return df.select("path", bin_col).mapInPandas(batches, FRAME_FEATURES_SCHEMA)


# -- perceptual near-dup (dHash) ---------------------------------------------


DHASH_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("dhash", LongType()),
    ]
)


def _dhash_schema_for(df: DataFrame, id_col: str) -> StructType:
    """(id, dhash) output schema preserving the INPUT id type — a
    numeric doc_id must not be silently coerced to the string schema
    the path-keyed default assumes."""
    id_field = df.schema[id_col]
    return StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("dhash", LongType()),
        ]
    )


def jpeg_exif_orientation(blob: bytes):
    """EXIF orientation tag (1-8) from a JPEG's APP1 segment — marker
    walk + minimal TIFF IFD0 scan (both byte orders), tag 0x0112.
    Returns ``None`` when absent/malformed (callers treat as upright).
    Cameras and phones store rotated sensor data with this tag instead
    of rotating pixels, so a perceptual screen that ignores it sees the
    same photo ~32 bits apart from its upright re-encode."""
    import struct

    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            return None
        while blob[pos + 1] == 0xFF and pos + 4 <= len(blob):
            pos += 1
        marker = blob[pos + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EXIF must precede the scan
            return None
        ln = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        seg = blob[pos + 4 : pos + 2 + ln]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            t = seg[6:]
            if len(t) < 8:
                return None
            e = {b"II": "<", b"MM": ">"}.get(t[:2])
            if e is None or struct.unpack(e + "H", t[2:4])[0] != 42:
                return None
            off = struct.unpack(e + "I", t[4:8])[0]
            if off + 2 > len(t):
                return None
            n = struct.unpack(e + "H", t[off : off + 2])[0]
            for i in range(n):
                ep = off + 2 + 12 * i
                if ep + 12 > len(t):
                    return None
                tag, typ, cnt = struct.unpack(e + "HHI", t[ep : ep + 8])
                if tag == 0x0112 and typ == 3 and cnt == 1:
                    v = struct.unpack(e + "H", t[ep + 8 : ep + 10])[0]
                    return v if 1 <= v <= 8 else None
            return None
        pos += 2 + ln
    return None


def _apply_exif_orientation(gray, orient: int):
    """Upright a 2-D array per EXIF orientation 1-8 (the standard
    display transforms; numpy rot90 k=1 is counter-clockwise)."""
    import numpy as np

    if orient == 2:
        return gray[:, ::-1]
    if orient == 3:
        return gray[::-1, ::-1]
    if orient == 4:
        return gray[::-1, :]
    if orient == 5:
        return gray.T
    if orient == 6:
        return np.rot90(gray, k=-1)
    if orient == 7:
        return gray.T[::-1, ::-1]
    if orient == 8:
        return np.rot90(gray, k=1)
    return gray


def _decode_gray(blob: bytes):
    """Grayscale pixel array from any REAL decoder (the shared
    ``decode_image_blob`` chain via ``_decode_rgb``, EXIF-uprighted) —
    or None for formats still needing a codec library (video,
    compressed audio containers)."""
    px = _decode_rgb(blob)
    if px is None:
        return None
    return _gray_of(px)


def box_resample(arr, out_h: int, out_w: int):
    """Exact-area box resample of a (h, w) or (h, w, c) array to
    (out_h, out_w[, c]) — integer-floor cell grid, each output cell the
    mean of its source box (``np.add.reduceat`` twice); images smaller
    than the target up-map nearest-neighbor (reduceat needs h>=out_h).
    The generalized form of the dHash 8×9 grid; ``resize_images``
    thumbnails through it. Returns float64."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w, _c = a.shape
    if h >= out_h and w >= out_w:
        ri = (np.arange(out_h) * h) // out_h
        ci = (np.arange(out_w) * w) // out_w
        s = np.add.reduceat(np.add.reduceat(a, ri, axis=0), ci, axis=1)
        rh = np.diff(np.append(ri, h)).astype(np.float64)
        cw = np.diff(np.append(ci, w)).astype(np.float64)
        out = s / (rh[:, None, None] * cw[None, :, None])
    else:  # tiny image: nearest-neighbor up-map
        rmap = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
        cmap = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
        out = a[np.ix_(rmap, cmap)]
    return out[:, :, 0] if squeeze else out


def dhash64_gray(gray) -> int:
    """64-bit difference hash (dHash) of a grayscale image array: box-
    resample to an 8×9 grid, then bit (row, col) = 1 iff
    cell[row][col] > cell[row][col+1] — the classic perceptual
    fingerprint that survives re-encode, resize, and mild edits while
    unrelated images land ~32 bits apart. Pure numpy, deterministic;
    returns a SIGNED 64-bit int (Spark LongType two's-complement)."""
    cells = box_resample(gray, 8, 9)
    bits = cells[:, :-1] > cells[:, 1:]
    v = 0
    for i in range(8):
        for j in range(8):
            if bits[i, j]:
                v |= 1 << (i * 8 + j)
    return v - (1 << 64) if v >= (1 << 63) else v


def png_encode(px) -> bytes:
    """Minimal PNG writer — filter-0 scanlines + stdlib zlib — for
    uint8 (h, w) gray or (h, w, 3) RGB arrays. Powers the
    ``resize_images`` thumbnail sink. The DECODERS are never tested
    against this writer: decoder tests keep their independent
    test-side encoders."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(px, dtype=np.uint8)
    gray = a.ndim == 2 or a.shape[2] == 1
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    h, w = a.shape[:2]
    ctype = 0 if gray else 2
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _px_post(blob: bytes, px):
    """Shared post-decode steps, independent of which backend produced
    the pixels: channel-axis normalization and the JPEG-only EXIF
    upright (the orientation tag is a header read on the BLOB, so it
    composes with any decode backend)."""
    import numpy as np

    if px.ndim == 2:
        px = px[:, :, None]
    if blob[:2] == b"\xff\xd8":  # JPEG: hash camera photos upright
        orient = jpeg_exif_orientation(blob)
        if orient and orient != 1:
            px = np.stack(
                [_apply_exif_orientation(px[:, :, i], orient)
                 for i in range(px.shape[2])],
                axis=2,
            )
    return px


def _gray_of(px):
    return px.mean(axis=2) if px.shape[2] > 1 else px[:, :, 0]


def _decode_rgb(blob: bytes):
    """(h, w, c) uint8 from any REAL decoder (c = 1 or 3), with EXIF
    orientation uprighted for JPEGs; None when undecodable. r10: the
    format walk is the SHARED ``decode_image_blob`` chain (single
    source of truth — a format added there reaches the perceptual
    screens automatically) plus ``_px_post``."""
    decoded = decode_image_blob(blob)
    if decoded is None:
        return None
    return _px_post(blob, decoded[3])


RESIZE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "path",
    width: int = 64,
    height: int = 64,
) -> DataFrame:
    """Fixed-resolution thumbnails — the resize stage of a multimodal
    training pipeline: decode (PNG all profiles / JPEG baseline +
    progressive with EXIF uprighting / GIF first frame), exact-area
    ``box_resample`` to (height, width), re-encode as a filter-0 PNG.
    Arrow-batched mapInPandas; full-size pixels never leave the
    executor — only the bounded thumbnail (≤ h·w·3 bytes + zlib)
    shuffles. Undecodable blobs yield NULL thumbs, never errors.
    Output: (id, width, height, thumb: binary|NULL); width/height are
    the SOURCE dims (the thumb's are the arguments)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"path": [], "width": [], "height": [], "thumb": []}
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                px = _decode_rgb(bytes(blob))
                out["path"].append(rid)
                if px is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["thumb"].append(None)
                    continue
                small = np.clip(
                    np.round(box_resample(px, height, width)), 0, 255
                ).astype(np.uint8)
                out["width"].append(int(px.shape[1]))
                out["height"].append(int(px.shape[0]))
                out["thumb"].append(png_encode(small))
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).alias("path"), bin_col
    ).mapInPandas(batches, RESIZE_SCHEMA)


def image_dhash(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "path",
    backend=None,
) -> DataFrame:
    """Per-image 64-bit perceptual dHash over the REAL decoders (the
    shared ``decode_image_blob`` chain — PNG, baseline+progressive
    JPEG, GIF, BMP, TIFF, lossless WebP); other formats (video needs
    ffmpeg, absent here) yield NULL — one undecodable
    blob must never kill a 100 TB job. ``backend`` (r10): an
    ``ImageDecodeBackend`` instance/name routes pixel production
    through the pluggable batch interface — the dHash SCREENS are the
    decode-bound stage at crawl scale (SCALING.md), so this is where
    an accelerated backend pays; it must pass
    ``validate_image_backend`` first, and the EXIF upright + grayscale
    post-steps are backend-independent (header reads on the blob).
    Arrow-batched mapInPandas; only
    (id, 8-byte hash) rows ever shuffle downstream. Output
    (``id_col``, dhash: long|NULL). Pair with ``dhash_pairs`` for the
    bucketed near-dup join — the image analog of SimHash over text."""
    if backend is not None:
        from .codecbackend import resolve_image_backend

        backend = resolve_image_backend(backend)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {id_col: [], "dhash": []}
            blobs = [bytes(b) for b in pdf[bin_col]]
            if backend is not None:
                results = backend.decode_batch(blobs)
                grays = [
                    None if r is None else _gray_of(_px_post(b, r[3]))
                    for b, r in zip(blobs, results)
                ]
            else:
                grays = [_decode_gray(b) for b in blobs]
            for rid, gray in zip(pdf[id_col], grays):
                out[id_col].append(rid)
                out["dhash"].append(None if gray is None else dhash64_gray(gray))
            # dtype=object is load-bearing: one NULL (undecodable blob)
            # in a batch would otherwise coerce the column to float64,
            # silently mangling the low ~11 bits of EVERY hash > 2^53
            # in that batch — false hamming-0 merges (caught by the r9
            # curate_media_mix fixture; corrupt blobs are certain at
            # crawl scale, so mixed batches are the norm, not the edge)
            yield pd.DataFrame(
                {
                    id_col: out[id_col],
                    "dhash": pd.Series(out["dhash"], dtype="object"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        batches, _dhash_schema_for(df, id_col)
    )


def dhash_pairs(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "path",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Perceptual image near-dup pairs: dHash signatures + the SAME
    bit-block band LSH engine SimHash uses (``dedup.hamming_band_pairs``
    — distinct-signature banded self-join, pigeonhole-exact for
    ``max_hamming <= bands-1``, never all-pairs). Undecodable blobs
    (NULL dhash) are excluded rather than clustered together. Output
    (id_a < id_b, hamming)."""
    from ..session import materialize
    from .dedup import hamming_band_pairs

    sigs = materialize(
        image_dhash(df, bin_col, id_col).filter(F.col("dhash").isNotNull())
    )
    return hamming_band_pairs(
        sigs, "dhash", id_col, max_hamming=max_hamming, bands=bands
    )


def audio_dhash64(mono) -> int:
    """64-bit perceptual audio fingerprint: the dHash idea applied to
    the loudness envelope — 65 equal-length frames, per-frame RMS
    energy, bit i = 1 iff energy[i+1] > energy[i]. Volume-invariant by
    construction (a global gain scales every frame equally and cannot
    flip a comparison) and stable across bit depth / channel layout /
    moderate resampling; unrelated clips land ~32 bits apart. Pure
    numpy, deterministic; returns a SIGNED 64-bit int."""
    import numpy as np

    x = np.asarray(mono, dtype=np.float64)
    n = len(x)
    frames = 65
    edges = np.linspace(0, n, frames + 1, dtype=np.int64)
    e = np.array(
        [
            float(np.mean(x[a:b] ** 2)) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
    )
    v = 0
    for i in range(64):
        if e[i + 1] > e[i]:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_dhash(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "path",
    backend=None,
) -> DataFrame:
    """Per-clip 64-bit perceptual fingerprint over the REAL stdlib
    decoders (``audio_decode_array`` → ``audio_dhash64``): the WAV
    family, FLAC (r7), AIFF/AIFC, MPEG-1 Layer I/III — real MP3
    (late r7; WAV↔MP3 same-clip pairs fingerprint 0 bits apart in the
    cross-codec test) — and Ogg Vorbis (r9). Ogg Opus and the MPEG
    refusal set yield NULL.
    Arrow-batched mapInPandas; only
    (id, 8-byte hash) rows shuffle downstream. Pair with
    ``audio_dhash_pairs`` — the audio analog of ``image_dhash``/SimHash,
    sharing ``dedup.hamming_band_pairs``. ``backend`` (r10): an
    ``AudioDecodeBackend`` instance/name routes sample production
    through the pluggable batch interface (see ``image_dhash``)."""
    if backend is not None:
        from .codecbackend import resolve_audio_backend

        backend = resolve_audio_backend(backend)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {id_col: [], "dhash": []}
            blobs = [bytes(b) for b in pdf[bin_col]]
            if backend is not None:
                results = backend.decode_batch(blobs)
            else:
                results = [audio_decode_array(b) for b in blobs]
            for rid, decoded in zip(pdf[id_col], results):
                out[id_col].append(rid)
                out["dhash"].append(
                    None if decoded is None else audio_dhash64(decoded[1])
                )
            # dtype=object: see image_dhash — a mixed decodable/NULL
            # batch must not coerce int64 hashes through float64
            yield pd.DataFrame(
                {
                    id_col: out[id_col],
                    "dhash": pd.Series(out["dhash"], dtype="object"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        batches, _dhash_schema_for(df, id_col)
    )


def audio_dhash_pairs(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "path",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Perceptual audio near-dup pairs: ``audio_dhash`` signatures
    through the same banded Hamming-LSH engine as SimHash and image
    dHash (``dedup.hamming_band_pairs`` — distinct-signature band join,
    pigeonhole-exact for ``max_hamming <= bands-1``, never all-pairs).
    Undecodable clips (NULL fingerprint) are excluded. Output
    (id_a < id_b, hamming)."""
    from ..session import materialize
    from .dedup import hamming_band_pairs

    sigs = materialize(
        audio_dhash(df, bin_col, id_col).filter(F.col("dhash").isNotNull())
    )
    return hamming_band_pairs(
        sigs, "dhash", id_col, max_hamming=max_hamming, bands=bands
    )


def dhash_scalar_udf():
    """Arrow-batched SCALAR pandas UDF computing the 64-bit image dHash
    from a binary column (PNG/baseline-JPEG/GIF via the real stdlib
    decoders, NULL otherwise) — the column-preserving form of ``image_dhash`` for
    plans that must stay stateless projections (streaming screens):
    ``df.withColumn("dhash", dhash_scalar_udf()(F.col("content")))``."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def _dhash(blobs: pd.Series) -> pd.Series:
        out = []
        for blob in blobs:
            gray = None if blob is None else _decode_gray(bytes(blob))
            out.append(None if gray is None else dhash64_gray(gray))
        return pd.Series(out, dtype="object")

    return _dhash


def audio_dhash_scalar_udf():
    """Arrow-batched SCALAR pandas UDF computing the 64-bit audio
    envelope dHash from a binary column (WAV family / FLAC / AIFF /
    MP3 / Ogg Vorbis via the real decoders, NULL otherwise) — the
    column-preserving form of ``audio_dhash`` for stateless streaming
    screens, the audio twin of ``dhash_scalar_udf``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def _adhash(blobs: pd.Series) -> pd.Series:
        out = []
        for blob in blobs:
            dec = None if blob is None else audio_decode_array(bytes(blob))
            out.append(None if dec is None else audio_dhash64(dec[1]))
        return pd.Series(out, dtype="object")

    return _adhash


def dhash_band_index(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "path",
    bands: int = 4,
    kind: str = "image",
) -> DataFrame:
    """The PERSISTABLE side of streaming perceptual image dedup: one row
    per (band, val) 16-bit block bucket occupied by the corpus's dHash
    signatures, carrying the DISTINCT full 64-bit signatures in that
    bucket (``sigs``, sorted) — the media analog of
    ``minhash_band_index``. The full signatures are load-bearing, not an
    optimization: each band has only 65536 possible values, so bucket
    membership alone saturates as the corpus grows (at ~65k distinct
    signatures nearly every bucket is occupied and a membership-only
    screen would drop nearly all NOVEL media); carrying the bucket's
    signatures lets the probe verify true Hamming distance and stay
    exact at any corpus size. Write it as the media index;
    ``streaming.streaming_media_screen`` probes incoming blobs against
    it statelessly, and compaction refreshes it with ``image_dhash``
    over the accumulated corpus. Index size is bands x n_distinct_sigs
    entries total across the arrays — per-bucket arrays grow ~linearly
    past 65k distinct signatures; re-derive with wider bands (e.g.
    bands=2, 32-bit buckets) before buckets get hot.
    ``kind="audio"`` (r9) indexes the audio envelope dHash instead —
    same engine, cross-codec by construction (WAV/FLAC/MP3/Vorbis of
    the same clip land in the same buckets)."""
    if kind not in ("image", "audio"):
        raise ValueError(f"kind must be image|audio, got {kind!r}")
    width = 64 // bands
    hasher = image_dhash if kind == "image" else audio_dhash
    sigs = hasher(df, bin_col, id_col).filter(
        F.col("dhash").isNotNull()
    )
    banded = sigs.select(
        F.col("dhash").alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("dhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    )
    return (
        banded.select("bv.band", "bv.val", "sig")
        .distinct()
        .groupBy("band", "val")
        .agg(F.sort_array(F.collect_list("sig")).alias("sigs"))
    )


VIDEO_META_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("container", StringType()),
        StructField("duration_s", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("codec", StringType()),
    ]
)


def mp4_metadata_blob(blob: bytes):
    """REAL MP4/MOV metadata from the ISO-BMFF box structure — pure
    stdlib byte walk, no media library: major brand from ``ftyp``,
    duration from ``moov/mvhd`` (version 0 and 1 layouts), presentation
    dimensions from the first ``trak/tkhd`` with nonzero 16.16
    fixed-point width/height (the video track; audio tracks carry 0x0),
    codec from that track's ``stbl/stsd`` first sample-entry fourcc
    (avc1/hev1/vp09/av01/…; r7). Returns ``(brand, duration_s, width,
    height, codec)`` or ``None`` for non-MP4 input. Fields may be None
    individually when the corresponding box is absent/malformed — a
    curation filter should treat that as unknown, not zero."""
    import struct

    def boxes(data, pos, end):
        while pos + 8 <= end:
            size = struct.unpack(">I", data[pos : pos + 4])[0]
            typ = data[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    return
                size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                return
            yield typ, pos + hdr, pos + size
            pos += size

    if len(blob) < 12:
        return None
    brand = None
    duration = None
    width = height = codec = None
    try:
        for typ, body, bend in boxes(blob, 0, len(blob)):
            if typ == b"ftyp":
                brand = blob[body : body + 4].decode("ascii", "replace")
            elif typ == b"moov":
                for t2, b2, e2 in boxes(blob, body, bend):
                    if t2 == b"mvhd" and duration is None:
                        ver = blob[b2]
                        if ver == 1:
                            ts = struct.unpack(">I", blob[b2 + 20 : b2 + 24])[0]
                            dur = struct.unpack(">Q", blob[b2 + 24 : b2 + 32])[0]
                        else:
                            ts = struct.unpack(">I", blob[b2 + 12 : b2 + 16])[0]
                            dur = struct.unpack(">I", blob[b2 + 16 : b2 + 20])[0]
                        if ts:
                            duration = round(dur / ts, 6)
                    elif t2 == b"trak" and width is None:
                        tw = th = tcodec = None
                        for t3, b3, e3 in boxes(blob, b2, e2):
                            if t3 == b"tkhd":
                                ver = blob[b3]
                                off = b3 + (32 if ver == 0 else 44)
                                w16, h16 = struct.unpack(
                                    ">II", blob[e3 - 8 : e3]
                                )
                                _ = off  # layout documented; dims sit last
                                if w16 and h16:
                                    tw, th = w16 >> 16, h16 >> 16
                            elif t3 == b"mdia":
                                # mdia -> minf -> stbl -> stsd: first
                                # sample entry's format fourcc
                                for t4, b4, e4 in boxes(blob, b3, e3):
                                    if t4 != b"minf":
                                        continue
                                    for t5, b5, e5 in boxes(blob, b4, e4):
                                        if t5 != b"stbl":
                                            continue
                                        for t6, b6, e6 in boxes(
                                            blob, b5, e5
                                        ):
                                            if (
                                                t6 == b"stsd"
                                                and e6 - b6 >= 16
                                            ):
                                                tcodec = blob[
                                                    b6 + 12 : b6 + 16
                                                ].decode("ascii", "replace")
                        if tw and th:
                            width, height = tw, th
                            codec = tcodec
    except Exception:
        return None
    if brand is None:
        return None
    return (brand, duration, width, height, codec)


def _ebml_vint(data: bytes, pos: int, keep_marker: bool):
    """EBML variable-length integer at ``pos``: returns (value, n_bytes)
    or None. Element IDs keep the length-marker bit; sizes strip it."""
    if pos >= len(data):
        return None
    first = data[pos]
    if first == 0:
        return None
    n = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        n += 1
    if pos + n > len(data):
        return None
    v = first if keep_marker else (first & (mask - 1))
    for i in range(1, n):
        v = (v << 8) | data[pos + i]
    return (v, n)


def webm_metadata(blob: bytes):
    """WebM/Matroska metadata — pure stdlib EBML walk, no media
    library: duration from Segment→Info (Duration float ×
    TimecodeScale), video dimensions from Segment→Tracks→TrackEntry→
    Video (PixelWidth/PixelHeight). Returns
    ``(duration_s|None, width|None, height|None)`` or ``None`` for
    non-EBML input. Frame DECODE (VP8/VP9/AV1) genuinely needs a
    codec — this is the filter-before-decode metadata tier."""
    import struct

    if len(blob) < 8 or blob[:4] != b"\x1a\x45\xdf\xa3":
        return None

    def walk(pos, end, targets, depth=0):
        """Yield (element_id, body_start, body_end) for targets at this
        level; recurse into container ids listed in ``targets`` dicts."""
        while pos < end:
            eid = _ebml_vint(blob, pos, True)
            if eid is None:
                return
            esz = _ebml_vint(blob, pos + eid[1], False)
            if esz is None:
                return
            body = pos + eid[1] + esz[1]
            bend = min(body + esz[0], end)
            yield (eid[0], body, bend)
            pos = bend

    duration = width = height = codec = None
    tscale = 1_000_000  # Matroska default: ns per timecode unit
    try:
        # skip the EBML header element, find Segment (0x18538067)
        seg = None
        for eid, b, e in walk(0, len(blob), None):
            if eid == 0x18538067:
                seg = (b, e)
                break
        if seg is None:
            return None
        for eid, b, e in walk(seg[0], seg[1], None):
            if eid == 0x1549A966:  # Info
                raw_dur = None
                for eid2, b2, e2 in walk(b, e, None):
                    if eid2 == 0x2AD7B1:  # TimecodeScale (uint)
                        tscale = int.from_bytes(blob[b2:e2], "big") or tscale
                    elif eid2 == 0x4489:  # Duration (float 4/8 bytes)
                        if e2 - b2 == 4:
                            raw_dur = struct.unpack(">f", blob[b2:e2])[0]
                        elif e2 - b2 == 8:
                            raw_dur = struct.unpack(">d", blob[b2:e2])[0]
                if raw_dur is not None:
                    duration = round(raw_dur * tscale / 1e9, 6)
            elif eid == 0x1654AE6B and width is None:  # Tracks
                for eid2, b2, e2 in walk(b, e, None):
                    if eid2 != 0xAE:  # TrackEntry
                        continue
                    tcodec = None
                    has_video = False
                    for eid3, b3, e3 in walk(b2, e2, None):
                        if eid3 == 0x86:  # CodecID (ASCII)
                            tcodec = blob[b3:e3].decode("ascii", "replace")
                        elif eid3 == 0xE0:  # Video
                            has_video = True
                            for eid4, b4, e4 in walk(b3, e3, None):
                                if eid4 == 0xB0:
                                    width = int.from_bytes(blob[b4:e4], "big")
                                elif eid4 == 0xBA:
                                    height = int.from_bytes(blob[b4:e4], "big")
                    if has_video and codec is None:
                        codec = tcodec
    except Exception:
        return None
    return (duration, width, height, codec)


def avi_video_fourcc(blob: bytes):
    """The AVI video stream's codec fourcc from the real
    hdrl → strl → strh/strf walk: ``strf``'s BITMAPINFOHEADER
    ``biCompression`` when set (what players dispatch on), else
    ``strh.fccHandler``. Returns an upper-cased string or ``None``
    (no video stream / malformed). This is the honest screenability
    signal for ``media_decode_coverage`` — a substring sniff over the
    header bytes can both miss real MJPEG and false-positive on
    metadata text."""
    import struct

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None

    def chunks(pos, end):
        while pos + 8 <= end:
            cid = blob[pos : pos + 4]
            ln = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
            yield cid, pos + 8, min(pos + 8 + ln, end)
            pos += 8 + ln + (ln & 1)

    for cid, s, e in chunks(12, len(blob)):
        if cid != b"LIST" or blob[s : s + 4] != b"hdrl":
            continue
        for cid2, s2, e2 in chunks(s + 4, e):
            if cid2 != b"LIST" or blob[s2 : s2 + 4] != b"strl":
                continue
            is_vids = False
            handler = comp = None
            for cid3, s3, e3 in chunks(s2 + 4, e2):
                if cid3 == b"strh" and e3 - s3 >= 8:
                    is_vids = blob[s3 : s3 + 4] == b"vids"
                    handler = blob[s3 + 4 : s3 + 8]
                elif cid3 == b"strf" and e3 - s3 >= 20:
                    comp = blob[s3 + 16 : s3 + 20]
            if not is_vids:
                continue
            fourcc = (
                comp
                if comp and comp != b"\x00\x00\x00\x00"
                else handler
            )
            if not fourcc or fourcc == b"\x00\x00\x00\x00":
                return None
            try:
                return fourcc.decode("ascii").strip("\x00 ").upper() or None
            except UnicodeDecodeError:
                return None
    return None


def video_metadata(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Per-clip container metadata for video curation: MP4/MOV via the
    stdlib ISO-BMFF walk (``mp4_metadata_blob``), WebM/Matroska via the
    EBML walk (``webm_metadata``), AVI via its canonical
    RIFF header (frame count dims from ``avih``, codec fourcc from the
    r7 ``avi_video_fourcc`` stream walk; mp4 codec from stsd, webm
    codec from CodecID). Lets a 100 TB media pipeline filter by
    resolution/duration/codec next to the scan, BEFORE any decode
    attempt — metadata is a byte walk, decode is the expensive tier.
    Unknown containers yield NULL fields, never errors."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"path": [], "container": [], "duration_s": [],
                   "width": [], "height": [], "codec": []}
            for path, blob in zip(pdf["path"], pdf[bin_col]):
                blob = bytes(blob)
                container = dur = w = h = codec = None
                meta = mp4_metadata_blob(blob)
                wb = webm_metadata(blob) if meta is None else None
                if meta is not None:
                    brand, dur, w, h, codec = meta
                    container = f"mp4/{brand}"
                elif wb is not None:
                    dur, w, h, codec = wb
                    container = "webm"
                elif blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
                    container = "avi"
                    codec = avi_video_fourcc(blob)
                    # canonical avih: LIST hdrl at 12, avih body at 32
                    if blob[12:16] == b"LIST" and blob[20:24] == b"hdrl" \
                            and blob[24:28] == b"avih":
                        body = blob[32:88]
                        if len(body) >= 40:
                            us_pf, _, _, _, frames = struct.unpack(
                                "<5I", body[:20]
                            )
                            w, h = struct.unpack("<II", body[32:40])
                            if us_pf:
                                dur = round(frames * us_pf / 1e6, 6)
                out["path"].append(path)
                out["container"].append(container)
                out["duration_s"].append(dur)
                out["width"].append(w)
                out["height"].append(h)
                out["codec"].append(codec)
            yield pd.DataFrame(out)

    return df.select("path", bin_col).mapInPandas(batches, VIDEO_META_SCHEMA)


AUDIO_META_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("container", StringType()),
        StructField("duration_s", DoubleType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("decodable", BooleanType()),
    ]
)

# WAV fmt codes wav_decode_array turns into samples, per bit depth:
# integer PCM (fmt 1: 8/16/24/32-bit), MS ADPCM (2), IEEE float (3:
# 32/64-bit), G.711 A-law/mu-law (6/7: 8-bit), IMA ADPCM (0x11).
# Everything else is metadata-only.
def _wav_fmt_decodable(audio_fmt, bits) -> bool:
    if audio_fmt == 1:
        return bits in (8, 16, 24, 32)
    if audio_fmt == 3:
        return bits in (32, 64)
    if audio_fmt in (6, 7):
        return bits == 8
    return audio_fmt in (2, 0x11)


def flac_streaminfo(blob: bytes):
    """REAL FLAC metadata from the mandatory STREAMINFO block — pure
    stdlib bit unpacking, no audio library (FLAC is how the large
    public speech corpora ship): after the 'fLaC' marker the first
    metadata block must be STREAMINFO (type 0, 34 bytes); bytes 10-17
    of its body pack sample_rate (20 bits), channels-1 (3),
    bits_per_sample-1 (5), total_samples (36). Returns
    ``(sample_rate, channels, bits_per_sample, duration_s|None)`` or
    ``None`` for non-FLAC input."""
    if len(blob) < 42 or blob[:4] != b"fLaC":
        return None
    btype = blob[4] & 0x7F
    blen = int.from_bytes(blob[5:8], "big")
    if btype != 0 or blen < 34:
        return None
    body = blob[8 : 8 + 34]
    packed = int.from_bytes(body[10:18], "big")  # 64 bits
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        return None
    dur = round(total / rate, 6) if total else None
    return (rate, channels, bits, dur)


_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                      224, 256, 320, 0]  # kbit/s, MPEG-1 Layer III
_MP3_RATES_V1 = [44100, 48000, 32000, 0]


def mp3_header_info(blob: bytes):
    """MP3 metadata from the first MPEG-1 Layer III frame header (after
    an optional ID3v2 tag): (sample_rate, channels, bitrate_kbps,
    est_duration_s). Duration comes from the Xing/Info VBR header's
    frame count when present (exact for the dominant VBR encodes, r7);
    otherwise the CBR estimate audio_bytes*8/bitrate, with an ID3v1
    trailer excluded from the byte count. None for non-MP3 input."""
    pos = 0
    if blob[:3] == b"ID3" and len(blob) > 10:
        # syncsafe 28-bit tag size
        sz = ((blob[6] & 0x7F) << 21) | ((blob[7] & 0x7F) << 14)             | ((blob[8] & 0x7F) << 7) | (blob[9] & 0x7F)
        pos = 10 + sz
    # scan a bounded window for the frame sync (junk prefixes exist)
    end = min(len(blob) - 4, pos + 4096)
    while pos <= end:
        if blob[pos] == 0xFF and (blob[pos + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = blob[pos + 1], blob[pos + 2], blob[pos + 3]
            version = (b1 >> 3) & 3   # 3 = MPEG-1
            layer = (b1 >> 1) & 3     # 1 = Layer III
            if version == 3 and layer == 1:
                br = _MP3_BITRATES_V1L3[(b2 >> 4) & 0xF]
                rate = _MP3_RATES_V1[(b2 >> 2) & 3]
                if br and rate:
                    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
                    audio_bytes = len(blob) - pos
                    if blob[-128:-125] == b"TAG":
                        audio_bytes -= 128  # ID3v1 trailer is not audio
                    dur = round(audio_bytes * 8 / (br * 1000), 6)
                    # VBR: a Xing/Info header in the first frame's side-
                    # info region carries the TRUE frame count (the CBR
                    # estimate is wrong for VBR, the common encode).
                    # Offset past the 4-byte header: MPEG-1 side info is
                    # 32 bytes stereo-family / 17 mono.
                    # protection bit 0 => a 2-byte CRC precedes the
                    # side info (and the Xing tag with it)
                    crc = 2 if (b1 & 1) == 0 else 0
                    xoff = pos + 4 + crc + (17 if channels == 1 else 32)
                    tag = blob[xoff : xoff + 4]
                    if tag in (b"Xing", b"Info") and len(blob) >= xoff + 12:
                        flags = int.from_bytes(
                            blob[xoff + 4 : xoff + 8], "big"
                        )
                        if flags & 0x1:  # frame count present
                            nframes = int.from_bytes(
                                blob[xoff + 8 : xoff + 12], "big"
                            )
                            # 1152 samples per MPEG-1 Layer III frame
                            dur = round(nframes * 1152 / rate, 6)
                    return (rate, channels, br, dur)
            # false sync (wrong version/layer or reserved bitrate/rate
            # index) — 0xFFEx pairs occur in junk prefixes, so keep
            # scanning the bounded window instead of aborting
        pos += 1
    return None


#: ISO 14496-3 sampling_frequency_index table (indices 13-15 reserved)
_ADTS_RATES = [
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
]
#: channel_configuration -> front-facing channel count (7 = 7.1 -> 8);
#: 0 means "in-band PCE", reported as NULL
_ADTS_CHANNELS = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 8}


def adts_metadata(blob: bytes):
    """Bare ADTS-AAC stream metadata (r10, VERDICT r9 #5):
    ``(sample_rate, channels, duration_s, n_frames)`` from the
    self-describing fixed headers (ISO 13818-7 / 14496-3 §1.A.2) —
    syncword walk over every frame, 1024 samples per raw data block.
    Validation is structural, not a lone sync match: the first frame
    must start at byte 0, at least TWO frames must chain through their
    13-bit frame_length fields, every header must repeat the same
    layer/rate/channel bits, and the walk must either consume the blob
    exactly or end in a truncated final frame (crawl reality). Returns
    ``None`` otherwise — random 0xFFFx pairs inside other codecs never
    false-hit a chained walk. DECODE refuses: AAC spectral data is
    coded against 11 spec-constant Huffman codebooks with no
    structural self-check (the same transcription gate as the MP3 ESC
    tables); the metadata layer is exact regardless."""
    if len(blob) < 14 or blob[0] != 0xFF or (blob[1] & 0xF6) != 0xF0:
        return None
    sfi = (blob[2] >> 2) & 0xF
    if sfi >= len(_ADTS_RATES):
        return None
    rate = _ADTS_RATES[sfi]
    cc = ((blob[2] & 1) << 2) | (blob[3] >> 6)
    fixed = (blob[1], blob[2] & 0xFD, blob[3] & 0xC0)  # minus private bit
    pos = 0
    samples = 0
    nframes = 0
    while pos + 7 <= len(blob):
        if blob[pos] != 0xFF or (blob[pos + 1] & 0xF6) != 0xF0:
            return None  # desync mid-stream: not ADTS
        if (blob[pos + 1], blob[pos + 2] & 0xFD, blob[pos + 3] & 0xC0) != fixed:
            return None  # rate/channel/layer bits must repeat per spec
        flen = (
            ((blob[pos + 3] & 0x3) << 11)
            | (blob[pos + 4] << 3)
            | (blob[pos + 5] >> 5)
        )
        if flen < 7:
            return None
        blocks = (blob[pos + 6] & 0x3) + 1
        samples += 1024 * blocks
        nframes += 1
        pos += flen  # a short FINAL frame (truncated fetch) still counts
    if nframes < 2:
        return None
    return (
        rate,
        _ADTS_CHANNELS.get(cc),
        round(samples / rate, 6),
        nframes,
    )


def ogg_metadata(blob: bytes):
    """Ogg container metadata — pure stdlib page walk: codec + sample
    rate from the first page's id header (OpusHead at fixed offsets;
    Vorbis \x01vorbis id packet), duration from the LAST page's
    granule position (Opus granules are fixed 48 kHz pre-skip-adjusted;
    Vorbis granules are sample counts). Returns
    ``(codec, sample_rate, channels, duration_s|None)`` or ``None``."""
    import struct

    if len(blob) < 58 or blob[:4] != b"OggS":
        return None
    seg_n = blob[26]
    body = 27 + seg_n  # first packet starts after the segment table
    codec = rate = channels = None
    pre_skip = 0
    granule_rate = None
    head = blob[body : body + 64]
    if head[:8] == b"OpusHead" and len(head) >= 19:
        codec = "opus"
        channels = head[9]
        pre_skip = struct.unpack("<H", head[10:12])[0]
        rate = struct.unpack("<I", head[12:16])[0] or 48000
        granule_rate = 48000  # Opus granules are always 48 kHz
    elif head[:7] == b"\x01vorbis" and len(head) >= 16:
        codec = "vorbis"
        channels = head[11]
        rate = struct.unpack("<I", head[12:16])[0]
        granule_rate = rate
    else:
        return None
    dur = None
    last = blob.rfind(b"OggS")
    while last >= 0 and granule_rate:
        # the 4-byte capture pattern can legitimately occur INSIDE
        # compressed packet payloads — validate the candidate as a real
        # page header (version byte 0, plausible header-type flags,
        # segment table in range) and scan backward past impostors
        valid = (
            last + 27 <= len(blob)
            and blob[last + 4] == 0  # stream_structure_version
            and blob[last + 5] <= 0x07  # only 3 defined flag bits
            and last + 27 + blob[last + 26] <= len(blob)
        )
        if valid:
            granule = struct.unpack("<q", blob[last + 6 : last + 14])[0]
            if granule > 0:
                dur = round(max(granule - pre_skip, 0) / granule_rate, 6)
            if granule != -1:
                break  # real final page; -1 = continuation, keep going
        last = blob.rfind(b"OggS", 0, last)
    return (codec, rate, channels, dur)


def audio_container_metadata(
    df: DataFrame, bin_col: str = "content"
) -> DataFrame:
    """Per-clip audio container metadata for curation: FLAC via
    STREAMINFO, Ogg Opus/Vorbis via the page walk (duration from the
    last granule), MP3 via the first MPEG frame header (CBR-estimate
    duration), WAV via the RIFF fmt/data walk (any fmt code — the
    metadata layer reports rate/channels/bits even for codecs the
    decoder refuses). Filter by rate/channels/duration next to the
    scan, before any decode attempt. Unknown containers yield NULL
    fields, never errors.

    ``decodable`` states whether THIS ENGINE can turn the clip into
    samples (``audio_decode_array`` → ``audio_dhash``): True for the
    WAV PCM/G.711/IMA-ADPCM family, FLAC (r7, ``flaccodec``) and
    MPEG-1 Layer I/III streams whose side info stays inside the
    shipped feature set (late r7, ``mpegaudio``) and Ogg Vorbis whose
    setup parses inside the r9 feature set (``vorbiscodec``), False
    for Ogg Opus, MPEG streams needing the documented refusal set,
    and unsupported WAV fmt codes, NULL for unrecognized
    containers. A pipeline must
    report the screenable fraction rather than silently dHash-screen
    the WAV minority of a crawl (r6 advice #8);
    ``media_decode_coverage`` aggregates it per container."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"path": [], "container": [], "duration_s": [],
                   "sample_rate": [], "channels": [], "bits_per_sample": [],
                   "decodable": []}
            for path, blob in zip(pdf["path"], pdf[bin_col]):
                blob = bytes(blob)
                container = dur = rate = ch = bits = dec = None
                fl = flac_streaminfo(blob)
                og = ogg_metadata(blob) if fl is None else None
                # AIFF's FORM magic is unambiguous and must beat the
                # HEURISTIC mp3 sync scan: big-endian PCM routinely
                # contains 0xFFEx byte pairs (~5% of noise clips
                # false-hit), so magic-based containers go first
                aiff_magic = (
                    len(blob) >= 12 and blob[:4] == b"FORM"
                    and blob[8:12] in (b"AIFF", b"AIFC")
                )
                aif = (
                    _aiff_comm(blob) if fl is None and og is None else None
                )
                # ADTS before the mp3 sync scan: an ADTS header also
                # matches the looser MPEG sync heuristic, but only the
                # chained frame-length walk proves ADTS
                adts = (
                    adts_metadata(blob)
                    if fl is None and og is None and not aiff_magic
                    else None
                )
                mp = (
                    mp3_header_info(blob)
                    if fl is None and og is None and not aiff_magic
                    and adts is None
                    else None
                )
                if fl is not None:
                    rate, ch, bits, dur = fl
                    container = "flac"
                    dec = True  # r7: real pure-stdlib FLAC decode
                elif og is not None:
                    codec, rate, ch, dur = og
                    container = f"ogg/{codec}"
                    if codec == "vorbis":
                        from .vorbiscodec import vorbis_stream_supported

                        dec = vorbis_stream_supported(blob)
                    else:
                        dec = False
                elif aif is not None:
                    ch, frames, bits, rate, comp = aif
                    container = "aiff"
                    dur = round(frames / rate, 6) if rate else None
                    dec = comp.lower() in _AIFC_DECODABLE
                elif aiff_magic:
                    # FORM magic but corrupt/absurd COMM: still an AIFF
                    # container (NULL fields), never an mp3 false hit
                    container = "aiff"
                    dec = False
                elif adts is not None:
                    rate, ch, dur, _nf = adts
                    container = "aac/adts"
                    # decode refuses: spectral Huffman codebooks fail
                    # the transcription gate (see adts_metadata)
                    dec = False
                elif mp is not None:
                    rate, ch, _br, dur = mp
                    container = "mp3"
                    # r7: MPEG-1 Layer I/III streams decode for real
                    # (operators/mpegaudio.py); the side-info screen
                    # reports whether every frame stays within the
                    # shipped Huffman tables / feature set
                    from .mpegaudio import mpeg_stream_supported

                    dec = mpeg_stream_supported(blob)
                elif (len(blob) >= 12 and blob[:4] == b"RIFF"
                      and blob[8:12] == b"WAVE"):
                    container = "wav"
                    pos, fmt, dlen = 12, None, None
                    while pos + 8 <= len(blob):
                        cid = blob[pos : pos + 4]
                        ln = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
                        if cid == b"fmt " and ln >= 16:
                            body = blob[pos + 8 : pos + 8 + ln]
                            if len(body) >= 16:  # truncation guard
                                fmt = struct.unpack("<HHIIHH", body[:16])
                        elif cid == b"data":
                            dlen = ln
                        pos += 8 + ln + (ln & 1)
                    dec = False
                    if fmt is not None:
                        afmt, ch, rate, brate, _, bits = fmt
                        if dlen is not None and brate:
                            dur = round(dlen / brate, 6)
                        dec = _wav_fmt_decodable(afmt, bits)
                out["path"].append(path)
                out["container"].append(container)
                out["duration_s"].append(dur)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["bits_per_sample"].append(bits)
                out["decodable"].append(dec)
            yield pd.DataFrame(out)

    return df.select("path", bin_col).mapInPandas(batches, AUDIO_META_SCHEMA)


def _keep_min_per_signature(cur: DataFrame, sigs: DataFrame, id_col: str):
    """Radius-0 perceptual dedup without the pair graph: Hamming 0 is
    signature EQUALITY, an equivalence relation already — the
    transitive closure the connected-components loop would compute IS
    the equal-signature group, so "min id per component" collapses to
    one groupBy. Skips the iterative CC rounds (each a full Spark job)
    AND the banded pair join; undecodable blobs (absent from ``sigs``)
    are never dropped."""
    keep = sigs.groupBy("dhash").agg(F.min(id_col).alias(id_col))
    losers = sigs.join(
        keep.select(id_col), id_col, "left_anti"
    ).select(id_col)
    return cur.join(losers, id_col, "left_anti")


def curate_media(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "path",
    max_bytes: int | None = None,
    min_width: int | None = None,
    min_height: int | None = None,
    max_hamming: int = 3,
    bands: int = 4,
):
    """End-to-end media curation composition — the media counterpart of
    the text tier's clean_corpus/curate_v2 (r7): (1) size gate next to
    the scan, (2) dimension gate via the metadata walks
    (``image_dimensions``, no decode), (3) exact byte dedup on the md5
    digest (smallest id keeps), (4) perceptual near-dup removal —
    ``dhash_pairs`` → connected components → smallest id per cluster
    keeps (``components.dedup_keep_canonical``). Returns
    ``(survivors, coverage)``: the curated frame plus the
    ``media_decode_coverage`` report OVER THE SURVIVORS, so the
    pipeline logs exactly what fraction of what it kept was actually
    perceptually screened (undecodable blobs pass the dHash stage
    unscreened by design — a screen must never drop what it cannot
    read).

    Scale shape: every stage is an existing operator; payload bytes
    move only in the survivor projections — the gates are scan-side
    filters, exact dedup shuffles (digest, id), and the near-dup tier
    shuffles 8-byte signatures through the banded engine."""
    from .components import dedup_keep_canonical

    cur = df
    if max_bytes is not None:
        cur = cur.filter(F.length(F.col(bin_col)) <= max_bytes)
    if min_width is not None or min_height is not None:
        # drop only PROVABLY undersized images: unknown dims (audio,
        # opaque payloads, unrecognized containers) survive the gate —
        # the same never-silently-drop-the-unreadable rule the screens
        # follow; the coverage report flags them downstream
        dims = image_dimensions(
            cur.select(F.col(id_col).alias("path"), F.col(bin_col)),
            bin_col,
        ).select(F.col("path").alias(id_col), "width", "height")
        viol = F.lit(False)
        if min_width is not None:
            viol = viol | (F.col("width") < min_width)
        if min_height is not None:
            viol = viol | (F.col("height") < min_height)
        drop_ids = dims.filter(viol).select(id_col)
        cur = cur.join(drop_ids, id_col, "left_anti")
    # exact byte dedup: smallest id per digest keeps
    exact_keep = (
        cur.select(F.col(id_col), F.md5(F.col(bin_col)).alias("_dg"))
        .groupBy("_dg")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    cur = cur.join(exact_keep, id_col, "left_semi")
    if max_hamming == 0:
        from ..session import materialize

        sigs = materialize(
            image_dhash(cur, bin_col, id_col).filter(
                F.col("dhash").isNotNull()
            )
        )
        survivors = _keep_min_per_signature(cur, sigs, id_col)
    else:
        pairs = dhash_pairs(
            cur, bin_col, id_col, max_hamming=max_hamming, bands=bands
        )
        survivors = dedup_keep_canonical(cur, pairs, id_col=id_col)
    return survivors, media_decode_coverage(survivors, bin_col)


def curate_audio(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "path",
    min_duration_s: float | None = None,
    max_duration_s: float | None = None,
    min_sample_rate: int | None = None,
    max_hamming: int = 3,
    bands: int = 4,
):
    """Audio counterpart of ``curate_media`` (r7): metadata gate
    (duration/sample-rate from ``audio_container_metadata`` — drops
    only PROVABLY violating clips, unknown metadata survives), exact
    byte dedup (smallest id per digest), perceptual near-dup removal
    via ``audio_dhash_pairs`` → connected components → canonical keep,
    and the decode-coverage report over the survivors (so a pipeline
    reports "N% of kept audio was actually screened" — Ogg and the
    MPEG refusal set pass the perceptual stage unscreened by design;
    supported MP3 screens for real since late r7). Returns
    ``(survivors, coverage)``."""
    from .components import dedup_keep_canonical

    cur = df
    if (min_duration_s is not None or max_duration_s is not None
            or min_sample_rate is not None):
        meta = audio_container_metadata(
            cur.select(F.col(id_col).alias("path"), F.col(bin_col)),
            bin_col,
        ).select(F.col("path").alias(id_col), "duration_s", "sample_rate")
        viol = F.lit(False)
        if min_duration_s is not None:
            viol = viol | (F.col("duration_s") < min_duration_s)
        if max_duration_s is not None:
            viol = viol | (F.col("duration_s") > max_duration_s)
        if min_sample_rate is not None:
            viol = viol | (F.col("sample_rate") < min_sample_rate)
        drop_ids = meta.filter(viol).select(id_col)
        cur = cur.join(drop_ids, id_col, "left_anti")
    exact_keep = (
        cur.select(F.col(id_col), F.md5(F.col(bin_col)).alias("_dg"))
        .groupBy("_dg")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    cur = cur.join(exact_keep, id_col, "left_semi")
    if max_hamming == 0:
        from ..session import materialize

        sigs = materialize(
            audio_dhash(cur, bin_col, id_col).filter(
                F.col("dhash").isNotNull()
            )
        )
        survivors = _keep_min_per_signature(cur, sigs, id_col)
    else:
        pairs = audio_dhash_pairs(
            cur, bin_col, id_col, max_hamming=max_hamming, bands=bands
        )
        survivors = dedup_keep_canonical(cur, pairs, id_col=id_col)
    return survivors, media_decode_coverage(survivors, bin_col)
