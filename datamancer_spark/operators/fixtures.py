"""Deterministic synthetic media-blob fixtures (VERDICT r7 #3 / r8 #2).

The driver's testdata tables carry no binary columns, so the media
operators (decode, resize, coverage, perceptual dedup, curation) need
their inputs MANUFACTURED — arithmetically, from integer ids, so that a
DuckDB oracle can predict every decode output in closed form. Each
generator here maps ``i -> bytes`` such that the engine's REAL decoders
produce values that are exact short decimals (no cross-engine rounding
ambiguity: Python ``round``, Spark HALF_UP and DuckDB half-even all act
as identity on them).

Blobs are generated EXECUTOR-SIDE (``synth_blob_frame`` is an
Arrow-batched mapInPandas) — nothing blob-sized ever leaves the driver;
at 100 TB the same pattern manufactures per-partition canary blobs with
zero driver memory. The MP3 generator reuses the spec-derived test-side
encoder under ``tests/`` (importable from the repo-root working
directory both driver- and worker-side in local mode); it is a
fixture-only dependency, never a production encode path.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

# same mask family as the synthetic-signature contract queries:
# cumulative bits at {3,17,33,49,61} so hamming(m_i, m_j) == |i-j|
DHASH_MASKS = [
    0,
    8,
    131080,
    8590065672,
    562958543486984,
    2306405967757180936,
]


def dhash_target_sig(i: int) -> int:
    """The arithmetic 64-bit signature the patterned PNG for id ``i``
    must dHash to: a 60-bit md5 base per ``i % 37`` group (the Python
    twin of ``dedup.portable_hash(col, seed=11)`` / the DuckDB
    ``md5('11' || ...)`` oracle form) XOR a mask cycling ``i % 6``."""
    base = int(
        hashlib.md5(f"11{i % 37}".encode()).hexdigest()[:15], 16
    )
    return base ^ DHASH_MASKS[i % 6]


def solid_png_blob(i: int) -> bytes:
    """Solid-color RGB PNG; dims and color arithmetic in ``i``. The
    channel sum is forced ``% 3 == 0`` so the decoded mean intensity
    ``(r+g+b)/3/255`` is an EXACT multiple of 1/15 (terminating
    decimal — identical under every rounding convention)."""
    import numpy as np

    from .multimodal import png_encode

    w = 8 + i % 23
    h = 8 + i % 17
    a = i % 6
    b = (i // 6) % 6
    c = ((3 - (a + b) % 3) % 3) + 3 * ((i // 36) % 2)
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = 51 * a
    px[:, :, 1] = 51 * b
    px[:, :, 2] = 51 * c
    return png_encode(px)


def pattern_png_blob(i: int, sig: int | None = None) -> bytes:
    """Grayscale PNG engineered so ``dhash64_gray`` equals ``sig``
    (default: ``dhash_target_sig(i)``). The image is an 8-band × 9-col
    block grid (each block constant, dims multiples of 8×9 so the
    exact-area box resample recovers the grid losslessly); within a
    band the column values walk ±8 from 128 following the signature's
    bits (bit (r, c) = 1 iff cell[r][c] > cell[r][c+1]), staying in
    [64, 192] — every comparison strict, never a tie."""
    import numpy as np

    from .multimodal import png_encode

    if sig is None:
        sig = dhash_target_sig(i)
    bh = 1 + i % 3
    bw = 1 + i % 2
    px = np.empty((8 * bh, 9 * bw), dtype=np.uint8)
    for r in range(8):
        v = 128
        row = [v]
        for c in range(8):
            v = v - 8 if (sig >> (r * 8 + c)) & 1 else v + 8
            row.append(v)
        for c in range(9):
            px[r * bh : (r + 1) * bh, c * bw : (c + 1) * bw] = row[c]
    return png_encode(px)


def wav_const_blob(i: int) -> bytes:
    """PCM16 mono WAV at 8 kHz, constant sample value ``±k·4096``
    (k = 1 + i % 7): the decoded normalized amplitude is exactly
    ``k/8`` and the duration ``(400 + i % 256)/8000`` — both
    terminating ≤6-decimal values."""
    import numpy as np

    n = 400 + i % 256
    k = 1 + i % 7
    v = k * 4096 * (1 if i % 2 == 0 else -1)
    data = np.full(n, v, dtype="<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def wav_dhash_blob(i: int, sig: int | None = None) -> bytes:
    """PCM16 WAV engineered so ``audio_dhash64`` equals ``sig``
    (default: ``dhash_target_sig(i)`` — the SAME signature family the
    patterned PNGs target). 65 constant-amplitude frames of 80 samples
    whose levels walk ±0.02 from 0.5 following the signature's bits
    (bit i = 1 iff frame i+1 is louder); the walk's max excursion over
    the whole family is 19 steps, keeping levels in [0.12, 0.88] —
    every energy comparison strict, never a tie."""
    import numpy as np

    if sig is None:
        sig = dhash_target_sig(i)
    amps = [0.5]
    w = 0
    for j in range(64):
        w += 1 if (sig >> j) & 1 else -1
        amps.append(0.5 + 0.02 * w)
    # per-id global gain: the fingerprint is volume-invariant, so most
    # same-signature clips get DIFFERENT bytes (the exact-dedup stage
    # must not be the one doing the perceptual stage's work). Modulus 5
    # is coprime to the 222-period signature family, so a group mixes
    # gains; members that DO share a gain are byte-identical and
    # exercise the exact stage instead — both stages see real work.
    gain = 0.7 + 0.05 * (i % 5)
    samples = np.repeat(
        (np.asarray(amps) * 32767 * gain).astype("<i2"), 80
    )
    data = samples.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def wav_truncated_blob(i: int) -> bytes:
    """Adversarial blob for the r8 truncation guard: a RIFF/WAVE whose
    fmt chunk DECLARES 16 bytes but the file ends after 10 — must
    classify ``(wav, False)``, never crash the task."""
    return (
        b"RIFF"
        + struct.pack("<I", 30)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIH", 1, 1, 8000, i & 0xFFFF)
    )


def ogg_stub_blob(i: int) -> bytes:
    """Minimal OggS page head (metadata-only tier; decodable=False).
    The id is embedded so blobs are pairwise distinct (no accidental
    exact-dedup collapse)."""
    return (
        b"OggS\x00\x02"
        + b"\x00" * 20
        + struct.pack("<I", i)
        + b"\x01\x1e\x01vorbis"
    )


def mp4_stub_blob(i: int) -> bytes:
    """Minimal ftyp box (metadata-only tier; decodable=False)."""
    return (
        struct.pack(">I", 20)
        + b"ftypisom"
        + struct.pack(">II", 512, i)
    )


def mp3_ws_blob(i: int) -> bytes:
    """Real MPEG-1 Layer III stream CONTAINING WINDOW-SWITCHING
    granules (block sequence long, start, stop, long) — the stream
    walks the decoder's window-switching side-info path, so the
    coverage classifier's all-frames side-info check
    (``mpeg_stream_supported``) exercises it under the driver gate.
    Fixture-only import of the spec-derived test-side encoder."""
    import math

    import numpy as np

    from tests.mpeg_encoder import encode_layer3

    n = 1152  # one frame (two granules: start, stop) keeps the
    # fixture cheap — the capability walk parses every granule anyway
    t = np.arange(n)
    f = 300.0 + 40.0 * (i % 8)
    sig = 0.4 * np.sin(2 * math.pi * f * t / 44100.0) + 0.1 * np.sin(
        2 * math.pi * 3.0 * f * t / 44100.0
    )
    return encode_layer3([sig], 44100, block_types=[1, 3])


def ogg_vorbis_blob(i: int) -> bytes:
    """Real Ogg Vorbis stream (r9 decoder surface): flat floor 1 +
    residue-1 lattice over a deterministic tone mix. Fixture-only
    import of the spec-derived test-side encoder."""
    import math

    import numpy as np

    from tests.vorbis_encoder import encode_vorbis

    n = 2048
    t = np.arange(n)
    f = 150.0 + 25.0 * (i % 10)
    sig = 0.3 * np.sin(2 * math.pi * f * t / 8000.0) + 0.1 * np.sin(
        2 * math.pi * 2.7 * f * t / 8000.0
    )
    return encode_vorbis([sig], 8000, delta=0.02)


def solid_bmp_blob(i: int) -> bytes:
    """Solid-color 24-bit bottom-up BMP (r9 real decode tier); same
    dims/color arithmetic family as the PNG fixture."""
    w = 4 + i % 13
    h = 4 + i % 9
    r, g, b = i % 256, (i * 7) % 256, (i * 13) % 256
    stride = ((w * 3 + 3) // 4) * 4
    row = bytes([b, g, r]) * w + b"\x00" * (stride - 3 * w)
    data = row * h
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return (
        b"BM"
        + struct.pack("<I", 54 + len(data))
        + b"\x00\x00\x00\x00"
        + struct.pack("<I", 54)
        + info
        + data
    )


def solid_tiff_blob(i: int) -> bytes:
    """Solid-gray uncompressed single-strip 8-bit TIFF (r9 real decode
    tier), little-endian, minimal 8-entry IFD."""
    w = 4 + i % 11
    h = 4 + i % 7
    v = (i * 5) % 256
    data = bytes([v]) * (w * h)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8 + 2 + 12 * 8 + 4),
        (278, 3, 1, h), (279, 4, 1, len(data)),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    return b"II*\x00" + struct.pack("<I", 8) + ifd + data


def warc_blob(i: int) -> bytes:
    """Deterministic WARC file whose ``ingest_warc`` output is closed-
    form doc_id arithmetic. Per id: a warcinfo record, then
    ``1 + i % 3`` request/response pairs; response ``k`` is a 404 when
    ``(i + k) % 5 == 0`` (dropped by the ingest filter), otherwise a
    200 text/html whose extracted text is exactly
    ``"Doc {i} w0 ... w{m-1} &"`` with ``m = 5 + (i + 2k) % 11``.
    HTTP framing cycles ``(i + k) % 3``: chunked transfer-encoding /
    gzip content-encoding / identity; the whole file is one gzip
    member per record (the Common Crawl ``.warc.gz`` convention) for
    even ids and plain WARC for odd — every decode path in
    ``operators/warc.py`` runs under the driver gate."""
    import gzip as _gzip

    def record(wtype: str, payload: bytes, uri: str | None = None) -> bytes:
        head = [b"WARC/1.0", b"WARC-Type: " + wtype.encode()]
        if uri is not None:
            head.append(b"WARC-Target-URI: " + uri.encode())
        head += [
            b"WARC-Date: 2026-01-01T00:00:00Z",
            b"Content-Type: "
            + (
                b"application/http; msgtype=response"
                if wtype == "response"
                else b"application/warc-fields"
            ),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"

    recs = [record("warcinfo", b"software: fixtures\r\n")]
    for k in range(1 + i % 3):
        uri = f"http://h{(i + k) % 7}.example/p/{i}/{k}"
        recs.append(
            record("request", b"GET /p HTTP/1.1\r\nHost: x\r\n\r\n", uri)
        )
        if (i + k) % 5 == 0:
            body = b"<html><body>gone</body></html>"
            http = (
                b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n"
                + b"Content-Length: %d\r\n\r\n" % len(body)
                + body
            )
        else:
            m = 5 + (i + 2 * k) % 11
            words = " ".join(f"w{j}" for j in range(m))
            body = (
                f"<html><head><title>T{i}</title><style>p{{color:red}}"
                f"</style></head><body><h1>Doc {i}</h1><p>{words} "
                f"&amp;</p></body></html>"
            ).encode()
            variant = (i + k) % 3
            if variant == 0:  # chunked
                half = len(body) // 2
                body_tx = (
                    b"%x\r\n" % half + body[:half] + b"\r\n"
                    + b"%x\r\n" % (len(body) - half) + body[half:]
                    + b"\r\n0\r\n\r\n"
                )
                enc_hdr = b"Transfer-Encoding: chunked\r\n"
            elif variant == 1:  # gzip content-encoding
                body_tx = _gzip.compress(body, mtime=0)
                enc_hdr = (
                    b"Content-Encoding: gzip\r\nContent-Length: %d\r\n"
                    % len(body_tx)
                )
            else:
                body_tx = body
                enc_hdr = b"Content-Length: %d\r\n" % len(body)
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                + enc_hdr
                + b"\r\n"
                + body_tx
            )
        recs.append(record("response", http, uri))
    if i % 2 == 0:
        return b"".join(_gzip.compress(r, mtime=0) for r in recs)
    return b"".join(recs)


def warc_charset_blob(i: int) -> bytes:
    """Mixed-charset WARC fixture (r12, VERDICT r11 #2): six 200-HTML
    responses per id exercising every arm of the charset-aware payload
    decode (``operators/warc.py charset_of / decode_payload_text``),
    each with a closed-form expected text the DuckDB twin rebuilds
    from chr() codepoints:

    rec 0  windows-1252 via HTTP header (0x80 €, 0x97 —, 0xE9 é — the
           translate map AND the latin-1 passthrough bytes)
    rec 1  iso-8859-1 via HTML <meta> sniff (WHATWG folds the label
           into windows-1252; 0xEF ï, 0xE9 é)
    rec 2  UTF-8 BOM, no declaration anywhere (BOM wins, BOM stripped)
    rec 3  shift_jis via header — unsupported label: loud refusal,
           text NULL, charset column carries the label
    rec 4  no declaration, pure ASCII — the documented UTF-8 default
    rec 5  UTF-16LE BOM (2-byte code units through F.decode)

    Even ids are per-record gzip members, odd plain WARC (same
    dispatch coverage as ``warc_blob``)."""
    import gzip as _gzip

    def record(payload: bytes, uri: str) -> bytes:
        head = [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Target-URI: " + uri.encode(),
            b"WARC-Date: 2026-01-01T00:00:00Z",
            b"Content-Type: application/http; msgtype=response",
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"

    def http(body: bytes, ctype: bytes) -> bytes:
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
            + b"\r\nContent-Length: %d\r\n\r\n" % len(body) + body
        )

    pages = [
        http(
            (
                f"<html><body><p>Doc {i} café price"
                f" €{i} — dash</p></body></html>"
            ).encode("cp1252"),
            b"text/html; charset=windows-1252",
        ),
        http(
            (
                '<html><head><meta charset="iso-8859-1"></head>'
                f"<body><p>Doc {i} naïve résumé</p>"
                "</body></html>"
            ).encode("latin-1"),
            b"text/html",
        ),
        http(
            b"\xef\xbb\xbf"
            + (
                f"<html><body><p>Doc {i} résumé €</p>"
                "</body></html>"
            ).encode("utf-8"),
            b"text/html",
        ),
        http(
            f"<html><body><p>Doc {i} opaque bytes</p></body></html>".encode(),
            b"text/html; charset=shift_jis",
        ),
        http(
            f"<html><body><p>Doc {i} plain ascii words only</p>"
            "</body></html>".encode(),
            b"text/html",
        ),
        http(
            b"\xff\xfe"
            + (
                f"<html><body><p>Doc {i} wide utf sixteen</p></body></html>"
            ).encode("utf-16-le"),
            b"text/html",
        ),
    ]
    recs = [
        record(p, f"http://cs{i % 5}.example/{i}/{k}")
        for k, p in enumerate(pages)
    ]
    if i % 2 == 0:
        return b"".join(_gzip.compress(r, mtime=0) for r in recs)
    return b"".join(recs)


def warc_charset_tail_blob(i: int) -> bytes:
    """Charset LONG-TAIL WARC fixture (r12): three 200-HTML responses
    per id for ``ingest_warc_with_fallback``'s Python-codec slow path —

    rec 0  shift_jis via header, multi-byte katakana body
    rec 1  gb2312 via HTML <meta> sniff, hanzi body
    rec 2  an unknown label ('x-no-such-charset') — refusal must
           survive the fallback tier too (text NULL)

    Even ids gzip per record, odd plain."""
    import gzip as _gzip

    def record(payload: bytes, uri: str) -> bytes:
        head = [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Target-URI: " + uri.encode(),
            b"WARC-Date: 2026-01-01T00:00:00Z",
            b"Content-Type: application/http; msgtype=response",
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"

    def http(body: bytes, ctype: bytes) -> bytes:
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
            + b"\r\nContent-Length: %d\r\n\r\n" % len(body) + body
        )

    kata = "カフェ"  # katakana 'kafe'
    hanzi = "中文"  # 'zhongwen'
    pages = [
        http(
            f"<html><body><p>Doc {i} {kata}</p></body></html>".encode(
                "shift_jis"
            ),
            b"text/html; charset=shift_jis",
        ),
        http(
            (
                '<html><head><meta charset="gb2312"></head>'
                f"<body><p>Doc {i} {hanzi}</p></body></html>"
            ).encode("gb2312"),
            b"text/html",
        ),
        http(
            f"<html><body><p>Doc {i} opaque</p></body></html>".encode(),
            b"text/html; charset=x-no-such-charset",
        ),
    ]
    recs = [
        record(p, f"http://tail{i % 3}.example/{i}/{k}")
        for k, p in enumerate(pages)
    ]
    if i % 2 == 0:
        return b"".join(_gzip.compress(r, mtime=0) for r in recs)
    return b"".join(recs)


def warc_link_blob(i: int) -> bytes:
    """WARC fixture for the crawl→GRAPH seam (r12): one 200-HTML page
    per id at ``http://crawl.example/p/{i}`` whose anchor tags define a
    closed-form SPARSE link graph (every target id < i except tiny
    overrides at i=0, so targets exist at EVERY corpus size; every node
    has out-edges → dangling-free, so the PageRank twin needs no
    redistribution term; max in-degree stays ~12, keeping per-node rank
    sums SHORT — a first cut used a 50-node target ring whose in-degree
    grew with corpus size, and the resulting 300-term sums landed on
    exact rounding-boundary rationals where Spark's HALF_UP and
    DuckDB's half-even rounding flip apart):

    * absolute href            → i-1 (chain; 1 at i=0)
    * root-relative href       → i//2 (tree parent; 1 at i=0)
    * protocol-relative href   → the decade leader i - i%10
      (i-10 when i is itself a multiple of 10; 2 at i=0)
    * a mailto: and a pure-fragment anchor (must be dropped; entity
      decoding inside hrefs is pinned by the extract_links unit test —
      a query-string target here would be a dangling node)

    Even ids gzip per record, odd plain (the standard dispatch
    coverage)."""
    import gzip as _gzip

    j1 = 1 if i == 0 else i - 1
    j2 = 1 if i == 0 else i // 2
    j3 = 2 if i == 0 else (i - 10 if i % 10 == 0 else i - i % 10)
    body = (
        f"<html><body><h1>Page {i}</h1>"
        f'<a href="http://crawl.example/p/{j1}">abs</a>'
        f"<a href='/p/{j2}'>root</a>"
        f'<a href="//crawl.example/p/{j3}">proto</a>'
        '<a href="mailto:x@example.com">mail</a>'
        '<a href="#top">frag</a>'
        "</body></html>"
    ).encode()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(body)
        + body
    )
    uri = f"http://crawl.example/p/{i}"
    head = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Target-URI: " + uri.encode(),
        b"WARC-Date: 2026-01-01T00:00:00Z",
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http)).encode(),
    ]
    rec = b"\r\n".join(head) + b"\r\n\r\n" + http + b"\r\n\r\n"
    return _gzip.compress(rec, mtime=0) if i % 2 == 0 else rec


def warc_corpus_blob(i: int) -> bytes:
    """WARC fixture for the crawl→corpus CAPSTONE (pipeline_from_crawl):
    every page's fate under quality→exact-dedup→fuzzy-dedup is
    closed-form doc_id arithmetic, because token namespaces pin every
    Jaccard exactly. Per id ``i`` (records in file order):

    0. warcinfo, 1. request, then 200-HTML responses:
    2. CLUSTER page — tokens ``c{c}_0 .. c{c}_39`` with ``c = i % 50``:
       byte-identical across every doc of the cluster → exact dedup
       keeps the min doc's page.
    3. (i % 7 == 3) NEAR-DUP page — the cluster tokens with position
       ``c % 40`` replaced by ``n{i}``: trigram Jaccard vs the cluster
       page is exactly 35/41 interior (37/39, 36/40 at the edges) —
       always ≥ 0.8537, so an exact-Jaccard screen at 0.8 ALWAYS drops
       it; all other cross-page Jaccards are 0 by namespace.
    n. (i % 11 == 5) SPAM page — five repeats of one token: fails any
       (n_words ≥ 10, distinct-ratio ≥ 0.5) quality gate.
    n. UNIQUE page — tokens ``u{i}_0 .. u{i}_{14 + i%10}``: survives
       every stage.
    n. (i % 13 == 7) a 404 (dropped by the ingest status filter).

    HTTP framing cycles chunked / gzip / identity per (i + rec);
    even ids are per-record gzip members, odd plain WARC — the same
    decode-path coverage as ``warc_blob``."""
    import gzip as _gzip

    def record(wtype: str, payload: bytes, uri: str | None = None) -> bytes:
        head = [b"WARC/1.0", b"WARC-Type: " + wtype.encode()]
        if uri is not None:
            head.append(b"WARC-Target-URI: " + uri.encode())
        head += [
            b"WARC-Date: 2026-01-01T00:00:00Z",
            b"Content-Type: "
            + (
                b"application/http; msgtype=response"
                if wtype == "response"
                else b"application/warc-fields"
            ),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"

    def response(words: list[str], uri: str, rec: int) -> bytes:
        body = (
            "<html><head><title>p</title></head><body><p>"
            + " ".join(words)
            + "</p></body></html>"
        ).encode()
        variant = (i + rec) % 3
        if variant == 0:  # chunked
            half = len(body) // 2
            body_tx = (
                b"%x\r\n" % half + body[:half] + b"\r\n"
                + b"%x\r\n" % (len(body) - half) + body[half:]
                + b"\r\n0\r\n\r\n"
            )
            enc_hdr = b"Transfer-Encoding: chunked\r\n"
        elif variant == 1:  # gzip content-encoding
            body_tx = _gzip.compress(body, mtime=0)
            enc_hdr = (
                b"Content-Encoding: gzip\r\nContent-Length: %d\r\n"
                % len(body_tx)
            )
        else:
            body_tx = body
            enc_hdr = b"Content-Length: %d\r\n" % len(body)
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + enc_hdr
            + b"\r\n"
            + body_tx
        )
        return record("response", http, uri)

    c = i % 50
    host = f"s{i % 7}.example"
    recs = [
        record("warcinfo", b"software: fixtures\r\n"),
        record(
            "request",
            b"GET /c HTTP/1.1\r\nHost: x\r\n\r\n",
            f"http://{host}/c/{c}",
        ),
    ]
    cluster = [f"c{c}_{j}" for j in range(40)]
    recs.append(response(cluster, f"http://{host}/c/{c}", 2))
    rec = 3
    if i % 7 == 3:
        near = list(cluster)
        near[c % 40] = f"n{i}"
        recs.append(response(near, f"http://{host}/nd/{i}", rec))
        rec += 1
    if i % 11 == 5:
        recs.append(response(["zz"] * 5, f"http://{host}/spam/{i}", rec))
        rec += 1
    uniq = [f"u{i}_{j}" for j in range(15 + i % 10)]
    recs.append(response(uniq, f"http://{host}/u/{i}", rec))
    rec += 1
    if i % 13 == 7:
        body = b"<html><body>gone</body></html>"
        http = (
            b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(body)
            + body
        )
        recs.append(record("response", http, f"http://{host}/gone/{i}"))
    if i % 2 == 0:
        return b"".join(_gzip.compress(r, mtime=0) for r in recs)
    return b"".join(recs)


def _exact_rgb(i: int):
    """The PNG tier's exact-mean color family: channels are multiples
    of 51 with (a+b+c) % 3 == 0, so mean = (a+b+c)/15 · 51/51 = k/5 —
    a terminating decimal identical under every rounding convention."""
    a = i % 6
    b = (i // 6) % 6
    c = ((3 - (a + b) % 3) % 3) + 3 * ((i // 36) % 2)
    return 51 * a, 51 * b, 51 * c


def bmp_exact_blob(i: int) -> bytes:
    """Solid 24-bit bottom-up BMP in the exact-mean color family
    (real-pixel-decode tier for ``image_decode_multiformat``)."""
    w = 4 + i % 13
    h = 4 + i % 9
    r, g, b = _exact_rgb(i)
    stride = ((w * 3 + 3) // 4) * 4
    row = bytes([b, g, r]) * w + b"\x00" * (stride - 3 * w)
    data = row * h
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return (
        b"BM"
        + struct.pack("<I", 54 + len(data))
        + b"\x00\x00\x00\x00"
        + struct.pack("<I", 54)
        + info
        + data
    )


def tiff_exact_blob(i: int) -> bytes:
    """Solid-gray PackBits-compressed single-strip TIFF with gray value
    ``51·(i % 6)`` — decoded mean is exactly ``(i % 6)/5``; PackBits
    puts the RLE decompressor under the driver gate."""
    w = 4 + i % 11
    h = 4 + i % 7
    v = 51 * (i % 6)
    # PackBits: runs of up to 128 identical bytes per row
    def pack_row(n: int) -> bytes:
        out = b""
        left = n
        while left > 0:
            r = min(left, 128)
            out += struct.pack("b", -(r - 1)) + bytes([v])
            left -= r
        return out

    data = pack_row(w) * h
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 32773),
        (262, 3, 1, 1), (273, 4, 1, 8 + 2 + 12 * 8 + 4),
        (278, 3, 1, h), (279, 4, 1, len(data)),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    return b"II*\x00" + struct.pack("<I", 8) + ifd + data


def webp_exact_blob(i: int) -> bytes:
    """Solid lossless WebP in the exact-mean color family — the VP8L
    decoder's LZ77 run path and transforms produce the same closed-form
    mean as the PNG tier."""
    import numpy as np

    from tests.vp8l_encoder import encode_vp8l  # fixture-only dep

    w = 5 + i % 12
    h = 5 + i % 8
    r, g, b = _exact_rgb(i)
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = r
    img[:, :, 1] = g
    img[:, :, 2] = b
    return encode_vp8l(img, subtract_green=True)


def webp_grad_blob(i: int) -> bytes:
    """Real lossless-WebP (VP8L) tier: a small gradient encoded by the
    INDEPENDENT test-side encoder (subtract-green + color cache) — the
    engine's ``webp_supported`` capability walk must decode the full
    symbol stream to classify it screenable (plain LZ77 distances
    only, so the neighbor-map refusal never fires on fixture
    streams)."""
    import numpy as np

    from tests.vp8l_encoder import encode_vp8l  # fixture-only dep

    w = 6 + i % 9
    h = 5 + i % 7
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = [
                (i + x * 7 + y) % 256,
                (i * 3 + x) % 256,
                (i + y * 11) % 256,
            ]
    return encode_vp8l(img, subtract_green=True, cache_bits=2)


def adts_aac_blob(i: int) -> bytes:
    """Hand-built to-spec bare ADTS-AAC stream (r10, VERDICT r9 #5):
    ``8 + i % 5`` frames of deterministic md5-derived payload behind
    exact ISO 14496-3 fixed headers — rate index cycles 4/7/11
    (44100/22050/8000), channel config ``1 + i % 2``, one raw data
    block per frame, so ``adts_metadata`` must report
    ``duration = nframes * 1024 / rate`` exactly. Metadata-only tier:
    AAC spectral decode refuses (transcription-gated codebooks)."""
    import hashlib as _hl

    sfi = (4, 7, 11)[i % 3]
    cc = 1 + i % 2
    nframes = 8 + i % 5
    out = bytearray()
    for f in range(nframes):
        payload = _hl.md5(f"aac{i}:{f}".encode()).digest() * (2 + f % 3)
        flen = 7 + len(payload)
        hdr = bytearray(7)
        hdr[0] = 0xFF
        hdr[1] = 0xF1  # MPEG-4, layer 00, protection_absent=1
        hdr[2] = (1 << 6) | (sfi << 2) | (cc >> 2)  # profile=AAC-LC
        hdr[3] = ((cc & 0x3) << 6) | (flen >> 11)
        hdr[4] = (flen >> 3) & 0xFF
        hdr[5] = ((flen & 0x7) << 5) | 0x1F  # buffer fullness high
        hdr[6] = 0xFC  # fullness low | raw_data_blocks-1 = 0
        out += hdr + payload
    return bytes(out)


#: coverage-mix assignment: i % 11 -> (generator, container, screenable)
MIX_TIERS = [
    (solid_png_blob, "png", True),
    (wav_const_blob, "wav", True),
    (mp3_ws_blob, "mp3", True),
    (wav_truncated_blob, "wav", False),
    (ogg_stub_blob, "ogg", False),
    (mp4_stub_blob, "mp4", False),
    (ogg_vorbis_blob, "ogg", True),
    (solid_bmp_blob, "bmp", True),
    (solid_tiff_blob, "tiff", True),
    (webp_grad_blob, "webp", True),
    (adts_aac_blob, "aac/adts", False),
]


def mix_blob(i: int) -> bytes:
    return MIX_TIERS[i % 11][0](i)


def synth_blob_frame(
    df: DataFrame,
    make: Callable[[int], bytes],
    id_col: str = "doc_id",
    bin_col: str = "content",
) -> DataFrame:
    """(id, ``bin_col``) fixture frame: Arrow-batched executor-side
    generation of one blob per id. ``make`` receives the id as int
    (string ids must be numeric)."""
    from .dedup import spread_partitions

    out_schema = StructType(
        [
            df.schema[id_col],
            StructField(bin_col, BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col]
            yield pd.DataFrame(
                {
                    id_col: ids,
                    bin_col: [make(int(x)) for x in ids],
                }
            )

    # the testdata documents table is ONE parquet split — without a
    # round-robin spread every blob generation AND the downstream
    # decode (mapInPandas inherits partitioning) runs on one core;
    # measured 5.1 -> 1.2 s on the 10-tier coverage mix at sf0.1
    ids_wide = spread_partitions(df.select(F.col(id_col)))
    return ids_wide.mapInPandas(batches, out_schema)
