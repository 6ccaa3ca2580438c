"""Baseline TIFF pixel decode — stdlib + numpy, no codec library.

Scope (the profile scanned-document crawls actually carry): first IFD,
both byte orders, 8-bit samples, photometric 0/1 (gray, either
polarity), 2 (RGB, alpha dropped), 3 (palette), strip layout
(RowsPerStrip; tiles refuse), PlanarConfiguration 1, compression 1
(none), 32773 (PackBits) and 5 (LZW, MSB-first codes WITH the
early-change code-width bump; horizontal-differencing predictor 2).
Everything else refuses loudly (``None``) — JPEG-in-TIFF, CCITT fax
codings, 16-bit samples, tiled layout.

TIFF's entropy layer is fully self-describing (LZW builds its string
table from the stream, PackBits is counted runs), so — like PNG, GIF,
FLAC and Vorbis, and unlike the MP3 Annex-B tables — there is NO
spec-table transcription risk anywhere in this module. Verified
round-trip against the INDEPENDENT test-side writer in
``tests/test_tiff.py`` (own LZW compressor, own PackBits packer, own
IFD serialization).

Reference parity note: the reference engine (Datamancer) has no image
decode at all — beyond-reference LLM-pipeline surface (multimodal.py).
"""

from __future__ import annotations

import struct

#: tag ids
_WIDTH, _HEIGHT, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR, _PREDICTOR, _COLORMAP = 284, 317, 320

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}


def _read_ifd(blob: bytes, bo: str):
    """-> {tag: [values]} for the FIRST IFD, or None."""
    (off,) = struct.unpack(bo + "I", blob[4:8])
    if off + 2 > len(blob):
        return None
    (n,) = struct.unpack(bo + "H", blob[off : off + 2])
    tags = {}
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(blob):
            return None
        tag, typ, cnt = struct.unpack(bo + "HHI", blob[e : e + 8])
        if typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            raw = blob[e + 8 : e + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", blob[e + 8 : e + 12])
            if voff + size > len(blob):
                return None
            raw = blob[voff : voff + size]
        if typ == 3:
            vals = list(struct.unpack(bo + "H" * cnt, raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + "I" * cnt, raw))
        elif typ == 1:
            vals = list(raw)
        else:
            vals = []
        tags[tag] = vals
    return tags


def _packbits(data: bytes, expected: int):
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i >= n:
                break
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128: no-op
    return bytes(out[:expected]) if len(out) >= expected else None


def _tiff_lzw(data: bytes, expected: int):
    """TIFF LZW: MSB-first codes, 256=Clear, 257=EOI, EARLY CHANGE
    (code width bumps one code before the table boundary)."""
    out = bytearray()
    table = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                prev = None
                continue
            if code == 257:
                return (
                    bytes(out[:expected]) if len(out) >= expected else None
                )
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            # EARLY CHANGE off-by-one: the decoder's table trails the
            # encoder's by one entry at read time (it appends E_{k-1}
            # only while processing code k), so the width bumps when
            # the table reaches 2^width - 2 entries (510/1022/2046) —
            # one earlier than GIF-style LZW
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out[:expected]) if len(out) >= expected else None


def _tiff_profile(blob: bytes):
    """Header-only validation: parse the first IFD and return the
    decode parameters iff the stream sits inside the supported profile
    (see module docstring), else None. No strip decompression — safe
    as the coverage classifier's cheap capability walk."""
    if len(blob) < 8:
        return None
    if blob[:4] == b"II*\x00":
        bo = "<"
    elif blob[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None
    try:
        tags = _read_ifd(blob, bo)
        if not tags:
            return None
        if 322 in tags or 323 in tags:  # TileWidth/TileLength
            return None
        w = tags.get(_WIDTH, [0])[0]
        h = tags.get(_HEIGHT, [0])[0]
        if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
            return None
        spp = tags.get(_SPP, [1])[0]
        bits = tags.get(_BITS, [8] * spp)
        comp = tags.get(_COMP, [1])[0]
        photo = tags.get(_PHOTO, [1])[0]
        planar = tags.get(_PLANAR, [1])[0]
        predictor = tags.get(_PREDICTOR, [1])[0]
        if (
            any(b != 8 for b in bits)
            or spp not in (1, 3, 4)
            or comp not in (1, 5, 32773)
            or photo not in (0, 1, 2, 3)
            or planar != 1
            or predictor not in (1, 2)
        ):
            return None
        if photo == 3 and (spp != 1 or _COLORMAP not in tags):
            return None
        offs = tags.get(_STRIP_OFF)
        cnts = tags.get(_STRIP_CNT)
        if not offs or not cnts or len(offs) != len(cnts):
            return None
        if any(o + c > len(blob) for o, c in zip(offs, cnts)):
            return None
        rps = tags.get(_ROWS_PER_STRIP, [h])[0] or h
        return (tags, w, h, spp, comp, photo, predictor, offs, cnts, rps)
    except (ValueError, struct.error):
        return None


def tiff_supported(blob: bytes) -> bool:
    """True iff the blob decodes under this module's profile —
    header/IFD walk only, nothing decompressed."""
    return _tiff_profile(blob) is not None


def tiff_dims(blob: bytes):
    """(width, height) from the first IFD of ANY tiff (including
    profiles the decoder refuses — dimension gates must still see
    them), or None when the header/IFD is unparseable."""
    if len(blob) < 8:
        return None
    if blob[:4] == b"II*\x00":
        bo = "<"
    elif blob[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None
    try:
        tags = _read_ifd(blob, bo)
        if not tags:
            return None
        w = tags.get(_WIDTH, [0])[0]
        h = tags.get(_HEIGHT, [0])[0]
        if 0 < w <= 1 << 20 and 0 < h <= 1 << 20:
            return (w, h)
        return None
    except (ValueError, struct.error):
        return None


def tiff_decode_array(blob: bytes):
    """Decode the first IFD -> ``(w, h, ch, px)`` with ``px`` uint8
    ``(h, w)`` gray or ``(h, w, 3)`` RGB, or ``None`` (refusal)."""
    import numpy as np

    prof = _tiff_profile(blob)
    if prof is None:
        return None
    tags, w, h, spp, comp, photo, predictor, offs, cnts, rps = prof
    try:
        row_bytes = w * spp
        raw = bytearray()
        rows_left = h
        for off, cnt in zip(offs, cnts):
            if off + cnt > len(blob):
                return None
            strip_rows = min(rps, rows_left)
            expected = strip_rows * row_bytes
            chunk = blob[off : off + cnt]
            if comp == 1:
                if len(chunk) < expected:
                    return None
                dec = chunk[:expected]
            elif comp == 32773:
                dec = _packbits(chunk, expected)
            else:
                dec = _tiff_lzw(chunk, expected)
            if dec is None:
                return None
            if predictor == 2:
                arr = np.frombuffer(dec, dtype=np.uint8).reshape(
                    strip_rows, w, spp
                )
                dec = np.cumsum(arr, axis=1, dtype=np.uint8).tobytes()
            raw += dec
            rows_left -= strip_rows
            if rows_left <= 0:
                break
        if rows_left > 0:
            return None
        px = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
        if photo == 2:
            return (w, h, 3, px[:, :, :3].copy() if spp == 4 else px.copy())
        if photo == 3:
            cmap = tags[_COLORMAP]
            n = 1 << 8
            if len(cmap) < 3 * n:
                return None
            pal = (
                np.asarray(cmap[: 3 * n], dtype=np.uint16)
                .reshape(3, n)
                .T
                >> 8
            ).astype(np.uint8)
            return (w, h, 3, pal[px[:, :, 0]])
        gray = px[:, :, 0].copy()
        if photo == 0:  # white-is-zero
            gray = 255 - gray
        return (w, h, 1, gray)
    except (ValueError, struct.error):
        return None
