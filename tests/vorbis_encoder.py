"""INDEPENDENT test-side Ogg Vorbis encoder.

Independence contract (same as the JPEG/PNG/FLAC/MPEG test encoders):
shares only the PUBLIC spec with the decoder — never its code paths.
The bit packer, Ogg CRC, codeword emission, forward MDCT and the
quantization strategy are all encoder-side constructions.

Scope (documented): mono or 2-channel (uncoupled, one mux each? no —
multi-channel uses residue type 2 interleave), single mode with equal
blocksizes (blocksize_0 == blocksize_1 == 512 by default), floor 1
with zero partitions (flat two-point floor at a chosen dB level),
residue type 0/1 (mono) or 2 (stereo) with one always-coded class and
an 8x8 lookup-type-1 VQ lattice, uniform-length codebooks (canonical
lowest-codeword assignment degenerates to the entry index, which this
encoder emits directly — an intentional, spec-exact simplification).
"""

from __future__ import annotations

import math
import struct

import numpy as np


class BitWriterLSB:
    """Vorbis packs bits LSB-first within bytes. Byte-accumulator
    form: O(1) amortized per write call, not per bit."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.k = 0  # bits pending in acc

    @property
    def nbits(self) -> int:
        return len(self.buf) * 8 + self.k

    @nbits.setter
    def nbits(self, _v):  # kept for the header-prefix idiom
        pass

    def write(self, val: int, n: int):
        self.acc |= (val & ((1 << n) - 1)) << self.k
        self.k += n
        while self.k >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.k -= 8

    def write_code(self, code: int, n: int):
        """Huffman codewords are the ONE thing Vorbis serializes
        MSB-first (root-to-leaf); everything else is LSB-first."""
        rev = 0
        for _ in range(n):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.write(rev, n)

    def tobytes(self) -> bytes:
        if self.k:
            return bytes(self.buf) + bytes([self.acc & 0xFF])
        return bytes(self.buf)


_CRC_TBL = None


def _crc32_ogg(data: bytes) -> int:
    """Ogg CRC: poly 0x04C11DB7, init 0, no reflection, no final xor
    (own table build — encoder-side code, not the decoder's)."""
    global _CRC_TBL
    if _CRC_TBL is None:
        tbl = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else r << 1
            tbl.append(r & 0xFFFFFFFF)
        _CRC_TBL = tbl
    crc = 0
    for b in data:
        crc = ((crc << 8) ^ _CRC_TBL[(crc >> 24) ^ b]) & 0xFFFFFFFF
    return crc


def _lacing(n: int) -> bytes:
    """Segment table for one packet of n bytes."""
    segs = []
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)  # includes the 0 terminator for multiples of 255
    return bytes(segs)


def ogg_page(packets, granule: int, serial: int, seq: int, flags: int) -> bytes:
    lacing = b"".join(_lacing(len(p)) for p in packets)
    body = b"".join(packets)
    hdr = (
        b"OggS"
        + bytes([0, flags])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"
        + bytes([len(lacing)])
        + lacing
    )
    crc = _crc32_ogg(hdr + body)
    return hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body


def float32_pack(v: float) -> int:
    """Inverse of the spec's float32_unpack."""
    if v == 0.0:
        return 0
    sign = 0x80000000 if v < 0 else 0
    # normalize mantissa into [2^20, 2^21)
    mant = abs(v)
    exp = 788
    while mant < (1 << 20):
        mant *= 2.0
        exp -= 1
    while mant >= (1 << 21):
        mant /= 2.0
        exp += 1
    return sign | (exp << 21) | (int(round(mant)) & 0x1FFFFF)


# -- header builders ----------------------------------------------------------


def ident_header(channels: int, rate: int, bs_exp: int = 9) -> bytes:
    return (
        b"\x01vorbis"
        + struct.pack("<IBI", 0, channels, rate)
        + struct.pack("<iii", 0, 0, 0)
        + bytes([bs_exp | (bs_exp << 4)])
        + b"\x01"
    )


def comment_header() -> bytes:
    vendor = b"datamancer-spark test encoder"
    return (
        b"\x03vorbis"
        + struct.pack("<I", len(vendor))
        + vendor
        + struct.pack("<I", 0)
        + b"\x01"
    )


def _write_uniform_codebook(w: BitWriterLSB, dim: int, entries: int,
                            length: int, lookup=None):
    """Codebook with every entry the same codeword length: canonical
    lowest-codeword assignment is then the entry index itself."""
    w.write(0x564342, 24)
    w.write(dim, 16)
    w.write(entries, 24)
    w.write(0, 1)  # unordered
    w.write(0, 1)  # not sparse
    for _ in range(entries):
        w.write(length - 1, 5)
    if lookup is None:
        w.write(0, 4)
    else:
        minv, delta, mults, value_bits, seq = lookup
        w.write(1, 4)  # lookup type 1 (implicit lattice)
        w.write(float32_pack(minv), 32)
        w.write(float32_pack(delta), 32)
        w.write(value_bits - 1, 4)
        w.write(seq, 1)
        for m in mults:
            w.write(m, value_bits)


#: residue VQ grid: 32 levels, zero at level 15 (dim-2 lattice ->
#: 1024 entries, uniform 10-bit codes)
_VQ_LEVELS = 32
_VQ_ZERO = 15
_VQ_CODE_BITS = 10


def setup_header(channels: int, n: int = 512, delta: float = 0.01,
                 residue_type: int = 1, psize: int = 32,
                 floor_xs: list | None = None) -> bytes:
    """``floor_xs``: optional extra floor1 X points (beyond the implicit
    0 and n/2 endpoints) — emitted as ONE partition whose single class
    has dims == len(floor_xs), subs == 0, Y values coded by an extra
    uniform 8-bit scalar book. None keeps the flat two-point floor."""
    w = BitWriterLSB()
    w.buf += b"\x05vorbis"
    w.nbits = len(w.buf) * 8
    nbooks = 3 if floor_xs else 2
    w.write(nbooks - 1, 8)
    # book 0: residue classbook, dim 4, 16 entries, scalar
    _write_uniform_codebook(w, 4, 16, 4)
    # book 1: residue VQ, dim 2, 32x32 lattice (1024 entries)
    _write_uniform_codebook(
        w, 2, _VQ_LEVELS * _VQ_LEVELS, _VQ_CODE_BITS,
        lookup=(-_VQ_ZERO * delta, delta, list(range(_VQ_LEVELS)), 5, 0),
    )
    if floor_xs:
        # book 2: floor1 Y values, scalar, 256 entries, uniform 8-bit
        # (canonical code == entry index)
        _write_uniform_codebook(w, 1, 256, 8)
    w.write(0, 6)  # time_count - 1
    w.write(0, 16)  # time transform 0
    w.write(0, 6)  # floor_count - 1
    w.write(1, 16)  # floor type 1
    rangebits = (n // 2).bit_length() - 1  # x1 = 2^rangebits = n/2
    if floor_xs:
        if not 1 <= len(floor_xs) <= 8:
            raise ValueError("1..8 extra floor points (one class, dims<=8)")
        w.write(1, 5)   # partitions = 1
        w.write(0, 4)   # partition 0 -> class 0
        w.write(len(floor_xs) - 1, 3)  # class 0 dims - 1
        w.write(0, 2)   # subclasses = 0
        w.write(2 + 1, 8)  # subclass book 0 -> book 2 (+1 encoding)
        w.write(0, 2)   # multiplier - 1 = 0 -> range 256
        w.write(rangebits, 4)
        for x in floor_xs:
            w.write(x, rangebits)
    else:
        w.write(0, 5)  # partitions = 0 (two-point flat floor)
        w.write(0, 2)  # multiplier - 1 = 0 -> x1 range table 256
        w.write(rangebits, 4)
    w.write(0, 6)  # residue_count - 1
    w.write(residue_type, 16)
    w.write(0, 24)  # begin
    w.write(n // 2 * (channels if residue_type == 2 else 1), 24)  # end
    w.write(psize - 1, 24)
    w.write(1, 6)  # classifications - 1 = 1 -> 2 classes
    w.write(0, 8)  # classbook = book 0
    # class 0: silent (cascade 0); class 1: pass 0 coded
    w.write(0, 3)
    w.write(0, 1)
    w.write(1, 3)
    w.write(0, 1)
    w.write(1, 8)  # class 1 pass 0 -> book 1
    w.write(0, 6)  # mapping_count - 1
    w.write(0, 16)  # mapping type 0
    w.write(0, 1)  # no submaps flag -> 1 submap
    w.write(0, 1)  # no coupling
    w.write(0, 2)  # reserved
    w.write(0, 8)  # submap time (unused)
    w.write(0, 8)  # submap floor
    w.write(0, 8)  # submap residue
    w.write(0, 6)  # mode_count - 1
    w.write(0, 1)  # blockflag 0
    w.write(0, 16)  # window type
    w.write(0, 16)  # transform type
    w.write(0, 8)  # mapping
    w.write(1, 1)  # framing
    return w.tobytes()


# -- forward transform --------------------------------------------------------


_MDCT_CACHE = {}


def _vorbis_window(n: int):
    got = _MDCT_CACHE.get(("w", n))
    if got is None:
        i = np.arange(n)
        got = np.sin(0.5 * math.pi * np.sin(math.pi / n * (i + 0.5)) ** 2)
        _MDCT_CACHE[("w", n)] = got
    return got


def mdct_forward(x: np.ndarray) -> np.ndarray:
    """n samples -> n/2 coefficients, normalized so the decoder's
    IMDCT + window + overlap-add chain reproduces the input (gain
    n/4, same convention the MPEG test encoder established)."""
    n = len(x)
    m = _MDCT_CACHE.get(("m", n))
    if m is None:
        i = np.arange(n)[:, None]
        k = np.arange(n // 2)[None, :]
        m = np.cos(math.pi / (2 * n) * (2 * i + 1 + n / 2) * (2 * k + 1))
        _MDCT_CACHE[("m", n)] = m
    return (x * _vorbis_window(n)) @ m / (n / 4.0)


def _floor1_render_point(x0, y0, x1, y1, x):
    """Spec render_point: y0 + sign(dy) * (|dy| * (x - x0)) // adx.
    (The spec's incremental render_line reduces to this same closed
    form at every x — toward-zero truncation, not floor division.)"""
    dy = y1 - y0
    off = (abs(dy) * (x - x0)) // (x1 - x0)
    return y0 - off if dy < 0 else y0 + off


def _floor1_plan(xs, targets, rng=256):
    """Inverse of the spec's floor1 amplitude prediction: given desired
    final Y values (encoding order, xs[0]=0 / xs[1]=range-end first),
    produce the per-point coded values and the active-point flags."""
    count = len(xs)
    final = list(targets[:2]) + [0] * (count - 2)
    step2 = [True, True] + [False] * (count - 2)
    vals = list(targets[:2]) + [0] * (count - 2)
    for i in range(2, count):
        lo, hi = 0, 1
        for j in range(i):
            if xs[lo] < xs[j] < xs[i]:
                lo = j
            if xs[i] < xs[j] < xs[hi]:
                hi = j
        pred = _floor1_render_point(xs[lo], final[lo], xs[hi], final[hi],
                                    xs[i])
        d = targets[i] - pred
        highroom, lowroom = rng - pred, pred
        room = 2 * min(highroom, lowroom)
        if d == 0:
            val = 0
        elif d > 0:
            val = 2 * d if 2 * d < room else d + lowroom
        else:
            val = -2 * d - 1 if -2 * d - 1 < room else -d - 1 + highroom
        if not 0 <= val <= 255:
            raise ValueError(f"floor point {i}: coded val {val} out of book")
        vals[i] = val
        final[i] = targets[i]
        if val:
            step2[lo] = step2[hi] = step2[i] = True
    return vals, final, step2


def _floor1_amplitude(xs, final, step2, n_half):
    """Per-bin floor amplitude exactly as the decoder renders it
    (multiplier 1): piecewise render_point over active points, then the
    geometric 256-step dB ladder."""
    pts = sorted((xs[i], final[i]) for i in range(len(xs)) if step2[i])
    y = np.zeros(n_half, dtype=np.int64)
    lx, ly = 0, pts[0][1]
    for hx, hy in pts:
        if hx > lx:
            k = np.arange(lx, min(hx, n_half))
            dy = hy - ly
            off = (abs(dy) * (k - lx)) // (hx - lx)
            y[lx:min(hx, n_half)] = ly - off if dy < 0 else ly + off
        lx, ly = hx, hy
    if lx < n_half:
        y[lx:] = ly
    y = np.clip(y, 0, 255)
    return 1.0649863e-07 * (0.99308571 / 1.0649863e-07) ** (y / 255.0)


def encode_vorbis(channels, rate: int, n: int = 512, delta: float = 0.004,
                  floor_y: int = 255, residue_type: int | None = None,
                  serial: int = 0x7E57,
                  floor_points: list | None = None) -> bytes:
    """Encode float PCM channel list (values in [-1, 1]) to an Ogg
    Vorbis stream. Equal blocksizes (n), flat floor at
    ``inverse_db(floor_y)``, one always-coded residue class over an
    8-level lattice of step ``delta``. Mono -> residue type 1 (or 0),
    stereo -> type 2 (interleaved), per the spec's usual shapes.

    ``floor_points``: optional non-flat floor1 — list of (x, y) points
    sorted by x with floor_points[0][0] == 0 and
    floor_points[-1][0] == n//2; interior points become a one-partition
    floor config (descending segments exercise the decoder's
    render_line truncation semantics)."""
    nch = len(channels)
    if residue_type is None:
        residue_type = 2 if nch > 1 else 1
    if nch > 1 and residue_type != 2:
        raise ValueError("multichannel needs residue type 2")
    psize = 32
    chans = [np.asarray(c, dtype=np.float64) for c in channels]
    ln = max(len(c) for c in chans)
    pad = (-ln) % n
    chans = [np.concatenate([c, np.zeros(ln + pad - len(c))]) for c in chans]
    nfr = (ln + pad) // (n // 2) - 1  # 50% overlapped frames
    half = n // 2
    floor_xs = None
    if floor_points is not None:
        if floor_points[0][0] != 0 or floor_points[-1][0] != half:
            raise ValueError("floor_points must span x=0 .. x=n//2")
        # encoding order: the two endpoints first, then interior points
        fxs = [0, half] + [p[0] for p in floor_points[1:-1]]
        fys = [floor_points[0][1], floor_points[-1][1]] + [
            p[1] for p in floor_points[1:-1]
        ]
        floor_xs = fxs[2:]
        floor_vals, floor_final, floor_step2 = _floor1_plan(fxs, fys)
        amp = _floor1_amplitude(fxs, floor_final, floor_step2, half)
    else:
        # flat floor amplitude: geometric 256-step ladder pinned at the
        # spec table's endpoints (test-side copy; see decoder caveat)
        amp = 1.0649863e-07 * (0.99308571 / 1.0649863e-07) ** (
            floor_y / 255.0
        )

    packets = []
    win = _vorbis_window(n)  # noqa: F841 (applied inside mdct_forward)
    vec_len = half * (nch if residue_type == 2 else 1)
    parts = vec_len // psize
    cpc = 4  # classbook dim
    for f in range(nfr):
        w = BitWriterLSB()
        w.write(0, 1)  # audio packet
        # mode number: ilog(0) = 0 bits for a single mode
        specs = []
        for c in range(nch):
            seg = chans[c][f * half : f * half + n]
            specs.append(mdct_forward(seg) / amp)
        for _c in range(nch):
            w.write(1, 1)  # floor nonzero
            if floor_points is None:
                # flat y0 == y1
                w.write(floor_y, 8)
                w.write(floor_y, 8)
            else:
                w.write(floor_vals[0], 8)
                w.write(floor_vals[1], 8)
                for v in floor_vals[2:]:
                    # book 2 is uniform 8-bit: canonical code == index
                    w.write_code(v, 8)
        # residue vector(s)
        if residue_type == 2:
            inter = np.empty(vec_len)
            for c in range(nch):
                inter[c::nch] = specs[c]
            vecs = [inter]
        else:
            vecs = [specs[0]]
        for vec in vecs:
            q = np.clip(
                np.round(vec / delta).astype(int) + _VQ_ZERO,
                0,
                _VQ_LEVELS - 1,
            )
            # pass 0: classwords for cpc partitions, then their data
            pi = 0
            while pi < parts:
                temp = 0
                for i in range(cpc):
                    cls = 1 if pi + i < parts else 0
                    temp = temp * 2 + cls
                # classbook: uniform len 4 -> canonical code == entry
                w.write_code(temp, 4)
                for i in range(cpc):
                    if pi >= parts:
                        break
                    off = pi * psize
                    if residue_type == 0:
                        step = psize // 2
                        for j in range(step):
                            m0, m1 = q[off + j], q[off + j + step]
                            w.write_code(
                                int(m0 + _VQ_LEVELS * m1), _VQ_CODE_BITS
                            )
                    else:
                        for j in range(0, psize, 2):
                            m0, m1 = q[off + j], q[off + j + 1]
                            w.write_code(
                                int(m0 + _VQ_LEVELS * m1), _VQ_CODE_BITS
                            )
                    pi += 1
        packets.append(w.tobytes())

    out = bytearray()
    bs_exp = n.bit_length() - 1
    out += ogg_page([ident_header(nch, rate, bs_exp)], 0, serial, 0, 0x02)
    out += ogg_page(
        [
            comment_header(),
            setup_header(nch, n, delta, residue_type, psize, floor_xs),
        ],
        0,
        serial,
        1,
        0,
    )
    granule = 0
    for i, pkt in enumerate(packets):
        if i > 0:
            granule += half
        flags = 0x04 if i == len(packets) - 1 else 0
        out += ogg_page([pkt], granule, serial, 2 + i, flags)
    return bytes(out)
