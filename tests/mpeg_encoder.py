"""INDEPENDENT test-side MPEG-1 audio encoder (Layers I and III).

Independence contract (same as the JPEG/PNG/FLAC test encoders): this
module shares only the PUBLIC spec constants with the decoder (the
prototype window table and the Huffman code tables — the analogue of
JPEG's Annex K tables), never its code paths. The subband analysis
here is a brute-force direct-form convolution; the MDCT is a literal
matrix product; the bit packer is its own; table selection and
quantization are encoder-side logic the decoder never sees.

Layer III scope (documented): long blocks AND window switching
(start/short/stop via ``block_types=``; window-switching granules
require all-zero scalefactors), no bit reservoir (main_data_begin=0),
big_values quantized to |q| <= 15 (the decoder refuses the ESC tables
by design), mono / LR stereo / MS stereo, optional nonzero
scalefactors + preflag + scfsi.
"""

from __future__ import annotations

import math

import numpy as np

from datamancer_spark.operators.mpegaudio import _prototype
from datamancer_spark.operators.mpeghuff import (
    _RAW_PAIR,
    _T32_HB,
    _T32_L,
    _T33_HB,
    _T33_L,
    PAIR_TABLES,
)

_SAMPLERATES = (44100, 48000, 32000)
_BITRATES_L1 = (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                384, 416, 448)
_BITRATES_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                224, 256, 320)

_SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
_SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}
_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3,
           2, 0]
_SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, val: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def nbits(self) -> int:
        return len(self.bits)

    def tobytes(self) -> bytes:
        out = bytearray()
        acc = 0
        n = 0
        for b in self.bits:
            acc = (acc << 1) | b
            n += 1
            if n == 8:
                out.append(acc)
                acc = n = 0
        if n:
            out.append(acc << (8 - n))
        return bytes(out)


def analysis_direct(pcm):
    """Brute-force direct-form subband analysis: per output vector, a
    512-tap windowed dot product per subband. Deliberately naive."""
    h = _prototype()
    i = np.arange(512)
    k = np.arange(32)[:, None]
    filters = h[None, :] * np.cos(
        (2 * k + 1) * (i[None, :] - 16) * math.pi / 64
    )  # (32, 512)
    x = np.asarray(pcm, dtype=np.float64)
    t_len = len(x) // 32
    xp = np.concatenate([np.zeros(511), x])
    out = np.empty((t_len, 32))
    for t in range(t_len):
        newest = 32 * t + 31  # xp index of x(newest) is newest + 511
        window = xp[newest : newest + 512][::-1]  # newest-first FIFO
        out[t] = filters @ window
    return out


def _pad_to(x, mult: int):
    x = np.asarray(x, dtype=np.float64)
    rem = len(x) % mult
    return x if rem == 0 else np.concatenate([x, np.zeros(mult - rem)])


def _frame_header(layer: int, br_idx: int, sr_idx: int, mode: int,
                  mode_ext: int = 0) -> bytes:
    h0 = 0xFF
    layer_bits = {1: 0b11, 2: 0b10, 3: 0b01}[layer]
    h1 = 0xE0 | (0b11 << 3) | (layer_bits << 1) | 1  # no CRC
    h2 = (br_idx << 4) | (sr_idx << 2)
    h3 = (mode << 6) | (mode_ext << 4)
    return bytes([h0, h1, h2, h3])


# -- Layer I -----------------------------------------------------------------

_SF_TABLE = [2.0 * 2.0 ** (-i / 3.0) for i in range(63)]


def encode_layer1(channels, rate: int) -> bytes:
    """``channels``: list of equal-length float arrays in [-1, 1].
    Uniform allocation sized to the largest bitrate frame."""
    sr_idx = _SAMPLERATES.index(rate)
    nch = len(channels)
    mode = 3 if nch == 1 else 0
    # real encoders pad the final partial frame rather than drop it
    channels = [_pad_to(ch, 384) for ch in channels]
    sbs = [analysis_direct(ch) for ch in channels]  # (T, 32) each
    t_len = min(s.shape[0] for s in sbs)
    nframes = t_len // 12
    # pick the largest allocation that fits the biggest allowed frame
    br_idx = len(_BITRATES_L1) - 1
    frame_bytes = (12 * _BITRATES_L1[br_idx] * 1000 // rate) * 4
    nb = 2
    for cand in range(15, 1, -1):
        bits = 32 + nch * 32 * 4 + nch * 32 * 6 + nch * 32 * 12 * cand
        if bits <= frame_bytes * 8:
            nb = cand
            break
    alloc_code = nb - 1
    out = bytearray()
    for f in range(nframes):
        w = BitWriter()
        for sb in range(32):
            for _ch in range(nch):
                w.write(alloc_code, 4)
        sf_idx = [[0] * 32 for _ in range(nch)]
        for sb in range(32):
            for ch in range(nch):
                block = sbs[ch][f * 12 : (f + 1) * 12, sb]
                mx = float(np.max(np.abs(block))) + 1e-12
                idx = 62
                for i, v in enumerate(_SF_TABLE):
                    if v >= mx:
                        idx = i
                    else:
                        break
                sf_idx[ch][sb] = idx
                w.write(idx, 6)
        cmul = (1 << nb) / float((1 << nb) - 1)
        dadd = 2.0 ** (1 - nb)
        for s in range(12):
            for sb in range(32):
                for ch in range(nch):
                    scale = _SF_TABLE[sf_idx[ch][sb]]
                    frac = sbs[ch][f * 12 + s, sb] / scale / cmul - dadd
                    v = int(round(frac * (1 << (nb - 1))))
                    v = max(-(1 << (nb - 1)), min((1 << (nb - 1)) - 1, v))
                    m = v & ((1 << nb) - 1)
                    code = m ^ (1 << (nb - 1))
                    w.write(code, nb)
        body = w.tobytes()
        frame = _frame_header(1, br_idx, sr_idx, mode) + body
        frame += b"\x00" * (frame_bytes - len(frame))
        out += frame
    return bytes(out)


# -- Layer III ----------------------------------------------------------------

# encode maps built from the raw spec data (value, length) lists
_ENC_PAIR = {
    tid: {
        (i // xl, i % xl): (lens[i], hb[i])
        for i in range(xl * xl)
    }
    for tid, (xl, hb, lens) in _RAW_PAIR.items()
    if tid in PAIR_TABLES
}
_ENC_C1 = {
    0: {i: (_T32_L[i], _T32_HB[i]) for i in range(16)},
    1: {i: (_T33_L[i], _T33_HB[i]) for i in range(16)},
}
# smallest usable table per max-abs value (supported tables only)
_TABLE_BY_MAX = [(1, 1), (2, 5), (3, 5), (5, 7), (7, 11), (15, 15)]


def _pick_table(maxv: int):
    for cap, tid in _TABLE_BY_MAX:
        if maxv <= cap:
            return tid
    raise ValueError(f"big_values magnitude {maxv} needs ESC tables")


def _window36(block_type: int):
    """ISO 11172-3 2.4.3.4.10.3 analysis/synthesis windows for the
    36-point blocks: 0 long, 1 start, 3 stop."""
    i = np.arange(36)
    w = np.sin(math.pi / 36.0 * (i + 0.5))
    if block_type == 1:  # start: long rise, flat, short fall, zeros
        w = w.copy()
        w[18:24] = 1.0
        w[24:30] = np.sin(math.pi / 12.0 * (i[24:30] - 18.0 + 0.5))
        w[30:] = 0.0
    elif block_type == 3:  # stop: zeros, short rise, flat, long fall
        w = w.copy()
        w[:6] = 0.0
        w[6:12] = np.sin(math.pi / 12.0 * (i[6:12] - 6.0 + 0.5))
        w[12:18] = 1.0
    return w


def mdct_windowed(sub_prev, sub_cur, block_type: int = 0):
    """(18,) prev + (18,) cur subband samples -> 18 MDCT lines with the
    block-type window (0 long / 1 start / 3 stop); normalized so the
    decoder's IMDCT+overlap-add chain reproduces the input subband
    samples."""
    z = np.concatenate([sub_prev, sub_cur])
    i = np.arange(36)
    zw = z * _window36(block_type)
    k = np.arange(18)[None, :]
    m = np.cos(math.pi / 72.0 * (2 * i[:, None] + 1 + 18) * (2 * k + 1))
    # /9: the IMDCT + sine-window overlap-add chain has gain N/4 = 9
    return (zw @ m) / 9.0


def mdct_long(sub_prev, sub_cur):
    return mdct_windowed(sub_prev, sub_cur, 0)


def mdct_short(sub_prev, sub_cur):
    """Pure short block: three 12-point MDCTs at offsets 6/12/18 of the
    36-sample span -> 18 lines in NATURAL subband order (line-major,
    window-inner: index = line*3 + window). /3 = N/4 with N=12."""
    z = np.concatenate([sub_prev, sub_cur])
    w12 = np.sin(math.pi / 12.0 * (np.arange(12) + 0.5))
    i = np.arange(12)
    k = np.arange(6)[None, :]
    m = np.cos(math.pi / 24.0 * (2 * i[:, None] + 1 + 6) * (2 * k + 1))
    out = np.empty(18)
    for win in range(3):
        blk = z[6 + 6 * win : 18 + 6 * win] * w12
        out[win::3] = (blk @ m) / 3.0
    return out


def nat_to_bitstream_short(q, rate: int, first_sfb: int = 0):
    """Inverse of the decoder's reorder: natural subband-line order
    (line-major, window-inner triplets) -> Huffman bitstream order
    (sfb-major, window-major runs). ``first_sfb=3`` for mixed blocks
    (lines below sfb_s[3]*3 = 36 belong to the two long subbands and
    stay in natural order)."""
    sfb_s = _SFB_SHORT[rate]
    out = np.array(q)
    for sfb in range(first_sfb, 13):
        lo, hi = sfb_s[sfb], sfb_s[sfb + 1]
        w = hi - lo
        base = lo * 3
        nat = np.asarray(q[base : base + 3 * w]).reshape(w, 3)
        out[base : base + 3 * w] = nat.T.reshape(-1)
    return out


_ALIAS_CI = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
             -0.0037]


def alias_forward(gr_spec, n_sb: int = 31):
    """Encoder-side aliasing butterflies: the exact INVERSE of the
    decoder's reduction (rotation transpose), applied per subband
    boundary. ``n_sb=1`` for mixed blocks (only the long-subband
    boundary is aliased, matching the decoder)."""
    x = gr_spec.copy()
    for sb in range(n_sb):
        base = sb * 18 + 18
        for i in range(8):
            c = _ALIAS_CI[i]
            cs = 1.0 / math.sqrt(1.0 + c * c)
            ca = c / math.sqrt(1.0 + c * c)
            a, b = x[base - 1 - i], x[base + i]
            x[base - 1 - i] = a * cs + b * ca
            x[base + i] = b * cs - a * ca
    return x


def _quantize(xr, sf_bands, rate, scalefac_scale=0, preflag=0):
    """-> (q ints (576,), global_gain). Chooses global_gain so that
    max |q| <= 15 (decoder has no ESC tables)."""
    mult = 1.0 if scalefac_scale else 0.5
    sfb_l = _SFB_LONG[rate]
    sfvec = np.zeros(576)
    for sfb in range(22):
        sf = sf_bands[sfb] if sfb < 21 else 0
        pre = _PRETAB[sfb] if sfb < 21 else 0
        sfvec[sfb_l[sfb] : sfb_l[sfb + 1]] = mult * (
            sf + preflag * pre
        )
    target = np.abs(xr) * 2.0 ** sfvec  # decoder divides by 2^sfvec
    m = float(np.max(target))
    if m <= 0:
        return np.zeros(576, dtype=np.int64), 210
    # max |q| = (m/step)^(3/4): cap the ratio at 30 -> |q| <= 13
    gg = 210 + int(math.ceil(4.0 * math.log2(m / 30.0 + 1e-30)))
    gg = max(0, min(255, gg))
    step = 2.0 ** ((gg - 210) / 4.0)
    q = np.round((target / step) ** 0.75).astype(np.int64)
    q = np.minimum(q, 15)
    return q * np.sign(xr).astype(np.int64), gg


def _encode_granule(w: BitWriter, q, gg, rate, scalefac_compress,
                    sf_bands, preflag, scalefac_scale, skip_sf=None,
                    ws_block_type=None):
    """Huffman-encode one granule. Returns the side-info dict. ``q``
    signed ints (576,) in BITSTREAM order. ``skip_sf``: scfsi group
    flags — bands whose scalefactors are NOT transmitted (granule 1
    reuse). ``ws_block_type``: 1/2/3 emits a window-switching granule
    (all-zero scalefactors required; region boundary fixed at 36)."""
    start_bits = w.nbits()
    slen1, slen2 = _SLEN[scalefac_compress]
    if ws_block_type in (2, "m"):
        # pure short / mixed: the decoder reads short-window
        # scalefactors; this encoder only supports the zero-bit case
        assert scalefac_compress == 0 and not any(sf_bands)
    else:
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                  (16, 21, slen2)]
        for band, (lo, hi, slen) in enumerate(groups):
            if skip_sf is not None and skip_sf[band]:
                continue
            for i in range(lo, hi):
                if slen:
                    w.write(sf_bands[i], slen)
    aq = np.abs(q)
    nz = np.nonzero(aq)[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    big = np.nonzero(aq > 1)[0]
    bv_end = int(big[-1]) + 1 if len(big) else 0
    bv_end += bv_end & 1

    def _c1_end(bv):
        return bv + (max(0, last - bv) + 3) // 4 * 4

    # count1 quads must not run past 576: widen big_values (extra
    # pairs, possibly (0,0)) until they fit
    while _c1_end(bv_end) > 576:
        bv_end += 2
    c1_end = _c1_end(bv_end)
    big_values = bv_end // 2
    sfb_l = _SFB_LONG[rate]
    if ws_block_type is not None:
        # implied split: region0 ends at sample 36 (ISO 2.4.2.7),
        # region2 does not exist
        region0_count, region1_count = 0, 0  # not transmitted
        bounds = [min(36, bv_end), bv_end]
    else:
        region0_count, region1_count = 8, 7
        r0 = sfb_l[region0_count + 1]
        r1 = sfb_l[region0_count + 1 + region1_count + 1]
        bounds = [min(r0, bv_end), min(r1, bv_end), bv_end]
    table_select = []
    prev = 0
    for b in bounds:
        seg = aq[prev:b]
        mx = int(seg.max()) if len(seg) else 0
        table_select.append(_pick_table(mx) if mx else 0)
        prev = b
    prev = 0
    for tsel, b in zip(table_select, bounds):
        if tsel == 0:
            prev = b
            continue
        enc = _ENC_PAIR[tsel]
        for i in range(prev, b, 2):
            x, y = int(aq[i]), int(aq[i + 1])
            ln, code = enc[(x, y)]
            w.write(code, ln)
            if x:
                w.write(1 if q[i] < 0 else 0, 1)
            if y:
                w.write(1 if q[i + 1] < 0 else 0, 1)
        prev = b
    # count1: cost-optimal table choice exercises both decoders
    quads = [
        tuple(int(aq[i + j]) for j in range(4))
        for i in range(bv_end, c1_end, 4)
    ]
    costs = []
    for sel in (0, 1):
        enc = _ENC_C1[sel]
        tot = 0
        for quad in quads:
            v = (quad[0] << 3) | (quad[1] << 2) | (quad[2] << 1) | quad[3]
            tot += enc[v][0] + sum(quad)
        costs.append(tot)
    c1sel = 0 if costs[0] <= costs[1] else 1
    enc = _ENC_C1[c1sel]
    for qi, quad in zip(range(bv_end, c1_end, 4), quads):
        v = (quad[0] << 3) | (quad[1] << 2) | (quad[2] << 1) | quad[3]
        ln, code = enc[v]
        w.write(code, ln)
        for j in range(4):
            if quad[j]:
                w.write(1 if q[qi + j] < 0 else 0, 1)
    return {
        "part2_3_length": w.nbits() - start_bits,
        "big_values": big_values,
        "global_gain": gg,
        "scalefac_compress": scalefac_compress,
        "table_select": table_select,
        "region0_count": region0_count,
        "region1_count": region1_count,
        "preflag": preflag,
        "scalefac_scale": scalefac_scale,
        "count1table_select": c1sel,
        "ws_block_type": ws_block_type,
    }


def encode_layer3(channels, rate: int, ms_stereo: bool = False,
                  scalefac_compress: int = 0, sf_bands=None,
                  preflag: int = 0, scalefac_scale: int = 0,
                  scfsi=None, block_types=None,
                  intensity_bound_sfb: int | None = None,
                  intensity_is7_sfbs: tuple = ()) -> bytes:
    """Encode float PCM channels to an MPEG-1 Layer III stream.

    ``sf_bands``: optional 21 scalefactors (must fit the slens of
    ``scalefac_compress``). ``scfsi``: optional 4 flags per channel —
    granule 1 reuses granule 0's scalefactors for flagged groups.
    ``block_types``: optional per-granule block types (0 long, 1 start,
    2 short, 3 stop, "m" mixed), applied to every channel; the
    TDAC-valid sequences are long*->start->short*/mixed*->stop->long*.
    Window-switching granules require all-zero scalefactors + scfsi.
    ``intensity_bound_sfb``: emit INTENSITY STEREO (mode_ext bit 0):
    above long-sfb boundary ``sfb_l[k]`` the left channel carries the
    channel SUM (so L + R = M holds) and the right channel is zeroed
    — its rzero extent is how a decoder locates the bound. Positions
    stay 0 (zero-bit scalefactors); combine with ``ms_stereo`` for
    mode_ext 3 (MS below the bound). Long blocks only.
    ``intensity_is7_sfbs``: sfbs >= the bound whose right-channel
    scalefactor is emitted as is_position 7 — ISO marks such bands NOT
    intensity-coded; with mode_ext 3 they take the MS butterfly, so
    the left channel carries (L+R)/sqrt(2) there (requires
    ``ms_stereo`` and a ``scalefac_compress`` whose slens fit 7)."""
    sr_idx = _SAMPLERATES.index(rate)
    nch = len(channels)
    if ms_stereo and nch != 2:
        raise ValueError("MS needs 2 channels")
    if intensity_bound_sfb is not None:
        if nch != 2:
            raise ValueError("intensity needs 2 channels")
        if block_types is not None and any(block_types):
            raise ValueError("intensity emitter is long-block only")
    sf_bands_r = None
    if intensity_is7_sfbs:
        if intensity_bound_sfb is None or not ms_stereo:
            raise ValueError("is7 bands need intensity + MS (mode_ext 3)")
        slen1, slen2 = _SLEN[scalefac_compress]
        for sfb in intensity_is7_sfbs:
            if not intensity_bound_sfb <= sfb < 21:
                raise ValueError("is7 sfbs must sit in the intensity region")
            if (slen1 if sfb < 11 else slen2) < 3:
                raise ValueError("scalefac_compress slen too small for 7")
        sf_bands_r = list(sf_bands or [0] * 21)
        for sfb in intensity_is7_sfbs:
            sf_bands_r[sfb] = 7
    mode = 3 if nch == 1 else 1 if (ms_stereo or intensity_bound_sfb
                                    is not None) else 0
    mode_ext = (2 if ms_stereo else 0) | (
        1 if intensity_bound_sfb is not None else 0
    )
    if sf_bands is None:
        sf_bands = [0] * 21
    if scfsi is None:
        scfsi = [[0, 0, 0, 0] for _ in range(nch)]
    # real encoders pad the final partial frame rather than drop it
    channels = [_pad_to(ch, 1152) for ch in channels]
    sbs = [analysis_direct(ch) for ch in channels]
    t_len = min(s.shape[0] for s in sbs)
    ngr = t_len // 18
    nframes = ngr // 2
    if block_types is None:
        block_types = [0] * ngr
    assert len(block_types) >= ngr
    if any(bt != 0 for bt in block_types[:ngr]):
        assert not any(sf_bands) and scalefac_compress == 0
        assert not any(any(row) for row in scfsi)
    # per-channel per-granule spectra (with one granule of history)
    spectra = [[] for _ in range(nch)]
    for ch in range(nch):
        prev = np.zeros((18, 32))
        sub = sbs[ch]
        for g in range(ngr):
            bt = block_types[g]
            cur = sub[g * 18 : (g + 1) * 18, :].copy()
            # encoder-side frequency pre-inversion (decoder undoes it)
            cur[1::2, 1::2] *= -1.0
            spec = np.empty(576)
            for sb in range(32):
                if bt == "m":  # mixed: two long subbands, rest short
                    fwd = (
                        (lambda p, c: mdct_windowed(p, c, 0))
                        if sb < 2
                        else mdct_short
                    )
                elif bt == 2:
                    fwd = mdct_short
                else:
                    fwd = lambda p, c: mdct_windowed(p, c, bt)  # noqa: E731
                spec[sb * 18 : (sb + 1) * 18] = fwd(
                    prev[:, sb], cur[:, sb]
                )
            prev = cur
            # pure short blocks skip the alias butterflies (the
            # decoder's reduction is a no-op there too); mixed blocks
            # alias only the long-subband boundary
            if bt == 2:
                pass
            elif bt == "m":
                spec = alias_forward(spec, n_sb=1)
            else:
                spec = alias_forward(spec)
            spectra[ch].append(spec)
    out = bytearray()
    for f in range(nframes):
        grspecs = []
        for g in (2 * f, 2 * f + 1):
            chs = [spectra[ch][g] for ch in range(nch)]
            if intensity_bound_sfb is not None:
                b = _SFB_LONG[rate][intensity_bound_sfb]
                left, right = chs
                hi_m = left[b:] + right[b:]  # intensity mid: L+R = M
                if ms_stereo:
                    inv = 1.0 / math.sqrt(2.0)
                    lo_l = (left[:b] + right[:b]) * inv
                    lo_r = (left[:b] - right[:b]) * inv
                else:
                    lo_l, lo_r = left[:b], right[:b]
                new_l = np.concatenate([lo_l, hi_m])
                new_r = np.concatenate([lo_r, np.zeros(576 - b)])
                for sfb in intensity_is7_sfbs:
                    # NOT-intensity band: mid carries (L+R)/sqrt(2) so
                    # the decoder's MS butterfly (S=0) restores L=R
                    lo, hi = _SFB_LONG[rate][sfb], _SFB_LONG[rate][sfb + 1]
                    new_l[lo:hi] = (left[lo:hi] + right[lo:hi]) * inv
                chs = [new_l, new_r]
            elif ms_stereo:
                left, right = chs
                inv = 1.0 / math.sqrt(2.0)
                chs = [(left + right) * inv, (left - right) * inv]
            grspecs.append(chs)
        body = BitWriter()
        sides = []
        for g in range(2):
            row = []
            bt = block_types[2 * f + g]
            for ch in range(nch):
                sf_ch = (
                    sf_bands_r
                    if ch == 1 and sf_bands_r is not None
                    else sf_bands
                )
                q, gg = _quantize(grspecs[g][ch], sf_ch, rate,
                                  scalefac_scale, preflag)
                if bt == 2:
                    # decoder expects Huffman (bitstream) order
                    q = nat_to_bitstream_short(q, rate)
                elif bt == "m":
                    q = nat_to_bitstream_short(q, rate, first_sfb=3)
                skip = scfsi[ch] if g == 1 else None
                side = _encode_granule(
                    body, q, gg, rate, scalefac_compress, sf_ch,
                    preflag, scalefac_scale, skip_sf=skip,
                    ws_block_type=bt if bt else None,
                )
                row.append(side)
            sides.append(row)
        main = body.tobytes()
        side_len = 17 if nch == 1 else 32
        need = 4 + side_len + len(main)
        br_idx = None
        for bi in range(1, 15):
            if 144 * _BITRATES_L3[bi] * 1000 // rate >= need:
                br_idx = bi
                break
        if br_idx is None:
            raise ValueError("frame too large for 320 kbps")
        frame_bytes = 144 * _BITRATES_L3[br_idx] * 1000 // rate
        sw = BitWriter()
        sw.write(0, 9)  # main_data_begin
        sw.write(0, 5 if nch == 1 else 3)
        for ch in range(nch):
            for b in range(4):
                sw.write(scfsi[ch][b], 1)
        for g in range(2):
            for ch in range(nch):
                s = sides[g][ch]
                sw.write(s["part2_3_length"], 12)
                sw.write(s["big_values"], 9)
                sw.write(s["global_gain"], 8)
                sw.write(s["scalefac_compress"], 4)
                if s["ws_block_type"] is not None:
                    mixed = s["ws_block_type"] == "m"
                    sw.write(1, 1)  # window_switching
                    sw.write(2 if mixed else s["ws_block_type"], 2)
                    sw.write(1 if mixed else 0, 1)  # mixed_block
                    for t in s["table_select"]:
                        sw.write(t, 5)
                    for _sb in range(3):
                        sw.write(0, 3)  # subblock_gain
                else:
                    sw.write(0, 1)  # window_switching
                    for t in s["table_select"]:
                        sw.write(t, 5)
                    sw.write(s["region0_count"], 4)
                    sw.write(s["region1_count"], 3)
                sw.write(s["preflag"], 1)
                sw.write(s["scalefac_scale"], 1)
                sw.write(s["count1table_select"], 1)
        side = sw.tobytes()
        assert len(side) == side_len, (len(side), side_len)
        frame = _frame_header(3, br_idx, sr_idx, mode, mode_ext) \
            + side + main
        frame += b"\x00" * (frame_bytes - len(frame))
        out += frame
    return bytes(out)
