"""Independent test-side WebP-lossless (VP8L) encoder — written from
the public bitstream spec, sharing NO code with the engine decoder
(own bit writer, own canonical-code assignment, own forward
transforms), so a round trip proves the decoder against a second
implementation rather than against itself.

Emits a conformant subset: normal and simple prefix codes,
code-length-code encoding (optionally exercising the 16/17/18
repeats), color cache, LZ77 with PLAIN distance codes (code =
distance + 120 — always legal; the close-neighbor map is exactly what
the engine decoder refuses), subtract-green / single-mode predictor /
cross-color / color-indexing (with sub-byte bundling) transforms.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n):  # LSB first
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int):
        for i in range(length - 1, -1, -1):  # MSB first
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _huff_lengths(freqs: dict, max_len: int = 15) -> dict:
    """Code lengths from symbol frequencies (package-merge-free heap
    build; alphabets here are small enough that max_len never binds,
    asserted)."""
    syms = [s for s, f in freqs.items() if f > 0]
    if len(syms) <= 1:
        return {s: 1 for s in syms}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(freqs.items()) if f > 0]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    i = len(heap)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, g1 + g2))
        i += 1
    assert max(depth.values()) <= max_len, "length-limited build needed"
    return depth


def _canonical_codes(lengths: dict) -> dict:
    """(code, len) per symbol — canonical by (length, symbol), the
    RFC-1951 rule."""
    order = sorted((l, s) for s, l in lengths.items() if l > 0)
    codes = {}
    code = 0
    prev = order[0][0]
    for l, s in order:
        code <<= l - prev
        prev = l
        codes[s] = (code, l)
        code += 1
    return codes


def _covers_only_zeros(entry):
    sym = entry[0]
    return sym == 0 or sym in (17, 18)


def _write_code_lengths(
    bw: BitWriter, lengths: list, use_repeats: bool,
    use_max_symbol: bool = False,
):
    """Normal-code header: the code-length-code and the CL-coded
    length vector. ``use_max_symbol`` transmits the optional
    early-termination field instead of coding the trailing zero run —
    the decoder must stop after exactly that many CL reads and default
    the rest to zero."""
    # build CL symbol stream
    stream = []  # (cl_symbol, extra_value, extra_bits)
    i = 0
    n = len(lengths)
    while i < n:
        if use_repeats and lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                stream.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                stream.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                stream.append((0, 0, 0))
            i = j
        elif (
            use_repeats
            and lengths[i] != 0
            and i > 0
            and lengths[i] == lengths[i - 1]
            and i + 2 < n
            and lengths[i + 1] == lengths[i]
            and lengths[i + 2] == lengths[i]
        ):
            run = 0
            while i + run < n and lengths[i + run] == lengths[i] and run < 6:
                run += 1
            stream.append((16, run - 3, 2))
            i += run
        else:
            stream.append((lengths[i], 0, 0))
            i += 1
    if use_max_symbol:
        # drop the trailing all-zero entries; the max_symbol field
        # tells the decoder how many CL reads to perform
        trimmed = list(stream)
        while trimmed and _covers_only_zeros(trimmed[-1]):
            trimmed.pop()
        if len(trimmed) >= 2:  # the field encodes len-2
            stream = trimmed
        else:
            use_max_symbol = False
    clc_freq = {}
    for s, _, _ in stream:
        clc_freq[s] = clc_freq.get(s, 0) + 1
    clc_len = _huff_lengths(clc_freq, max_len=7)
    clc_codes = _canonical_codes(clc_len) if len(clc_len) > 1 else {
        s: (0, 0) for s in clc_len
    }
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    # transmit enough of the order to cover every used CL symbol
    need = max(order.index(s) for s in clc_len) + 1
    need = max(need, 4)
    bw.write(need - 4, 4)
    for i2 in range(need):
        bw.write(clc_len.get(order[i2], 0), 3)
    if use_max_symbol:
        ms = len(stream)
        bw.write(1, 1)
        for k in range(8):
            nbits = 2 + 2 * k
            if ms - 2 < (1 << nbits):
                bw.write(k, 3)
                bw.write(ms - 2, nbits)
                break
    else:
        bw.write(0, 1)  # no max_symbol field
    for s, extra, ebits in stream:
        if len(clc_len) > 1:
            c, l = clc_codes[s]
            bw.write_code(c, l)
        # single-CL-symbol code: zero bits
        if ebits:
            bw.write(extra, ebits)


def _write_prefix_code(
    bw: BitWriter, lengths: list, use_repeats: bool,
    use_max_symbol: bool = False,
):
    used = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(used) <= 2 and all(s <= 255 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)  # normal
    _write_code_lengths(bw, lengths, use_repeats, use_max_symbol)


def _codes_for(lengths: list):
    d = {s: l for s, l in enumerate(lengths) if l > 0}
    if len(d) == 1:
        return {next(iter(d)): (0, 0)}  # zero-bit code
    return _canonical_codes(d)


def _prefix_encode(value: int):
    """(code, extra_value, extra_bits) for the LZ77 length/distance
    prefix scheme."""
    if value <= 4:
        return value - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return code, value - offset - 1, extra
    raise ValueError(value)


def _tokenize(seq: np.ndarray, cache_bits: int, lz77: bool):
    """Greedy tokens over the ARGB sequence: cache hits, then
    plain-distance back-refs (dist 1 or row stride candidates), then
    literals."""
    tokens = []
    cache = {}
    n = len(seq)
    i = 0
    while i < n:
        v = int(seq[i])
        if cache_bits:
            idx = (0x1E35A7BD * v) % (1 << 32) >> (32 - cache_bits)
            if cache.get(idx) == v:
                tokens.append(("cache", idx))
                i += 1
                continue
        if lz77 and i >= 1:
            # run-length: repeat of previous pixel
            run = 0
            while i + run < n and int(seq[i + run]) == int(seq[i - 1]) and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("copy", run, 1))
                if cache_bits:
                    idx = (0x1E35A7BD * int(seq[i - 1])) % (1 << 32) >> (
                        32 - cache_bits
                    )
                    cache[idx] = int(seq[i - 1])
                i += run
                continue
        tokens.append(("lit", v))
        if cache_bits:
            cache[(0x1E35A7BD * v) % (1 << 32) >> (32 - cache_bits)] = v
        i += 1
    return tokens


def _write_entropy_image(
    bw: BitWriter,
    seq: np.ndarray,
    cache_bits: int = 0,
    lz77: bool = True,
    use_repeats: bool = True,
    toplevel: bool = False,
    meta: tuple | None = None,
    use_max_symbol: bool = False,
):
    """One entropy-coded image. ``meta`` (toplevel only) is
    ``(shift, w, h)``: emit TWO meta prefix groups split left/right at
    half the block columns — the groups share identical code tables
    (legal), so the decoder's per-pixel group SELECTION is what gets
    exercised."""
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    n_groups = 1
    group_of = None
    if toplevel and meta is not None:
        shift, w, h = meta
        bw.write(1, 1)
        bw.write(shift - 2, 3)
        bs = 1 << shift
        mw = (w + bs - 1) // bs
        mh = (h + bs - 1) // bs
        half = max(1, mw // 2)
        mimg = np.zeros(mw * mh, dtype=np.uint32)
        for my in range(mh):
            for mx in range(mw):
                gi = 0 if mx < half else 1
                mimg[my * mw + mx] = np.uint32(0xFF000000 | (gi << 8))
        _write_entropy_image(bw, mimg, lz77=False, use_repeats=use_repeats)
        n_groups = 2

        def group_of(pos):
            x = pos % w
            return 0 if (x >> shift) < half else 1

    elif toplevel:
        bw.write(0, 1)  # no meta prefix groups
    tokens = _tokenize(seq, cache_bits, lz77)
    # annotate each token with its group (by the position of its FIRST
    # pixel — the group the decoder will be in when it reads the
    # token's green symbol) and build PER-GROUP histograms, so the
    # groups' code tables genuinely differ and a wrong group selection
    # in the decoder cannot round-trip
    hists = [
        {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}}
        for _ in range(n_groups)
    ]
    annotated = []
    pos = 0
    for t in tokens:
        gi = group_of(pos) if group_of is not None else 0
        annotated.append((gi, t))
        hs = hists[gi]
        if t[0] == "lit":
            v = t[1]
            for key, sym in (
                ("g", (v >> 8) & 0xFF),
                ("r", (v >> 16) & 0xFF),
                ("b", v & 0xFF),
                ("a", (v >> 24) & 0xFF),
            ):
                hs[key][sym] = hs[key].get(sym, 0) + 1
            pos += 1
        elif t[0] == "copy":
            lc, _, _ = _prefix_encode(t[1])
            hs["g"][256 + lc] = hs["g"].get(256 + lc, 0) + 1
            dc, _, _ = _prefix_encode(t[2] + 120)
            hs["d"][dc] = hs["d"].get(dc, 0) + 1
            pos += t[1]
        else:
            sym = 256 + 24 + t[1]
            hs["g"][sym] = hs["g"].get(sym, 0) + 1
            pos += 1
    g_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    group_codes = []
    for hs in hists:
        for key in ("g", "r", "b", "a", "d"):
            if not hs[key]:
                hs[key][0] = 1
        codes = []
        for key, alpha in (
            ("g", g_alpha), ("r", 256), ("b", 256), ("a", 256), ("d", 40)
        ):
            lens_d = _huff_lengths(hs[key])
            lengths = [0] * alpha
            for s, l in lens_d.items():
                lengths[s] = l
            _write_prefix_code(bw, lengths, use_repeats, use_max_symbol)
            codes.append(_codes_for(lengths))
        group_codes.append(codes)

    def emit(codes, sym):
        c, l = codes[sym]
        if l:
            bw.write_code(c, l)

    for gi, t in annotated:
        gc, rc, bc, ac, dc = group_codes[gi]
        if t[0] == "lit":
            v = t[1]
            emit(gc, (v >> 8) & 0xFF)
            emit(rc, (v >> 16) & 0xFF)
            emit(bc, v & 0xFF)
            emit(ac, (v >> 24) & 0xFF)
        elif t[0] == "copy":
            lcode, lex, lb = _prefix_encode(t[1])
            emit(gc, 256 + lcode)
            if lb:
                bw.write(lex, lb)
            dcode, dex, db = _prefix_encode(t[2] + 120)
            emit(dc, dcode)
            if db:
                bw.write(dex, db)
        else:
            emit(gc, 256 + 24 + t[1])


# -- forward transforms -------------------------------------------------------


def _fwd_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) - g) & 0xFF
    b = ((argb & 0xFF) - g) & 0xFF
    return (argb & np.uint32(0xFF00FF00)) | (r.astype(np.uint32) << 16) | b


def _fwd_predictor(argb: np.ndarray, w: int, h: int, mode: int, shift: int):
    """Residuals for a single predictor mode everywhere (edge rules:
    (0,0) -> opaque black, row 0 -> L, col 0 -> T; TR at the right
    edge clamps to T)."""
    px = argb.reshape(h, w)
    res = np.zeros_like(px)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(px[0, x - 1])
            elif x == 0:
                pred = int(px[y - 1, 0])
            else:
                L = int(px[y, x - 1])
                T = int(px[y - 1, x])
                TL = int(px[y - 1, x - 1])
                TR = int(px[y - 1, x + 1]) if x + 1 < w else T

                def avg2(a, b):
                    return (
                        (((a >> 24) + (b >> 24)) >> 1 << 24)
                        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1 << 16)
                        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1 << 8)
                        | ((a & 0xFF) + (b & 0xFF)) >> 1
                    )

                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 11:
                    # RFC 9649 Select: Manhattan distance from the
                    # L+T-TL estimate; L wins only on pL < pT (tie->T)
                    pl = pt = 0
                    for sh in (24, 16, 8, 0):
                        est = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - (
                            (TL >> sh) & 0xFF
                        )
                        pl += abs(est - ((L >> sh) & 0xFF))
                        pt += abs(est - ((T >> sh) & 0xFF))
                    pred = L if pl < pt else T
                elif mode == 12:
                    out = 0
                    for sh in (24, 16, 8, 0):
                        v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - (
                            (TL >> sh) & 0xFF
                        )
                        v = 0 if v < 0 else (255 if v > 255 else v)
                        out |= v << sh
                    pred = out
                elif mode == 13:
                    # ClampAddSubtractHalf over avg2(L, T) and TL with
                    # C-division truncation toward zero
                    ave = avg2(L, T)
                    out = 0
                    for sh in (24, 16, 8, 0):
                        a = (ave >> sh) & 0xFF
                        d = a - ((TL >> sh) & 0xFF)
                        v = a + (abs(d) >> 1) * (1 if d >= 0 else -1)
                        v = 0 if v < 0 else (255 if v > 255 else v)
                        out |= v << sh
                    pred = out
                else:
                    raise ValueError("mode not in encoder subset")
            res[y, x] = (
                (((int(px[y, x]) >> 24) - (pred >> 24) & 0xFF) << 24)
                | ((((int(px[y, x]) >> 16) & 0xFF) - ((pred >> 16) & 0xFF) & 0xFF) << 16)
                | ((((int(px[y, x]) >> 8) & 0xFF) - ((pred >> 8) & 0xFF) & 0xFF) << 8)
                | (((int(px[y, x])) & 0xFF) - (pred & 0xFF) & 0xFF)
            )
    return res.reshape(-1)


def _fwd_color_transform(argb: np.ndarray, g2r: int, g2b: int, r2b: int):
    def delta(t, c):
        t8 = t - 256 if t >= 128 else t
        c8 = c - 256 if c >= 128 else c
        return (t8 * c8) >> 5

    out = argb.copy()
    for i in range(len(argb)):
        v = int(argb[i])
        g = (v >> 8) & 0xFF
        r_orig = (v >> 16) & 0xFF
        r = (r_orig - delta(g2r, g)) & 0xFF
        # the r2b delta uses the ORIGINAL red: the decoder's inverse
        # reconstructs red first and feeds THAT into the blue delta
        b = ((v & 0xFF) - delta(g2b, g) - delta(r2b, r_orig)) & 0xFF
        out[i] = (v & 0xFF00FF00) | (r << 16) | b
    return out


def encode_vp8l(
    rgb: np.ndarray,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    predictor_shift: int = 2,
    color_transform: tuple | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    lz77: bool = True,
    use_repeats: bool = True,
    meta_shift: int | None = None,
    use_max_symbol: bool = False,
) -> bytes:
    """RGB uint8 (h, w, 3) -> a complete .webp (RIFF/WEBP/VP8L) file.
    ``meta_shift`` emits a two-group meta prefix image (left/right
    split at half the block columns, identical tables)."""
    h, w = rgb.shape[:2]
    argb = (
        np.uint32(0xFF000000)
        | (rgb[:, :, 0].astype(np.uint32) << 16)
        | (rgb[:, :, 1].astype(np.uint32) << 8)
        | rgb[:, :, 2].astype(np.uint32)
    ).reshape(-1)
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    w_coded = w
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        argb = _fwd_subtract_green(argb)
    if predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(predictor_shift - 2, 3)
        bs = 1 << predictor_shift
        mw = (w_coded + bs - 1) // bs
        mh = (h + bs - 1) // bs
        residuals = _fwd_predictor(argb, w_coded, h, predictor_mode, predictor_shift)
        mode_img = np.full(
            mw * mh, 0xFF000000 | (predictor_mode << 8), dtype=np.uint32
        )
        _write_entropy_image(bw, mode_img, lz77=False, use_repeats=use_repeats)
        argb = residuals
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(predictor_shift - 2, 3)
        bs = 1 << predictor_shift
        mw = (w_coded + bs - 1) // bs
        mh = (h + bs - 1) // bs
        argb = _fwd_color_transform(argb, g2r, g2b, r2b)
        cte_img = np.full(
            mw * mh,
            0xFF000000 | (r2b << 16) | (g2b << 8) | g2r,
            dtype=np.uint32,
        )
        _write_entropy_image(bw, cte_img, lz77=False, use_repeats=use_repeats)
    if palette:
        colors = sorted({int(v) for v in argb})
        psize = len(colors)
        assert psize <= 256, "palette too large"
        lookup = {c: i for i, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(psize - 1, 8)
        # delta-coded palette entries
        deltas = np.zeros(psize, dtype=np.uint32)
        prev = 0
        for i, c in enumerate(colors):
            deltas[i] = (
                (((c >> 24) - (prev >> 24) & 0xFF) << 24)
                | ((((c >> 16) & 0xFF) - ((prev >> 16) & 0xFF) & 0xFF) << 16)
                | ((((c >> 8) & 0xFF) - ((prev >> 8) & 0xFF) & 0xFF) << 8)
                | (((c & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            prev = c
        _write_entropy_image(bw, deltas, lz77=False, use_repeats=use_repeats)
        if psize <= 2:
            xbits = 3
        elif psize <= 4:
            xbits = 2
        elif psize <= 16:
            xbits = 1
        else:
            xbits = 0
        px = argb.reshape(h, w_coded)
        w_packed = (w_coded + (1 << xbits) - 1) >> xbits
        packed = np.zeros((h, w_packed), dtype=np.uint32)
        per = 1 << xbits
        bitw = 8 >> xbits
        for y in range(h):
            for x in range(w_coded):
                idx = lookup[int(px[y, x])]
                packed[y, x >> xbits] |= np.uint32(idx << ((x % per) * bitw) << 8)
        packed |= np.uint32(0xFF000000)
        argb = packed.reshape(-1)
        w_coded = w_packed
    bw.write(0, 1)  # end of transforms
    _write_entropy_image(
        bw, argb, cache_bits=cache_bits, lz77=lz77,
        use_repeats=use_repeats, toplevel=True,
        meta=(meta_shift, w_coded, h) if meta_shift else None,
        use_max_symbol=use_max_symbol,
    )
    payload = b"\x2f" + bw.bytes()
    if len(payload) & 1:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + b"\x00"
    else:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
