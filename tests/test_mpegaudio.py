"""MPEG-1 audio decode tier (operators/mpegaudio.py + mpeghuff.py).

Round-trip verification uses the INDEPENDENT test-side encoder in
``tests/mpeg_encoder.py`` (same pattern as the JPEG/PNG/FLAC codecs:
the encoder shares only the public spec's constant tables, never the
decoder's code paths)."""

import math

import numpy as np
import pytest


class TestHuffmanTables:
    def test_tables_validated(self):
        """Pin EXACTLY which Layer III code tables passed the
        structural gate (prefix-free + Kraft-complete). 10 and 13 are
        documented transcription failures; 16/24 (ESC) deliberately
        not shipped."""
        from datamancer_spark.operators import mpeghuff as mh

        assert sorted(mh.PAIR_TABLES) == [1, 2, 3, 5, 6, 7, 8, 9, 11,
                                          12, 15]
        assert sorted(mh.COUNT1_TABLES) == [0, 1]
        # ESC selects resolve to None (refused), as do 10/13
        for sel in (4, 10, 13, 14, 16, 20, 24, 31):
            assert mh.pair_table_for_select(sel) is None
        # supported selects resolve with linbits 0
        for sel in (1, 2, 3, 5, 6, 7, 8, 9, 11, 12, 15):
            dec, maxlen, linbits = mh.pair_table_for_select(sel)
            assert linbits == 0
            assert 1 <= maxlen <= 13

    def test_kraft_and_prefix_exhaustive(self):
        """Every shipped decode map is a complete prefix code: walking
        ANY bit sequence always terminates at a symbol within maxlen
        bits."""
        from datamancer_spark.operators import mpeghuff as mh

        for tid, (dec, maxlen) in mh.PAIR_TABLES.items():
            # every leaf reachable: follow 256 pseudo-random bit paths
            for seed in range(256):
                acc = 0
                ln = 0
                path = seed
                hit = None
                while ln < maxlen:
                    acc = (acc << 1) | (path & 1)
                    path >>= 1
                    ln += 1
                    if (ln, acc) in dec:
                        hit = dec[(ln, acc)]
                        break
                assert hit is not None, (tid, seed)


class TestFilterbank:
    def test_perfect_reconstruction(self):
        from datamancer_spark.operators import mpegaudio as m

        rng = np.random.default_rng(7)
        x = rng.standard_normal(32768)
        rec = m.synthesis(m.analysis(x))
        d = m.chain_delay()
        assert d == 481
        n = 30000
        a = x[: n - d]
        b = rec[d:n]
        err = a - b
        snr = 10 * np.log10(np.dot(a, a) / np.dot(err, err))
        assert snr > 50.0, snr

    def test_sine_lands_in_one_subband(self):
        from datamancer_spark.operators import mpegaudio as m

        n = np.arange(8192)
        # subband k spans (k/64, (k+1)/64) cycles/sample; aim at the
        # center of subband 5
        f = (5 + 0.5) / 64.0
        x = np.sin(2 * math.pi * f * n)
        s = m.analysis(x)
        power = (s[32:] ** 2).sum(axis=0)
        assert int(np.argmax(power)) == 5
        others = power.sum() - power[5]
        assert others < 0.01 * power[5]


class TestHeaders:
    def test_header_parse_and_frame_len(self):
        from datamancer_spark.operators import mpegaudio as m

        # MPEG-1 Layer III, 128 kbps, 44100 Hz, no padding, mono
        hdr = m.parse_frame_header(bytes([0xFF, 0xFB, 0x90, 0xC0]))
        assert hdr["layer"] == 3
        assert hdr["bitrate"] == 128000
        assert hdr["samplerate"] == 44100
        assert hdr["channels"] == 1
        assert hdr["frame_bytes"] == 144 * 128000 // 44100
        # Layer I frame length is in 4-byte slots
        hdr1 = m.parse_frame_header(bytes([0xFF, 0xFF, 0x90, 0x00]))
        assert hdr1["layer"] == 1
        assert hdr1["frame_bytes"] % 4 == 0

    def test_rejects_mpeg2_and_reserved(self):
        from datamancer_spark.operators import mpegaudio as m

        assert m.parse_frame_header(bytes([0xFF, 0xF3, 0x90, 0x00])) \
            is None  # MPEG-2
        assert m.parse_frame_header(bytes([0xFF, 0xF9, 0x90, 0x00])) \
            is None  # reserved layer
        assert m.parse_frame_header(bytes([0xFF, 0xFB, 0xF0, 0x00])) \
            is None  # bad bitrate index
        assert m.parse_frame_header(bytes([0xFF, 0xFB, 0x9C, 0x00])) \
            is None  # reserved samplerate
