"""Native C++ backend tests: differential vs the Python host path and zlib.

The analogue of the reference's forced-dispatch testing: every public result
must be identical whichever backend produced or consumed it.
"""

import zlib

import numpy as np
import pytest

import libdeflate_tpu as ld
from libdeflate_tpu import native_backend as nb
from libdeflate_tpu.decompress import host as pyhost
from libdeflate_tpu.formats.deflate import deflate_compress_bound

pytestmark = pytest.mark.skipif(not nb.available(), reason="no native toolchain")


def corpus(rng):
    return [
        b"",
        b"z",
        b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        b"abcabcabc" * 300,
        bytes(range(256)) * 16,
        rng.integers(0, 256, size=50000, dtype=np.uint8).tobytes(),
        rng.integers(97, 107, size=80000, dtype=np.uint8).tobytes(),
        b"\x00" * 200000,
        (b"All work and no play makes Jack a dull boy. " * 3000),
    ]


class TestNativeChecksums:
    def test_vs_zlib(self, rng):
        for _ in range(20):
            n = int(rng.integers(0, 100000))
            data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            init = int(rng.integers(0, 2**32))
            assert nb.crc32(data, init) == zlib.crc32(data, init)
            assert nb.adler32(data, init) == zlib.adler32(data, init)


class TestNativeCompress:
    @pytest.mark.parametrize("level", [0, 1, 2, 4, 6, 8, 9, 12])
    def test_roundtrip_three_ways(self, rng, level):
        for data in corpus(rng):
            comp = nb.deflate_compress(data, level, deflate_compress_bound(len(data)))
            assert comp and len(comp) <= deflate_compress_bound(len(data))
            # zlib decodes it
            assert zlib.decompressobj(-15).decompress(comp) == data
            # the Python host decoder decodes it
            res, out, ain, aout = pyhost.deflate_decompress(comp, len(data), True)
            assert res == 0 and out == data
            # the native decoder decodes it
            res, out, ain, aout = nb.deflate_decompress(comp, len(data), True)
            assert res == 0 and out == data and ain == len(comp)

    def test_bound_respected_on_random(self, rng):
        data = rng.integers(0, 256, size=300000, dtype=np.uint8).tobytes()
        for level in (1, 6, 9):
            comp = nb.deflate_compress(data, level, deflate_compress_bound(len(data)))
            assert 0 < len(comp) <= deflate_compress_bound(len(data))

    def test_overflow_returns_zero(self):
        data = b"does not fit " * 100
        comp = nb.deflate_compress(data, 6, 8)
        assert comp == b""


class TestNativeDecompress:
    def test_decodes_zlib_output(self, rng):
        for data in corpus(rng):
            for zl in (1, 6, 9):
                c = zlib.compressobj(zl, zlib.DEFLATED, -15)
                blob = c.compress(data) + c.flush()
                res, out, ain, aout = nb.deflate_decompress(blob, len(data), True)
                assert res == 0 and out == data and ain == len(blob)

    def test_decodes_python_compressor_output(self, rng):
        import os

        os.environ["LIBDEFLATE_TPU_NO_NATIVE"] = "1"
        try:
            from libdeflate_tpu.compress import engine

            data = rng.integers(97, 105, size=40000, dtype=np.uint8).tobytes()
            comp = engine.deflate_compress(data, 6)
        finally:
            del os.environ["LIBDEFLATE_TPU_NO_NATIVE"]
        res, out, *_ = nb.deflate_decompress(comp, len(data), True)
        assert res == 0 and out == data

    def test_error_codes(self, rng):
        data = b"hello world " * 100
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        comp = c.compress(data) + c.flush()
        assert nb.deflate_decompress(comp, len(data) + 1, True)[0] == ld.SHORT_OUTPUT
        assert nb.deflate_decompress(comp, len(data) - 1, True)[0] == ld.INSUFFICIENT_SPACE
        assert nb.deflate_decompress(comp[: len(comp) // 2], len(data), True)[0] in (
            ld.BAD_DATA, ld.SHORT_OUTPUT,
        )
        assert nb.deflate_decompress(bytes([0b111]), 10, False)[0] == ld.BAD_DATA

    def test_agrees_with_python_decoder_on_garbage(self, rng):
        for _ in range(300):
            blob = rng.integers(0, 256, size=int(rng.integers(1, 60)), dtype=np.uint8).tobytes()
            rn = nb.deflate_decompress(blob, 4096, False)
            rp = pyhost.deflate_decompress(blob, 4096, False)
            assert rn[0] == rp[0], blob.hex()
            if rn[0] == 0:
                assert rn[1] == rp[1] and rn[2] == rp[2]

    def test_fuzz_roundtrip(self, rng):
        # reference: scripts/libFuzzer/deflate_compress/fuzz.c protocol
        for _ in range(60):
            n = int(rng.integers(0, 20000))
            kind = rng.integers(0, 3)
            if kind == 0:
                data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            elif kind == 1:
                data = rng.integers(97, 100, size=n, dtype=np.uint8).tobytes()
            else:
                pat = rng.integers(0, 256, size=max(int(rng.integers(1, 50)), 1), dtype=np.uint8).tobytes()
                data = (pat * (n // max(len(pat), 1) + 1))[:n]
            level = int(rng.integers(0, 13))
            comp = nb.deflate_compress(data, level, deflate_compress_bound(len(data)))
            assert comp
            res, out, ain, aout = nb.deflate_decompress(comp, len(data), True)
            assert res == 0 and out == data, (n, level, kind)


class TestDecoderEntryFormat:
    """Targeted probes of the packed-entry decoder layout: literal values
    whose bits overlap the EXCEPTIONAL/SUBTABLE flag positions, two-literal
    main-table entries, and subtable-heavy (long-codeword) codes."""

    def test_high_literals_flag_collision(self, rng):
        # literals >= 0xC0 set bits 14+15 of a literal entry, which are the
        # subtable-pointer flags on non-literal entries; adjacency of such
        # literals exercises the pair-packing path too
        data = rng.integers(0xC0, 0x100, size=65536, dtype=np.uint8).tobytes()
        data += bytes([0xFF, 0xC0] * 20000)
        for lvl in (1, 6, 9):
            co = zlib.compressobj(lvl, zlib.DEFLATED, -15)
            s = co.compress(data) + co.flush()
            res, out, _, _ = ld.Decompressor().deflate_decompress(
                s, len(data), known_size=True
            )
            assert res == ld.SUCCESS and out == data

    def test_subtable_heavy_code(self, rng):
        # a very skewed alphabet forces long (>11-bit) codewords for the
        # rare symbols -> litlen subtable path; rare symbols > 0xC0 also
        # collide with the flag bits through the subtable route
        probs = np.full(256, 1.0)
        probs[:4] = 60000.0
        probs /= probs.sum()
        data = rng.choice(256, size=1 << 18, p=probs).astype(np.uint8).tobytes()
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        s = co.compress(data) + co.flush()
        res, out, _, _ = ld.Decompressor().deflate_decompress(
            s, len(data), known_size=True
        )
        assert res == ld.SUCCESS and out == data

    def test_one_bit_literal_runs_near_output_end(self):
        # degenerate 2-symbol alphabet -> 1-bit literal codes: the fastloop
        # literal burst must respect the output margin exactly (regression
        # for the capped-burst overcopy)
        for n in (271, 272, 273, 300, 4096, 65536):
            data = (b"\x00\x01" * (n // 2 + 1))[:n]
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            s = co.compress(data) + co.flush()
            res, out, _, _ = ld.Decompressor().deflate_decompress(
                s, n, known_size=True
            )
            assert res == ld.SUCCESS and out == data
            # exact-size known_size mode with one byte less must fail cleanly
            res2, *_ = ld.Decompressor().deflate_decompress(
                s, n - 1, known_size=True
            )
            assert res2 in (ld.INSUFFICIENT_SPACE, ld.BAD_DATA, ld.SHORT_OUTPUT)

    def test_long_matches_after_literal_burst(self, rng):
        # literal bursts feeding straight into 258-byte matches stress the
        # burst-then-match margin accounting
        piece = rng.integers(0, 256, size=300, dtype=np.uint8).tobytes()
        data = (piece + piece * 30 + b"q") * 40
        for lvl in (6, 12):
            out = ld.Compressor(lvl).deflate_compress(data)
            res, got, _, _ = ld.Decompressor().deflate_decompress(
                out, len(data), known_size=True
            )
            assert res == ld.SUCCESS and got == data
