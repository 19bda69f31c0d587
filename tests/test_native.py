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
