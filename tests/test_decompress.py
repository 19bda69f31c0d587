"""Decompressor tests: zlib as the compression oracle.

Strategy parity with the reference suite (SURVEY.md §4): everything zlib
produces must decode bit-exactly; malformed streams must fail with BAD_DATA;
mode semantics (known-size/SHORT_OUTPUT/INSUFFICIENT_SPACE) must match.
"""

import zlib

import numpy as np
import pytest

import libdeflate_tpu as ld


def raw_deflate(data: bytes, level=6) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def gen_corpus(rng):
    """A mix of pathological and typical payloads."""
    cases = [
        b"",
        b"a",
        b"abc",
        b"a" * 100,
        b"ab" * 5000,
        bytes(range(256)) * 40,
        rng.integers(0, 256, size=10000, dtype=np.uint8).tobytes(),  # random
        rng.integers(97, 102, size=20000, dtype=np.uint8).tobytes(),  # text-ish
        (b"the quick brown fox jumps over the lazy dog. " * 500),
        rng.integers(0, 2, size=30000, dtype=np.uint8).tobytes(),  # binary-ish
    ]
    return cases


class TestDeflateDecompress:
    def test_zlib_compressed_roundtrip(self, rng):
        d = ld.Decompressor()
        for data in gen_corpus(rng):
            for level in (0, 1, 6, 9):
                comp = raw_deflate(data, level)
                res, out, ain, aout = d.deflate_decompress(comp, len(data), known_size=True)
                assert res == ld.SUCCESS, (len(data), level)
                assert out == data
                assert ain == len(comp)
                assert aout == len(data)

    def test_unknown_size_mode(self, rng):
        data = rng.integers(97, 105, size=5000, dtype=np.uint8).tobytes()
        comp = raw_deflate(data)
        d = ld.Decompressor()
        res, out, ain, aout = d.deflate_decompress(comp, len(data) + 1000)
        assert res == ld.SUCCESS and out == data

    def test_short_output(self, rng):
        data = b"hello world " * 100
        comp = raw_deflate(data)
        d = ld.Decompressor()
        res, *_ = d.deflate_decompress(comp, len(data) + 1, known_size=True)
        assert res == ld.SHORT_OUTPUT

    def test_insufficient_space(self):
        data = b"hello world " * 100
        comp = raw_deflate(data)
        d = ld.Decompressor()
        res, *_ = d.deflate_decompress(comp, len(data) - 1, known_size=True)
        assert res == ld.INSUFFICIENT_SPACE
        res, *_ = d.deflate_decompress(comp, len(data) - 1, known_size=False)
        assert res == ld.INSUFFICIENT_SPACE

    def test_stored_blocks(self, rng):
        data = rng.integers(0, 256, size=200000, dtype=np.uint8).tobytes()
        comp = raw_deflate(data, 0)  # stored blocks from zlib level 0
        d = ld.Decompressor()
        res, out, ain, aout = d.deflate_decompress(comp, len(data), known_size=True)
        assert res == ld.SUCCESS and out == data

    def test_trailing_bytes(self, rng):
        # reference: test_trailing_bytes.c — stop exactly at stream end
        data = b"some data to compress" * 20
        comp = raw_deflate(data)
        d = ld.Decompressor()
        res, out, ain, aout = d.deflate_decompress(
            comp + b"garbage after stream", len(data), known_size=True
        )
        assert res == ld.SUCCESS and out == data
        assert ain == len(comp)


class TestInvalidStreams:
    """reference: test_invalid_streams.c / malformed inputs -> BAD_DATA."""

    def test_truncated(self, rng):
        data = b"compress me please " * 50
        comp = raw_deflate(data)
        d = ld.Decompressor()
        for cut in (1, len(comp) // 2, len(comp) - 1):
            res, *_ = d.deflate_decompress(comp[:cut], len(data), known_size=True)
            assert res in (ld.BAD_DATA, ld.SHORT_OUTPUT)

    def test_reserved_block_type(self):
        d = ld.Decompressor()
        res, *_ = d.deflate_decompress(bytes([0b00000111, 0, 0]), 10)
        assert res == ld.BAD_DATA

    def test_bad_stored_nlen(self):
        # BTYPE=00, LEN=5 but NLEN wrong
        bad = bytes([0b001]) + (5).to_bytes(2, "little") + (12345).to_bytes(2, "little") + b"hello"
        d = ld.Decompressor()
        res, *_ = d.deflate_decompress(bad, 10)
        assert res == ld.BAD_DATA
        with pytest.raises(zlib.error):  # zlib agrees: invalid stored lengths
            zlib.decompressobj(-15).decompress(bad)

    def test_offset_before_start(self):
        # Static block: a match whose offset exceeds bytes produced.
        # Craft: literal 'a', then length-3 match with offset 4.
        import libdeflate_tpu.compress.emit as emit
        from libdeflate_tpu.formats.deflate import (
            STATIC_LITLEN_CODES,
            STATIC_LITLEN_LENS,
            STATIC_OFFSET_CODES,
            STATIC_OFFSET_LENS,
        )

        w = emit.BitWriter()
        w.add(1, 1)
        w.add(1, 2)
        w.add(int(STATIC_LITLEN_CODES[ord("a")]), int(STATIC_LITLEN_LENS[ord("a")]))
        w.add(int(STATIC_LITLEN_CODES[257]), int(STATIC_LITLEN_LENS[257]))  # len 3
        w.add(int(STATIC_OFFSET_CODES[3]), 5)  # offset 4 > 1 byte available
        w.add(int(STATIC_LITLEN_CODES[256]), int(STATIC_LITLEN_LENS[256]))
        d = ld.Decompressor()
        res, *_ = d.deflate_decompress(w.finish(), 100)
        assert res == ld.BAD_DATA

    def test_zlib_rejects_same(self, rng):
        # Differential: random garbage must never be SUCCESS-decoded by us
        # while zlib rejects it outright (the reference's acceptance rules,
        # incomplete-code laxness included, are modeled on zlib's own:
        # lib/deflate_decompress.c:803-853 and test_incomplete_codes.c prove
        # zlib accepts those same streams).  When both accept, outputs must
        # agree on the common prefix.
        d = ld.Decompressor()
        for _ in range(200):
            blob = rng.integers(0, 256, size=int(rng.integers(1, 50)), dtype=np.uint8).tobytes()
            res, out, ain, aout = d.deflate_decompress(blob, 1 << 16)
            try:
                zout = zlib.decompressobj(-15).decompress(blob, 1 << 16)
                zok = True
            except zlib.error:
                zout, zok = None, False
            if res == ld.SUCCESS:
                assert zok, f"we accept, zlib rejects: {blob.hex()}"
                m = min(len(out), len(zout))
                assert out[:m] == zout[:m], f"output mismatch: {blob.hex()}"


class TestWrappers:
    def test_zlib_format(self, rng):
        d = ld.Decompressor()
        for data in gen_corpus(rng)[:6]:
            comp = zlib.compress(data, 6)
            res, out, ain, aout = d.zlib_decompress(comp, len(data), known_size=True)
            assert res == ld.SUCCESS and out == data
            assert ain == len(comp)

    def test_zlib_bad_adler(self):
        data = b"check the checksum" * 10
        comp = bytearray(zlib.compress(data))
        comp[-1] ^= 0xFF
        d = ld.Decompressor()
        res, *_ = d.zlib_decompress(bytes(comp), len(data), known_size=True)
        assert res == ld.BAD_DATA

    def test_gzip_format(self, rng):
        d = ld.Decompressor()
        for data in gen_corpus(rng)[:6]:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            comp = co.compress(data) + co.flush()
            res, out, ain, aout = d.gzip_decompress(comp, len(data), known_size=True)
            assert res == ld.SUCCESS and out == data

    def test_gzip_bad_crc(self):
        data = b"check the checksum" * 10
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        comp = bytearray(co.compress(data) + co.flush())
        comp[-6] ^= 0xFF  # corrupt CRC field
        d = ld.Decompressor()
        res, *_ = d.gzip_decompress(bytes(comp), len(data), known_size=True)
        assert res == ld.BAD_DATA

    def test_gzip_multimember(self):
        a, b = b"first member ", b"and the second"
        def gz(x):
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            return co.compress(x) + co.flush()
        stream = gz(a) + gz(b)
        d = ld.Decompressor()
        res, out, ain, aout = d.gzip_decompress(stream, 100)
        assert res == ld.SUCCESS and out == a
        res, out2, ain2, _ = d.gzip_decompress(stream[ain:], 100)
        assert res == ld.SUCCESS and out2 == b
        assert ain + ain2 == len(stream)


class TestSlowDecompression:
    """reference: test_slow_decompression.c — bounded time on crafted input."""

    def test_many_empty_static_blocks(self):
        import libdeflate_tpu.compress.emit as emit
        from libdeflate_tpu.formats.deflate import STATIC_LITLEN_CODES, STATIC_LITLEN_LENS

        w = emit.BitWriter()
        for k in range(5000):
            w.add(0, 1)  # not final
            w.add(1, 2)
            w.add(int(STATIC_LITLEN_CODES[256]), int(STATIC_LITLEN_LENS[256]))
        w.add(1, 1)
        w.add(1, 2)
        w.add(int(STATIC_LITLEN_CODES[256]), int(STATIC_LITLEN_LENS[256]))
        blob = w.finish()
        d = ld.Decompressor()
        res, out, ain, aout = d.deflate_decompress(blob, 10)
        assert res == ld.SUCCESS and out == b""

    def test_overread_bounded(self):
        # reference: test_overread.c — no unbounded output from garbage
        d = ld.Decompressor()
        res, *_ = d.deflate_decompress(b"\x04", 1 << 20)
        assert res == ld.BAD_DATA
