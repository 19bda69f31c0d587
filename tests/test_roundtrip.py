"""Compressor round-trip tests: the core invariant (SURVEY.md §4.2).

Every (level, format, payload) must round-trip bit-exactly through BOTH our
decompressor and zlib (cross-engine proof, like the reference's benchmark -Y/-Z
cross runs), and sizes must respect compress_bound.
"""

import zlib

import numpy as np
import pytest

import libdeflate_tpu as ld


def corpus(rng):
    return [
        b"",
        b"x",
        b"aaaaaaaaaaaaaaaaaaaaaaaaa",
        b"abcabcabcabcabc" * 20,
        bytes(range(256)),
        rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes(),
        rng.integers(97, 105, size=30000, dtype=np.uint8).tobytes(),
        (b"To be, or not to be, that is the question: " * 700),
        rng.integers(0, 4, size=50000, dtype=np.uint8).tobytes(),
        b"\x00" * 70000,  # forces multi-segment stored if stored chosen
    ]


ALL_LEVELS = list(range(13))
FAST_LEVELS = [0, 1, 2, 6, 9, 12]


class TestRoundTrip:
    @pytest.mark.parametrize("level", ALL_LEVELS)
    def test_deflate_roundtrip_all_levels(self, rng, level):
        d = ld.Decompressor()
        for data in corpus(rng):
            c = ld.Compressor(level)
            comp = c.deflate_compress(data)
            assert 0 < len(comp) <= c.deflate_compress_bound(len(data))
            # our decoder
            res, out, ain, aout = d.deflate_decompress(comp, len(data), known_size=True)
            assert res == ld.SUCCESS and out == data, (level, len(data))
            # zlib as decoder oracle
            z = zlib.decompressobj(-15)
            assert z.decompress(comp) == data

    @pytest.mark.parametrize("level", FAST_LEVELS)
    def test_zlib_format_roundtrip(self, rng, level):
        d = ld.Decompressor()
        for data in corpus(rng)[:8]:
            comp = ld.Compressor(level).zlib_compress(data)
            assert zlib.decompress(comp) == data
            res, out, *_ = d.zlib_decompress(comp, len(data), known_size=True)
            assert res == ld.SUCCESS and out == data

    @pytest.mark.parametrize("level", FAST_LEVELS)
    def test_gzip_format_roundtrip(self, rng, level):
        d = ld.Decompressor()
        for data in corpus(rng)[:8]:
            comp = ld.Compressor(level).gzip_compress(data)
            assert zlib.decompress(comp, 31) == data  # zlib oracle, gzip mode
            res, out, *_ = d.gzip_decompress(comp, len(data), known_size=True)
            assert res == ld.SUCCESS and out == data

    def test_level0_is_stored(self):
        data = b"hello" * 100
        comp = ld.Compressor(0).deflate_compress(data)
        assert len(comp) == ld.deflate_compress_bound(len(data)) - 4 or len(comp) >= len(data)
        # first block must be BTYPE=00
        assert (comp[0] >> 1) & 3 == 0

    def test_output_fits_contract(self):
        data = b"some compressible data " * 50
        c = ld.Compressor(6)
        full = c.deflate_compress(data)
        assert c.deflate_compress(data, len(full)) == full
        assert c.deflate_compress(data, len(full) - 1) == b""
        assert c.gzip_compress(data, 5) == b""
        assert c.zlib_compress(data, 5) == b""

    def test_invalid_levels(self):
        for bad in (-2, 13, 100):
            with pytest.raises(ValueError):
                ld.Compressor(bad)
        assert ld.Compressor(-1).level == 6

    def test_incompressible_random(self, rng):
        data = rng.integers(0, 256, size=100000, dtype=np.uint8).tobytes()
        for level in (1, 6, 12):
            comp = ld.Compressor(level).deflate_compress(data)
            assert len(comp) <= ld.deflate_compress_bound(len(data))
            z = zlib.decompressobj(-15)
            assert z.decompress(comp) == data

    def test_highly_repetitive(self, rng):
        data = b"ab" * 100000
        for level in (1, 6, 9):
            comp = ld.Compressor(level).deflate_compress(data)
            assert len(comp) < 2000  # must actually compress
            z = zlib.decompressobj(-15)
            assert z.decompress(comp) == data

    def test_litrunlen_overflow(self, rng):
        # reference: test_litrunlen_overflow.c — 65536+ literals in one block
        data = rng.integers(0, 256, size=70000, dtype=np.uint8).tobytes()
        comp = ld.Compressor(2).deflate_compress(data)
        z = zlib.decompressobj(-15)
        assert z.decompress(comp) == data


class TestRatioVsZlib:
    """North-star sanity: our levels should compare reasonably with zlib."""

    def test_level6_close_to_zlib6(self, rng):
        data = (b"the quick brown fox jumps over the lazy dog " * 2000)[:80000]
        ours = len(ld.Compressor(6).deflate_compress(data))
        theirs = len(zlib.compress(data, 6)) - 6
        assert ours <= theirs * 1.1, (ours, theirs)

    def test_level12_beats_zlib9(self, rng):
        text = open("/root/repo/SURVEY.md", "rb").read()
        ours = len(ld.Compressor(12).deflate_compress(text))
        theirs = len(zlib.compress(text, 9)) - 6
        assert ours <= theirs * 1.05, (ours, theirs)


class TestMultiBlockPythonPath:
    """Regression coverage for the forced-dispatch (pure-Python) compressor
    on inputs that span multiple 300 KB blocks and hit emit boundaries."""

    def test_near_optimal_multi_block(self, rng, monkeypatch):
        monkeypatch.setenv("LIBDEFLATE_TPU_NO_NATIVE", "1")
        import importlib
        import zlib

        from libdeflate_tpu.compress import parse_optimal

        data = b"The quick brown fox jumps over the lazy dog. " * 16000  # 720 KB
        out = parse_optimal.compress_near_optimal(data, 10)
        assert zlib.decompressobj(-15).decompress(out) == data

    def test_stats_block_splitting(self, rng):
        # The Python engine splits blocks with the reference's online
        # distribution-shift heuristic (should_end_block,
        # lib/deflate_compress.c:2141-2218).  A stream that switches regime
        # must be split near the boundary and compress tighter than one
        # forced single block.
        import zlib

        from libdeflate_tpu.compress import engine, parse_host
        from libdeflate_tpu.compress.emit import BitWriter, flush_block

        text = (b"alpha bravo charlie delta echo foxtrot golf hotel " * 900)
        binary = rng.integers(0, 256, size=45000, dtype=np.uint8).tobytes()
        data = text[:45000] + binary

        params = parse_host.LEVEL_PARAMS[6]
        kinds, vals, offs = parse_host.parse(data, params)
        blocks = list(engine._split_items_by_stats(kinds, vals, 300000))
        assert len(blocks) >= 2, "regime change must split the block"
        # partition invariants: contiguous, covering, input-aligned
        assert blocks[0][0] == 0 and blocks[-1][1] == len(kinds)
        for (s1, c1, b1, e1), (s2, c2, b2, e2) in zip(blocks, blocks[1:]):
            assert c1 == s2 and e1 == b2
        assert blocks[-1][3] == len(data)
        # the split point lands near the 45000-byte regime boundary
        assert any(abs(e - 45000) < 15000 for (_, _, _, e) in blocks[:-1])

        w = BitWriter()
        for start, cut, in_base, in_end in blocks:
            flush_block(w, data[in_base:in_end], kinds[start:cut],
                        vals[start:cut], offs[start:cut],
                        is_final=(cut == len(kinds)))
        split_out = w.finish()
        w = BitWriter()
        flush_block(w, data, kinds, vals, offs, is_final=True)
        single_out = w.finish()
        assert zlib.decompressobj(-15).decompress(split_out) == data
        assert len(split_out) < len(single_out)

    def test_emit_boundary_sweep(self, rng):
        # random small inputs across levels: a zero-width item landing on a
        # 32-bit boundary of the total once crashed pack_bits_vectorized
        import zlib

        from libdeflate_tpu.compress import engine

        for trial in range(24):
            n = int(rng.integers(1, 3000))
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            for lvl in (1, 6, 9):
                out = engine.deflate_compress(data, lvl)
                assert zlib.decompressobj(-15).decompress(out) == data
