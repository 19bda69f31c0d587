"""Pallas scalar-decoder tests (interpret mode on CPU).

Differential coverage for decompress/pallas_decode.py: zlib-produced
streams of every block type, 32 KiB flush/window crossings, deep-codeword
subtables, the zlib-lax incomplete-code acceptance cases (same crafted
streams as tests/test_incomplete_codes.py), and corrupt-stream rejection.
"""

import numpy as np
import pytest
import zlib

from libdeflate_tpu.decompress.pallas_decode import (
    decompress_chunks_pallas_host,
)

from tests.test_incomplete_codes import craft_dynamic_stream

pytestmark = pytest.mark.slow


def _rt(streams, raws):
    outs, status = decompress_chunks_pallas_host(
        streams, [len(r) for r in raws], interpret=True
    )
    for o, r, st in zip(outs, raws, status):
        assert st == 0
        assert o == r


def test_block_types_roundtrip():
    rng = np.random.default_rng(11)
    raw_dyn = (b"the quick brown fox jumps over the lazy dog. " * 8)[:256]
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    s_dyn = c.compress(raw_dyn) + c.flush()

    c = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_FIXED)
    raw_static = b"abcabcabcabc hello hello" * 4
    s_static = c.compress(raw_static) + c.flush()

    raw_stored = rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
    c = zlib.compressobj(0, zlib.DEFLATED, -15)
    s_stored = c.compress(raw_stored) + c.flush()

    _rt([s_dyn, s_static, s_stored], [raw_dyn, raw_static, raw_stored])


def test_window_and_flush_crossings():
    # 80 KB: two 32 KiB ring flushes, window wrap, far offsets
    base = open("/root/reference/README.md", "rb").read()
    raw = (base * 10)[:80000]
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    s = c.compress(raw) + c.flush()

    # offset-1 RLE runs and max-length matches
    raw2 = b"\x00" * 40000 + b"ab" * 1000
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    s2 = c.compress(raw2) + c.flush()
    _rt([s, s2], [raw, raw2])


def test_deep_codewords_subtables():
    rng = np.random.default_rng(12)
    p = np.ones(256)
    p[:8] = 4000
    p /= p.sum()
    raw = rng.choice(np.arange(256, dtype=np.uint8), size=40000, p=p).tobytes()
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    s = c.compress(raw) + c.flush()
    _rt([s], [raw])


def test_incomplete_code_acceptance():
    # empty offset code: literal-only block whose offset code has no
    # codewords
    stream = craft_dynamic_stream(
        {ord("a"): 1, 256: 1},
        {},
        [("lit", ord("a"))] * 3 + [("eob",)],
    )
    assert zlib.decompressobj(-15).decompress(stream) == b"aaa"
    _rt([stream], [b"aaa"])

    # singleton offset code actually used by a match: 'x' + match(len 3,
    # off 1) = "xxxx"
    stream2 = craft_dynamic_stream(
        {ord("x"): 1, 256: 2, 257: 2},
        {0: 1},
        [("lit", ord("x")), ("match", 257, 0, 0, 0, 0, 0), ("eob",)],
    )
    assert zlib.decompressobj(-15).decompress(stream2) == b"xxxx"
    _rt([stream2], [b"xxxx"])


def test_corrupt_stream_rejected():
    raw = (open("/root/reference/README.md", "rb").read() * 3)[:20000]
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    s = bytearray(c.compress(raw) + c.flush())
    s[len(s) // 2] ^= 0xFF
    s[len(s) // 3] ^= 0x55
    outs, status = decompress_chunks_pallas_host(
        [bytes(s)], [len(raw)], interpret=True
    )
    assert status[0] != 0


def test_batch_mixed_sizes():
    rng = np.random.default_rng(13)
    raws, streams = [], []
    for n in (7, 1000, 33000):
        raw = rng.integers(97, 110, n, dtype=np.uint8).tobytes()
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        streams.append(c.compress(raw) + c.flush())
        raws.append(raw)
    _rt(streams, raws)


def test_full_window_distance_match():
    """Matches at dist == 32768 (the full DEFLATE window) read bytes the
    carried-word ring scheme would clobber if the ring were window-sized
    (regression: zlib never emits distances near 32768 — its effective
    MAX_DIST stops ~262 short — so zlib-stream tests missed this; streams
    from this library and the reference use the whole window)."""
    from libdeflate_tpu import api

    rng = np.random.default_rng(7)
    head = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    gap = rng.integers(0, 256, 32768 - 256, dtype=np.uint8).tobytes()
    raw = head + gap + head + rng.integers(
        0, 256, 512, dtype=np.uint8).tobytes()
    for level in (6, 9, 12):
        s = bytes(api.Compressor(level).deflate_compress(raw))
        # only meaningful when the compressor actually found the
        # full-window match; the library's levels >= 6 do
        _rt([s], [raw])
