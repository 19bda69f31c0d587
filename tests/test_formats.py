"""Format-constant and table tests (SURVEY.md §7 step 1)."""

import numpy as np
import zlib

from libdeflate_tpu.formats import deflate as df
from libdeflate_tpu.formats import gzip_fmt, zlib_fmt


def test_length_slot_tables():
    # RFC 1951 §3.2.5 anchor values.
    assert df.LENGTH_SLOT_BASE[0] == 3
    assert df.LENGTH_SLOT_BASE[8] == 11 and df.LENGTH_SLOT_EXTRA[8] == 1
    assert df.LENGTH_SLOT_BASE[27] == 227 and df.LENGTH_SLOT_EXTRA[27] == 5
    assert df.LENGTH_SLOT_BASE[28] == 258 and df.LENGTH_SLOT_EXTRA[28] == 0
    # Map covers every length and is consistent with bases.
    for length in range(3, 259):
        s = int(df.LENGTH_TO_SLOT[length])
        base = int(df.LENGTH_SLOT_BASE[s])
        extra = int(df.LENGTH_SLOT_EXTRA[s])
        assert base <= length < base + (1 << extra) or (length == 258 and s == 28)
    assert int(df.LENGTH_TO_SLOT[258]) == 28


def test_offset_slot_tables():
    assert df.OFFSET_SLOT_BASE[0] == 1
    assert df.OFFSET_SLOT_BASE[4] == 5 and df.OFFSET_SLOT_EXTRA[4] == 1
    assert df.OFFSET_SLOT_BASE[29] == 24577 and df.OFFSET_SLOT_EXTRA[29] == 13
    # Exhaustive: every offset 1..32768 maps to the right slot.
    offs = np.arange(1, 32769)
    slots = df.offset_to_slot(offs)
    bases = df.OFFSET_SLOT_BASE[slots]
    extras = df.OFFSET_SLOT_EXTRA[slots]
    assert np.all(bases <= offs)
    assert np.all(offs < bases + (1 << extras))


def test_static_codes_match_rfc():
    # RFC 1951 §3.2.6 explicit table (MSB-first values before reversal).
    codes = df.canonical_codes(df.STATIC_LITLEN_LENS)
    assert codes[0] == 0b00110000
    assert codes[143] == 0b10111111
    assert codes[144] == 0b110010000
    assert codes[255] == 0b111111111
    assert codes[256] == 0
    assert codes[279] == 0b0010111
    assert codes[280] == 0b11000000
    assert codes[287] == 0b11000111


def test_reverse_bits():
    assert int(df.reverse_bits(np.array([0b1]), np.array([1]))[0]) == 0b1
    assert int(df.reverse_bits(np.array([0b100]), np.array([3]))[0]) == 0b001
    assert int(df.reverse_bits(np.array([0b0010111]), np.array([7]))[0]) == 0b1110100


def test_compress_bound():
    # Contract: 5 * max(ceil(n/5000), 1) + n (lib/deflate_compress.c:4087-4135)
    assert df.deflate_compress_bound(0) == 5
    assert df.deflate_compress_bound(1) == 6
    assert df.deflate_compress_bound(5000) == 5005
    assert df.deflate_compress_bound(5001) == 5011
    assert df.deflate_compress_bound(10**6) == 5 * 200 + 10**6


def test_zlib_header_roundtrip():
    for level in range(13):
        hdr = zlib_fmt.make_header(level)
        assert zlib_fmt.parse_header(hdr) == 2
        # zlib itself should accept a stream with this header.
        raw = zlib.compress(b"hello world", 6)
        ours = hdr + raw[2:]
        assert zlib.decompress(ours) == b"hello world"


def test_zlib_header_rejects():
    assert zlib_fmt.parse_header(b"\x78") is None  # short
    assert zlib_fmt.parse_header(b"\x79\x9c") is None  # bad fcheck
    assert zlib_fmt.parse_header(b"\x7f\x81") is None  # CM != 8 (fcheck-valid)
    # FDICT set (with valid check bits)
    hdr = (8 << 8) | (7 << 12) | (1 << 5)
    hdr |= 31 - (hdr % 31)
    assert zlib_fmt.parse_header(hdr.to_bytes(2, "big")) is None


def test_gzip_header_fields():
    h = gzip_fmt.make_header(6)
    assert len(h) == 10
    assert h[:3] == b"\x1f\x8b\x08"
    assert h[3] == 0 and h[8] == 0 and h[9] == 255
    assert gzip_fmt.make_header(1)[8] == 4  # XFL fastest
    assert gzip_fmt.make_header(9)[8] == 2  # XFL slowest


def test_gzip_header_parse_flags():
    # gzip header with FNAME + FEXTRA + FHCRC, as real gzip tools emit.
    data = zlib.compressobj(6, zlib.DEFLATED, 31).compress(b"x")
    base = gzip_fmt.make_header(6)
    fname = bytes([base[0], base[1], base[2], gzip_fmt.FNAME]) + base[4:] + b"name\x00"
    payload = b"\x00" * 8  # placeholder footer space
    assert gzip_fmt.parse_header(fname + payload) == len(fname)
    # FRESERVED rejected
    bad = bytes([base[0], base[1], base[2], 0x20]) + base[4:]
    assert gzip_fmt.parse_header(bad + payload) is None
    # truncated FEXTRA rejected
    fx = bytes([base[0], base[1], base[2], gzip_fmt.FEXTRA]) + base[4:] + b"\xff\xff"
    assert gzip_fmt.parse_header(fx + payload) is None
