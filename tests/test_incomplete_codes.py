"""End-to-end incomplete-Huffman-code stream tests.

DEFLATE decoders must accept the specific *incomplete* code shapes zlib
accepts — an empty offset code, and codes with a single length-1 codeword —
and reject the rest.  The reference proves this with hand-built bitstreams
run through both its own decoder and zlib
(programs/test_incomplete_codes.c); this file does the same through all
THREE of our decoders (host Python, native C++, jitted device decoder)
with zlib as the oracle on every stream.

The streams are authored by a general dynamic-header crafter (canonical
codes from explicit length arrays + RLE'd precode), not hardcoded bit
dumps, so new edge shapes are one call away.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

import libdeflate_tpu as ld
from libdeflate_tpu import native_backend
from libdeflate_tpu.compress.emit import BitWriter
from libdeflate_tpu.decompress.host import deflate_decompress
from libdeflate_tpu.formats.deflate import PRECODE_LENS_PERMUTATION as PRECODE_PERM
from libdeflate_tpu.huffman.build import package_merge_lengths


# ---------------------------------------------------------------------------
# Stream crafting
# ---------------------------------------------------------------------------
def canonical_codes(lens: np.ndarray) -> np.ndarray:
    """LSB-first (bit-reversed) canonical codewords per RFC 1951 §3.2.2."""
    max_len = int(lens.max()) if lens.size else 0
    bl_count = np.bincount(lens, minlength=max_len + 1)
    bl_count[0] = 0
    codes = np.zeros_like(lens)
    code = 0
    next_code = [0] * (max_len + 1)
    for l in range(1, max_len + 1):
        code = (code + int(bl_count[l - 1])) << 1
        next_code[l] = code
    for sym in range(lens.size):
        l = int(lens[sym])
        if l:
            c = next_code[l]
            next_code[l] += 1
            # bit-reverse to LSB-first emission order
            codes[sym] = int(f"{c:0{l}b}"[::-1], 2)
    return codes


def rle_lens(all_lens: list[int]):
    """(presym, extra_bits, extra_val) items for a lens array (RFC 1951
    §3.2.7 repeat coding: 16=copy-prev, 17/18=zero runs)."""
    items = []
    i = 0
    n = len(all_lens)
    while i < n:
        v = all_lens[i]
        run = 1
        while i + run < n and all_lens[i + run] == v:
            run += 1
        if v == 0:
            r = run
            while r >= 11:
                t = min(r, 138)
                items.append((18, 7, t - 11))
                r -= t
            if r >= 3:
                items.append((17, 3, r - 3))
                r = 0
            items.extend((0, 0, 0) for _ in range(r))
        else:
            items.append((v, 0, 0))
            r = run - 1
            while r >= 3:
                t = min(r, 6)
                items.append((16, 2, t - 3))
                r -= t
            items.extend((v, 0, 0) for _ in range(r))
        i += run
    return items


def craft_dynamic_stream(litlen_lens: dict[int, int],
                         offset_lens: dict[int, int],
                         body,
                         bfinal: bool = True) -> bytes:
    """Author a complete dynamic-Huffman DEFLATE block.

    ``litlen_lens`` / ``offset_lens`` map symbol -> codeword length (all
    other lengths 0 — incomplete codes welcome, that's the point).
    ``body`` is a list of ("lit", sym) / ("match", len_sym, len_extra_bits,
    len_extra_val, off_sym, off_extra_bits, off_extra_val) / ("eob",)
    items emitted with the crafted codes.
    """
    num_litlen = max(257, max(litlen_lens) + 1 if litlen_lens else 0)
    num_offset = max(1, max(offset_lens) + 1 if offset_lens else 0)
    ll = np.zeros(num_litlen, np.int64)
    for s, l in litlen_lens.items():
        ll[s] = l
    of = np.zeros(num_offset, np.int64)
    for s, l in offset_lens.items():
        of[s] = l
    ll_codes = canonical_codes(ll)
    of_codes = canonical_codes(of)

    items = rle_lens(list(ll) + list(of))
    pre_freq = np.zeros(19, np.int64)
    for sym, _, _ in items:
        pre_freq[sym] += 1
    pre_lens = package_merge_lengths(pre_freq, 7)
    pre_codes = canonical_codes(pre_lens)
    num_explicit = 19
    while num_explicit > 4 and pre_lens[PRECODE_PERM[num_explicit - 1]] == 0:
        num_explicit -= 1

    w = BitWriter()
    w.add(1 if bfinal else 0, 1)
    w.add(2, 2)                       # BTYPE: dynamic
    w.add(num_litlen - 257, 5)
    w.add(num_offset - 1, 5)
    w.add(num_explicit - 4, 4)
    for i in range(num_explicit):
        w.add(int(pre_lens[PRECODE_PERM[i]]), 3)
    for sym, xbits, xval in items:
        w.add(int(pre_codes[sym]), int(pre_lens[sym]))
        if xbits:
            w.add(xval, xbits)
    for item in body:
        if item[0] == "lit":
            s = item[1]
            w.add(int(ll_codes[s]), int(ll[s]))
        elif item[0] == "eob":
            w.add(int(ll_codes[256]), int(ll[256]))
        else:
            _, ls, lxb, lxv, os_, oxb, oxv = item
            w.add(int(ll_codes[ls]), int(ll[ls]))
            if lxb:
                w.add(lxv, lxb)
            w.add(int(of_codes[os_]), int(of[os_]))
            if oxb:
                w.add(oxv, oxb)
    w.align_to_byte()
    return bytes(w.out)


# ---------------------------------------------------------------------------
# Decoder matrix
# ---------------------------------------------------------------------------
def decode_all(stream: bytes, out_cap: int = 256):
    """Run a stream through zlib + all three decoders.

    Returns dict name -> (ok, payload) where ok means SUCCESS/stream-end.
    """
    results = {}
    try:
        d = zlib.decompressobj(-15)
        out = d.decompress(stream, out_cap)
        results["zlib"] = (d.eof, out)
    except zlib.error:
        results["zlib"] = (False, None)

    res, out, _, _ = deflate_decompress(stream, out_cap, known_size=False)
    results["host"] = (res == ld.SUCCESS, out)

    if native_backend.available():
        res, out, _, _ = native_backend.deflate_decompress(
            stream, out_cap, known_size=False
        )
        results["native"] = (res == 0, out)

    import jax.numpy as jnp

    from libdeflate_tpu.decompress import tpu as dtpu

    buf = np.zeros(2048, np.uint8)
    buf[: len(stream)] = np.frombuffer(stream, np.uint8)
    outs, olens, _, codes = dtpu.decompress_chunks(
        jnp.asarray(buf[None, :]), jnp.asarray([len(stream)], np.int32),
        out_cap,
    )
    ok = int(codes[0]) == 0
    payload = bytes(np.asarray(outs[0][: int(olens[0])])) if ok else None
    results["device"] = (ok, payload)
    return results


def assert_all_accept(stream: bytes, expected: bytes):
    res = decode_all(stream, max(len(expected), 1) + 32)
    assert res["zlib"] == (True, expected), "oracle disagrees with the test"
    for name, (ok, out) in res.items():
        assert ok, f"{name} rejected a zlib-accepted incomplete-code stream"
        assert out == expected, f"{name} payload mismatch"


def assert_all_reject(stream: bytes):
    res = decode_all(stream)
    assert res["zlib"][0] is False, "oracle accepts — bad test premise"
    for name, (ok, _) in res.items():
        assert not ok, f"{name} accepted a stream zlib rejects"


# ---------------------------------------------------------------------------
# The zlib-compatible acceptance cases (programs/test_incomplete_codes.c)
# ---------------------------------------------------------------------------
class TestIncompleteCodesAccepted:
    def test_empty_offset_code(self):
        # literals only; offset code entirely absent
        s = craft_dynamic_stream(
            {ord("A"): 1, ord("B"): 2, 256: 2},
            {},
            [("lit", ord("A")), ("lit", ord("B")), ("lit", ord("A")),
             ("lit", ord("A")), ("eob",)],
        )
        assert_all_accept(s, b"ABAA")

    def test_singleton_litrunlen_code(self):
        # exactly one litlen codeword (EOB), length 1, empty block
        s = craft_dynamic_stream({256: 1}, {}, [("eob",)])
        assert_all_accept(s, b"")

    def test_singleton_offset_code(self):
        # one offset codeword (sym 0 -> offset 1): lit 255 then len-3 match
        s = craft_dynamic_stream(
            {255: 1, 256: 2, 257: 2},
            {0: 1},
            [("lit", 255), ("match", 257, 0, 0, 0, 0, 0), ("eob",)],
        )
        assert_all_accept(s, bytes([255, 255, 255, 255]))

    def test_singleton_offset_code_notsymzero(self):
        # the single offset codeword is sym 1 (offset 2), not sym 0
        s = craft_dynamic_stream(
            {254: 1, 255: 2, 256: 3, 257: 3},
            {1: 1},
            [("lit", 254), ("lit", 255),
             ("match", 257, 0, 0, 1, 0, 0), ("eob",)],
        )
        assert_all_accept(s, bytes([254, 255, 254, 255, 254]))

    def test_complete_singleton_pair_still_works(self):
        # sanity: the complete 2-codeword shape decodes identically
        s = craft_dynamic_stream(
            {ord("x"): 1, 256: 1}, {},
            [("lit", ord("x")), ("lit", ord("x")), ("eob",)],
        )
        assert_all_accept(s, b"xx")


# ---------------------------------------------------------------------------
# Rejection cases: incomplete shapes zlib does NOT allow
# ---------------------------------------------------------------------------
class TestIncompleteCodesRejected:
    def test_two_codeword_incomplete_litlen(self):
        # two len-2 litlen codewords leave half the code space undefined —
        # zlib rejects the header outright
        s = craft_dynamic_stream(
            {ord("A"): 2, 256: 2}, {},
            [("lit", ord("A")), ("eob",)],
        )
        assert_all_reject(s)

    def test_empty_litlen_code(self):
        # a block whose litlen code has NO codewords can't even end
        s = craft_dynamic_stream({}, {0: 1}, [])
        assert_all_reject(s)


# ---------------------------------------------------------------------------
# Documented laxness: reference accepts MORE than zlib for incomplete codes
# ---------------------------------------------------------------------------
class TestDocumentedLaxness:
    def test_undefined_codeword_of_singleton_used(self):
        """The singleton-EOB header followed by the undefined codeword '1'.

        zlib rejects this (its table marks the unused half of the codespace
        as an ERROR symbol); the reference instead maps an allowed
        incomplete code to a complete one by giving the single symbol both
        codewords '0' and '1' (deflate_decompress.c:829-850), so it decodes
        '1' as the same symbol.  We match the reference: all three of our
        decoders must ACCEPT (yielding the empty payload via EOB) while
        zlib rejects — this is one of the two documented divergence cases
        the fuzzer whitelist covers.
        """
        s = _singleton_with_undefined_codeword()
        res = decode_all(s, 32)
        assert res["zlib"][0] is False, "zlib unexpectedly accepts"
        for name, (ok, out) in res.items():
            if name == "zlib":
                continue
            assert ok, f"{name} rejected the documented-laxness stream"
            assert out == b"", f"{name} payload mismatch"


def _singleton_with_undefined_codeword() -> bytes:
    """The singleton-EOB header followed by the undefined codeword '1'."""
    w = BitWriter()
    w.add(1, 1)
    w.add(2, 2)
    w.add(0, 5)          # 257 litlen syms
    w.add(0, 5)          # 1 offset sym
    # precode: presym_18 len 1, presym_0 len 2, presym_1 len 2
    pre_lens = np.zeros(19, np.int64)
    pre_lens[18] = 1
    pre_lens[0] = 2
    pre_lens[1] = 2
    pre_codes = canonical_codes(pre_lens)
    num_explicit = 19
    while num_explicit > 4 and pre_lens[PRECODE_PERM[num_explicit - 1]] == 0:
        num_explicit -= 1
    w.add(num_explicit - 4, 4)
    for i in range(num_explicit):
        w.add(int(pre_lens[PRECODE_PERM[i]]), 3)
    # lens: 256 zeros (two presym_18 runs), then len-1 at 256, len-0 at 257
    for run in (138, 118):
        w.add(int(pre_codes[18]), 1)
        w.add(run - 11, 7)
    w.add(int(pre_codes[1]), 2)     # lens[256] = 1
    w.add(int(pre_codes[0]), 2)     # lens[257] = 0
    w.add(1, 1)                      # the UNDEFINED codeword
    w.align_to_byte()
    return bytes(w.out)
