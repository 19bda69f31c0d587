"""Guard-page buffer tests for the native codec.

The native decoder's fastloop does unconditional splash overcopies (up to
32 bytes past the live write cursor) and word-at-a-time refills — exactly
the kind of code whose off-by-ones normal tests cannot see.  The reference
polices this with an mmap allocator that flanks every test buffer with
unmapped pages so any overread/overwrite segfaults immediately
(programs/test_util.c:74-125).  This file is that allocator for our native
codec: buffers are placed flush against a PROT_NONE page on one end, and
every native entry point is run against both the end-flush and start-flush
placements.

A violation aborts the test process with SIGSEGV — loud by design.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import sys
import zlib

import numpy as np
import pytest

from libdeflate_tpu import native_backend

pytestmark = [
    pytest.mark.skipif(sys.platform != "linux", reason="mmap/mprotect test"),
    pytest.mark.skipif(not native_backend.available(), reason="no native lib"),
]

_PAGE = os.sysconf("SC_PAGESIZE")
_libc = ctypes.CDLL(ctypes.util.find_library("c"), use_errno=True)
_libc.mmap.restype = ctypes.c_void_p
_libc.mmap.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
                       ctypes.c_int, ctypes.c_int, ctypes.c_long]
_libc.munmap.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
_libc.mprotect.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]

_PROT_NONE, _PROT_RW = 0, 3
_MAP_PRIVATE_ANON = 0x02 | 0x20


class GuardedBuffer:
    """A byte buffer flanked by unmapped pages (reference test_util.c:74).

    ``end_flush=True`` puts the buffer's last byte immediately before the
    trailing PROT_NONE page (catches overruns); ``end_flush=False`` puts
    its first byte immediately after the leading one (catches underruns).
    """

    def __init__(self, nbytes: int, end_flush: bool = True):
        self.nbytes = nbytes
        npages = (nbytes + _PAGE - 1) // _PAGE
        self.total = (npages + 2) * _PAGE
        base = _libc.mmap(None, self.total, _PROT_RW, _MAP_PRIVATE_ANON, -1, 0)
        if base in (None, ctypes.c_void_p(-1).value):
            raise OSError("mmap failed")
        self.base = base
        assert _libc.mprotect(base, _PAGE, _PROT_NONE) == 0
        assert _libc.mprotect(base + (npages + 1) * _PAGE, _PAGE, _PROT_NONE) == 0
        if end_flush:
            self.ptr = base + (npages + 1) * _PAGE - nbytes
        else:
            self.ptr = base + _PAGE

    def write(self, data: bytes) -> None:
        assert len(data) <= self.nbytes
        ctypes.memmove(self.ptr, data, len(data))

    def read(self, n: int | None = None) -> bytes:
        return ctypes.string_at(self.ptr, self.nbytes if n is None else n)

    def close(self) -> None:
        if self.base is not None:
            _libc.munmap(self.base, self.total)
            self.base = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _corpus():
    rng = np.random.default_rng(7)
    text = (b"the quick brown fox jumps over the lazy dog. " * 300)
    cases = [
        b"",
        b"a",
        text,
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),          # random
        bytes(rng.integers(0, 4, 65536, dtype=np.uint8)),            # skewed
        text * 8,                                                    # >64 KiB
        bytes(8192),                                                 # zeros/RLE
    ]
    return cases


@pytest.mark.parametrize("end_flush", [True, False], ids=["end", "start"])
def test_native_decompress_guarded(end_flush):
    """Every write of the native decoder stays inside [out, out+avail)."""
    lib = native_backend.get_lib()
    for data in _corpus():
        for level in (1, 6, 12):
            comp = zlib.compress(data, min(level, 9))[2:-4]
            for extra in (0, 1, 7, 271, 4096):  # slack beyond exact size
                cap = len(data) + extra
                with GuardedBuffer(max(cap, 1), end_flush) as gout, \
                        GuardedBuffer(max(len(comp), 1), end_flush) as gin:
                    gin.write(comp)
                    ain = ctypes.c_size_t(0)
                    aout = ctypes.c_size_t(0)
                    res = lib.ld_deflate_decompress(
                        ctypes.cast(gin.ptr, ctypes.c_char_p), len(comp),
                        ctypes.c_void_p(gout.ptr), cap,
                        1 if extra == 0 else 0,
                        ctypes.byref(ain), ctypes.byref(aout),
                    )
                    assert res == 0, (level, len(data), extra)
                    assert aout.value == len(data)
                    assert gout.read(len(data)) == data


@pytest.mark.parametrize("end_flush", [True, False], ids=["end", "start"])
def test_native_decompress_guarded_insufficient_space(end_flush):
    """Undersized output: must return INSUFFICIENT_SPACE without touching
    a byte past the cap (the guard page is the proof)."""
    lib = native_backend.get_lib()
    data = (b"abcd" * 5000) + bytes(np.random.default_rng(3).integers(
        0, 256, 5000, dtype=np.uint8))
    comp = zlib.compress(data, 6)[2:-4]
    for cap in (0, 1, 100, len(data) - 1):
        with GuardedBuffer(max(cap, 1), end_flush) as gout:
            ain = ctypes.c_size_t(0)
            aout = ctypes.c_size_t(0)
            res = lib.ld_deflate_decompress(
                comp, len(comp), ctypes.c_void_p(gout.ptr), cap,
                0, ctypes.byref(ain), ctypes.byref(aout),
            )
            assert res != 0  # INSUFFICIENT_SPACE (or BAD_DATA), never success


@pytest.mark.parametrize("end_flush", [True, False], ids=["end", "start"])
def test_native_decompress_guarded_truncated_input(end_flush):
    """Truncated/corrupt input against guarded buffers: no overread."""
    lib = native_backend.get_lib()
    data = b"guard page overread probe " * 2000
    comp = zlib.compress(data, 6)[2:-4]
    rng = np.random.default_rng(11)
    cuts = sorted({1, 2, 5, len(comp) // 2, len(comp) - 1} |
                  set(int(x) for x in rng.integers(1, len(comp), 24)))
    for cut in cuts:
        frag = comp[:cut]
        with GuardedBuffer(len(data) + 64, end_flush) as gout, \
                GuardedBuffer(cut, end_flush) as gin:
            gin.write(frag)
            ain = ctypes.c_size_t(0)
            aout = ctypes.c_size_t(0)
            lib.ld_deflate_decompress(
                ctypes.cast(gin.ptr, ctypes.c_char_p), cut,
                ctypes.c_void_p(gout.ptr), len(data) + 64,
                0, ctypes.byref(ain), ctypes.byref(aout),
            )  # result code is free; not crashing is the assertion


@pytest.mark.parametrize("end_flush", [True, False], ids=["end", "start"])
def test_native_compress_guarded(end_flush):
    """Compressor writes stay inside the caller's buffer at every level,
    including barely-sufficient output capacities."""
    import libdeflate_tpu as ld

    lib = native_backend.get_lib()
    for data in _corpus():
        for level in (0, 1, 6, 12):
            bound = ld.deflate_compress_bound(len(data))
            with GuardedBuffer(bound, end_flush) as gout, \
                    GuardedBuffer(max(len(data), 1), end_flush) as gin:
                gin.write(data)
                n = lib.ld_deflate_compress(
                    level, ctypes.cast(gin.ptr, ctypes.c_char_p), len(data),
                    ctypes.c_void_p(gout.ptr), bound,
                )
                assert 0 < n <= bound
                comp = gout.read(int(n))
                assert zlib.decompress(comp, -15) == data
            # exact-fit capacity: give precisely n bytes; must still fit
            with GuardedBuffer(int(n), end_flush) as gtight:
                m = lib.ld_deflate_compress(
                    level, data, len(data), ctypes.c_void_p(gtight.ptr), int(n))
                if m:  # 0 = "doesn't fit" is acceptable; success must fit
                    assert m <= n
                    assert zlib.decompress(gtight.read(int(m)), -15) == data


@pytest.mark.parametrize("end_flush", [True, False], ids=["end", "start"])
def test_native_checksums_guarded(end_flush):
    """CRC/Adler kernels read exactly [buf, buf+len) at any alignment."""
    lib = native_backend.get_lib()
    rng = np.random.default_rng(5)
    payload = bytes(rng.integers(0, 256, 3 * _PAGE + 37, dtype=np.uint8))
    for n in (0, 1, 7, 63, 64, 65, 4095, 4096, len(payload)):
        for misalign in (0, 1, 3, 13):
            if n + misalign > len(payload):
                continue
            data = payload[misalign: misalign + n]
            with GuardedBuffer(max(n, 1), end_flush) as g:
                g.write(data)
                p = ctypes.cast(g.ptr, ctypes.c_char_p)
                assert lib.ld_crc32(0, p, n) == (zlib.crc32(data) & 0xFFFFFFFF)
                assert lib.ld_adler32(1, p, n) == (zlib.adler32(data) & 0xFFFFFFFF)
