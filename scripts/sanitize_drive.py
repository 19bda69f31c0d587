"""Sanitizer drive for the native codec: jax-free on purpose.

Runs under LD_PRELOAD=libasan with a -fsanitize=address,undefined build
of native/ldtpu_native.cpp (scripts/run_tests.sh `sanitize` mode — the
role of the reference's asan/ubsan harness modes,
/root/reference/scripts/run_tests.sh:262-307).  ASAN's C++ exception
interceptors break under the jax/XLA import, so this driver exercises
the native ABI directly with ctypes + zlib as the oracle:

- round-trips at every level over random/text/run/record payloads,
- decompression of zlib-produced streams,
- corrupt streams (bit flips, truncations) must return BAD_DATA without
  touching memory out of bounds,
- checksums vs zlib.
"""

import ctypes
import os
import sys
import zlib

import numpy as np

SO = os.environ.get("LIBDEFLATE_TPU_NATIVE_SO")
if not SO:
    print("set LIBDEFLATE_TPU_NATIVE_SO", file=sys.stderr)
    sys.exit(2)

lib = ctypes.CDLL(SO)
lib.ld_deflate_compress.restype = ctypes.c_size_t
lib.ld_deflate_compress.argtypes = [
    ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t,
    ctypes.c_char_p, ctypes.c_size_t]
lib.ld_deflate_decompress.restype = ctypes.c_int
lib.ld_crc32.restype = ctypes.c_uint32
lib.ld_crc32.argtypes = [ctypes.c_uint32, ctypes.c_char_p, ctypes.c_size_t]
lib.ld_adler32.restype = ctypes.c_uint32
lib.ld_adler32.argtypes = [ctypes.c_uint32, ctypes.c_char_p, ctypes.c_size_t]


def gen(rng, n):
    kind = int(rng.integers(0, 5))
    if kind == 0:
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 1:
        return (open("/root/reference/README.md", "rb").read() * 40)[:n]
    if kind == 2:
        return bytes(n)
    if kind == 3:
        unit = rng.integers(0, 256, max(int(rng.integers(1, 65)), 1),
                            dtype=np.uint8).tobytes()
        return (unit * (n // max(len(unit), 1) + 1))[:n]
    return rng.choice(
        np.frombuffer(b"abcdefgh \n", np.uint8), size=n).tobytes()


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    rng = np.random.default_rng(0xA5)
    out = ctypes.create_string_buffer((1 << 20) + 65536)
    dec = ctypes.create_string_buffer(1 << 20)
    ai, ao = ctypes.c_size_t(), ctypes.c_size_t()

    for it in range(iters):
        n = int(rng.integers(0, 1 << 17))
        raw = gen(rng, n)
        lvl = int(rng.integers(0, 13))

        # round-trip
        m = lib.ld_deflate_compress(lvl, raw, len(raw), out, len(out))
        assert m > 0 or n == 0, (it, lvl)
        comp = out.raw[:m]
        r = lib.ld_deflate_decompress(comp, m, dec, len(raw), 1,
                                      ctypes.byref(ai), ctypes.byref(ao))
        assert r == 0 and dec.raw[: len(raw)] == raw, (it, lvl, r)
        assert zlib.decompressobj(-15).decompress(comp) == raw

        # zlib-produced stream
        z = zlib.compressobj(min(lvl, 9), zlib.DEFLATED, -15)
        zc = z.compress(raw) + z.flush()
        r = lib.ld_deflate_decompress(zc, len(zc), dec, len(raw), 1,
                                      ctypes.byref(ai), ctypes.byref(ao))
        assert r == 0 and dec.raw[: len(raw)] == raw

        # corrupt: random bit flips / truncation must not crash
        if m > 8:
            bad = bytearray(comp)
            for _ in range(int(rng.integers(1, 4))):
                bad[int(rng.integers(0, len(bad)))] ^= 1 << int(
                    rng.integers(0, 8))
            lib.ld_deflate_decompress(bytes(bad), len(bad), dec, len(raw),
                                      1, ctypes.byref(ai), ctypes.byref(ao))
            cut = int(rng.integers(0, m))
            lib.ld_deflate_decompress(comp[:cut], cut, dec, len(raw), 1,
                                      ctypes.byref(ai), ctypes.byref(ao))

        # checksums
        assert lib.ld_crc32(0, raw, len(raw)) == zlib.crc32(raw)
        assert lib.ld_adler32(1, raw, len(raw)) == zlib.adler32(raw)
        if (it + 1) % 20 == 0:
            print(f"  {it + 1}/{iters} sanitize trials OK", flush=True)

    print(f"sanitize drive OK: {iters} trials")


if __name__ == "__main__":
    main()
