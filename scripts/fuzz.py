#!/usr/bin/env python
"""Randomized fuzz harness — role parity with scripts/libFuzzer/ in the
reference (fuzz.c targets deflate_decompress, zlib_decompress,
gzip_decompress, deflate_compress; driver scripts/libFuzzer/fuzz.sh).

Four targets, each run for --iters trials per engine:

  decompress targets: adversarial bytes -> must return a sane result code
      without crashing or over-writing, for BOTH the Python host decoder
      and the native C++ decoder, and the two must agree with the zlib
      oracle on accept/reject.
  compress target: random (level, data) -> compress -> decompress ->
      bit-exact round-trip, and compressed size <= deflate_compress_bound.

Also drives the DEVICE compressors (static + dynamic) on a CPU backend
every --device-every trials.

Usage:  python scripts/fuzz.py [--iters N] [--seed S] [--device-every K]
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# The env var alone is not enough under the axon terminal plugin, whose
# sitecustomize forces jax_platforms programmatically at interpreter start
# — with the relay down, any device touch then hangs forever.  Override it
# back the way tests/conftest.py does.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover
    pass

import numpy as np

import libdeflate_tpu as ld
from libdeflate_tpu import native_backend
from libdeflate_tpu.formats.deflate import deflate_compress_bound


def gen_data(rng: np.random.Generator, max_len: int = 1 << 16) -> bytes:
    # occasionally exceed SOFT_MAX_BLOCK_LENGTH so multi-block paths (block
    # splitting, DP block caps) get fuzzed too — but never escalate past a
    # caller's tighter cap (the device target uses fixed 8 KiB shapes)
    if max_len >= (1 << 16) and int(rng.integers(0, 16)) == 0:
        max_len = 1 << 20
    n = int(rng.integers(0, max_len))
    kind = int(rng.integers(0, 5))
    if kind == 0:
        return rng.integers(0, 256, n, np.uint8).tobytes()
    if kind == 1:
        period = int(rng.integers(1, 300))
        return (rng.integers(0, 256, period, np.uint8).tobytes() * (n // period + 1))[:n]
    if kind == 2:
        return bytes(n)  # zeros
    if kind == 3:
        words = [b"alpha", b"beta", b"gamma", b"delta", b" ", b"\n", b"the"]
        out = bytearray()
        while len(out) < n:
            out += words[int(rng.integers(0, len(words)))]
        return bytes(out[:n])
    return rng.integers(97, 105, n, np.uint8).tobytes()


def fuzz_decompress(rng: np.random.Generator) -> None:
    """Garbage (and mutated-valid) streams must fail cleanly and agree
    with zlib on accept/reject."""
    if rng.random() < 0.5:
        blob = rng.integers(0, 256, int(rng.integers(1, 4096)), np.uint8).tobytes()
    else:
        blob = bytearray(zlib.compress(gen_data(rng, 4096), int(rng.integers(0, 10))))
        for _ in range(int(rng.integers(1, 8))):
            blob[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))
        blob = bytes(blob[2:-4])  # raw deflate body, corrupted

    out_cap = 1 << 16
    d = ld.Decompressor()
    res, out, _, _ = d.deflate_decompress(blob, out_cap, known_size=False)
    assert res in (ld.SUCCESS, ld.BAD_DATA, ld.SHORT_OUTPUT, ld.INSUFFICIENT_SPACE)
    try:
        oracle = zlib.decompressobj(-15).decompress(blob, out_cap)
        z_ok = True
    except zlib.error:
        z_ok = False
        oracle = None
    if res == ld.SUCCESS:
        # Accepting a stream zlib rejects outright is a red flag: the
        # acceptance rules (incl. the two documented incomplete-code
        # laxness cases) are modeled on zlib's own, so zlib accepts every
        # stream we do (cf. programs/test_incomplete_codes.c, which proves
        # zlib-compatibility of the lax cases).
        assert z_ok, f"we SUCCESS-decode, zlib rejects: {blob.hex()}"
        m = min(len(out), len(oracle))
        assert out[:m] == oracle[:m], f"prefix mismatch: {blob.hex()}"
    # wrappers on raw garbage
    for fn in (d.zlib_decompress, d.gzip_decompress):
        r2, *_ = fn(blob, out_cap, known_size=False)
        assert r2 in (ld.SUCCESS, ld.BAD_DATA, ld.SHORT_OUTPUT, ld.INSUFFICIENT_SPACE)


def fuzz_compress(rng: np.random.Generator) -> None:
    """(level, data) -> compress -> decompress -> identical, within bound
    (mirrors scripts/libFuzzer/deflate_compress/fuzz.c:39-96)."""
    data = gen_data(rng)
    level = int(rng.integers(0, 13))
    c = ld.Compressor(level)
    fmt = ("deflate", "zlib", "gzip")[int(rng.integers(0, 3))]
    blob = c.compress(data, fmt)
    assert len(blob) <= deflate_compress_bound(len(data)) + 18
    if fmt == "deflate":
        assert zlib.decompressobj(-15).decompress(blob) == data
    elif fmt == "zlib":
        assert zlib.decompress(blob) == data
    else:
        assert zlib.decompress(blob, 31) == data
    res, out, _, _ = ld.Decompressor().decompress(blob, len(data), fmt, known_size=True)
    assert res == ld.SUCCESS and out == data


def fuzz_device(rng: np.random.Generator) -> None:
    import jax.numpy as jnp

    from libdeflate_tpu.compress.tpu_dynamic import compress_chunks_dynamic
    from libdeflate_tpu.compress.tpu_pipeline import (
        compress_chunks_static,
        device_stream_to_bytes,
    )

    n = 8192
    data = gen_data(rng, n)
    buf = np.zeros((1, n), np.uint8)
    buf[0, : len(data)] = np.frombuffer(data, np.uint8)
    for fn in (compress_chunks_static, compress_chunks_dynamic):
        w, t = fn(
            jnp.asarray(buf),
            jnp.asarray([len(data)], np.int32),
            jnp.asarray([True]),
        )
        stream = device_stream_to_bytes(np.asarray(w)[0], int(np.asarray(t)[0]))
        assert zlib.decompressobj(-15).decompress(stream) == data

    # the scalar-core Pallas decoder on a zlib-produced stream (interpret
    # on CPU backends; compiled on a chip) + a corrupt variant
    from libdeflate_tpu.decompress.pallas_decode import (
        decompress_chunks_pallas_host,
    )
    import jax

    interp = jax.default_backend() == "cpu"
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    stream = c.compress(data) + c.flush()
    outs, status = decompress_chunks_pallas_host(
        [stream], [len(data)], interpret=interp
    )
    assert status[0] == 0 and outs[0] == data
    if len(stream) > 8:
        bad = bytearray(stream)
        bad[int(rng.integers(0, len(bad)))] ^= 1 << int(rng.integers(0, 8))
        decompress_chunks_pallas_host(
            [bytes(bad)], [len(data)], interpret=interp
        )  # must terminate with a status, never hang or crash


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device-every", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    assert native_backend.available(), "native codec must build"
    for i in range(args.iters):
        fuzz_decompress(rng)
        fuzz_compress(rng)
        if args.device_every and i % args.device_every == 0:
            fuzz_device(rng)
        if (i + 1) % 50 == 0:
            print(f"  {i + 1}/{args.iters} trials OK")
    print(f"fuzz OK: {args.iters} trials x 3 targets (seed {args.seed})")


if __name__ == "__main__":
    main()
