#!/usr/bin/env python
"""Randomized soak of the device compress engines on REAL TPU hardware.

The pytest suite runs on a forced CPU backend (deterministic, no chip
needed); this script re-validates the same contracts against the actual
compiled TPU kernels: every engine tier x payload class x odd lengths,
bit-exact through the zlib oracle.

Usage:  python scripts/tpu_soak.py [--batches N] [--seed S]
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gen_payload(rng, kind: int, ln: int) -> bytes:
    if kind == 0:
        return rng.integers(0, 256, ln, np.uint8).tobytes()
    if kind == 1:
        period = int(rng.integers(1, 500))
        return (rng.integers(0, 256, period, np.uint8).tobytes() * (ln // period + 1))[:ln]
    if kind == 2:
        return bytes(ln)
    if kind == 3:
        words = [b"alpha", b"bravo", b"charlie", b" ", b"\n", b"the", b"qux"]
        out = bytearray()
        while len(out) < ln:
            out += words[int(rng.integers(0, len(words)))]
        return bytes(out[:ln])
    return rng.integers(97, 107, ln, np.uint8).tobytes()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0xF00D)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libdeflate_tpu.compress.tpu_dynamic import (
        compress_chunks_dynamic,
        compress_chunks_dynamic3,
    )
    from libdeflate_tpu.compress.tpu_pipeline import (
        compress_chunks_static,
        device_stream_to_bytes,
    )

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(args.seed)
    N = 1 << 20
    B = 4
    engines = (compress_chunks_static, compress_chunks_dynamic, compress_chunks_dynamic3)

    total = 0
    for batch in range(args.batches):
        payloads = []
        for k in range(B):
            ln = int(rng.integers(1, N + 1)) if rng.random() < 0.5 else N
            payloads.append(gen_payload(rng, (batch * B + k) % 5, ln))
        bufs = np.zeros((B, N), np.uint8)
        lens = np.zeros(B, np.int32)
        for i, p in enumerate(payloads):
            bufs[i, : len(p)] = np.frombuffer(p, np.uint8)
            lens[i] = len(p)
        fn = engines[batch % len(engines)]
        w, t = fn(
            jnp.asarray(bufs), jnp.asarray(lens),
            jnp.asarray([i % 2 == 0 for i in range(B)]),
        )
        w, t = np.asarray(w), np.asarray(t)
        for i, p in enumerate(payloads):
            s = device_stream_to_bytes(w[i], t[i])
            assert zlib.decompressobj(-15).decompress(s) == p, (batch, i, len(p))
            total += 1
        print(f"  batch {batch + 1}/{args.batches} OK")
    print(f"TPU soak OK: {total} chunks across {len(engines)} engines vs zlib")


if __name__ == "__main__":
    main()
