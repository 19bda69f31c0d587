"""On-chip checksum profiling with the relay's ~25 ms/dispatch floor
amortized by an in-jit fori_loop (K iterations with per-iteration inits so
XLA cannot CSE them) and scalarized outputs (no big d2h in the timing).

Run from the repo root: python scripts/exp_crc_profile.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from libdeflate_tpu.ops import checksums_jax as cj
from libdeflate_tpu.ops.crc32_math import CRC_BLOCK

B, N = 64, 1 << 22  # 256 MiB resident
K = 6               # in-jit repeats per dispatch


def timeit(fn, *args, reps=3):
    np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def krepeat(per_iter):
    """jit a fori_loop of K data-passes, xor-folding an i32 scalar."""
    def run(bufs, lengths):
        def body(i, acc):
            return acc ^ per_iter(bufs, lengths, i)
        return jax.lax.fori_loop(0, K, body, jnp.uint32(0))
    return jax.jit(run)


def main():
    rng = np.random.default_rng(5)
    bufs_np = rng.integers(0, 256, size=(B, N), dtype=np.uint8)
    bufs = jax.device_put(jnp.asarray(bufs_np))
    lengths = jax.device_put(jnp.full(B, N, jnp.int32))
    nbytes = K * B * N

    print(f"B={B} x {N>>20} MiB, K={K} in-jit passes -> "
          f"{nbytes>>30} GiB per dispatch", flush=True)

    floor = timeit(jax.jit(lambda x: x * 2), jnp.ones(128, jnp.int32))
    print(f"dispatch floor {floor*1e3:.1f} ms", flush=True)

    def adler_iter(bufs, lengths, i):
        init = jnp.full(B, 1, jnp.uint32) + i.astype(jnp.uint32)
        out = jax.vmap(cj.adler32_fixed)(bufs, lengths, init)
        return jax.lax.reduce_xor(out, (0,))

    def crc_iter(bufs, lengths, i):
        init = jnp.zeros(B, jnp.uint32) + i.astype(jnp.uint32)
        out = jax.vmap(cj.crc32_fixed)(bufs, lengths, init)
        return jax.lax.reduce_xor(out, (0,))

    dt = timeit(krepeat(adler_iter), bufs, lengths)
    print(f"Adler32  {nbytes/dt/1e9:8.2f} GB/s", flush=True)
    dt = timeit(krepeat(crc_iter), bufs, lengths)
    print(f"CRC-32   {nbytes/dt/1e9:8.2f} GB/s", flush=True)

    # ---- CRC sub-stages (scalarized, K-repeated) ----
    def planes_of(buf):
        nb = buf.shape[0] // CRC_BLOCK
        w32 = jax.lax.bitcast_convert_type(
            buf.reshape(nb, CRC_BLOCK // 4, 4), jnp.uint32)
        planes = jnp.stack(
            [(w32 >> jnp.uint32(j)) & jnp.uint32(0x01010101)
             for j in range(8)], axis=-1)
        lhs = jax.lax.bitcast_convert_type(planes, jnp.uint8)
        return lhs.reshape(nb, CRC_BLOCK * 8).astype(jnp.int8)

    def planes_iter(bufs, lengths, i):
        lhs = jax.vmap(planes_of)(bufs + i.astype(jnp.uint8))
        return jnp.sum(lhs.astype(jnp.int32)).astype(jnp.uint32)

    def mm_iter(bufs, lengths, i):
        lhs = jax.vmap(planes_of)(bufs + i.astype(jnp.uint8))
        s = jax.vmap(lambda l: jax.lax.dot(
            l, cj._BLOCK_MAT_I8, preferred_element_type=jnp.int32))(lhs)
        return jnp.sum(s).astype(jnp.uint32)

    def mm_bf16_iter(bufs, lengths, i):
        lhs = jax.vmap(planes_of)(bufs + i.astype(jnp.uint8))
        m = cj._BLOCK_MAT_I8.astype(jnp.bfloat16)
        s = jax.vmap(lambda l: jax.lax.dot(
            l.astype(jnp.bfloat16), m,
            preferred_element_type=jnp.float32))(lhs)
        return jnp.sum(s).astype(jnp.uint32)

    dt = timeit(krepeat(planes_iter), bufs, lengths)
    print(f"  planes+pack(+sum)   {nbytes/dt/1e9:8.2f} GB/s", flush=True)
    dt = timeit(krepeat(mm_iter), bufs, lengths)
    print(f"  planes+int8 matmul  {nbytes/dt/1e9:8.2f} GB/s", flush=True)
    dt = timeit(krepeat(mm_bf16_iter), bufs, lengths)
    print(f"  planes+bf16 matmul  {nbytes/dt/1e9:8.2f} GB/s", flush=True)

    # Adler sub-stage: plain reductions ceiling
    def red_iter(bufs, lengths, i):
        s = jnp.sum((bufs + i.astype(jnp.uint8)).astype(jnp.int32),
                    axis=(0, 1))
        return s.astype(jnp.uint32)

    dt = timeit(krepeat(red_iter), bufs, lengths)
    print(f"  u8 full-reduce      {nbytes/dt/1e9:8.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
