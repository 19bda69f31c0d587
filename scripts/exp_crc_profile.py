"""On-chip sub-stage profile of the CRC-32 kernel + pipelined checksum
throughput (amortizing the ~25 ms dispatch/sync floor over K calls).

Run from the repo root: python scripts/exp_crc_profile.py
"""

from __future__ import annotations

import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from libdeflate_tpu.ops import checksums_jax as cj
from libdeflate_tpu.ops.crc32_math import CRC_BLOCK

B, N = 16, 1 << 22  # 64 MiB resident
K = 4               # pipelined calls per timing


def timeit_pipelined(fn, *args, reps=3):
    np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(K)]
        for o in outs:
            np.asarray(o)
        ts.append((time.perf_counter() - t0) / K)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(5)
    bufs_np = rng.integers(0, 256, size=(B, N), dtype=np.uint8)
    bufs = jax.device_put(jnp.asarray(bufs_np))
    lengths = jax.device_put(jnp.full(B, N, jnp.int32))

    print(f"B={B} x {N>>20} MiB, {K} pipelined calls per rep", flush=True)

    crc_j = jax.jit(cj.crc32_chunks)
    adl_j = jax.jit(cj.adler32_chunks)
    dt = timeit_pipelined(adl_j, bufs, lengths)
    print(f"Adler32 pipelined {B*N/dt/1e9:8.2f} GB/s", flush=True)
    dt = timeit_pipelined(crc_j, bufs, lengths)
    print(f"CRC-32  pipelined {B*N/dt/1e9:8.2f} GB/s", flush=True)

    # ---- sub-stages of crc32_fixed (vmapped over B) ----
    def stage_mask_roll(buf, length):
        n = buf.shape[0]
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        masked = jnp.where(idx < length, buf, 0)
        return jnp.roll(masked, n - length)

    def stage_planes(buf):
        nb = buf.shape[0] // CRC_BLOCK
        w32 = jax.lax.bitcast_convert_type(
            buf.reshape(nb, CRC_BLOCK // 4, 4), jnp.uint32)
        planes = jnp.stack(
            [(w32 >> jnp.uint32(j)) & jnp.uint32(0x01010101)
             for j in range(8)], axis=-1)
        lhs = jax.lax.bitcast_convert_type(planes, jnp.uint8)
        return lhs.reshape(nb, CRC_BLOCK * 8).astype(jnp.int8)

    def stage_matmul(lhs):
        return jax.lax.dot(lhs, cj._BLOCK_MAT_I8,
                           preferred_element_type=jnp.int32)

    def stage_tail(s):
        vi = s.astype(jnp.uint32) & jnp.uint32(1)
        pow2 = jnp.left_shift(
            jnp.uint32(1),
            jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1))
        v = jnp.sum(vi * pow2, axis=1, dtype=jnp.uint32)
        nb = v.shape[0]
        nb2 = 1 << max((nb - 1).bit_length(), 0)
        v = jnp.concatenate([jnp.zeros(nb2 - nb, jnp.uint32), v])
        for level in range(nb2.bit_length() - 1):
            v = cj._mat_vec_const(
                cj._ADV[cj._CRC_LOG_BLOCK + level], v[0::2]) ^ v[1::2]
        return v[0]

    mr_j = jax.jit(jax.vmap(stage_mask_roll))
    rolled = mr_j(bufs, lengths)
    np.asarray(rolled[0, :4])
    dt = timeit_pipelined(mr_j, bufs, lengths)
    print(f"  mask+roll      {B*N/dt/1e9:8.2f} GB/s", flush=True)

    pl_j = jax.jit(jax.vmap(stage_planes))
    lhs = pl_j(rolled)
    np.asarray(lhs[0, 0, :4])
    dt = timeit_pipelined(pl_j, rolled)
    print(f"  planes+pack    {B*N/dt/1e9:8.2f} GB/s", flush=True)

    mm_j = jax.jit(jax.vmap(stage_matmul))
    s = mm_j(lhs)
    np.asarray(s[0, 0, :4])
    dt = timeit_pipelined(mm_j, lhs)
    print(f"  int8 matmul    {B*N/dt/1e9:8.2f} GB/s", flush=True)

    tl_j = jax.jit(jax.vmap(stage_tail))
    np.asarray(tl_j(s))
    dt = timeit_pipelined(tl_j, s)
    print(f"  combine tail   {B*N/dt/1e9:8.2f} GB/s", flush=True)

    # advance_dyn (init handling) alone
    ad_j = jax.jit(jax.vmap(lambda l: cj._advance_dyn(jnp.uint32(0xFFFFFFFF), l)))
    np.asarray(ad_j(lengths))
    dt = timeit_pipelined(ad_j, lengths)
    print(f"  advance_dyn    {B*N/dt/1e9:8.2f} GB/s-equiv ({dt*1e3:.2f} ms)",
          flush=True)

    del s, lhs, rolled

    # ---- Adler sub-stages ----
    def adler_convert(buf):
        return buf.reshape(-1, 256).astype(jnp.bfloat16)

    def adler_mm(b2):
        wts = jnp.stack([jnp.ones(256, jnp.float32),
                         jnp.arange(256, dtype=jnp.float32)],
                        axis=1).astype(jnp.bfloat16)
        return jax.lax.dot(b2, wts, preferred_element_type=jnp.float32)

    ac_j = jax.jit(jax.vmap(adler_convert))
    b2 = ac_j(bufs)
    np.asarray(b2[0, 0, :2])
    dt = timeit_pipelined(ac_j, bufs)
    print(f"  adler convert  {B*N/dt/1e9:8.2f} GB/s", flush=True)
    mm2_j = jax.jit(jax.vmap(adler_mm))
    np.asarray(mm2_j(b2)[0, 0])
    dt = timeit_pipelined(mm2_j, b2)
    print(f"  adler matmul   {B*N/dt/1e9:8.2f} GB/s", flush=True)
    del b2

    # plain VPU reduction ceiling (one pass over the bytes)
    red_j = jax.jit(lambda b: jnp.sum(b.astype(jnp.int32) if False else
                                      b.reshape(B, -1, 128).astype(jnp.int32),
                                      axis=(1, 2)))
    np.asarray(red_j(bufs))
    dt = timeit_pipelined(red_j, bufs)
    print(f"  u8 row-reduce  {B*N/dt/1e9:8.2f} GB/s", flush=True)

    # bf16 matmul alternative for the same reduction
    def stage_matmul_bf16(lhs):
        return jax.lax.dot(lhs.astype(jnp.bfloat16),
                           cj._BLOCK_MAT_I8.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    mmb_j = jax.jit(jax.vmap(stage_matmul_bf16))
    np.asarray(mmb_j(lhs)[0, 0, :4])
    dt = timeit_pipelined(mmb_j, lhs)
    print(f"  bf16 matmul    {B*N/dt/1e9:8.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
