"""On-chip throughput: TPU CRC-32 / Adler-32 kernels and the Pallas
scalar-core decoder.

Run from the repo root: python scripts/exp_checksum_decode.py
"""

from __future__ import annotations

import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from libdeflate_tpu.ops import checksums_jax as cj

    rng = np.random.default_rng(11)
    # ---- checksums: 256 MiB resident batch ----
    B, N = 64, 1 << 22  # 64 x 4 MiB = 256 MiB
    bufs_np = rng.integers(0, 256, size=(B, N), dtype=np.uint8)
    bufs = jax.device_put(jnp.asarray(bufs_np))
    lengths = jax.device_put(jnp.full(B, N, jnp.int32))

    crc_j = jax.jit(cj.crc32_chunks)
    adl_j = jax.jit(cj.adler32_chunks)

    out = np.asarray(crc_j(bufs, lengths))
    ok = all(int(out[i]) == (zlib.crc32(bufs_np[i].tobytes()) & 0xFFFFFFFF)
             for i in range(0, B, 16))
    dt = timeit(lambda: np.asarray(crc_j(bufs, lengths)))
    print(f"CRC-32  {B*N/dt/1e9:8.2f} GB/s  ({'OK' if ok else 'MISMATCH'})",
          flush=True)

    out = np.asarray(adl_j(bufs, lengths))
    ok = all(int(out[i]) == (zlib.adler32(bufs_np[i].tobytes()) & 0xFFFFFFFF)
             for i in range(0, B, 16))
    dt = timeit(lambda: np.asarray(adl_j(bufs, lengths)))
    print(f"Adler32 {B*N/dt/1e9:8.2f} GB/s  ({'OK' if ok else 'MISMATCH'})",
          flush=True)

    # ---- Pallas decoder ----
    from libdeflate_tpu.decompress.pallas_decode import decompress_chunks

    CH = 1 << 20
    DB = 16
    import bench as benchmod
    data = benchmod.make_corpus(16)[: CH * DB]
    chunks = [data[i * CH:(i + 1) * CH] for i in range(DB)]
    comp = [zlib.compressobj(6, zlib.DEFLATED, -15) for _ in range(DB)]
    streams = [c.compress(ch) + c.flush() for c, ch in zip(comp, chunks)]
    maxlen = max(len(s) for s in streams)
    sb = np.zeros((DB, maxlen), np.uint8)
    for i, s in enumerate(streams):
        sb[i, :len(s)] = np.frombuffer(s, np.uint8)
    in_lens = np.asarray([len(s) for s in streams], np.int32)

    bufs_d = jax.device_put(jnp.asarray(sb))
    lens_d = jax.device_put(jnp.asarray(in_lens))
    dec_j = jax.jit(lambda b, l: decompress_chunks(b, l, CH))
    t0 = time.perf_counter()
    res = dec_j(bufs_d, lens_d)
    res = jax.tree.map(np.asarray, res)
    print(f"pallas decode first call: {time.perf_counter()-t0:.1f}s",
          flush=True)
    outs = res[0] if isinstance(res, tuple) else res
    ok = np.asarray(outs[0])[: len(chunks[0])].tobytes() == chunks[0]
    dt = timeit(lambda: jax.tree.map(np.asarray, dec_j(bufs_d, lens_d)), reps=3)
    print(f"Pallas decode {DB*CH/dt/1e6:8.2f} MB/s "
          f"({'OK' if ok else 'MISMATCH'})", flush=True)


if __name__ == "__main__":
    main()
