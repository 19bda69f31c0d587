"""One-shot device measurement roundup for everything queued on the relay.

Runs, in order, with small warmups and host-materialization syncs:
  1. Pallas per-grid-step overhead sanity (empty kernel).
  2. Compress A/B: XLA scatter pack vs Pallas pack (dynamic tier).
  3. Compress A/B: XLA scan DP vs Pallas DP (optimal tier) + ratios.
  4. CRC-32 throughput (packed-plane int8 kernel) + Adler-32.
  5. Pallas decoder throughput on 1 MiB zlib chunks (+ bit-exactness).
Usage: python scripts/exp_device_roundup.py [sections...]
  e.g. `python scripts/exp_device_roundup.py 1 4 5` — default all.
"""
import sys
import time
import zlib

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_corpus, CHUNK

SECTIONS = set(sys.argv[1:]) or {"1", "2", "3", "4", "5"}


def sync(x):
    jax.tree.map(np.asarray, x)


def best_of(fn, reps=4):
    fn()  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    corpus = make_corpus(16)
    nch = len(corpus) // CHUNK
    bufs = np.frombuffer(corpus[: nch * CHUNK], np.uint8).reshape(nch, CHUNK)
    B = 4
    batches = []
    for i in range(0, nch, B):
        batches.append(
            (jax.device_put(jnp.asarray(bufs[i : i + B]), dev),
             jax.device_put(jnp.full(B, CHUNK, jnp.int32), dev),
             jax.device_put(jnp.zeros(B, bool), dev))
        )
    total = nch * CHUNK

    if "1" in SECTIONS:
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def empty_kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...]

        x = jnp.zeros((128, 128), jnp.float32)
        for steps in (1, 16, 64):
            f = pl.pallas_call(
                empty_kernel,
                grid=(steps,),
                in_specs=[pl.BlockSpec((128, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((128, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            )
            dt = best_of(lambda: sync(jax.jit(f)(x)))
            print(f"[1] pallas grid={steps}: {dt*1e3:.2f} ms "
                  f"({dt/steps*1e3:.3f} ms/step)", flush=True)

    if "2" in SECTIONS or "3" in SECTIONS:
        from libdeflate_tpu.compress import tpu_dynamic as td
        from libdeflate_tpu.compress import tpu_optimal as to
        from libdeflate_tpu.compress.tpu_pipeline import device_stream_to_bytes

        pairs = []
        if "2" in SECTIONS:
            pairs += [
                ("dyn1  xla", td.compress_chunks_dynamic),
                ("dyn1  pal", td.compress_chunks_dynamic_pallas),
                ("dyn2  xla", td.compress_chunks_dynamic2),
                ("dyn2  pal", td.compress_chunks_dynamic2_pallas),
            ]
        if "3" in SECTIONS:
            pairs += [
                ("opt   xla", to.compress_chunks_optimal),
                ("opt   pal", to.compress_chunks_optimal_pallas),
                ("optD  xla", to.compress_chunks_optimal_deep),
                ("optD  pal", to.compress_chunks_optimal_deep_pallas),
            ]
        for name, fn in pairs:
            try:
                def run():
                    outs = [fn(*b) for b in batches]
                    for _, t in outs:
                        np.asarray(t)
                    return outs
                outs = run()  # warmup + keep for ratio
                dt = best_of(lambda: run())
                comp = sum(int(np.sum((np.asarray(t) + 7) // 8))
                           for _, t in outs)
                # spot-check one chunk round-trips
                w0, t0_ = np.asarray(outs[0][0][0]), np.asarray(outs[0][1][0])
                stream = device_stream_to_bytes(w0, t0_)
                assert zlib.decompressobj(-15).decompress(stream) \
                    == bufs[0].tobytes()
                print(f"[2/3] {name}: {total/dt/1e6:7.1f} MB/s  "
                      f"ratio {comp/total*100:.3f}%", flush=True)
            except Exception as e:
                print(f"[2/3] {name}: FAILED {type(e).__name__}: {e}",
                      flush=True)

    if "4" in SECTIONS:
        from libdeflate_tpu.ops import checksums_jax as cj

        big = jax.device_put(jnp.asarray(bufs[:8]), dev)
        lens = jax.device_put(jnp.full(8, CHUNK, jnp.int32), dev)
        for name, fn in (("crc32", cj.crc32_chunks),
                         ("adler32", cj.adler32_chunks)):
            dt = best_of(lambda: sync(fn(big, lens)))
            # verify
            got = np.asarray(fn(big, lens))
            for k in range(8):
                want = (zlib.crc32 if name == "crc32" else zlib.adler32)(
                    bufs[k].tobytes())
                assert int(got[k]) == want, (name, k)
            print(f"[4] {name}: {8*CHUNK/dt/1e9:.1f} GB/s", flush=True)

    if "5" in SECTIONS:
        from libdeflate_tpu.decompress.pallas_decode import (
            decompress_chunks_pallas, STAGE_W)

        B2 = 8
        streams = []
        for k in range(B2):
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            streams.append(c.compress(bufs[k].tobytes()) + c.flush())
        wmax = max(-(-len(s) // 4) for s in streams) + 2 * STAGE_W
        comp = np.zeros((B2, wmax), np.uint32)
        clen = np.zeros(B2, np.int32)
        for k, s in enumerate(streams):
            pad = (-len(s)) % 4
            comp[k, : (len(s) + pad) // 4] = np.frombuffer(
                s + b"\0" * pad, np.uint32)
            clen[k] = len(s)
        ca = jax.device_put(jnp.asarray(comp), dev)
        cl = jax.device_put(jnp.asarray(clen), dev)
        ol = jax.device_put(jnp.full(B2, CHUNK, jnp.int32), dev)

        def run():
            out, st = decompress_chunks_pallas(ca, cl, ol, CHUNK)
            np.asarray(st)
            return out, st

        out, st = run()
        out_h, st_h = np.asarray(out), np.asarray(st)
        ok = all(int(x) == 0 for x in st_h) and all(
            out_h[k].tobytes() == bufs[k].tobytes() for k in range(B2))
        dt = best_of(lambda: run())
        print(f"[5] pallas decode: {B2*CHUNK/dt/1e6:.1f} MB/s  "
              f"bit-exact={ok}", flush=True)


if __name__ == "__main__":
    main()
