"""Round-5 speed experiments: lean tier (VERDICT #3, 0.099 -> 0.11) and
dyn tier (VERDICT #5, 0.147 -> 0.20).

On-chip, bench-protocol pipelined timing (async dispatch of all batches,
then sync), full 16 MiB corpus ratio, zlib spot-verification.  Variants:
  lean-base        current lean (with r5 RLE headers)
  lean-s5 / s4     trimmed relaxation stride sets
  lean-B8 / B2     batch-size retry with the r4 emit rewrite + RLE hdr
  dyn-base         current dyn tier
  dyn-lcp8         3-operand matchfind sort (w8/w12 payloads dropped)
  dyn-d4 / d8      probe-depth check at lcp8

Usage: python scripts/exp_r5_speed.py [substr ...]
"""
from __future__ import annotations

import functools
import sys
import time
import zlib

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import CHUNK, make_corpus


def run(fn, bufs_np, B, verify_every=8):
    from libdeflate_tpu.compress.tpu_pipeline import device_stream_to_bytes

    nch = bufs_np.shape[0]
    dev = jax.devices()[0]
    batches = []
    for i in range(0, nch, B):
        bb = bufs_np[i: i + B]
        if bb.shape[0] < B:
            bb = np.concatenate(
                [bb, np.zeros((B - bb.shape[0], CHUNK), np.uint8)])
        batches.append(
            (jax.device_put(jnp.asarray(bb), dev),
             jax.device_put(jnp.full(B, CHUNK, jnp.int32), dev),
             jax.device_put(jnp.zeros(B, bool), dev)))
    outs = [fn(*b) for b in batches]
    for w, t in outs:
        np.asarray(t)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        outs = [fn(*b) for b in batches]
        for w, t in outs:
            np.asarray(t)
        best = min(best, time.perf_counter() - t0)
    comp = 0
    for bi, (w, t) in enumerate(outs):
        w, t = np.asarray(w), np.asarray(t)
        for k in range(B):
            ci = bi * B + k
            if ci >= nch:
                break
            comp += (int(t[k]) + 7) // 8
            if ci % verify_every == 0:
                s = device_stream_to_bytes(w[k], t[k])
                assert zlib.decompressobj(-15).decompress(s) == \
                    bufs_np[ci].tobytes(), (bi, k)
    return best, comp


def main():
    from libdeflate_tpu.compress import tpu_dynamic as td
    from libdeflate_tpu.compress import tpu_optimal as to

    mko = to._compress_chunks_optimal_pallas
    mkd = td._compress_chunks_dynamic_pallas
    lean = dict(depth=6, two_pass=False, hash3=False, passes=1,
                use_content=False, use_wide=False,
                ladder=to.LEN_LADDER_DENSE2, ext_c=False, strides2=(),
                refine=0, lit_sample=4)

    def vo(B=4, **kw):
        cfg = dict(lean)
        cfg.update(kw)
        return jax.jit(functools.partial(mko, **cfg)), B

    def vd(B=4, **kw):
        cfg = dict(two_pass=False, depth=6, hash3=False)
        cfg.update(kw)
        return jax.jit(functools.partial(mkd, **cfg)), B

    variants = {
        "lean-base": vo(),
        "lean-s5": vo(strides1=(1, 2, 8, 32, 128)),
        "lean-s4": vo(strides1=(1, 4, 16, 128)),
        "lean-B8": vo(B=8),
        "lean-B2": vo(B=2),
        "dyn-base": vd(),
        "dyn-lcp8": vd(lcp=8),
        "dyn-lcp8-d4": vd(lcp=8, depth=4),
        "dyn-lcp8-d8": vd(lcp=8, depth=8),
        "dyn-lcp8-B8": vd(lcp=8, B=8),
    }
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    todo = {k: v for k, v in variants.items()
            if not names or any(n in k for n in names)}

    corpus = make_corpus()
    nch = len(corpus) // CHUNK
    bufs = np.frombuffer(corpus[: nch * CHUNK], np.uint8).reshape(nch, CHUNK)
    total = nch * CHUNK
    for name, (fn, B) in todo.items():
        dt, comp = run(fn, bufs, B)
        print(f"{name:14s} B={B}  {total/dt/1e9:.4f} GB/s  "
              f"ratio {comp/total*100:.4f}%", flush=True)


if __name__ == "__main__":
    main()
