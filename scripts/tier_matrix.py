"""On-chip speed/ratio matrix for candidate bench tiers.

Runs the bench.py protocol (16 MiB mixed corpus, 1 MiB chunks, batches of
BATCH) for each tier config and prints GB/s + compressed ratio + zlib
round-trip verification.  Run from the repo root.
"""

from __future__ import annotations

import functools
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench as benchmod
from libdeflate_tpu.compress import tpu_dynamic as td
from libdeflate_tpu.compress import tpu_optimal as to
from libdeflate_tpu.compress.tpu_pipeline import device_stream_to_bytes

CHUNK = 1 << 20
BATCH = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 4


def tier_configs():
    mk = to._compress_chunks_optimal_pallas
    base = dict(depth=6, two_pass=False, hash3=False, passes=2)
    lean = dict(use_content=False, use_wide=False,
                ladder=to.LEN_LADDER_DENSE)
    cfgs = {
        "opt2-pallas(base)": functools.partial(mk, **base),
        "leanB(no-content)": functools.partial(mk, **base, use_content=False),
        "leanC(B+no-wide)": functools.partial(
            mk, **base, use_content=False, use_wide=False),
        "leanD(C+dense)": functools.partial(mk, **base, **lean),
        "leanE(D+hash3)": functools.partial(
            mk, depth=6, two_pass=False, hash3=True, passes=2, **lean),
        "leanF(B+dense)": functools.partial(
            mk, **base, use_content=False, ladder=to.LEN_LADDER_DENSE),
        "leanG(D+depth4)": functools.partial(
            mk, depth=4, two_pass=False, hash3=False, passes=2, **lean),
        "leanH(D+refine0)": functools.partial(mk, **base, **lean, refine=0),
        "leanI(D+flatlit1)": functools.partial(
            mk, **base, **lean, flat_lit1=True),
        "leanJ(D+dense2)": functools.partial(
            mk, **base, use_content=False, use_wide=False,
            ladder=to.LEN_LADDER_DENSE2),
        "leanK(G+refine4+flat)": functools.partial(
            mk, depth=4, two_pass=False, hash3=False, passes=2, **lean,
            refine=4, flat_lit1=True),
        # passes=1 variants: spend the ratio margin (0.3376 vs bar 0.3412)
        # to drop the whole second cost pass (code-lens sort + re-translate
        # + DP2 + commit2, ~20 ms/4-chunk batch)
        "lean1(D,passes=1)": functools.partial(
            mk, depth=6, two_pass=False, hash3=False, passes=1, **lean),
        "lean1J(dense2,passes=1)": functools.partial(
            mk, depth=6, two_pass=False, hash3=False, passes=1,
            use_content=False, use_wide=False, ladder=to.LEN_LADDER_DENSE2),
        "lean1r0(D,p1,refine0)": functools.partial(
            mk, depth=6, two_pass=False, hash3=False, passes=1, **lean,
            refine=0),
        "lean1d4(p1,depth4)": functools.partial(
            mk, depth=4, two_pass=False, hash3=False, passes=1, **lean),
        # raw-C (skip extending the nearest-occurrence candidate) and flat
        # pass-1 literal costs on the passes=1 dense2 base
        "lean1X(p1,rawC)": functools.partial(
            mk, depth=6, two_pass=False, hash3=False, passes=1,
            use_content=False, use_wide=False, ladder=to.LEN_LADDER_DENSE2,
            ext_c=False),
        "lean1F(p1,flat)": functools.partial(
            mk, depth=6, two_pass=False, hash3=False, passes=1,
            use_content=False, use_wide=False, ladder=to.LEN_LADDER_DENSE2,
            flat_lit1=True),
        "lean1XF(p1,rawC,flat)": functools.partial(
            mk, depth=6, two_pass=False, hash3=False, passes=1,
            use_content=False, use_wide=False, ladder=to.LEN_LADDER_DENSE2,
            ext_c=False, flat_lit1=True),
        "lean1XR(p1,rawC,rowlit)": functools.partial(
            mk, depth=6, two_pass=False, hash3=False, passes=1,
            use_content=False, use_wide=False, ladder=to.LEN_LADDER_DENSE2,
            ext_c=False, row_lit1=True),
        "lean1X8(p1,rawC,lcp8)": functools.partial(
            mk, depth=6, two_pass=False, hash3=False, passes=1,
            use_content=False, use_wide=False, ladder=to.LEN_LADDER_DENSE2,
            ext_c=False, lcp8=True),
        "lean1XR8(rawC,rowlit,lcp8)": functools.partial(
            mk, depth=6, two_pass=False, hash3=False, passes=1,
            use_content=False, use_wide=False, ladder=to.LEN_LADDER_DENSE2,
            ext_c=False, row_lit1=True, lcp8=True),
        # the named bench tier (rawC + no round-2 relaxation + packed
        # literal-cost unpermute)
        "leanfinal": to.compress_chunks_lean_pallas,
    }
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    if only:
        cfgs = {k: v for k, v in cfgs.items() if any(o in k for o in only)}
    return cfgs


def run_config(name, fn, bufs_np, batches):
    jfn = jax.jit(fn)
    try:
        outs = [jfn(*b) for b in batches]
        for _, t in outs:
            _ = np.asarray(t)
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return
    dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        outs = [jfn(*b) for b in batches]
        for _, t in outs:
            _ = np.asarray(t)
        dt = min(dt, time.perf_counter() - t0)
    # verify + ratio over ALL chunks
    comp = 0
    k = 0
    ok = True
    for bi, (ww, tt) in enumerate(outs):
        ww = np.asarray(ww)
        tt = np.asarray(tt)
        for j in range(ww.shape[0]):
            stream = device_stream_to_bytes(ww[j], tt[j])
            comp += len(stream)
            if k < 4 or k % 5 == 0:   # spot-verify to keep host time sane
                if zlib.decompressobj(-15).decompress(stream) != \
                        bufs_np[k].tobytes():
                    ok = False
            k += 1
    nbytes = k * CHUNK
    print(f"{name:24s} {nbytes/dt/1e9:8.4f} GB/s  ratio {comp/nbytes:.4f}"
          f"  {'OK' if ok else 'ROUND-TRIP MISMATCH'}")


def main():
    corpus = benchmod.make_corpus()
    nchunks = len(corpus) // CHUNK
    bufs_np = np.frombuffer(corpus[: nchunks * CHUNK], np.uint8).reshape(
        nchunks, CHUNK)
    dev = jax.devices()[0]
    batches = []
    for i in range(0, nchunks - BATCH + 1, BATCH):
        batches.append((
            jax.device_put(jnp.asarray(bufs_np[i:i + BATCH]), dev),
            jax.device_put(jnp.full(BATCH, CHUNK, jnp.int32), dev),
            jax.device_put(jnp.zeros(BATCH, bool), dev),
        ))
    print(f"batch={BATCH}, {len(batches)} batches x {BATCH} chunks")
    for name, fn in tier_configs().items():
        run_config(name, fn, bufs_np, batches)


if __name__ == "__main__":
    main()
