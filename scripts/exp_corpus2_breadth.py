"""Round-5 experiment: candidate breadth vs the corpus2 text loss.

VERDICT r4 #1: lean loses to libdeflate -6 by 3.2pp on the text-heavy
corpus2 (28.88 vs 25.68) — driven by candidate breadth (2-3 sorted-probe
candidates at depth 6 vs hc chains at depth 35,
/root/reference/lib/hc_matchfinder.h:182-338).  The dyn-tier depth sweep
measured probes fuse to ~free, so this sweeps DEPTH (and the content pass
/ hash3 / passes knobs) on BOTH corpora, per class, on the real chip:
ratio + pipelined speed per variant.

Usage: python scripts/exp_corpus2_breadth.py [variant-substr ...]
"""
from __future__ import annotations

import functools
import os
import subprocess
import sys
import time
import zlib

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as benchmod
from bench import CHUNK, make_corpus, make_corpus2

B = 4


def corpus2_classes(total_mb=16):
    u = total_mb * 1024 * 1024 // 10
    return [("text", 0, 4 * u), ("b64", 4 * u, 6 * u),
            ("recs", 6 * u, 9 * u), ("runs", 9 * u, 10 * u)]


def corpus1_classes(total_mb=16):
    u = total_mb * 1024 * 1024 // 8
    return [("text", 0, 2 * u), ("skew", 2 * u, 4 * u),
            ("recs", 4 * u, 6 * u), ("rand", 6 * u, 7 * u),
            ("runs", 7 * u, 8 * u)]


def ref_class_ratios(corpus: bytes, classes, level=6):
    """libdeflate -<level> ratio per class via the reference benchmark."""
    benchmod.build_reference()
    out = {}
    for name, lo, hi in classes:
        path = f"/tmp/c2cls_{name}.bin"
        with open(path, "wb") as f:
            f.write(corpus[lo:hi])
        r = subprocess.run(
            [benchmod.REF_BENCH, f"-{level}", "-s", str(CHUNK), path],
            capture_output=True, text=True, timeout=300)
        for line in r.stdout.splitlines():
            if "Compressed" in line and "=>" in line:
                # "Compressed 6710886 => 1681276 bytes (25.054%)"
                out[name] = float(line.split("(")[1].split("%")[0]) / 100
    return out


def variants():
    from libdeflate_tpu.compress import tpu_optimal as to

    mk = to._compress_chunks_optimal_pallas
    lean = dict(depth=6, two_pass=False, hash3=False, passes=1,
                use_content=False, use_wide=False,
                ladder=to.LEN_LADDER_DENSE2, ext_c=False, strides2=(),
                refine=0, lit_sample=4)

    def v(**kw):
        cfg = dict(lean)
        cfg.update(kw)
        return functools.partial(mk, **cfg)

    return {
        "lean(d6)": v(),
        "lean-d10": v(depth=10),
        "lean-d16": v(depth=16),
        "lean-d24": v(depth=24),
        "lean-d16-h3": v(depth=16, hash3=True),
        "lean-d16-2p": v(depth=16, two_pass=True),
        "lean-d16-p2": v(depth=16, passes=2),
        "lean-content": v(use_content=True),
        "lean-d12-content": v(depth=12, use_content=True),
        "optfast(p2)": v(passes=2, refine=16, lit_sample=1),
        "optf-d16": v(passes=2, refine=16, lit_sample=1, depth=16),
        "deep": v(depth=12, two_pass=True, hash3=True, passes=3,
                  use_content=True, use_wide=True, ladder=to.LEN_LADDER,
                  ext_c=True, strides2=(1, 2, 4, 8, 16, 32, 64, 128),
                  refine=16, lit_sample=1, content_doublings=2),
    }


def run_variant(fn, bufs_np, verify_every=4):
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
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*b) for b in batches]
        for w, t in outs:
            np.asarray(t)
        best = min(best, time.perf_counter() - t0)
    # per-chunk sizes + spot verification
    sizes = np.zeros(nch, np.int64)
    for bi, (w, t) in enumerate(outs):
        w = np.asarray(w)
        t = np.asarray(t)
        for k in range(B):
            ci = bi * B + k
            if ci >= nch:
                break
            sizes[ci] = (int(t[k]) + 7) // 8
            if ci % verify_every == 0:
                s = device_stream_to_bytes(w[k], t[k])
                assert zlib.decompressobj(-15).decompress(s) == \
                    bufs_np[ci].tobytes(), (bi, k)
    return best, sizes


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    todo = {k: f for k, f in variants().items()
            if not names or any(n in k for n in names)}

    for tag, mkc, mkcls in (("corpus2", make_corpus2, corpus2_classes),
                            ("corpus1", make_corpus, corpus1_classes)):
        corpus = mkc()
        classes = mkcls()
        nch = len(corpus) // CHUNK
        bufs = np.frombuffer(corpus[: nch * CHUNK], np.uint8).reshape(
            nch, CHUNK)
        # per-class chunk sets (each class compressed separately so the
        # attribution is exact — class spans are not 1 MiB-aligned)
        cls_bufs = {}
        for cname, lo, hi in classes:
            ncc = max((hi - lo) // CHUNK, 1)
            cls_bufs[cname] = np.frombuffer(
                corpus[lo: lo + ncc * CHUNK], np.uint8).reshape(ncc, CHUNK)
        ref = ref_class_ratios(corpus, classes)
        reft = ref_class_ratios(corpus, [("all", 0, nch * CHUNK)])
        print(f"\n== {tag} ==  libdeflate -6: "
              + "  ".join(f"{k}={v*100:.2f}" for k, v in ref.items())
              + f"  all={reft['all']*100:.2f}", flush=True)
        for name, fn in todo.items():
            dt, sizes = run_variant(fn, bufs)
            tot = sizes.sum() / (nch * CHUNK)
            per = []
            for cname, lo, hi in classes:
                cb = cls_bufs[cname]
                _, csz = run_variant(fn, cb, verify_every=1 << 30)
                r = csz.sum() / cb.size
                delta = (r - ref.get(cname, 0)) * 100
                per.append(f"{cname}={r*100:.2f}({delta:+.2f})")
            print(f"{name:18s} {nch*CHUNK/dt/1e6:7.1f} MB/s  "
                  f"all={tot*100:.3f}%  " + "  ".join(per), flush=True)
        if "--c2only" in sys.argv:
            break


if __name__ == "__main__":
    main()
