"""Round-5: sweep the pass-1 match-bias seed knob on both corpora.

The candidate-existence diagnostic (PERF_NOTES r5) showed the lean DP
HAS ~80-90% of the short matches the reference's lazy -6 commits but
rejects them under the seeded costs.  match_bias16 (traced, so ONE
compile serves the whole sweep) subtracts a constant from the pass-1
per-match seed cost.

Usage: python scripts/exp_match_bias.py [--p2]
"""
from __future__ import annotations

import sys
import time
import zlib

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import CHUNK, make_corpus, make_corpus2

B = 4


def main():
    from libdeflate_tpu.compress import tpu_optimal as to

    passes = 2 if "--p2" in sys.argv else 1
    fn = jax.jit(lambda b, l, f, bias: to._compress_chunks_optimal_pallas(
        b, l, f, depth=6, two_pass=False, hash3=False, passes=passes,
        use_content=False, use_wide=False, ladder=to.LEN_LADDER_DENSE2,
        ext_c=False, strides2=(), refine=0, lit_sample=4,
        match_bias16=bias))

    corp1 = make_corpus()
    corp2 = make_corpus2()
    u2 = len(corp2) // 10
    sets = {
        "corpus1": corp1,
        "c2-text": corp2[: 4 * u2],
        "c2-recs": corp2[6 * u2: 9 * u2],
    }
    bufs = {}
    for tag, data in sets.items():
        nch = max(len(data) // CHUNK, 1)
        bufs[tag] = np.frombuffer(
            data[: nch * CHUNK], np.uint8).reshape(nch, CHUNK)

    from libdeflate_tpu.compress.tpu_pipeline import device_stream_to_bytes

    f259 = np.arange(259)
    shapes = {
        "flat0": 0.0 * f259,
        "sh2": np.where(f259 <= 8, 2.0, 0.0),
        "sh3": np.where(f259 <= 8, 3.0, 0.0),
        "sh4": np.where(f259 <= 8, 4.0, 0.0),
        "sh6": np.where(f259 <= 8, 6.0, 0.0),
        "sh3+f1": np.where(f259 <= 8, 3.0, 0.0) + 1.0,
        "sh4+f2": np.where(f259 <= 8, 4.0, 0.0) + 2.0,
        "mid3": np.where(f259 <= 16, 3.0, 0.0),
        "taper": np.clip((16 - f259) * 0.5, 0, 5.0),
    }
    if "--p2" in sys.argv:
        shapes = {k: shapes[k] for k in ("flat0", "sh3", "sh4+f2", "taper")}
    for sname, vec in shapes.items():
        bias = jnp.asarray(np.round(vec * 16).astype(np.int32))
        line = [f"bias={sname:7s}"]
        for tag, bb in bufs.items():
            nch = bb.shape[0]
            comp = 0
            t0 = time.perf_counter()
            for i in range(0, nch, B):
                x = bb[i: i + B]
                if x.shape[0] < B:
                    x = np.concatenate(
                        [x, np.zeros((B - x.shape[0], CHUNK), np.uint8)])
                w, t = fn(jnp.asarray(x), jnp.full(B, CHUNK, jnp.int32),
                          jnp.zeros(B, bool), bias)
                w, t = np.asarray(w), np.asarray(t)
                for k in range(min(B, nch - i)):
                    comp += (int(t[k]) + 7) // 8
                    if (i + k) % 16 == 0:
                        s = device_stream_to_bytes(w[k], t[k])
                        assert zlib.decompressobj(-15).decompress(s) == \
                            bb[i + k].tobytes()
            dt = time.perf_counter() - t0
            line.append(f"{tag}={comp/(nch*CHUNK)*100:.3f}%")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
