"""CPU ratio A/B for lean DP tier variants (XLA path, full bench corpus).

Speed on CPU is meaningless here; only the compressed ratios matter.
Run from the repo root: JAX_PLATFORMS=cpu python scripts/ratio_ab.py [names]
"""

from __future__ import annotations

import sys
import zlib

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import bench as benchmod
from libdeflate_tpu.compress import tpu_optimal as to
from libdeflate_tpu.compress.tpu_pipeline import device_stream_to_bytes

CHUNK = 1 << 20

VARIANTS = {
    # name: (parse kwargs, emit refine_passes)
    "base(rawC,dense2,p1)": (dict(), 16),
    "rowlit": (dict(row_lit1=True), 16),
    "lcp12": (dict(lcp=12), 16),
    "rowlit+lcp12": (dict(row_lit1=True, lcp=12), 16),
    "ext2shrink": (dict(strides2=(32, 64, 128)), 16),
    "ext2none": (dict(strides2=()), 16),
    "rowlit+ext2shrink": (dict(row_lit1=True, strides2=(32, 64, 128)), 16),
    "ext2none+cap11": (dict(strides2=()), 0),
    "ext2none+refine4": (dict(strides2=()), 4),
}


def main():
    corpus = benchmod.make_corpus()
    nch = len(corpus) // CHUNK
    take = list(range(nch))
    if "--sample" in sys.argv:
        take = take[::2]
    bufs_np = np.frombuffer(corpus[: nch * CHUNK], np.uint8).reshape(
        nch, CHUNK)[take]

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    todo = {k: v for k, v in VARIANTS.items()
            if not names or any(n in k for n in names)}

    for name, (kw, refine) in todo.items():
        def one(b, l, f, _kw=kw, _r=refine):
            bp, pos, cm, cl, eff, dist = to.parse_chunk_optimal(
                b, l, depth=6, two_pass=False, hash3=False,
                wide_window=True, passes=1, use_content=False,
                use_wide=False, ladder=to.LEN_LADDER_DENSE2, ext_c=False,
                **_kw)
            from libdeflate_tpu.compress.tpu_dynamic import (
                emit_dynamic_block,
            )
            return emit_dynamic_block(bp, f, cm, cl, eff, dist,
                                      b.shape[0], bp.shape[0],
                                      refine_passes=_r)
        jfn = jax.jit(jax.vmap(one))
        comp = 0
        ok = True
        for i in range(bufs_np.shape[0]):
            b = jnp.asarray(bufs_np[i:i + 1])
            L = jnp.full(1, CHUNK, jnp.int32)
            F = jnp.zeros(1, bool)
            w, t = jfn(b, L, F)
            s = device_stream_to_bytes(np.asarray(w[0]), np.asarray(t[0]))
            comp += len(s)
            if i % 4 == 0 and zlib.decompressobj(-15).decompress(s) != \
                    bufs_np[i].tobytes():
                ok = False
        print(f"{name:24s} ratio {comp / (bufs_np.shape[0] * CHUNK):.5f}"
              f"  {'OK' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
