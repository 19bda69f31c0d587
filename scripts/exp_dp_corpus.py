"""Measure DP-tier ratio + speed on the bench corpus (device)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_corpus, CHUNK


def timeit(f, *args, reps=4):
    out = f(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.tree.map(lambda x: np.asarray(x), out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def pipelined(fn, batches):
    """Time like bench.py: enqueue all batches, then sync (dispatch overlap)."""
    outs = [fn(*b) for b in batches]
    for _, t in outs:
        np.asarray(t)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        outs = [fn(*b) for b in batches]
        for _, t in outs:
            np.asarray(t)
        best = min(best, time.perf_counter() - t0)
    comp = sum(int(np.sum((np.asarray(t) + 7) // 8)) for _, t in outs)
    return best, comp


def main():
    from libdeflate_tpu.compress import tpu_dynamic as td
    from libdeflate_tpu.compress import tpu_optimal as to

    corpus = make_corpus()
    nch = len(corpus) // CHUNK
    bufs = np.frombuffer(corpus[: nch * CHUNK], np.uint8).reshape(nch, CHUNK)
    B = 4
    dev = jax.devices()[0]
    batches = []
    for i in range(0, nch, B):
        batches.append(
            (jax.device_put(jnp.asarray(bufs[i : i + B]), dev),
             jax.device_put(jnp.full(B, CHUNK, jnp.int32), dev),
             jax.device_put(jnp.zeros(B, bool), dev))
        )

    total = nch * CHUNK
    for name, fn in (
        ("dyn1", td.compress_chunks_dynamic),
        ("dp  ", to.compress_chunks_optimal),
        ("dpD ", to.compress_chunks_optimal_deep),
    ):
        dt, comp = pipelined(fn, batches)
        print(f"{name}: {total/dt/1e6:7.1f} MB/s  ratio {comp/total*100:.3f}%")


if __name__ == "__main__":
    main()
