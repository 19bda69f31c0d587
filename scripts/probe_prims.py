"""Primitive cost probe for the current TPU stack.

Re-validates the PERF_NOTES op cost model (round 1 measured through a
different relay).  One scalar d2h per timing; subtract the null floor.
Run from the repo root: python scripts/probe_prims.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

REPS = 5
FLOOR = [0.0]


def _scalarize(fn):
    def wrapped(*args):
        out = fn(*args)
        tot = jnp.int32(0)
        for leaf in jax.tree.leaves(out):
            tot = tot + jnp.sum(leaf.astype(jnp.int32))
        return tot
    return jax.jit(wrapped)


def bench(name, fn, *args):
    sfn = _scalarize(fn)
    np.asarray(sfn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(sfn(*args))
        ts.append(time.perf_counter() - t0)
    ms = 1000 * float(np.median(ts)) - FLOOR[0]
    print(f"{name:52s} {ms:9.2f} ms")
    return ms


def main():
    rng = np.random.default_rng(3)
    N = 1 << 22  # 4M elements = one 4-chunk batch's positions
    u = jnp.asarray(rng.integers(0, 1 << 30, N, np.int32))
    keys = jnp.asarray(rng.integers(0, 1 << 31, N, np.uint32))
    tiny = jnp.ones(128, jnp.int32)
    FLOOR[0] = 0.0
    FLOOR[0] = bench("null floor", lambda x: x * 2, tiny)
    print()

    bench("elementwise x10 [4M]", lambda x: ((((x * 3 + 1) ^ (x >> 2)) * 5
                                             + (x >> 7)) ^ (x * 9)) + 1, u)

    # gathers
    tbl = jnp.asarray(rng.integers(0, 1000, 512, np.int32))
    idx = jnp.asarray(rng.integers(0, 512, N, np.int32))
    bench("gather 512-table [4M]", lambda t, i: jnp.take(t, i), tbl, idx)
    tbl2 = jnp.asarray(rng.integers(0, 1000, 32768, np.int32))
    idx2 = jnp.asarray(rng.integers(0, 32768, N, np.int32))
    bench("gather 32K-table [4M]", lambda t, i: jnp.take(t, i), tbl2, idx2)
    big = jnp.asarray(rng.integers(0, 1000, N, np.int32))
    bench("gather 4M-table [4M]", lambda t, i: jnp.take(t, i), big,
          jnp.asarray(rng.integers(0, N, N, np.int32)))

    # scatters
    sidx = jnp.asarray(rng.integers(0, N, N, np.int32))
    bench("scatter-add [4M]->[4M]",
          lambda v, i: jnp.zeros(N, jnp.int32).at[i].add(
              v, mode="promise_in_bounds"), u, sidx)
    hidx = jnp.asarray(rng.integers(0, 317, N, np.int32))
    bench("scatter-add hist [4M]->[317]",
          lambda v, i: jnp.zeros(317, jnp.int32).at[i].add(
              jnp.ones_like(v), mode="promise_in_bounds"), u, hidx)

    # sorts: operand scaling at 64K segments
    m = N // 65536
    k2 = keys.reshape(m, 65536)
    pays = [jnp.asarray(rng.integers(0, 1 << 31, N, np.uint32)).reshape(m, 65536)
            for _ in range(8)]
    for nops in (1, 2, 3, 5, 7, 9):
        ops = (k2,) + tuple(pays[: nops - 1])
        bench(f"sort 64x[64K] {nops} operands",
              lambda *o: jax.lax.sort(o, num_keys=1, dimension=1), *ops)
    k128 = keys.reshape(m // 2, 131072)
    p128 = [p.reshape(m // 2, 131072) for p in pays]
    bench("sort 32x[128K] 5 operands",
          lambda *o: jax.lax.sort(o, num_keys=1, dimension=1),
          k128, *p128[:4])
    bench("sort 128x[32K] 5 operands",
          lambda *o: jax.lax.sort(o, num_keys=1, dimension=1),
          keys.reshape(2 * m, 32768), *[p.reshape(2 * m, 32768) for p in pays[:4]])

    # cumsum / prefix
    bench("jnp.cumsum [4M]", lambda x: jnp.cumsum(x), u)

    # scan steps
    x2 = u.reshape(1024, N // 1024)
    bench("lax.scan 1024 steps x [4K] lanes",
          lambda xs: jax.lax.scan(
              lambda c, r: (c + r, c), jnp.zeros(N // 1024, jnp.int32), xs)[0],
          x2)


if __name__ == "__main__":
    main()
