"""Experiment: Pallas per-grid-step overhead + current pipeline timing.

Round-1 measured ~6 ms per grid step (even empty kernels) through the axon
relay, which killed the Pallas pack kernel.  Re-measure on the current stack
before deciding the round-2 pack strategy.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def timeit(f, *args, reps=5):
    out = f(*args)
    jax.tree.map(lambda x: np.asarray(x), out)  # sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.tree.map(lambda x: np.asarray(x), out)
        best = min(best, time.perf_counter() - t0)
    return best


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1


def make_grid_fn(n_steps, rows):
    @jax.jit
    def f(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_steps * rows, 128), jnp.int32),
        )(x)
    return f


def main():
    print(jax.devices())
    rows = 8
    for n_steps in (1, 8, 64, 256):
        x = jnp.zeros((n_steps * rows, 128), jnp.int32)
        f = make_grid_fn(n_steps, rows)
        dt = timeit(f, x)
        print(f"pallas grid={n_steps:4d}: {dt*1e3:8.3f} ms total, "
              f"{dt*1e3/n_steps:8.4f} ms/step")

    # an inner-loop kernel: 1 grid step, fori_loop over 256 tiles inside
    def loop_kernel(x_ref, o_ref):
        def body(i, _):
            o_ref[pl.ds(i * 8, 8), :] = x_ref[pl.ds(i * 8, 8), :] + 1
            return 0
        jax.lax.fori_loop(0, 256, body, 0)

    @jax.jit
    def g(x):
        return pl.pallas_call(
            loop_kernel,
            out_shape=jax.ShapeDtypeStruct((256 * 8, 128), jnp.int32),
        )(x)

    x = jnp.zeros((256 * 8, 128), jnp.int32)
    dt = timeit(g, x)
    print(f"pallas 1-step fori(256): {dt*1e3:8.3f} ms")

    # baseline: current dynamic pipeline B=4
    from libdeflate_tpu.compress.tpu_dynamic import compress_chunks_dynamic
    B, N = 4, 1 << 20
    rng = np.random.default_rng(0)
    data = rng.integers(0, 64, (B, N), np.uint8)  # compressible-ish
    bufs = jnp.asarray(data)
    lens = jnp.full(B, N, jnp.int32)
    bf = jnp.zeros(B, bool)
    dt = timeit(compress_chunks_dynamic, bufs, lens, bf)
    print(f"compress_chunks_dynamic B=4: {dt*1e3:.2f} ms = "
          f"{B*N/dt/1e6:.1f} MB/s")


if __name__ == "__main__":
    main()
