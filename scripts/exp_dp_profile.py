"""Per-stage timing of the DP pipeline via cumulative prefixes.

Each prefix of the pipeline is jitted once and returns a tiny scalar (d2h
of full arrays costs ~100 ms/MiB on this relay); stage costs are prefix
differences.  Device-profile friendly: 5 compiles total.
"""
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
    return best


def main():
    from libdeflate_tpu.compress.tpu_pipeline import (
        _parse_candidates, _greedy_commit)
    from libdeflate_tpu.compress.tpu_optimal import (
        _literal_costs, _dist_cost, _dp_parse, DP_SEG)
    from libdeflate_tpu.compress.tpu_dynamic import emit_dynamic_block

    corpus = make_corpus()
    B = 4
    bufs = jnp.asarray(
        np.frombuffer(corpus[: B * CHUNK], np.uint8).reshape(B, CHUNK))
    lens = jnp.full(B, CHUNK, jnp.int32)
    bf = jnp.zeros(B, bool)

    def upto(stage):
        def one(b, ln, f):
            bp, pos, lenA, dA, lenB, dB, d3 = _parse_candidates(
                b, ln, depth=6, wide_window=True)
            if stage == 0:
                return lenA.sum() + dA.sum() + lenB.sum()
            n_pad = bp.shape[0]
            cost_lit = _literal_costs(bp, ln, n_pad)
            if stage == 1:
                return cost_lit.sum() + lenA.sum()
            cdA, cdB, cd3 = _dist_cost(dA), _dist_cost(dB), _dist_cost(d3)
            S = DP_SEG if n_pad % DP_SEG == 0 else n_pad
            span, dist = _dp_parse(
                cost_lit, lenA, dA, cdA, lenB, dB, cdB, d3, cd3, S)
            if stage == 2:
                return span.sum() + dist.sum()
            is_match = (span >= 3) & (dist > 0)
            committed, eff = _greedy_commit(span, is_match, S)
            if stage == 3:
                return committed.sum() + eff.sum()
            live = pos < ln
            cm = committed & (eff >= 3) & live
            cl = committed & (eff < 3) & live
            w, t = emit_dynamic_block(bp, f, cm, cl, eff, dist,
                                      b.shape[0], n_pad, refine_passes=16)
            return w.sum() + t

        return jax.jit(lambda b, ln, f: jax.vmap(one)(b, ln, f))

    labels = ["candidates", "+lit costs", "+dp scan", "+commit", "+emit"]
    prev = 0.0
    for s, lab in enumerate(labels):
        dt = timeit(upto(s), bufs, lens, bf)
        print(f"{lab:11s}: {dt*1e3/B:7.2f} ms/chunk  (+{(dt-prev)*1e3/B:6.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
