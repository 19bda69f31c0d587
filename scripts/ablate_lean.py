"""Ablation timings for the lean DP tier (leanI config): FULL pipeline
with one stage stubbed per run — marginal cost WITH fusion effects.

Run from the repo root: python scripts/ablate_lean.py [names...]
"""

from __future__ import annotations

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
from libdeflate_tpu.compress import tpu_pipeline as tp
from libdeflate_tpu.compress.pallas_kernels import (
    dp_parse_pallas,
    pack_groups_pallas,
)

CHUNK = 1 << 20
BATCH = 4
DEPTH = 6
LADDER = to.LEN_LADDER_DENSE


def lean_pipeline(bufs, lengths, bfinal, ablate=()):
    """leanI: depth 6, no content, no wide, dense ladder, flat pass-1
    literal costs, 2 passes, refine 16 — with optional stage stubs."""
    n = bufs.shape[1]

    def cand(b, length):
        return tp._parse_candidates(
            b, length, depth=DEPTH, two_pass=False, hash3=False,
            wide_window=True, use_content=False, use_wide=False,
        )

    if "cand" in ablate:
        # matchfind stub: no matches at all (downstream shapes identical)
        def cand(b, length):  # noqa: F811
            n_pad, _, _ = tp._segment_sizes(n, wide=True)
            bp = jnp.pad(b, (0, n_pad - n))
            pos = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]
            z = jnp.zeros(n_pad, jnp.int32)
            return bp, pos, z, z, z, z, z, z, z

    bp, pos, lenA, dA, lenB, dB, lenC, dC, d3 = jax.vmap(cand)(bufs, lengths)
    n_pad = bp.shape[1]
    S_eff = to.DP_SEG

    if "extend" in ablate:
        # chain extension already inside cand; "extend" means pool: n/a
        pass

    # literal costs: flat mean (leanI), cache kept for pass 2
    def litc(b, length):
        return to._literal_costs(b, length, n_pad)

    cost_lit_full, lit_cache = jax.vmap(litc)(bufs, lengths)
    if "litsort" in ablate:
        cost_lit = jnp.full_like(cost_lit_full, 8 * to.BIT)
    else:
        def mean_cost(cache):
            hist = jnp.sum(cache, axis=0)[:256]   # [m, 257] row hists
            total = jnp.maximum(jnp.sum(hist), 1).astype(jnp.float32)
            bits = jnp.log2(total) - jnp.log2(
                jnp.maximum(hist, 1).astype(jnp.float32))
            c = jnp.clip(jnp.round(to.BIT * bits).astype(jnp.int32),
                         to.BIT, 15 * to.BIT)
            m = jnp.sum(jnp.where(hist > 0, hist * c, 0)) // total.astype(
                jnp.int32)
            return m.astype(jnp.int32)
        mc = jax.vmap(mean_cost)(lit_cache)
        cost_lit = jnp.broadcast_to(mc[:, None], cost_lit_full.shape)

    cdA = to._dist_cost(dA)
    cdB = to._dist_cost(dB)
    cdC = to._dist_cost(dC)
    cd3 = to._dist_cost(d3)
    lc_len = jnp.asarray(to._SEED_LC_LEN)

    if "dp" in ablate:
        span = jnp.ones_like(lenA)
        dist = jnp.zeros_like(lenA)
    else:
        span, dist = dp_parse_pallas(
            cost_lit, lenA, dA, cdA, lenB, dB, cdB, lenC, dC, cdC, d3, cd3,
            lc_len, S=S_eff, ladder=LADDER,
        )
    commit_match, commit_lit, eff = jax.vmap(
        lambda s, d, p, l: to._commit(s, d, p, l, S_eff)
    )(span, dist, pos, lengths)

    if "pass2" not in ablate:
        lit_lens, dist_lens = jax.vmap(
            lambda *a: to._code_lens_from_items(*a, n_pad)
        )(bp, commit_match, commit_lit, eff, dist)
        if "littrans2" in ablate:
            cost_lit = jnp.broadcast_to(
                jnp.full((1, 1), 8 * to.BIT, jnp.int32), cost_lit.shape)
        else:
            cost_lit = jax.vmap(
                lambda b, l, t, c: to._literal_costs(b, l, n_pad, table=t,
                                                     cache=c)[0]
            )(bp, lengths, lit_lens[:, :256] * to.BIT, lit_cache)
        lc_len = jax.vmap(to._lc_len_from_lens)(lit_lens)
        dcost_tab = jnp.where(dist_lens > 0, dist_lens, 14) * to.BIT

        def dcv(dmat, tab):
            def one(d, t):
                oslot, _, oextra = tp._offset_slot(jnp.maximum(d, 1))
                return to._take30(t, oslot) + to.BIT * oextra
            return jax.vmap(one)(dmat, tab)

        if "dp" in ablate:
            pass
        else:
            span, dist = dp_parse_pallas(
                cost_lit, lenA, dA, dcv(dA, dcost_tab), lenB, dB,
                dcv(dB, dcost_tab), lenC, dC, dcv(dC, dcost_tab), d3,
                dcv(d3, dcost_tab), lc_len, S=S_eff, ladder=LADDER,
            )
        commit_match, commit_lit, eff = jax.vmap(
            lambda s, d, p, l: to._commit(s, d, p, l, S_eff)
        )(span, dist, pos, lengths)

    def back(bp, commit_match, commit_lit, eff, dist, fin):
        (val, nb, offs), aux = td._emit_dynamic_pre(
            bp, commit_match, commit_lit, eff, dist, bp.shape[0],
            refine_passes=0 if "refine" in ablate else 16,
        )
        sbuf, gw = tp._group_premerge(val, nb, offs, capw=td.DYN_CAPW_DEEP)
        return sbuf, gw, aux

    sbuf, gw, aux = jax.vmap(back)(
        bp, commit_match, commit_lit, eff, dist, bfinal)
    if "pack" in ablate:
        words = sbuf[:, : td._dyn_nwords(n) // 128 + 1, :128].reshape(
            bufs.shape[0], -1)[:, : td._dyn_nwords(n)].astype(jnp.uint32)
    else:
        words = pack_groups_pallas(sbuf, gw, td._dyn_nwords(n))
    return jax.vmap(td._emit_dynamic_post)(words, aux, bfinal)


ABLATIONS = ["none", "cand", "litsort", "dp", "pass2", "littrans2",
             "refine", "pack"]


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
    names = [a for a in sys.argv[1:]] or ABLATIONS
    for name in names:
        ab = () if name == "none" else (name,)
        fn = jax.jit(lambda b, l, f, ab=ab: lean_pipeline(b, l, f, ab))
        try:
            outs = [fn(*b) for b in batches]
            for _, t in outs:
                _ = np.asarray(t)
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:100]}")
            continue
        dt = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            outs = [fn(*b) for b in batches]
            for _, t in outs:
                _ = np.asarray(t)
            dt = min(dt, time.perf_counter() - t0)
        nbytes = len(batches) * BATCH * CHUNK
        note = ""
        if name == "none":
            ww = np.asarray(outs[0][0])
            tt = np.asarray(outs[0][1])
            from libdeflate_tpu.compress.tpu_pipeline import (
                device_stream_to_bytes,
            )
            s = device_stream_to_bytes(ww[0], tt[0])
            ok = zlib.decompressobj(-15).decompress(s) == bufs_np[0].tobytes()
            note = "OK" if ok else "MISMATCH"
        print(f"{name:12s} {nbytes/dt/1e9:8.4f} GB/s "
              f"({dt*1000/len(batches):7.2f} ms/batch) {note}")


if __name__ == "__main__":
    main()
