"""Stage-level on-chip profile of the LEAN DP tier (the bench headline
candidate): passes=1, no content pass, no wide LCP payloads, dense ladder.

Run from the repo root: python scripts/profile_lean.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from libdeflate_tpu.compress import tpu_dynamic as td
from libdeflate_tpu.compress import tpu_optimal as to
from libdeflate_tpu.compress import tpu_pipeline as tp
from libdeflate_tpu.compress.pallas_kernels import (
    dp_parse_pallas,
    pack_groups_pallas,
)

CHUNK = 1 << 20
B = 4
REPS = 5


def _scalarize(fn):
    def wrapped(*args):
        out = fn(*args)
        tot = jnp.int32(0)
        for leaf in jax.tree.leaves(out):
            tot = tot + jnp.sum(leaf.astype(tot.dtype))
        return tot
    return jax.jit(wrapped)


def bench(name, fn, *args, keep=None):
    sfn = _scalarize(fn)
    np.asarray(sfn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(sfn(*args))
        ts.append(time.perf_counter() - t0)
    ms = 1000 * float(np.median(ts))
    print(f"{name:46s} {ms:9.2f} ms  ({ms/B:7.2f} ms/chunk)", flush=True)
    if keep is not None:
        return keep(*args)
    return None


def main():
    base = open("/root/reference/lib/deflate_compress.c", "rb").read()
    data = (base * (CHUNK * B // len(base) + 1))[: CHUNK * B]
    bufs = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, CHUNK))
    lengths = jnp.full(B, CHUNK, jnp.int32)
    bfinal = jnp.zeros(B, bool)

    print(f"B={B} chunks of {CHUNK>>20} MiB; reps={REPS} (median)")
    tiny = jnp.ones(128, jnp.int32)
    bench("null floor (dispatch+roundtrip)", lambda x: x * 2, tiny)

    # ---- lean candidates: pos pass only, no wide payloads ----
    cand_lean = jax.jit(jax.vmap(
        lambda b, l: tp._parse_candidates(
            b, l, depth=6, two_pass=False, hash3=False, wide_window=True,
            use_content=False, use_wide=False)
    ))
    cands = bench("_parse_candidates LEAN total", cand_lean, bufs, lengths,
                  keep=cand_lean)
    bp, pos = cands[0], cands[1]
    lenA, dA, lenB, dB, lenC, dC, d3 = cands[2:]
    n_pad = bp.shape[1]

    # pos-pass sort alone (triple, no wide operands)
    def posonly(b, l):
        n = b.shape[0]
        n_pad2, sort_seg, _ = tp._segment_sizes(n, wide=True)
        junk_val = tp._seg_key_params(sort_seg)[1]
        bpp = jnp.pad(b, (0, n_pad2 - n))
        p = jax.lax.broadcasted_iota(jnp.int32, (n_pad2, 1), 0)[:, 0]
        words_u32 = tp._le32_words(bpp, extra_pad=32)
        w4 = jnp.concatenate([words_u32[4:], jnp.zeros(4, jnp.uint32)])
        w8 = jnp.concatenate([words_u32[8:], jnp.zeros(8, jnp.uint32)])
        w12 = jnp.concatenate([words_u32[12:], jnp.zeros(12, jnp.uint32)])
        h = ((words_u32 * jnp.uint32(tp.MULT))
             >> jnp.uint32(32 - tp.HASH_ORDER)).astype(jnp.uint32)
        h = jnp.where(p + tp.MIN_MATCH <= l, h, jnp.uint32(junk_val))
        return tp._sorted_matchfind(
            h, words_u32, w4, w8, w12, sort_seg, depth=6,
            return_triple=True, wide=None)
    pos_j = jax.jit(jax.vmap(posonly))
    raws = bench("  pos-pass sort (5 ops, triple)", pos_j, bufs, lengths,
                 keep=pos_j)
    flat3 = [x for tri in raws for x in tri]
    ext3 = jax.jit(jax.vmap(
        lambda a0, a1, a2, b0, b1, b2, c0, c1, c2:
        tp._chain_extend_multi([(a0, a1, a2), (b0, b1, b2), (c0, c1, c2)])
    ))
    bench("  chain_extend_multi x3", ext3, *flat3)
    ext2 = jax.jit(jax.vmap(
        lambda a0, a1, a2, b0, b1, b2:
        tp._chain_extend_multi([(a0, a1, a2), (b0, b1, b2)])
    ))
    bench("  chain_extend_multi x2 (no C)", ext2, *flat3[:6])

    litc = jax.jit(jax.vmap(
        lambda b, l: to._literal_costs(b, l, n_pad)[0]))
    cost_lit = bench("_literal_costs (257-sym sort)", litc, bp, lengths,
                     keep=litc)

    dc4 = jax.jit(
        lambda a, b2, c, d: (to._dist_cost(a), to._dist_cost(b2),
                             to._dist_cost(c), to._dist_cost(d)))
    cd = bench("dist costs x4", dc4, dA, dB, dC, d3, keep=dc4)

    S_eff = to.DP_SEG
    lc_len = jnp.asarray(to._SEED_LC_LEN)
    for nm, lad in (("sparse28", to.LEN_LADDER),
                    ("dense46", to.LEN_LADDER_DENSE),
                    ("dense2_80", to.LEN_LADDER_DENSE2)):
        dp_j = jax.jit(lambda *a, _l=lad: dp_parse_pallas(*a, S=S_eff, ladder=_l))
        out = bench(f"DP pallas [{nm}]", dp_j, cost_lit, lenA, dA, cd[0],
                    lenB, dB, cd[1], lenC, dC, cd[2], d3, cd[3], lc_len,
                    keep=dp_j)
    span, dist = out

    commit_j = jax.jit(jax.vmap(
        lambda s, d, p, l: to._commit(s, d, p, l, S_eff)))
    commit_match, commit_lit, eff = bench(
        "commit FSM (merge)", commit_j, span, dist, pos, lengths,
        keep=commit_j)

    for rp in (16, 4, 0):
        pre_j = jax.jit(jax.vmap(
            lambda b, m, l, e, d, _r=rp: td._emit_dynamic_pre(
                b, m, l, e, d, n_pad, _r)))
        r = bench(f"_emit_dynamic_pre refine={rp}", pre_j,
                  bp, commit_match, commit_lit, eff, dist,
                  keep=pre_j if rp == 16 else None)
        if rp == 16:
            (val, nb, offs), aux = r

    prem_j = jax.jit(jax.vmap(
        lambda v, nbk, o: tp._group_premerge(v, nbk, o, capw=td.DYN_CAPW_DEEP)))
    sbuf, gw = bench("_group_premerge cap61", prem_j, val, nb, offs,
                     keep=prem_j)
    nwords = td._dyn_nwords(CHUNK)
    pack_j = jax.jit(lambda s, g: pack_groups_pallas(s, g, nwords))
    bench("pack_groups_pallas", pack_j, sbuf, gw)

    full = jax.jit(lambda b, l, f: to._compress_chunks_optimal_pallas(
        b, l, f, depth=6, two_pass=False, hash3=False, passes=1,
        use_content=False, use_wide=False, ladder=to.LEN_LADDER_DENSE2))
    bench("FULL lean1J (p1, dense2)", full, bufs, lengths, bfinal)


if __name__ == "__main__":
    main()
