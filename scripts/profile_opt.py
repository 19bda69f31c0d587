"""Stage-level on-chip profiling of the DP (opt) compress tier.

Times each pipeline stage as its own jitted function over a B-chunk batch
(median of reps, first call discarded), so we can see where the opt tier's
per-chunk milliseconds go.  Run from the repo root: python scripts/profile_opt.py
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

CHUNK = 1 << 20
B = 4
REPS = 5


_FLOOR_MS = 0.0


def _scalarize(fn):
    """Wrap fn so the jitted computation ends in ONE i64 scalar (sum of all
    leaves) — a single dispatch + 8-byte d2h per call.  The relay's
    block_until_ready returns early and every extra leaf round-trip costs
    ~30 ms, so stage timings must ride exactly one sync."""
    def wrapped(*args):
        out = fn(*args)
        tot = jnp.int64(0) if jax.config.jax_enable_x64 else jnp.int32(0)
        for leaf in jax.tree.leaves(out):
            tot = tot + jnp.sum(leaf.astype(tot.dtype))
        return tot
    return jax.jit(wrapped)


def bench(name, fn, *args, keep=None):
    """Time the scalarized fn; returns keep(*args) (un-timed) if given."""
    sfn = _scalarize(fn)
    np.asarray(sfn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(sfn(*args))
        ts.append(time.perf_counter() - t0)
    ms = 1000 * float(np.median(ts)) - _FLOOR_MS
    print(f"{name:42s} {ms:9.2f} ms  ({ms/B:7.2f} ms/chunk)")
    if keep is not None:
        return keep(*args)
    return None


def main():
    rng = np.random.default_rng(7)
    base = open("/root/reference/lib/deflate_compress.c", "rb").read()
    data = (base * (CHUNK * B // len(base) + 1))[: CHUNK * B]
    bufs = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, CHUNK))
    lengths = jnp.full(B, CHUNK, jnp.int32)
    bfinal = jnp.zeros(B, bool)

    # ---- stage jits -------------------------------------------------------
    depth = 6

    cand_full = jax.jit(jax.vmap(
        lambda b, l: tp._parse_candidates(b, l, depth=depth, two_pass=False,
                                          hash3=False, wide_window=True)
    ))

    def cand_posonly(b, l):
        n = b.shape[0]
        n_pad, sort_seg, _ = tp._segment_sizes(n, wide=True)
        junk_val = tp._seg_key_params(sort_seg)[1]
        bp = jnp.pad(b, (0, n_pad - n))
        pos = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]
        words_u32 = tp._le32_words(bp, extra_pad=32)
        w4 = jnp.concatenate([words_u32[4:], jnp.zeros(4, jnp.uint32)])
        w8 = jnp.concatenate([words_u32[8:], jnp.zeros(8, jnp.uint32)])
        w12 = jnp.concatenate([words_u32[12:], jnp.zeros(12, jnp.uint32)])
        wide = tuple(
            jnp.concatenate([words_u32[k:], jnp.zeros(k, jnp.uint32)])
            for k in (16, 20, 24, 28)
        )
        h = ((words_u32 * jnp.uint32(tp.MULT)) >> jnp.uint32(32 - tp.HASH_ORDER)).astype(jnp.uint32)
        h = jnp.where(pos + tp.MIN_MATCH <= l, h, jnp.uint32(junk_val))
        rawA, rawB, rawC = tp._sorted_matchfind(
            h, words_u32, w4, w8, w12, sort_seg, depth=depth,
            return_triple=True, wide=wide)
        return rawA, rawB, rawC

    pos_pass = jax.jit(jax.vmap(cand_posonly))

    def cand_content(b, l):
        n = b.shape[0]
        n_pad, sort_seg, _ = tp._segment_sizes(n, wide=True)
        junk_val = tp._seg_key_params(sort_seg)[1]
        bp = jnp.pad(b, (0, n_pad - n))
        pos = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]
        words_u32 = tp._le32_words(bp, extra_pad=32)
        w4 = jnp.concatenate([words_u32[4:], jnp.zeros(4, jnp.uint32)])
        w8 = jnp.concatenate([words_u32[8:], jnp.zeros(8, jnp.uint32)])
        w12 = jnp.concatenate([words_u32[12:], jnp.zeros(12, jnp.uint32)])
        wide = tuple(
            jnp.concatenate([words_u32[k:], jnp.zeros(k, jnp.uint32)])
            for k in (16, 20, 24, 28)
        )
        h = ((words_u32 * jnp.uint32(tp.MULT)) >> jnp.uint32(32 - tp.HASH_ORDER)).astype(jnp.uint32)
        h = jnp.where(pos + tp.MIN_MATCH <= l, h, jnp.uint32(junk_val))
        return tp._content_sorted_matchfind(
            h, words_u32, w4, w8, w12, sort_seg,
            depth=max(depth * 2 // 3, 4), wide=wide)

    content_pass = jax.jit(jax.vmap(cand_content))

    def extend5(rawsA, rawsB, rawsC, rawsD, rawsE):
        return tp._chain_extend_multi([rawsA, rawsB, rawsC, rawsD, rawsE])

    extend5_j = jax.jit(jax.vmap(
        lambda a0, a1, a2, b0, b1, b2, c0, c1, c2, d0, d1, d2, e0, e1, e2:
        extend5((a0, a1, a2), (b0, b1, b2), (c0, c1, c2), (d0, d1, d2),
                (e0, e1, e2))
    ))

    extend3_j = jax.jit(jax.vmap(
        lambda a0, a1, a2, b0, b1, b2, c0, c1, c2:
        tp._chain_extend_multi([(a0, a1, a2), (b0, b1, b2), (c0, c1, c2)])
    ))

    # ---- run --------------------------------------------------------------
    print(f"B={B} chunks of {CHUNK>>20} MiB; reps={REPS} (median)")
    tiny = jnp.ones(128, jnp.int32)
    bench("null floor (dispatch+roundtrip)", lambda x: x * 2, tiny)

    raws = bench("pos-pass sort (9 ops, triple)", pos_pass, bufs, lengths,
                 keep=jax.jit(pos_pass))
    craw = bench("content pass (11 ops, 3 keys)", content_pass, bufs,
                 lengths, keep=jax.jit(content_pass))
    flat5 = [x for tri in raws for x in tri] + [craw[k] for k in range(6)]
    bench("chain_extend_multi x5", extend5_j, *flat5)
    flat3 = [x for tri in raws for x in tri]
    bench("chain_extend_multi x3", extend3_j, *flat3)
    cands = bench("_parse_candidates total", cand_full, bufs, lengths,
                  keep=cand_full)
    bp, pos = cands[0], cands[1]
    lenA, dA, lenB, dB, lenC, dC, d3 = cands[2:]
    n_pad = bp.shape[1]

    litc = jax.jit(jax.vmap(
        lambda b, l: to._literal_costs(b, l, n_pad)[0]))
    cost_lit = bench("_literal_costs (257-sym sort)", litc, bp, lengths,
                     keep=litc)

    dc4 = jax.jit(
        lambda a, b2, c, d: (to._dist_cost(a), to._dist_cost(b2),
                             to._dist_cost(c), to._dist_cost(d)))
    cdA = bench("dist costs x4", dc4, dA, dB, dC, d3, keep=dc4)

    from libdeflate_tpu.compress.pallas_kernels import dp_parse_pallas
    S_eff = to.DP_SEG
    lc_len = jnp.asarray(to._SEED_LC_LEN)
    dp_j = jax.jit(lambda *a: dp_parse_pallas(*a, S=S_eff))
    span, dist = bench(
        "DP pallas", dp_j, cost_lit, lenA, dA, cdA[0], lenB, dB, cdA[1],
        lenC, dC, cdA[2], d3, cdA[3], lc_len, keep=dp_j)

    commit_j = jax.jit(jax.vmap(
        lambda s, d, p, l: to._commit(s, d, p, l, S_eff)))
    commit_match, commit_lit, eff = bench(
        "commit FSM (merge)", commit_j, span, dist, pos, lengths,
        keep=commit_j)

    clfi = jax.jit(jax.vmap(
        lambda *a: to._code_lens_from_items(*a, n_pad)))
    bench("code_lens_from_items (316 sort)", clfi,
          bp, commit_match, commit_lit, eff, dist)

    # emit stages
    pre16_j = jax.jit(jax.vmap(
        lambda b, m, l, e, d: td._emit_dynamic_pre(b, m, l, e, d, n_pad, 16)))
    (val, nb, offs), aux = bench(
        "_emit_dynamic_pre refine=16 cap15", pre16_j,
        bp, commit_match, commit_lit, eff, dist, keep=pre16_j)
    pre0_j = jax.jit(jax.vmap(
        lambda b, m, l, e, d: td._emit_dynamic_pre(b, m, l, e, d, n_pad, 0)))
    bench("_emit_dynamic_pre refine=0 cap11", pre0_j,
          bp, commit_match, commit_lit, eff, dist)

    prem_j = jax.jit(jax.vmap(
        lambda v, nbk, o: tp._group_premerge(v, nbk, o, capw=td.DYN_CAPW_DEEP)))
    sbuf, gw = bench("_group_premerge cap61", prem_j, val, nb, offs,
                     keep=prem_j)
    prem45_j = jax.jit(jax.vmap(
        lambda v, nbk, o: tp._group_premerge(v, nbk, o, capw=td.DYN_CAPW)))
    bench("_group_premerge cap45", prem45_j, val, nb, offs)

    from libdeflate_tpu.compress.pallas_kernels import pack_groups_pallas
    nwords = td._dyn_nwords(CHUNK)
    pack_j = jax.jit(lambda s, g: pack_groups_pallas(s, g, nwords))
    bench("pack_groups_pallas cap61", pack_j, sbuf, gw)

    place_j = jax.jit(jax.vmap(lambda s, g: tp._group_place(s, g, nwords)))
    bench("XLA _group_place cap61", place_j, sbuf, gw)

    full_j = jax.jit(lambda b, l, f: to.compress_chunks_optimal2_pallas(b, l, f))
    bench("FULL opt2-pallas", full_j, bufs, lengths, bfinal)
    full1_j = jax.jit(lambda b, l, f: to.compress_chunks_optimal_pallas(b, l, f))
    bench("FULL opt1-pallas (passes=1)", full1_j, bufs, lengths, bfinal)
    full_d = jax.jit(lambda b, l, f: td.compress_chunks_dynamic_pallas(b, l, f))
    bench("FULL dyn1-pallas", full_d, bufs, lengths, bfinal)


if __name__ == "__main__":
    main()
