"""Min-cost DP parse on the TPU — the device near-optimal quality tier.

TPU re-derivation of the reference's near-optimal parser
(lib/deflate_compress.c:3327-3399 `deflate_find_min_cost_path`, driven by
`deflate_compress_near_optimal` at 3592-3849): a shortest-path computation
over positions where edges are literals and match truncations.  The C code
walks a per-block node array backwards with a ~29-way inner min over
cached bt_matchfinder candidates; that regular sequential scan is exactly
the shape `lax.scan` runs at ~1-3 us/step — *vectorized across every
segment of every chunk in the batch at once*.

Design points, all driven by the measured chip cost model (PERF_NOTES.md):

- **Fixed length ladder.**  The DP reads D[t+len] for candidate lengths.
  Per-lane lengths would make that a gather (slow); instead candidate
  matches are evaluated at the fixed ladder of slot-top lengths
  {3..10, 12, 14, ..., 258} (truncating a match to any shorter length is
  always valid, and a slot-top wastes no extra-bit range).  Every read
  D[t+f] then has a *scalar* index — a cheap dynamic row slice from the
  circular cost window.  Long matches truncated to a ladder rung are
  recovered by continuation: the remainder at the same distance is
  itself a candidate at t+f (same source run), so chains re-join.
- **Circular cost window.**  The backwards costs D[t..t+258] live in a
  [512, lanes] carry indexed by (t & 511); each step writes one row
  (scalar index) and reads ~1+|ladder| rows (scalar indices).  No
  per-lane dynamic indexing anywhere.
- **Two candidates (+ len-3).**  The sorted matchfinder keeps the best
  and the best-with-a-different-distance match per position (their
  offset costs differ), plus an optional hash3 len-3 short-offset
  candidate — the truncated analogue of the bt matchfinder's full
  candidate list.
- **Entropy-seeded costs.**  Literal costs come from the chunk's own
  byte histogram (computed by the same segment-sort machinery used for
  symbol translation — one extra byte sort, zero gathers), quantized to
  1/16-bit units (the reference's BIT_COST).  Length/offset symbol costs
  are seeded from compact defaults (cf. the reference's default cost
  model at lib/deflate_compress.c:2986-3102) — measured on the bench
  corpus, one seeded pass recovers most of the iterated-refinement gain
  at a fraction of the cost.

Segments are independent (S = 1024 positions): matches are truncated at
segment ends by the ladder feasibility mask, and the commit FSM
(tpu_pipeline._greedy_commit) replays the DP's chosen chain exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .tpu_pipeline import (
    MAX_LEN,
    _greedy_commit,
    _greedy_commit_merge,
    _length_slot,
    _offset_slot,
    _parse_candidates,
    _segment_sizes,
)
from .tpu_dynamic import (
    DONT_CARE,
    NDIST,
    NSYM,
    _build_code_lens_pair,
    _hist_matmul,
    emit_dynamic_block,
)

# Slot-top candidate lengths: singles 3..10 (slots 0-7), then the top of
# each extra-bit band (base + 2^eb - 1) so no extra-bit range is wasted,
# then 258 (slot 28, zero extra bits).
LEN_LADDER = (3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 16, 18, 22, 26, 30, 34,
              42, 50, 58, 66, 82, 98, 114, 130, 162, 194, 226, 258)

# Dense ladder: every length 3..34 plus the extra-bit band tops above —
# more rungs recover the truncation waste of the sparse ladder (emitting
# any length is legal; slot/extra-bit encoding handles off-top lengths).
# Costs scale the DP kernel's inner loop only (measured ~free on-chip).
LEN_LADDER_DENSE = tuple(range(3, 35)) + (38, 42, 46, 50, 58, 66, 82, 98,
                                          114, 130, 162, 194, 226, 258)
# Denser still: every length through 66, then half-band steps
LEN_LADDER_DENSE2 = tuple(range(3, 67)) + (74, 82, 90, 98, 106, 114, 122,
                                           130, 146, 162, 178, 194, 210,
                                           226, 242, 258)

DP_SEG = 1024          # DP/commit segment (positions)
_WIN = 512             # circular cost-window rows (>= 258 + 1, power of 2)
BIT = 16               # cost unit = 1/16 bit (the reference's BIT_COST)

# Seeded symbol costs (1/16-bit units).  Length/dist symbol seeds fall
# between the static code (7/5 bits) and typical dynamic codes; tuned on
# the bench corpus.
LEN_SYM_COST = 7 * BIT
DIST_SYM_COST = 5 * BIT


def _ladder_costs():
    """Per-rung length-symbol seed cost: LEN_SYM_COST + 16 * extra_bits."""
    f = np.asarray(LEN_LADDER)
    l1 = f - 3
    k = np.maximum(np.int64(np.floor(np.log2(np.maximum(l1, 1)))), 0)
    band_slot = 4 * k - 4 + ((l1 >> np.maximum(k - 2, 0)) & 3)
    slot = np.where(f <= 10, l1, np.where(f >= 258, 28, band_slot))
    extra = np.where(slot < 8, 0, np.where(slot >= 28, 0, (slot >> 2) - 1))
    return (LEN_SYM_COST + BIT * extra).astype(np.int32)


_LADDER_COSTS = _ladder_costs()


def _byte_table_select(bp: jax.Array, cost: jax.Array) -> jax.Array:
    """Exact per-position cost[bp[i]] for a [256] table of byte-sized
    values via a packed-word binary select tree: the table rides as 64
    u32 words (4 costs each), selected per position over the 6 high index
    bits (63 selects total), then the byte is extracted arithmetically.
    ~1.5 ms/4 MiB vs ~6 ms for the round-3 sort-based translate.  The
    316-symbol emit table rides the same idea at 16-bit fields
    (tpu_dynamic._tree_translate)."""
    c = cost.astype(jnp.uint32).reshape(64, 4)
    words = (c[:, 0] | (c[:, 1] << jnp.uint32(8))
             | (c[:, 2] << jnp.uint32(16)) | (c[:, 3] << jnp.uint32(24)))
    idx = (bp >> jnp.uint8(2)).astype(jnp.int32)
    level = [jnp.broadcast_to(words[k], bp.shape) for k in range(64)]
    for bit in range(6):
        b = ((idx >> bit) & 1) == 1
        level = [jnp.where(b, level[2 * k + 1], level[2 * k])
                 for k in range(len(level) // 2)]
    sh = ((bp & jnp.uint8(3)).astype(jnp.uint32)) << jnp.uint32(3)
    return ((level[0] >> sh) & jnp.uint32(0xFF)).astype(jnp.int32)


def _literal_costs(bp: jax.Array, length: jax.Array, n_pad: int,
                   table: jax.Array | None = None, cache=None,
                   sample: int = 1):
    """Per-position literal cost (1/16-bit units) from the chunk's byte
    histogram: one one-hot MXU matmul yields per-row byte counts
    (`_hist_matmul`); the per-position translation goes through the
    packed-word select tree (_byte_table_select) — the costs are
    <= 15*BIT = 240, one byte each.

    With ``table`` (a [256] i32 cost table, e.g. real code lengths * 16),
    the histogram entropy seeding is skipped entirely and bytes translate
    through the given costs (no histogram at all).  ``cache`` (returned
    as the second output) carries the per-64K-row histogram [m, 257]
    across cost passes (row semantics for the row_lit1 variant)."""
    if table is None:
        # seeding histogram; `sample` strides the byte array (the seed
        # needs frequencies, not exact counts — a 4x sample shrinks the
        # matmul by 4x for a sub-0.01pp ratio effect, measured)
        n_s = n_pad // sample
        if cache is None:
            pos = jax.lax.broadcasted_iota(jnp.int32, (n_s, 1), 0)[:, 0]
            sym = jnp.where(pos * sample < length,
                            bp[::sample].astype(jnp.int32), 256)
            rows = max(n_s // 65536, 1)
            # rows*128 must divide the sym length for _hist_matmul's
            # reshape; pad with class 256 (dropped by the [:256] slice
            # below) so arbitrary n_pad/sample combinations trace.
            n_rs = -(-n_s // (rows * 128)) * (rows * 128)
            if n_rs != n_s:
                sym = jnp.concatenate(
                    [sym, jnp.full((n_rs - n_s,), 256, sym.dtype)])
            cache = _hist_matmul(sym, 257, rows=rows)
            if rows == 1:
                cache = cache[None]
        h = jnp.sum(cache, axis=0)[:256]
        total = jnp.maximum(jnp.sum(h), 1).astype(jnp.float32)
        # cost = -16*log2(p), clamped to [1, 15] bits (the dynamic-code cap)
        bits = jnp.log2(total) - jnp.log2(jnp.maximum(h, 1).astype(jnp.float32))
        cost = jnp.clip(jnp.round(BIT * bits).astype(jnp.int32), BIT, 15 * BIT)
        cost = jnp.where(h > 0, cost, 15 * BIT)
    else:
        cost = jnp.where(table > 0, table, 14 * BIT).astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]
    c_at = _byte_table_select(bp, cost)
    return jnp.where(pos < length, c_at, 0), cache


def _dist_cost(dist: jax.Array) -> jax.Array:
    """Seeded offset cost: DIST_SYM_COST + 16 * extra_bits(slot).
    extra = max(bsr(d-1) - 1, 0) — the slot's (slot>>1)-1 collapsed to
    arithmetic on d directly (runs on four [n] arrays per chunk)."""
    o1 = jnp.maximum(dist, 1) - 1
    k = 31 - jax.lax.clz(jnp.maximum(o1.astype(jnp.int32), 1))
    return DIST_SYM_COST + BIT * jnp.maximum(k - 1, 0)


def _seed_lc_len() -> np.ndarray:
    """Seeded per-length match cost table [259]: LEN_SYM_COST + 16*extra.
    Evaluates to the same values the rung/tail formulas used, so pass 1
    is bit-identical to the pre-table formulation."""
    f = np.arange(259)
    l1 = np.maximum(f - 3, 1)
    k = np.maximum(np.int64(np.floor(np.log2(l1))), 0)
    band_slot = 4 * k - 4 + ((l1 >> np.maximum(k - 2, 0)) & 3)
    slot = np.where(f <= 10, np.maximum(f - 3, 0),
                    np.where(f >= 258, 28, band_slot))
    extra = np.where((slot < 8) | (slot >= 28), 0, (slot >> 2) - 1)
    out = (LEN_SYM_COST + BIT * extra).astype(np.int32)
    out[:3] = 1 << 28      # lengths < 3 are not matches
    return out


_SEED_LC_LEN = _seed_lc_len()

# Short-match seed bias (r5): the candidate pool holds ~91% of the short
# matches the reference's lazy -6 commits, but pass-1 seeded costs price
# them out (PERF_NOTES r5 diagnosis).  Subtracting 3 bits from the seed
# cost of len <= 8 matches, with a real-cost pass 2 keeping only the
# genuinely cheap ones, improves BOTH measured corpora
# (corpus1 34.07 -> 33.85, corpus2-text 28.04 -> 27.30 at lean-class
# settings).  Applied to the passes >= 2 tiers; the single-pass lean
# headline keeps an unbiased seed (flat corpus1 optimum).
_SHORT_BIAS16 = np.where(np.arange(259) <= 8, 3 * BIT, 0).astype(np.int32)


def _lc_len_from_lens(lit_lens: jax.Array) -> jax.Array:
    """Per-length match cost table [259] from real litlen code lengths
    (the pass-2 refinement costs, role of deflate_set_costs_from_codes,
    lib/deflate_compress.c:2924-2957)."""
    f = jnp.arange(259, dtype=jnp.int32)
    lslot, _, lextra = _length_slot(jnp.maximum(f, 3))
    sym_len = jnp.take(lit_lens, 257 + lslot, mode="clip")
    sym_len = jnp.where(sym_len > 0, sym_len, 14)     # unused sym: cap cost
    out = sym_len * BIT + BIT * lextra
    return jnp.where(f < 3, jnp.int32(1 << 28), out)


def _take30(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather-free 30-entry table lookup: binary select tree on the slot
    bits (31 VPU selects; a [n]-sized gather costs ~7.5 ns/elem on the
    chip, PERF_NOTES.md)."""
    vals = [table[k] for k in range(30)] + [table[29], table[29]]
    for bit in (1, 2, 4, 8, 16):
        hi = (idx & bit) > 0
        vals = [jnp.where(hi, vals[k + 1], vals[k])
                for k in range(0, len(vals), 2)]
    return vals[0]


def _dp_parse(cost_lit, lenA, dA, cdA, lenB, dB, cdB, lenC, dC, cdC,
              d3, cd3, lc_len, S: int, ladder=LEN_LADDER):
    """Backwards min-cost DP over independent S-position segments.

    All inputs are [n_pad] arrays; returns (span, dist) per position —
    span == 1 for a literal, span >= 3 with dist > 0 for a match edge.
    """
    n_pad = cost_lit.shape[0]
    m = n_pad // S

    def rows(x):                       # [n_pad] -> [S, m] (step-major)
        return x.reshape(m, S).T

    packA = (lenA.astype(jnp.uint32) << jnp.uint32(18)) | dA.astype(jnp.uint32)
    packB = (lenB.astype(jnp.uint32) << jnp.uint32(18)) | dB.astype(jnp.uint32)
    packC = (lenC.astype(jnp.uint32) << jnp.uint32(18)) | dC.astype(jnp.uint32)
    xs = (
        jnp.arange(S, dtype=jnp.int32),           # t
        rows(cost_lit),
        rows(packA), rows(cdA),
        rows(packB), rows(cdB),
        rows(packC), rows(cdC),
        rows(d3), rows(cd3),
    )

    ladder = np.asarray(ladder, np.int32)

    def step(W, x):
        t, clit, pA, cA, pB, cB, pC, cC, dd3, c3 = x
        lA = (pA >> jnp.uint32(18)).astype(jnp.int32)
        dAr = (pA & jnp.uint32(0x3FFFF)).astype(jnp.int32)
        lB = (pB >> jnp.uint32(18)).astype(jnp.int32)
        dBr = (pB & jnp.uint32(0x3FFFF)).astype(jnp.int32)
        lC = (pC >> jnp.uint32(18)).astype(jnp.int32)
        dCr = (pC & jnp.uint32(0x3FFFF)).astype(jnp.int32)

        best = clit + jax.lax.dynamic_slice_in_dim(W, (t + 1) & (_WIN - 1), 1, 0)[0]
        bspan = jnp.ones_like(best)
        bdist = jnp.zeros_like(best)

        for fi, f in enumerate(ladder):
            f = int(f)
            Df = jax.lax.dynamic_slice_in_dim(W, (t + f) & (_WIN - 1), 1, 0)[0]
            okA = lA >= f
            okB = lB >= f
            # select min-cost feasible distance among A/B/C (and d3 at f==3)
            cd = jnp.where(okA, cA, jnp.int32(1 << 28))
            dsel = dAr
            useB = okB & (cB < cd)
            cd = jnp.where(useB, cB, cd)
            dsel = jnp.where(useB, dBr, dsel)
            useC = (lC >= f) & (cC < cd)
            cd = jnp.where(useC, cC, cd)
            dsel = jnp.where(useC, dCr, dsel)
            if f == 3:
                ok3 = dd3 > 0
                use3 = ok3 & (c3 < cd)
                cd = jnp.where(use3, c3, cd)
                dsel = jnp.where(use3, dd3, dsel)
            feas_t = t + f <= S           # scalar (segment-end truncation)
            cand = jnp.where(feas_t, cd + lc_len[f] + Df, jnp.int32(1 << 29))
            better = cand < best
            best = jnp.where(better, cand, best)
            bspan = jnp.where(better, f, bspan)
            bdist = jnp.where(better, dsel, bdist)

        # boundary candidate: length exactly S - t (a scalar, uniform across
        # lanes) reaches the segment end in one match where the ladder would
        # decompose the tail into several rungs; D[S] == 0 by construction
        f_tail = S - t
        tail_sane = (f_tail >= 3) & (f_tail <= MAX_LEN)
        okA_t = lA >= f_tail
        okB_t = lB >= f_tail
        cd_t = jnp.where(okA_t, cA, jnp.int32(1 << 28))
        dsel_t = dAr
        useB_t = okB_t & (cB < cd_t)
        cd_t = jnp.where(useB_t, cB, cd_t)
        dsel_t = jnp.where(useB_t, dBr, dsel_t)
        useC_t = (lC >= f_tail) & (cC < cd_t)
        cd_t = jnp.where(useC_t, cC, cd_t)
        dsel_t = jnp.where(useC_t, dCr, dsel_t)
        c_tail = jnp.where(
            tail_sane,
            cd_t + jax.lax.dynamic_index_in_dim(
                lc_len, jnp.clip(f_tail, 0, 258), keepdims=False),
            jnp.int32(1 << 29),
        )
        better_t = c_tail < best
        best = jnp.where(better_t, c_tail, best)
        bspan = jnp.where(better_t, f_tail, bspan)
        bdist = jnp.where(better_t, dsel_t, bdist)

        W = jax.lax.dynamic_update_slice_in_dim(
            W, best[None, :], t & (_WIN - 1), 0
        )
        choice = (bspan.astype(jnp.uint32) << jnp.uint32(16)) | bdist.astype(jnp.uint32)
        return W, choice

    W0 = jnp.zeros((_WIN, m), jnp.int32)
    _, choices = jax.lax.scan(step, W0, xs, reverse=True)
    span = (choices >> jnp.uint32(16)).astype(jnp.int32).T.reshape(n_pad)
    dist = (choices & jnp.uint32(0xFFFF)).astype(jnp.int32).T.reshape(n_pad)
    return span, dist


def _commit(span, dist, pos, length, S_eff):
    is_match = (span >= 3) & (dist > 0)
    committed, eff = _greedy_commit_merge(span, is_match, dist, S_eff)
    live = pos < length
    commit_match = committed & (eff >= 3) & live
    commit_lit = committed & (eff < 3) & live
    return commit_match, commit_lit, eff


def _code_lens_from_items(bp, commit_match, commit_lit, eff, dist,
                          n_pad: int):
    """Real litlen/offset code lengths for the items of a parse pass
    (the refinement step of deflate_near_optimal's iterated costs,
    lib/deflate_compress.c:3416-3530)."""
    lslot, _, _ = _length_slot(jnp.maximum(eff, 3))
    oslot, _, _ = _offset_slot(jnp.maximum(dist, 1))
    prev_match = jnp.concatenate([jnp.zeros(1, bool), commit_match[:-1]])
    oslot_b = jnp.concatenate([jnp.zeros(1, jnp.int32), oslot[:-1]])
    sym = jnp.where(
        commit_match, 257 + lslot,
        jnp.where(prev_match, NSYM + oslot_b,
                  jnp.where(commit_lit, bp.astype(jnp.int32), DONT_CARE)))
    hist = _hist_matmul(sym, NSYM + NDIST)
    hist_lit = hist[:NSYM].at[256].add(1)
    hist_lit = hist_lit.at[0].add(jnp.where(hist_lit[0] == 0, 1, 0))
    hist_dist = hist[NSYM:]
    hist_dist = hist_dist.at[0].add(jnp.where(hist_dist[0] == 0, 1, 0))
    hist_dist = hist_dist.at[1].add(jnp.where(hist_dist[1] == 0, 1, 0))
    from .tpu_dynamic import MAX_CODE_LEN_DEEP
    lit_lens, dist_lens, _, _ = _build_code_lens_pair(
        hist_lit, hist_dist, 16, MAX_CODE_LEN_DEEP)
    return lit_lens, dist_lens


def parse_chunk_optimal(b: jax.Array, length: jax.Array, depth: int = 6,
                        two_pass: bool = False, hash3: bool = False,
                        wide_window: bool = True, S: int = DP_SEG,
                        passes: int = 1, use_content: bool = True,
                        use_wide: bool = True, ladder=LEN_LADDER,
                        ext_c: bool = True, lcp: int = 16,
                        row_lit1: bool = False,
                        strides2=(1, 2, 4, 8, 16, 32, 64, 128),
                        strides1=(1, 2, 4, 8, 16, 32, 64, 128),
                        lit_sample: int = 1,
                        content_doublings: int = 0,
                        content_round_probes: bool = False,
                        match_bias16=0):
    """Candidate generation + cost seeding + DP + commit, optionally
    iterated: pass k >= 2 re-derives symbol costs from pass k-1's real
    code lengths and re-runs the DP (the reference's iterated cost
    refinement, lib/deflate_compress.c:3416-3530).  Returns the same
    tuple contract as tpu_pipeline._parse_chunk."""
    bp, pos, lenA, dA, lenB, dB, lenC, dC, d3 = _parse_candidates(
        b, length, depth=depth, two_pass=two_pass, hash3=hash3,
        wide_window=wide_window, use_content=use_content, use_wide=use_wide,
        ext_c=ext_c, lcp=lcp, strides2=strides2, strides1=strides1,
        content_doublings=content_doublings,
        content_round_probes=content_round_probes,
    )
    n_pad = bp.shape[0]
    S_eff = S if (n_pad % S == 0 and n_pad >= S) else n_pad

    cost_lit, lit_cache = _literal_costs(bp, length, n_pad)
    if row_lit1:
        hrow = lit_cache[:, :256]
        total = jnp.maximum(jnp.sum(hrow, axis=1), 1).astype(jnp.float32)
        bits = (jnp.log2(total)[:, None]
                - jnp.log2(jnp.maximum(hrow, 1).astype(jnp.float32)))
        c = jnp.clip(jnp.round(BIT * bits).astype(jnp.int32), BIT, 15 * BIT)
        num = jnp.sum(jnp.where(hrow > 0, hrow * c, 0), axis=1)
        rc = (num // jnp.maximum(total.astype(jnp.int32), 1)).astype(jnp.int32)
        m = rc.shape[0]
        cost_lit = jnp.broadcast_to(
            rc[:, None], (m, n_pad // m)).reshape(n_pad)
    cdA = _dist_cost(dA)
    cdB = _dist_cost(dB)
    cdC = _dist_cost(dC)
    cd3 = _dist_cost(d3)
    # match_bias16 (1/16-bit units, may be traced) tilts the PASS-1 seed
    # toward matches: the r5 text-gap diagnosis showed the DP holds ~80%
    # of the short matches the reference's lazy -6 commits but rejects
    # them on seeded costs (candidate-existence experiment, PERF_NOTES)
    lc_len = jnp.maximum(jnp.asarray(_SEED_LC_LEN) - match_bias16, 1)
    lc_len = jnp.where(jnp.arange(259) < 3, jnp.int32(1 << 28), lc_len)

    span, dist = _dp_parse(
        cost_lit, lenA, dA, cdA, lenB, dB, cdB, lenC, dC, cdC, d3, cd3,
        lc_len, S_eff, ladder=ladder
    )
    commit_match, commit_lit, eff = _commit(span, dist, pos, length, S_eff)

    for _ in range(passes - 1):
        lit_lens, dist_lens = _code_lens_from_items(
            bp, commit_match, commit_lit, eff, dist, n_pad)
        # literal costs: translate each byte through the real lens
        cost_lit, _ = _literal_costs(
            bp, length, n_pad, table=lit_lens[:256] * BIT, cache=lit_cache)
        lc_len = _lc_len_from_lens(lit_lens)
        dcost_tab = jnp.where(dist_lens > 0, dist_lens, 14) * BIT

        def dc(d):
            oslot, _, oextra = _offset_slot(jnp.maximum(d, 1))
            return _take30(dcost_tab, oslot) + BIT * oextra

        span, dist = _dp_parse(
            cost_lit, lenA, dA, dc(dA), lenB, dB, dc(dB), lenC, dC,
            dc(dC), d3, dc(d3), lc_len, S_eff, ladder=ladder
        )
        commit_match, commit_lit, eff = _commit(span, dist, pos, length,
                                                S_eff)
    return bp, pos, commit_match, commit_lit, eff, dist


def compress_chunk_optimal(b: jax.Array, length: jax.Array, bfinal: jax.Array,
                           depth: int = 6, two_pass: bool = False,
                           hash3: bool = False, passes: int = 1,
                           use_content: bool = True, use_wide: bool = True,
                           ladder=LEN_LADDER, refine_passes: int = 16,
                           **parse_kw):
    """Min-cost-DP dynamic-block chunk compressor; same output contract as
    compress_chunk_dynamic (byte-aligned fragment, sync flush).  Extra
    keyword args (ext_c, lcp, strides2, row_lit1) pass through to
    parse_chunk_optimal."""
    n = b.shape[0]
    bp, pos, commit_match, commit_lit, eff, dist = parse_chunk_optimal(
        b, length, depth=depth, two_pass=two_pass, hash3=hash3,
        wide_window=not (two_pass or hash3), passes=passes,
        use_content=use_content, use_wide=use_wide, ladder=ladder,
        **parse_kw,
    )
    return emit_dynamic_block(
        bp, bfinal, commit_match, commit_lit, eff, dist, n, bp.shape[0],
        refine_passes=refine_passes,
    )


@jax.jit
def compress_chunks_optimal(bufs: jax.Array, lengths: jax.Array, bfinal: jax.Array):
    """vmapped DP-parse chunk compressor: uint8[B, N], int32[B], bool[B]
    -> (uint32[B, W], int32[B])."""
    return jax.vmap(compress_chunk_optimal)(bufs, lengths, bfinal)


@jax.jit
def compress_chunks_optimal2(bufs: jax.Array, lengths: jax.Array,
                             bfinal: jax.Array):
    """DP tier with one refined-cost pass (ratio -0.27pp on the CPU
    sample for ~1.3x the parse cost)."""
    return jax.vmap(
        lambda b, l, f: compress_chunk_optimal(b, l, f, passes=2)
    )(bufs, lengths, bfinal)


@jax.jit
def compress_chunks_optimal_deep(bufs: jax.Array, lengths: jax.Array,
                                 bfinal: jax.Array):
    """DP parse over rescue-pass + hash3 + 12-deep candidates (the device
    top-quality tier).  Config matches compress_chunks_optimal_deep_pallas
    (3 cost passes, 2 suffix-rank doublings in the content pass) so the
    two paths stay bit-exact cross-checks of each other."""
    return jax.vmap(
        lambda b, l, f: compress_chunk_optimal(
            b, l, f, depth=12, two_pass=True, hash3=True, passes=3,
            content_doublings=2, ladder=LEN_LADDER_DENSE2,
            match_bias16=jnp.asarray(_SHORT_BIAS16),
        )
    )(bufs, lengths, bfinal)


# ---------------------------------------------------------------------------
# Pallas variants: the backwards DP runs in the VMEM-scratch kernel
# (pallas_kernels.dp_parse_pallas) across all segments of the whole batch
# at once, and bit placement uses the Pallas pack kernel.  Candidate
# generation, cost seeding, commit, and entropy coding are unchanged.
# ---------------------------------------------------------------------------
def _compress_chunks_optimal_pallas(bufs, lengths, bfinal, *, depth: int,
                                    two_pass: bool, hash3: bool,
                                    passes: int = 1,
                                    use_content: bool = True,
                                    use_wide: bool = True,
                                    ladder=LEN_LADDER,
                                    refine: int = 16,
                                    flat_lit1: bool = False,
                                    row_lit1: bool = False,
                                    ext_c: bool = True,
                                    lcp8: bool = False,
                                    lcp: int = 16,
                                    strides2=(1, 2, 4, 8, 16, 32, 64, 128),
                                    strides1=(1, 2, 4, 8, 16, 32, 64, 128),
                                    lit_sample: int = 1,
                                    pm_group: int = 128,
                                    content_doublings: int = 0,
                                    content_round_probes: bool = False,
                                    match_bias16=0,
                                    emit_blocks: int = 1,
                                    interpret: bool = False):
    from .pallas_kernels import dp_parse_pallas, pack_groups_pallas
    from .tpu_dynamic import (
        DYN_CAPW,
        DYN_CAPW_DEEP,
        _dyn_nwords,
        _emit_dynamic_post,
        _emit_dynamic_pre,
        _emit_dynamic_pre_blocks,
    )
    from .tpu_pipeline import _group_premerge

    n = bufs.shape[1]

    def cand(b, length):
        bp, pos, lenA, dA, lenB, dB, lenC, dC, d3 = _parse_candidates(
            b, length, depth=depth, two_pass=two_pass, hash3=hash3,
            wide_window=not (two_pass or hash3), use_content=use_content,
            use_wide=use_wide, ext_c=ext_c,
            lcp=8 if lcp8 else lcp, strides2=strides2, strides1=strides1,
            content_doublings=content_doublings,
            content_round_probes=content_round_probes,
        )
        cost_lit, lit_cache = _literal_costs(bp, length, bp.shape[0],
                                             sample=lit_sample)
        return (bp, pos, cost_lit, lenA, dA, lenB, dB, lenC, dC, d3,
                lit_cache)

    (bp, pos, cost_lit, lenA, dA, lenB, dB, lenC, dC, d3,
     lit_cache) = jax.vmap(cand)(bufs, lengths)
    n_pad = bp.shape[1]
    if flat_lit1:
        # pass 1 runs on the MEAN literal cost (the byte sort still happens
        # for the cache, which pass 2's exact translate reuses) — skips the
        # pass-1 boundary-delta translate for ~2.5 ms/batch
        def mean_cost(cache):
            hist = jnp.sum(cache, axis=0)[:256]
            total = jnp.maximum(jnp.sum(hist), 1).astype(jnp.float32)
            bits = jnp.log2(total) - jnp.log2(
                jnp.maximum(hist, 1).astype(jnp.float32))
            c = jnp.clip(jnp.round(BIT * bits).astype(jnp.int32),
                         BIT, 15 * BIT)
            m = jnp.sum(jnp.where(hist > 0, hist * c, 0)) // total.astype(
                jnp.int32)
            return m.astype(jnp.int32)
        mc = jax.vmap(mean_cost)(lit_cache)
        cost_lit = jnp.broadcast_to(mc[:, None], cost_lit.shape)
    elif row_lit1:
        # per-64KB-row mean literal cost: row-LOCAL byte entropy from the
        # sort's per-row boundary counts, broadcast within the row — keeps
        # the flat variant's speed (no translate, no unpermute) while
        # adapting to content changes inside the chunk (rows map 1:1 onto
        # contiguous 64KB position ranges)
        def row_cost(cache):
            h = cache[:, :256]                   # [m, 257] row histogram
            total = jnp.maximum(jnp.sum(h, axis=1), 1).astype(jnp.float32)
            bits = (jnp.log2(total)[:, None]
                    - jnp.log2(jnp.maximum(h, 1).astype(jnp.float32)))
            c = jnp.clip(jnp.round(BIT * bits).astype(jnp.int32),
                         BIT, 15 * BIT)
            num = jnp.sum(jnp.where(h > 0, h * c, 0), axis=1)
            return (num // jnp.maximum(total.astype(jnp.int32), 1)
                    ).astype(jnp.int32)          # [m]
        rc = jax.vmap(row_cost)(lit_cache)       # [B, m]
        m = rc.shape[1]
        cost_lit = jnp.broadcast_to(
            rc[:, :, None], (rc.shape[0], m, n_pad // m)
        ).reshape(rc.shape[0], n_pad)
    S_eff = DP_SEG if (n_pad % DP_SEG == 0 and n_pad >= DP_SEG) else n_pad

    cdA = _dist_cost(dA)
    cdB = _dist_cost(dB)
    cdC = _dist_cost(dC)
    cd3 = _dist_cost(d3)
    # match_bias16 (1/16-bit units, may be traced) tilts the PASS-1 seed
    # toward matches: the r5 text-gap diagnosis showed the DP holds ~80%
    # of the short matches the reference's lazy -6 commits but rejects
    # them on seeded costs (candidate-existence experiment, PERF_NOTES)
    lc_len = jnp.maximum(jnp.asarray(_SEED_LC_LEN) - match_bias16, 1)
    lc_len = jnp.where(jnp.arange(259) < 3, jnp.int32(1 << 28), lc_len)

    span, dist = dp_parse_pallas(
        cost_lit, lenA, dA, cdA, lenB, dB, cdB, lenC, dC, cdC, d3, cd3,
        lc_len, S=S_eff, interpret=interpret, ladder=ladder,
    )
    commit_match, commit_lit, eff = jax.vmap(
        lambda s, d, p, l: _commit(s, d, p, l, S_eff)
    )(span, dist, pos, lengths)

    for _ in range(passes - 1):
        lit_lens, dist_lens = jax.vmap(
            lambda *a: _code_lens_from_items(*a, n_pad)
        )(bp, commit_match, commit_lit, eff, dist)
        cost_lit = jax.vmap(
            lambda b, l, t, c: _literal_costs(b, l, n_pad, table=t,
                                              cache=c)[0]
        )(bp, lengths, lit_lens[:, :256] * BIT, lit_cache)
        lc_len = jax.vmap(_lc_len_from_lens)(lit_lens)   # [B, 259]
        dcost_tab = jnp.where(dist_lens > 0, dist_lens, 14) * BIT

        def dcv(dmat, tab):
            def one(d, t):
                oslot, _, oextra = _offset_slot(jnp.maximum(d, 1))
                return _take30(t, oslot) + BIT * oextra
            return jax.vmap(one)(dmat, tab)

        span, dist = dp_parse_pallas(
            cost_lit, lenA, dA, dcv(dA, dcost_tab), lenB, dB,
            dcv(dB, dcost_tab), lenC, dC, dcv(dC, dcost_tab), d3,
            dcv(d3, dcost_tab), lc_len, S=S_eff, interpret=interpret,
            ladder=ladder,
        )
        commit_match, commit_lit, eff = jax.vmap(
            lambda s, d, p, l: _commit(s, d, p, l, S_eff)
        )(span, dist, pos, lengths)

    def back(bp, commit_match, commit_lit, eff, dist, fin):
        if emit_blocks > 1:
            (val, nb, offs), aux = _emit_dynamic_pre_blocks(
                bp, commit_match, commit_lit, eff, dist, bp.shape[0],
                emit_blocks, refine_passes=refine,
            )
            # worst premerge group = 128 RLE header items of <= 14 bits
            capw = max(DYN_CAPW_DEEP if refine else DYN_CAPW, 58)
        else:
            (val, nb, offs), aux = _emit_dynamic_pre(
                bp, commit_match, commit_lit, eff, dist, bp.shape[0],
                refine_passes=refine,
            )
            capw = DYN_CAPW_DEEP if refine else DYN_CAPW
        # smaller premerge groups shrink the [m, group, capw] merge tensor
        # (capw scales with the group's worst-case bits)
        capw = (capw - 1) * pm_group // 128 + 1
        sbuf, gw = _group_premerge(val, nb, offs, capw=capw, group=pm_group)
        return sbuf, gw, aux

    sbuf, gw, aux = jax.vmap(back)(
        bp, commit_match, commit_lit, eff, dist, bfinal)
    words = pack_groups_pallas(sbuf, gw, _dyn_nwords(n, emit_blocks),
                               interpret=interpret)
    return jax.vmap(_emit_dynamic_post)(words, aux, bfinal)


@functools.partial(jax.jit, static_argnames=("interpret",))
def compress_chunks_optimal_pallas(bufs, lengths, bfinal, interpret=False):
    """DP-parse tier with the Pallas DP + pack kernels."""
    return _compress_chunks_optimal_pallas(
        bufs, lengths, bfinal, depth=6, two_pass=False, hash3=False,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def compress_chunks_optimal2_pallas(bufs, lengths, bfinal, interpret=False):
    """Two-cost-pass DP tier (single-pass candidates) with Pallas
    kernels — the bench headline candidate (ratio beats libdeflate -6 on
    the CPU sample)."""
    return _compress_chunks_optimal_pallas(
        bufs, lengths, bfinal, depth=6, two_pass=False, hash3=False,
        passes=2, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def compress_chunks_optimal_deep_pallas(bufs, lengths, bfinal, interpret=False):
    """Deep DP tier (rescue pass + hash3 + 12-deep, 2 cost passes) with
    Pallas kernels."""
    return _compress_chunks_optimal_pallas(
        bufs, lengths, bfinal, depth=12, two_pass=True, hash3=True,
        passes=3, content_doublings=2, ladder=LEN_LADDER_DENSE2,
        match_bias16=jnp.asarray(_SHORT_BIAS16), interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def compress_chunks_optfast_pallas(bufs, lengths, bfinal, interpret=False):
    """Lean two-cost-pass DP tier: position-pass candidates only (no
    content pass, no 32-byte LCP payloads), dense length ladder, Pallas
    DP + pack kernels — the speed-oriented quality tier tuned to beat the
    libdeflate -6 ratio at the highest possible throughput."""
    return _compress_chunks_optimal_pallas(
        bufs, lengths, bfinal, depth=6, two_pass=False, hash3=False,
        passes=2, use_content=False, use_wide=False,
        ladder=LEN_LADDER_DENSE2, ext_c=False, strides2=(),
        match_bias16=jnp.asarray(_SHORT_BIAS16),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def compress_chunks_lean_pallas(bufs, lengths, bfinal, interpret=False):
    """Single-cost-pass lean DP tier — the bench headline candidate.

    passes=1 drops the whole second cost pass (code-lens sort +
    literal-cost re-translate + DP + commit, ~20 ms per 4-chunk batch);
    the densest length ladder (every length 3..66 + half-band steps)
    spends some of that speed back as ratio.  ext_c=False keeps the
    nearest-occurrence candidate raw (no K^2 relaxation slot),
    strides2=() drops the second relaxation round (+0.03pp on the full
    corpus), and refine=0 emits 11-bit codes (+0.07pp) whose packed
    values ride one-operand un-permute sorts.  lit_sample=32 (r5): the
    seed histogram's one-hot bf16 tensor is pure HBM bandwidth — 32x
    sampling took the tier 0.100 -> 0.110 GB/s for +0.011pp ratio
    (ls64 is SLOWER again; 32 is the measured knee).  Corpus ratio
    0.3408 vs libdeflate -6's 0.3412."""
    return _compress_chunks_optimal_pallas(
        bufs, lengths, bfinal, depth=6, two_pass=False, hash3=False,
        passes=1, use_content=False, use_wide=False,
        ladder=LEN_LADDER_DENSE2, ext_c=False, strides2=(), refine=0,
        lit_sample=32, interpret=interpret,
    )
