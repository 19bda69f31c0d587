"""Pallas TPU kernels for the compress pipeline's sequential cores.

Round-1 measured ~6 ms of fixed overhead per Pallas grid step through the
relay stack, which parked these; the current stack measures ~0.1 ms per
grid step and ~1-3 us per in-kernel loop iteration, so the two
sequential hot spots move from XLA (`lax.scan` at ~25-50 us/step, scatter
at ~10 ns/elem) into kernels:

1. **Min-cost DP** (`dp_parse_pallas`) — the backwards shortest-path over
   positions (the device near-optimal parser, role parity with
   `deflate_find_min_cost_path`, lib/deflate_compress.c:3327-3399).  The
   cost window D[t..t+258] lives in a VMEM scratch of S rows indexed
   (t mod S); every read/write is a *scalar-indexed* row of shape
   [1, 8, 128] (8x128 = one full VPU tile, 1024 DP lanes per row), so the
   28-rung inner min is straight-line vector code with zero gathers.
   Lanes = independent 1024-position segments across all chunks of the
   batch.  The t axis streams through the grid in reverse 256-row blocks
   (double-buffered), keeping VMEM ~6 MB.

2. **Bit packing** (`pack_groups_pallas`) — places 128-position group
   buffers (pre-merged 47-word bit runs) at absolute word offsets with a
   sequential in-kernel RMW loop instead of XLA's scatter-add (the
   ADD_BITS/FLUSH_BITS role, lib/deflate_compress.c:688-751).  A group's
   words are rotated to their lane offset with one circular roll and OR'd
   into a 2-row window; offsets only ever increase, and the group buffer
   is zero past word 47, so the wrapped lanes land exactly in the second
   row.

Both kernels are bit-exact ports of the XLA formulations they replace
(tpu_optimal._dp_parse / tpu_pipeline._group_pack) and are verified
against them in tests (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_LEN = 258

# Mirrors tpu_optimal's ladder/costs; imported there to stay in sync.
LEN_LADDER = (3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 16, 18, 22, 26, 30, 34,
              42, 50, 58, 66, 82, 98, 114, 130, 162, 194, 226, 258)
BIT = 16
LEN_SYM_COST = 7 * BIT
DIST_SYM_COST = 5 * BIT

_BIG = 1 << 28
_BIG2 = 1 << 29


def _ladder_costs_np():
    f = np.asarray(LEN_LADDER)
    l1 = f - 3
    k = np.maximum(np.int64(np.floor(np.log2(np.maximum(l1, 1)))), 0)
    band_slot = 4 * k - 4 + ((l1 >> np.maximum(k - 2, 0)) & 3)
    slot = np.where(f <= 10, l1, np.where(f >= 258, 28, band_slot))
    extra = np.where(slot < 8, 0, np.where(slot >= 28, 0, (slot >> 2) - 1))
    return (LEN_SYM_COST + BIT * extra).astype(np.int32)


_LADDER_COSTS = _ladder_costs_np()


def _bsr(x):
    return 31 - jax.lax.clz(jnp.maximum(x.astype(jnp.int32), 1))


def _dist_cost_vec(dist):
    """Seeded offset cost DIST_SYM_COST + 16*extra_bits, arithmetically:
    extra = max(bsr(dist-1) - 1, 0) (identical to tpu_optimal._dist_cost
    via the offset-slot formulas)."""
    o1 = jnp.maximum(dist - 1, 1)
    extra = jnp.maximum(_bsr(o1) - 1, 0)
    extra = jnp.where(dist <= 4, 0, extra)
    return DIST_SYM_COST + BIT * extra


def _len_extra_scalar(f):
    """extra_bits(length f) for the tail candidate, scalar arithmetic
    (mirrors tpu_pipeline._length_slot)."""
    l1 = jnp.maximum(f - 3, 1)
    k = _bsr(l1)
    band_slot = 4 * k - 4 + ((l1 >> jnp.maximum(k - 2, 0)) & 3)
    slot = jnp.where(f <= 10, f - 3, jnp.where(f >= 258, 28, band_slot))
    return jnp.where((slot < 8) | (slot >= 28), 0, (slot >> 2) - 1)


def _dp_kernel(lc_ref, wl_ref, wa_ref, wb_ref, wc_ref, wd_ref, out_ref,
               D_ref, *, S: int, TS: int, lanes_per_chunk: int,
               ladder=LEN_LADDER):
    """One reverse t-block of the backwards DP for one lane block.

    Refs: lc [B, 259] (SMEM) per-chunk per-length match costs; wl/wa/wb/wc
    [TS, 8, 128] packed candidates+costs, out [TS, 8, 128] choices,
    D [S, 8, 128] circular cost window (persistent scratch).
    Grid = (lane_blocks, S // TS); t blocks stream high-to-low.  Lanes are
    chunk-major, so lane block lb maps to chunk (lb*1024)//lanes_per_chunk
    (exact when 1024 | lanes_per_chunk; first-covered chunk otherwise).
    """
    lb = pl.program_id(0)
    tb = pl.program_id(1)
    n_tb = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        D_ref[...] = jnp.zeros_like(D_ref)

    t_base = (n_tb - 1 - tb) * TS
    ci = jnp.minimum((lb * 1024) // lanes_per_chunk, lc_ref.shape[0] - 1)
    # rung costs: one scalar per rung, read once per grid step
    rung_cost = [lc_ref[ci, f] for f in ladder]

    def body(k, _):
        tl = TS - 1 - k
        t = t_base + tl

        wl = wl_ref[0, tl]                   # [8, 128]
        wa = wa_ref[0, tl]
        wb = wb_ref[0, tl]
        wc = wc_ref[0, tl]
        wd = wd_ref[0, tl]
        clit = (wl >> 14) & jnp.int32(0xFF)
        d3 = wl & jnp.int32(0x3FFF)
        cC = jax.lax.shift_right_logical(wl, 22) & jnp.int32(0x3FF)
        lA = wa >> 18
        dA = wa & jnp.int32(0x3FFFF)
        lB = wb >> 18
        dB = wb & jnp.int32(0x3FFFF)
        lC = wd >> 18
        dC = wd & jnp.int32(0x3FFFF)
        cA = (wc >> 20) & jnp.int32(0x3FF)
        cB = (wc >> 10) & jnp.int32(0x3FF)
        c3 = wc & jnp.int32(0x3FF)

        best = clit + D_ref[(t + 1) % S]
        bspan = jnp.ones_like(best)
        bdist = jnp.zeros_like(best)

        for fi, f in enumerate(ladder):
            Df = D_ref[(t + f) % S]
            okA = lA >= f
            okB = lB >= f
            cd = jnp.where(okA, cA, _BIG)
            dsel = dA
            useB = okB & (cB < cd)
            cd = jnp.where(useB, cB, cd)
            dsel = jnp.where(useB, dB, dsel)
            useC = (lC >= f) & (cC < cd)
            cd = jnp.where(useC, cC, cd)
            dsel = jnp.where(useC, dC, dsel)
            if f == 3:
                use3 = (d3 > 0) & (c3 < cd)
                cd = jnp.where(use3, c3, cd)
                dsel = jnp.where(use3, d3, dsel)
            feas = t + f <= S
            cand = jnp.where(feas, cd + rung_cost[fi] + Df, _BIG2)
            better = cand < best
            best = jnp.where(better, cand, best)
            bspan = jnp.where(better, f, bspan)
            bdist = jnp.where(better, dsel, bdist)

        # segment-end tail candidate: length exactly S - t (scalar), D[S]=0
        f_tail = jnp.int32(S - t)
        tail_sane = (f_tail >= 3) & (f_tail <= MAX_LEN)
        okA_t = lA >= f_tail
        okB_t = lB >= f_tail
        cd_t = jnp.where(okA_t, cA, _BIG)
        dsel_t = dA
        useB_t = okB_t & (cB < cd_t)
        cd_t = jnp.where(useB_t, cB, cd_t)
        dsel_t = jnp.where(useB_t, dB, dsel_t)
        useC_t = (lC >= f_tail) & (cC < cd_t)
        cd_t = jnp.where(useC_t, cC, cd_t)
        dsel_t = jnp.where(useC_t, dC, dsel_t)
        c_tail = jnp.where(
            tail_sane,
            cd_t + lc_ref[ci, jnp.clip(f_tail, 0, 258)],
            _BIG2,
        )
        better_t = c_tail < best
        best = jnp.where(better_t, c_tail, best)
        bspan = jnp.where(better_t, f_tail, bspan)
        bdist = jnp.where(better_t, dsel_t, bdist)

        D_ref[t % S] = best
        out_ref[0, tl] = (bspan << 16) | bdist
        return 0

    jax.lax.fori_loop(0, TS, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("S", "interpret", "ladder"))
def dp_parse_pallas(cost_lit, lenA, dA, cdA, lenB, dB, cdB, lenC, dC, cdC,
                    d3, cd3, lc_len, S: int = 1024,
                    interpret: bool = False, ladder=LEN_LADDER):
    """Backwards min-cost DP over independent S-position segments.

    Signature-parallel to tpu_optimal._dp_parse (batched): [B, n_pad]
    i32 candidate/cost arrays plus the [259] per-length match cost
    table; returns (span, dist) [B, n_pad].  Lane layout: all
    B * (n_pad/S) segments ride the 8x128 vector tiles; the t axis
    streams through the grid in reverse 256-row blocks.
    """
    Bc, n_pad = cost_lit.shape
    assert n_pad % S == 0
    lanes = Bc * (n_pad // S)
    LANE = 1024
    lanes_pad = -(-lanes // LANE) * LANE
    TS = 256 if S % 256 == 0 else S

    def to_rows(x, fill=0):
        x = x.reshape(lanes, S).T                      # [S, lanes]
        if lanes_pad != lanes:
            x = jnp.concatenate(
                [x, jnp.full((S, lanes_pad - lanes), fill, x.dtype)], axis=1
            )
        return x.reshape(S, lanes_pad // LANE, 8, 128).transpose(1, 0, 2, 3)

    cap = jnp.int32(0x3FF)
    wl = to_rows(
        (jnp.minimum(cdC.astype(jnp.int32), cap) << 22)
        | (jnp.minimum(cost_lit.astype(jnp.int32), jnp.int32(0xFF)) << 14)
        | d3.astype(jnp.int32)
    )
    wa = to_rows((lenA.astype(jnp.int32) << 18) | dA.astype(jnp.int32))
    wb = to_rows((lenB.astype(jnp.int32) << 18) | dB.astype(jnp.int32))
    wd = to_rows((lenC.astype(jnp.int32) << 18) | dC.astype(jnp.int32))
    wc = to_rows(
        (jnp.minimum(cdA.astype(jnp.int32), cap) << 20)
        | (jnp.minimum(cdB.astype(jnp.int32), cap) << 10)
        | jnp.minimum(cd3.astype(jnp.int32), cap)
    )
    lc = jnp.minimum(lc_len.astype(jnp.int32), jnp.int32(1 << 20))
    if lc.ndim == 1:
        lc = jnp.broadcast_to(lc, (Bc, 259))
    LB = lanes_pad // LANE
    n_tb = S // TS

    out = pl.pallas_call(
        functools.partial(_dp_kernel, S=S, TS=TS,
                          lanes_per_chunk=n_pad // S, ladder=ladder),
        grid=(LB, n_tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [
            pl.BlockSpec((1, TS, 8, 128),
                         lambda lb, tb: (lb, n_tb - 1 - tb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] * 5,
        out_specs=pl.BlockSpec(
            (1, TS, 8, 128),
            lambda lb, tb: (lb, n_tb - 1 - tb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((LB, S, 8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((S, 8, 128), jnp.int32)],
        interpret=interpret,
    )(lc, wl, wa, wb, wc, wd)

    choices = out.transpose(1, 0, 2, 3).reshape(S, lanes_pad)[:, :lanes]
    choices = choices.T.reshape(Bc, n_pad)
    span = (choices >> 16) & 0xFFFF
    dist = choices & 0xFFFF
    return span, dist


# ---------------------------------------------------------------------------
# Bit-pack kernel
# ---------------------------------------------------------------------------
def _pack_kernel(gw_ref, sbuf_ref, out_ref, *, GB: int):
    """OR group bit-buffers into the output words at their word offsets.

    gw [1, 1, 8, GB//8] i32 (SMEM): absolute start word of each group
    (monotone; 4-D because Mosaic's block checker wants the last two
    block dims equal to the array dims even for SMEM blocks).
    sbuf [1, GB, 128] u32: group buffers, zero past the real capw words.
    out [1, NROWS, 128] u32: one chunk's words, viewed 128 per row.
    Grid = (B, group blocks); grid iteration runs all group blocks of a
    chunk consecutively, so the chunk's out block is zeroed at gb == 0
    and accumulated in place across gb.
    """
    gb = pl.program_id(1)
    W = GB // 8

    @pl.when(gb == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, _):
        o = gw_ref[0, 0, i // W, i % W]
        r = o // 128
        l = o % 128
        srow = sbuf_ref[0, i][None, :]                # [1, 128]
        rolled = pltpu.roll(srow, l, 1)
        lo = jnp.where(lane >= l, rolled, jnp.uint32(0))
        hi = jnp.where(lane < l, rolled, jnp.uint32(0))
        win = jnp.concatenate([lo, hi], axis=0)       # [2, 128]
        out_ref[0, pl.ds(r, 2), :] |= win
        return 0

    jax.lax.fori_loop(0, GB, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("nwords", "interpret"))
def pack_groups_pallas(sbuf, gw, nwords: int, interpret: bool = False):
    """Place group buffers at absolute word offsets, batched over chunks.

    sbuf: [B, m, capw+1] u32 group buffers (words already shifted to the
    group's in-word bit offset, as produced by
    tpu_pipeline._group_premerge); gw: [B, m] i32 start words.
    Returns [B, nwords] u32.

    Monotone offsets + zero-padded buffers make the in-kernel OR exact.
    """
    B, m, capw1 = sbuf.shape
    assert capw1 <= 82  # roll-wrap correctness bound (128 - 46)
    GB = 512
    m_pad = -(-m // GB) * GB
    NROWS = -(-nwords // 128) + 1
    sb = jnp.zeros((B, m_pad, 128), jnp.uint32).at[:, :m, :capw1].set(sbuf)
    # padded groups re-OR zeros at word 0 (harmless)
    gwp = jnp.zeros((B, m_pad), jnp.int32).at[:, :m].set(gw)
    gwp = gwp.reshape(B, m_pad // GB, 8, GB // 8)

    out = pl.pallas_call(
        functools.partial(_pack_kernel, GB=GB),
        grid=(B, m_pad // GB),
        in_specs=[
            pl.BlockSpec((1, 1, 8, GB // 8), lambda b, gb: (b, gb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, GB, 128), lambda b, gb: (b, gb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NROWS, 128), lambda b, gb: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NROWS, 128), jnp.uint32),
        interpret=interpret,
    )(gwp, sb)
    return out.reshape(B, -1)[:, :nwords]
