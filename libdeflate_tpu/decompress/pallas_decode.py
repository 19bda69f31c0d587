"""Device-resident DEFLATE decoder as a Pallas scalar kernel.

The round-1 design-space closure (PERF_NOTES.md) showed every *vectorized*
lockstep formulation of DEFLATE decode is floor-bounded by XLA's scatter
and gather costs (~5-10 MB/s).  This module takes the other lane the chip
offers: the **scalar core**.  DEFLATE decode is irreducibly serial per
chunk (every bit boundary depends on the previous symbol — SURVEY.md §3.2),
which is exactly what the scalar unit runs well: the whole decoder state
(bit cursor, Huffman tables, the 32 KiB LZ window) lives in SMEM, the
per-symbol loop is plain scalar control flow, and the only vector-unit
involvement is DMA.

Role parity: the one-shot fastloop decoder of the reference
(/root/reference/lib/decompress_template.h:44-772 and the table builder at
lib/deflate_decompress.c:721-1004), re-expressed as an on-chip kernel:

- **Input staging**: the compressed stream (u32 words, zero-padded by the
  host) stays in HBM; a 2048-word SMEM window is re-staged by one
  synchronous DMA each time the cursor approaches its end (~43 refills
  per 1 MiB chunk — noise next to the decode loop).
- **Decode tables** are built in SMEM by a scalar port of the native
  builder (native/ldtpu_native.cpp build_table): counting-sort canonical
  order, one-level subtables, the two zlib-lax incomplete-code cases
  (single len-1 codeword / empty code) accepted exactly like the other
  three decoders.
- **LZ window**: a 64 KiB ring of i32 words in SMEM — twice the DEFLATE
  window, because the carried-word output scheme stores whole words and
  would otherwise clobber the lanes a full-window (dist ~32768) match
  reads.  Each time `op` crosses a 32 KiB boundary the finished half is
  flushed to the output in HBM with one DMA.
- **Known-size contract**: the caller passes the expected output size per
  chunk (the device API's fixed-shape mode); corrupt streams set a
  per-chunk status code and stop, with every loop bounded by input/output
  sizes (DoS discipline of lib/deflate_decompress.c:48-61).

Grid = (B,): chunks decode sequentially on the scalar core; chunk-level
parallelism comes from the mesh axis (parallel/mesh.py), matching the
chunk-DP model everywhere else in this framework.

Entry format (i32, this module's own — decode needs one load per symbol):
  bits 0..7   total consume bits (codeword + extra)
  bits 8..11  codeword length (to locate the extra field in the window)
  bits 12..13 kind: 0 literal, 1 base payload (length/offset), 2 EOB/bad,
              3 subtable pointer (payload = subtable start, len = width)
  bit 14      two-literal flag (kind 0 only): payload byte2 in bits 24..31
  bits 16..23 payload (literal byte / base value / subtable start; base
              and subtable payloads extend through bit 30)
A `kind 2` entry with payload 1 marks an invalid codeword.  Two-literal
entries fold a fully-determined literal pair into one lookup (the native
decoder's pairing pass, native/ldtpu_native.cpp) — the scalar loop's cost
is dominated by table probes, so pairs ~halve literal-heavy decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# Constants (RFC 1951; parity with formats/deflate.py)
# ---------------------------------------------------------------------------
LEN_BASE = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51,
     59, 67, 83, 99, 115, 131, 163, 195, 227, 258], np.int32)
LEN_EXTRA = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4,
     4, 5, 5, 5, 5, 0], np.int32)
OFF_BASE = np.array(
    [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385,
     513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385,
     24577], np.int32)
OFF_EXTRA = np.array(
    [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10,
     10, 11, 11, 12, 12, 13, 13], np.int32)
PRECODE_PERM = np.array(
    [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15],
    np.int32)

LTB = 11                       # litlen main-table bits.  Measured dead
                               # ends: 13 (r4 early) was a wash; a FLAT
                               # 15-bit table (no subtable resolve, rich
                               # two-literal pairing) measured 58.6 ->
                               # 37.2 MB/s — the 2^15 fill + pair sweep
                               # per dynamic block dominates on native
                               # streams with real block splitting
OTB = 8                        # offset main-table bits
PTB = 7                        # precode table bits
LL_SIZE = (1 << LTB) + 294     # main + worst-case subtables
OF_SIZE = (1 << OTB) + 146
STAGE_W = 2048                 # staged input words (8 KiB)
# The ring is TWICE the DEFLATE window: the carried-word output scheme
# stores whole words (garbage in lanes >= op&3), which would clobber the
# 32 KiB-old bytes a full-window (dist ~32768) match still needs if ring
# size == window.  At 64 KiB, position p and p-32768 live in different
# slots, so every dist <= 32768 reads live bytes; flushes move finished
# 32 KiB HALVES.
RING_W = 16384                 # 64 KiB output ring, as i32 words
FLUSH_W = 8192                 # words per flush span (32 KiB, the window)
FLUSHB = FLUSH_W * 4           # flush-boundary period in bytes

K_LIT, K_BASE, K_EOB, K_SUB = 0, 1, 2, 3

# status codes (match api.py result codes)
OK, BAD_DATA = 0, 1


def _static_lens() -> np.ndarray:
    lens = np.zeros(288 + 32, np.int32)
    sym = np.arange(288)
    lens[:288] = np.where(sym < 144, 8, np.where(sym < 256, 9,
                          np.where(sym < 280, 7, 8)))
    lens[288:] = 5
    return lens


_STATIC_LENS = _static_lens()

# One SMEM constant table (Mosaic kernels cannot capture jnp constants):
# [0:29) LEN_BASE  [29:58) LEN_EXTRA  [58:88) OFF_BASE  [88:118) OFF_EXTRA
# [118:137) PRECODE_PERM  [137:457) static litlen+offset lens
_CONSTS = np.concatenate(
    [LEN_BASE, LEN_EXTRA, OFF_BASE, OFF_EXTRA, PRECODE_PERM, _STATIC_LENS]
).astype(np.int32)
_C_LB, _C_LE, _C_OB, _C_OE, _C_PP, _C_SL = 0, 29, 58, 88, 118, 137


# ---------------------------------------------------------------------------
# Kernel helpers (traced, scalar)
# ---------------------------------------------------------------------------
def _shr(x, s):
    return jax.lax.shift_right_logical(x, s)


def _shl(x, s):
    return jax.lax.shift_left(x, s)


def _rev_bits(code, nbits):
    """Bit-reverse the low `nbits` of code (codeword -> table index)."""
    v = code
    out = jnp.int32(0)

    def body(k, st):
        o, vv = st
        return (_shl(o, 1) | (vv & 1), _shr(vv, 1))

    out, _ = jax.lax.fori_loop(0, 15, body, (out, v))
    return _shr(out, 15 - nbits)


def _make_entry(role, sym, length, consts):
    """Packed entry for a resolved codeword (see module docstring).

    role: 0 precode, 1 litlen, 2 offset (python-static); consts is the
    SMEM constant-table ref (_CONSTS layout).
    """
    if role == 0:
        return (sym << 16) | (length << 8) | length  # kind 0, payload=sym
    if role == 1:
        lit = (sym << 16) | (K_LIT << 12) | (length << 8) | length
        eob = (K_EOB << 12) | (length << 8) | length
        bad = (1 << 16) | (K_EOB << 12) | (length << 8) | length
        ls = jnp.clip(sym - 257, 0, 28)
        base = consts[_C_LB + ls]
        extra = consts[_C_LE + ls]
        mat = ((base << 16) | (K_BASE << 12) | (length << 8)
               | (length + extra))
        return jnp.where(
            sym < 256, lit,
            jnp.where(sym == 256, eob, jnp.where(sym <= 285, mat, bad)))
    osym = jnp.clip(sym, 0, 29)
    base = consts[_C_OB + osym]
    extra = consts[_C_OE + osym]
    mat = (base << 16) | (K_BASE << 12) | (length << 8) | (length + extra)
    bad = (1 << 16) | (K_EOB << 12) | (length << 8) | length
    return jnp.where(sym < 30, mat, bad)


def _build_table_scalar(lens_ref, lens_off, nsyms, table_bits, table_ref,
                        enough, role, aux_ref, consts):
    """Scalar port of the native decode-table builder (returns ok flag).

    lens_ref[lens_off + i] for i < nsyms are the codeword lengths.
    aux_ref: SMEM i32 scratch laid out as
      [0:17)    len counts / offsets
      [32:320)  canonical-order symbols
      [320:608) stash rc
      [608:896) stash len
      [896:1184) stash sym
    """
    # count lengths
    def zero(i, _):
        aux_ref[i] = 0
        return 0
    jax.lax.fori_loop(0, 17, zero, 0)

    def count(i, _):
        l = lens_ref[lens_off + i]
        aux_ref[l] = aux_ref[l] + jnp.where(l > 0, 1, 0)
        return 0
    jax.lax.fori_loop(0, nsyms, count, 0)

    # Kraft space
    def space_acc(l, s):
        return s + _shl(aux_ref[l], 15 - l)
    space = jax.lax.fori_loop(1, 16, space_acc, jnp.int32(0))

    def incomplete():
        # zlib-lax: accept the empty code and the single len-1 codeword
        # (native build_table does the same; ref lib/deflate_decompress.c:
        # 803-853)
        bad = (space != 0) & ((space != (1 << 14)) | (aux_ref[1] != 1))

        def find_sym(i, s):
            return jnp.where(
                (s < 0) & (lens_ref[lens_off + i] == 1), i, s)
        sym = jax.lax.fori_loop(0, nsyms, find_sym, jnp.int32(-1))
        sym = jnp.where(space == 0, 0, jnp.maximum(sym, 0))
        e = _make_entry(role, sym, jnp.int32(1), consts)

        def fill(i, _):
            table_ref[i] = e
            return 0
        jax.lax.fori_loop(0, 1 << table_bits, fill, 0)
        return jnp.where(bad, jnp.int32(0), jnp.int32(1))

    def complete():
        # offsets for counting sort: aux[l+1] = cumsum of counts
        def offs(l, acc):
            c = aux_ref[l]
            aux_ref[l] = acc            # offs[l] (reuse the count slots)
            return acc + c
        nused = jax.lax.fori_loop(1, 16, offs, jnp.int32(0))
        aux_ref[16] = nused

        def place(i, _):
            l = lens_ref[lens_off + i]

            @pl.when(l > 0)
            def _():
                o = aux_ref[l]
                aux_ref[32 + o] = i
                aux_ref[l] = o + 1
            return 0
        jax.lax.fori_loop(0, nsyms, place, 0)

        mask = jnp.int32((1 << table_bits) - 1)

        # canonical codeword walk; codewords longer than table_bits go to
        # the stash (they are contiguous per subtable prefix)
        def walk(oi, st):
            code, prev_len, nstash = st
            sym = aux_ref[32 + oi]
            l = lens_ref[lens_off + sym]
            code = _shl(code, l - prev_len)
            rc = _rev_bits(code, l)
            e = _make_entry(role, sym, l, consts)

            @pl.when(l <= table_bits)
            def _():
                def fill(k, idx):
                    table_ref[idx] = e
                    return idx + _shl(1, l)
                span = _shr(jnp.int32(1 << table_bits), l)
                jax.lax.fori_loop(0, span, fill, rc)

            @pl.when(l > table_bits)
            def _():
                aux_ref[320 + nstash] = rc
                aux_ref[608 + nstash] = l
                aux_ref[896 + nstash] = sym
            nstash = nstash + jnp.where(l > table_bits, 1, 0)
            return (code + 1, l, nstash)

        _, _, nstash = jax.lax.fori_loop(
            0, nused, walk, (jnp.int32(0), jnp.int32(1), jnp.int32(0)))

        # subtables: one run per shared low-table_bits prefix
        def sub_cond(st):
            i, cur_sub, ok = st
            return (i < nstash) & (ok == 1)

        def sub_body(st):
            i, cur_sub, ok = st
            prefix = aux_ref[320 + i] & mask

            def run_end(j, e):
                same = (j < nstash) & ((aux_ref[320 + j] & mask) == prefix)
                return jnp.where(same & (e == j), j + 1, e)
            j = jax.lax.fori_loop(i, 288, run_end, i)
            sub_bits = aux_ref[608 + j - 1] - table_bits
            sub_start = cur_sub
            cur_sub = cur_sub + _shl(1, sub_bits)
            ok = jnp.where(cur_sub > enough, 0, ok)

            @pl.when(ok == 1)
            def _():
                table_ref[prefix] = ((sub_start << 16) | (K_SUB << 12)
                                     | (sub_bits << 8))

                def fill_run(t, _):
                    rc = aux_ref[320 + t]
                    l = aux_ref[608 + t]
                    sym = aux_ref[896 + t]
                    e = _make_entry(role, sym, l, consts)
                    hi = _shr(rc, table_bits)
                    step = _shl(1, l - table_bits)

                    def fill(k, idx):
                        table_ref[sub_start + idx] = e
                        return idx + step
                    span = _shr(_shl(jnp.int32(1), sub_bits),
                                l - table_bits)
                    jax.lax.fori_loop(0, span, fill, hi)
                    return 0
                jax.lax.fori_loop(i, j, fill_run, 0)
            return (j, cur_sub, ok)

        _, _, ok = jax.lax.while_loop(
            sub_cond, sub_body,
            (jnp.int32(0), jnp.int32(1 << table_bits), jnp.int32(1)))

        if role == 1:
            # two-literal pairing: descending index order guarantees the
            # second lookup (idx >> l1 < idx) reads an unmodified entry
            def pair(kk, _):
                idx = (1 << table_bits) - 1 - kk
                e1 = table_ref[idx]
                k1 = _shr(e1, 12) & 3
                l1 = e1 & 0xFF

                @pl.when((k1 == K_LIT) & (l1 >= 1) & (l1 < table_bits)
                         & ((_shr(e1, 14) & 1) == 0))
                def _():
                    e2 = table_ref[_shr(idx, l1)]
                    k2 = _shr(e2, 12) & 3
                    l2 = e2 & 0xFF
                    pair_ok = ((k2 == K_LIT) & ((_shr(e2, 14) & 1) == 0)
                               & (l1 + l2 <= table_bits))

                    @pl.when(pair_ok)
                    def _():
                        table_ref[idx] = (
                            (_shr(e2, 16) << 24)
                            | (_shr(e1, 16) << 16)
                            | (1 << 14) | (K_LIT << 12)
                            | (l1 + l2)
                        )
                return 0
            jax.lax.fori_loop(0, 1 << table_bits, pair, 0)
        return ok

    over = space > (1 << 15)
    ok = jax.lax.cond(space == (1 << 15), complete, incomplete)
    return jnp.where(over, jnp.int32(0), ok)


def _decode_kernel(clen_ref, olen_ref, strict_ref, consts_ref, comp_ref,
                   out_ref, status_ref, oplen_ref, cons_ref, stage, ring,
                   ll_tab, of_tab, pre_tab, lens, aux, sem_in, sem_out,
                   *, W: int, OW: int):
    b = pl.program_id(0)
    in_words = _shr(clen_ref[b] + 3, 2)
    olen = olen_ref[b]

    # ---- input staging ----------------------------------------------------
    # stage holds words [aux_base, aux_base + STAGE_W); refilled in one
    # synchronous DMA when the cursor's word+1 leaves the window.  The host
    # zero-pads the compressed array by STAGE_W words, so the DMA source is
    # always in bounds and overread bits decode as zeros (the appended-zeros
    # tolerance of lib/deflate_decompress.c:214-254).
    def stage_from(w0):
        # Mosaic tiles 1-D HBM memrefs (1024,) and must PROVE the dynamic
        # DMA start divisible by the tile; clamp first (W - STAGE_W is a
        # compile-time multiple of 1024), then align down
        w0 = jnp.minimum(w0, W - STAGE_W)
        # make divisibility syntactic for the Mosaic DMA-alignment prover:
        # the slice start's final op is a << 10 (1024-word tiles)
        start = pl.multiple_of(_shl(b * (W // 1024) + _shr(w0, 10), 10),
                               1024)
        cp = pltpu.make_async_copy(
            comp_ref.at[pl.ds(start, STAGE_W)],
            stage,
            sem_in,
        )
        cp.start()
        cp.wait()
        return w0

    stage_from(0)

    # bit cursor t (bits), staging base (words) carried through the loops
    def peek32(t, base):
        w = _shr(t, 5) - base
        s = t & 31
        lo = _shr(stage[w], s)
        hi = _shl(_shl(stage[w + 1], 31 - s), 1)
        return lo | hi

    def ensure(t, base, margin: int = 1):
        """Refill staging if word(t)+margin is outside the window; returns
        base.  The refill base aligns down to 1024 words (DMA tile
        alignment), so the effective window is STAGE_W - 1023 words
        (~4 KiB).  margin=3 callers may peek up to 64 bits past t."""
        nb = _shl(_shr(jnp.minimum(_shr(t, 5), W - STAGE_W), 10), 10)
        pred = _shr(t, 5) + margin - base >= STAGE_W

        @pl.when(pred)
        def _():
            stage_from(_shr(t, 5))
        return jnp.where(pred, nb, base)

    # ---- ring (LZ window) -------------------------------------------------
    # Output rides a carried partial-word register `cur`: cur always equals
    # the bytes [4*(op>>2), op) of the current output word, and every write
    # STORES cur to its ring slot (never a read-modify-write load).  The
    # invariant "ring content is exact for all positions < op" lets match
    # copies read the ring freely; slots at positions >= op are dead (their
    # 32 KiB-older occupants were flushed when op crossed the previous
    # boundary) so speculative stores to them are safe.
    RINGB = FLUSHB              # flush-boundary period (= window, 32 KiB)
    RM = RING_W - 1             # ring slot mask (64 KiB of positions)

    def ring_byte(pos):
        w = _shr(pos, 2) & RM
        sh = _shl(pos & 3, 3)
        return _shr(ring[w], sh) & 0xFF

    def wr_byte(oo, cc, byte, flush_en: bool):
        """Append one byte at oo via cur; returns (oo+1, cur').  With
        flush_en, flushes exactly when oo+1 crosses a 32 KiB boundary."""
        cc = cc | _shl(byte & 0xFF, _shl(oo & 3, 3))
        ring[_shr(oo, 2) & RM] = cc
        oo = oo + 1
        cc = jnp.where((oo & 3) == 0, 0, cc)
        if flush_en:
            @pl.when((oo & (RINGB - 1)) == 0)
            def _():
                flush(oo)
        return oo, cc

    def flush(op_end):
        """DMA the ring to out; called exactly at 32 KiB boundaries and at
        the end.  op_end is the output byte count; the flushed span is
        [op_end - (op_end mod 32768 or 32768), op_end) rounded up to words
        (the out array is word-padded by the host)."""
        rem = op_end & (FLUSHB - 1)
        nbytes = jnp.where(rem == 0, FLUSHB, rem)
        nw = _shr(nbytes + 3, 2)
        # op_end - nbytes is a multiple of 32768 bytes = 8192 words
        start_wb = _shl(_shr(op_end - nbytes, 15), 3)   # in 1024-word blocks
        dst = pl.multiple_of(_shl(b * (OW // 1024) + start_wb, 10), 1024)
        # the span lives in one 32 KiB HALF of the 64 KiB ring
        half = _shr(op_end - nbytes, 15) & 1
        src_w = pl.multiple_of(_shl(half, 13), FLUSH_W)
        cp = pltpu.make_async_copy(
            ring.at[pl.ds(src_w, FLUSH_W)],
            out_ref.at[pl.ds(dst, FLUSH_W)],
            sem_out,
        )
        # full-ring DMA keeps the shape static; the host over-allocates
        # out by RING_W words so the tail flush stays in bounds, and
        # later flushes never rewrite earlier bytes (start_w is
        # monotone, ring content for [start_w*4, op_end) is exact)
        del nw
        cp.start()
        cp.wait()

    # ---- block loop -------------------------------------------------------
    # state: (t, base, op, cur, status, final, done)
    def blk_cond(st):
        t, base, op, cur, status, final, done = st
        return (done == 0) & (status == OK)

    def blk_body(st):
        t, base, op, cur, status, final, done = st
        base = ensure(t, base)
        hdr = peek32(t, base)
        t = t + 3
        final = hdr & 1
        btype = _shr(hdr, 1) & 3

        def do_stored(t, base, op, cur):
            # align, LEN/NLEN, then a word-wise copy from the staged input
            # (stored data is byte-aligned) to the ring — chunked by the
            # staging window and the 32 KiB flush boundary so the word loop
            # carries no checks (the role of the reference's stored-block
            # memcpy, decompress_template.h:247-286)
            t2 = (t + 7) & ~7
            base2 = ensure(t2, base)
            v = peek32(t2, base2)
            ln = v & 0xFFFF
            nlen = _shr(v, 16) & 0xFFFF
            bad = ((ln ^ 0xFFFF) != nlen) | (op + ln > olen)
            t3 = t2 + 32
            ib0 = _shr(t3, 3)           # input byte cursor (t3 byte-aligned)

            def stage_byte(ib, bb):
                wi = _shr(ib, 2) - bb
                return _shr(stage[wi], _shl(ib & 3, 3)) & 0xFF

            def cp_cond(s):
                ib, bb, oo, cc, rem, stt = s
                return (rem > 0) & (stt == OK)

            def cp_body(s):
                ib, bb, oo, cc, rem, stt = s
                # margin=3 keeps >= 2 words staged past ib (word-funnel
                # reads stage[wi+1]); the refill base never passes word(ib)
                bb = ensure(_shl(ib, 3), bb, margin=3)
                stage_left = _shl(bb + STAGE_W, 2) - ib - 8
                stt = jnp.where(stage_left <= 0, BAD_DATA, stt)
                room = jnp.maximum(
                    jnp.minimum(jnp.minimum(stage_left,
                                            RINGB - (oo & (RINGB - 1))),
                                rem), 0)
                hb = jnp.minimum((-oo) & 3, room)

                def byte_step(k, s2):
                    ib2, oo2, cc2 = s2
                    oo2, cc2 = wr_byte(oo2, cc2, stage_byte(ib2, bb), False)
                    return (ib2 + 1, oo2, cc2)

                ib, oo, cc = jax.lax.fori_loop(0, hb, byte_step,
                                               (ib, oo, cc))
                mid = room - hb
                nw = _shr(mid, 2)

                def word_step(k, s2):
                    ib2, oo2 = s2
                    wi = _shr(ib2, 2) - bb
                    sh = _shl(ib2 & 3, 3)
                    wv = _shr(stage[wi], sh) | _shl(
                        _shl(stage[wi + 1], 31 - sh), 1)
                    ring[_shr(oo2, 2) & RM] = wv
                    return (ib2 + 4, oo2 + 4)

                ib, oo = jax.lax.fori_loop(0, nw, word_step, (ib, oo))
                tb = mid - _shl(nw, 2)
                ib, oo, cc = jax.lax.fori_loop(0, tb, byte_step,
                                               (ib, oo, cc))

                @pl.when((room > 0) & ((oo & (RINGB - 1)) == 0))
                def _():
                    flush(oo)
                return (ib, bb, oo, cc, rem - room, stt)

            ib, base3, op2, cur2, _, stt = jax.lax.while_loop(
                cp_cond, cp_body,
                (ib0, base2, op, cur, jnp.where(bad, 0, ln),
                 jnp.int32(OK)))
            st_out = jnp.where(bad, BAD_DATA, stt)
            return _shl(ib, 3), base3, op2, cur2, st_out

        def do_huffman(t, base, op, cur, btype):
            # ---- table setup ----
            def static_tables():
                def setl(i, _):
                    lens[i] = consts_ref[_C_SL + i]
                    return 0
                jax.lax.fori_loop(0, 320, setl, 0)
                return t, base, jnp.int32(288), jnp.int32(32), jnp.int32(OK)

            def dynamic_tables():
                tt = t
                bb = ensure(tt, base)
                v = peek32(tt, bb)
                num_ll = 257 + (v & 31)
                num_of = 1 + (_shr(v, 5) & 31)
                num_pre = 4 + (_shr(v, 10) & 15)
                tt = tt + 14

                def clr(i, _):
                    lens[1184 + i] = 0
                    return 0
                jax.lax.fori_loop(0, 19, clr, 0)

                def rd_pre(i, st2):
                    tt2, bb2 = st2
                    bb2 = ensure(tt2, bb2)
                    lens[1184 + consts_ref[_C_PP + i]] = (
                        peek32(tt2, bb2) & 7)
                    return (tt2 + 3, bb2)
                tt, bb = jax.lax.fori_loop(0, num_pre, rd_pre, (tt, bb))

                ok = _build_table_scalar(
                    lens, jnp.int32(1184), jnp.int32(19), PTB, pre_tab,
                    jnp.int32(128), 0, aux, consts_ref)

                # RLE-decode the litlen+offset lengths
                total = num_ll + num_of

                def rle_cond(st2):
                    i, tt2, bb2, okk = st2
                    return (i < total) & (okk == 1)

                def rle_body(st2):
                    i, tt2, bb2, okk = st2
                    bb2 = ensure(tt2, bb2)
                    w = peek32(tt2, bb2)
                    e = pre_tab[w & ((1 << PTB) - 1)]
                    cl = e & 0xFF
                    sym = _shr(e, 16)
                    tt2 = tt2 + cl
                    bb2 = ensure(tt2, bb2)
                    w2 = peek32(tt2, bb2)

                    def lit_case():
                        lens[i] = sym
                        return (i + 1, tt2, jnp.int32(0))

                    def rep_case():
                        prev = jnp.where(i > 0, lens[jnp.maximum(i - 1, 0)],
                                         0)
                        is16 = sym == 16
                        is17 = sym == 17
                        rep = jnp.where(
                            is16, 3 + (w2 & 3),
                            jnp.where(is17, 3 + (w2 & 7), 11 + (w2 & 127)))
                        ebits = jnp.where(is16, 2, jnp.where(is17, 3, 7))
                        val = jnp.where(is16, prev, 0)
                        bad2 = (is16 & (i == 0)) | (i + rep > total)

                        def wr(k, _):
                            lens[i + k] = val
                            return 0
                        jax.lax.fori_loop(
                            0, jnp.where(bad2, 0, rep), wr, 0)
                        return (i + rep, tt2 + ebits,
                                jnp.where(bad2, 1, 0))

                    i2, tt3, bad = jax.lax.cond(sym < 16, lit_case, rep_case)
                    okk = jnp.where(bad == 1, 0, okk)
                    return (i2, tt3, bb2, okk)

                i, tt, bb, ok2 = jax.lax.while_loop(
                    rle_cond, rle_body, (jnp.int32(0), tt, bb, ok))
                stat = jnp.where(ok2 == 1, OK, BAD_DATA)
                return tt, bb, num_ll, num_of, stat

            tt, bb, num_ll, num_of, stat = jax.lax.cond(
                btype == 1, static_tables, dynamic_tables)

            ok_l = _build_table_scalar(
                lens, jnp.int32(0), num_ll, LTB, ll_tab,
                jnp.int32(LL_SIZE), 1, aux, consts_ref)
            ok_o = _build_table_scalar(
                lens, num_ll, num_of, OTB, of_tab,
                jnp.int32(OF_SIZE), 2, aux, consts_ref)
            stat = jnp.where((ok_l == 0) | (ok_o == 0), BAD_DATA, stat)

            # ---- group loop ----
            # One iteration = a branch-free LITERAL BURST followed by one
            # non-literal item (match / EOB / budget-limited literal).  The
            # burst's budget keeps it >= 8 bytes clear of the 32 KiB flush
            # boundary and the output end, and >= 64 staged bits clear of
            # the staging window, so its body carries ZERO checks: decode
            # main-table entry, merge 1-2 bytes into the carried word
            # `cur`, two unconditional stores (current word + speculative
            # spill word — slots >= op are dead, see ring helpers), advance.
            # This is the role of the reference fastloop's inline-literals
            # path (decompress_template.h:366-434) re-shaped for a scalar
            # core where branches cost ~5 ns and SMEM RMW loads ~6 ns.
            LLM = jnp.int32((1 << LTB) - 1)
            OFM = jnp.int32((1 << OTB) - 1)

            def grp_cond(st2):
                tt2, bb2, oo, cc, stt, eob = st2
                return (stt == OK) & (eob == 0)

            def grp_body(st2):
                tt2, bb2, oo, cc, stt, eob = st2
                bb2 = ensure(tt2, bb2, margin=3)
                # decode-past-end guard (bounded overread: stop once the
                # cursor passes the padded stage; padding is zeros)
                stt = jnp.where(
                    _shr(tt2, 5) > in_words + STAGE_W, BAD_DATA, stt)
                bits_left = _shl(bb2 + STAGE_W - 1, 5) - tt2
                room = jnp.minimum(RINGB - (oo & (RINGB - 1)), olen - oo)
                # clamp BEFORE the (logical) shifts: a negative margin
                # shifted logically becomes a huge budget and the burst
                # would sail past the flush boundary
                niter = jnp.minimum(
                    _shr(jnp.maximum(bits_left - 64, 0), 4),
                    _shr(jnp.maximum(room - 8, 0), 1))
                w0 = peek32(tt2, bb2)
                e0 = ll_tab[w0 & LLM]

                def b_cond(s):
                    t3, o3, c3, w3, e3, n3 = s
                    return ((_shr(e3, 12) & 3) == K_LIT) & (n3 > 0)

                def b_body(s):
                    t3, o3, c3, w3, e3, n3 = s
                    two = _shr(e3, 14) & 1
                    # no payload mask: single-literal entries keep byte
                    # 24-31 zero by construction (_make_entry / pairing)
                    pb = _shr(e3, 16)
                    sh = _shl(o3 & 3, 3)
                    c3 = c3 | _shl(pb, sh)
                    wd = _shr(o3, 2) & RM
                    ring[wd] = c3
                    # speculative spill of the byte that crossed the word
                    # boundary (two shifts keep the amount < 32)
                    spill = _shr(_shr(pb, 1),
                                 _shl(4 - (o3 & 3), 3) - 1)
                    ring[(wd + 1) & RM] = spill
                    o4 = o3 + 1 + two
                    c3 = jnp.where(_shr(o4, 2) != _shr(o3, 2), spill, c3)
                    t4 = t3 + (e3 & 0xFF)
                    w4 = peek32(t4, bb2)
                    e4 = ll_tab[w4 & LLM]
                    return (t4, o4, c3, w4, e4, n3 - 1)

                tt2, oo, cc, w, e, _ = jax.lax.while_loop(
                    b_cond, b_body, (tt2, oo, cc, w0, e0, niter))

                # resolve a subtable pointer (unconditional second load,
                # index clamped when not a pointer)
                is_sub = (_shr(e, 12) & 3) == K_SUB
                sidx = (_shr(e, 16)
                        + (_shr(w, LTB) & (_shl(1, _shr(e, 8) & 0xF) - 1)))
                e = jnp.where(is_sub,
                              ll_tab[jnp.where(is_sub, sidx, 0)], e)
                kind = _shr(e, 12) & 3
                consume = e & 0xFF
                cl = _shr(e, 8) & 0xF
                payload = _shr(e, 16)

                # ---- flattened non-literal item ----
                # Offset decode runs unconditionally (match / budget-
                # limited literal / EOB / bad all share it), then the
                # copy branches crossing / pattern / funnel.  The offset
                # CODE index reuses `w` (consume + OTB <= 32 always
                # holds), letting the of_tab load issue before the
                # second peek resolves; subtable index and extra bits
                # come from the tt4 peek.
                is_lit = kind == K_LIT
                two = _shr(e, 14) & 1
                is_eob = (kind == K_EOB) & (payload == 0)
                is_badk = ((kind == K_EOB) & (payload != 0)) | (kind == K_SUB)
                is_mat = kind == K_BASE

                # no payload mask: match-entry bases are clean 9-bit
                # values; `length` is garbage for other kinds and unused
                length = (payload
                          + (_shr(w, cl) & (_shl(1, consume - cl) - 1)))
                tt4 = tt2 + consume
                oe = of_tab[_shr(w, consume) & OFM]
                w2 = peek32(tt4, bb2)
                osub = (_shr(oe, 12) & 3) == K_SUB
                oidx = (_shr(oe, 16)
                        + (_shr(w2, OTB) & (_shl(1, _shr(oe, 8) & 0xF) - 1)))
                oe = jnp.where(osub, of_tab[jnp.where(osub, oidx, 0)], oe)
                okind = _shr(oe, 12) & 3
                ocons = oe & 0xFF
                ocl = _shr(oe, 8) & 0xF
                dist = (_shr(oe, 16)
                        + (_shr(w2, ocl) & (_shl(1, ocons - ocl) - 1)))

                tt2 = tt4 + jnp.where(is_mat, ocons, 0)
                nb = 1 + two
                bad = (is_badk
                       | (is_mat & ((okind != K_BASE) | (dist > oo)
                                    | (oo + length > olen)))
                       | (is_lit & (oo + nb > olen)))
                stt = jnp.where(bad, BAD_DATA, stt)
                eob = jnp.where(is_eob & (~bad), 1, eob)
                ln = jnp.where(bad | is_eob, 0,
                               jnp.where(is_lit, nb, length))
                d_eff = jnp.where(is_lit, nb, jnp.maximum(dist, 1))

                use_pat = is_lit | (d_eff < 4)
                crossing = (oo & (RINGB - 1)) + ln > RINGB
                sh_lo = oo & 3
                mlo = _shl(1, _shl(sh_lo, 3)) - 1
                w0i = _shr(oo, 2)
                nw = _shr(sh_lo + ln + 3, 2)
                end = oo + ln
                me = _shl(1, _shl(end & 3, 3)) - 1

                def finish(last):
                    ccn = jnp.where((end & 3) == 0, 0, last & me)
                    return end, jnp.where(ln == 0, cc, ccn)

                def copy_pattern():
                    # pattern word for short periods (literal bytes / dist
                    # 1-3): q byte j = src byte ((j - (op&3)) mod d_eff).
                    # Branched OUT of the dominant dist>=4 path: the ~30
                    # scalar ops + 3 dependent ring loads here cost more
                    # than the extra branch (issue-bound core, ~1 ns/op)
                    b0 = jnp.where(is_lit, payload & 0xFF,
                                   ring_byte(oo - d_eff))
                    b1 = jnp.where(is_lit, _shr(e, 24) & 0xFF,
                                   ring_byte(oo - d_eff + 1))
                    b2 = ring_byte(oo - d_eff + 2)
                    q1 = b0 * jnp.int32(0x01010101)
                    pair_a = b0 | _shl(b1, 8)
                    pair_b = b1 | _shl(b0, 8)
                    q2 = jnp.where((sh_lo & 1) == 0,
                                   pair_a | _shl(pair_a, 16),
                                   pair_b | _shl(pair_b, 16))
                    q3a = b0 | _shl(b1, 8) | _shl(b2, 16) | _shl(b0, 24)
                    q3b = b2 | _shl(b0, 8) | _shl(b1, 16) | _shl(b2, 24)
                    q3c = b1 | _shl(b2, 8) | _shl(b0, 16) | _shl(b1, 24)
                    r3 = sh_lo - jnp.where(sh_lo >= 3, 3, 0)
                    q3 = jnp.where(r3 == 0, q3a,
                                   jnp.where(r3 == 1, q3b, q3c))
                    q0 = jnp.where(d_eff == 1, q1,
                                   jnp.where(d_eff == 2, q2, q3))

                    def step(k, st3):
                        q, last = st3
                        stv = jnp.where(k == 0, (cc & mlo) | (q & ~mlo), q)
                        ring[(w0i + k) & RM] = stv
                        # period-3 advance: shift one byte and refill byte
                        # 3 with the new byte 0 (a 4-byte rotate would
                        # wrongly wrap the old byte 0 in)
                        qr = _shr(q, 8) & 0x00FFFFFF
                        q = jnp.where(d_eff == 3,
                                      qr | _shl(qr & 0xFF, 24), q)
                        return (q, stv)

                    _, last = jax.lax.fori_loop(0, nw, step, (q0, cc))
                    return finish(last)

                def copy_funnel():
                    # dist >= 4 match: straight-line words 0 and 1 (blind
                    # stores — slot w0i+k covers positions >= end for
                    # k >= nw, which are dead), loop only for nw > 2.
                    # Word 1's loads may read word 0's slot (4 <= dist < 8
                    # overlap), so stores stay in program order.
                    # SAFETY INVARIANT: the unconditional word-1 store can
                    # land one slot past `end` (incl. nw <= 1 / ln == 0
                    # items with garbage dist).  That slot is dead ONLY
                    # because RING (64 KiB of positions) is strictly
                    # larger than the 32 KiB DEFLATE window: a slot one
                    # word past the write head can never be match-reachable
                    # history.  Shrinking RING to the window size would
                    # silently corrupt output here.
                    def word(k):
                        src = _shl(w0i + k, 2) - dist
                        sw = _shr(src, 2)
                        shs = _shl(src & 3, 3)
                        return (_shr(ring[sw & RM], shs)
                                | _shl(_shl(ring[(sw + 1) & RM], 31 - shs),
                                       1))

                    f0 = word(0)
                    stv0 = (cc & mlo) | (f0 & ~mlo)
                    ring[w0i & RM] = stv0
                    f1 = word(1)
                    ring[(w0i + 1) & RM] = f1
                    last = jnp.where(nw >= 2, f1, stv0)

                    def step(k, lastv):
                        fv = word(k)
                        ring[(w0i + k) & RM] = fv
                        return fv

                    last = jax.lax.cond(
                        nw > 2,
                        lambda: jax.lax.fori_loop(2, nw, step, last),
                        lambda: last)
                    return finish(last)

                def slow_copy():
                    # boundary-crossing copy: per byte with exact flushes
                    def bc(k, s3):
                        o5, c5 = s3
                        vb = jnp.where(
                            is_lit,
                            jnp.where((k & 1) == 0, payload & 0xFF,
                                      _shr(e, 24) & 0xFF),
                            ring_byte(o5 - dist))
                        return wr_byte(o5, c5, vb, True)
                    return jax.lax.fori_loop(0, ln, bc, (oo, cc))

                oo, cc = jax.lax.cond(
                    crossing, slow_copy,
                    lambda: jax.lax.cond(use_pat, copy_pattern, copy_funnel))

                # a non-crossing item can land exactly on the boundary
                @pl.when((ln > 0) & (~crossing)
                         & ((oo & (RINGB - 1)) == 0))
                def _():
                    flush(oo)
                return (tt2, bb2, oo, cc, stt, eob)

            # (rejected A/B: unrolling two burst+item rounds per while
            # iteration behind a lax.cond measured 57.2 vs 59.4 MB/s —
            # the branch costs more than the saved loop boundary)
            tt, bb, oo, cc, stt, _ = jax.lax.while_loop(
                grp_cond, grp_body,
                (tt, bb, op, cur, stat, jnp.int32(0)))
            return tt, bb, oo, cc, stt

        def huff_branch():
            return do_huffman(t, base, op, cur, btype)

        def stored_branch():
            return do_stored(t, base, op, cur)

        def bad_branch():
            return t, base, op, cur, jnp.int32(BAD_DATA)

        t2, base2, op2, cur2, stat = jax.lax.cond(
            btype == 0, stored_branch,
            lambda: jax.lax.cond(btype == 3, bad_branch, huff_branch))

        status = jnp.where(status == OK, stat, status)
        done = jnp.where((final == 1) | (status != OK), 1, 0)
        return (t2, base2, op2, cur2, status, final, done)

    t, base, op, cur, status, final, done = jax.lax.while_loop(
        blk_cond, blk_body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
         jnp.int32(OK), jnp.int32(0), jnp.int32(0)))

    # known-size contract: short output is an error (strict mode only —
    # unknown-size callers read oplen instead)
    status = jnp.where(
        (status == OK) & (strict_ref[b] == 1) & (op != olen),
        BAD_DATA, status)

    # final partial flush
    @pl.when((status == OK) & ((op & (FLUSHB - 1)) != 0))
    def _():
        flush(op)

    status_ref[b] = status
    oplen_ref[b] = op
    cons_ref[b] = jnp.minimum(_shr(t + 7, 3), clen_ref[b])


@functools.partial(jax.jit,
                   static_argnames=("out_bytes", "known_size", "interpret"))
def decompress_chunks_pallas(comp_words, comp_len, out_len,
                             out_bytes: int, known_size: bool = True,
                             interpret: bool = False):
    """Decode B raw-DEFLATE chunks on the scalar core.

    comp_words: u32/i32[B, W] little-endian words of each compressed
      stream, zero-padded by at least STAGE_W words beyond the data.
    comp_len: i32[B] compressed byte counts.
    out_len: i32[B] expected output byte counts (known-size mode) or the
      per-chunk capacity (unknown-size mode).
    out_bytes: static per-chunk output capacity (multiple of 4).
    known_size: if True, op != out_len is BAD_DATA (the reference's
      NULL-actual_out contract); if False, decode stops at BFINAL and the
      produced length is reported.

    Returns (out u8[B, out_bytes], status i32[B], out_lens i32[B],
    consumed i32[B]).
    """
    B, W = comp_words.shape
    assert out_bytes % 4 == 0
    # flush slack (full-ring DMAs) + rounding so every chunk's flat
    # offset b * out_w stays 1024-word aligned (1-D HBM DMA tiling)
    out_w = -(-(out_bytes // 4) // 1024) * 1024 + RING_W
    # flat 1-D DMA arrays with 128-word-aligned chunk strides: Mosaic
    # tiles 2-D HBM memrefs (8,128), making single-row DMA slices illegal
    W_pad = -(-W // 1024) * 1024
    cw = comp_words.astype(jnp.int32)
    if W_pad != W:
        cw = jnp.pad(cw, ((0, 0), (0, W_pad - W)))
    cw = cw.reshape(B * W_pad)
    strict = jnp.full((B,), 1 if known_size else 0, jnp.int32)

    out, status, oplens, consumed = pl.pallas_call(
        functools.partial(_decode_kernel, W=W_pad, OW=out_w),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # comp_len
            pl.BlockSpec(memory_space=pltpu.SMEM),   # out_len
            pl.BlockSpec(memory_space=pltpu.SMEM),   # strict flags
            pl.BlockSpec(memory_space=pltpu.SMEM),   # constant tables
            # explicitly HBM: under ANY the compiler may place the array
            # in VMEM with (8,128) tiling, where the per-chunk 1-row DMA
            # slice is illegal ("slice shape along dim 0 must be aligned
            # to tiling"); HBM memrefs are untiled so arbitrary-row DMA
            # staging is allowed
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # out words
            pl.BlockSpec(memory_space=pltpu.SMEM),   # status
            pl.BlockSpec(memory_space=pltpu.SMEM),   # out lens
            pl.BlockSpec(memory_space=pltpu.SMEM),   # consumed bytes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * out_w,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((STAGE_W,), jnp.int32),       # input staging
            pltpu.SMEM((RING_W,), jnp.int32),        # LZ window ring
            pltpu.SMEM((LL_SIZE,), jnp.int32),       # litlen table
            pltpu.SMEM((OF_SIZE,), jnp.int32),       # offset table
            pltpu.SMEM((128,), jnp.int32),           # precode table
            pltpu.SMEM((1184 + 19,), jnp.int32),     # lens (+precode lens)
            pltpu.SMEM((1184,), jnp.int32),          # builder scratch
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(comp_len.astype(jnp.int32), out_len.astype(jnp.int32), strict,
      jnp.asarray(_CONSTS), cw)

    out_bytes_arr = jax.lax.bitcast_convert_type(
        out.reshape(B, out_w)[:, : out_bytes // 4], jnp.uint8
    ).reshape(B, out_bytes)
    return out_bytes_arr, status, oplens, consumed


def decompress_chunks_pallas_host(streams, out_lens, interpret=False):
    """Host-convenience wrapper: list[bytes] -> (list[bytes], list[int])."""
    B = len(streams)
    out_cap = max(max(out_lens), 4)
    out_cap = -(-out_cap // 4) * 4
    wmax = max(-(-len(s) // 4) for s in streams) + 2 * STAGE_W
    comp = np.zeros((B, wmax), np.uint32)
    clen = np.zeros(B, np.int32)
    for k, s in enumerate(streams):
        pad = (-len(s)) % 4
        comp[k, : (len(s) + pad) // 4] = np.frombuffer(
            s + b"\0" * pad, np.uint32)
        clen[k] = len(s)
    out, status, _, _ = decompress_chunks_pallas(
        jnp.asarray(comp), jnp.asarray(clen),
        jnp.asarray(np.asarray(out_lens, np.int32)), out_cap,
        interpret=interpret)
    out = np.asarray(out)
    status = np.asarray(status)
    return ([bytes(out[k, : out_lens[k]]) for k in range(B)],
            [int(s) for s in status])


def decompress_chunks(bufs, in_lens, out_cap: int, interpret: bool = False):
    """decompress/tpu.py-compatible unknown-size entry point on the Pallas
    decoder: uint8[B, N], int32[B] -> (uint8[B, out_cap], out_lens,
    consumed, results).  Conversion to padded words happens on device."""
    B, N = bufs.shape
    padded = -(-N // 4) * 4 + 8 * STAGE_W
    b8 = jnp.zeros((B, padded), jnp.uint8).at[:, :N].set(bufs)
    words = jax.lax.bitcast_convert_type(
        b8.reshape(B, padded // 4, 4), jnp.uint32)
    cap4 = -(-out_cap // 4) * 4
    out, status, oplens, consumed = decompress_chunks_pallas(
        words, in_lens, jnp.full((B,), cap4, jnp.int32), cap4,
        known_size=False, interpret=interpret)
    return out[:, :out_cap], oplens, consumed, status
