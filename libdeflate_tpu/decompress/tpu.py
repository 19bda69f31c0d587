"""TPU whole-buffer DEFLATE decoder: fully-jitted, vmappable across chunks.

Decoding DEFLATE is bit-serial per stream (each codeword's position depends
on all previous ones — SURVEY.md §7 "hard parts"), so the TPU design extracts
parallelism from the *chunk* axis: B chunks decode in lockstep under
``vmap``.  Structure:

- an outer ``lax.while_loop`` advances one *block* per iteration: header
  parse, then ``lax.switch`` into stored-copy / static / dynamic-header
  handling (the heavy per-block work — canonical table construction, RLE —
  runs once per block, not per symbol);
- an inner ``lax.while_loop`` decodes one *symbol* per iteration with only
  light vector ops (peek, 15-lane canonical length resolve, 264-byte masked
  match-copy window).

Per-block Huffman decoding uses the *count-based canonical* method instead
of the reference's big lookup tables (lib/deflate_decompress.c:721-1004):
per code we keep ``count[len]``, ``first_code[len]``, ``first_idx[len]`` and
a (len, sym)-sorted symbol array.  A symbol decode peeks 15 bits, reverses
them, and resolves the unique length with a vector compare — no ENOUGH-sized
scatter-built table per block.  Validity rules (overfull rejected,
zlib-compatible incomplete-code cases accepted) match the host decoders.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.deflate import (
    LENGTH_SLOT_BASE,
    LENGTH_SLOT_EXTRA,
    OFFSET_SLOT_BASE,
    OFFSET_SLOT_EXTRA,
    PRECODE_LENS_PERMUTATION,
    STATIC_LITLEN_LENS,
    STATIC_OFFSET_LENS,
)

_LEN_BASE = jnp.asarray(LENGTH_SLOT_BASE.astype(np.int32))
_LEN_EXTRA = jnp.asarray(LENGTH_SLOT_EXTRA.astype(np.int32))
_OFF_BASE = jnp.asarray(OFFSET_SLOT_BASE.astype(np.int32))
_OFF_EXTRA = jnp.asarray(OFFSET_SLOT_EXTRA.astype(np.int32))
_PERM = jnp.asarray(PRECODE_LENS_PERMUTATION.astype(np.int32))

_MAXSYMS = 288  # largest alphabet (litlen); offsets/precode are padded to it

RES_OK = 0
RES_BAD = 1
RES_INSUFFICIENT = 3


# --------------------------------------------------------------------------
# canonical table math (host precompute for static, device fn for dynamic)
# --------------------------------------------------------------------------
def _canon_host(lens: np.ndarray):
    """Host: (count16, first_code16, first_idx16, sorted_syms[_MAXSYMS])."""
    lens = np.asarray(lens, dtype=np.int32)
    count = np.bincount(lens, minlength=16)[:16]
    count[0] = 0
    first_code = np.zeros(16, np.int32)
    code = 0
    for l in range(1, 16):
        first_code[l] = code
        code = (code + count[l]) << 1
    first_idx = np.zeros(16, np.int32)
    first_idx[1:] = np.cumsum(count)[:15]
    key = np.where(lens > 0, lens, 99) * 1024 + np.arange(len(lens))
    order = np.argsort(key, kind="stable").astype(np.int32)
    syms = np.zeros(_MAXSYMS, np.int32)
    syms[: len(order)] = order
    return (
        jnp.asarray(count.astype(np.int32)),
        jnp.asarray(first_code),
        jnp.asarray(first_idx),
        jnp.asarray(syms),
    )


_ST_LL = _canon_host(STATIC_LITLEN_LENS)
_ST_OF = _canon_host(STATIC_OFFSET_LENS)


def _canon_tables(lens: jax.Array, nsyms: jax.Array):
    """Device: canonical decode structures from lens[_MAXSYMS] (zeros padded).

    Returns (ok, count, first_code, first_idx, sorted_syms).  Incomplete
    codes are accepted only as the empty code or a single 1-bit codeword
    (mapped to a complete 1-bit code), like the reference
    (lib/deflate_decompress.c:790-853).
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, (_MAXSYMS, 1), 0)[:, 0]
    lens = jnp.where(idx < nsyms, lens, 0)
    onehot = (lens[:, None] == jnp.arange(16)[None, :]).astype(jnp.int32)
    count = jnp.sum(onehot, axis=0).at[0].set(0)

    codespace = jnp.sum(count[1:] * (1 << (15 - jnp.arange(1, 16))))
    full = 1 << 15
    overfull = codespace > full
    single_ok = (codespace == (full >> 1)) & (count[1] == 1)
    empty_ok = codespace == 0
    incomplete = codespace < full
    bad = overfull | (incomplete & ~(single_ok | empty_ok))

    one_sym = jnp.argmax(lens == 1).astype(jnp.int32)
    patch_sym = jnp.where(empty_ok, 0, one_sym)
    patched = jnp.zeros(_MAXSYMS, jnp.int32).at[patch_sym].set(1)
    use_patch = incomplete & ~bad
    lens = jnp.where(use_patch, patched, lens)
    onehot = (lens[:, None] == jnp.arange(16)[None, :]).astype(jnp.int32)
    count = jnp.sum(onehot, axis=0).at[0].set(0)
    count = jnp.where(use_patch, count.at[1].set(2), count)

    def fc_body(l, carry):
        code, fc = carry
        fc = fc.at[l].set(code)
        return ((code + count[l]) << 1, fc)

    _, first_code = jax.lax.fori_loop(
        1, 16, fc_body, (jnp.int32(0), jnp.zeros(16, jnp.int32))
    )
    first_idx = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(count)[:15].astype(jnp.int32)]
    )
    key = jnp.where(lens > 0, lens, 99) * 1024 + idx
    sorted_syms = jnp.argsort(key).astype(jnp.int32)
    sorted_syms = jnp.where(
        use_patch, sorted_syms.at[1].set(sorted_syms[0]), sorted_syms
    )
    return ~bad, count, first_code, first_idx, sorted_syms


def _rev16(x):
    x = x.astype(jnp.uint32)
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return x


def _peek(data32, bit_pos):
    """Peek 25+ bits at an absolute LSB-first bit position."""
    word_idx = bit_pos >> 5
    sh = (bit_pos & 31).astype(jnp.uint32)
    lo = data32[word_idx] >> sh
    hi = jnp.where(sh > 0, data32[word_idx + 1] << (jnp.uint32(32) - sh), jnp.uint32(0))
    return lo | hi


def _decode_sym(data32, bit_pos, count, first_code, first_idx, sorted_syms):
    bits15 = _peek(data32, bit_pos) & jnp.uint32(0x7FFF)
    rev = (_rev16(bits15) >> jnp.uint32(1)).astype(jnp.int32)
    ls = jnp.arange(1, 16)
    pref = rev >> (15 - ls)
    off = pref - first_code[1:]
    valid = (off >= 0) & (off < count[1:])
    ok = jnp.any(valid)
    l = (jnp.argmax(valid) + 1).astype(jnp.int32)
    sym = sorted_syms[jnp.clip(first_idx[l] + off[l - 1], 0, _MAXSYMS - 1)]
    return sym, bit_pos + l, ok


@functools.partial(jax.jit, static_argnums=(2,))
def deflate_decompress_chunk(data: jax.Array, in_nbytes: jax.Array, out_cap: int):
    """Decode one raw-DEFLATE stream (uint8[N]) into uint8[out_cap].

    Returns (out, out_len, in_consumed_bytes, result)."""
    n_pad = data.shape[0]
    # zero bytes beyond the valid input so peeks see implicit zeros only
    iidx = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]
    data = jnp.where(iidx < in_nbytes, data, 0)
    d = jnp.pad(data, (0, (-n_pad) % 4 + 16)).astype(jnp.uint32)
    data32 = (
        d[0::4]
        | (d[1::4] << jnp.uint32(8))
        | (d[2::4] << jnp.uint32(16))
        | (d[3::4] << jnp.uint32(24))
    )
    total_bits = in_nbytes.astype(jnp.int32) * 8
    hard_limit = total_bits + 49  # implicit-zero overread budget (~6 bytes)

    out_padded_len = out_cap + 65536 + 272

    st = dict(
        bit_pos=jnp.int32(0),
        out_pos=jnp.int32(0),
        out=jnp.zeros(out_padded_len, jnp.uint8),
        result=jnp.int32(RES_OK),
        running=jnp.bool_(True),
        is_final=jnp.bool_(False),
    )

    def symbol_loop(s, tables):
        llc, llf, lli, lls, ofc, off_, ofi, ofs = tables

        def sym_cond(t):
            return t["running"]

        def sym_step(t):
            t = dict(t)
            sym, nbp, ok = _decode_sym(data32, t["bit_pos"], llc, llf, lli, lls)
            is_lit = sym < 256
            is_eob = sym == 256
            is_len = (sym > 256) & (sym < 286)
            bad = (~ok) | (sym >= 286) | (nbp > hard_limit)

            lit_overflow = is_lit & (t["out_pos"] >= out_cap)

            lslot = jnp.clip(sym - 257, 0, 28)
            lxb = _LEN_EXTRA[lslot]
            lx = (
                _peek(data32, nbp)
                & ((jnp.uint32(1) << lxb.astype(jnp.uint32)) - 1)
            ).astype(jnp.int32)
            length = _LEN_BASE[lslot] + lx
            bp2 = nbp + lxb
            osym, bp3, ook = _decode_sym(data32, bp2, ofc, off_, ofi, ofs)
            oslot = jnp.clip(osym, 0, 29)
            oxb = _OFF_EXTRA[oslot]
            ox = (
                _peek(data32, bp3)
                & ((jnp.uint32(1) << oxb.astype(jnp.uint32)) - 1)
            ).astype(jnp.int32)
            offset = _OFF_BASE[oslot] + ox
            bp4 = bp3 + oxb
            mbad = is_len & (
                (~ook) | (osym >= 30) | (offset > t["out_pos"]) | (bp4 > hard_limit)
            )
            moverflow = is_len & ~mbad & (t["out_pos"] + length > out_cap)

            # ONE unconditional 264-byte window write per symbol: the match
            # copy, the literal (lane 0), and the no-op case all merge into
            # the same dynamic_update_slice, which XLA aliases in-place
            # inside the loop — no full-array selects (those made every
            # symbol cost O(out_cap)).
            do_match = is_len & ~mbad & ~moverflow
            do_lit = is_lit & ~lit_overflow
            src = jnp.maximum(t["out_pos"] - offset, 0)
            win = jax.lax.dynamic_slice(t["out"], (src,), (264,))
            k = jax.lax.broadcasted_iota(jnp.int32, (264, 1), 0)[:, 0]
            src_rel = k % jnp.maximum(offset, 1)
            copy_vals = win[src_rel]
            dst_win = jax.lax.dynamic_slice(t["out"], (t["out_pos"],), (264,))
            merged = jnp.where(
                do_match & (k < length),
                copy_vals,
                jnp.where(do_lit & (k == 0), sym.astype(jnp.uint8), dst_win),
            )
            t["out"] = jax.lax.dynamic_update_slice(
                t["out"], merged, (t["out_pos"],)
            )
            t["out_pos"] = (
                t["out_pos"]
                + jnp.where(do_match, length, 0)
                + jnp.where(do_lit, 1, 0)
            )
            t["bit_pos"] = jnp.where(is_len & ~bad, bp4, nbp).astype(jnp.int32)
            err = bad | mbad
            ins = lit_overflow | moverflow
            t["result"] = jnp.where(
                err, RES_BAD, jnp.where(ins, RES_INSUFFICIENT, t["result"])
            ).astype(jnp.int32)
            t["running"] = ~(err | ins | is_eob)
            return t

        s = dict(s)
        s["running"] = jnp.bool_(True)
        s = jax.lax.while_loop(sym_cond, sym_step, s)
        s["running"] = s["result"] == RES_OK
        return s

    # ---- per-block branches (heavy, once per block) ------------------------
    def block_stored(s):
        s = dict(s)
        bp = (s["bit_pos"] + 7) & ~7
        byte = bp >> 3
        w = _peek(data32, byte * 8)
        length = (w & jnp.uint32(0xFFFF)).astype(jnp.int32)
        nlen = ((w >> jnp.uint32(16)) & jnp.uint32(0xFFFF)).astype(jnp.int32)
        ok = (length ^ 0xFFFF) == nlen
        fits_in = byte + 4 + length <= in_nbytes
        fits_out = s["out_pos"] + length <= out_cap
        src_start = jnp.clip(byte + 4, 0, n_pad)
        win_in = jax.lax.dynamic_slice(
            jnp.pad(data, (0, 65536 + 16)), (src_start,), (65536,)
        )
        win_out = jax.lax.dynamic_slice(s["out"], (s["out_pos"],), (65536,))
        good = ok & fits_in & fits_out
        m = good & (
            jax.lax.broadcasted_iota(jnp.int32, (65536, 1), 0)[:, 0] < length
        )
        merged = jnp.where(m, win_in, win_out)
        s["out"] = jax.lax.dynamic_update_slice(
            s["out"], merged, (s["out_pos"],)
        )
        s["out_pos"] = jnp.where(good, s["out_pos"] + length, s["out_pos"])
        s["bit_pos"] = jnp.where(good, (byte + 4 + length) * 8, s["bit_pos"])
        # check order parity with the native decoder (and the reference):
        # a valid header that doesn't fit the output reports INSUFFICIENT
        # even if the input is also truncated
        s["result"] = jnp.where(
            good, s["result"], jnp.where(ok & ~fits_out, RES_INSUFFICIENT, RES_BAD)
        ).astype(jnp.int32)
        s["running"] = good
        return s

    def block_static(s):
        return symbol_loop(s, (*_ST_LL, *_ST_OF))

    def block_dynamic(s):
        s = dict(s)
        bits = _peek(data32, s["bit_pos"])
        num_litlen = 257 + (bits & 31).astype(jnp.int32)
        num_offsets = 1 + ((bits >> jnp.uint32(5)) & 31).astype(jnp.int32)
        num_explicit = 4 + ((bits >> jnp.uint32(10)) & 15).astype(jnp.int32)
        bp = s["bit_pos"] + 14

        # precode lens: fixed 19-iteration loop, masked beyond num_explicit
        def pre_body(i, carry):
            bp, lens = carry
            active = i < num_explicit
            v = (_peek(data32, bp) & 7).astype(jnp.int32)
            lens = lens.at[_PERM[i]].set(jnp.where(active, v, lens[_PERM[i]]))
            return (bp + jnp.where(active, 3, 0), lens)

        bp, pre_lens = jax.lax.fori_loop(
            0, 19, pre_body, (bp, jnp.zeros(_MAXSYMS, jnp.int32))
        )
        pok, pc, pf, pi, ps = _canon_tables(pre_lens, jnp.int32(19))

        # RLE: one precode symbol per iteration
        total = num_litlen + num_offsets

        def rle_cond(c):
            bp, i, lens, ok = c
            return ok & (i < total)

        def rle_step(c):
            bp, i, lens, ok = c
            sym, nbp, dok = _decode_sym(data32, bp, pc, pf, pi, ps)
            bits2 = _peek(data32, nbp)
            is_lit = sym < 16
            rep = jnp.where(
                is_lit,
                1,
                jnp.where(
                    sym == 16,
                    3 + (bits2 & 3).astype(jnp.int32),
                    jnp.where(
                        sym == 17,
                        3 + (bits2 & 7).astype(jnp.int32),
                        11 + (bits2 & 127).astype(jnp.int32),
                    ),
                ),
            )
            xb = jnp.where(
                sym == 16, 2, jnp.where(sym == 17, 3, jnp.where(sym == 18, 7, 0))
            )
            val = jnp.where(
                is_lit, sym, jnp.where(sym == 16, lens[jnp.maximum(i - 1, 0)], 0)
            )
            bad = (
                (~dok)
                | ((sym == 16) & (i == 0))
                | (i + rep > total)
                | (nbp + xb > hard_limit)
            )
            pos_idx = jax.lax.broadcasted_iota(jnp.int32, (_MAXSYMS + 32, 1), 0)[:, 0]
            write = (pos_idx >= i) & (pos_idx < i + rep)
            lens = jnp.where(write, val, lens)
            return (nbp + xb, i + rep, lens, ok & ~bad)

        bp, i_end, all_lens, rle_ok = jax.lax.while_loop(
            rle_cond, rle_step,
            (bp, jnp.int32(0), jnp.zeros(_MAXSYMS + 32, jnp.int32), pok),
        )
        rle_ok = rle_ok & (i_end == total)

        ll_ok, llc, llf, lli, lls = _canon_tables(all_lens[:_MAXSYMS], num_litlen)
        of_lens = jax.lax.dynamic_slice(
            jnp.pad(all_lens, (0, _MAXSYMS)), (num_litlen,), (_MAXSYMS,)
        )
        of_ok, ofc, off_, ofi, ofs = _canon_tables(of_lens, num_offsets)

        s["bit_pos"] = bp
        good = rle_ok & ll_ok & of_ok
        s["result"] = jnp.where(good, s["result"], RES_BAD).astype(jnp.int32)
        s["running"] = good

        def run_syms(s2):
            return symbol_loop(s2, (llc, llf, lli, lls, ofc, off_, ofi, ofs))

        return jax.lax.cond(good, run_syms, lambda x: dict(x), s)

    def block_bad(s):
        s = dict(s)
        s["result"] = jnp.int32(RES_BAD)
        s["running"] = jnp.bool_(False)
        return s

    # ---- outer block loop ---------------------------------------------------
    def blk_cond(s):
        return s["running"] & ~s["is_final"]

    def blk_step(s):
        s = dict(s)
        bits = _peek(data32, s["bit_pos"])
        s["is_final"] = (bits & 1) == 1
        btype = ((bits >> jnp.uint32(1)) & 3).astype(jnp.int32)
        overran = s["bit_pos"] + 3 > hard_limit
        s["bit_pos"] = s["bit_pos"] + 3
        s = jax.lax.switch(
            jnp.where(overran, 3, btype),
            [block_stored, block_static, block_dynamic, block_bad],
            s,
        )
        return s

    final = jax.lax.while_loop(blk_cond, blk_step, st)
    ok = final["running"] & (final["bit_pos"] <= total_bits)
    result = jnp.where(
        ok, RES_OK, jnp.where(final["result"] == RES_OK, RES_BAD, final["result"])
    )
    consumed = jnp.minimum((final["bit_pos"] + 7) >> 3, in_nbytes)
    return final["out"][:out_cap], final["out_pos"], consumed, result


@functools.lru_cache(maxsize=16)
def _chunks_decoder(out_cap: int):
    fn = jax.vmap(lambda d, n: deflate_decompress_chunk(d, n, out_cap))
    return jax.jit(fn)


def decompress_chunks(bufs, in_lens, out_cap: int):
    """vmapped chunk decoder: uint8[B, N], int32[B] ->
    (uint8[B, out_cap], out_lens, consumed, results).

    The jitted wrapper is cached per out_cap so repeated calls reuse the
    compiled executable instead of re-tracing."""
    return _chunks_decoder(out_cap)(bufs, in_lens)
