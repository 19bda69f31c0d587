"""Dynamic-Huffman DEFLATE blocks on the TPU — fully device-resident.

This extends the static-code pipeline (tpu_pipeline.py) with per-chunk
dynamic litlen codes, the TPU re-derivation of the reference's
``deflate_make_huffman_code`` + ``deflate_flush_block``
(lib/deflate_compress.c:1318-1396, 1706-2038).  Design constraints are the
measured op costs of the chip: no per-position table gathers, no large
scatters, no global sorts.

- **Histogram + translation share ONE batched segment sort** of
  ``sym<<15|pos`` keys.  Symbol counts fall out of 287 searchsorted
  boundaries per segment; per-position code lookup scatters ~287 per-row
  table *deltas* at those same boundaries and prefix-sums them back
  (exact triangular f32 matmuls: partial sums telescope to a table entry,
  < 2^19).  A payload sort keyed on position un-permutes.  Translating a
  million positions therefore costs two cheap batched sorts, not 1M
  gathers.
- **Code lengths** — a Kraft-budget scan over the 286 symbols in
  frequency order (budget 2^11 units, length cap 11), then bounded
  double/halve passes that spend the budget *exactly*: DEFLATE decoders
  require a complete litlen code (build_decode_table's completeness
  rules, lib/deflate_decompress.c:803-853).  The length-11 cap bounds
  every emission slot so 32-position groups stay within 12 words.
- **Canonical code assignment** — RFC 1951 §3.2.2 exactly, vectorized as
  an all-pairs rank over [286].
- **Offset + precode tables are fixed complete codes** (offsets: slots
  0-1 at 4 bits, 2-29 at 5 bits; precode: lengths 0-15 at 4 bits), so
  their translations stay pure arithmetic and the dynamic header is a
  constant 1338 bits.  The small ratio cost (<1%) buys gather-free
  emission; host levels keep exact reference parity.
- **Per-chunk block-type choice** — each chunk emits dynamic or static,
  whichever costs fewer total bits (the reference's block-type compare,
  lib/deflate_compress.c:1748-1814; the stored fallback stays in the host
  API layer via the compress-bound contract).
- **Match items split across two slots**: a match at position i emits
  (litlen code + length extra, <= 16 bits) in slot i and (offset code +
  offset extra, <= 18 bits) in slot i+1 — always free, since matches span
  >= 3 positions.  Keeps every slot <= 32 bits despite 11-bit codes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .tpu_pipeline import (
    _exclusive_bit_offsets,
    _group_pack,
    _length_slot,
    _offset_slot,
    _parse_chunk,
    _rev16,
    _segment_sizes,
)

NSYM = 286          # litlen symbols declared (HLIT=29)
DONT_CARE = 286     # sorts after every real symbol
MAX_CODE_LEN = 11   # keeps emission slots 32-bit; Kraft budget 2^11
KRAFT = 1 << MAX_CODE_LEN
# worst group: 32 literals * 11 bits = 352 bits -> 11 words + carry
DYN_CAPW = 12

# ---------------------------------------------------------------------------
# Constant tables (numpy, built once at import)
# ---------------------------------------------------------------------------


def _rev_bits_np(x: np.ndarray, nbits: np.ndarray) -> np.ndarray:
    out = np.zeros_like(x)
    for i in range(16):
        out = (out << 1) | ((x >> i) & 1)
    return out >> (16 - nbits)


def _static_packed_table() -> np.ndarray:
    """T[sym] = rev_code<<4 | len for the RFC 1951 static litlen code."""
    sym = np.arange(288)
    lens = np.where(sym < 144, 8, np.where(sym < 256, 9, np.where(sym < 280, 7, 8)))
    code = np.where(
        sym < 144,
        0x30 + sym,
        np.where(sym < 256, 0x190 + sym - 144,
                 np.where(sym < 280, sym - 256, 0xC0 + sym - 280)),
    )
    rev = _rev_bits_np(code.astype(np.uint32), lens.astype(np.uint32))
    return ((rev << 4) | lens).astype(np.int32)


_T_STATIC_NP = _static_packed_table()
_T_STATIC = jnp.asarray(_T_STATIC_NP)       # [288]
_STATIC_LENS = jnp.asarray(_T_STATIC_NP[:NSYM] & 15)

# Fixed dynamic header: BFINAL=0 BTYPE=10, HLIT=29, HDIST=29, HCLEN=15;
# precode = values 0..15 all length 4 (16 * 2^-4 = 1, complete; 16/17/18
# length 0); dist code = slots 0,1 length 4, slots 2..29 length 5
# (2/16 + 28/32 = 1, complete).
_PRECODE_PERM = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]
_DIST_LENS = np.array([4, 4] + [5] * 28, dtype=np.int64)
HDR_BITS = 17 + 19 * 3 + NSYM * 4 + 30 * 4  # = 1338


def _rev4_np(v: int) -> int:
    return ((v & 1) << 3) | ((v & 2) << 1) | ((v & 4) >> 1) | ((v & 8) >> 3)


def _header_consts():
    vals = [0b100, NSYM - 257, 29, 15]
    bits = [3, 5, 5, 4]
    for p in _PRECODE_PERM:
        vals.append(0 if p >= 16 else 4)
        bits.append(3)
    litlen_off = sum(bits)
    dist_off = litlen_off + NSYM * 4
    dvals = [_rev4_np(int(l)) for l in _DIST_LENS]
    offs = np.concatenate([[0], np.cumsum(bits)[:-1]]).astype(np.int32)
    return (
        np.array(vals, np.uint32), offs, litlen_off, dist_off,
        np.array(dvals, np.uint32),
    )


(_HDR_VALS, _HDR_OFFS, _LITLEN_OFF, _DIST_OFF, _DIST_LEN_CODES) = _header_consts()
_J_HDR_VALS = jnp.asarray(_HDR_VALS)
_J_HDR_OFFS = jnp.asarray(_HDR_OFFS)
_J_DIST_CODES = jnp.asarray(_DIST_LEN_CODES)


# ---------------------------------------------------------------------------
# Device-side canonical Huffman over 286 symbols
# ---------------------------------------------------------------------------
def _bsr_i32(x):
    return 31 - jax.lax.clz(jnp.maximum(x.astype(jnp.int32), 1))


def _build_litlen_lens(hist: jax.Array):
    """Kraft-exact length assignment, lens in [0..MAX_CODE_LEN].

    Returns (lens int32[NSYM], ok bool); `ok` False means the completion
    passes could not spend the budget exactly and the caller must fall
    back to the static code (never observed in practice, but safe)."""
    total = jnp.maximum(jnp.sum(hist), 1)
    used = hist > 0

    # ideal Kraft share rounded to the NEAREST power of two in [1, 2^10]
    # (geometric midpoint 1.5x: floor alone costs ~5% on flat histograms)
    share = (hist.astype(jnp.uint32) * jnp.uint32(KRAFT)) // total.astype(jnp.uint32)
    e = _bsr_i32(jnp.maximum(share, 1))
    half = jnp.uint32(1) << jnp.maximum(e - 1, 0).astype(jnp.uint32)
    bump = share - (jnp.uint32(1) << e.astype(jnp.uint32)) > half
    e = e + bump.astype(jnp.int32)
    k_des = jnp.where(
        used,
        jnp.left_shift(jnp.int32(1), jnp.clip(e, 0, MAX_CODE_LEN - 1)),
        0,
    )

    # frequency-descending greedy spend, reserving 1 unit per later symbol
    order = jnp.argsort(-(hist * 512 + (NSYM - jnp.arange(NSYM))))
    k_sorted = k_des[order]
    used_sorted = used[order]
    remaining_after = (
        jnp.cumsum(used_sorted[::-1].astype(jnp.int32))[::-1]
        - used_sorted.astype(jnp.int32)
    )

    def step(budget, xs):
        kd, u, rem = xs
        allow = jnp.maximum(budget - rem, 1)
        k = jnp.where(
            u, jnp.left_shift(jnp.int32(1), _bsr_i32(jnp.minimum(kd, allow))), 0
        )
        return budget - k, k

    _, k_got = jax.lax.scan(
        step, jnp.int32(KRAFT), (k_sorted, used_sorted, remaining_after)
    )
    k = jnp.zeros(NSYM, jnp.int32).at[order].set(k_got)

    # spend the remainder exactly: double the largest k <= R, else halve
    # the smallest k > R to raise R; bounded passes, no-ops once R == 0
    def fix(state, _):
        k, r = state
        can_dbl = used & (k <= r) & (k < (KRAFT >> 1))
        any_dbl = jnp.any(can_dbl)
        dbl_pick = jnp.argmax(jnp.where(can_dbl, k, -1))
        can_hlv = used & (k > r) & (k >= 2)
        hlv_pick = jnp.argmin(jnp.where(can_hlv, k, 1 << 30))
        idx = jnp.where(any_dbl, dbl_pick, hlv_pick)
        onehot = jnp.arange(NSYM) == idx
        delta = jnp.where(any_dbl, k[idx], -(k[idx] >> 1))
        live = r > 0
        k = jnp.where(live & onehot, k + delta, k)
        r = jnp.where(live, r - delta, r)
        return (k, r), None

    (k, r), _ = jax.lax.scan(
        fix, (k, jnp.int32(KRAFT) - jnp.sum(k)), None, length=48
    )
    lens = jnp.where(k > 0, MAX_CODE_LEN - _bsr_i32(jnp.maximum(k, 1)), 0)
    n_used = jnp.sum(used.astype(jnp.int32))
    return lens.astype(jnp.int32), (r == 0) & (n_used >= 2)


def _canonical_table(lens: jax.Array) -> jax.Array:
    """T[sym] = rev_code<<4 | len (packed), canonical per RFC 1951 §3.2.2."""
    sym = jnp.arange(NSYM)
    l_iota = jnp.arange(MAX_CODE_LEN + 1)
    bl_count = jnp.sum(
        (lens[None, :] == l_iota[:, None]).astype(jnp.int32), axis=1
    ).at[0].set(0)

    def stepc(code, cnt_prev):
        code = (code + cnt_prev) << 1
        return code, code

    _, first_tail = jax.lax.scan(stepc, jnp.int32(0), bl_count[:-1])
    first = jnp.concatenate([jnp.zeros(1, jnp.int32), first_tail])  # first[l]
    same_shorter = (lens[None, :] == lens[:, None]) & (sym[None, :] < sym[:, None])
    rank = jnp.sum(same_shorter.astype(jnp.int32), axis=1)
    code = first[lens] + rank
    rev = _rev16(code.astype(jnp.uint32)) >> (
        jnp.uint32(16) - jnp.maximum(lens, 1).astype(jnp.uint32)
    )
    return jnp.where(lens > 0, (rev.astype(jnp.int32) << 4) | lens, 0)


# ---------------------------------------------------------------------------
# One sort -> histogram + per-position translation
# ---------------------------------------------------------------------------
def _sort_syms(sym: jax.Array, seg: int):
    """Segment sort of sym<<15|pos keys.  Returns (sorted keys [m,seg],
    per-row symbol boundary starts [m, NSYM+1], global hist [NSYM])."""
    n = sym.shape[0]
    m = n // seg
    lp = jax.lax.broadcasted_iota(jnp.uint32, (m, seg), 1)
    key = (sym.reshape(m, seg).astype(jnp.uint32) << jnp.uint32(15)) | lp
    (sk,) = jax.lax.sort((key,), num_keys=1, dimension=1)
    bounds = jnp.arange(NSYM + 1, dtype=jnp.uint32) << jnp.uint32(15)
    starts = jax.vmap(
        lambda row: jnp.searchsorted(row, bounds, side="left")
    )(sk).astype(jnp.int32)
    hist = jnp.sum(starts[:, 1:] - starts[:, :-1], axis=0)
    return sk, starts, hist


def _translate(sk: jax.Array, starts: jax.Array, table: jax.Array, seg: int):
    """Per-position packed code via boundary-delta scatter + row prefix sum
    (exact: partial delta sums telescope to a table entry < 2^19)."""
    m = sk.shape[0]
    tpad = jnp.concatenate([jnp.zeros(1, jnp.int32), table[:NSYM]])
    deltas = jnp.broadcast_to((tpad[1:] - tpad[:-1])[None, :], (m, NSYM))
    s0 = starts[:, :-1]
    in_row = s0 < seg          # a start == seg would wrap: drop (absent tail)
    deltas = jnp.where(in_row, deltas, 0)
    idx = jnp.arange(m, dtype=jnp.int32)[:, None] * seg + jnp.minimum(s0, seg - 1)
    dvec = jnp.zeros(m * seg, jnp.int32).at[idx.reshape(-1)].add(
        deltas.reshape(-1), mode="promise_in_bounds"
    ).reshape(m, seg)
    excl = jax.vmap(lambda row: _exclusive_bit_offsets(row)[0])(dvec)
    v_sorted = (excl + dvec).astype(jnp.uint32)
    slp = sk & jnp.uint32(32767)
    _, v = jax.lax.sort((slp, v_sorted), num_keys=1, dimension=1)
    return v.reshape(m * seg).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Main entry
# ---------------------------------------------------------------------------
def compress_chunk_dynamic(b: jax.Array, length: jax.Array, bfinal: jax.Array):
    """Compress one chunk into a byte-aligned raw-DEFLATE fragment using a
    per-chunk dynamic litlen code (static block selected per chunk when
    cheaper).  Same output contract as compress_chunk_static."""
    n = b.shape[0]
    _, sort_seg, _ = _segment_sizes(n)
    bp, pos, commit_match, commit_lit, eff, dist = _parse_chunk(b, length)

    lslot, lbase, lextra = _length_slot(jnp.maximum(eff, 3))
    sym = jnp.where(
        commit_match,
        257 + lslot,
        jnp.where(commit_lit, bp.astype(jnp.int32), DONT_CARE),
    )

    # ---- dynamic litlen code ------------------------------------------------
    sk, starts, hist = _sort_syms(sym, sort_seg)
    hist = hist.at[256].add(1)                         # EOB
    hist = hist.at[0].add(jnp.where(hist[0] == 0, 1, 0))  # >= 2 used symbols
    lens, ok = _build_litlen_lens(hist)
    t_dyn = _canonical_table(lens)

    # block-type choice on symbol-level cost (extras are identical)
    dyn_cost = jnp.sum(hist * lens) + HDR_BITS
    static_cost = jnp.sum(hist * _STATIC_LENS) + 3
    use_dyn = ok & (dyn_cost < static_cost)

    table = jnp.where(use_dyn, t_dyn, _T_STATIC[:NSYM])
    code_at = _translate(sk, starts, table, sort_seg)

    # ---- emission columns ----------------------------------------------------
    clen = (code_at & 15).astype(jnp.int32)
    ccode = (code_at >> 4).astype(jnp.uint32)

    lx = jnp.where(commit_match, eff - lbase, 0).astype(jnp.uint32)
    val_a = jnp.where(
        commit_match | commit_lit, ccode | (lx << clen.astype(jnp.uint32)), 0
    )
    nb_a = jnp.where(
        commit_match, clen + lextra, jnp.where(commit_lit, clen, 0)
    ).astype(jnp.int32)

    # offset part in the NEXT slot (matches span >= 3, so it is free);
    # the offset code itself switches with the block type
    oslot, obase, oextra = _offset_slot(jnp.maximum(dist, 1))
    dyn_olen = jnp.where(oslot < 2, 4, 5)
    dyn_oc = jnp.where(oslot < 2, oslot, oslot + 2).astype(jnp.uint32)
    olen = jnp.where(use_dyn, dyn_olen, 5).astype(jnp.int32)
    oc_raw = jnp.where(use_dyn, dyn_oc, oslot.astype(jnp.uint32))
    ocode = _rev16(oc_raw) >> (jnp.uint32(16) - olen.astype(jnp.uint32))
    ox = (dist - obase).astype(jnp.uint32)
    off_val = ocode | (ox << olen.astype(jnp.uint32))
    off_bits = olen + oextra

    prev_match = jnp.concatenate([jnp.zeros(1, bool), commit_match[:-1]])
    val = jnp.where(
        prev_match,
        jnp.concatenate([jnp.zeros(1, jnp.uint32), off_val[:-1]]),
        val_a,
    )
    nb = jnp.where(
        prev_match,
        jnp.concatenate([jnp.zeros(1, jnp.int32), off_bits[:-1]]),
        nb_a,
    )

    # ---- layout + pack --------------------------------------------------------
    hdr_bits_n = jnp.where(use_dyn, HDR_BITS, 3)
    offs, body_bits = _exclusive_bit_offsets(nb)
    offs = offs + hdr_bits_n

    nwords = (MAX_CODE_LEN * n + 2 * HDR_BITS + 256 + 31) // 32
    words = _group_pack(val, nb, offs, nwords, capw=DYN_CAPW)

    # header words: dynamic (constant layout, 1338 bits) or static (3 bits)
    lit_codes = _rev16(lens.astype(jnp.uint32)) >> jnp.uint32(12)
    hvals = jnp.concatenate([_J_HDR_VALS, lit_codes, _J_DIST_CODES])
    hoffs = jnp.concatenate(
        [
            _J_HDR_OFFS,
            _LITLEN_OFF + 4 * jnp.arange(NSYM, dtype=jnp.int32),
            _DIST_OFF + 4 * jnp.arange(30, dtype=jnp.int32),
        ]
    )
    hsb = (hoffs & 31).astype(jnp.uint32)
    hw = hoffs >> 5
    hdr_words = jnp.zeros(44, jnp.uint32)
    hdr_words = hdr_words.at[hw].add(hvals << hsb, mode="promise_in_bounds")
    hdr_words = hdr_words.at[hw + 1].add(
        jnp.where(hsb > 0, hvals >> (jnp.uint32(32) - jnp.maximum(hsb, 1)), 0),
        mode="promise_in_bounds",
    )
    static_hdr = jnp.zeros(44, jnp.uint32).at[0].set(jnp.uint32(0b010))
    words = words.at[:44].add(jnp.where(use_dyn, hdr_words, static_hdr))

    # ---- tail: EOB, byte-align, sync-flush stored marker ----------------------
    tbl_eob = table[256]
    eob_code = (tbl_eob >> 4).astype(jnp.uint32)
    eob_len = (tbl_eob & 15).astype(jnp.int32)
    eob_off = body_bits + hdr_bits_n
    end = eob_off + eob_len
    pad_bits = (-(end + 3)) % 8
    tail_vals = jnp.stack(
        [
            eob_code,
            jnp.where(bfinal, jnp.uint32(1), jnp.uint32(0)),
            jnp.uint32(0xFFFF0000),
        ]
    )
    tail_offs = jnp.stack([eob_off, end, end + 3 + pad_bits])
    tsb = (tail_offs & 31).astype(jnp.uint32)
    tw = tail_offs >> 5
    words = words.at[tw].add(tail_vals << tsb, mode="drop")
    words = words.at[tw + 1].add(
        jnp.where(tsb > 0, tail_vals >> (jnp.uint32(32) - jnp.maximum(tsb, 1)), 0),
        mode="drop",
    )
    total_bits = end + 3 + pad_bits + 32
    return words, total_bits


@jax.jit
def compress_chunks_dynamic(bufs: jax.Array, lengths: jax.Array, bfinal: jax.Array):
    """vmapped dynamic-code chunk compressor: uint8[B, N], int32[B], bool[B]
    -> (uint32[B, W], int32[B])."""
    return jax.vmap(compress_chunk_dynamic)(bufs, lengths, bfinal)
