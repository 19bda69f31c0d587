"""Dynamic-Huffman DEFLATE blocks on the TPU — fully device-resident.

This extends the static-code pipeline (tpu_pipeline.py) with per-chunk
dynamic litlen AND distance codes, the TPU re-derivation of the
reference's ``deflate_make_huffman_code`` + ``deflate_flush_block``
(lib/deflate_compress.c:1318-1396, 1706-2038).  Design constraints are
the measured op costs of the chip: no per-position table gathers, no
large scatters, no global sorts.

- **One combined alphabet, no sorts.**  Each position carries one symbol:
  committed literals carry the byte, a match's first position carries the
  length symbol (257..285), and the match's SECOND position — always
  inside the span — carries ``286 + dist_slot``.  The symbol histogram
  for both code tables is ONE one-hot MXU matmul (0/1 bf16 operands
  accumulate exactly in f32; counts < 2^24), and per-position code
  translation is a packed-word binary select tree over the 316-entry
  table (`_tree_translate`) — both replace the former segment-sort +
  boundary-delta-scatter + un-permute-sort pipeline, measured 10.3 ms ->
  2.6 ms per 4 MiB batch on the chip at bit-identical streams.
- **Code lengths** — a Kraft-budget scan over symbols in frequency order
  (budget 2^11 units, length cap 11), then bounded double/halve passes
  that spend the budget *exactly*: DEFLATE decoders require complete
  codes (build_decode_table's completeness rules,
  lib/deflate_decompress.c:803-853).  Run per alphabet (286 litlen, 30
  dist).  The length-11 cap bounds every emission slot to <= 24 bits so
  32-position groups stay within 12 words.
- **Canonical code assignment** — RFC 1951 §3.2.2 exactly, vectorized as
  an all-pairs rank.
- **Precode is a fixed complete code** (lengths 0..15 all 4 bits), so
  the header layout is a constant 1338 bits and header emission is
  arithmetic.  Costs <25 bytes/chunk vs RLE'd headers — noise at 1 MiB
  chunks.
- **Per-chunk block-type choice** — each chunk emits dynamic or static,
  whichever costs fewer total bits (the reference's block-type compare,
  lib/deflate_compress.c:1748-1814; the stored fallback stays in the
  host API layer via the compress-bound contract).
- **Match items split across two slots**: a match at position i emits
  (litlen code + length extra, <= 16 bits) in slot i and (dist code +
  offset extra, <= 24 bits) in slot i+1 — always free, since matches
  span >= 3 positions.  Keeps every slot <= 32 bits with 11-bit codes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .tpu_pipeline import (
    _exclusive_bit_offsets,
    _group_pack,
    _group_premerge,
    _length_slot,
    _offset_slot,
    _parse_chunk,
    _rev16,
    _segment_sizes,
)

NSYM = 286            # litlen symbols declared (HLIT=29)
NDIST = 30            # distance symbols declared (HDIST=29)
NSYM_ALL = NSYM + NDIST
DONT_CARE = NSYM_ALL  # sorts after every real symbol
# Code-length cap per tier: the speed tiers keep 11 (smaller group pack
# buffers, cheaper premerge); the quality tiers use DEFLATE's full 15
# (-0.06pp measured on the deep tier).  _canonical_table's packing and
# the fixed 4-bit precode cover both.
MAX_CODE_LEN = 11
MAX_CODE_LEN_DEEP = 15
# worst group: 128 literals * cap bits + carry word
DYN_CAPW = (128 * MAX_CODE_LEN + 31) // 32 + 1        # 45
DYN_CAPW_DEEP = (128 * MAX_CODE_LEN_DEEP + 31) // 32 + 1  # 61

# ---------------------------------------------------------------------------
# Constant tables (numpy, built once at import)
# ---------------------------------------------------------------------------


def _rev_bits_np(x: np.ndarray, nbits: np.ndarray) -> np.ndarray:
    out = np.zeros_like(x)
    for i in range(16):
        out = (out << 1) | ((x >> i) & 1)
    return out >> (16 - nbits)


def _static_packed_tables() -> np.ndarray:
    """T[sym] = rev_code<<4 | len for the RFC 1951 static litlen code,
    followed by the 30 static 5-bit distance codes."""
    sym = np.arange(288)
    lens = np.where(sym < 144, 8, np.where(sym < 256, 9, np.where(sym < 280, 7, 8)))
    code = np.where(
        sym < 144,
        0x30 + sym,
        np.where(sym < 256, 0x190 + sym - 144,
                 np.where(sym < 280, sym - 256, 0xC0 + sym - 280)),
    )
    rev = _rev_bits_np(code.astype(np.uint32), lens.astype(np.uint32))
    lit = ((rev << 4) | lens)[:NSYM]
    dsym = np.arange(NDIST).astype(np.uint32)
    drev = _rev_bits_np(dsym, np.full(NDIST, 5, np.uint32))
    dist = (drev << 4) | 5
    return np.concatenate([lit, dist]).astype(np.int32)


_T_STATIC_ALL = jnp.asarray(_static_packed_tables())   # [316]
_STATIC_LIT_LENS = _T_STATIC_ALL[:NSYM] & 15

# Fixed dynamic header layout: BFINAL=0 BTYPE=10, HLIT=29, HDIST=29,
# HCLEN=15; precode = values 0..15 all length 4 (complete: 16 * 2^-4 = 1;
# 16/17/18 unused, length 0).  Every length is emitted as rev4(len).
_PRECODE_PERM = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]
HDR_BITS = 17 + 19 * 3 + NSYM * 4 + NDIST * 4  # = 1338


def _header_consts():
    vals = [0b100, NSYM - 257, NDIST - 1, 15]
    bits = [3, 5, 5, 4]
    for p in _PRECODE_PERM:
        vals.append(0 if p >= 16 else 4)
        bits.append(3)
    lens_off = sum(bits)
    offs = np.concatenate([[0], np.cumsum(bits)[:-1]]).astype(np.int32)
    return np.array(vals, np.uint32), offs, lens_off


(_HDR_VALS, _HDR_OFFS, _LENS_OFF) = _header_consts()
_J_HDR_VALS = jnp.asarray(_HDR_VALS)
_J_HDR_OFFS = jnp.asarray(_HDR_OFFS)


# ---------------------------------------------------------------------------
# Device-side canonical Huffman (generic over alphabet size)
# ---------------------------------------------------------------------------
def _bsr_i32(x):
    return 31 - jax.lax.clz(jnp.maximum(x.astype(jnp.int32), 1))


def _build_code_lens(hist: jax.Array, nsym: int, refine_passes: int = 0,
                     max_len: int = MAX_CODE_LEN):
    """Kraft-exact length assignment, lens in [0..max_len].

    Returns (lens int32[nsym], ok bool); `ok` False means the completion
    passes could not spend the budget exactly and the caller must fall
    back to the static code (never observed in practice, but safe).
    Callers must guarantee >= 2 used symbols."""
    total = jnp.maximum(jnp.sum(hist), 1)
    used = hist > 0

    # ideal Kraft share rounded to the NEAREST power of two (f32 ratio:
    # hist * KRAFT overflows u32 at the 2^15 budget; the rounding is only
    # a seed — the fix loop below enforces the Kraft sum exactly)
    kraft = 1 << max_len
    share = (
        hist.astype(jnp.float32) * (float(kraft) / total.astype(jnp.float32))
    ).astype(jnp.uint32)
    e = _bsr_i32(jnp.maximum(share, 1))
    half = jnp.uint32(1) << jnp.maximum(e - 1, 0).astype(jnp.uint32)
    bump = share - (jnp.uint32(1) << e.astype(jnp.uint32)) > half
    e = e + bump.astype(jnp.int32)
    k_des = jnp.where(
        used,
        jnp.left_shift(jnp.int32(1), jnp.clip(e, 0, max_len - 1)),
        0,
    )

    # frequency-descending greedy spend, reserving 1 unit per later symbol
    order = jnp.argsort(-(hist * 512 + (nsym - jnp.arange(nsym))))
    k_sorted = k_des[order]
    used_sorted = used[order]
    remaining_after = (
        jnp.cumsum(used_sorted[::-1].astype(jnp.int32))[::-1]
        - used_sorted.astype(jnp.int32)
    )

    # scan-chunked 8 symbols per step: the spend is sequential, but each
    # lax.scan step costs ~7 us of fixed overhead on-chip — unrolling 8
    # updates per step cuts the 286-step litlen scan to 36 steps
    CH = 8
    npad = -(-nsym // CH) * CH
    pad = npad - nsym

    def padv(x, fill):
        return jnp.concatenate(
            [x, jnp.full(pad, fill, x.dtype)]).reshape(npad // CH, CH)

    def step(budget, xs):
        kd, u, rem = xs
        ks = []
        for j in range(CH):
            allow = jnp.maximum(budget - rem[j], 1)
            kj = jnp.where(
                u[j],
                jnp.left_shift(jnp.int32(1),
                               _bsr_i32(jnp.minimum(kd[j], allow))), 0)
            budget = budget - kj
            ks.append(kj)
        return budget, jnp.stack(ks)

    _, k_got = jax.lax.scan(
        step, jnp.int32(kraft),
        (padv(k_sorted, 0), padv(used_sorted, False),
         padv(remaining_after, 0)),
    )
    k = jnp.zeros(nsym, jnp.int32).at[order].set(
        k_got.reshape(npad)[:nsym])

    # spend the remainder exactly: double the largest k <= R, else halve
    # the smallest k > R to raise R; bounded passes, no-ops once R == 0
    def fix(state, _):
        k, r = state
        can_dbl = used & (k <= r) & (k < (kraft >> 1))
        any_dbl = jnp.any(can_dbl)
        dbl_pick = jnp.argmax(jnp.where(can_dbl, k, -1))
        can_hlv = used & (k > r) & (k >= 2)
        hlv_pick = jnp.argmin(jnp.where(can_hlv, k, 1 << 30))
        idx = jnp.where(any_dbl, dbl_pick, hlv_pick)
        onehot = jnp.arange(nsym) == idx
        delta = jnp.where(any_dbl, k[idx], -(k[idx] >> 1))
        live = r > 0
        k = jnp.where(live & onehot, k + delta, k)
        r = jnp.where(live, r - delta, r)
        return (k, r), None

    (k, r), _ = jax.lax.scan(
        fix, (k, jnp.int32(kraft) - jnp.sum(k)), None, length=48
    )
    lens = jnp.where(k > 0, max_len - _bsr_i32(jnp.maximum(k, 1)), 0)

    # budget-neutral refinement toward the optimal code: shortening the
    # most frequent symbol at level l while lengthening the least frequent
    # at level l-1 keeps the Kraft sum exact and saves hist[a]-hist[b] bits
    # per pass (closes ~0.5% residual vs package-merge)
    def refine(lens, _):
        def level_step(lens, l):
            at_l = used & (lens == l)
            at_lm1 = used & (lens == l - 1) & (l - 1 >= 1)
            ha = jnp.where(at_l, hist, -1)
            hb = jnp.where(at_lm1, hist, 1 << 30)
            a = jnp.argmax(ha)
            b = jnp.argmin(hb)
            good = (
                jnp.any(at_l) & jnp.any(at_lm1) & (hist[a] > hist[b]) & (l >= 2)
            )
            sym_i = jnp.arange(NSYM if lens.shape[0] == NSYM else lens.shape[0])
            lens = jnp.where(
                good & (sym_i == a), lens - 1,
                jnp.where(good & (sym_i == b), lens + 1, lens),
            )
            return lens, None
        lens, _ = jax.lax.scan(
            level_step, lens, jnp.arange(2, max_len + 1)
        )
        return lens, None

    if refine_passes:
        lens, _ = jax.lax.scan(refine, lens, None, length=refine_passes)
    n_used = jnp.sum(used.astype(jnp.int32))
    return lens.astype(jnp.int32), (r == 0) & (n_used >= 2)


def _build_code_lens_pair(hist_lit: jax.Array, hist_dist: jax.Array,
                          refine_passes: int = 0,
                          max_len: int = MAX_CODE_LEN):
    """Both alphabets through ONE vmapped build: the scans' sequential
    steps run once with the litlen and (zero-padded) distance lanes in
    parallel, halving the per-step overhead that dominates the build.
    Padding is inert (hist 0 -> unused -> k 0) and the spend order among
    used symbols matches the unpadded build, so lens are identical."""
    h = jnp.stack([hist_lit, jnp.pad(hist_dist, (0, NSYM - NDIST))])
    lens, ok = jax.vmap(
        lambda hh: _build_code_lens(hh, NSYM, refine_passes, max_len))(h)
    return lens[0], lens[1][:NDIST], ok[0], ok[1]


def _canonical_table(lens: jax.Array, nsym: int) -> jax.Array:
    """T[sym] = rev_code<<4 | len (packed), canonical per RFC 1951 §3.2.2."""
    sym = jnp.arange(nsym)
    l_iota = jnp.arange(MAX_CODE_LEN_DEEP + 1)
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
# One sort -> histograms + per-position translation
# ---------------------------------------------------------------------------
def _hist_matmul(sym: jax.Array, nclasses: int, rows: int = 1):
    """Exact symbol histogram as ONE one-hot MXU matmul: counts are
    0/1 bf16 products accumulated in f32 (exact below 2^24; n <= 1 MiB).
    ~1.7 ms per 4 MiB batch on-chip vs 8.6 ms for the former segment
    sort + searchsorted.  With ``rows`` > 1 returns per-row counts
    [rows, nclasses] over equal contiguous spans (global hist = sum)."""
    n = sym.shape[0]
    # exactness precondition: per-row counts accumulate in f32, so any
    # single count must stay below 2^24 — fail loudly, not inexactly
    assert n // rows <= 1 << 24, (n, rows)
    cpad = -(-nclasses // 128) * 128
    s3 = sym.reshape(rows, n // rows // 128, 128)
    oh = (s3[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, cpad), 3)).astype(jnp.bfloat16)
    ones = jnp.ones(s3.shape, jnp.bfloat16)
    h = jax.lax.dot_general(
        ones, oh, (((1, 2), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    h = h.astype(jnp.int32)[..., :nclasses]
    return h[0] if rows == 1 else h


def _tree_translate(sym: jax.Array, table: jax.Array, nsym: int,
                    vbits: int) -> jax.Array:
    """Gather-free ``table[sym]`` for a [nsym] i32 table of values
    < 2**vbits via a packed-word binary select tree (per-position gathers
    cost ~7.5 ns/elem on the chip; the tree is pure VPU selects).  Values
    pack 4-per-word (vbits <= 8) or 2-per-word (<= 16); wider values
    split into a 16-bit tree + a high-bits tree."""
    if vbits > 16:
        lo = _tree_translate(sym, table & jnp.int32(0xFFFF), nsym, 16)
        hi = _tree_translate(sym, (table >> 16).astype(jnp.int32), nsym,
                             vbits - 16)
        return lo | (hi << 16)
    fw = 8 if vbits <= 8 else 16
    per = 32 // fw
    nwords = -(-nsym // per)
    levels = max(1, (nwords - 1).bit_length())
    tpad = jnp.concatenate(
        [table[:nsym], jnp.zeros((1 << levels) * per - nsym, table.dtype)]
    ).astype(jnp.uint32).reshape(1 << levels, per)
    words = tpad[:, 0]
    for k in range(1, per):
        words = words | (tpad[:, k] << jnp.uint32(fw * k))
    idx = (sym // per).astype(jnp.int32)
    level = [jnp.broadcast_to(words[k], sym.shape)
             for k in range(1 << levels)]
    for bit in range(levels):
        b = ((idx >> bit) & 1) == 1
        level = [jnp.where(b, level[2 * k + 1], level[2 * k])
                 for k in range(len(level) // 2)]
    sh = ((sym % per).astype(jnp.uint32)) * jnp.uint32(fw)
    return ((level[0] >> sh)
            & jnp.uint32((1 << fw) - 1)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Main entry
# ---------------------------------------------------------------------------
def compress_chunk_dynamic(b: jax.Array, length: jax.Array, bfinal: jax.Array,
                           two_pass: bool = False, depth: int = 6,
                           hash3: bool = False, wide_ext: bool = False,
                           lcp: int = 16):
    """Compress one chunk into a byte-aligned raw-DEFLATE fragment using
    per-chunk dynamic litlen + distance codes (static block selected per
    chunk when cheaper).  ``two_pass`` doubles matchfinder window coverage
    for ~17% more compress time (the levels >= 6 mode).  Same output
    contract as compress_chunk_static."""
    n = b.shape[0]
    n_pad, _, _ = _segment_sizes(n, wide=not (two_pass or hash3))
    bp, pos, commit_match, commit_lit, eff, dist = _parse_chunk(
        b, length, lazy=True, two_pass=two_pass, depth=depth, hash3=hash3,
        wide_ext=wide_ext or two_pass or hash3,
        # single-pass tier: widen the matchfind segment instead of paying
        # for a rescue pass (measured: +0.17 ratio points for ~2% speed)
        wide_window=not (two_pass or hash3), lcp=lcp,
    )
    refine_passes = 16 if (two_pass or hash3) else 0  # quality tiers only
    return emit_dynamic_block(
        bp, bfinal, commit_match, commit_lit, eff, dist, n, n_pad,
        refine_passes=refine_passes,
    )


def emit_dynamic_block(bp, bfinal, commit_match, commit_lit, eff, dist,
                       n: int, n_pad: int, refine_passes: int = 0):
    """Entropy-code and pack one chunk's committed items into a
    byte-aligned DEFLATE fragment (dynamic or static block, whichever is
    cheaper) — the device deflate_flush_block
    (lib/deflate_compress.c:1706-2038).  Shared by the greedy/lazy parser
    above and the min-cost DP parser (tpu_optimal.py)."""
    (val, nb, offs), aux = _emit_dynamic_pre(
        bp, commit_match, commit_lit, eff, dist, n_pad, refine_passes
    )
    nwords = _dyn_nwords(n)
    capw = DYN_CAPW_DEEP if refine_passes else DYN_CAPW
    words = _group_pack(val, nb, offs, nwords, capw=capw)
    return _emit_dynamic_post(words, aux, bfinal)


def _p19_fixed():
    """Fixed complete precode: 4 bits for {0, 16, 17, 18} and the common
    code-length values, 5 for the rare ones (Kraft 13/16 + 6/32 = 1).
    Returns (lens[19], packed table rev<<4|len, lens in HCLEN perm order)."""
    lens = np.full(19, 5, np.int64)
    for s in (0, 16, 17, 18, 5, 6, 7, 8, 9, 10, 11, 12, 13):
        lens[s] = 4
    bl = np.bincount(lens, minlength=7)
    nxt = np.zeros(7, np.int64)
    for l in range(1, 6):
        nxt[l + 1] = (nxt[l] + bl[l]) << 1
    code = np.zeros(19, np.int64)
    cur = nxt.copy()
    for s in sorted(range(19), key=lambda s: (lens[s], s)):
        code[s] = cur[lens[s]]
        cur[lens[s]] += 1
    rev = _rev_bits_np(code.astype(np.uint32), lens.astype(np.uint32))
    tab = ((rev.astype(np.int32) << 4) | lens.astype(np.int32))
    return lens, tab, lens[np.array(_PRECODE_PERM)]


_P19_LENS, _P19_TAB, _P19_LENS_PERM = _p19_fixed()


def _precode_rle_items(all_lens: jax.Array, nhlit, nhdist):
    """RLE'd dynamic header (precode symbols 16/17/18) for the declared
    code lengths — the role of the reference's precode item computation
    (lib/deflate_compress.c:1482-1557), vectorized over the 316-length
    array: per-position run geometry (start/length via cumulative
    max/min), then a greedy chunking that each position classifies
    independently (138-zero chunks -> sym 18, 3-10 zeros -> 17, repeat
    chunks of 6 -> 16, remainders raw).  The 19-symbol precode is the
    fixed complete code (_p19_fixed).

    Returns (vals u32[339], bits i32[339], total i32) — the header as
    ordinary emission entries (prelude 4, precode lens 19, RLE items
    316), so it can ride the same premerge/pack stream as the body (the
    multi-block emitter) or be scattered into words (the single-block
    wrapper below)."""
    n = NSYM_ALL
    v = all_lens.astype(jnp.int32)
    i = jnp.arange(n, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), v[:-1]])
    start = v != prev
    run_start = jax.lax.cummax(jnp.where(start, i, 0))
    nxt = jnp.concatenate([v[1:], jnp.full(1, -2, jnp.int32)])
    endpos = v != nxt
    run_end = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(endpos, i, n - 1)))) + 1
    L = run_end - run_start
    k = i - run_start

    is0 = v == 0
    # zero runs: full 138-chunks then an 18/17/raw tail
    t0 = (L // 138) * 138
    r0 = L - t0
    z_full = (k % 138 == 0) & (k < t0)
    z18t = (k == t0) & (r0 >= 11)
    z17t = (k == t0) & (r0 >= 3) & (r0 < 11)
    z_raw = (k >= t0) & (r0 < 3)
    # nonzero runs: raw value first, then 6-repeat chunks, 16/raw tail
    rel = k - 1
    L1 = L - 1
    t0r = (L1 // 6) * 6
    rr = L1 - t0r
    nz_first = k == 0
    nz_full = (k >= 1) & (rel % 6 == 0) & (rel < t0r)
    nz16t = (k >= 1) & (rel == t0r) & (rr >= 3)
    nz_raw = (k >= 1) & (rel >= t0r) & (rr < 3)

    emit = jnp.where(is0, z_full | z18t | z17t | z_raw,
                     nz_first | nz_full | nz16t | nz_raw)
    sym = jnp.where(
        is0,
        jnp.where(z_full | z18t, 18, jnp.where(z17t, 17, 0)),
        jnp.where(nz_first | nz_raw, v, 16))
    extra = jnp.where(
        is0,
        jnp.where(z_full, 127,
                  jnp.where(z18t, r0 - 11, jnp.where(z17t, r0 - 3, 0))),
        jnp.where(nz_full, 3, jnp.where(nz16t, rr - 3, 0)))
    ebits = jnp.where(sym == 18, 7,
                      jnp.where(sym == 17, 3, jnp.where(sym == 16, 2, 0)))
    ebits = jnp.where(emit, ebits, 0)

    # Fixed complete precode (computed at import): a per-chunk optimal
    # 19-symbol Huffman build costs ~60 sequential scan steps (~0.5 ms per
    # batch, 1-2% of the speed tiers) and saves only ~10 bytes/chunk over
    # this static assignment — 4 bits for the RLE symbols and the common
    # length values, 5 for the rare ones (Kraft: 13/16 + 6/32 = 1).
    p_tab = jnp.asarray(_P19_TAB)
    nhclen = jnp.int32(19)

    # ---- assemble (vals, bits) -> 72 words ------------------------------
    entry = jnp.take(p_tab, jnp.clip(sym, 0, 18))
    clen = jnp.where(emit, entry & 15, 0).astype(jnp.int32)
    code = (entry >> 4).astype(jnp.uint32)
    item_vals = jnp.where(
        emit, code | (extra.astype(jnp.uint32)
                      << clen.astype(jnp.uint32)), 0)
    item_bits = clen + ebits

    f_vals = jnp.stack(
        [jnp.uint32(0b100), jnp.uint32(nhlit), jnp.uint32(nhdist),
         (nhclen - 4).astype(jnp.uint32)])
    f_bits = jnp.asarray(np.array([3, 5, 5, 4], np.int32))
    p_vals = jnp.asarray(_P19_LENS_PERM.astype(np.uint32))
    p_bits = jnp.full(19, 3, jnp.int32)

    vals = jnp.concatenate([f_vals, p_vals, item_vals])
    bits = jnp.concatenate([f_bits, p_bits, item_bits])
    return vals, bits, jnp.sum(bits).astype(jnp.int32)


def _precode_rle_header(all_lens: jax.Array, nhlit, nhdist):
    """Single-block wrapper: scatter the RLE header items into a
    72-word buffer (only the first 44 are used — callers pick this
    encoding only when it beats the fixed 1338-bit layout)."""
    vals, bits, total = _precode_rle_items(all_lens, nhlit, nhdist)
    offs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(bits)[:-1]])
    sb = (offs & 31).astype(jnp.uint32)
    w = offs >> 5
    words = jnp.zeros(72, jnp.uint32)
    words = words.at[w].add(vals << sb, mode="promise_in_bounds")
    words = words.at[w + 1].add(
        jnp.where(sb > 0, vals >> (jnp.uint32(32) - jnp.maximum(sb, 1)), 0),
        mode="promise_in_bounds")
    return words, total


def _fixed_hdr_items(all_lens: jax.Array):
    """The constant 1338-bit header layout as [339] emission entries:
    prelude+precode lens (23, matching _HDR_VALS) then 316 rev4(len)
    entries of 4 bits each."""
    len_codes = _rev16(all_lens.astype(jnp.uint32)) >> jnp.uint32(12)
    vals = jnp.concatenate([_J_HDR_VALS, len_codes])
    bits = jnp.concatenate(
        [jnp.asarray(np.array([3, 5, 5, 4] + [3] * 19, np.int32)),
         jnp.full(316, 4, jnp.int32)])
    return vals, bits


_STATIC_HDR_ITEM_VALS = np.zeros(339, np.uint32)
_STATIC_HDR_ITEM_VALS[0] = 0b010
_STATIC_HDR_ITEM_BITS = np.zeros(339, np.int32)
_STATIC_HDR_ITEM_BITS[0] = 3


def _emit_dynamic_pre_blocks(bp, commit_match, commit_lit, eff, dist,
                             n_pad: int, blocks: int,
                             refine_passes: int = 0):
    """Multi-block flush: the chunk is emitted as `blocks` DEFLATE blocks
    with PER-BLOCK dynamic code tables over a SHARED LZ window (the
    reference emits ~30 blocks per MiB and re-optimizes tables locally,
    lib/deflate_compress.c:2106-2218; per-chunk single tables were the
    r3 measured compromise — this recovers the table-adaptation half
    without giving up window reach, since DEFLATE blocks share history).

    Headers, bodies, and per-block EOBs all ride ONE entry stream
    (val, nb, offs) through the same premerge/pack machinery: a header
    is just 339 entries of <= 14 bits.  Matches never straddle block
    boundaries because the DP/commit segments (1024 positions) divide
    the block length.  Returns ((val, nb, offs), aux) with aux shaped
    for _emit_dynamic_post (hdr44 = 0, eob folded into the stream)."""
    nb_blk = n_pad // blocks
    # 1024 = the DP/commit segment: matches truncate at those boundaries,
    # so block edges on multiples of 1024 can never split an item pair
    assert n_pad % (blocks * 128) == 0 and nb_blk % 1024 == 0
    lslot, lbase, lextra = _length_slot(jnp.maximum(eff, 3))
    oslot, obase, oextra = _offset_slot(jnp.maximum(dist, 1))

    prev_match = jnp.concatenate([jnp.zeros(1, bool), commit_match[:-1]])
    oslot_b = jnp.concatenate([jnp.zeros(1, jnp.int32), oslot[:-1]])
    sym = jnp.where(
        commit_match,
        257 + lslot,
        jnp.where(
            prev_match,
            NSYM + oslot_b,
            jnp.where(commit_lit, bp.astype(jnp.int32), DONT_CARE),
        ),
    )

    # ---- per-block code tables ------------------------------------------
    hist_b = _hist_matmul(sym, NSYM_ALL, rows=blocks)        # [blocks, 316]
    hist_lit = hist_b[:, :NSYM]
    hist_lit = hist_lit.at[:, 256].add(1)                    # per-block EOB
    hist_lit = hist_lit.at[:, 0].add(
        jnp.where(hist_lit[:, 0] == 0, 1, 0))
    hist_dist = hist_b[:, NSYM:]
    hist_dist = hist_dist.at[:, 0].add(
        jnp.where(hist_dist[:, 0] == 0, 1, 0))
    hist_dist = hist_dist.at[:, 1].add(
        jnp.where(hist_dist[:, 1] == 0, 1, 0))

    max_len = MAX_CODE_LEN_DEEP if refine_passes else MAX_CODE_LEN
    # one vmapped build over 2*blocks lanes (lit + padded dist per block)
    h_all = jnp.concatenate(
        [hist_lit, jnp.pad(hist_dist, ((0, 0), (0, NSYM - NDIST)))])
    lens_all, ok_all = jax.vmap(
        lambda hh: _build_code_lens(hh, NSYM, refine_passes, max_len)
    )(h_all)
    lit_lens = lens_all[:blocks]                             # [blocks, 286]
    dist_lens = lens_all[blocks:, :NDIST]                    # [blocks, 30]
    ok_b = ok_all[:blocks] & ok_all[blocks:]

    t_lit = jax.vmap(lambda l: _canonical_table(l, NSYM))(lit_lens)
    t_dist = jax.vmap(lambda l: _canonical_table(l, NDIST))(dist_lens)
    all_lens_b = jnp.concatenate(
        [lit_lens, dist_lens], axis=1).astype(jnp.int32)     # [blocks, 316]

    rle_v, rle_b, rle_tot = jax.vmap(
        lambda al: _precode_rle_items(al, NSYM - 257, NDIST - 1)
    )(all_lens_b)
    fix_v, fix_b = jax.vmap(_fixed_hdr_items)(all_lens_b)
    use_rle = rle_tot < HDR_BITS
    hdr_dyn_bits = jnp.where(use_rle, rle_tot, HDR_BITS)

    dyn_cost = (jnp.sum(hist_lit * lit_lens, axis=1)
                + jnp.sum(hist_dist * dist_lens, axis=1) + hdr_dyn_bits)
    static_cost = (jnp.sum(hist_lit * _STATIC_LIT_LENS[None, :], axis=1)
                   + 5 * jnp.sum(hist_dist, axis=1) + 3)
    use_dyn = ok_b & (dyn_cost < static_cost)

    table_b = jnp.where(
        use_dyn[:, None],
        jnp.concatenate([t_lit, t_dist], axis=1),
        _T_STATIC_ALL[None, :],
    )

    # per-block header entries: static / fixed / RLE
    hv = jnp.where(use_rle[:, None], rle_v, fix_v)
    hb = jnp.where(use_rle[:, None], rle_b, fix_b)
    hv = jnp.where(use_dyn[:, None], hv,
                   jnp.asarray(_STATIC_HDR_ITEM_VALS)[None, :])
    hb = jnp.where(use_dyn[:, None], hb,
                   jnp.asarray(_STATIC_HDR_ITEM_BITS)[None, :])

    # ---- body columns (per-block tables) --------------------------------
    sym_b = sym.reshape(blocks, nb_blk)
    code_at = jax.vmap(
        lambda s, t: _tree_translate(s, t, NSYM_ALL, max_len + 4)
    )(sym_b, table_b).reshape(n_pad)

    clen = (code_at & 15).astype(jnp.int32)
    ccode = (code_at >> 4).astype(jnp.uint32)
    lx = jnp.where(commit_match, eff - lbase, 0).astype(jnp.uint32)
    val_a = ccode | (lx << clen.astype(jnp.uint32))
    nb_a = jnp.where(
        commit_match, clen + lextra, jnp.where(commit_lit, clen, 0)
    ).astype(jnp.int32)
    ox_b = jnp.concatenate(
        [jnp.zeros(1, jnp.uint32), (dist - obase).astype(jnp.uint32)[:-1]])
    oex_b = jnp.concatenate([jnp.zeros(1, jnp.int32), oextra[:-1]])
    val_b = ccode | (ox_b << clen.astype(jnp.uint32))
    nb_b = clen + oex_b
    body_val = jnp.where(prev_match, val_b,
                         jnp.where(commit_match | commit_lit, val_a, 0))
    body_nb = jnp.where(prev_match, nb_b, nb_a)

    # per-block EOB entries
    tbl_eob = table_b[:, 256]
    eob_code = (tbl_eob >> 4).astype(jnp.uint32)
    eob_len = (tbl_eob & 15).astype(jnp.int32)

    # ---- one entry stream: [hdr 339][body nb_blk][eob 1] per block ------
    ENT = 339 + nb_blk + 1
    vals = jnp.concatenate(
        [hv, body_val.reshape(blocks, nb_blk), eob_code[:, None]], axis=1)
    nbits = jnp.concatenate(
        [hb, body_nb.reshape(blocks, nb_blk), eob_len[:, None]], axis=1)
    vals = vals.reshape(blocks * ENT)
    nbits = nbits.reshape(blocks * ENT)
    pad = (-(blocks * ENT)) % 128
    if pad:
        vals = jnp.concatenate([vals, jnp.zeros(pad, vals.dtype)])
        nbits = jnp.concatenate([nbits, jnp.zeros(pad, nbits.dtype)])
    offs, total_bits = _exclusive_bit_offsets(nbits)

    aux = (jnp.zeros(44, jnp.uint32), jnp.uint32(0), jnp.int32(0),
           jnp.int32(0), total_bits)
    return (vals, nbits, offs), aux


def _dyn_nwords(n: int, blocks: int = 1) -> int:
    # the block-type choice guarantees emitted symbol bits <= the static
    # cost, which is bounded by 9 bits/position, so the buffer (and the
    # group placement's target) sizes to 9n rather than the 11n code cap;
    # each extra block adds at most one fixed-size header + EOB
    return (9 * n + (1 + blocks) * HDR_BITS + 256 + blocks * 16 + 31) // 32


def _emit_dynamic_pre(bp, commit_match, commit_lit, eff, dist,
                      n_pad: int, refine_passes: int = 0):
    """Stages of the flush that precede bit placement: symbol translation,
    code tables, emission columns, bit offsets, and the 44 header words.
    Returns ((val, nb, offs), aux) where aux carries everything
    `_emit_dynamic_post` needs to finalize packed words."""
    lslot, lbase, lextra = _length_slot(jnp.maximum(eff, 3))
    oslot, obase, oextra = _offset_slot(jnp.maximum(dist, 1))

    # combined alphabet: literal byte | 257+len_slot | 286+dist_slot (at the
    # match's second position, which is always inside the span)
    prev_match = jnp.concatenate([jnp.zeros(1, bool), commit_match[:-1]])
    oslot_b = jnp.concatenate([jnp.zeros(1, jnp.int32), oslot[:-1]])
    sym = jnp.where(
        commit_match,
        257 + lslot,
        jnp.where(
            prev_match,
            NSYM + oslot_b,
            jnp.where(commit_lit, bp.astype(jnp.int32), DONT_CARE),
        ),
    )

    # ---- dynamic code tables -------------------------------------------------
    hist = _hist_matmul(sym, NSYM_ALL)
    hist_lit = hist[:NSYM]
    hist_lit = hist_lit.at[256].add(1)                       # EOB
    hist_lit = hist_lit.at[0].add(jnp.where(hist_lit[0] == 0, 1, 0))
    hist_dist = hist[NSYM:]
    hist_dist = hist_dist.at[0].add(jnp.where(hist_dist[0] == 0, 1, 0))
    hist_dist = hist_dist.at[1].add(jnp.where(hist_dist[1] == 0, 1, 0))

    max_len = MAX_CODE_LEN_DEEP if refine_passes else MAX_CODE_LEN
    lit_lens, dist_lens, ok_l, ok_d = _build_code_lens_pair(
        hist_lit, hist_dist, refine_passes, max_len)
    t_lit = _canonical_table(lit_lens, NSYM)
    t_dist = _canonical_table(dist_lens, NDIST)

    # RLE'd precode header when it beats the fixed 4-bit layout (always at
    # real chunk sizes; the fixed path remains the fallback for pathological
    # length vectors) — role of lib/deflate_compress.c:1482-1557
    all_lens_i = jnp.concatenate([lit_lens, dist_lens]).astype(jnp.int32)
    rle_words, rle_bits = _precode_rle_header(
        all_lens_i, NSYM - 257, NDIST - 1)
    use_rle = rle_bits < HDR_BITS
    hdr_dyn_bits = jnp.where(use_rle, rle_bits, HDR_BITS)

    # block-type choice on symbol-level cost (extra bits are identical)
    dyn_cost = (
        jnp.sum(hist_lit * lit_lens) + jnp.sum(hist_dist * dist_lens)
        + hdr_dyn_bits
    )
    static_cost = (
        jnp.sum(hist_lit * _STATIC_LIT_LENS) + 5 * jnp.sum(hist_dist) + 3
    )
    use_dyn = ok_l & ok_d & (dyn_cost < static_cost)

    table = jnp.where(
        use_dyn, jnp.concatenate([t_lit, t_dist]), _T_STATIC_ALL
    )
    # packed (rev<<4 | len) entries are max_len+4 bits wide; DONT_CARE
    # positions (sym == 316) read the zero pad and emit nothing
    code_at = _tree_translate(sym, table, NSYM_ALL, max_len + 4)

    # ---- emission columns ------------------------------------------------------
    clen = (code_at & 15).astype(jnp.int32)
    ccode = (code_at >> 4).astype(jnp.uint32)

    # slot A (match start or literal): litlen code + length extra
    lx = jnp.where(commit_match, eff - lbase, 0).astype(jnp.uint32)
    val_a = ccode | (lx << clen.astype(jnp.uint32))
    nb_a = jnp.where(
        commit_match, clen + lextra, jnp.where(commit_lit, clen, 0)
    ).astype(jnp.int32)

    # slot B (position after a match start): dist code + offset extra;
    # code_at already holds the translated dist code at these positions
    ox_b = jnp.concatenate(
        [jnp.zeros(1, jnp.uint32), (dist - obase).astype(jnp.uint32)[:-1]]
    )
    oex_b = jnp.concatenate([jnp.zeros(1, jnp.int32), oextra[:-1]])
    val_b = ccode | (ox_b << clen.astype(jnp.uint32))
    nb_b = clen + oex_b

    val = jnp.where(prev_match, val_b, jnp.where(commit_match | commit_lit, val_a, 0))
    nb = jnp.where(prev_match, nb_b, nb_a)

    # ---- layout ----------------------------------------------------------
    hdr_bits_n = jnp.where(use_dyn, hdr_dyn_bits, 3)
    offs, body_bits = _exclusive_bit_offsets(nb)
    offs = offs + hdr_bits_n

    # header words: dynamic (RLE or constant layout) or static (3 bits)
    all_lens = all_lens_i.astype(jnp.uint32)
    len_codes = _rev16(all_lens) >> jnp.uint32(12)          # rev4(len)
    hvals = jnp.concatenate([_J_HDR_VALS, len_codes])
    hoffs = jnp.concatenate(
        [_J_HDR_OFFS, _LENS_OFF + 4 * jnp.arange(NSYM_ALL, dtype=jnp.int32)]
    )
    hsb = (hoffs & 31).astype(jnp.uint32)
    hw = hoffs >> 5
    hdr_words = jnp.zeros(44, jnp.uint32)
    hdr_words = hdr_words.at[hw].add(hvals << hsb, mode="promise_in_bounds")
    hdr_words = hdr_words.at[hw + 1].add(
        jnp.where(hsb > 0, hvals >> (jnp.uint32(32) - jnp.maximum(hsb, 1)), 0),
        mode="promise_in_bounds",
    )
    hdr_words = jnp.where(use_rle, rle_words[:44], hdr_words)
    static_hdr = jnp.zeros(44, jnp.uint32).at[0].set(jnp.uint32(0b010))
    hdr44 = jnp.where(use_dyn, hdr_words, static_hdr)

    tbl_eob = table[256]
    eob_code = (tbl_eob >> 4).astype(jnp.uint32)
    eob_len = (tbl_eob & 15).astype(jnp.int32)
    aux = (hdr44, eob_code, eob_len, hdr_bits_n, body_bits)
    return (val, nb, offs), aux


def _emit_dynamic_post(words, aux, bfinal):
    """Finalize packed body words: add the header words and the EOB /
    byte-align / sync-flush tail."""
    hdr44, eob_code, eob_len, hdr_bits_n, body_bits = aux
    words = words.at[:44].add(hdr44)

    # ---- tail: EOB, byte-align, sync-flush stored marker -------------------------
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


def compress_chunk_dynamic2(b, length, bfinal):
    """Two-pass-window dynamic compressor (the levels 6-7 quality mode)."""
    return compress_chunk_dynamic(b, length, bfinal, two_pass=True)


def compress_chunk_dynamic3(b, length, bfinal):
    """Two-pass window + 12-deep probes + len-3 matches (levels >= 8)."""
    return compress_chunk_dynamic(
        b, length, bfinal, two_pass=True, depth=12, hash3=True
    )


@jax.jit
def compress_chunks_dynamic(bufs: jax.Array, lengths: jax.Array, bfinal: jax.Array):
    """vmapped dynamic-code chunk compressor: uint8[B, N], int32[B], bool[B]
    -> (uint32[B, W], int32[B])."""
    return jax.vmap(compress_chunk_dynamic)(bufs, lengths, bfinal)


@jax.jit
def compress_chunks_dynamic2(bufs: jax.Array, lengths: jax.Array, bfinal: jax.Array):
    """vmapped two-pass dynamic chunk compressor (levels 6-7)."""
    return jax.vmap(compress_chunk_dynamic2)(bufs, lengths, bfinal)


@jax.jit
def compress_chunks_dynamic3(bufs: jax.Array, lengths: jax.Array, bfinal: jax.Array):
    """vmapped deep-probe dynamic chunk compressor (levels >= 8)."""
    return jax.vmap(compress_chunk_dynamic3)(bufs, lengths, bfinal)


# ---------------------------------------------------------------------------
# Pallas-pack variants: identical compute, but bit placement runs in the
# sequential RMW kernel (pallas_kernels.pack_groups_pallas) instead of the
# XLA group scatter.  The kernel is batched over chunks, so the premerge
# stays under vmap and the placement is hoisted out.
# ---------------------------------------------------------------------------
def _compress_chunks_dynamic_pallas(bufs, lengths, bfinal, *, two_pass: bool,
                                    depth: int, hash3: bool,
                                    lcp: int = 16,
                                    interpret: bool = False):
    from .pallas_kernels import pack_groups_pallas

    n = bufs.shape[1]

    def front(b, length, fin):
        n_pad, _, _ = _segment_sizes(n, wide=not (two_pass or hash3))
        bp, pos, commit_match, commit_lit, eff, dist = _parse_chunk(
            b, length, lazy=True, two_pass=two_pass, depth=depth,
            hash3=hash3, wide_ext=two_pass or hash3,
            wide_window=not (two_pass or hash3), lcp=lcp,
        )
        refine_passes = 16 if (two_pass or hash3) else 0
        (val, nb, offs), aux = _emit_dynamic_pre(
            bp, commit_match, commit_lit, eff, dist, n_pad, refine_passes
        )
        capw = DYN_CAPW_DEEP if refine_passes else DYN_CAPW
        sbuf, gw = _group_premerge(val, nb, offs, capw=capw)
        return sbuf, gw, aux

    sbuf, gw, aux = jax.vmap(front)(bufs, lengths, bfinal)
    words = pack_groups_pallas(sbuf, gw, _dyn_nwords(n), interpret=interpret)
    return jax.vmap(_emit_dynamic_post)(words, aux, bfinal)


@functools.partial(jax.jit, static_argnames=("interpret",))
def compress_chunks_dynamic_pallas(bufs, lengths, bfinal, interpret=False):
    """Single-pass tier with the Pallas bit-pack kernel."""
    return _compress_chunks_dynamic_pallas(
        bufs, lengths, bfinal, two_pass=False, depth=6, hash3=False,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def compress_chunks_dynamic2_pallas(bufs, lengths, bfinal, interpret=False):
    """Two-pass tier (levels 6-7) with the Pallas bit-pack kernel."""
    return _compress_chunks_dynamic_pallas(
        bufs, lengths, bfinal, two_pass=True, depth=6, hash3=False,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def compress_chunks_dynamic3_pallas(bufs, lengths, bfinal, interpret=False):
    """Deep-probe tier (levels >= 8) with the Pallas bit-pack kernel."""
    return _compress_chunks_dynamic_pallas(
        bufs, lengths, bfinal, two_pass=True, depth=12, hash3=True,
        interpret=interpret,
    )
