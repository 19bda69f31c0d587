"""TPU compress pipeline: fully-jitted, fixed-shape, chunk-parallel DEFLATE.

This is the TPU-native re-derivation of the level-1 path (ht_matchfinder +
greedy parse + block emit, lib/deflate_compress.c:2451-2523) as dense array
programs.  The v2 design is built from a measured cost model of the target
chip: elementwise VPU passes and small batched sorts are cheap; random
gathers (~10-40 ns/elem), scatters, big sorts, and `jnp.cumsum` are the
expensive primitives — so every stage below is formulated to avoid them.

1. **Hashing** — the reference's multiplicative hash over 4-byte windows
   (lib/matchfinder_common.h:168-172), one elementwise pass.
2. **Matchfinding: segment-local multi-operand sort.**  Positions are
   grouped into 32 KiB segments (the DEFLATE window size — no match may
   reach farther back anyway) and each segment is sorted by
   ``hash<<15 | local_pos`` with the position's own first 16 bytes carried
   as sort *payloads*.  After the sort, the nearest previous same-hash
   candidates are roll-1/roll-2 (deeper at high levels) neighbors whose
   bytes are their payloads — the LZ "hash table probe" and the first 16
   bytes of ``lz_extend`` collapse into shifted compares with ZERO
   gathers.  A second (payload) sort keyed on local position un-permutes.
   Batched 32K-segment sorts are ~10x cheaper than one global sort on TPU.
   Optional passes: a half-segment-shifted rescue pass (window coverage)
   and a 3-byte-hash pass (len-3 matches), per the level ladder.
3. **Long matches: stride-8 chain extension.**  If position i matched
   >= 8 bytes at distance d and position i+8 found the same d, the matches
   compose exactly; six log-doubling passes reach the full 258 length —
   pure shifts and selects.  This subsumes a dedicated RLE path (runs hash
   to the same bucket, so the sorted neighbor is the distance-1..8
   candidate) and exceeds the reference level-1 cap (nice_len=32) on runs.
4. **Greedy commit: independent 512-position segments.**  The inherently
   sequential "advance by match length" scan runs as a `lax.scan` FSM over
   512 steps, vectorized across all segments, with matches truncated at
   segment boundaries (<=0.5% ratio cost) and the reference's
   offset-weighted lazy lookahead folded in as an elementwise pre-pass.
   No cross-segment state, no associative scan, no gathers.
5. **Emission** — ONE fused (value, nbits) column per position (a match's
   litlen code + length extra + offset code + offset extra is <= 31 bits
   for the static code), all codewords computed arithmetically in-register
   (clz/shift formulas; zero table gathers).
6. **Bit packing** — exclusive prefix sum of bit lengths via exact-f32
   triangular matmuls on the MXU (jnp.cumsum is pathologically slow on
   TPU); positions pre-merge into 32-position group buffers with one-hot
   selects (disjoint-bit adds); one small scatter-add places whole groups.

Each chunk's output is a *byte-aligned* DEFLATE fragment (one non-final
static-Huffman block plus an empty stored block carrying BFINAL — a sync
flush), so chunk streams concatenate by pure byte append.

The host/API layer falls back to a stored block when the device stream
would exceed it, preserving the compress_bound contract
(lib/deflate_compress.c:4087-4135).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MULT = 0x1E35A7BD
HASH_ORDER = 15
MIN_MATCH = 4
SORT_SEG = 65536   # matchfinder segment (2x window: avg 24K history 1-pass)
POS_BITS = 16      # local-position field width in sort keys
# with 17-bit positions the junk bucket collapses onto the top real hash
# (15+17 = 32 bits exactly); safe: junk entries sort after all real
# positions and matches at them are killed by the cap-<4 clamp
JUNK_HASH = (1 << HASH_ORDER) - 1 if POS_BITS >= 17 else (1 << HASH_ORDER)
WINDOW = 32768     # DEFLATE max match offset
FSM_SEG = 512      # greedy-commit segment (parse truncation boundary)
MAX_LEN = 258


def _seg_key_params(seg: int) -> tuple[int, int]:
    """(pos_bits, junk_hash) for a matchfind segment size.  17-bit local
    positions collapse the junk bucket onto the top real hash value (15+17
    fills the u32 key exactly); junk entries still sort after all real
    positions and matches at them die on the cap-<4 clamp."""
    pos_bits = max(POS_BITS, (seg - 1).bit_length())
    junk = (1 << HASH_ORDER) - 1 if pos_bits >= 17 else (1 << HASH_ORDER)
    return pos_bits, junk


# --------------------------------------------------------------------------
# Arithmetic codeword helpers (no table gathers)
# --------------------------------------------------------------------------
def _rev16(x: jax.Array) -> jax.Array:
    """Bit-reverse the low 16 bits (butterfly network, 12 VPU ops)."""
    x = x.astype(jnp.uint32)
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return x


def _rev(x: jax.Array, nbits: jax.Array) -> jax.Array:
    """Bit-reverse x within nbits (emit-ready LSB-first codeword)."""
    return _rev16(x) >> (jnp.uint32(16) - nbits.astype(jnp.uint32))


def _bsr(x: jax.Array) -> jax.Array:
    """floor(log2(x)) for x >= 1 (int32)."""
    return 31 - jax.lax.clz(jnp.maximum(x.astype(jnp.int32), 1))


def _static_litlen_code(sym: jax.Array):
    """(codeword, nbits) of the static litlen code, arithmetically.

    RFC 1951 §3.2.6: 0-143 -> 8 bits from 0x30; 144-255 -> 9 bits from
    0x190; 256-279 -> 7 bits from 0; 280-287 -> 8 bits from 0xC0.
    """
    sym = sym.astype(jnp.int32)
    c0 = 0x30 + sym
    c1 = 0x190 + (sym - 144)
    c2 = sym - 256
    c3 = 0xC0 + (sym - 280)
    val = jnp.where(
        sym < 144, c0, jnp.where(sym < 256, c1, jnp.where(sym < 280, c2, c3))
    )
    bits = jnp.where(
        sym < 144, 8, jnp.where(sym < 256, 9, jnp.where(sym < 280, 7, 8))
    ).astype(jnp.int32)
    return _rev(val, bits), bits


def _length_slot(mlen: jax.Array):
    """(slot, base, extra_bits) for match length 3..258, arithmetically.

    Small lengths map directly; bands above 10 hold 4 slots of 2^(k-2) each
    (cf. the generated table at lib/deflate_compress.c:269-285).
    """
    l1 = (mlen - 3).astype(jnp.int32)
    k = _bsr(jnp.maximum(l1, 1))
    band_slot = 4 * k - 4 + ((l1 >> jnp.maximum(k - 2, 0)) & 3)
    slot = jnp.where(mlen <= 10, l1, jnp.where(mlen >= 258, 28, band_slot))
    extra = jnp.where(slot < 8, 0, jnp.where(slot >= 28, 0, (slot >> 2) - 1))
    base = jnp.where(
        slot < 8,
        slot + 3,
        jnp.where(slot >= 28, 258, 3 + ((4 + (slot & 3)) << jnp.maximum((slot >> 2) - 1, 0))),
    )
    return slot, base, extra


def _offset_slot(off: jax.Array):
    """(slot, base, extra_bits) for offset 1..32768, arithmetically
    (the log-trick from lib/deflate_compress.c:291-308, table-free)."""
    o1 = (off - 1).astype(jnp.int32)
    k = _bsr(jnp.maximum(o1, 1))
    half = (o1 >> jnp.maximum(k - 1, 0)) & 1
    slot = jnp.where(off <= 4, off - 1, 2 * k + half)
    extra = jnp.where(slot < 4, 0, (slot >> 1) - 1)
    base = jnp.where(
        slot < 4, slot + 1, 1 + ((2 + (slot & 1)) << jnp.maximum((slot >> 1) - 1, 0))
    )
    return slot, base, extra


# --------------------------------------------------------------------------
# Pipeline stages
# --------------------------------------------------------------------------
def _le32_words(b: jax.Array, extra_pad: int = 4) -> jax.Array:
    """uint32 little-endian word starting at every byte position."""
    n = b.shape[0]
    bp = jnp.pad(b, (0, extra_pad)).astype(jnp.uint32)
    return (
        bp[:n]
        | (bp[1 : n + 1] << jnp.uint32(8))
        | (bp[2 : n + 2] << jnp.uint32(16))
        | (bp[3 : n + 3] << jnp.uint32(24))
    )


def _segment_sizes(n: int, wide: bool = False) -> tuple[int, int, int]:
    """(padded_n, sort_seg, fsm_seg) for a chunk of n positions.  ``wide``
    doubles the matchfind segment to 128 KiB (17-bit local positions, junk
    bucket collapsed onto the top hash) — the single-pass tier's history
    extension; the two-pass tiers get history from the rescue pass
    instead."""
    seg = 2 * SORT_SEG if wide else SORT_SEG
    if n >= seg:
        np_ = -(-n // seg) * seg
        return np_, seg, FSM_SEG
    if n >= FSM_SEG:
        np_ = -(-n // FSM_SEG) * FSM_SEG
        return np_, np_, FSM_SEG
    np_ = -(-n // _GROUP) * _GROUP
    return np_, np_, np_


def _sorted_matchfind(h: jax.Array, w: jax.Array, w4: jax.Array,
                      w8: jax.Array | None, w12: jax.Array | None, seg: int,
                      depth: int = 2, wide_ext: bool = False,
                      return_pair: bool = False,
                      return_triple: bool = False, wide=None):
    """Nearest (and second-nearest) previous same-hash candidates per
    position via ONE batched segment sort carrying the position's own 16
    bytes as payloads; the LCP is byte-exact up to 19: word-granular
    compares plus the trailing-equal-byte count of the first unequal
    word's XOR.  A second payload sort keyed on local position
    un-permutes.  Plays the role of the 2-entry-bucket probe + lz_extend
    of ht_matchfinder (lib/ht_matchfinder.h:77-195).  Returns (mlen,
    dist) with chain extension applied."""
    n = h.shape[0]
    m = n // seg
    pos_bits, junk = _seg_key_params(seg)
    lp = jax.lax.broadcasted_iota(jnp.uint32, (m, seg), 1)
    key = (h.reshape(m, seg).astype(jnp.uint32) << jnp.uint32(pos_bits)) | lp
    deep = w8 is not None and w12 is not None
    ops = (key, w.reshape(m, seg), w4.reshape(m, seg))
    if deep:
        ops = ops + (w8.reshape(m, seg), w12.reshape(m, seg))
        if wide is not None:
            ops = ops + tuple(x.reshape(m, seg) for x in wide)
    sorted_ops = jax.lax.sort(ops, num_keys=1, dimension=1)
    sk, sw, sw4 = sorted_ops[:3]
    sw8, sw12 = (sorted_ops[3], sorted_ops[4]) if deep else (None, None)
    swide = sorted_ops[5:] if deep else ()
    shash = sk >> jnp.uint32(pos_bits)
    slp = sk & jnp.uint32((1 << pos_bits) - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, seg), 1)
    # NOTE (round-4 A/B): a fused Pallas probe/selection kernel was built
    # and measured — 1 ms isolated vs 8.7 ms for these probes as an
    # isolated XLA stage — but the full parse got SLOWER (18.5 -> 21 ms
    # per 4 MiB batch): XLA fuses the probe chain into the sort/un-permute
    # pipeline, and the pallas_call's HBM materialization barrier (5 in +
    # 2 out arrays) costs more than the fusion it replaces.  Kept XLA.

    def tz_bytes(x):
        return jnp.where(
            (x & jnp.uint32(0xFF)) != 0,
            jnp.uint32(0),
            jnp.where(
                (x & jnp.uint32(0xFFFF)) != 0,
                jnp.uint32(1),
                jnp.where((x & jnp.uint32(0xFFFFFF)) != 0, jnp.uint32(2), jnp.uint32(3)),
            ),
        )

    def probe(d):
        same = (
            (shash == jnp.roll(shash, d, axis=1))
            & (shash != jnp.uint32(junk))
            & (col >= d)
        )
        # segments are 2-4x the window, so candidates must be range-checked
        dist = jnp.where(same, slp - jnp.roll(slp, d, axis=1), jnp.uint32(WINDOW + 1))
        same = same & (dist <= WINDOW)
        x0 = sw ^ jnp.roll(sw, d, axis=1)
        x1 = sw4 ^ jnp.roll(sw4, d, axis=1)
        eq4 = same & (x0 == 0)
        eq8 = eq4 & (x1 == 0)
        mlen = eq4.astype(jnp.uint32) * 4 + eq8.astype(jnp.uint32) * 4
        if deep:
            x2 = sw8 ^ jnp.roll(sw8, d, axis=1)
            x3 = sw12 ^ jnp.roll(sw12, d, axis=1)
            eq12 = eq8 & (x2 == 0)
            eq16 = eq12 & (x3 == 0)
            mlen = mlen + eq12.astype(jnp.uint32) * 4 + eq16.astype(jnp.uint32) * 4
            xs_tail = [x1, x2, x3]
            chain = [eq8, eq12, eq16]
            e = eq16
            for swk in swide:
                xk = swk ^ jnp.roll(swk, d, axis=1)
                eqk = e & (xk == 0)
                mlen = mlen + eqk.astype(jnp.uint32) * 4
                xs_tail.append(xk)
                chain.append(eqk)
                e = eqk
            # byte remainder from the first unequal word (0 at full LCP)
            x_sel = xs_tail[-1]
            for k in range(len(xs_tail) - 2, -1, -1):
                x_sel = jnp.where(~chain[k], xs_tail[k], x_sel)
        else:
            x_sel = jnp.where(~eq8, x1, 0)
        fine = jnp.where((x_sel != 0) & eq4, tz_bytes(x_sel), jnp.uint32(0))
        dist = jnp.where(eq4, dist, jnp.uint32(0))
        return mlen, dist, fine

    # Packed-compare selection: pay = mlen<<18 | fine<<16 | (W+1 - dist)
    # orders (mlen, fine, -dist) lexicographically, so ONE u32 maximum per
    # probe implements the better-candidate rule with min-distance tie
    # breaking (ties at equal length prefer the cheaper offset — weakly
    # better than keeping the incumbent).  dist==0 (no match) packs to
    # W+1, below every valid pay because its mlen field is 0.
    INVD = jnp.uint32(WINDOW + 1)

    def pack_inv(m2, d2, f2):
        return (m2 << jnp.uint32(18)) | (f2 << jnp.uint32(16)) | (INVD - d2)

    def unpack_inv(p):
        return (
            p >> jnp.uint32(18),
            (INVD - (p & jnp.uint32(0xFFFF)))
            & jnp.uint32(0xFFFF),
            (p >> jnp.uint32(16)) & jnp.uint32(3),
        )

    mlen, dist, fine = probe(1)
    if not (wide_ext or return_pair or return_triple):
        pay = pack_inv(mlen, dist, fine)
        for d in range(2, depth + 1):
            pay = jnp.maximum(pay, pack_inv(*probe(d)))
        mlen, dist, fine = unpack_inv(pay)
        payload = (mlen << jnp.uint32(18)) | (fine << jnp.uint32(16)) | dist
        _, pay = jax.lax.sort((slp, payload), num_keys=1, dimension=1)
        pay = pay.reshape(n)
        mlen16 = (pay >> jnp.uint32(18)).astype(jnp.int32)
        fine16 = ((pay >> jnp.uint32(16)) & jnp.uint32(3)).astype(jnp.int32)
        dist16 = (pay & jnp.uint32(0xFFFF)).astype(jnp.int32)
        return _chain_extend(mlen16, dist16, fine16)

    # Deep tier: LCP-capped candidates tie at 16, and choosing the wrong one
    # truncates the chain extension (a capped-16 candidate may continue for
    # 200 bytes while another stops at 18 — the compare can't tell).  Keep
    # the best AND the best-with-a-different-distance (exactly the best
    # runner-up, computed from the packed probes), extend both chains in
    # position space, and commit whichever extends farther.
    # candidate C: the nearest same-hash occurrence (probe distance 1 in
    # sorted order IS the closest previous position) — the DP wants the
    # minimum-distance option per rung, which A/B (longest two) may miss
    mlenC, distC, fineC = mlen, dist, fine
    pays = [pack_inv(mlen, dist, fine)]
    for d in range(2, depth + 1):
        pays.append(pack_inv(*probe(d)))
    payA = pays[0]
    for p in pays[1:]:
        payA = jnp.maximum(payA, p)
    invA = payA & jnp.uint32(0xFFFF)
    payB = jnp.zeros_like(payA)
    for p in pays:
        payB = jnp.maximum(
            payB, jnp.where((p & jnp.uint32(0xFFFF)) != invA, p, 0))
    mlen, dist, fine = unpack_inv(payA)
    mlen2, dist2, fine2 = unpack_inv(payB)
    nz2 = payB != 0
    mlen2 = jnp.where(nz2, mlen2, 0)
    dist2 = jnp.where(nz2, dist2, 0)
    fine2 = jnp.where(nz2, fine2, 0)

    pay_a = (mlen << jnp.uint32(18)) | (fine << jnp.uint32(16)) | dist
    pay_b = (mlen2 << jnp.uint32(18)) | (fine2 << jnp.uint32(16)) | dist2
    if return_triple:
        def unpack(x, mm=jnp.uint32(0xFFFFFFFF)):
            x = x.reshape(n)
            return (
                ((x >> jnp.uint32(18)) & mm).astype(jnp.int32),
                (x & jnp.uint32(0xFFFF)).astype(jnp.int32),
                ((x >> jnp.uint32(16)) & jnp.uint32(3)).astype(jnp.int32),
            )
        if wide is None:
            # Lean path: mlen <= 16 uses payload bits 18..22, so bits
            # 23..31 of BOTH payloads are free — 18 bits, enough for
            # candidate C compressed to (len/4 capped at 3, dist).  One
            # less operand on the un-permute sort (~2 ms/4 MiB); C is the
            # DP's min-distance SHORT option, so the len cap (12) and the
            # dropped fine remainder are near-free (ratio-checked).
            lc2 = jnp.clip(mlenC >> jnp.uint32(2), 0, 3).astype(jnp.uint32)
            cbits = (lc2 << jnp.uint32(16)) | distC
            pa_packed = pay_a | ((cbits & jnp.uint32(0x1FF)) << jnp.uint32(23))
            pb_packed = pay_b | ((cbits >> jnp.uint32(9)) << jnp.uint32(23))
            _, pa, pb = jax.lax.sort(
                (slp, pa_packed, pb_packed), num_keys=1, dimension=1
            )
            cb = (((pa.reshape(n) >> jnp.uint32(23)) & jnp.uint32(0x1FF))
                  | (((pb.reshape(n) >> jnp.uint32(23)) & jnp.uint32(0x1FF))
                     << jnp.uint32(9)))
            triC = (
                ((cb >> jnp.uint32(16)) << jnp.uint32(2)).astype(jnp.int32),
                (cb & jnp.uint32(0xFFFF)).astype(jnp.int32),
                jnp.zeros(n, jnp.int32),
            )
            m5 = jnp.uint32(0x1F)
            return unpack(pa, m5), unpack(pb, m5), triC
        pay_c = (mlenC << jnp.uint32(18)) | (fineC << jnp.uint32(16)) | distC
        _, pa, pb, pc = jax.lax.sort(
            (slp, pay_a, pay_b, pay_c), num_keys=1, dimension=1
        )
        # raw (word-granular) triples: the caller extends jointly with any
        # other candidate pools (content pass) via _chain_extend_multi
        return unpack(pa), unpack(pb), unpack(pc)
    _, pa, pb = jax.lax.sort((slp, pay_a, pay_b), num_keys=1, dimension=1)
    pa = pa.reshape(n)
    pb = pb.reshape(n)
    return _chain_extend2(
        (pa >> jnp.uint32(18)).astype(jnp.int32),
        (pa & jnp.uint32(0xFFFF)).astype(jnp.int32),
        ((pa >> jnp.uint32(16)) & jnp.uint32(3)).astype(jnp.int32),
        (pb >> jnp.uint32(18)).astype(jnp.int32),
        (pb & jnp.uint32(0xFFFF)).astype(jnp.int32),
        ((pb >> jnp.uint32(16)) & jnp.uint32(3)).astype(jnp.int32),
        return_pair=return_pair,
    )


def _row_cummax(x: jax.Array) -> jax.Array:
    """Running maximum along axis 1 via log-shift passes (no cumsum —
    jnp.cumsum costs ~52 ms/1M on this chip, PERF_NOTES.md)."""
    seg = x.shape[1]
    s = 1
    while s < seg:
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], s), x.dtype), x[:, :-s]], axis=1)
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _content_sorted_matchfind(h: jax.Array, w: jax.Array, w4: jax.Array,
                              w8: jax.Array, w12: jax.Array, seg: int,
                              depth: int = 6, wide=None,
                              doublings: int = 0,
                              round_probes: bool = False):
    """Suffix-array-flavored candidate pass: sort segment positions by
    (hash, next-17-content-bits, position) so LEXICOGRAPHIC neighbors —
    the suffixes sharing the longest prefixes — sit adjacent, then probe
    +-depth neighbors in BOTH directions with window filtering.  This is
    the role of the bt matchfinder's lexicographically-sorted trees
    (lib/bt_matchfinder.h:88-101): the longest match in the window is
    always reachable via a content neighbor, where position-ordered
    probes need the full bucket depth to find it.  Returns the best and
    best-with-a-different-distance (len, dist, fine) packed pairs per
    position (pre-extension word-granular lengths)."""
    n = h.shape[0]
    m = n // seg
    pos_bits, junk = _seg_key_params(seg)
    lp = jax.lax.broadcasted_iota(jnp.uint32, (m, seg), 1)
    # 17 content bits beyond the hashed prefix: bytes 4, 5 and the top
    # bit of byte 6 (w4 is little-endian: byte 4 is its low byte)
    b4 = w4.reshape(m, seg) & jnp.uint32(0xFF)
    b5 = (w4.reshape(m, seg) >> jnp.uint32(8)) & jnp.uint32(0xFF)
    b6t = (w4.reshape(m, seg) >> jnp.uint32(23)) & jnp.uint32(1)
    k1 = (
        (h.reshape(m, seg).astype(jnp.uint32) << jnp.uint32(17))
        | (b4 << jnp.uint32(9)) | (b5 << jnp.uint32(1)) | b6t
    )
    # second ordering word: bytes 6..9 byte-reversed so lexicographic
    # order matches byte order (w4/w8 are little-endian words) — without
    # it, heavy 6-byte-prefix repeats (records) tie back to position
    # order and the content-neighbor property evaporates
    w6 = (w4.reshape(m, seg) >> jnp.uint32(16)) | (
        w8.reshape(m, seg) << jnp.uint32(16))
    k2 = (
        ((w6 & jnp.uint32(0xFF)) << jnp.uint32(24))
        | ((w6 & jnp.uint32(0xFF00)) << jnp.uint32(8))
        | ((w6 >> jnp.uint32(8)) & jnp.uint32(0xFF00))
        | (w6 >> jnp.uint32(24))
    )
    # Suffix-rank doubling (the bt matchfinder's accumulated search state,
    # lib/bt_matchfinder.h:140-262, re-derived for sorts): each round
    # sorts by (rank, rank at +h) and re-ranks, doubling the prefix
    # length that defines neighbor order — ranks after round r group
    # 10 * 2^r byte prefixes, so the +-depth probes sample candidates
    # that truly share long prefixes (the records-class gap driver).
    ka, kb = k1, k2
    is_junk = (h.reshape(m, seg) == jnp.uint32(junk))
    # the junk flag rides bit 17 of the position payload (rank keys no
    # longer carry the hash, so the probes can't derive it from the key)
    lpj = lp | (is_junk.astype(jnp.uint32) << jnp.uint32(17))
    h_cov = 10
    round_pools = []      # per-round (pay_a, pay_b) in POSITION order
    for _ in range(doublings):
        ops_r = (ka, kb, lpj)
        if round_probes:
            # carry the content payloads through the round sort so THIS
            # granularity's neighbor order can be probed too — the bt
            # traversal visits candidates at every LCP level, and
            # final-granularity-only probing loses the mid-level ones
            # (the r4 sweep's measured ~0-effect of doublings)
            ops_r = ops_r + (w.reshape(m, seg), w4.reshape(m, seg),
                             w8.reshape(m, seg), w12.reshape(m, seg))
        s_r = jax.lax.sort(ops_r, num_keys=3, dimension=1)
        ska, skb, slpj0 = s_r[:3]
        slp0 = slpj0 & jnp.uint32(0x1FFFF)
        colu = jax.lax.broadcasted_iota(jnp.uint32, (m, seg), 1)

        def sh1(x):
            return jnp.concatenate(
                [jnp.zeros((m, 1), x.dtype), x[:, :-1]], axis=1)
        newg = (ska != sh1(ska)) | (skb != sh1(skb)) | (colu == 0)
        rank_sorted = _row_cummax(jnp.where(newg, colu, 0))
        if round_probes:
            rpa, rpb = _pool_probe(
                (slpj0 >> jnp.uint32(17)) & jnp.uint32(1), slp0,
                s_r[3], s_r[4], s_r[5], s_r[6], (), depth, m, seg)
            _, rank, pa_p, pb_p = jax.lax.sort(
                (slp0, rank_sorted, rpa, rpb), num_keys=1, dimension=1)
            round_pools.append((pa_p, pb_p))
        else:
            _, rank = jax.lax.sort(
                (slp0, rank_sorted), num_keys=1, dimension=1)
        rh = jnp.concatenate(
            [rank[:, h_cov:],
             jnp.full((m, h_cov), 1 << 17, jnp.uint32)], axis=1)
        ka, kb = rank, rh
        h_cov *= 2
    if doublings:
        # junk (tail/invalid) positions must stay sorted last: force their
        # rank keys to the max so the probes' junk mask lines up
        ka = jnp.where(is_junk, jnp.uint32(0x7FFFFFFF), ka)

    ops = (ka, kb, lpj, w.reshape(m, seg), w4.reshape(m, seg),
           w8.reshape(m, seg), w12.reshape(m, seg))
    if wide is not None:
        ops = ops + tuple(x.reshape(m, seg) for x in wide)
    sorted_ops = jax.lax.sort(ops, num_keys=3, dimension=1)
    _, _, slpj, sw, sw4, sw8, sw12 = sorted_ops[:7]
    swide = sorted_ops[7:]
    sjunk = (slpj >> jnp.uint32(17)) & jnp.uint32(1)
    slp = slpj & jnp.uint32(0x1FFFF)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, seg), 1)

    pay_a, pay_b = _pool_probe(sjunk, slp, sw, sw4, sw8, sw12, swide,
                               depth, m, seg)
    _, pa, pb = jax.lax.sort((slp, pay_a, pay_b), num_keys=1, dimension=1)
    # merge the per-round granularity pools (position order) into the
    # final pool: same best/runner-up-distinct-dist rule on packed pays
    for rpa, rpb in round_pools:
        for q in (rpa, rpb):
            better = _pay_better(q, pa)
            disp = jnp.where(better, pa, q)          # displaced candidate
            keep_b = ((disp & jnp.uint32(0xFFFF))
                      != (jnp.where(better, q, pa) & jnp.uint32(0xFFFF)))
            nb = jnp.where(keep_b & _pay_better(disp, pb), disp, pb)
            pa = jnp.where(better, q, pa)
            pb = nb
    pa = pa.reshape(n)
    pb = pb.reshape(n)

    def unpack(x):
        return (
            (x >> jnp.uint32(18)).astype(jnp.int32),
            (x & jnp.uint32(0xFFFF)).astype(jnp.int32),
            ((x >> jnp.uint32(16)) & jnp.uint32(3)).astype(jnp.int32),
        )

    return unpack(pa) + unpack(pb)


def _pay_better(x, y):
    """Is packed candidate x better than y?  pay = mlen<<18 | fine<<16 |
    dist: longer wins, then longer fine, then smaller nonzero dist."""
    mx, my = x >> jnp.uint32(16), y >> jnp.uint32(16)   # mlen|fine
    dx, dy = x & jnp.uint32(0xFFFF), y & jnp.uint32(0xFFFF)
    return (mx > my) | ((mx == my) & (dx < dy) & (dx > 0))


def _pool_probe(sjunk, slp, sw, sw4, sw8, sw12, swide, depth, m, seg):
    """±depth neighbor probes over ONE sorted order; returns the packed
    (best, best-with-distinct-distance) candidate pair per sorted slot."""
    col = jax.lax.broadcasted_iota(jnp.int32, (m, seg), 1)

    def tz_bytes(x):
        return jnp.where(
            (x & jnp.uint32(0xFF)) != 0,
            jnp.uint32(0),
            jnp.where(
                (x & jnp.uint32(0xFFFF)) != 0,
                jnp.uint32(1),
                jnp.where((x & jnp.uint32(0xFFFFFF)) != 0, jnp.uint32(2),
                          jnp.uint32(3)),
            ),
        )

    def probe(d):
        # no hash-equality gate needed: eq4 requires the first 4 bytes
        # equal outright (x0 == 0), which implies same hash; only junk
        # positions (tail/invalid) must be masked on both ends
        same = (
            (sjunk == 0) & (jnp.roll(sjunk, d, axis=1) == 0)
            & (col >= d if d > 0 else col < seg + d)
        )
        dist_i = slp.astype(jnp.int32) - jnp.roll(slp, d, axis=1).astype(
            jnp.int32)
        ok = same & (dist_i >= 1) & (dist_i <= WINDOW)
        x0 = sw ^ jnp.roll(sw, d, axis=1)
        x1 = sw4 ^ jnp.roll(sw4, d, axis=1)
        eq4 = ok & (x0 == 0)
        eq8 = eq4 & (x1 == 0)
        mlen = eq4.astype(jnp.uint32) * 4 + eq8.astype(jnp.uint32) * 4
        x2 = sw8 ^ jnp.roll(sw8, d, axis=1)
        x3 = sw12 ^ jnp.roll(sw12, d, axis=1)
        eq12 = eq8 & (x2 == 0)
        eq16 = eq12 & (x3 == 0)
        mlen = mlen + eq12.astype(jnp.uint32) * 4 + eq16.astype(jnp.uint32) * 4
        xs_tail = [x1, x2, x3]
        chain = [eq8, eq12, eq16]
        e = eq16
        for swk in swide:
            xk = swk ^ jnp.roll(swk, d, axis=1)
            eqk = e & (xk == 0)
            mlen = mlen + eqk.astype(jnp.uint32) * 4
            xs_tail.append(xk)
            chain.append(eqk)
            e = eqk
        # fine = trailing equal bytes of the first unequal word
        x_sel = xs_tail[-1]
        for k in range(len(xs_tail) - 2, -1, -1):
            x_sel = jnp.where(~chain[k], xs_tail[k], x_sel)
        fine = jnp.where((x_sel != 0) & eq4, tz_bytes(x_sel), jnp.uint32(0))
        dist = jnp.where(eq4, dist_i.astype(jnp.uint32), jnp.uint32(0))
        return mlen, dist, fine

    z = jnp.zeros((m, seg), jnp.uint32)
    mlen, dist, fine = z, z, z
    mlen2, dist2, fine2 = z, z, z
    for d in list(range(1, depth + 1)) + [-dd for dd in range(1, depth + 1)]:
        m2, d2, f2 = probe(d)
        better = (m2 > mlen) | ((m2 == mlen) & (f2 > fine)) \
            | ((m2 == mlen) & (f2 == fine) & (d2 < dist) & (d2 > 0))
        cm = jnp.where(better, mlen, m2)
        cd = jnp.where(better, dist, d2)
        cf = jnp.where(better, fine, f2)
        nbd = jnp.where(better, d2, dist)
        upd2 = (cd != nbd) & (cd != 0) & (
            (cm > mlen2) | ((cm == mlen2) & (cf > fine2))
        )
        mlen2 = jnp.where(upd2, cm, mlen2)
        dist2 = jnp.where(upd2, cd, dist2)
        fine2 = jnp.where(upd2, cf, fine2)
        mlen = jnp.where(better, m2, mlen)
        dist = jnp.where(better, d2, dist)
        fine = jnp.where(better, f2, fine)

    pay_a = (mlen << jnp.uint32(18)) | (fine << jnp.uint32(16)) | dist
    pay_b = (mlen2 << jnp.uint32(18)) | (fine2 << jnp.uint32(16)) | dist2
    return pay_a, pay_b


def _chain_extend(mlen: jax.Array, dist: jax.Array, fine: jax.Array):
    """Extend word-granular matches to MAX_LEN by stride-8 log-doubling:
    if lcp(i, i-d) >= 8 and position i+8's candidate has the SAME d, then
    lcp(i, i-d) = 8 + lcp(i+8, i+8-d) exactly.  Six shift/select passes
    replace the reference's byte-serial lz_extend for long matches
    (lib/matchfinder_common.h:178-222).  The byte-exact remainder `fine`
    (trailing equal bytes past the last equal word) rides the same
    doubling so the TERMINAL link's remainder survives: whenever a chain
    step splices in the downstream match, it also adopts its remainder."""
    r = mlen
    f = fine
    s = 8
    while s < MAX_LEN:
        r_s = jnp.concatenate([r[s:], jnp.zeros(s, jnp.int32)])
        d_s = jnp.concatenate([dist[s:], jnp.zeros(s, jnp.int32)])
        f_s = jnp.concatenate([f[s:], jnp.zeros(s, jnp.int32)])
        take = (r == s) & (d_s == dist)
        r = r + jnp.where(take, r_s, 0)
        f = jnp.where(take, f_s, f)
        s *= 2
    return jnp.minimum(r + jnp.where(r >= 4, f, 0), MAX_LEN), dist


def _chain_extend2(mA, dA, fA, mB, dB, fB, return_pair: bool = False):
    """Two-candidate stride-8 chain extension: each candidate's chain may
    splice with EITHER downstream candidate that continues at the same
    distance; the longer extended match wins (ties prefer A, the nearer
    candidate).  Same exactness argument as _chain_extend — a splice fires
    only on exact distance equality, so lengths stay byte-true.

    With ``return_pair`` both extended candidates are returned as
    (lenA, distA, lenB, distB) — the min-cost DP parser wants both (their
    offset costs differ even when the capped lengths tie)."""
    rA, fa = mA, fA
    rB, fb = mB, fB
    s = 8
    while s < MAX_LEN:
        def sh(x):
            return jnp.concatenate([x[s:], jnp.zeros(s, jnp.int32)])
        rA_s, dA_s, fa_s = sh(rA), sh(dA), sh(fa)
        rB_s, dB_s, fb_s = sh(rB), sh(dB), sh(fb)
        tA1 = (rA == s) & (dA_s == dA)
        tA2 = (rA == s) & ~tA1 & (dB_s == dA)
        tB1 = (rB == s) & (dA_s == dB)
        tB2 = (rB == s) & ~tB1 & (dB_s == dB)
        rA_new = rA + jnp.where(tA1, rA_s, jnp.where(tA2, rB_s, 0))
        fa_new = jnp.where(tA1, fa_s, jnp.where(tA2, fb_s, fa))
        rB_new = rB + jnp.where(tB1, rA_s, jnp.where(tB2, rB_s, 0))
        fb_new = jnp.where(tB1, fa_s, jnp.where(tB2, fb_s, fb))
        rA, fa, rB, fb = rA_new, fa_new, rB_new, fb_new
        s *= 2
    lenA = jnp.minimum(rA + jnp.where(rA >= 4, fa, 0), MAX_LEN)
    lenB = jnp.minimum(rB + jnp.where(rB >= 4, fb, 0), MAX_LEN)
    if return_pair:
        return lenA, dA, lenB, dB
    useB = lenB > lenA
    return jnp.where(useB, lenB, lenA), jnp.where(useB, dB, dA)


def _chain_extend_multi(cands, strides2=(1, 2, 4, 8, 16, 32, 64, 128),
                        strides1=(1, 2, 4, 8, 16, 32, 64, 128)):
    """N-candidate chain extension by multi-stride max-relaxation.

    Exact identity: lcp(i, d) >= s  =>  lcp(i, d) = s + lcp(i+s, d) for
    ANY s — not just the stride-boundary case the old == test used (which
    broke whenever position i+s's candidates had different distances and
    underestimated 16-28%% of lengths by up to 43 bytes, measured).  Each
    pass takes r = max(r, s + r_down) over every downstream candidate
    slot at distance d; word-estimates only ever under-report, so the
    relaxation is sound and monotone.  `fine` (trailing bytes past the
    last equal word) is adopted from whichever downstream slot supplied
    the max, keeping lengths byte-exact.  Ascending strides compound
    within a round (values grow geometrically), two rounds reach 258.

    cands: list of (mlen, dist, fine) i32 triples; returns a list of
    (len, dist) pairs, lengths byte-exact and capped at MAX_LEN.
    """
    K = len(cands)
    rs = [c[0] for c in cands]
    ds = [c[1] for c in cands]
    fs = [c[2] for c in cands]
    for strides in (strides1, strides2):
        for s in strides:
            def sh(x):
                return jnp.concatenate([x[s:], jnp.zeros(s, jnp.int32)])
            r_s = [sh(r) for r in rs]
            d_s = [sh(d) for d in ds]
            f_s = [sh(f) for f in fs]
            new_r, new_f = [], []
            for k in range(K):
                can = rs[k] >= s
                r_new, f_new = rs[k], fs[k]
                for j in range(K):
                    cand = jnp.where(can & (d_s[j] == ds[k]),
                                     s + r_s[j], 0)
                    better = cand > r_new
                    f_new = jnp.where(better, f_s[j], f_new)
                    r_new = jnp.where(better, cand, r_new)
                new_r.append(r_new)
                new_f.append(f_new)
            rs, fs = new_r, new_f
    outs = []
    for k in range(K):
        ln = jnp.minimum(rs[k] + jnp.where(rs[k] >= 4, fs[k], 0), MAX_LEN)
        outs.append((ln, ds[k]))
    return outs


def _chain_extend3(mA, dA, fA, mB, dB, fB, mC, dC, fC):
    """Three-candidate wrapper over _chain_extend_multi."""
    outs = _chain_extend_multi([(mA, dA, fA), (mB, dB, fB), (mC, dC, fC)])
    return outs[0] + outs[1] + outs[2]


def _greedy_commit(span: jax.Array, is_match: jax.Array, seg: int):
    """Greedy parse as independent `seg`-position segments: a lax.scan FSM
    over the segment, vectorized across segments; matches are truncated at
    segment boundaries (a truncation below 3 bytes falls back to a
    literal).  Exactly: i=seg_start; while: commit[i]; i += eff[i].
    Returns (committed mask, eff span) per position."""
    n = span.shape[0]
    m = n // seg
    span_t = span.reshape(m, seg).T          # [seg, m]
    match_t = is_match.reshape(m, seg).T
    remaining = jnp.arange(seg, 0, -1, dtype=jnp.int32)  # seg - t

    def step(e, xs):
        sp, im, rem = xs
        commit = e == 0
        trunc = jnp.minimum(sp, rem)
        eff = jnp.where(im & (trunc >= 3), trunc, 1)
        e = jnp.where(commit, eff - 1, e - 1)
        return e, (commit, eff)

    _, (commits, effs) = jax.lax.scan(
        step, jnp.zeros(m, jnp.int32), (span_t, match_t, remaining)
    )
    return commits.T.reshape(n), effs.T.reshape(n)


def _greedy_commit_merge(span: jax.Array, is_match: jax.Array,
                         dist: jax.Array, seg: int):
    """Commit FSM with same-distance run coalescing, gather-free.

    Like _greedy_commit, but when consecutive committed matches share a
    distance (the ladder/LCP-cap split pattern — one physical match
    reported as several items), the later items are absorbed: the FSM
    carries the pending run (dist, budget) and flags absorbed item heads
    at their own step; the merged span at each surviving head is then
    next_boundary_after(t) - t, computed with a reverse log-shift min
    (items tile the segment, so the next head IS the merged end).  Saves
    ~14 bits per absorbed item (measured 1.4K/MiB text, 5.7K/MiB
    records); the 258 cap and segment bounds are enforced in the carry.
    Returns (committed mask, merged eff) per position."""
    n = span.shape[0]
    m = n // seg
    span_t = span.reshape(m, seg).T          # [seg, m]
    match_t = is_match.reshape(m, seg).T
    dist_t = dist.reshape(m, seg).T
    remaining = jnp.arange(seg, 0, -1, dtype=jnp.int32)

    def step(carry, xs):
        e, pdist, pbud = carry
        sp, im, dd, rem = xs
        commit = e == 0
        trunc = jnp.minimum(sp, rem)
        is_m = im & (trunc >= 3)
        eff = jnp.where(is_m, trunc, 1)
        absorb = (commit & is_m & (pdist == dd) & (pdist > 0)
                  & (pbud + eff <= MAX_LEN))
        pdist_new = jnp.where(absorb, pdist, jnp.where(is_m, dd, 0))
        pbud_new = jnp.where(absorb, pbud + eff, jnp.where(is_m, eff, 0))
        pdist = jnp.where(commit, pdist_new, pdist)
        pbud = jnp.where(commit, pbud_new, pbud)
        e = jnp.where(commit, eff - 1, e - 1)
        return (e, pdist, pbud), (commit & ~absorb, eff)

    zm = jnp.zeros(m, jnp.int32)
    _, (heads, effs) = jax.lax.scan(
        step, (zm, zm, zm), (span_t, match_t, dist_t, remaining)
    )
    # next boundary strictly after t (reverse log-shift min over head
    # positions; non-head tail defaults to the segment end)
    tix = jax.lax.broadcasted_iota(jnp.int32, (seg, m), 0)
    x = jnp.where(heads, tix, seg)
    s2 = 1
    while s2 < seg:
        shifted = jnp.concatenate(
            [x[s2:], jnp.full((s2, m), seg, jnp.int32)], axis=0)
        x = jnp.minimum(x, shifted)
        s2 *= 2
    nb_after = jnp.concatenate(
        [x[1:], jnp.full((1, m), seg, jnp.int32)], axis=0)
    eff_m = jnp.where(heads, nb_after - tix, effs)
    return heads.T.reshape(n), eff_m.T.reshape(n)


def _exclusive_bit_offsets(nb: jax.Array):
    """Exclusive prefix sum of per-position bit counts via exact triangular
    f32 matmuls on the MXU (values < 2^24 throughout: total stream bits are
    <= 9.5 * n < 2^24 for n <= 1 MiB).  jnp.cumsum on TPU is ~50 ms for 1M
    elements; this is <1 ms.  Returns (exclusive offsets, total)."""
    n = nb.shape[0]
    C = 128
    if n % C != 0 or n <= C:
        total = jnp.sum(nb)
        return jnp.cumsum(nb) - nb, total
    R = n // C
    x = nb.reshape(R, C).astype(jnp.float32)
    tri = jnp.triu(jnp.ones((C, C), jnp.float32))
    row_inc = jax.lax.dot(x, tri, precision=jax.lax.Precision.HIGHEST)
    tot = row_inc[:, -1]
    if R % C == 0 and R > C:
        R2 = R // C
        t2 = tot.reshape(R2, C)
        tri2 = tri
        rc = jax.lax.dot(t2, tri2, precision=jax.lax.Precision.HIGHEST)
        top = jnp.cumsum(rc[:, -1]) - rc[:, -1]
        row_base = (rc - t2 + top[:, None]).reshape(R)
    else:
        row_base = jnp.cumsum(tot) - tot
    offs = (row_inc - x + row_base[:, None]).astype(jnp.int32).reshape(n)
    total = (row_base[-1] + tot[-1]).astype(jnp.int32)
    return offs, total


_GROUP = 128
_GROUP_CAPW = 37  # 128 positions * <=9 bits = 1152 bits -> 36 words + carry


def _group_premerge(values: jax.Array, nbits: jax.Array, offs: jax.Array,
                    capw: int = _GROUP_CAPW, group: int = _GROUP):
    """Stage 1 of the group pack: merge 128-position groups into
    (capw+1)-word buffers already shifted to the group's in-word bit
    offset.  Returns (sbuf [m, capw+1] u32, gw [m] i32 absolute start
    words) — the placement stage (`_group_place` scatter-add, or the
    Pallas RMW kernel in pallas_kernels.py) ORs these at gw."""
    n = values.shape[0]
    m = n // group
    v = values.reshape(m, group)
    nb = nbits.reshape(m, group).astype(jnp.uint32)
    o = offs.reshape(m, group)
    goff = o[:, :1]
    loff = (o - goff).astype(jnp.uint32)          # < 32 * capw
    mask = jnp.where(
        nb >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << nb) - jnp.uint32(1)
    )
    vm = v & mask
    sb = loff & jnp.uint32(31)
    lo = vm << sb
    hi = jnp.where(sb > 0, vm >> (jnp.uint32(32) - jnp.maximum(sb, 1)), 0)
    wsel = (loff >> jnp.uint32(5)).astype(jnp.int32)[:, :, None]
    widx = jnp.arange(capw, dtype=jnp.int32)[None, None, :]
    # disjoint bit positions within a group -> integer add == bitwise OR
    buf = jnp.sum(
        jnp.where(wsel == widx, lo[:, :, None], 0)
        + jnp.where(wsel == widx - 1, hi[:, :, None], 0),
        axis=1,
        dtype=jnp.uint32,
    )                                              # [m, CAPW]
    gs = (goff[:, 0].astype(jnp.uint32)) & jnp.uint32(31)
    gw = (goff[:, 0] >> 5).astype(jnp.int32)
    bufp = jnp.concatenate([jnp.zeros((m, 1), jnp.uint32), buf], axis=1)
    slo = buf << gs[:, None]
    shi = jnp.where(
        (gs > 0)[:, None], bufp[:, :-1] >> (jnp.uint32(32) - jnp.maximum(gs, 1))[:, None], 0
    )
    last_hi = jnp.where(
        (gs > 0)[:, None],
        bufp[:, -1:] >> (jnp.uint32(32) - jnp.maximum(gs, 1))[:, None],
        0,
    )
    sbuf = jnp.concatenate(
        [slo, jnp.zeros((m, 1), jnp.uint32)], axis=1
    ) | jnp.concatenate([shi, last_hi], axis=1)
    return sbuf, gw


def _group_place(sbuf: jax.Array, gw: jax.Array, nwords: int) -> jax.Array:
    """Stage 2 (XLA path): scatter-add whole group buffers at their start
    words."""
    m, capw1 = sbuf.shape
    tgt = gw[:, None] + jnp.arange(capw1, dtype=jnp.int32)[None, :]
    # clamp instead of drop-mode: out-of-range rows only carry zero bits,
    # and the in-bounds promise avoids XLA's per-update bounds masking
    tgt = jnp.minimum(tgt, nwords - 1)
    words = jnp.zeros(nwords, jnp.uint32)
    words = words.at[tgt.reshape(-1)].add(
        sbuf.reshape(-1), mode="promise_in_bounds"
    )
    return words


def _group_pack(values: jax.Array, nbits: jax.Array, offs: jax.Array,
                nwords: int, capw: int = _GROUP_CAPW) -> jax.Array:
    """Pack per-position (value, nbits) items at absolute bit offsets
    `offs` into a word array, WITHOUT a per-item scatter: 128-position
    groups pre-merge into `capw`-word buffers with one-hot disjoint-bit
    sums, then one small scatter-add places whole groups."""
    sbuf, gw = _group_premerge(values, nbits, offs, capw)
    return _group_place(sbuf, gw, nwords)


def _hash3_matchfind(h3: jax.Array, words: jax.Array, seg: int):
    """Nearest previous 3-byte match within 8192 bytes via one batched
    segment sort (the hc_matchfinder hash3 role, lib/hc_matchfinder.h:119-
    131; singleton bucket, len-3 only — longer matches come from the
    4-byte path).  Returns the distance per position (0 = none)."""
    n = h3.shape[0]
    m = n // seg
    lp = jax.lax.broadcasted_iota(jnp.uint32, (m, seg), 1)
    pos_bits, junk = _seg_key_params(seg)
    key = (h3.reshape(m, seg) << jnp.uint32(pos_bits)) | lp
    sk, sw = jax.lax.sort((key, words.reshape(m, seg)), num_keys=1, dimension=1)
    shash = sk >> jnp.uint32(pos_bits)
    slp = sk & jnp.uint32((1 << pos_bits) - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, seg), 1)
    same = (
        (shash == jnp.roll(shash, 1, axis=1))
        & (shash != jnp.uint32(junk))
        & (col >= 1)
    )
    eq3 = same & (
        (sw & jnp.uint32(0xFFFFFF)) == (jnp.roll(sw, 1, axis=1) & jnp.uint32(0xFFFFFF))
    )
    dist = jnp.where(eq3, slp - jnp.roll(slp, 1, axis=1), jnp.uint32(0))
    # a len-3 match only beats 3 literals at short distances (small offset
    # codes + extras); the reference applies the same kind of cutoff
    # (lib/deflate_compress.c:2673-2675)
    payload = jnp.where(eq3 & (dist <= 1024), dist, jnp.uint32(0))
    _, pay = jax.lax.sort((slp, payload), num_keys=1, dimension=1)
    return pay.reshape(n).astype(jnp.int32)


def _parse_chunk(b: jax.Array, length: jax.Array, lazy: bool = False,
                 two_pass: bool = False, depth: int = 2, hash3: bool = False,
                 wide_ext: bool = False, wide_window: bool = False,
                 lcp: int = 16):
    """Shared greedy LZ parse: matchfind (sorted + RLE paths), combine,
    segment-FSM commit (optionally lazy).  With ``two_pass``, a second
    matchfind over half-segment-shifted windows guarantees every position
    at least half a window of history (pass 1 alone gives positions near a
    segment start almost none).  ``hash3`` adds len-3 matches at offsets
    <= 8192 from a third segment sort (the deepest-level mode).  Returns
    (bp, pos, commit_match, commit_lit, eff, dist) over the padded
    position array."""
    n = b.shape[0]
    n_pad, sort_seg, fsm_seg = _segment_sizes(n, wide=wide_window)
    junk_val = _seg_key_params(sort_seg)[1]
    bp = jnp.pad(b, (0, n_pad - n))
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]
    live = pos < length

    words_u32 = _le32_words(bp, extra_pad=16)
    w4 = jnp.concatenate([words_u32[4:], jnp.zeros(4, jnp.uint32)])
    w8 = jnp.concatenate([words_u32[8:], jnp.zeros(8, jnp.uint32)])
    w12 = jnp.concatenate([words_u32[12:], jnp.zeros(12, jnp.uint32)])

    h = ((words_u32 * jnp.uint32(MULT)) >> jnp.uint32(32 - HASH_ORDER)).astype(
        jnp.uint32
    )
    # positions without 4 valid bytes go to a junk bucket no real hash hits
    h = jnp.where(pos + MIN_MATCH <= length, h, jnp.uint32(junk_val))

    # lcp < 16 drops the w12 (and at 8 the w8) sort payloads — the fast
    # tier's sort is its measured rock; chain extension still recovers
    # longer matches at matching distances (VERDICT r4 #5 lever)
    mlen_s, dist_s = _sorted_matchfind(
        h, words_u32, w4, None if lcp <= 8 else w8,
        None if lcp <= 12 else w12, sort_seg,
        depth=depth, wide_ext=wide_ext)
    if two_pass and sort_seg >= 2 * FSM_SEG:
        half = sort_seg // 2
        junk = jnp.full(half, junk_val, jnp.uint32)
        zpad = jnp.zeros(half, jnp.uint32)
        # the rescue pass only recovers matches pass 1 missed entirely, so a
        # shallower LCP cap (8 + chain extension) keeps it 2 payloads cheaper
        mlen_b, dist_b = _sorted_matchfind(
            jnp.concatenate([h[half:], junk]),
            jnp.concatenate([words_u32[half:], zpad]),
            jnp.concatenate([w4[half:], zpad]),
            None,
            None,
            sort_seg,
        )
        mlen_b = jnp.concatenate([jnp.zeros(half, jnp.int32), mlen_b[:-half]])
        dist_b = jnp.concatenate([jnp.zeros(half, jnp.int32), dist_b[:-half]])
        better_b = mlen_b > mlen_s
        mlen_s = jnp.where(better_b, mlen_b, mlen_s)
        dist_s = jnp.where(better_b, dist_b, dist_s)

    cap = jnp.clip(length - pos, 0, MAX_LEN)
    mlen_s = jnp.minimum(mlen_s, cap)
    dist = dist_s

    # adaptive minimum match length from the distinct-literal count of the
    # first 4 KiB (the reference's calculate_min_match_len policy,
    # lib/deflate_compress.c:2295-2353): on low-entropy alphabets short
    # matches cost more bits than the literals they replace
    stride = max(1, n_pad // 4096)
    alphabet = jnp.arange(256, dtype=jnp.int32)[None, :]
    s_str = bp[::stride][:4096].astype(jnp.int32)
    v_str = (jnp.arange(s_str.shape[0], dtype=jnp.int32) * stride) < length
    s_dense = bp[:4096].astype(jnp.int32)
    v_dense = jnp.arange(s_dense.shape[0], dtype=jnp.int32) < length
    # padding past `length` must not count as alphabet (short tail chunks
    # would otherwise report a tiny alphabet and over-raise min_len); the
    # dense window covers short chunks, the strided one long chunks
    seen = jnp.any(
        v_str[:, None] & (s_str[:, None] == alphabet), axis=0
    ) | jnp.any(v_dense[:, None] & (s_dense[:, None] == alphabet), axis=0)
    used = jnp.sum(seen.astype(jnp.int32))
    min_len = jnp.where(
        used <= 5, 9,
        jnp.where(used <= 7, 8,
        jnp.where(used <= 9, 7,
        jnp.where(used <= 15, 6,
        jnp.where(used <= 44, 5, MIN_MATCH)))))
    min_len = jnp.maximum(min_len, MIN_MATCH)
    if hash3:
        h3 = (
            ((words_u32 & jnp.uint32(0xFFFFFF)) * jnp.uint32(MULT))
            >> jnp.uint32(32 - HASH_ORDER)
        ).astype(jnp.uint32)
        h3 = jnp.where(pos + 3 <= length, h3, jnp.uint32(junk_val))
        d3 = _hash3_matchfind(h3, words_u32, sort_seg)
        use3 = (mlen_s < MIN_MATCH) & (d3 > 0) & (cap >= 3) & (min_len <= 4)
        mlen_s = jnp.where(use3, 3, mlen_s)
        dist = jnp.where(use3, d3, dist)
        is_match = use3 | (mlen_s >= min_len)
    else:
        is_match = mlen_s >= min_len
    span = jnp.where(is_match, mlen_s, 1)

    if lazy:
        # offset-aware 1-position lookahead: defer a match to a literal
        # when the next position's match wins the reference's weighted test
        # 4*(next_len - cur_len) + bsr(cur_off) - bsr(next_off) > 2
        # (lib/deflate_compress.c:2722-2725)
        span_n = jnp.concatenate([span[1:], jnp.ones(1, jnp.int32)])
        match_n = jnp.concatenate([is_match[1:], jnp.zeros(1, bool)])
        dist_n = jnp.concatenate([dist[1:], jnp.ones(1, jnp.int32)])
        score = 4 * (span_n - span) + (
            _bsr(jnp.maximum(dist, 1)) - _bsr(jnp.maximum(dist_n, 1))
        )
        defer = is_match & match_n & (span_n >= span) & (score > 2)
        is_match = is_match & ~defer
        span = jnp.where(is_match, span, 1)

    committed, eff = _greedy_commit_merge(span, is_match, dist, fsm_seg)
    commit_match = committed & (eff >= 3) & live
    commit_lit = committed & (eff < 3) & live
    return bp, pos, commit_match, commit_lit, eff, dist


def _parse_candidates(b: jax.Array, length: jax.Array, depth: int = 6,
                      two_pass: bool = False, hash3: bool = False,
                      wide_window: bool = True, use_content: bool = True,
                      use_wide: bool = True, ext_c: bool = True,
                      lcp: int = 16,
                      strides2=(1, 2, 4, 8, 16, 32, 64, 128),
                      strides1=(1, 2, 4, 8, 16, 32, 64, 128),
                      content_doublings: int = 0,
                      content_round_probes: bool = False):
    """Candidate generation for the min-cost DP parser: per-position best
    and runner-up (distinct-distance) match candidates, plus an optional
    len-3 short-offset candidate.  Same matchfind machinery as
    _parse_chunk but WITHOUT committing — the DP chooses.  Plays the role
    of bt_matchfinder_get_matches feeding the reference's near-optimal
    parse (lib/deflate_compress.c:3592-3849), with the candidate list
    truncated to 2 (+1 len-3) per position.

    Returns (bp, pos, lenA, distA, lenB, distB, lenC, distC, dist3) over
    the padded array; C is the nearest-occurrence candidate (minimum
    distance), lengths are clipped to the chunk tail, dist3 == 0 means no
    len-3 candidate.

    ``use_content`` gates the lexicographic (content-ordered) candidate
    pass and its D/E pool entries; ``use_wide`` gates the 4 extra 16-byte
    LCP sort payloads.  The speed-oriented DP tier turns both off (the
    pass costs ~28 ms and the payloads ~6 ms per 4-chunk batch on-chip,
    for ~0.08 and ~0.05 ratio points respectively)."""
    n = b.shape[0]
    n_pad, sort_seg, _ = _segment_sizes(n, wide=wide_window)
    junk_val = _seg_key_params(sort_seg)[1]
    bp = jnp.pad(b, (0, n_pad - n))
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]

    words_u32 = _le32_words(bp, extra_pad=32)
    w4 = jnp.concatenate([words_u32[4:], jnp.zeros(4, jnp.uint32)])
    w8 = jnp.concatenate([words_u32[8:], jnp.zeros(8, jnp.uint32)])
    w12 = jnp.concatenate([words_u32[12:], jnp.zeros(12, jnp.uint32)])
    # 32-byte direct LCP for the DP tiers: the relaxation chains recover
    # most long matches, but same-dist continuation candidates are not
    # always present downstream (periodic data at mixed strides) — the
    # wider word payloads measure lengths to 35 outright
    wide = tuple(
        jnp.concatenate([words_u32[k:], jnp.zeros(k, jnp.uint32)])
        for k in (16, 20, 24, 28)
    ) if use_wide else None

    h = ((words_u32 * jnp.uint32(MULT)) >> jnp.uint32(32 - HASH_ORDER)).astype(
        jnp.uint32
    )
    h = jnp.where(pos + MIN_MATCH <= length, h, jnp.uint32(junk_val))

    # lcp < 16 drops the w12 (and at 8 also w8) sort payloads: LCP capped
    # at `lcp` + fine; the multi-stride relaxation in _chain_extend_multi
    # still recovers long matches from any r >= s, not just stride
    # boundaries — 1-2 fewer operands on the hot pos-pass sort
    rawA, rawB, rawC = _sorted_matchfind(
        h, words_u32, w4, None if lcp <= 8 else w8,
        None if lcp <= 12 else w12,
        sort_seg, depth=depth, return_triple=True, wide=wide,
    )
    if use_content:
        # content-ordered pass: lexicographic neighbors give the length-best
        # candidates the position-ordered probes need full bucket depth to
        # reach (the bt matchfinder's sorted-tree property)
        cA = _content_sorted_matchfind(
            h, words_u32, w4, w8, w12, sort_seg,
            depth=max(depth * 2 // 3, 4), wide=wide,
            doublings=content_doublings,
            round_probes=content_round_probes,
        )
        rawD = cA[0:3]
        rawE = cA[3:6]
        ext = _chain_extend_multi([rawA, rawB, rawC, rawD, rawE])
    elif ext_c:
        ext = _chain_extend_multi([rawA, rawB, rawC], strides2=strides2,
                                  strides1=strides1)
    else:
        # C (nearest occurrence) stays at its raw word-granular LCP (+fine
        # remainder): its role in the DP pool is the MIN-DISTANCE short
        # option, which rarely needs extension — and dropping it from the
        # K**2 relaxation cuts the extension cost ~45%
        ext = _chain_extend_multi([rawA, rawB], strides2=strides2,
                                  strides1=strides1)
        mC0, dC0, fC0 = rawC
        lnC0 = jnp.minimum(mC0 + jnp.where(mC0 >= 4, fC0, 0), MAX_LEN)
        ext = ext + [(lnC0, dC0)]

    # pool selection: A = longest (ties: nearest), B = second-longest at a
    # distinct distance, C = nearest occurrence with len >= 4
    lenA = jnp.zeros_like(ext[0][0])
    dA = jnp.zeros_like(lenA)
    lenB = jnp.zeros_like(lenA)
    dB = jnp.zeros_like(lenA)
    lenC = jnp.zeros_like(lenA)
    dC = jnp.zeros_like(lenA)
    for ln, dd in ext:
        valid = (dd > 0) & (ln >= 4)
        ln = jnp.where(valid, ln, 0)
        beats_a = (ln > lenA) | ((ln == lenA) & valid & (dd < dA))
        # displaced A drops to B unless the new winner shares its distance
        newB_l = jnp.where(beats_a & (dd != dA), lenA, lenB)
        newB_d = jnp.where(beats_a & (dd != dA), dA, dB)
        beats_b = ~beats_a & valid & (dd != dA) & (ln > lenB)
        lenB = jnp.where(beats_b, ln, newB_l)
        dB = jnp.where(beats_b, dd, newB_d)
        lenA = jnp.where(beats_a, ln, lenA)
        dA = jnp.where(beats_a, dd, dA)
        beats_c = valid & ((dC == 0) | (dd < dC))
        lenC = jnp.where(beats_c, ln, lenC)
        dC = jnp.where(beats_c, dd, dC)
    if two_pass and sort_seg >= 2 * FSM_SEG:
        # half-segment-shifted rescue pass (full-window history coverage);
        # merge its candidate into the pair, keeping distinct distances
        half = sort_seg // 2
        junk = jnp.full(half, junk_val, jnp.uint32)
        zpad = jnp.zeros(half, jnp.uint32)
        mlen_c, dist_c = _sorted_matchfind(
            jnp.concatenate([h[half:], junk]),
            jnp.concatenate([words_u32[half:], zpad]),
            jnp.concatenate([w4[half:], zpad]),
            None, None, sort_seg,
        )
        mlen_c = jnp.concatenate([jnp.zeros(half, jnp.int32), mlen_c[:-half]])
        dist_c = jnp.concatenate([jnp.zeros(half, jnp.int32), dist_c[:-half]])
        beats_a = mlen_c > lenA
        # displaced A becomes the runner-up unless C merely duplicates A
        newB_l = jnp.where(beats_a & (dist_c != dA), lenA, lenB)
        newB_d = jnp.where(beats_a & (dist_c != dA), dA, dB)
        beats_b = ~beats_a & (mlen_c > lenB) & (dist_c != dA)
        lenB = jnp.where(beats_b, mlen_c, newB_l)
        dB = jnp.where(beats_b, dist_c, newB_d)
        lenA = jnp.where(beats_a, mlen_c, lenA)
        dA = jnp.where(beats_a, dist_c, dA)

    cap = jnp.clip(length - pos, 0, MAX_LEN)
    lenA = jnp.minimum(lenA, cap)
    lenB = jnp.minimum(lenB, cap)
    lenC = jnp.minimum(lenC, cap)

    if hash3:
        h3 = (
            ((words_u32 & jnp.uint32(0xFFFFFF)) * jnp.uint32(MULT))
            >> jnp.uint32(32 - HASH_ORDER)
        ).astype(jnp.uint32)
        h3 = jnp.where(pos + 3 <= length, h3, jnp.uint32(junk_val))
        d3 = _hash3_matchfind(h3, words_u32, sort_seg)
        d3 = jnp.where(cap >= 3, d3, 0)
    else:
        d3 = jnp.zeros_like(lenA)
    return bp, pos, lenA, dA, lenB, dB, lenC, dC, d3


def compress_chunk_static(b: jax.Array, length: jax.Array, bfinal: jax.Array):
    """Compress one chunk (uint8[N], valid prefix `length`) into a
    *byte-aligned* raw-DEFLATE fragment: one non-final static-Huffman block
    plus an empty stored block carrying BFINAL (sync flush).

    Returns (words uint32[W], total_bits int32) with total_bits % 8 == 0.
    W is static: ceil((9*N + 128) / 32) — all-9-bit-literals worst case.
    """
    n = b.shape[0]
    bp, pos, commit_match, commit_lit, eff, dist = _parse_chunk(b, length)

    # --- fused per-position emission column (match <= 31 bits) -------------
    lit_code, lit_bits = _static_litlen_code(bp.astype(jnp.int32))

    lslot, lbase, lextra = _length_slot(jnp.maximum(eff, 3))
    lsym_code, lsym_bits = _static_litlen_code(257 + lslot)
    lx = (eff - lbase).astype(jnp.uint32)

    oslot, obase, oextra = _offset_slot(jnp.maximum(dist, 1))
    ocode = _rev(oslot.astype(jnp.uint32), jnp.full_like(oslot, 5))
    ox = (dist - obase).astype(jnp.uint32)

    sh1 = lsym_bits.astype(jnp.uint32)
    sh2 = sh1 + lextra.astype(jnp.uint32)
    sh3 = sh2 + jnp.uint32(5)
    match_val = lsym_code | (lx << sh1) | (ocode << sh2) | (ox << sh3)
    match_bits = (sh3 + oextra.astype(jnp.uint32)).astype(jnp.int32)

    c = jnp.where(commit_match, match_val, jnp.where(commit_lit, lit_code, 0))
    nb = jnp.where(commit_match, match_bits, jnp.where(commit_lit, lit_bits, 0))

    # --- layout: 3-bit header, body, EOB, byte-align, sync-flush marker ----
    offs, body_bits = _exclusive_bit_offsets(nb)
    offs = offs + 3

    nwords = (9 * n + 128 + 31) // 32
    words = _group_pack(c, nb, offs, nwords)

    # header (BFINAL=0,BTYPE=01), EOB (7 zero bits), sync stored header
    end = body_bits + 3
    pad_bits = (-(end + 7 + 3)) % 8
    tail_vals = jnp.stack(
        [
            jnp.uint32(0b010),                      # block header at bit 0
            jnp.uint32(0),                          # EOB at `end`
            jnp.where(bfinal, jnp.uint32(1), jnp.uint32(0)),  # sync hdr
            jnp.uint32(0xFFFF0000),                 # LEN=0 NLEN=0xFFFF
        ]
    )
    tail_offs = jnp.stack(
        [jnp.int32(0), end, end + 7, end + 7 + 3 + pad_bits]
    )
    tsb = (tail_offs & 31).astype(jnp.uint32)
    tlo = tail_vals << tsb
    thi = jnp.where(tsb > 0, tail_vals >> (jnp.uint32(32) - jnp.maximum(tsb, 1)), 0)
    tw = tail_offs >> 5
    words = words.at[tw].add(tlo, mode="drop")
    words = words.at[tw + 1].add(thi, mode="drop")

    total_bits = end + 7 + 3 + pad_bits + 32
    return words, total_bits


@jax.jit
def compress_chunks_static(bufs: jax.Array, lengths: jax.Array, bfinal: jax.Array):
    """vmapped chunk compressor: uint8[B, N], int32[B], bool[B]
    -> (uint32[B, W], int32[B])."""
    return jax.vmap(compress_chunk_static)(bufs, lengths, bfinal)


def device_stream_to_bytes(words: np.ndarray, total_bits: int) -> bytes:
    """Host: finalize one chunk's device bitstream into bytes."""
    nbytes = (int(total_bits) + 7) // 8
    return np.asarray(words).tobytes()[:nbytes]
