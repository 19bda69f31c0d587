"""TPU compress pipeline: fully-jitted, fixed-shape, chunk-parallel DEFLATE.

This is the TPU-native re-derivation of the level-1 path (ht_matchfinder +
greedy parse + block emit) as array programs — NOT a translation of the C:

1. **Hashing** — the reference's multiplicative hash over 4-byte windows
   (lib/matchfinder_common.h:168-172) is computed for every position at once.
2. **Matchfinding** — instead of a mutable hash table (sequential insert),
   the nearest previous occurrence of each position's hash is found with ONE
   stable sort: positions sorted by hash keep ascending order inside each
   bucket, so each sorted neighbor IS the most-recent prior candidate.  This
   considers *every* prior position (a superset of ht_matchfinder's 2-entry
   buckets, lib/ht_matchfinder.h:57-60).
3. **Extension** — match lengths via word-at-a-time comparison (lz_extend's
   role): the i-side words are contiguous slices; the j-side is one 2-D
   sliced gather.  Capped at the level's nice length (32 for level 1,
   lib/deflate_compress.c:3935).
4. **Greedy commit** — the inherently sequential "advance by match length"
   scan becomes segmented binary lifting: jump tables give each position's
   chain landing at its segment boundary, tiny per-segment state tables are
   composed with `associative_scan`, and an in-segment lockstep replay
   recovers the exact per-position commit mask.  O(log n) depth, ~11 gathers.
5. **Emission** — ONE fused (value, nbits) column per position (a match's
   litlen code + length extra + offset code + offset extra is <= 31 bits for
   the static code); exclusive prefix sum of nbits gives bit offsets; a
   disjoint-bit scatter-add packs the final words.  Block header, EOB, and a
   byte-aligning sync-flush marker (empty stored block carrying BFINAL) are
   emitted as pseudo-items, so each chunk's output is a *byte-aligned*
   DEFLATE fragment that concatenates into one stream by pure byte append.

All symbol tables (length/offset slots, static Huffman codewords, bit
reversal) are computed arithmetically in-register — zero table gathers on
the emission path (the reference's table-driven approach maps badly onto TPU
gathers; clz/shift formulas map perfectly onto the VPU).

The host/API layer falls back to a stored block when the device stream would
exceed it, preserving the compress_bound contract
(lib/deflate_compress.c:4087-4135).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MULT = 0x1E35A7BD
HASH_ORDER = 15
MAX_CAP = 32  # level-1 nice match length; also the FSM segment size
MIN_MATCH = 4


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
def _le32_words(b: jax.Array) -> jax.Array:
    """uint32 little-endian word starting at every byte position."""
    n = b.shape[0]
    bp = jnp.pad(b, (0, 4)).astype(jnp.uint32)
    return (
        bp[:n]
        | (bp[1 : n + 1] << jnp.uint32(8))
        | (bp[2 : n + 2] << jnp.uint32(16))
        | (bp[3 : n + 3] << jnp.uint32(24))
    )


def _nearest_prev_same_hash(h: jax.Array) -> jax.Array:
    """For each position, the nearest previous position with equal hash
    (-1 if none), via one stable sort — the sort-based matchfinder."""
    n = h.shape[0]
    order = jnp.argsort(h, stable=True)  # within equal h: ascending position
    h_sorted = h[order]
    prev_sorted = jnp.concatenate([jnp.full((1,), -1, jnp.int32), order[:-1]])
    same = jnp.concatenate(
        [jnp.zeros((1,), bool), h_sorted[1:] == h_sorted[:-1]]
    )
    cand_sorted = jnp.where(same, prev_sorted, -1)
    cand = jnp.zeros(n, jnp.int32).at[order].set(cand_sorted)
    return cand


def _match_lengths(words: jax.Array, j: jax.Array, cap: jax.Array):
    """LCP(position, j) in bytes, up to MAX_CAP.  i-side: contiguous slices;
    j-side: one 2-D sliced gather of MAX_CAP/4 consecutive words."""
    n = words.shape[0]
    k = MAX_CAP // 4
    wpad = jnp.pad(words, (0, MAX_CAP))
    wi = jnp.stack([wpad[4 * t : 4 * t + n] for t in range(k)], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1) * 4
    wj = wpad[j[:, None] + col]
    x = wi ^ wj
    full = x == 0
    tz_bytes = jnp.where(
        (x & jnp.uint32(0xFF)) != 0,
        0,
        jnp.where(
            (x & jnp.uint32(0xFFFF)) != 0,
            1,
            jnp.where((x & jnp.uint32(0xFFFFFF)) != 0, 2, 3),
        ),
    )
    add = jnp.where(full, 4, tz_bytes)
    alive = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones((x.shape[0], 1), jnp.int32), full.astype(jnp.int32)[:, :-1]],
            axis=1,
        ),
        axis=1,
    )
    length = jnp.sum(add * alive, axis=1).astype(jnp.int32)
    return jnp.minimum(length, cap)


def _greedy_commit(span: jax.Array) -> jax.Array:
    """Parallel greedy parse via segmented binary lifting (see module doc).

    Exactly equivalent to: i=0; while i<n: commit[i]=True; i+=span[i].
    """
    n = span.shape[0]
    S = MAX_CAP
    m = -(-n // S)
    n_pad = m * S
    span_p = jnp.concatenate([span, jnp.ones(n_pad - n, jnp.int32)])
    spans2 = span_p.reshape(m, S)

    # Per-segment state tables built by a GATHER-FREE lockstep replay: run
    # the FSM for all 32 possible entry states of every segment at once.
    # state rule: e==0 -> commit here, e = span-1; else e -= 1.
    e = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, S), 1), (m, S)
    )
    for t in range(S):
        st = spans2[:, t : t + 1]
        e = jnp.where(e > 0, e - 1, st - 1)
    tables = e.astype(jnp.int8)  # [m, S]: entry state -> exit state

    def combine(a, b):  # b applied after a
        return jnp.take_along_axis(b, a.astype(jnp.int32), axis=-1)

    scanned = jax.lax.associative_scan(combine, tables, axis=0)
    entry = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), scanned[:-1, 0].astype(jnp.int32)]
    )

    e = entry
    commits = []
    for t in range(S):
        commits.append(e == 0)
        e = jnp.where(e > 0, e - 1, spans2[:, t] - 1)
    mask = jnp.stack(commits, axis=1).reshape(n_pad)
    return mask[:n]


def _pack_bits(values: jax.Array, nbits: jax.Array, nwords: int):
    """Exclusive-prefix-sum bit layout + disjoint-bit scatter-add packing."""
    offs = jnp.cumsum(nbits) - nbits
    total = offs[-1] + nbits[-1]
    word_idx = (offs >> 5).astype(jnp.int32)
    shift = (offs & 31).astype(jnp.uint32)
    mask = jnp.where(
        nbits >= 32,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << nbits.astype(jnp.uint32)) - 1,
    )
    v = values & mask
    lo = (v << shift).astype(jnp.uint32)
    hi = jnp.where(
        shift > 0, (v >> (jnp.uint32(32) - shift)).astype(jnp.uint32), 0
    ).astype(jnp.uint32)
    words = jnp.zeros(nwords, jnp.uint32)
    words = words.at[word_idx].add(lo, mode="drop")
    words = words.at[word_idx + 1].add(hi, mode="drop")
    return words, total


def compress_chunk_static(b: jax.Array, length: jax.Array, bfinal: jax.Array):
    """Compress one chunk (uint8[N], valid prefix `length`) into a
    *byte-aligned* raw-DEFLATE fragment: one non-final static-Huffman block
    plus an empty stored block carrying BFINAL (sync flush).

    Returns (words uint32[W], total_bits int32) with total_bits % 8 == 0.
    W is static: ceil((9*N + 128) / 32) — all-9-bit-literals worst case.
    """
    n = b.shape[0]
    words_u32 = _le32_words(b)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    h = ((words_u32 * jnp.uint32(MULT)) >> jnp.uint32(32 - HASH_ORDER)).astype(
        jnp.int32
    )
    # Positions beyond the valid prefix get unique out-of-range hashes so
    # they never pollute real buckets.
    h = jnp.where(pos + 3 < length, h, (1 << HASH_ORDER) + pos)

    cand = _nearest_prev_same_hash(h)
    dist = pos - cand
    valid = (cand >= 0) & (dist <= 32768)
    cap = jnp.clip(length - pos, 0, MAX_CAP)
    mlen = jnp.where(valid, _match_lengths(words_u32, jnp.maximum(cand, 0), cap), 0)
    is_match = mlen >= MIN_MATCH
    span = jnp.where(is_match, mlen, 1)

    committed = _greedy_commit(span)
    live = pos < length
    commit_lit = committed & live & ~is_match
    commit_match = committed & live & is_match

    # --- fused per-position emission column (match <= 31 bits) -------------
    lit_code, lit_bits = _static_litlen_code(b.astype(jnp.int32))

    lslot, lbase, lextra = _length_slot(jnp.maximum(mlen, 3))
    lsym_code, lsym_bits = _static_litlen_code(257 + lslot)
    lx = (mlen - lbase).astype(jnp.uint32)

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

    # --- header + EOB + sync-flush pseudo-items ----------------------------
    hdr_val = jnp.full((1,), 0b010, jnp.uint32)  # BFINAL=0, BTYPE=01
    hdr_bits = jnp.full((1,), 3, jnp.int32)
    eob_val = jnp.zeros((1,), jnp.uint32)  # static code for 256 is 0000000
    eob_bits = jnp.full((1,), 7, jnp.int32)

    body_bits = 3 + jnp.sum(nb) + 7
    sync_hdr_val = jnp.where(bfinal, jnp.uint32(1), jnp.uint32(0))[None]
    sync_hdr_bits = jnp.full((1,), 3, jnp.int32)
    pad_val = jnp.zeros((1,), jnp.uint32)
    pad_bits = ((-(body_bits + 3)) % 8)[None].astype(jnp.int32)
    lennlen_val = jnp.full((1,), 0xFFFF0000, jnp.uint32)
    lennlen_bits = jnp.full((1,), 32, jnp.int32)

    values = jnp.concatenate(
        [hdr_val, c, eob_val, sync_hdr_val, pad_val, lennlen_val]
    )
    nbits = jnp.concatenate(
        [hdr_bits, nb, eob_bits, sync_hdr_bits, pad_bits, lennlen_bits]
    )

    nwords = (9 * n + 128 + 31) // 32
    return _pack_bits(values, nbits, nwords)


@jax.jit
def compress_chunks_static(bufs: jax.Array, lengths: jax.Array, bfinal: jax.Array):
    """vmapped chunk compressor: uint8[B, N], int32[B], bool[B]
    -> (uint32[B, W], int32[B])."""
    return jax.vmap(compress_chunk_static)(bufs, lengths, bfinal)


def device_stream_to_bytes(words: np.ndarray, total_bits: int) -> bytes:
    """Host: finalize one chunk's device bitstream into bytes."""
    nbytes = (int(total_bits) + 7) // 8
    return np.asarray(words).tobytes()[:nbytes]
