"""Near-optimal parse (levels 10-12): match caching + min-cost path DP.

Role parity with ``deflate_compress_near_optimal``
(``lib/deflate_compress.c:3592-3849``): collect *all* matches per position,
run a backwards min-cost DP over the block, derive real Huffman codes from
the chosen path, and iterate cost refinement up to ``max_optim_passes``.

Level parameter parity (lib/deflate_compress.c:3981-4011):
    level 10: depth 35,  nice 75,  2 passes
    level 11: depth 100, nice 150, 4 passes
    level 12: depth 300, nice 258, 10 passes
"""

from __future__ import annotations

import numpy as np

from ..formats.deflate import (
    END_OF_BLOCK,
    LENGTH_SLOT_EXTRA,
    LENGTH_TO_SLOT,
    OFFSET_SLOT_EXTRA,
    SOFT_MAX_BLOCK_LENGTH,
    COMPRESSOR_MAX_LITLEN_CODEWORD_LEN,
    offset_to_slot,
)
from ..huffman.build import package_merge_lengths
from . import parse_host
from .emit import BitWriter, flush_block

# Fractional-bit cost scale (reference BIT_COST=16, lib/deflate_compress.c:121-140)
BIT_COST = 16

OPT_PARAMS = {
    10: dict(depth=35, nice=75, passes=2),
    11: dict(depth=100, nice=150, passes=4),
    12: dict(depth=300, nice=258, passes=10),
}

_MAX_MATCHES_PER_POS = 32


def _collect_matches(data: bytes, block_start: int, block_end: int, depth: int, nice: int,
                     state=None):
    """All useful matches per position, sorted by increasing length.

    Like bt_matchfinder_get_matches (lib/bt_matchfinder.h:296-315), only
    strictly-longer successive matches are kept (each with its nearest
    offset).  Hash chains stand in for the binary tree on the host path.
    ``state`` is an optional (h4, h3, mf) tuple carried across blocks so the
    whole-buffer hashes and the chain tables are built once per call, not
    once per 300 KB block.
    """
    n = len(data)
    if state is None:
        h4, h3 = parse_host._hashes(data)
        mf = parse_host.HashChains(data)
        # Pre-insert history before the block (window context).
        for p in range(max(block_start - 32768, 0), block_start):
            if p < n - 3:
                mf.insert(p, h4, h3)
    else:
        h4, h3, mf = state

    matches: list[list[tuple[int, int]]] = [[] for _ in range(block_end - block_start)]
    i = block_start
    while i < block_end:
        limit = min(258, n - i)
        found: list[tuple[int, int]] = []
        if limit >= 3 and i < n - 3:
            best = 2
            j = int(mf.head3[h3[i]])
            if j >= 0 and i - j <= 32768:
                l = parse_host._lcp(data, i, j, limit)
                if l >= 3:
                    found.append((l, i - j))
                    best = l
            d = depth
            j = int(mf.head4[h4[i]])
            while j >= 0 and i - j <= 32768 and d > 0 and best < min(nice, limit):
                l = parse_host._lcp(data, i, j, limit)
                if l > best and l >= 4:
                    found.append((l, i - j))
                    best = l
                j = int(mf.prev4[j])
                d -= 1
            mf.insert(i, h4, h3)
        # `found` is in increasing length order: keep the longest ones
        matches[i - block_start] = found[-_MAX_MATCHES_PER_POS:]
        # Like the reference, skip deep insertion inside very long matches.
        if found and found[-1][0] >= nice:
            skip_to = min(i + found[-1][0], block_end, n - 3)
            for p in range(i + 1, skip_to):
                mf.insert(p, h4, h3)
            for p in range(i + 1, skip_to):
                matches[p - block_start] = []
            i = skip_to
        else:
            i += 1
    return matches, (h4, h3, mf)


def _default_costs():
    """NOSTAT default costs (reference: 13/13/10 bits scaled by BIT_COST)."""
    lit_cost = np.full(256, 13 * BIT_COST, dtype=np.int64)
    len_sym_cost = np.full(29, 13 * BIT_COST, dtype=np.int64)
    off_sym_cost = np.full(30, 10 * BIT_COST, dtype=np.int64)
    return lit_cost, len_sym_cost, off_sym_cost


def _costs_from_lens(litlen_lens, off_lens):
    """Codeword lens -> scaled costs; unused symbols get a high default."""
    ll = litlen_lens.astype(np.int64)
    ol = off_lens.astype(np.int64)
    lit_cost = np.where(ll[:256] > 0, ll[:256], 13) * BIT_COST
    len_sym_cost = np.where(ll[257:286] > 0, ll[257:286], 13) * BIT_COST
    off_sym_cost = np.where(ol[:30] > 0, ol[:30], 10) * BIT_COST
    return lit_cost, len_sym_cost, off_sym_cost


def _min_cost_path(data, block_start, block_end, matches, lit_cost, len_sym_cost, off_sym_cost):
    """Backwards DP (reference deflate_find_min_cost_path,
    lib/deflate_compress.c:3327-3399).  Returns per-position item choice."""
    blen = block_end - block_start
    cost = np.zeros(blen + 1, dtype=np.int64)
    choice_len = np.ones(blen + 1, dtype=np.int32)
    choice_off = np.zeros(blen + 1, dtype=np.int32)

    len_cost = (
        len_sym_cost[LENGTH_TO_SLOT[np.arange(259)]]
        + LENGTH_SLOT_EXTRA[LENGTH_TO_SLOT[np.arange(259)]] * BIT_COST
    )
    # Candidate lengths per match: slot-boundary lengths + the full length.
    # Within a slot the symbol cost is constant, so boundaries plus the
    # maximum capture (nearly) all DP-optimal choices at a fraction of the
    # 3..258 sweep.
    from ..formats.deflate import LENGTH_SLOT_BASE

    slot_bases = LENGTH_SLOT_BASE.astype(np.int64)

    for pos in range(blen - 1, -1, -1):
        abs_pos = block_start + pos
        best = int(lit_cost[data[abs_pos]] + cost[pos + 1])
        blen_choice, boff_choice = 1, 0
        for (mlen, moff) in matches[pos]:
            # matches may extend past the block boundary; the DP must not
            mlen = min(mlen, blen - pos)
            if mlen < 3:
                continue
            oslot = int(offset_to_slot(np.int64(moff)))
            ocost = int(off_sym_cost[oslot]) + int(OFFSET_SLOT_EXTRA[oslot]) * BIT_COST
            ls = slot_bases[slot_bases <= mlen]
            cand = np.unique(np.concatenate([ls, [mlen]]))
            c = ocost + len_cost[cand] + cost[pos + cand]
            k = int(np.argmin(c))
            if int(c[k]) < best:
                best = int(c[k])
                blen_choice, boff_choice = int(cand[k]), moff
        cost[pos] = best
        choice_len[pos] = blen_choice
        choice_off[pos] = boff_choice
    return choice_len, choice_off


def _path_to_items(data, block_start, block_end, choice_len, choice_off):
    kinds, vals, offs = [], [], []
    pos = 0
    blen = block_end - block_start
    while pos < blen:
        L = int(choice_len[pos])
        if L == 1 or choice_off[pos] == 0:
            kinds.append(0)
            vals.append(data[block_start + pos])
            offs.append(0)
            pos += 1
        else:
            kinds.append(1)
            vals.append(L)
            offs.append(int(choice_off[pos]))
            pos += L
    return (
        np.array(kinds, dtype=np.uint8),
        np.array(vals, dtype=np.int32),
        np.array(offs, dtype=np.int32),
    )


def compress_near_optimal(data: bytes, level: int) -> bytes:
    p = OPT_PARAMS[level]
    n = len(data)
    w = BitWriter()
    block_start = 0
    mf_state = None
    while block_start < n or n == 0:
        block_end = min(block_start + SOFT_MAX_BLOCK_LENGTH, n)
        matches, mf_state = _collect_matches(
            data, block_start, block_end, p["depth"], p["nice"], mf_state
        )
        lit_cost, len_sym_cost, off_sym_cost = _default_costs()

        best_items = None
        for _ in range(p["passes"]):
            cl, co = _min_cost_path(
                data, block_start, block_end, matches,
                lit_cost, len_sym_cost, off_sym_cost,
            )
            kinds, vals, offs = _path_to_items(data, block_start, block_end, cl, co)
            from .emit import block_histograms

            lf, of = block_histograms(kinds, vals, offs)
            litlen_lens = package_merge_lengths(
                lf, COMPRESSOR_MAX_LITLEN_CODEWORD_LEN
            )
            off_lens = package_merge_lengths(of, 15)
            new_costs = _costs_from_lens(litlen_lens, off_lens)
            if best_items is not None and (
                np.array_equal(best_items[0], kinds)
                and np.array_equal(best_items[1], vals)
                and np.array_equal(best_items[2], offs)
            ):
                break  # converged
            best_items = (kinds, vals, offs)
            lit_cost, len_sym_cost, off_sym_cost = new_costs

        kinds, vals, offs = best_items
        flush_block(
            w, data[block_start:block_end], kinds, vals, offs,
            is_final=(block_end == n),
        )
        block_start = block_end
        if n == 0:
            break
    return w.finish()
