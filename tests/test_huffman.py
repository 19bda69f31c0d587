"""Huffman construction + decode-table tests (SURVEY.md §4.5 strategy)."""

import numpy as np
import pytest

from libdeflate_tpu.formats import deflate as df
from libdeflate_tpu.huffman import build as hb
from libdeflate_tpu.huffman import decode_table as dt


def kraft_sum(lens):
    return sum(2.0 ** -l for l in lens if l > 0)


class TestPackageMerge:
    def test_simple(self):
        freqs = np.array([10, 1, 1, 1])
        lens = hb.package_merge_lengths(freqs, 15)
        assert kraft_sum(lens) == 1.0
        assert lens[0] == 1  # most frequent gets shortest

    def test_respects_limit(self, rng):
        # Fibonacci-ish frequencies force deep trees without a limit.
        freqs = np.array([1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377])
        for limit in (4, 7, 15):
            lens = hb.package_merge_lengths(freqs, limit)
            assert lens.max() <= limit
            assert kraft_sum(lens) == 1.0

    def test_optimality_vs_unlimited_huffman(self, rng):
        # With a loose limit, package-merge must equal true Huffman cost.
        import heapq

        for _ in range(20):
            n = int(rng.integers(2, 60))
            freqs = rng.integers(0, 1000, size=n)
            if np.count_nonzero(freqs) < 2:
                continue
            lens = hb.package_merge_lengths(freqs, 15)
            # Plain Huffman via heapq for cost comparison.
            heap = [(int(f), i) for i, f in enumerate(freqs) if f > 0]
            heapq.heapify(heap)
            depth = np.zeros(n, dtype=int)
            groups = {i: [i] for _, i in heap}
            while len(heap) > 1:
                f1, i1 = heapq.heappop(heap)
                f2, i2 = heapq.heappop(heap)
                for s in groups[i1] + groups[i2]:
                    depth[s] += 1
                groups[i1] = groups[i1] + groups[i2]
                heapq.heappush(heap, (f1 + f2, i1))
            if depth.max() <= 15:
                assert int((lens * freqs).sum()) == int((depth * freqs).sum())

    def test_fewer_than_two_symbols(self):
        lens = hb.package_merge_lengths(np.zeros(30, dtype=int), 15)
        assert list(np.flatnonzero(lens)) == [0, 1]
        lens = hb.package_merge_lengths(
            np.array([0, 0, 0, 7, 0], dtype=int), 15
        )
        assert lens[3] == 1 and lens[0] == 1 and lens.sum() == 2

    def test_kraft_complete_random(self, rng):
        for _ in range(50):
            n = int(rng.integers(2, 288))
            freqs = rng.integers(0, 100, size=n)
            lens = hb.package_merge_lengths(freqs, 14)
            assert lens.max() <= 14
            if np.count_nonzero(freqs) >= 2:
                assert kraft_sum(lens) == 1.0


def decode_with_table(table, bits, table_bits):
    """Walk one codeword through a packed decode table. Returns (entry, used)."""
    entry = int(table[bits & ((1 << table_bits) - 1)])
    if entry >> 30 == dt.KIND_SUBTABLE:
        payload = (entry >> 16) & 0x3FFF
        sub_bits = (entry >> 8) & 0xFF
        entry = int(table[payload + ((bits >> table_bits) & ((1 << sub_bits) - 1))])
    return entry, entry & 0xFF


class TestDecodeTable:
    def test_static_litlen_roundtrip(self):
        table = dt.build_litlen_table(df.STATIC_LITLEN_LENS)
        assert table is not None
        codes = df.reverse_bits(
            df.canonical_codes(df.STATIC_LITLEN_LENS),
            df.STATIC_LITLEN_LENS.astype(np.uint32),
        )
        for sym in range(288):
            l = int(df.STATIC_LITLEN_LENS[sym])
            bits = int(codes[sym])  # LSB-first codeword in the low bits
            entry, used = decode_with_table(table, bits, dt.LITLEN_TABLEBITS)
            assert used == l
            kind = entry >> 30
            payload = (entry >> 16) & 0x3FFF
            if sym < 256:
                assert kind == dt.KIND_LITERAL and payload == sym
            elif sym == 256:
                assert kind == dt.KIND_EOB and payload == 0
            elif sym <= 285:
                assert kind == dt.KIND_MATCH
                assert payload == int(df.LENGTH_SLOT_BASE[sym - 257])
            else:
                assert kind == dt.KIND_EOB and payload == 1

    def test_random_codes_roundtrip(self, rng):
        for _ in range(40):
            n = int(rng.integers(2, 288))
            freqs = rng.integers(0, 50, size=n)
            freqs[rng.integers(0, n)] += 1
            freqs[rng.integers(0, n)] += 1
            lens = hb.package_merge_lengths(freqs, 15)
            full = np.zeros(288, dtype=np.int64)
            full[:n] = lens
            table = dt.build_litlen_table(full)
            assert table is not None
            codes = df.reverse_bits(
                df.canonical_codes(full), full.astype(np.uint32)
            )
            for sym in np.flatnonzero(full):
                entry, used = decode_with_table(
                    table, int(codes[sym]), dt.LITLEN_TABLEBITS
                )
                assert used == int(full[sym])

    def test_overfull_rejected(self):
        lens = np.zeros(288, dtype=int)
        lens[:5] = 2  # five 2-bit codes: overfull
        assert dt.build_litlen_table(lens) is None

    def test_incomplete_rejected_unless_special(self):
        lens = np.zeros(288, dtype=int)
        lens[0] = 2  # single 2-bit code: incomplete, not the allowed case
        assert dt.build_litlen_table(lens) is None
        lens = np.zeros(288, dtype=int)
        lens[0] = 1
        lens[1] = 2  # 1+2 bits: still incomplete
        assert dt.build_litlen_table(lens) is None

    def test_single_len1_codeword_accepted(self):
        # zlib-compat case (lib/deflate_decompress.c:803-853)
        lens = np.zeros(32, dtype=int)
        lens[7] = 1
        table = dt.build_offset_table(lens)
        assert table is not None
        for bits in (0, 1):
            entry, used = decode_with_table(table, bits, dt.OFFSET_TABLEBITS)
            assert used == 1
            assert (entry >> 16) & 0x3FFF == 7

    def test_empty_code_accepted(self):
        table = dt.build_offset_table(np.zeros(32, dtype=int))
        assert table is not None

    def test_subtables_exercised(self, rng):
        # A skewed code guarantees codewords longer than LITLEN_TABLEBITS=11.
        freqs = np.zeros(288, dtype=np.int64)
        freqs[:40] = 2 ** np.arange(40) % 100000 + 1
        freqs[0] = 1 << 40
        lens = hb.package_merge_lengths(freqs, 15)
        assert lens.max() > dt.LITLEN_TABLEBITS
        table = dt.build_litlen_table(lens)
        assert table is not None
        codes = df.reverse_bits(df.canonical_codes(lens), lens.astype(np.uint32))
        for sym in np.flatnonzero(lens):
            entry, used = decode_with_table(
                table, int(codes[sym]), dt.LITLEN_TABLEBITS
            )
            assert used == int(lens[sym]), sym
