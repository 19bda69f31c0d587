// ldtpu_native.cpp — native host codec for libdeflate_tpu.
//
// Role parity with the reference's C library core (whole-buffer DEFLATE
// compress/decompress + CRC-32/Adler-32), written from scratch in C++17 for
// this framework's host runtime: the TPU pipeline handles chunk-parallel
// device compression; this module provides speed-of-light host fallback,
// the benchmark oracle, and fast decompression until the device decoder
// catches up.
//
// Exposed via a C ABI consumed with ctypes (no pybind11 dependency).
//
// Design notes (own design, informed by the format spec RFC 1951/1950/1952):
//  * compressor: hash-chain matchfinder (hash4 order 15 + hash3 last-occ),
//    greedy (levels 1-4) and lazy (5-9) parsers, per-block dynamic/static/
//    stored cost comparison, canonical length-limited Huffman codes via
//    depth-clamped tree + Kraft fixup, precode RLE.
//  * decompressor: packed uint32 decode-table entries (its own layout,
//    documented at the Decompressor section below — the Python host decoder
//    keeps a separate, independently-documented format in
//    libdeflate_tpu/huffman/decode_table.py), one-level subtables, 64-bit
//    bit buffer.
//  * checksums: slice-by-8 CRC-32; Adler-32 with 5552-byte mod batching.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <vector>
#include <algorithm>

using u8 = uint8_t;  using u16 = uint16_t;  using u32 = uint32_t;  using u64 = uint64_t;
// The word-at-a-time bit buffer I/O (BitWriter::add, BitReader::refill_fast)
// stores/loads the u64 accumulator with memcpy and relies on little-endian
// byte order, like the reference's fast paths.
static_assert(__BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__,
              "word-at-a-time bit I/O assumes a little-endian host");
using s16 = int16_t;  using s32 = int32_t;

// ---------------------------------------------------------------------------
// checksums
// ---------------------------------------------------------------------------
// One-time tables initialize via C++ magic statics: first calls can arrive
// concurrently from several Python threads (ctypes releases the GIL), and a
// plain-bool guard would race on weakly-ordered hosts.
struct CrcTables {
    u32 t[8][256];
    CrcTables() {
        for (u32 b = 0; b < 256; b++) {
            u32 c = b;
            for (int k = 0; k < 8; k++) c = (c >> 1) ^ ((c & 1) ? 0xEDB88320u : 0);
            t[0][b] = c;
        }
        for (int k = 1; k < 8; k++)
            for (u32 b = 0; b < 256; b++)
                t[k][b] = (t[k-1][b] >> 8) ^ t[0][t[k-1][b] & 0xFF];
    }
};

static const CrcTables _crc_tabs;  // constructed at dlopen time

extern "C" u32 ld_crc32(u32 init, const u8* p, size_t n) {
    const auto& crc_table = _crc_tabs.t;
    u32 c = ~init;
    while (n >= 8) {
        c ^= (u32)p[0] | ((u32)p[1] << 8) | ((u32)p[2] << 16) | ((u32)p[3] << 24);
        u32 hi = (u32)p[4] | ((u32)p[5] << 8) | ((u32)p[6] << 16) | ((u32)p[7] << 24);
        c = crc_table[7][c & 0xFF] ^ crc_table[6][(c >> 8) & 0xFF] ^
            crc_table[5][(c >> 16) & 0xFF] ^ crc_table[4][c >> 24] ^
            crc_table[3][hi & 0xFF] ^ crc_table[2][(hi >> 8) & 0xFF] ^
            crc_table[1][(hi >> 16) & 0xFF] ^ crc_table[0][hi >> 24];
        p += 8; n -= 8;
    }
    while (n--) c = (c >> 8) ^ crc_table[0][(c ^ *p++) & 0xFF];
    return ~c;
}

extern "C" u32 ld_adler32(u32 init, const u8* p, size_t n) {
    u32 s1 = init & 0xFFFF, s2 = (init >> 16) & 0xFFFF;
    while (n) {
        size_t chunk = n < 5552 ? n : 5552;
        n -= chunk;
        while (chunk >= 4) {
            s1 += p[0]; s2 += s1; s1 += p[1]; s2 += s1;
            s1 += p[2]; s2 += s1; s1 += p[3]; s2 += s1;
            p += 4; chunk -= 4;
        }
        while (chunk--) { s1 += *p++; s2 += s1; }
        s1 %= 65521; s2 %= 65521;
    }
    return (s2 << 16) | s1;
}

// ---------------------------------------------------------------------------
// shared DEFLATE tables
// ---------------------------------------------------------------------------
static const u16 LEN_BASE[29] = {3,4,5,6,7,8,9,10,11,13,15,17,19,23,27,31,35,43,
                                 51,59,67,83,99,115,131,163,195,227,258};
static const u8  LEN_EXTRA[29] = {0,0,0,0,0,0,0,0,1,1,1,1,2,2,2,2,3,3,3,3,4,4,4,4,5,5,5,5,0};
static const u16 OFF_BASE[30] = {1,2,3,4,5,7,9,13,17,25,33,49,65,97,129,193,257,385,
                                 513,769,1025,1537,2049,3073,4097,6145,8193,12289,16385,24577};
static const u8  OFF_EXTRA[30] = {0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,6,7,7,8,8,9,9,10,10,11,11,12,12,13,13};
static const u8  PRECODE_PERM[19] = {16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15};

struct SlotTables {
    u8 len_to_slot[259];
    u8 off_slot_small[257];
    SlotTables() {
        for (int s = 0; s < 29; s++) {
            int hi = (s + 1 < 29) ? LEN_BASE[s+1] : 259;
            for (int l = LEN_BASE[s]; l < hi && l <= 258; l++) len_to_slot[l] = (u8)s;
        }
        len_to_slot[258] = 28;
        for (int s = 0; s < 30; s++) {
            int hi = (s + 1 < 30) ? OFF_BASE[s+1] : 257;
            for (int o = OFF_BASE[s]; o < hi && o <= 256; o++) off_slot_small[o] = (u8)s;
        }
    }
};

// constructed at dlopen time (single-threaded), so lookups are plain loads
static const SlotTables _slots;
static const u8 (&len_to_slot)[259] = _slots.len_to_slot;
static const u8 (&off_slot_small)[257] = _slots.off_slot_small;
static inline void slot_init() {}  // kept for call-site symmetry

static inline int bsr32(u32 x) { return 31 - __builtin_clz(x); }

static inline unsigned offset_slot(u32 off) {
    if (off <= 256) return off_slot_small[off];
    u32 o1 = off - 1;
    int k = bsr32(o1);
    return 2 * k + ((o1 >> (k - 1)) & 1);
}

// Word-at-a-time common-prefix extension (the lz_extend role,
// lib/matchfinder_common.h:178-222); `start` skips already-verified bytes.
static inline u32 lz_extend(const u8* in, size_t i, size_t j, u32 limit,
                            u32 start = 0) {
    u32 l = start;
    while (l + 8 <= limit) {
        u64 a, b;
        memcpy(&a, in + i + l, 8);
        memcpy(&b, in + j + l, 8);
        u64 x = a ^ b;
        if (x) return l + (__builtin_ctzll(x) >> 3);
        l += 8;
    }
    while (l < limit && in[i + l] == in[j + l]) l++;
    return l;
}

static inline u32 rev_bits(u32 v, unsigned n) {
    v = ((v & 0x5555) << 1) | ((v >> 1) & 0x5555);
    v = ((v & 0x3333) << 2) | ((v >> 2) & 0x3333);
    v = ((v & 0x0F0F) << 4) | ((v >> 4) & 0x0F0F);
    v = ((v & 0x00FF) << 8) | ((v >> 8) & 0x00FF);
    return v >> (16 - n);
}

// ---------------------------------------------------------------------------
// Huffman code construction (compress side)
// ---------------------------------------------------------------------------
// Two-queue O(n log n) Huffman with depth clamping + Kraft fixup (the classic
// zlib-style overflow redistribution), then canonical codeword assignment.
static void make_huffman(const u32* freq, int nsyms, int max_len,
                         u8* lens, u16* codes) {
    struct Node { u64 f; int depth; };
    std::vector<int> order;
    order.reserve(nsyms);
    for (int i = 0; i < nsyms; i++) { lens[i] = 0; if (freq[i]) order.push_back(i); }
    int n = (int)order.size();
    if (n == 0) {
        lens[0] = lens[1] = 1;
        codes[0] = 0; codes[1] = 1;
        return;
    }
    if (n == 1) {
        int s = order[0];
        lens[s] = 1; lens[s == 0 ? 1 : 0] = 1;
        // canonical below handles codes
    } else {
        std::sort(order.begin(), order.end(),
                  [&](int a, int b){ return freq[a] < freq[b] || (freq[a] == freq[b] && a < b); });
        // two-queue tree build over merged nodes; track leaf depths via parents
        int total = 2 * n - 1;
        std::vector<u64> f(total);
        std::vector<int> parent(total, -1);
        for (int i = 0; i < n; i++) f[i] = freq[order[i]];
        int leaf = 0, internal_head = n, internal_tail = n;
        auto take = [&]() {
            if (leaf < n && (internal_head >= internal_tail || f[leaf] <= f[internal_head]))
                return leaf++;
            return internal_head++;
        };
        for (int next = n; next < total; next++) {
            int a = take(), b = take();
            f[next] = f[a] + f[b];
            parent[a] = parent[b] = next;
            internal_tail = next + 1;
        }
        std::vector<int> depth(total, 0);
        for (int i = total - 2; i >= 0; i--) depth[i] = depth[parent[i]] + 1;
        // depth clamp + Kraft fixup
        int cnt[64] = {0};
        for (int i = 0; i < n; i++) cnt[std::min(depth[i], max_len)]++;
        long kraft = 0;
        for (int l = 1; l <= max_len; l++) kraft += (long)cnt[l] << (max_len - l);
        long full = 1L << max_len;
        while (kraft > full) {  // overflow: push a deepest-possible code deeper
            for (int l = max_len - 1; l >= 1; l--) {
                if (cnt[l]) { cnt[l]--; cnt[l+1]++; kraft -= 1L << (max_len - l - 1); break; }
            }
        }
        while (kraft < full) {  // underfull (from clamping): give the spare
            // codespace back by shortening a code whose promotion still fits
            bool changed = false;
            for (int l = max_len; l >= 2; l--) {
                if (cnt[l] && kraft + (1L << (max_len - l)) <= full) {
                    cnt[l]--; cnt[l-1]++; kraft += 1L << (max_len - l);
                    changed = true;
                    break;
                }
            }
            if (!changed) break;  // cannot improve further (kraft < full is valid)
        }
        // assign lengths: shortest codes to most frequent symbols
        int idx = n - 1;  // most frequent at the end of 'order'
        for (int l = 1; l <= max_len && idx >= 0; l++)
            for (int c = 0; c < cnt[l] && idx >= 0; c++)
                lens[order[idx--]] = (u8)l;
    }
    // canonical codes + bit reversal
    int bl_count[16] = {0};
    for (int i = 0; i < nsyms; i++) bl_count[lens[i]]++;
    bl_count[0] = 0;
    u32 code = 0; u32 next_code[16] = {0};
    for (int l = 1; l <= 15; l++) { code = (code + bl_count[l-1]) << 1; next_code[l] = code; }
    for (int i = 0; i < nsyms; i++) {
        if (lens[i]) codes[i] = (u16)rev_bits(next_code[lens[i]]++, lens[i]);
        else codes[i] = 0;
    }
}

// ---------------------------------------------------------------------------
// Bit writer
// ---------------------------------------------------------------------------
struct BitWriter {
    u8* out; size_t cap; size_t pos = 0;
    u64 buf = 0; unsigned cnt = 0;
    bool overflow = false;
    BitWriter(u8* o, size_t c) : out(o), cap(c) {}
    inline void add(u64 v, unsigned n) {
        // items are <= 47 bits (14+5+15+13) and cnt stays <= 7 after a
        // flush, so `v << cnt` never overflows the 64-bit buffer
        buf |= v << cnt;
        cnt += n;
        if (cnt >= 8) {
            if (pos + 8 <= cap) {
                memcpy(out + pos, &buf, 8);   // one word store, no byte loop
                pos += cnt >> 3;
                buf >>= (cnt & ~7u);
                cnt &= 7;
            } else {
                while (cnt >= 8) {
                    if (pos >= cap) { overflow = true; cnt = 0; buf = 0; return; }
                    out[pos++] = (u8)buf;
                    buf >>= 8; cnt -= 8;
                }
            }
        }
    }
    void align() { if (cnt) add(0, 8 - (cnt & 7)); }
    size_t finish() { align(); return overflow ? 0 : pos; }
    u64 bitpos() const { return 8 * pos + cnt; }
    bool put_bytes(const u8* p, size_t n) {
        if (pos + n > cap) { overflow = true; return false; }
        memcpy(out + pos, p, n); pos += n; return true;
    }
};

// ---------------------------------------------------------------------------
// Compressor
// ---------------------------------------------------------------------------
static const int HASH4_ORDER = 16, HASH3_ORDER = 15;
static const u32 HASH_MULT = 0x1E35A7BDu;

// A sequence item: `litrun` literals (read from the block data at emission
// time -- the reference's litrunlen design, lib/deflate_compress.c:165-190)
// followed by a match of `len` at `off`; len == 0 terminates the block.
struct Seq { u32 litrun; u16 len; u16 pad; u32 off; };

struct Parser {
    const u8* in; size_t n;
    // prev4 is a 32K ring (positions older than the window are dead by the
    // time their slot is reused) -- the whole matchfinder state stays cache
    // resident like the reference's 16-bit tables (lib/hc_matchfinder.h)
    std::vector<s32> head4, prev4, head3;
    // next-hash pipeline: hashes of the position the parser will probe
    // next, computed while the current probe's chain walk is in flight and
    // the head entries prefetched (the reference's next_hashes scheme,
    // lib/hc_matchfinder.h:182-227).
    u32 nh3 = 0, nh4 = 0;
    size_t nh_pos = (size_t)-1;
    Parser(const u8* p, size_t len) : in(p), n(len),
        head4(1u << HASH4_ORDER, -1), prev4(32768, -1),
        head3(1u << HASH3_ORDER, -1) {}
    inline u32 load32(size_t i) const { u32 v; memcpy(&v, in + i, 4); return v; }
    inline u32 h4(size_t i) const { return (load32(i) * HASH_MULT) >> (32 - HASH4_ORDER); }
    inline u32 h3(size_t i) const { return ((load32(i) & 0xFFFFFF) * HASH_MULT) >> (32 - HASH3_ORDER); }
    inline void pipeline(size_t nxt) {
        if (nxt + 4 <= n) {
            u32 w = load32(nxt);
            nh4 = (w * HASH_MULT) >> (32 - HASH4_ORDER);
            nh3 = ((w & 0xFFFFFF) * HASH_MULT) >> (32 - HASH3_ORDER);
            nh_pos = nxt;
            __builtin_prefetch(&head4[nh4]);
            __builtin_prefetch(&head3[nh3]);
        } else nh_pos = (size_t)-1;
    }
    inline void insert(size_t i) {
        u32 h = h4(i);
        prev4[i & 32767] = head4[h]; head4[h] = (s32)i;
        head3[h3(i)] = (s32)i;
    }
    inline u32 extend(size_t i, size_t j, u32 limit) const {
        return lz_extend(in, i, j, limit);
    }
    // best match at i, inserting i into both tables as it goes (one hash
    // computation and one head load serve both roles — the reference's
    // hc_matchfinder_longest_match does the same, lib/hc_matchfinder.h:
    // 182-227).  Callers must NOT also call insert(i).
    inline u32 longest(size_t i, u32 best_in, int depth, u32 nice, u32* off_out) {
        u32 limit = (u32)std::min<size_t>(258, n - i);
        if (limit < 3) { if (n - i >= 4) insert(i); return 0; }
        u32 best = best_in, boff = 0;
        u32 nice_c = std::min(nice, limit);
        u32 hh3, hh4;
        if (nh_pos == i) { hh3 = nh3; hh4 = nh4; }
        else { hh3 = h3(i); hh4 = h4(i); }
        u32 first4 = load32(i);
        s32 j = head3[hh3];
        head3[hh3] = (s32)i;
        s32 j4 = head4[hh4];
        prev4[i & 32767] = j4;
        head4[hh4] = (s32)i;
        // with both heads consumed, kick off the next position's hashes and
        // head prefetches before the serially dependent chain walk below
        pipeline(i + 1);
        // hash3 singleton: a length-3 candidate only, via one 3-byte
        // compare — no extension (the reference's hc_matchfinder does the
        // same, lib/hc_matchfinder.h:213-248; longer matches always have a
        // hash4 chain entry of their own)
        if (best < 3 && j >= 0 && i - (size_t)j <= 32768) {
            if ((load32((size_t)j) & 0xFFFFFF) == (first4 & 0xFFFFFF)) {
                best = 3;
                boff = (u32)(i - j);
            }
        }
        j = j4;
        // Both chain phases hoist the next-node load and prefetch its
        // match bytes before touching the current node's, so the serially
        // dependent prev4 walk overlaps the data compares (the hardware
        // analogue of the reference's chain layout that keeps node+data
        // adjacent, lib/hc_matchfinder.h:182-338).
        // single windowed-chain bound: j >= cut folds the empty (-1) and
        // out-of-window tests into one compare per node
        s32 cut = i > 32768 ? (s32)(i - 32768) : 0;
        // phase 1 (only while nothing >= 4 found): bare first-word compares
        // -- the reference's first-match loop (lib/hc_matchfinder.h:228-249)
        while (best < 4 && j >= cut && depth > 0) {
            depth--;
            s32 jn = prev4[(size_t)j & 32767];
            __builtin_prefetch(in + (size_t)(jn < 0 ? j : jn));
            if (load32((size_t)j) == first4) {
                u32 l = extend(i, j, limit);
                if (l >= 4) {
                    best = l;
                    boff = (u32)(i - j);
                    j = jn;
                    break;
                }
            }
            j = jn;
        }
        // phase 2: improve; reject most losers with one 4-byte compare
        // spanning the current best length (the reference's
        // last+first-4-bytes quick check, lib/hc_matchfinder.h:251-263).
        // The i-side spanning word only changes when best improves — keep
        // it in a register instead of reloading per node.
        if (j >= cut && depth > 0 && best < nice_c && best < limit) {
            u32 tb;
            memcpy(&tb, in + i + best - 3, 4);
            do {
                s32 jn = prev4[(size_t)j & 32767];
                __builtin_prefetch(in + (size_t)(jn < 0 ? j : jn) + best - 3);
                u32 ta;
                memcpy(&ta, in + (size_t)j + best - 3, 4);
                if (ta == tb && load32((size_t)j) == first4) {
                    u32 l = extend(i, j, limit);
                    if (l > best) {
                        best = l;
                        boff = (u32)(i - j);
                        if (!(best < nice_c && best < limit)) break;
                        memcpy(&tb, in + i + best - 3, 4);
                    }
                }
                j = jn;
                depth--;
            } while (j >= cut && depth > 0);
        }
        if (!boff || best < 3) return 0;
        *off_out = boff;
        return best;
    }
};

// ---- block-splitting statistics (role parity: lib/deflate_compress.c:2100-
//      2218: 8 literal classes + 2 match classes, checked every 512
//      observations, split when the probability-delta sum crosses 200/512
//      with short-block penalties) -------------------------------------------
struct BlockStats {
    u32 newo[10] = {0}, obs[10] = {0};
    u32 num_new = 0, num = 0;
    void reset() { for (int i=0;i<10;i++){newo[i]=0;obs[i]=0;} num_new=0; num=0; }
    inline void literal(u8 lit) { newo[((lit >> 5) & 0x6) | (lit & 1)]++; num_new++; }
    inline void match(u32 len) { newo[8 + (len >= 9)]++; num_new++; }
    void merge() {
        for (int i = 0; i < 10; i++) { obs[i] += newo[i]; newo[i] = 0; }
        num += num_new; num_new = 0;
    }
    bool should_end(size_t block_len, size_t remaining) {
        if (num_new < 512 || block_len < 5000 || remaining < 5000) return false;
        if (num > 0) {
            u64 total_delta = 0;
            for (int i = 0; i < 10; i++) {
                u64 expected = (u64)obs[i] * num_new;
                u64 actual = (u64)newo[i] * num;
                total_delta += actual > expected ? actual - expected : expected - actual;
            }
            u64 num_items = num + num_new;
            u64 cutoff = (u64)(num_new * 200 / 512) * num;
            if (block_len < 10000 && num_items < 8192)
                cutoff += cutoff * (8192 - num_items) / 8192;
            if (total_delta + (block_len / 4096) * num >= cutoff)
                return true;
        }
        merge();
        return false;
    }
};

// ---- adaptive minimum match length (policy parity: choose_min_match_len /
//      calculate_min_match_len, lib/deflate_compress.c:2295-2378) ------------
static u32 choose_min_len(u32 used, u32 depth) {
    u32 m = used <= 5 ? 9 : used <= 7 ? 8 : used <= 9 ? 7
          : used <= 15 ? 6 : used <= 44 ? 5 : used <= 79 ? 4 : 3;
    if (depth < 5) m = std::min(m, 4u);
    else if (depth < 10) m = std::min(m, 5u);
    else if (depth < 16) m = std::min(m, 7u);
    return m;
}

static u32 initial_min_len(const u8* p, size_t n, u32 depth) {
    if (n < 512) return 3;
    bool used[256] = {false};
    size_t lim = std::min<size_t>(n, 4096);
    for (size_t i = 0; i < lim; i++) used[p[i]] = true;
    u32 cnt = 0;
    for (int i = 0; i < 256; i++) cnt += used[i];
    return choose_min_len(cnt, depth);
}

static u32 recalc_min_len(const u32* litlen_freq, u32 depth) {
    u32 total = 0;
    for (int i = 0; i < 256; i++) total += litlen_freq[i];
    u32 cutoff = total >> 10;
    u32 cnt = 0;
    for (int i = 0; i < 256; i++) if (litlen_freq[i] > cutoff) cnt++;
    return choose_min_len(cnt, depth);
}

struct LevelCfg { int kind; int depth; u32 nice; u32 min_len; };
// kind: 0 greedy, 1 lazy, 2 lazy2(treated as lazy with deeper search)
static LevelCfg level_cfg(int level) {
    switch (level) {
        case 1:  return {0, 2, 32, 4};
        case 2:  return {0, 6, 10, 3};
        case 3:  return {0, 12, 14, 3};
        case 4:  return {0, 16, 30, 3};
        case 5:  return {1, 16, 30, 3};
        case 6:  return {1, 35, 65, 3};
        case 7:  return {1, 100, 130, 3};
        case 8:  return {2, 300, 258, 3};
        case 9:  return {2, 600, 258, 3};
        case 10: return {2, 300, 258, 3};  // host fallback for 10-12
        case 11: return {2, 500, 258, 3};
        default: return {2, 800, 258, 3};
    }
}

// RFC 1951 static litlen/offset codes, built once (shared by the compressor's
// static-block path; the decompressor builds its packed decode tables
// separately)
struct StaticCodes {
    u8 ll_lens[288]; u16 ll_codes[288];
    u8 of_lens[32];  u16 of_codes[32];
    StaticCodes() {
        for (int i = 0; i < 288; i++) ll_lens[i] = (i < 144) ? 8 : (i < 256) ? 9 : (i < 280) ? 7 : 8;
        for (int i = 0; i < 32; i++) of_lens[i] = 5;
        int bl[16] = {0}; for (int i = 0; i < 288; i++) bl[ll_lens[i]]++;
        u32 code = 0, nc[16] = {0};
        for (int l = 1; l <= 15; l++) { code = (code + bl[l-1]) << 1; nc[l] = code; }
        for (int i = 0; i < 288; i++) ll_codes[i] = (u16)rev_bits(nc[ll_lens[i]]++, ll_lens[i]);
        for (int i = 0; i < 32; i++) of_codes[i] = (u16)rev_bits(i, 5);
    }
};

// ---- block flush -----------------------------------------------------------
struct Freqs { u32 litlen[288] = {0}; u32 off[32] = {0}; };

static void flush_block(BitWriter& bw, const u8* block_data, size_t block_len,
                        const std::vector<Seq>& seqs, Freqs& f,
                        bool is_final) {
    slot_init();
    f.litlen[256]++;
    // extra-bit totals fall out of the slot freqs (extras are fixed per
    // slot) — parsers don't need to accumulate them item by item
    u64 len_extra_bits = 0, off_extra_bits = 0;
    for (int i = 0; i < 29; i++)
        len_extra_bits += (u64)f.litlen[257 + i] * LEN_EXTRA[i];
    for (int i = 0; i < 30; i++)
        off_extra_bits += (u64)f.off[i] * OFF_EXTRA[i];

    u8 ll_lens[288]; u16 ll_codes[288];
    u8 of_lens[32];  u16 of_codes[32];
    make_huffman(f.litlen, 288, 14, ll_lens, ll_codes);
    make_huffman(f.off, 32, 15, of_lens, of_codes);

    // body costs
    u64 dyn_body = len_extra_bits + off_extra_bits, st_body = dyn_body;
    for (int i = 0; i < 288; i++) {
        unsigned sl = (i < 144) ? 8 : (i < 256) ? 9 : (i < 280) ? 7 : 8;
        dyn_body += (u64)f.litlen[i] * ll_lens[i];
        st_body  += (u64)f.litlen[i] * sl;
    }
    for (int i = 0; i < 32; i++) {
        dyn_body += (u64)f.off[i] * of_lens[i];
        st_body  += (u64)f.off[i] * 5;
    }

    // precode over trimmed lens
    int num_ll = 288; while (num_ll > 257 && !ll_lens[num_ll - 1]) num_ll--;
    int num_of = 32;  while (num_of > 1 && !of_lens[num_of - 1]) num_of--;
    u8 all[320]; int tot = 0;
    for (int i = 0; i < num_ll; i++) all[tot++] = ll_lens[i];
    for (int i = 0; i < num_of; i++) all[tot++] = of_lens[i];
    // RLE
    struct PreItem { u8 sym; u8 xbits; u8 xval; };
    std::vector<PreItem> pre;
    u32 pf[19] = {0};
    for (int i = 0; i < tot; ) {
        u8 v = all[i]; int run = 1;
        while (i + run < tot && all[i + run] == v) run++;
        if (v == 0) {
            int r = run;
            while (r >= 11) { int t = std::min(r, 138); pre.push_back({18, 7, (u8)(t - 11)}); pf[18]++; r -= t; }
            if (r >= 3) { pre.push_back({17, 3, (u8)(r - 3)}); pf[17]++; r = 0; }
            while (r--) { pre.push_back({0, 0, 0}); pf[0]++; }
        } else {
            pre.push_back({v, 0, 0}); pf[v]++;
            int r = run - 1;
            while (r >= 3) { int t = std::min(r, 6); pre.push_back({16, 2, (u8)(t - 3)}); pf[16]++; r -= t; }
            while (r--) { pre.push_back({v, 0, 0}); pf[v]++; }
        }
        i += run;
    }
    u8 p_lens[19]; u16 p_codes[19];
    make_huffman(pf, 19, 7, p_lens, p_codes);
    int num_explicit = 19;
    while (num_explicit > 4 && !p_lens[PRECODE_PERM[num_explicit - 1]]) num_explicit--;

    u64 dyn_hdr = 5 + 5 + 4 + 3ull * num_explicit;
    for (const PreItem& it : pre) dyn_hdr += p_lens[it.sym] + it.xbits;

    u64 dyn_cost = 3 + dyn_hdr + dyn_body;
    u64 st_cost = 3 + st_body;
    size_t nseg = block_len ? (block_len + 65534) / 65535 : 1;
    u64 sd_cost = 3 + ((8 - ((bw.bitpos() + 3) & 7)) & 7) + 32 + 40 * (nseg - 1) + 8 * block_len;

    if (sd_cost <= st_cost && sd_cost <= dyn_cost) {
        size_t pos = 0; bool first = true;
        while (first || pos < block_len) {
            first = false;
            size_t seg = std::min<size_t>(block_len - pos, 65535);
            bool fin = is_final && (pos + seg == block_len);
            bw.add(fin ? 1 : 0, 1); bw.add(0, 2); bw.align();
            u8 hdr[4] = {(u8)seg, (u8)(seg >> 8), (u8)~(u8)seg, (u8)~(u8)(seg >> 8)};
            if (!bw.put_bytes(hdr, 4)) return;
            if (!bw.put_bytes(block_data + pos, seg)) return;
            pos += seg;
        }
        return;
    }

    const u8* use_ll_lens; const u16* use_ll_codes;
    const u8* use_of_lens; const u16* use_of_codes;
    static const StaticCodes s_codes;  // magic static: thread-safe init

    if (st_cost <= dyn_cost) {
        bw.add(is_final ? 1 : 0, 1); bw.add(1, 2);
        use_ll_lens = s_codes.ll_lens; use_ll_codes = s_codes.ll_codes;
        use_of_lens = s_codes.of_lens; use_of_codes = s_codes.of_codes;
    } else {
        bw.add(is_final ? 1 : 0, 1); bw.add(2, 2);
        bw.add(num_ll - 257, 5); bw.add(num_of - 1, 5); bw.add(num_explicit - 4, 4);
        for (int i = 0; i < num_explicit; i++) bw.add(p_lens[PRECODE_PERM[i]], 3);
        for (const PreItem& it : pre) {
            bw.add(p_codes[it.sym], p_lens[it.sym]);
            if (it.xbits) bw.add(it.xval, it.xbits);
        }
        use_ll_lens = ll_lens; use_ll_codes = ll_codes;
        use_of_lens = of_lens; use_of_codes = of_codes;
    }

    // Emit with all bitstream state in locals — a struct-resident writer
    // costs a load+store per field per item through the reference, the
    // exact aliasing problem the reference solves the same way
    // (lib/deflate_compress.c:1713-1727).  The litlen length cap of 14
    // bits makes 4 literals per flush safe: 4*14 + 7 carry <= 63.
    u64 lbuf = bw.buf; unsigned lcnt = bw.cnt;
    u8* const outb = bw.out;
    u8* wp = outb + bw.pos;
    u8* const wend = outb + bw.cap;
    bool ovf = bw.overflow;
#define LFLUSH() do { \
        if (wp + 8 <= wend) { \
            memcpy(wp, &lbuf, 8); \
            wp += lcnt >> 3; lbuf >>= (lcnt & ~7u); lcnt &= 7; \
        } else ovf = true; \
    } while (0)
    const u8* p = block_data;
    for (const Seq& s : seqs) {
        if (ovf) break;
        const u8* q = p;
        u32 run = s.litrun;
        while (run >= 4 && !ovf) {
            lbuf |= (u64)use_ll_codes[q[0]] << lcnt; lcnt += use_ll_lens[q[0]];
            lbuf |= (u64)use_ll_codes[q[1]] << lcnt; lcnt += use_ll_lens[q[1]];
            lbuf |= (u64)use_ll_codes[q[2]] << lcnt; lcnt += use_ll_lens[q[2]];
            lbuf |= (u64)use_ll_codes[q[3]] << lcnt; lcnt += use_ll_lens[q[3]];
            LFLUSH();
            q += 4; run -= 4;
        }
        while (run && !ovf) {
            lbuf |= (u64)use_ll_codes[*q] << lcnt; lcnt += use_ll_lens[*q];
            LFLUSH();
            q++; run--;
        }
        p += s.litrun;
        if (!s.len) break;
        unsigned ls = len_to_slot[s.len];
        unsigned sym = 257 + ls;
        u64 v = use_ll_codes[sym];
        unsigned nb = use_ll_lens[sym];
        v |= (u64)(s.len - LEN_BASE[ls]) << nb; nb += LEN_EXTRA[ls];
        unsigned os = offset_slot(s.off);
        v |= (u64)use_of_codes[os] << nb; nb += use_of_lens[os];
        v |= (u64)(s.off - OFF_BASE[os]) << nb; nb += OFF_EXTRA[os];
        lbuf |= v << lcnt; lcnt += nb;            // <= 47 + 7 bits
        LFLUSH();
        p += s.len;
    }
    if (!ovf) {
        lbuf |= (u64)use_ll_codes[256] << lcnt; lcnt += use_ll_lens[256];
        LFLUSH();
    }
#undef LFLUSH
    if (ovf) { bw.overflow = true; return; }
    bw.buf = lbuf; bw.cnt = lcnt; bw.pos = wp - outb;
}

// ---------------------------------------------------------------------------
// Near-optimal parse (levels 10-12): match cache + iterated min-cost DP
// (role parity: deflate_compress_near_optimal, lib/deflate_compress.c:3592-
//  3849; own implementation over the hash-chain matchfinder).
// ---------------------------------------------------------------------------
struct OptCfg { int depth; u32 nice; int passes; };
#ifndef OPT_SOFT_MAX
#define OPT_SOFT_MAX 300000
#endif
#ifndef OPT12_DEPTH
#define OPT12_DEPTH 300
#endif
#ifndef OPT12_PASSES
#define OPT12_PASSES 10
#endif
static OptCfg opt_cfg(int level) {
    if (level == 10) return {35, 75, 2};
    if (level == 11) return {100, 150, 4};
    return {OPT12_DEPTH, 258, OPT12_PASSES};
}

// ---------------------------------------------------------------------------
// Binary-tree matchfinder for the near-optimal levels (role parity with the
// reference's bt_matchfinder, lib/bt_matchfinder.h:140-262: hash4 indexes a
// lexicographically-sorted binary tree of previous positions; one downward
// traversal simultaneously searches, re-roots the tree at the new position,
// and reports matches of strictly increasing length, each with the nearest
// offset seen for that length).  Children are always older than parents, so
// an out-of-window node prunes its whole subtree.
// ---------------------------------------------------------------------------
struct BTMF {
    static const int HB = 16;  // order-16 hash4, like the reference
    const u8* in; size_t n;
    size_t base = 0;  // window base; all table entries are relative to it
    // 16-bit window-relative positions with saturating rebase: the whole
    // matchfinder state (head4 128K + child 128K + head3 64K) stays cache
    // resident, like the reference's mf_pos_t design
    // (lib/matchfinder_common.h:119-158, lib/bt_matchfinder.h:88-101)
    std::vector<s16> head4, head3, child;  // child[2*(pos & 32767)] = {l, r}
    BTMF(const u8* p, size_t len) : in(p), n(len),
        head4(1u << HB, -32768), head3(2u << HASH3_ORDER, -32768),
        child(2u << 15, -32768) {}
    inline u32 load32(size_t i) const { u32 v; memcpy(&v, in + i, 4); return v; }
    inline u32 h4(size_t i) const { return (load32(i) * HASH_MULT) >> (32 - HB); }
    inline u32 h3(size_t i) const { return ((load32(i) & 0xFFFFFF) * HASH_MULT) >> (32 - HASH3_ORDER); }
    inline u32 ext(size_t i, size_t j, u32 limit) const {
        return lz_extend(in, i, j, limit);
    }
    void slide() {
        auto sub = [](std::vector<s16>& v) {
            for (auto& x : v) x = (s16)std::max(-32768, (int)x - 32768);
        };
        sub(head4); sub(head3); sub(child);
        base += 32768;
    }
    // nearest (and second-nearest) len-3 candidate probe + insert
    inline u32 probe3(size_t i, u32 limit, u32* off_out) {
        if (i - base >= 32768) slide();
        s32 rel = (s32)(i - base);
        u32 h = h3(i);
        s32 j = head3[2 * h], jb = head3[2 * h + 1];
        head3[2 * h + 1] = (s16)j;
        head3[2 * h] = (s16)rel;
        for (s32 c : {j, jb}) {
            if (c <= rel - 32768) continue;
            size_t ja = (size_t)((std::ptrdiff_t)base + c);
            u32 l = ext(i, ja, limit);
            if (l >= 3) { *off_out = (u32)(i - ja); return l; }
        }
        return 0;
    }
    // insert position i and report matches of strictly increasing length;
    // requires limit >= 4.  Caller must have called probe3 (or otherwise
    // ensured the window has slid) for this position first.
    template <class Sink>
    inline u32 advance(size_t i, int depth, u32 nice, u32 limit, Sink&& sink) {
        if (i - base >= 32768) slide();
        s32 rel = (s32)(i - base);
        u32 h = h4(i);
        s32 j = head4[h];
        head4[h] = (s16)rel;
        s16* pl = &child[2 * (rel & 32767)];
        s16* pr = pl + 1;
        u32 llen = 0, rlen = 0, best = 3;
        for (;;) {
            if (j <= rel - 32768 || depth-- <= 0) {
                *pl = -32768; *pr = -32768;
                break;
            }
            size_t ja = (size_t)((std::ptrdiff_t)base + j);
            u32 l = std::min(llen, rlen);
            u32 cl = l + ext(i + l, ja + l, limit - l);
            if (cl > best) { sink(cl, (u32)(i - ja)); best = cl; }
            s16* jc = &child[2 * ((u32)j & 32767)];
            if (cl >= nice || cl >= limit) {
                // full-depth or long-enough match: adopt j's subtrees
                *pl = jc[0];
                *pr = jc[1];
                break;
            }
            if (in[ja + cl] < in[i + cl]) {
                *pl = (s16)j; pl = jc + 1;
                j = jc[1];
                llen = cl;
            } else {
                *pr = (s16)j; pr = jc;
                j = jc[0];
                rlen = cl;
            }
        }
        return best;
    }
};

static const int BIT_COST = 16;
#ifndef MW_TEMPER
#define MW_TEMPER 8
#endif

static size_t compress_near_optimal(int level, const u8* in, size_t n,
                                    u8* out, size_t out_avail) {
    OptCfg oc = opt_cfg(level);
    BitWriter bw(out, out_avail);
    const size_t SOFT_MAX = OPT_SOFT_MAX;
    BTMF bt(in, n);
    size_t end_matchable = n >= 4 ? n - 3 : 0;

    struct CM { u16 len; u16 pad; u32 off; };
    std::vector<u32> mstart;     // per position: index into mlist
    std::vector<CM> mlist;
    std::vector<u64> cost;       // DP cost array (block-sized + 1)
    std::vector<u16> choice_len;
    std::vector<u32> choice_off;

    size_t block_start = 0;
    std::vector<Seq> seqs;
    BlockStats stats;
    // previous block's final code lengths, blended into the next block's
    // seed costs (the reference mixes previous-block costs by a similarity
    // heuristic, lib/deflate_compress.c:3207-3296)
    u8 prev_ll[288] = {0}, prev_ofl[32] = {0};
    bool have_prev = false;
    while (block_start < n) {
        size_t max_block_end =
            (n - block_start < SOFT_MAX + 5000) ? n : block_start + SOFT_MAX;
        size_t block_end = max_block_end;
        size_t blen = block_end - block_start;
        stats.reset();

        // --- collect all matches per position (with online split check) ---
        mstart.assign(blen + 1, 0);
        mlist.clear();
        // Observe the item stream, not the position stream: a match
        // suppresses further observations for the bytes it covers
        // (lib/deflate_compress.c:3693-3704) — observing every overlapping
        // candidate inflates correlated deltas and splits blocks ~5x too
        // often.
        size_t next_observation = block_start;
        for (size_t i = block_start; i < block_end; ) {
            mstart[i - block_start] = (u32)mlist.size();
            u32 best_here = 0;
            if (i < end_matchable) {
                u32 limit = (u32)std::min<size_t>(258, n - i);
                u32 best = 2;
                // 2-way hash3 bucket, like the reference's bt_matchfinder
                u32 off3 = 0;
                u32 l3 = bt.probe3(i, limit, &off3);
                if (l3 >= 3) {
                    mlist.push_back({(u16)l3, 0, off3});
                    best = l3;
                }
                u32 nice_c = std::min(oc.nice, limit);
                bt.advance(i, oc.depth, nice_c, limit, [&](u32 l, u32 off) {
                    if (l > best) { mlist.push_back({(u16)l, 0, off}); best = l; }
                });
                best_here = best;
            }
            // split-stat observation (reference observes during collection)
            if (i >= next_observation) {
                if (best_here >= 4) {
                    stats.match(best_here);
                    next_observation = i + best_here;
                } else {
                    stats.literal(in[i]);
                    next_observation = i + 1;
                }
            }
            // skip match collection inside very long matches (the reference
            // does the same; positions are still inserted so the tree keeps
            // its history, just without recording)
            if (best_here >= oc.nice && best_here >= 16) {
                size_t stop = std::min(i + best_here, std::min(block_end, end_matchable));
                for (size_t p2 = i + 1; p2 < stop; p2++) {
                    mstart[p2 - block_start] = (u32)mlist.size();
                    u32 limit2 = (u32)std::min<size_t>(258, n - p2);
                    u32 off3 = 0;
                    bt.probe3(p2, limit2, &off3);
                    bt.advance(p2, oc.depth, std::min(oc.nice, limit2), limit2,
                               [](u32, u32) {});
                }
                i = stop;
            } else {
                i++;
            }
            // end the block early at a detected statistics change point
            if (stats.should_end(i - block_start, n - i)) {
                block_end = i;
                blen = block_end - block_start;
                mstart.resize(blen + 1);
                break;
            }
        }
        mstart[blen] = (u32)mlist.size();

        // --- iterated min-cost DP ---
        // Initial literal costs come from the block's actual byte entropy
        // (the reference seeds data-driven literal costs,
        // lib/deflate_compress.c:2986-3102; with the whole block in hand we
        // can use the measured distribution directly).  Skewed literal
        // distributions otherwise make the flat-cost first pass prefer
        // marginal matches whose statistics the later passes lock in.
        u32 lit_cost[256], len_sym_cost[29], off_sym_cost[30];
        {
            // Blend measured entropy with the flat default weighted by how
            // much of the block matches cover: matches consume literal
            // occurrences, flattening the distribution the final code sees
            // (the reference's table is parameterized the same way, by
            // match probability: lib/deflate_compress.c:2986-3102).
            u32 bh[256] = {0};
            for (size_t i2 = 0; i2 < blen; i2++) bh[in[block_start + i2]]++;
            u64 mw = MW_TEMPER;
            for (int c = 0; c < 256; c++) {
                double p = (bh[c] + 0.5) / (double)(blen + 128);
                int ent = (int)(-std::log2(p) * BIT_COST + 0.5);
                ent = std::min(std::max(ent, BIT_COST), 14 * BIT_COST);
                u32 seed = (u32)((ent * (16 - mw) + 13 * BIT_COST * mw) / 16);
                if (have_prev) {
                    u32 pc = (prev_ll[c] ? prev_ll[c] : 13) * BIT_COST;
                    seed = (seed + pc) / 2;
                }
                lit_cost[c] = seed;
            }
        }
        for (int i2 = 0; i2 < 29; i2++)
            len_sym_cost[i2] = have_prev && prev_ll[257 + i2]
                                   ? ((prev_ll[257 + i2] + 13) * BIT_COST) / 2
                                   : 13 * BIT_COST;
        for (int i2 = 0; i2 < 30; i2++)
            off_sym_cost[i2] = have_prev && prev_ofl[i2]
                                   ? ((prev_ofl[i2] + 10) * BIT_COST) / 2
                                   : 10 * BIT_COST;

        cost.assign(blen + 1, 0);
        choice_len.assign(blen + 1, 1);
        choice_off.assign(blen + 1, 0);
        u64 prev_path_cost = ~0ull;
        for (int pass = 0; pass < oc.passes; pass++) {
            u32 len_cost_tab[259];
            for (int L = 3; L <= 258; L++) {
                unsigned s = len_to_slot[L];
                len_cost_tab[L] = len_sym_cost[s] + LEN_EXTRA[s] * BIT_COST;
            }
            for (size_t pos = blen; pos-- > 0; ) {
                u64 best = lit_cost[in[block_start + pos]] + cost[pos + 1];
                u16 bl = 1; u32 bo = 0;
                u32 prevlen = 2;
                for (u32 mi = mstart[pos]; mi < mstart[pos + 1]; mi++) {
                    u32 mlen = mlist[mi].len, moff = mlist[mi].off;
                    unsigned os = offset_slot(moff);
                    u64 ocst = off_sym_cost[os] + (u64)OFF_EXTRA[os] * BIT_COST;
                    u32 maxL = (u32)std::min<size_t>(mlen, blen - pos);
                    for (u32 L = prevlen + 1; L <= maxL; L++) {
                        u64 c = ocst + len_cost_tab[L] + cost[pos + L];
                        if (c < best) { best = c; bl = (u16)L; bo = moff; }
                    }
                    prevlen = mlen;
                }
                cost[pos] = best;
                choice_len[pos] = bl;
                choice_off[pos] = bo;
            }
            if (pass + 1 == oc.passes) break;
            if (cost[0] + 32 * BIT_COST >= prev_path_cost) break;  // converged
            prev_path_cost = cost[0];
            // derive real code lengths from the chosen path, refresh costs
            Freqs f;
            for (size_t pos = 0; pos < blen; ) {
                if (choice_off[pos] == 0 || choice_len[pos] <= 1) {
                    f.litlen[in[block_start + pos]]++;
                    pos++;
                } else {
                    f.litlen[257 + len_to_slot[choice_len[pos]]]++;
                    f.off[offset_slot(choice_off[pos])]++;
                    pos += choice_len[pos];
                }
            }
            f.litlen[256]++;
            u8 ll[288]; u16 llc[288]; u8 ofl[32]; u16 ofc[32];
            make_huffman(f.litlen, 288, 14, ll, llc);
            make_huffman(f.off, 32, 15, ofl, ofc);
            for (int i2 = 0; i2 < 256; i2++) lit_cost[i2] = (ll[i2] ? ll[i2] : 13) * BIT_COST;
            for (int i2 = 0; i2 < 29; i2++) len_sym_cost[i2] = (ll[257+i2] ? ll[257+i2] : 13) * BIT_COST;
            for (int i2 = 0; i2 < 30; i2++) off_sym_cost[i2] = (ofl[i2] ? ofl[i2] : 10) * BIT_COST;
        }

        // --- all-literals alternative ---
        // The reference evaluates this block shape explicitly
        // (lib/deflate_compress.c:3437-3466): on literal-heavy blocks a
        // pure-Huffman block beats the matchy min-cost path because dropping
        // the length/offset symbols sharpens the literal code.
        {
            Freqs fp;
            u64 extra_bits = 0;
            for (size_t pos = 0; pos < blen; ) {
                if (choice_off[pos] == 0 || choice_len[pos] <= 1) {
                    fp.litlen[in[block_start + pos]]++;
                    pos++;
                } else {
                    unsigned ls = len_to_slot[choice_len[pos]];
                    unsigned os = offset_slot(choice_off[pos]);
                    fp.litlen[257 + ls]++;
                    fp.off[os]++;
                    extra_bits += LEN_EXTRA[ls] + OFF_EXTRA[os];
                    pos += choice_len[pos];
                }
            }
            fp.litlen[256]++;
            u8 ll[288]; u16 llc[288]; u8 ofl[32]; u16 ofc[32];
            make_huffman(fp.litlen, 288, 14, ll, llc);
            make_huffman(fp.off, 32, 15, ofl, ofc);
            u64 path_bits = extra_bits;
            for (int s = 0; s < 288; s++) path_bits += (u64)fp.litlen[s] * ll[s];
            for (int s = 0; s < 32; s++) path_bits += (u64)fp.off[s] * ofl[s];
            Freqs fl;
            for (size_t i2 = 0; i2 < blen; i2++) fl.litlen[in[block_start + i2]]++;
            fl.litlen[256]++;
            u8 l2[288]; u16 c2[288];
            make_huffman(fl.litlen, 288, 14, l2, c2);
            u64 lit_bits = 0;
            for (int s = 0; s < 288; s++) lit_bits += (u64)fl.litlen[s] * l2[s];
            if (lit_bits < path_bits) {
                for (size_t pos = 0; pos < blen; pos++) {
                    choice_len[pos] = 1;
                    choice_off[pos] = 0;
                }
                memcpy(prev_ll, l2, sizeof(prev_ll));
                memset(prev_ofl, 0, sizeof(prev_ofl));
            } else {
                memcpy(prev_ll, ll, sizeof(prev_ll));
                memcpy(prev_ofl, ofl, sizeof(prev_ofl));
            }
            have_prev = true;
        }

        // --- path -> seqs, flush ---
        seqs.clear();
        Freqs fq;
        u32 lrun = 0;
        for (size_t pos = 0; pos < blen; ) {
            if (choice_off[pos] == 0 || choice_len[pos] <= 1) {
                fq.litlen[in[block_start + pos]]++;
                lrun++;
                pos++;
            } else {
                u16 L = choice_len[pos];
                unsigned ls = len_to_slot[L];
                unsigned os = offset_slot(choice_off[pos]);
                fq.litlen[257 + ls]++; fq.off[os]++;
                seqs.push_back({lrun, L, 0, choice_off[pos]});
                lrun = 0;
                pos += L;
            }
        }
        seqs.push_back({lrun, 0, 0, 0});
        if (getenv("LDTPU_DEBUG_BLOCKS"))
            fprintf(stderr, "block %zu..%zu (%zu)\n", block_start, block_end, blen);
        flush_block(bw, in + block_start, blen, seqs, fq, block_end == n);
        if (bw.overflow) return 0;
        block_start = block_end;
    }
    return bw.finish();
}

// Level-1 fast path: 2-entry-bucket hash table with combined insert+probe,
// greedy parse, fixed 65535-byte soft blocks, no block splitting and no
// hash3/chains (role parity: deflate_compress_fastest + ht_matchfinder,
// lib/deflate_compress.c:2451-2523, lib/ht_matchfinder.h:77-232).
static size_t compress_fastest(const u8* in, size_t n, u8* out,
                               size_t out_avail) {
    BitWriter bw(out, out_avail);
    const int ORDER = 15;
    const u32 NICE = 32;
    // 2-entry buckets of 16-bit window-relative positions (128 KiB, cache
    // resident) with saturating rebase every 32 KiB -- the reference's
    // ht_matchfinder layout (lib/ht_matchfinder.h:57-60,
    // lib/matchfinder_common.h:119-158)
    std::vector<s16> tab(2u << ORDER, -32768);
    size_t mf_base = 0;
    auto slide = [&]() {
        // saturating rebase in a form gcc autovectorizes (the int-widened
        // std::max form compiles to a scalar loop: 64K entries per slide,
        // 32 slides/MiB — measured ~2-18% of L1 time)
        s16* p = tab.data();
        for (size_t k = 0; k < tab.size(); k++) {
            int t = (int)p[k] - 32768;
            p[k] = (s16)(t < -32768 ? -32768 : t);
        }
        mf_base += 32768;
    };
    const size_t SOFT = 65535, SEQ_SOFT = 8192;
    // 5-byte tail margin, not 4: the pipelined next-position hash loads 4
    // bytes at in_next+1 (same contract as the reference's
    // HT_MATCHFINDER_REQUIRED_NBYTES=5, lib/ht_matchfinder.h:23-29)
    size_t end_matchable = n >= 5 ? n - 4 : 0;
    std::vector<Seq> seqs;
    seqs.reserve(SEQ_SOFT + 16);
    size_t in_next = 0;
    Freqs f;
    u32 litrun = 0;

    auto load32 = [&](size_t i) { u32 v; memcpy(&v, in + i, 4); return v; };
    auto extend = [&](size_t i, size_t j, u32 limit) -> u32 {
        return lz_extend(in, i, j, limit, 4);  // first 4 bytes pre-verified
    };

    while (in_next < n && !bw.overflow) {
        size_t block_begin = in_next;
        size_t block_end = std::min(n, in_next + SOFT);
        seqs.clear();
        u32 next_hash = in_next < end_matchable
            ? (load32(in_next) * HASH_MULT) >> (32 - ORDER) : 0;
        while (in_next < block_end && seqs.size() < SEQ_SOFT) {
            if (in_next >= end_matchable) {
                f.litlen[in[in_next]]++;
                litrun++;
                in_next++;
                continue;
            }
            if (in_next - mf_base >= 32768) slide();
            s32 rel = (s32)(in_next - mf_base);
            u32 w = load32(in_next);
            // hash pipelining: position i+1's hash is computed (and its
            // bucket prefetched) before probing position i's bucket, hiding
            // the table-load latency (the reference's next_hash scheme,
            // lib/ht_matchfinder.h:114-119)
            u32 h = next_hash;
            next_hash = (load32(in_next + 1) * HASH_MULT) >> (32 - ORDER);
            __builtin_prefetch(&tab[2 * next_hash], 1);
            s32 c1 = tab[2 * h], c2 = tab[2 * h + 1];
            tab[2 * h + 1] = (s16)c1;
            tab[2 * h] = (s16)rel;
            u32 best = 0, boff = 0;
            u32 limit = (u32)std::min<size_t>(258, n - in_next);
            s32 cut = rel - 32768;
            // hand-unrolled 2-entry probe (control flow mirrors
            // lib/ht_matchfinder.h:135-170): most positions exit on the
            // first cutoff or first-word mismatch
            if (c1 > cut) {
                size_t j1 = (size_t)((std::ptrdiff_t)mf_base + c1);
                u32 w1; memcpy(&w1, in + j1, 4);
                if (w1 == w) {
                    best = extend(in_next, j1, limit);
                    boff = (u32)(in_next - j1);
                    // best < limit also bounds the 4-byte quick-check load
                    // at in_next + best - 3 within the input buffer
                    if (best < NICE && best < limit && c2 > cut) {
                        size_t j2 = (size_t)((std::ptrdiff_t)mf_base + c2);
                        u32 qa, qb;
                        memcpy(&qa, in + j2 + best - 3, 4);
                        memcpy(&qb, in + in_next + best - 3, 4);
                        u32 w2; memcpy(&w2, in + j2, 4);
                        if (qa == qb && w2 == w) {
                            u32 l = extend(in_next, j2, limit);
                            if (l > best) { best = l; boff = (u32)(in_next - j2); }
                        }
                    }
                } else if (c2 > cut) {
                    size_t j2 = (size_t)((std::ptrdiff_t)mf_base + c2);
                    u32 w2; memcpy(&w2, in + j2, 4);
                    if (w2 == w) {
                        best = extend(in_next, j2, limit);
                        boff = (u32)(in_next - j2);
                    }
                }
            }
            if (best >= 4) {
                unsigned ls = len_to_slot[best];
                unsigned os = offset_slot(boff);
                f.litlen[257 + ls]++; f.off[os]++;
                seqs.push_back({litrun, (u16)best, 0, boff});
                litrun = 0;
                size_t stop = std::min(in_next + best, end_matchable);
                for (size_t p = in_next + 1; p < stop; p++) {
                    if (p - mf_base >= 32768) slide();
                    u32 hp = next_hash;
                    next_hash = (load32(p + 1) * HASH_MULT) >> (32 - ORDER);
                    tab[2 * hp + 1] = tab[2 * hp];
                    tab[2 * hp] = (s16)(p - mf_base);
                }
                in_next += best;
                if (stop < in_next && in_next < end_matchable)
                    next_hash = (load32(in_next) * HASH_MULT) >> (32 - ORDER);
            } else {
                f.litlen[in[in_next]]++;
                litrun++;
                in_next++;
            }
        }
        seqs.push_back({litrun, 0, 0, 0});
        litrun = 0;
        flush_block(bw, in + block_begin, in_next - block_begin, seqs, f,
                    in_next == n);
        f = Freqs();
    }
    return bw.finish();
}

extern "C" size_t ld_deflate_compress(int level, const u8* in, size_t n,
                                      u8* out, size_t out_avail) {
    slot_init();
    if (level < 0 || level > 12) return 0;
    size_t max_pass = (level == 0) ? SIZE_MAX : (size_t)std::max(55 - level * 4, 0);
    BitWriter bw(out, out_avail);
    if (n <= max_pass) {
        // stored only
        size_t pos = 0; bool first = true;
        while (first || pos < n) {
            first = false;
            size_t seg = std::min<size_t>(n - pos, 65535);
            bool fin = (pos + seg == n);
            bw.add(fin ? 1 : 0, 1); bw.add(0, 2); bw.align();
            u8 hdr[4] = {(u8)seg, (u8)(seg >> 8), (u8)~(u8)seg, (u8)~(u8)(seg >> 8)};
            if (!bw.put_bytes(hdr, 4)) return 0;
            if (!bw.put_bytes(in + pos, seg)) return 0;
            pos += seg;
        }
        return bw.finish();
    }
    if (level >= 10) return compress_near_optimal(level, in, n, out, out_avail);
    if (level == 1) return compress_fastest(in, n, out, out_avail);

    LevelCfg cfg = level_cfg(level);
    Parser P(in, n);
    std::vector<Seq> seqs;
    seqs.reserve(1 << 16);
    const size_t SOFT_MAX = 300000, MIN_BLOCK = 5000, SEQ_CAP = 50000;
    size_t end_matchable = n >= 4 ? n - 3 : 0;
    size_t in_next = 0;
    BlockStats stats;
    Freqs f;
    u32 litrun = 0;

    auto insert_span = [&](size_t from, size_t to) {
        size_t stop = std::min(to, end_matchable);
        for (size_t p = from; p < stop; p++) P.insert(p);
        // parsing resumes at `to`: pre-hash it so the next longest() call
        // starts with its head entries already in flight
        P.pipeline(to);
    };

    // Block loop structure parity: deflate_compress_lazy_generic
    // (lib/deflate_compress.c:2604-2808) incl. the greedy variant.
    while (in_next < n && !bw.overflow) {
        size_t block_begin = in_next;
        size_t rem = n - in_next;
        size_t max_block_end = rem < SOFT_MAX + MIN_BLOCK ? n : in_next + SOFT_MAX;
        stats.reset();
        seqs.clear();
        u32 min_len = (level == 1)
            ? 4
            : initial_min_len(in + in_next, max_block_end - in_next, cfg.depth);
        size_t next_recalc = in_next + std::min<size_t>(rem, 10000);

        auto choose_literal = [&](u8 b) {
            f.litlen[b]++;
            litrun++;
            stats.literal(b);
        };
        auto choose_match = [&](u32 len, u32 off) {
            unsigned ls = len_to_slot[len];
            unsigned os = offset_slot(off);
            f.litlen[257 + ls]++; f.off[os]++;
            seqs.push_back({litrun, (u16)len, 0, off});
            litrun = 0;
            stats.match(len);
        };

        do {
            if (in_next >= next_recalc && level != 1) {
                min_len = recalc_min_len(f.litlen, cfg.depth);
                next_recalc += std::min(n - next_recalc, in_next - block_begin);
            }
            if (in_next >= end_matchable) {
                choose_literal(in[in_next]);
                in_next++;
                continue;
            }
            u32 cur_off = 0;
            u32 cur_len = P.longest(in_next, min_len - 1, cfg.depth, cfg.nice, &cur_off);
            if (cur_len < min_len || (cur_len == 3 && cur_off > 8192)) {
                choose_literal(in[in_next]);
                in_next++;
                continue;
            }
            in_next++;  // position consumed by the match head

            if (cfg.kind == 0) {  // greedy
                choose_match(cur_len, cur_off);
                insert_span(in_next, in_next + cur_len - 1);
                in_next += cur_len - 1;
                continue;
            }

            for (;;) {  // have_cur_match
                if (cur_len >= cfg.nice || in_next >= end_matchable) {
                    choose_match(cur_len, cur_off);
                    insert_span(in_next, in_next + cur_len - 1);
                    in_next += cur_len - 1;
                    break;
                }
                // probe the next position at half depth
                u32 next_off = 0;
                u32 next_len = P.longest(in_next, cur_len - 1, cfg.depth >> 1,
                                         cfg.nice, &next_off);
                in_next++;
                if (next_len >= cur_len &&
                    4 * (int)(next_len - cur_len) +
                        (bsr32(cur_off) - bsr32(next_off)) > 2) {
                    choose_literal(in[in_next - 2]);
                    cur_len = next_len;
                    cur_off = next_off;
                    continue;  // goto have_cur_match
                }
                if (cfg.kind == 2 && in_next < end_matchable) {
                    // lazy2: look one more position ahead at quarter depth
                    next_len = P.longest(in_next, cur_len - 1, cfg.depth >> 2,
                                         cfg.nice, &next_off);
                    in_next++;
                    if (next_len >= cur_len &&
                        4 * (int)(next_len - cur_len) +
                            (bsr32(cur_off) - bsr32(next_off)) > 6) {
                        choose_literal(in[in_next - 3]);
                        choose_literal(in[in_next - 2]);
                        cur_len = next_len;
                        cur_off = next_off;
                        continue;
                    }
                    choose_match(cur_len, cur_off);
                    if (cur_len > 3) {
                        insert_span(in_next, in_next + cur_len - 3);
                        in_next += cur_len - 3;
                    }
                    break;
                }
                // plain lazy: no better match; emit the current one
                choose_match(cur_len, cur_off);
                insert_span(in_next, in_next + cur_len - 2);
                in_next += cur_len - 2;
                break;
            }
        } while (in_next < max_block_end && seqs.size() < SEQ_CAP &&
                 !stats.should_end(in_next - block_begin, n - in_next));

        seqs.push_back({litrun, 0, 0, 0});
        litrun = 0;
        flush_block(bw, in + block_begin, in_next - block_begin, seqs, f,
                    in_next == n);
        f = Freqs();
    }
    return bw.finish();
}

// ---------------------------------------------------------------------------
// Decompressor.  Decode-table entries fold the whole per-symbol bit cost
// (codeword + extra bits) into the low byte so the hot loop advances the
// cursor with one subtract, and bake length/offset BASES (not slots) into
// the payload so no secondary table lookups happen per symbol.  This
// re-derives the packed-entry idea of the reference decoder
// (lib/deflate_decompress.c:437-503) with our own layout:
//   bit 31       literal flag (sign test)
//   literal entries (bit 31 set; the serial bit-cursor chain is the decode
//   speed limit, so main-table entries whose window proves TWO short literal
//   codes carry both and one lookup emits two bytes):
//     bit 30       second literal present
//     bits 16..23  second literal value
//     bits 8..15   first literal value
//     bits 0..7    total bits consumed (both codewords)
//   non-literal entries:
//     bits 16..30  payload: length base | offset base | precode symbol |
//                  subtable start | 1 for invalid-symbol entries
//     bit 15       exceptional (end-of-block, invalid, or subtable pointer)
//     bit 14       subtable pointer (implies bit 15)
//     bits 8..11   codeword length (subtable pointers: subtable index width)
//     bits 0..7    total bits consumed by the symbol (codeword + extra)
// ---------------------------------------------------------------------------
enum : u32 {
    E_LIT = 1u << 31,
    E_LIT2 = 1u << 30,
    E_EXC = 1u << 15,
    E_SUB = (1u << 15) | (1u << 14),
};

#ifndef LITLEN_TB
#define LITLEN_TB 11
#endif
static constexpr unsigned LTB = LITLEN_TB;           // litlen main-table bits
// total litlen table bound: main table + worst-case subtable space (294
// entries at table_bits 11 — the reference's ENOUGH(288,11,15) = 2342
// includes the 2048 main entries)
static constexpr unsigned LENOUGH = (1u << LTB) + 294;

struct DecTables {
    alignas(64) u32 litlen[LENOUGH];
    alignas(64) u32 off[402];
    alignas(64) u32 pre[128];
};

static inline u32 dec_entry(int role, int sym, u32 l) {
    // role 0=precode (payload = symbol), 1=litlen, 2=offset
    u32 tail = (l << 8) | l;
    if (role == 0) return ((u32)sym << 16) | tail;
    if (role == 1) {
        if (sym < 256) return E_LIT | ((u32)sym << 8) | l;
        if (sym == 256) return E_EXC | tail;  // end of block (payload 0)
        if (sym <= 285) {
            u32 eb = LEN_EXTRA[sym - 257];
            return ((u32)LEN_BASE[sym - 257] << 16) | (l << 8) | (l + eb);
        }
        return E_EXC | (1u << 16) | tail;  // reserved litlen 286/287
    }
    if (sym < 30) {
        u32 eb = OFF_EXTRA[sym];
        return ((u32)OFF_BASE[sym] << 16) | (l << 8) | (l + eb);
    }
    return E_EXC | (1u << 16) | tail;  // reserved offset 30/31
}

// base + extra bits, extracted from the bit window saved BEFORE consuming
static inline u32 dec_value(u32 e, u64 saved) {
    u32 cl = (e >> 8) & 0xF;
    return ((e >> 16) & 0x7FFF) +
           ((u32)(saved >> cl) & ((1u << ((e & 0xFF) - cl)) - 1));
}

// build a packed decode table; returns false on invalid code.  O(nsyms +
// table size): counting-sort canonical order; codewords sharing a subtable
// prefix are contiguous in that order (reversed high bits of an increasing
// code are non-decreasing), so each subtable is one run whose width is the
// run's last (longest) codeword.
static bool build_table(const u8* lens, int nsyms, int table_bits, u32* table,
                        int enough, int role) {
    int cnt[16] = {0};
    for (int i = 0; i < nsyms; i++) cnt[lens[i]]++;
    long space = 0;
    for (int l = 1; l <= 15; l++) space += (long)cnt[l] << (15 - l);
    if (space > (1L << 15)) return false;  // overfull
    if (space < (1L << 15)) {
        // Incomplete code: accept the two zlib-compatible cases (empty code,
        // or one codeword of length 1) by mapping to a complete 1-bit code
        // on a single symbol — the reference does the same
        // (lib/deflate_decompress.c:803-853).
        int sym = 0;
        if (space != 0) {
            if (space != (1L << 14) || cnt[1] != 1) return false;
            while (lens[sym] != 1) sym++;
        }
        u32 e = dec_entry(role, sym, 1);
        for (int i = 0; i < (1 << table_bits); i++) table[i] = e;
        return true;
    }
    // canonical order via counting sort
    u16 sorted[288];
    int offs[17];
    offs[1] = 0;
    for (int l = 1; l <= 15; l++) offs[l + 1] = offs[l] + cnt[l];
    int nused = offs[16];
    for (int i = 0; i < nsyms; i++)
        if (lens[i]) sorted[offs[lens[i]]++] = (u16)i;

    u32 mask = (1u << table_bits) - 1;
    // stash of codewords longer than table_bits, in canonical order
    u16 s_rc[288]; u8 s_len[288]; u16 s_sym[288];
    int nstash = 0;
    u32 code = 0;
    int prev_len = 1;
    for (int oi = 0; oi < nused; oi++) {
        int sym = sorted[oi];
        int l = lens[sym];
        code <<= (l - prev_len);
        prev_len = l;
        u32 rc = rev_bits(code, l);
        code++;
        if (l <= table_bits) {
            u32 e = dec_entry(role, sym, l);
            for (u32 idx = rc; idx <= mask; idx += (1u << l)) table[idx] = e;
        } else {
            s_rc[nstash] = (u16)rc;
            s_len[nstash] = (u8)l;
            s_sym[nstash] = (u16)sym;
            nstash++;
        }
    }
    int cur_sub = 1 << table_bits;
    int i = 0;
    while (i < nstash) {
        u32 prefix = s_rc[i] & mask;
        int j = i;
        while (j < nstash && (s_rc[j] & mask) == prefix) j++;
        u32 sub_bits = (u32)s_len[j - 1] - table_bits;  // run's longest code
        int sub_start = cur_sub;
        cur_sub += 1 << sub_bits;
        if (cur_sub > enough) return false;
        table[prefix] = E_SUB | ((u32)sub_start << 16) | (sub_bits << 8);
        for (; i < j; i++) {
            u32 e = dec_entry(role, s_sym[i], s_len[i]);
            u32 hi = s_rc[i] >> table_bits;
            for (u32 idx = hi; idx < (1u << sub_bits);
                 idx += (1u << (s_len[i] - table_bits)))
                table[sub_start + idx] = e;
        }
    }
    // litlen pairing pass: where a main-table window fully determines two
    // literal codewords, fold both into the entry (one load, two bytes out)
    if (role == 1) {
        u32 tsize = 1u << table_bits;
        u32 snap[1u << LTB];
        memcpy(snap, table, tsize * sizeof(u32));
        for (u32 idx = 0; idx < tsize; idx++) {
            u32 e1 = snap[idx];
            u32 l1 = e1 & 0xFF;
            if (!(e1 & E_LIT) || l1 >= (u32)table_bits) continue;
            u32 e2 = snap[idx >> l1];
            if (!(e2 & E_LIT) || l1 + (e2 & 0xFF) > (u32)table_bits) continue;
            table[idx] = E_LIT | E_LIT2 | ((e2 & 0xFF00) << 8) |
                         (e1 & 0xFF00) | (l1 + (e2 & 0xFF));
        }
    }
    return true;
}

// main-table lookup with subtable resolution (tb = main table index width)
static inline u32 dec_lookup(const u32* T, unsigned tb, u64 buf) {
    u32 e = T[(u32)buf & ((1u << tb) - 1)];
    // literal entries reuse bits 14/15 for the value, so require bit31 clear
    if (__builtin_expect((e & (E_LIT | E_SUB)) == E_SUB, 0)) {
        u32 sb = (e >> 8) & 0xF;
        e = T[((e >> 16) & 0x7FFF) + (((u32)buf >> tb) & ((1u << sb) - 1))];
    }
    return e;
}

struct BitReader {
    const u8* in; size_t n; size_t pos = 0;
    u64 buf = 0; unsigned cnt = 0; unsigned overread = 0;
    BitReader(const u8* p, size_t len) : in(p), n(len) {}
    inline bool refill() {
        while (cnt <= 56) {
            if (pos < n) { buf |= (u64)in[pos++] << cnt; cnt += 8; }
            else { if (++overread > 8) return false; cnt += 8; }
        }
        return true;
    }
    // branchless whole-word refill; caller guarantees pos + 8 <= n
    inline void refill_fast() {
        u64 w; memcpy(&w, in + pos, 8);
        buf |= w << cnt;
        pos += (63 - cnt) >> 3;
        cnt |= 56;
    }
    inline u32 peek(unsigned nb) const { return (u32)(buf & ((1ull << nb) - 1)); }
    inline void consume(unsigned nb) { buf >>= nb; cnt -= nb; }
    inline u32 pop(unsigned nb) { u32 v = peek(nb); consume(nb); return v; }
    bool align_byte() {
        unsigned drop = cnt & 7;
        buf >>= drop; cnt -= drop;
        if (overread > (cnt >> 3)) return false;  // consumed past real input
        pos -= (cnt >> 3) - overread;
        buf = 0; cnt = 0; overread = 0;
        return true;
    }
    bool consumed_real() const { return overread * 8 <= cnt; }
    size_t consumed_bytes() const { return pos - ((cnt >> 3) - overread); }
};

__attribute__((noinline)) static DecTables* dec_tables() {
    static thread_local DecTables T;
    return &T;
}

extern "C" int ld_deflate_decompress(const u8* in, size_t n, u8* out,
                                     size_t out_avail, int known_size,
                                     size_t* actual_in, size_t* actual_out) {
    // returns 0 SUCCESS, 1 BAD_DATA, 2 SHORT_OUTPUT, 3 INSUFFICIENT_SPACE
    slot_init();
    // The scratch tables are thread_local, but naming a TLS variable in a
    // dlopen'd .so compiles to a __tls_get_addr PLT CALL at every access
    // under the global-dynamic model -- one function call per decoded
    // symbol in the hot loop (measured: the dominant decode cost).  Fetch
    // the address exactly once through a noinline getter and use plain
    // pointer loads from there on.
    DecTables* const tp = dec_tables();
    static thread_local u8 s_ll[288], s_of[32];
    BitReader br(in, n);
    size_t op = 0;
    bool is_final = false;
    do {
        if (!br.refill()) return 1;
        is_final = br.pop(1);
        u32 btype = br.pop(2);
        if (btype == 0) {
            if (!br.align_byte()) return 1;
            if (n - br.pos < 4) return 1;
            u16 len = (u16)(in[br.pos] | (in[br.pos+1] << 8));
            u16 nlen = (u16)(in[br.pos+2] | (in[br.pos+3] << 8));
            br.pos += 4;
            if (len != (u16)~nlen) return 1;
            if (len > out_avail - op) return 3;
            if (len > n - br.pos) return 1;
            memcpy(out + op, in + br.pos, len);
            br.pos += len; op += len;
            continue;
        }
        if (btype == 1) {
            // static tables: build once per thread, then memcpy-restore
            static thread_local DecTables S;
            static thread_local bool s_loaded = false;
            if (!s_loaded) {
                for (int i = 0; i < 288; i++) s_ll[i] = (i < 144) ? 8 : (i < 256) ? 9 : (i < 280) ? 7 : 8;
                for (int i = 0; i < 32; i++) s_of[i] = 5;
                if (!build_table(s_ll, 288, LTB, S.litlen, LENOUGH, 1)) return 1;
                if (!build_table(s_of, 32, 8, S.off, 402, 2)) return 1;
                s_loaded = true;
            }
            memcpy(tp->litlen, S.litlen, sizeof(S.litlen));
            memcpy(tp->off, S.off, sizeof(S.off));
        } else if (btype == 2) {
            if (!br.refill()) return 1;
            u32 num_ll = 257 + br.pop(5);
            u32 num_of = 1 + br.pop(5);
            u32 num_pre = 4 + br.pop(4);
            u8 pre_lens[19] = {0};
            for (u32 i = 0; i < num_pre; i++) {
                if (!br.refill()) return 1;
                pre_lens[PRECODE_PERM[i]] = (u8)br.pop(3);
            }
            if (!build_table(pre_lens, 19, 7, tp->pre, 128, 0)) return 1;
            u8 lens[288 + 32 + 138] = {0};
            u32 i = 0, total = num_ll + num_of;
            while (i < total) {
                if (!br.refill()) return 1;
                u32 e = tp->pre[br.peek(7)];
                br.consume(e & 0xFF);
                u32 sym = (e >> 16) & 0x7FFF;
                if (sym < 16) { lens[i++] = (u8)sym; continue; }
                u32 rep;
                u8 val = 0;
                if (sym == 16) {
                    if (i == 0) return 1;
                    val = lens[i - 1];
                    rep = 3 + br.pop(2);
                } else if (sym == 17) rep = 3 + br.pop(3);
                else rep = 11 + br.pop(7);
                if (i + rep > total) return 1;
                for (u32 r = 0; r < rep; r++) lens[i + r] = val;
                i += rep;
            }
            if (!build_table(lens, num_ll, LTB, tp->litlen, LENOUGH, 1)) return 1;
            if (!build_table(lens + num_ll, num_of, 8, tp->off, 402, 2)) return 1;
        } else return 1;

        // fastloop: bounds hoisted to refill points (role of
        // FASTLOOP_MAX_BYTES_READ/WRITTEN, lib/deflate_decompress.c:274-297,
        // but with a bits-remaining-driven burst instead of a fixed unroll).
        // Input slack 32 bytes = up to four 8-byte branchless refills per
        // bounds period (burst start, length extras, offset, next-entry
        // preload).  Output slack 400 bytes = a burst of at most 56 bits /
        // 2-bit literal pair = 56 bytes between bounds checks, plus a
        // 258-byte match rounded up to the 8-byte copy unit (264) and the
        // 32-byte unconditional splash.
        bool eob = false;
        if (br.pos + 32 <= n && op + 400 <= out_avail) {
            br.refill_fast();
            u32 e = dec_lookup(tp->litlen, LTB, br.buf);
            for (;;) {
                if (e & E_LIT) {
                    // dynamic literal burst: keep probing while a fully
                    // resolved lookup (main 11 + subtable 4 = 15 bits) is
                    // guaranteed present, instead of a fixed 3-probe unroll
                    // that refills on the 45-bit worst case.  Typical codes
                    // are 4-9 bits, so this roughly halves refill cadence
                    // on literal-heavy streams.
                    for (;;) {
                        br.consume(e & 0xFF);
                        out[op] = (u8)(e >> 8);
                        out[op + 1] = (u8)(e >> 16);
                        op += 1 + ((e >> 30) & 1);
                        if (br.cnt < 15) break;
                        e = dec_lookup(tp->litlen, LTB, br.buf);
                        if (!(e & E_LIT)) goto not_literal;
                    }
                    // ran low on bits: bounds (one check per refill
                    // period), refill, re-probe.  Burst output between
                    // checks is bounded by 56 bits / 2-bit pair = 56
                    // bytes, plus a 264+32-byte match copy: < 400 slack.
                    if (!(br.pos + 32 <= n && op + 400 <= out_avail))
                        break;
                    br.refill_fast();
                    e = dec_lookup(tp->litlen, LTB, br.buf);
                    continue;
                }
            not_literal:
                if (__builtin_expect(e & E_EXC, 0)) {
                    br.consume(e & 0xFF);
                    if ((e >> 16) & 0x7FFF) return 1;
                    eob = true;
                    break;
                }
                // the length entry may have been probed with only 15 bits
                // live; make its extra bits (and usually the whole offset
                // code) present before consuming
                if (br.cnt < 28) br.refill_fast();
                u64 saved = br.buf;
                br.consume(e & 0xFF);
                u32 len = dec_value(e, saved);
                if (br.cnt < 28) br.refill_fast();
                u32 oe = dec_lookup(tp->off, 8, br.buf);
                if (__builtin_expect(oe & E_EXC, 0)) return 1;
                saved = br.buf;
                br.consume(oe & 0xFF);
                u32 off = dec_value(oe, saved);
                if (off > op) return 1;
                const u8* src = out + op - off;
                u8* dst = out + op;
                op += len;
                // preload the next entry before the copy so the table load
                // retires under the copy's stores
                bool more = br.pos + 32 <= n && op + 400 <= out_avail;
                if (__builtin_expect(more, 1)) {
                    br.refill_fast();
                    e = dec_lookup(tp->litlen, LTB, br.buf);
                }
                if (off >= 8) {
                    // most matches are short: 32 bytes unconditionally, then
                    // a word loop for the tail only
                    memcpy(dst, src, 8);
                    memcpy(dst + 8, src + 8, 8);
                    memcpy(dst + 16, src + 16, 8);
                    memcpy(dst + 24, src + 24, 8);
                    if (len > 32) {
                        dst += 32; src += 32;
                        u8* end = out + op;
                        do { memcpy(dst, src, 8); dst += 8; src += 8; } while (dst < end);
                    }
                } else if (off == 1) {
                    memset(dst, *src, len);
                } else {
                    u32 left = len, avail = off;
                    while (left) {
                        u32 c = std::min(left, avail);
                        memcpy(dst, src, c);
                        dst += c; left -= c; avail += c;
                    }
                }
                if (!more) break;
            }
        }
        if (eob) continue;  // next block (or exit on is_final)

        // careful symbol loop (near input/output ends).  One refill
        // (>=57 bits) covers a full litlen code+extra (<=20) plus a full
        // offset code+extra (<=28).
        for (;;) {
            if (!br.refill()) return 1;
            u32 e = dec_lookup(tp->litlen, LTB, br.buf);
            if (e & E_LIT) {
                br.consume(e & 0xFF);
                if (op >= out_avail) return 3;
                out[op++] = (u8)(e >> 8);
                if (e & E_LIT2) {
                    if (op >= out_avail) return 3;
                    out[op++] = (u8)(e >> 16);
                }
                continue;
            }
            if (e & E_EXC) {
                br.consume(e & 0xFF);
                if ((e >> 16) & 0x7FFF) return 1;
                break;
            }
            u64 saved = br.buf;
            br.consume(e & 0xFF);
            u32 len = dec_value(e, saved);
            u32 oe = dec_lookup(tp->off, 8, br.buf);
            if (oe & E_EXC) return 1;
            saved = br.buf;
            br.consume(oe & 0xFF);
            u32 off = dec_value(oe, saved);
            if (off > op) return 1;
            if (len > out_avail - op) return 3;
            const u8* src = out + op - off;
            u8* dst = out + op;
            op += len;
            if (off >= len) memcpy(dst, src, len);
            else if (off == 1) memset(dst, *src, len);
            else {
                u32 left = len, avail = off;
                while (left) {
                    u32 c = std::min(left, avail);
                    memcpy(dst, src, c);
                    dst += c; left -= c; avail += c;
                }
            }
        }
    } while (!is_final);

    if (!br.consumed_real()) return 1;
    if (known_size && op != out_avail) return 2;
    if (actual_in) *actual_in = br.consumed_bytes();
    if (actual_out) *actual_out = op;
    return 0;
}
