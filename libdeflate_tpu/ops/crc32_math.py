"""CRC-32 (gzip polynomial) GF(2) math: tables, advance matrices, combine.

Role parity with the reference's generated constants
(``scripts/gen-crc32-consts.py``, ``lib/crc32_tables.h``,
``lib/crc32_multipliers.h``).  Instead of carryless-multiply folding constants
(which target PCLMUL/PMULL instructions), the TPU design uses the *linear-map*
formulation: the CRC register update is linear over GF(2), so "advance the
register by k zero bytes" is a 32x32 bit-matrix ``A^k``.  We precompute
``A^(2^j)`` by squaring, which gives:

- O(log n) ``crc32_combine`` (drives multi-chunk / multi-host CRC assembly,
  SURVEY.md §5.8), and
- the per-level constant matrices used by the log-depth tree reduction in the
  JAX kernel (ops/checksums_jax.py), the TPU analogue of PCLMUL folding.

All matrices are stored column-major as uint32 vectors: ``M @ v`` =
XOR of ``cols[j]`` over set bits ``j`` of ``v``.
"""

from __future__ import annotations

import numpy as np

# Reflected gzip CRC-32 polynomial (reference: lib/crc32.c, poly 0xEDB88320).
POLY_REFLECTED = 0xEDB88320


def _make_byte_table() -> np.ndarray:
    """The classic 256-entry table: T[b] = register after byte b from state 0."""
    t = np.zeros(256, dtype=np.uint64)
    for b in range(256):
        c = b
        for _ in range(8):
            c = (c >> 1) ^ (POLY_REFLECTED if (c & 1) else 0)
        t[b] = c
    return t.astype(np.uint32)


CRC_BYTE_TABLE = _make_byte_table()

# Per-bit decomposition of the byte table: T[b] = XOR of BIT_TABLE[j] for each
# set bit j of b (linearity).  Lets device kernels avoid 256-entry gathers.
CRC_BIT_TABLE = CRC_BYTE_TABLE[np.left_shift(1, np.arange(8))]


def _make_slice_tables(n: int = 8) -> np.ndarray:
    """Slice-by-N tables: S[k][b] = contribution of byte b seen k bytes before
    the current register position (reference analogue: lib/crc32_tables.h)."""
    tabs = np.zeros((n, 256), dtype=np.uint32)
    tabs[0] = CRC_BYTE_TABLE
    for k in range(1, n):
        prev = tabs[k - 1]
        tabs[k] = (prev >> np.uint32(8)) ^ CRC_BYTE_TABLE[prev & np.uint32(0xFF)]
    return tabs


CRC_SLICE_TABLES = _make_slice_tables(8)


def mat_vec(cols: np.ndarray, v):
    """Apply a GF(2) 32x32 matrix (32 uint32 columns) to vector(s) v."""
    v = np.asarray(v, dtype=np.uint32)
    out = np.zeros_like(v)
    for j in range(32):
        bit = (v >> np.uint32(j)) & np.uint32(1)
        out ^= cols[j] * bit
    return out


def mat_mat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Compose: (a @ b) as column arrays — apply a to each column of b."""
    return mat_vec(a, b)


def _advance_one_byte_matrix() -> np.ndarray:
    """Matrix of the one-zero-byte register update c -> (c>>8) ^ T[c & 0xff]."""
    basis = np.left_shift(np.uint32(1), np.arange(32, dtype=np.uint32))
    return (basis >> np.uint32(8)) ^ CRC_BYTE_TABLE[basis & np.uint32(0xFF)]


# ADVANCE_POW2[j] advances the register past 2^j zero bytes.
def _make_advance_pow2(max_log: int = 40) -> np.ndarray:
    mats = np.zeros((max_log, 32), dtype=np.uint32)
    mats[0] = _advance_one_byte_matrix()
    for j in range(1, max_log):
        mats[j] = mat_mat(mats[j - 1], mats[j - 1])
    return mats


ADVANCE_POW2 = _make_advance_pow2()


def _gf2_inverse(cols: np.ndarray) -> np.ndarray:
    """Invert a GF(2) 32x32 matrix given as 32 uint32 columns.

    The one-zero-byte advance is invertible (x has an inverse mod the CRC
    polynomial, whose constant term is nonzero), so all its powers are.
    Gauss-Jordan over packed u32 rows of the augmented [M | I]."""
    # rows[i] bit j = M[i][j]; build from columns
    m = np.zeros(32, np.uint64)
    for j in range(32):
        col = int(cols[j])
        for i in range(32):
            if (col >> i) & 1:
                m[i] |= np.uint64(1) << np.uint64(j)
    aug = m | (np.uint64(1) << (np.arange(32, dtype=np.uint64) + np.uint64(32)))
    for col in range(32):
        piv = next(i for i in range(col, 32)
                   if (int(aug[i]) >> col) & 1)
        aug[[col, piv]] = aug[[piv, col]]
        for i in range(32):
            if i != col and (int(aug[i]) >> col) & 1:
                aug[i] ^= aug[col]
    inv_rows = aug >> np.uint64(32)
    out = np.zeros(32, np.uint32)
    for j in range(32):
        acc = 0
        for i in range(32):
            if (int(inv_rows[i]) >> j) & 1:
                acc |= 1 << i
        out[j] = acc
    return out


# INV_ADVANCE_POW2[j] rewinds the register past 2^j zero bytes — used by the
# device kernel to undo end-padding instead of rolling the whole buffer so
# the valid prefix right-aligns (saves one full memory pass per checksum).
INV_ADVANCE_POW2 = np.stack([_gf2_inverse(ADVANCE_POW2[j])
                             for j in range(ADVANCE_POW2.shape[0])])


def advance(crc_reg, nbytes: int):
    """Advance raw CRC register(s) past ``nbytes`` zero bytes."""
    v = np.asarray(crc_reg, dtype=np.uint32)
    j = 0
    while nbytes:
        if nbytes & 1:
            v = mat_vec(ADVANCE_POW2[j], v)
        nbytes >>= 1
        j += 1
    return v


# MXU block matrix: BLOCK_BITS_MATRIX[p*8 + k] is the raw-register
# contribution of bit k of the byte at position p within a CRC_BLOCK-byte
# block (the whole intra-block reduction collapses into ONE GF(2) mat-vec,
# done on the MXU as an exact f32 matmul followed by mod-2).
CRC_BLOCK = 2048


def _make_block_bits_matrix(k_bytes: int = CRC_BLOCK) -> np.ndarray:
    rows = np.zeros((k_bytes, 8), dtype=np.uint32)
    vals = CRC_BIT_TABLE.copy()  # contributions at the LAST byte position
    adv1 = ADVANCE_POW2[0]
    for p in range(k_bytes - 1, -1, -1):
        rows[p] = vals
        vals = mat_vec(adv1, vals)
    return rows.reshape(k_bytes * 8)


BLOCK_BITS_MATRIX = _make_block_bits_matrix()


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """CRC of A||B from crc32(A), crc32(B), |B| — zlib-compatible.

    Used to stitch per-chunk CRCs into whole-file trailers in the chunk-DP
    path (SURVEY.md §5.8).
    """
    return int(advance(np.uint32(crc1), len2)) ^ crc2
