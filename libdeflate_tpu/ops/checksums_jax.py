"""JAX/TPU checksum kernels.

TPU-native re-derivations of the reference's SIMD checksum kernels:

- **Adler-32** — the reference's VNNI dot-product formulation
  (``lib/x86/adler32_template.h``) becomes two closed-form weighted-sum
  reductions over a (rows, lanes) tile layout with per-row mod-65521
  reduction, mapping directly onto the VPU (and HBM-bandwidth-bound, which is
  the speed-of-light for a checksum).

- **CRC-32** — the reference's PCLMUL folding (``lib/x86/crc32_impl.h``)
  becomes a log-depth GF(2) *linear-map tree*: leaves are per-byte register
  values built from 8 bit-selects (no gathers), and each level applies a
  precomputed constant 32x32 advance matrix (see ops/crc32_math.py) to the
  left halves.  Total work is ~64 uint32 VPU ops per byte with log2(N) depth.

Both kernels take a fixed-shape ``uint8[N]`` buffer plus a dynamic valid
``length`` so they can run over padded chunk arrays under ``vmap``/``pjit``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .crc32_math import (
    ADVANCE_POW2,
    BLOCK_BITS_MATRIX,
    CRC_BIT_TABLE,
    CRC_BLOCK,
    INV_ADVANCE_POW2,
)

ADLER_MOD = 65521
# 256 bytes per row: MXU row sums stay < 256*255*255 < 2^24, exact in f32
_ADLER_LANES = 256


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _mod_sum(x: jax.Array) -> jax.Array:
    """sum(x) % ADLER_MOD for x with entries < ADLER_MOD, overflow-safe in
    int32 for up to 128*32768 entries (1 GiB chunks at 256 B/row)."""
    n = x.shape[0]
    if n <= 32768:
        return jnp.sum(x) % ADLER_MOD
    m = _ceil_to(n, 128) // 128
    x2 = jnp.pad(x, (0, m * 128 - n)).reshape(m, 128)
    return jnp.sum(jnp.sum(x2, axis=1) % ADLER_MOD) % ADLER_MOD


def adler32_fixed(buf: jax.Array, length: jax.Array, adler_init: jax.Array):
    """Adler-32 of buf[:length] starting from ``adler_init``; jit/vmap-safe.

    buf: uint8[N] (N static), length: int32 scalar, adler_init: uint32 scalar.
    """
    n = buf.shape[0]
    cols = min(_ADLER_LANES, _ceil_to(max(n, 1), 128))
    rows = _ceil_to(n, cols) // cols
    pad = rows * cols - n

    s1_init = (adler_init & jnp.uint32(0xFFFF)).astype(jnp.int32)
    s2_init = (adler_init >> jnp.uint32(16)).astype(jnp.int32)

    # The reference's VNNI dot-product (lib/x86/adler32_template.h) becomes
    # ONE MXU matmul: [rows, cols] @ [cols, 2] with weight columns (1, col).
    # bf16 inputs are exact (values <= 255), products <= 255*255 are exact,
    # and f32 row sums <= 256*255*255 < 2^24 are exact.  The only per-byte
    # VPU work is the u8 -> bf16 convert: the `length` prefix mask is applied
    # per ROW, with the single straddling row recomputed exactly on the side.
    b2 = jnp.pad(buf, (0, pad)).reshape(rows, cols)
    wts = jnp.stack(
        [
            jnp.ones(cols, jnp.float32),
            jnp.arange(cols, dtype=jnp.float32),
        ],
        axis=1,
    ).astype(jnp.bfloat16)
    sums = jax.lax.dot(
        b2.astype(jnp.bfloat16), wts, preferred_element_type=jnp.float32
    )

    # partial (boundary) row, masked exactly
    r_b = jnp.minimum(length // cols, rows - 1).astype(jnp.int32)
    rem = length - r_b * cols  # in [0, cols] valid bytes in row r_b
    prow = jax.lax.dynamic_slice(b2, (r_b, 0), (1, cols))[0].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cols, 1), 0)[:, 0]
    prow = jnp.where(lane < rem, prow, 0)
    psum = jnp.sum(prow)
    pwsum = jnp.sum(prow * lane)

    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)[:, 0]
    full = rid < r_b
    at_b = rid == r_b
    row_sum = jnp.where(full, sums[:, 0].astype(jnp.int32), jnp.where(at_b, psum, 0))
    row_wsum = jnp.where(full, sums[:, 1].astype(jnp.int32), jnp.where(at_b, pwsum, 0))

    # s1 = (s1_init + sum b) mod p : per-row mod keeps the int32 sum small.
    s1 = (s1_init + _mod_sum(row_sum % ADLER_MOD)) % ADLER_MOD

    # weighted = sum_i (length - i) * b_i
    #          = sum_r [ (length - r*cols) * S_r - W_r ]          (mod p)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)[:, 0]
    w_r = (length - row_ids * cols) % ADLER_MOD  # rows beyond length: S_r=0
    prod = (
        w_r.astype(jnp.uint32) * (row_sum % ADLER_MOD).astype(jnp.uint32)
    ) % jnp.uint32(ADLER_MOD)
    weighted = (
        _mod_sum(prod.astype(jnp.int32)) - _mod_sum(row_wsum % ADLER_MOD)
    ) % ADLER_MOD
    len_s1 = (
        (length % ADLER_MOD).astype(jnp.uint32) * s1_init.astype(jnp.uint32)
    ) % jnp.uint32(ADLER_MOD)
    s2 = (s2_init + len_s1.astype(jnp.int32) + weighted) % ADLER_MOD
    return (s2.astype(jnp.uint32) << jnp.uint32(16)) | s1.astype(jnp.uint32)


_ADV = jnp.asarray(np.asarray(ADVANCE_POW2))  # [40, 32] uint32
_IADV = jnp.asarray(np.asarray(INV_ADVANCE_POW2))  # [40, 32] uint32
_BITTAB = jnp.asarray(np.asarray(CRC_BIT_TABLE))  # [8] uint32
_CRC_LOG_BLOCK = CRC_BLOCK.bit_length() - 1
# [8*CRC_BLOCK, 32] 0/1 matrix: MXU operand for the intra-block reduction
_BLOCK_MAT = jnp.asarray(
    (
        (np.asarray(BLOCK_BITS_MATRIX)[:, None] >> np.arange(32)[None, :]) & 1
    ).astype(np.float32)
).astype(jnp.bfloat16)


def _packed_plane_matrix() -> np.ndarray:
    """The same block matrix with rows permuted to the packed-plane lhs
    layout (see the extraction in crc32_fixed): lhs inner index
    word*32 + plane*4 + byte_in_word maps to message bit
    (word*4 + byte_in_word)*8 + plane."""
    nwords = CRC_BLOCK // 4
    word = np.arange(nwords)[:, None, None]
    plane = np.arange(8)[None, :, None]
    byte = np.arange(4)[None, None, :]
    perm = ((word * 4 + byte) * 8 + plane).reshape(-1)
    bits = (np.asarray(BLOCK_BITS_MATRIX)[:, None] >> np.arange(32)[None, :]) & 1
    return bits[perm].astype(np.int8)


_BLOCK_MAT_I8 = jnp.asarray(_packed_plane_matrix())  # [8*CRC_BLOCK, 32]


def _mat_vec_const(cols: jax.Array, v: jax.Array) -> jax.Array:
    """Apply a constant GF(2) matrix (32 uint32 columns) to uint32 vector(s)."""
    out = jnp.zeros_like(v)
    for j in range(32):
        bit = (v >> jnp.uint32(j)) & jnp.uint32(1)
        out = out ^ (cols[j] * bit)
    return out


def _crc_leaves(b: jax.Array) -> jax.Array:
    """Per-byte raw CRC register values via 8 bit-selects (gather-free)."""
    v = jnp.zeros(b.shape, dtype=jnp.uint32)
    bu = b.astype(jnp.uint32)
    for j in range(8):
        bit = (bu >> jnp.uint32(j)) & jnp.uint32(1)
        v = v ^ (_BITTAB[j] * bit)
    return v


def _advance_dyn(reg: jax.Array, nbytes: jax.Array,
                 mats: jax.Array | None = None) -> jax.Array:
    """Advance scalar register(s) past a *dynamic* number of zero bytes
    (or rewind, with mats=_IADV)."""
    out = reg
    mats = _ADV if mats is None else mats
    for j in range(32):
        bit = ((nbytes >> j) & 1).astype(jnp.uint32)
        advanced = _mat_vec_const(mats[j], out)
        out = jnp.where(bit == 1, advanced, out)
    return out


def crc32_fixed(buf: jax.Array, length: jax.Array, crc_init: jax.Array):
    """gzip CRC-32 of buf[:length] starting from ``crc_init``; jit/vmap-safe.

    Bytes past ``length`` are masked to zero and the block reduction runs
    over the whole padded window — the result is the register of
    message ++ zeros[size - length], which one dynamic *inverse* advance
    (INV_ADVANCE_POW2) rewinds to the true register.  This replaces the
    old whole-buffer jnp.roll right-alignment: one less full memory pass.
    """
    n = buf.shape[0]
    size = _ceil_to(max(n, 1), CRC_BLOCK)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    masked = jnp.where(idx < length, buf, 0)
    window = jnp.pad(masked, (0, size - n))

    # Intra-block reduction on the MXU: packed-plane extraction, then one
    # exact int8 matmul against the constant contribution matrix, then
    # mod 2.  This replaces the reference's PCLMUL folding
    # (lib/x86/crc32_pclmul_template.h) with the same linear-map math in
    # matrix form.  Plane j of four consecutive bytes is extracted with a
    # SINGLE u32 op — (word >> j) & 0x01010101 — so the whole expansion is
    # 4 VPU ops/byte (vs 8 shift+mask+bf16-converts per byte in the
    # bit-serial form), the matmul operands are 1-byte (half the VMEM
    # traffic of bf16), and the constant matrix absorbs the packed layout
    # (rows permuted at import, see _packed_plane_matrix).
    nb = size // CRC_BLOCK
    w32 = jax.lax.bitcast_convert_type(
        window.reshape(nb, CRC_BLOCK // 4, 4), jnp.uint32
    )
    planes = jnp.stack(
        [(w32 >> jnp.uint32(j)) & jnp.uint32(0x01010101) for j in range(8)],
        axis=-1,
    )                                                    # [nb, W, 8] u32
    lhs = jax.lax.bitcast_convert_type(planes, jnp.uint8)  # [nb, W, 8, 4]
    lhs = lhs.reshape(nb, CRC_BLOCK * 8).astype(jnp.int8)
    s = jax.lax.dot(lhs, _BLOCK_MAT_I8, preferred_element_type=jnp.int32)
    vi = s.astype(jnp.uint32) & jnp.uint32(1)
    pow2 = jnp.left_shift(
        jnp.uint32(1),
        jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1),
    )
    v = jnp.sum(vi * pow2, axis=1, dtype=jnp.uint32)  # [nb] raw registers

    # Inter-block combine tree at block granularity.
    nb2 = 1 << max((nb - 1).bit_length(), 0)
    v = jnp.concatenate([jnp.zeros(nb2 - nb, jnp.uint32), v])
    for level in range(nb2.bit_length() - 1):
        left = v[0::2]
        right = v[1::2]
        v = _mat_vec_const(_ADV[_CRC_LOG_BLOCK + level], left) ^ right
    # rewind the trailing zero padding, then fold in the advanced init
    raw = _advance_dyn(v[0], size - length, mats=_IADV)

    init_reg = ~crc_init.astype(jnp.uint32)
    init_reg = _advance_dyn(init_reg, length)
    return ~(init_reg ^ raw)


@functools.partial(jax.jit, static_argnames=())
def adler32_chunks(bufs: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-chunk Adler-32 (init 1) over a [B, N] padded chunk array."""
    init = jnp.full(bufs.shape[0], 1, dtype=jnp.uint32)
    return jax.vmap(adler32_fixed)(bufs, lengths, init)


@functools.partial(jax.jit, static_argnames=())
def crc32_chunks(bufs: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-chunk CRC-32 (init 0) over a [B, N] padded chunk array."""
    init = jnp.zeros(bufs.shape[0], dtype=jnp.uint32)
    return jax.vmap(crc32_fixed)(bufs, lengths, init)
