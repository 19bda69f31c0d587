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

from .crc32_math import ADVANCE_POW2, CRC_BIT_TABLE

ADLER_MOD = 65521
_ADLER_LANES = 2048


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def adler32_fixed(buf: jax.Array, length: jax.Array, adler_init: jax.Array):
    """Adler-32 of buf[:length] starting from ``adler_init``; jit/vmap-safe.

    buf: uint8[N] (N static), length: int32 scalar, adler_init: uint32 scalar.
    """
    n = buf.shape[0]
    cols = min(_ADLER_LANES, _ceil_to(max(n, 1), 128))
    rows = _ceil_to(n, cols) // cols
    pad = rows * cols - n

    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) * cols + (
        jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    )
    b = jnp.pad(buf, (0, pad)).reshape(rows, cols).astype(jnp.int32)
    b = jnp.where(idx < length, b, 0)

    s1_init = (adler_init & jnp.uint32(0xFFFF)).astype(jnp.int32)
    s2_init = (adler_init >> jnp.uint32(16)).astype(jnp.int32)

    row_sum = jnp.sum(b, axis=1)  # < 255*cols, fits int32
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    row_wsum = jnp.sum(b * col_ids, axis=1)  # < 255*cols^2/2, fits int32

    # s1 = (s1_init + sum b) mod p : per-row mod keeps the int32 sum small.
    s1 = (s1_init + jnp.sum(row_sum % ADLER_MOD)) % ADLER_MOD

    # weighted = sum_i (length - i) * b_i
    #          = sum_r [ (length - r*cols) * S_r - W_r ]          (mod p)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)[:, 0]
    w_r = (length - row_ids * cols) % ADLER_MOD  # rows beyond length: S_r=0
    prod = (
        w_r.astype(jnp.uint32) * (row_sum % ADLER_MOD).astype(jnp.uint32)
    ) % jnp.uint32(ADLER_MOD)
    weighted = (
        jnp.sum(prod.astype(jnp.int32)) - jnp.sum(row_wsum % ADLER_MOD)
    ) % ADLER_MOD
    len_s1 = (
        (length % ADLER_MOD).astype(jnp.uint32) * s1_init.astype(jnp.uint32)
    ) % jnp.uint32(ADLER_MOD)
    s2 = (s2_init + len_s1.astype(jnp.int32) + weighted) % ADLER_MOD
    return (s2.astype(jnp.uint32) << jnp.uint32(16)) | s1.astype(jnp.uint32)


_ADV = jnp.asarray(np.asarray(ADVANCE_POW2))  # [40, 32] uint32
_BITTAB = jnp.asarray(np.asarray(CRC_BIT_TABLE))  # [8] uint32


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


def _advance_dyn(reg: jax.Array, nbytes: jax.Array) -> jax.Array:
    """Advance scalar register(s) past a *dynamic* number of zero bytes."""
    out = reg
    for j in range(32):
        bit = ((nbytes >> j) & 1).astype(jnp.uint32)
        advanced = _mat_vec_const(_ADV[j], out)
        out = jnp.where(bit == 1, advanced, out)
    return out


def crc32_fixed(buf: jax.Array, length: jax.Array, crc_init: jax.Array):
    """gzip CRC-32 of buf[:length] starting from ``crc_init``; jit/vmap-safe.

    The valid prefix is rotated to the *end* of a power-of-two window
    (leading zero bytes are the identity for the raw CRC register), then
    reduced by the log-depth constant-matrix tree.
    """
    n = buf.shape[0]
    logn = max((n - 1).bit_length(), 0) if n > 1 else 0
    size = 1 << logn
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    masked = jnp.where(idx < length, buf, 0)
    pad = size - n
    window = jnp.pad(masked, (pad, 0))
    # Rotate right so that byte length-1 lands at the last slot.
    window = jnp.roll(window, size - pad - length)

    v = _crc_leaves(window)
    for level in range(logn):
        left = v[0::2]
        right = v[1::2]
        v = _mat_vec_const(_ADV[level], left) ^ right
    raw = v[0]

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
