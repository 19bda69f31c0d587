"""Chunk data parallelism over a JAX device mesh.

The reference has no distributed layer (SURVEY.md §2.3) — DEFLATE's chunked
usage model (README.md:122-135, programs/benchmark.c:430-538) makes it
embarrassingly parallel.  This module is the TPU-native realization:

- a 1-D ``Mesh`` over the ``chunks`` axis (ICI within a slice, DCN across
  hosts — the axis layout is the caller's choice via ``jax.make_mesh``);
- ``shard_map`` runs the jitted chunk compressor on each device's shard;
- per-chunk compressed bit-lengths are exchanged with ``all_gather`` over the
  mesh axis so every participant can compute the byte-exact global layout
  (the role NCCL gather would play in the reference's world, SURVEY.md §5.8);
- chunk streams are byte-aligned sync-flushed DEFLATE fragments
  (compress/tpu_pipeline.py), so ordered assembly is pure concatenation;
- whole-file CRC-32/Adler-32 trailers come from per-chunk device checksums
  stitched with the GF(2)/modular combine operators (ops/crc32_math.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # stable alias (newer JAX)
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..compress.tpu_pipeline import compress_chunk_static
from ..ops.checksums_jax import adler32_fixed, crc32_fixed


def make_chunk_mesh(devices=None, axis_name: str = "chunks") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def _chunk_compressor(level: int):
    """Device chunk compressor ladder (the analogue of the reference's
    per-level impl table, lib/deflate_compress.c:3927-4013):
    0 -> static-code greedy (fastest, stored-ish role); 1-4 -> dynamic
    Huffman (single-pass, 128K-segment window; at level 1 its 35.8%
    ratio already beats the reference -1's 36.11% — the reference's
    fastest parser also emits dynamic blocks,
    lib/deflate_compress.c:2451-2523); 5-7 -> lean min-cost DP (single
    seeded cost pass — ratio 34.08% beats libdeflate -6's 34.12%);
    8-9 -> DP with two cost passes + full candidate pool; 10-12 -> +
    deep/content candidates, len-3 matches (the near-optimal analogue)."""
    if level <= 0:
        return compress_chunk_static
    from ..compress.tpu_dynamic import compress_chunk_dynamic
    from ..compress.tpu_optimal import (
        LEN_LADDER_DENSE2,
        compress_chunk_optimal,
    )

    def _short_bias():
        import jax.numpy as _jnp

        from ..compress.tpu_optimal import _SHORT_BIAS16

        return _jnp.asarray(_SHORT_BIAS16)

    if level >= 10:
        return lambda b, l, f: compress_chunk_optimal(
            b, l, f, depth=12, two_pass=True, hash3=True, passes=2,
            ladder=LEN_LADDER_DENSE2, match_bias16=_short_bias(),
        )
    if level >= 8:
        return lambda b, l, f: compress_chunk_optimal(
            b, l, f, passes=2, ladder=LEN_LADDER_DENSE2,
            match_bias16=_short_bias())
    if level >= 5:
        return lambda b, l, f: compress_chunk_optimal(
            b, l, f, passes=1, use_content=False, use_wide=False,
            ladder=LEN_LADDER_DENSE2, ext_c=False, strides2=(),
            lit_sample=32,
        )
    return compress_chunk_dynamic


def _per_shard_compress(bufs, lengths, bfinal, *, compress_fn):
    """Runs on each device: compress local chunks + local checksums, then
    all-gather the compressed sizes so every shard knows the global layout."""
    words, total_bits = jax.vmap(compress_fn)(bufs, lengths, bfinal)
    crcs = jax.vmap(crc32_fixed)(
        bufs, lengths, jnp.zeros(bufs.shape[0], jnp.uint32)
    )
    adlers = jax.vmap(adler32_fixed)(
        bufs, lengths, jnp.ones(bufs.shape[0], jnp.uint32)
    )
    all_bits = jax.lax.all_gather(total_bits, "chunks", tiled=True)
    return words, total_bits, crcs, adlers, all_bits


# jitted shard_map wrappers cached per (mesh, key) so repeated calls (and
# the compress+decompress dryrun pair) reuse compiled executables instead
# of re-tracing a fresh jit object every call
_DP_CACHE: dict = {}


def compress_chunks_dp(mesh: Mesh, bufs: np.ndarray, lengths: np.ndarray,
                       bfinal: np.ndarray, level: int = 1):
    """Compress [B, N] chunks data-parallel over the mesh.

    B must be a multiple of the mesh size (pad with empty chunks).  Returns
    (words [B, W], total_bits [B], crcs [B], adlers [B], all_bits [B]).
    """
    import functools

    key = ("compress", mesh, level)
    jfn = _DP_CACHE.get(key)
    if jfn is None:
        axis = mesh.axis_names[0]
        spec_in = P(axis)
        fn = shard_map(
            functools.partial(
                _per_shard_compress, compress_fn=_chunk_compressor(level)),
            mesh=mesh,
            in_specs=(P(axis, None), spec_in, spec_in),
            out_specs=(P(axis, None), spec_in, spec_in, spec_in, P(None)),
            check_vma=False,
        )
        jfn = _DP_CACHE[key] = jax.jit(fn)
    return jfn(jnp.asarray(bufs), jnp.asarray(lengths), jnp.asarray(bfinal))


def _per_shard_decompress(bufs, in_lens, out_lens, *, decode_fn):
    """Runs on each device: decode local chunks, then all-gather the
    produced sizes so every shard knows the global output layout (the
    decode-direction mirror of _per_shard_compress)."""
    out, oplens, consumed, status = decode_fn(bufs, in_lens)
    # known-size contract at the mesh layer: short/long output is BAD_DATA
    status = jnp.where(
        (status == 0) & (oplens != out_lens), jnp.int32(1), status
    )
    all_lens = jax.lax.all_gather(oplens, "chunks", tiled=True)
    return out, oplens, consumed, status, all_lens


def decompress_chunks_dp(mesh: Mesh, bufs: np.ndarray, in_lens: np.ndarray,
                         out_lens: np.ndarray, out_cap: int,
                         decoder: str = "auto", interpret: bool = False):
    """Decompress [B, N] raw-DEFLATE chunk fragments data-parallel over the
    mesh (the decode direction of compress_chunks_dp; per-chunk independent
    streams exactly like the reference's chunked usage model,
    programs/benchmark.c:430-538).

    decoder: "pallas" (scalar-core kernel, TPU), "fsm" (pure-JAX jitted
    decoder, any backend), or "auto" (pallas on TPU meshes, fsm elsewhere).
    Returns (out [B, out_cap] u8, out_lens [B], consumed [B], status [B],
    all_lens [B]).
    """
    import functools

    if decoder == "auto":
        platform = next(iter(np.asarray(mesh.devices).flat)).platform
        decoder = "pallas" if platform == "tpu" else "fsm"

    key = ("decompress", mesh, decoder, out_cap, interpret)
    jfn = _DP_CACHE.get(key)
    if jfn is None:
        if decoder == "pallas":
            from ..decompress.pallas_decode import decompress_chunks as _pdc
            decode_fn = lambda b, l: _pdc(b, l, out_cap,  # noqa: E731
                                          interpret=interpret)
        else:
            from ..decompress.tpu import decompress_chunks as _fdc
            decode_fn = lambda b, l: _fdc(b, l, out_cap)  # noqa: E731

        axis = mesh.axis_names[0]
        spec = P(axis)
        fn = shard_map(
            functools.partial(_per_shard_decompress, decode_fn=decode_fn),
            mesh=mesh,
            in_specs=(P(axis, None), spec, spec),
            out_specs=(P(axis, None), spec, spec, spec, P(None)),
            check_vma=False,
        )
        jfn = _DP_CACHE[key] = jax.jit(fn)
    return jfn(jnp.asarray(bufs), jnp.asarray(in_lens),
               jnp.asarray(out_lens))


def pad_chunks(data: bytes, chunk_size: int, multiple_of: int):
    """Split ``data`` into fixed-size padded chunk arrays for the device path."""
    n = len(data)
    nchunks = max(-(-n // chunk_size), 1)
    b = -(-nchunks // multiple_of) * multiple_of
    bufs = np.zeros((b, chunk_size), dtype=np.uint8)
    lengths = np.zeros(b, dtype=np.int32)
    arr = np.frombuffer(data, dtype=np.uint8)
    for i in range(nchunks):
        seg = arr[i * chunk_size : (i + 1) * chunk_size]
        bufs[i, : len(seg)] = seg
        lengths[i] = len(seg)
    bfinal = np.zeros(b, dtype=bool)
    bfinal[nchunks - 1] = True
    return bufs, lengths, bfinal, nchunks
