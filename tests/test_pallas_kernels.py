"""Pallas kernel equivalence tests (interpret mode on the CPU mesh).

The two sequential-core kernels (pallas_kernels.py) must be bit-exact
replacements for the XLA formulations they shadow:

- dp_parse_pallas vs tpu_optimal._dp_parse (the backwards min-cost DP,
  role parity with deflate_find_min_cost_path,
  /root/reference/lib/deflate_compress.c:3327-3399)
- pack_groups_pallas vs tpu_pipeline._group_place (bit placement, the
  ADD_BITS/FLUSH_BITS role, lib/deflate_compress.c:688-751)

plus whole-pipeline equivalence of the _pallas compressor entry points.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import zlib

from libdeflate_tpu.compress import tpu_dynamic as td
from libdeflate_tpu.compress import tpu_optimal as to
from libdeflate_tpu.compress import tpu_pipeline as tp
from libdeflate_tpu.compress.pallas_kernels import (
    dp_parse_pallas,
    pack_groups_pallas,
)
from libdeflate_tpu.compress.tpu_pipeline import device_stream_to_bytes

pytestmark = pytest.mark.slow


def test_dp_kernel_matches_xla():
    rng = np.random.default_rng(0)
    S = 256
    B, n_pad = 2, 512
    cost_lit = rng.integers(16, 180, (B, n_pad)).astype(np.int32)
    lenA = rng.integers(0, 259, (B, n_pad)).astype(np.int32)
    dA = rng.integers(1, 32769, (B, n_pad)).astype(np.int32)
    lenB = np.minimum(rng.integers(0, 259, (B, n_pad)), lenA).astype(np.int32)
    dB = rng.integers(1, 32769, (B, n_pad)).astype(np.int32)
    d3 = np.where(
        rng.random((B, n_pad)) < 0.5, rng.integers(1, 8193, (B, n_pad)), 0
    ).astype(np.int32)

    lenC = np.minimum(rng.integers(0, 259, (B, n_pad)), lenA).astype(np.int32)
    dC = rng.integers(1, 32769, (B, n_pad)).astype(np.int32)
    lc = jnp.asarray(to._SEED_LC_LEN)
    spans_ref, dists_ref = [], []
    for b in range(B):
        cdA = to._dist_cost(jnp.asarray(dA[b]))
        cdB = to._dist_cost(jnp.asarray(dB[b]))
        cdC = to._dist_cost(jnp.asarray(dC[b]))
        cd3 = to._dist_cost(jnp.asarray(d3[b]))
        s, d = to._dp_parse(
            jnp.asarray(cost_lit[b]), jnp.asarray(lenA[b]), jnp.asarray(dA[b]),
            cdA, jnp.asarray(lenB[b]), jnp.asarray(dB[b]), cdB,
            jnp.asarray(lenC[b]), jnp.asarray(dC[b]), cdC,
            jnp.asarray(d3[b]), cd3, lc, S,
        )
        spans_ref.append(np.asarray(s))
        dists_ref.append(np.asarray(d))

    sp, dp = dp_parse_pallas(
        jnp.asarray(cost_lit), jnp.asarray(lenA), jnp.asarray(dA),
        to._dist_cost(jnp.asarray(dA)),
        jnp.asarray(lenB), jnp.asarray(dB), to._dist_cost(jnp.asarray(dB)),
        jnp.asarray(lenC), jnp.asarray(dC), to._dist_cost(jnp.asarray(dC)),
        jnp.asarray(d3), to._dist_cost(jnp.asarray(d3)), lc,
        S=S, interpret=True,
    )
    assert np.array_equal(np.asarray(sp), np.stack(spans_ref))
    assert np.array_equal(np.asarray(dp), np.stack(dists_ref))


def test_pack_kernel_matches_scatter():
    rng = np.random.default_rng(1)
    n = 128 * 40
    nbits = rng.integers(1, 10, n).astype(np.int32)
    values = rng.integers(0, 1 << 31, n).astype(np.uint32) & (
        (np.uint32(1) << nbits.astype(np.uint32)) - 1
    )
    offs = np.concatenate([[0], np.cumsum(nbits)[:-1]]).astype(np.int32)
    nwords = int((offs[-1] + nbits[-1] + 31) // 32) + 2

    sbuf, gw = tp._group_premerge(
        jnp.asarray(values), jnp.asarray(nbits), jnp.asarray(offs)
    )
    ref = np.asarray(tp._group_place(sbuf, gw, nwords))
    out = np.asarray(
        pack_groups_pallas(sbuf[None], gw[None], nwords, interpret=True)
    )[0]
    assert np.array_equal(out, ref)


@pytest.mark.parametrize(
    "ref_fn,pal_fn",
    [
        (td.compress_chunks_dynamic, td.compress_chunks_dynamic_pallas),
        (to.compress_chunks_optimal, to.compress_chunks_optimal_pallas),
    ],
    ids=["dynamic", "optimal"],
)
def test_pallas_compressor_bit_exact(ref_fn, pal_fn):
    rng = np.random.default_rng(5)
    N = 1 << 16
    txt = (open("/root/reference/README.md", "rb").read() * 20)[:N]
    rec = np.tile(rng.integers(0, 256, 64, dtype=np.uint8), N // 64).tobytes()
    bufs = np.stack([np.frombuffer(txt, np.uint8), np.frombuffer(rec, np.uint8)])
    lengths = np.array([N, N], np.int32)
    bfinal = np.array([True, True])

    w_ref, t_ref = ref_fn(
        jnp.asarray(bufs), jnp.asarray(lengths), jnp.asarray(bfinal)
    )
    w_pal, t_pal = pal_fn(
        jnp.asarray(bufs), jnp.asarray(lengths), jnp.asarray(bfinal),
        interpret=True,
    )
    w_ref, t_ref, w_pal, t_pal = map(np.asarray, (w_ref, t_ref, w_pal, t_pal))
    assert np.array_equal(t_ref, t_pal)
    for k in range(2):
        a = device_stream_to_bytes(w_ref[k], t_ref[k])
        b = device_stream_to_bytes(w_pal[k], t_pal[k])
        assert a == b
        assert zlib.decompressobj(-15).decompress(b) == bufs[k].tobytes()


def test_pallas_deep_two_pass_bit_exact_single_chunk():
    """The 2-cost-pass deep tier: Pallas vs XLA, B=1 (per-chunk lc tables
    are exact when a chunk's DP lanes fill whole 1024-lane blocks; at
    B=1 the single chunk owns the only block)."""
    rng = np.random.default_rng(7)
    N = 1 << 16
    raw = (open("/root/reference/README.md", "rb").read() * 20)[:N]
    bufs = np.frombuffer(raw, np.uint8)[None, :]
    lengths = np.array([N], np.int32)
    bfinal = np.array([True])

    w_ref, t_ref = to.compress_chunks_optimal_deep(
        jnp.asarray(bufs), jnp.asarray(lengths), jnp.asarray(bfinal)
    )
    w_pal, t_pal = to.compress_chunks_optimal_deep_pallas(
        jnp.asarray(bufs), jnp.asarray(lengths), jnp.asarray(bfinal),
        interpret=True,
    )
    w_ref, t_ref, w_pal, t_pal = map(np.asarray, (w_ref, t_ref, w_pal, t_pal))
    assert np.array_equal(t_ref, t_pal)
    a = device_stream_to_bytes(w_ref[0], t_ref[0])
    b = device_stream_to_bytes(w_pal[0], t_pal[0])
    assert a == b
    assert zlib.decompressobj(-15).decompress(b) == raw


def test_lean_tier_roundtrip():
    """The bench headline tier (passes=1, dense2 ladder, raw C, no
    round-2 relaxation, 11-bit codes, packed un-permutes): round-trip
    vs zlib on mixed content, interpret mode."""
    rng = np.random.default_rng(11)
    N = 1 << 16
    txt = (open("/root/reference/README.md", "rb").read() * 20)[:N]
    rec = np.tile(rng.integers(0, 256, 64, dtype=np.uint8), N // 64)
    noise = rng.integers(0, 256, N, dtype=np.uint8)
    rec = np.where(rng.random(N) < 0.05, noise, rec).astype(np.uint8)
    bufs = np.stack([np.frombuffer(txt, np.uint8), rec])
    lengths = np.array([N, N], np.int32)
    bfinal = np.array([False, True])

    w, t = to.compress_chunks_lean_pallas(
        jnp.asarray(bufs), jnp.asarray(lengths), jnp.asarray(bfinal),
        interpret=True,
    )
    w, t = np.asarray(w), np.asarray(t)
    for k in range(2):
        s = device_stream_to_bytes(w[k], t[k])
        assert zlib.decompressobj(-15).decompress(s) == bufs[k].tobytes()


def test_multi_block_emit_roundtrip():
    """emit_blocks > 1: per-block dynamic tables over a shared window —
    headers/bodies/EOBs ride one premerge stream.  Round-trip via zlib
    on mixed content incl. static/stored-ish and all-zero blocks."""
    import functools

    import jax

    rng = np.random.default_rng(13)
    N = 1 << 17
    survey = (open("/root/repo/SURVEY.md", "rb").read() * 40)[:N]
    rec = np.tile(rng.integers(0, 256, 64, dtype=np.uint8), N // 64)
    noise = rng.integers(0, 256, N, dtype=np.uint8)
    rec = np.where(rng.random(N) < 0.05, noise, rec).astype(np.uint8)
    datas = [survey, rec.tobytes(),
             rng.integers(0, 256, N, dtype=np.uint8).tobytes(), bytes(N)]
    bufs = np.stack([np.frombuffer(d, np.uint8) for d in datas])
    fn = jax.jit(functools.partial(
        to._compress_chunks_optimal_pallas, depth=6, two_pass=False,
        hash3=False, passes=1, use_content=False, use_wide=False,
        ladder=to.LEN_LADDER_DENSE2, ext_c=False, strides2=(), refine=0,
        lit_sample=32, emit_blocks=4, interpret=True))
    w, t = fn(jnp.asarray(bufs), jnp.full(4, N, jnp.int32),
              jnp.ones(4, bool))
    w, t = np.asarray(w), np.asarray(t)
    for i, d in enumerate(datas):
        s = device_stream_to_bytes(w[i], t[i])
        assert zlib.decompress(s, -15) == d, i
