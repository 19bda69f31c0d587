"""Device compress pipeline tests (CPU-backend JAX; same code path as TPU)."""

import zlib

import numpy as np
import pytest

import libdeflate_tpu as ld


@pytest.fixture(scope="module")
def pipeline():
    import jax.numpy as jnp

    from libdeflate_tpu.compress import tpu_pipeline as tp

    return tp, jnp


N = 8192


def make_chunks(payloads, n=N):
    bufs = np.zeros((len(payloads), n), dtype=np.uint8)
    lens = np.zeros(len(payloads), dtype=np.int32)
    for i, p in enumerate(payloads):
        bufs[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
        lens[i] = len(p)
    return bufs, lens


class TestDeviceCompress:
    def test_roundtrip_mixed_payloads(self, pipeline, rng):
        tp, jnp = pipeline
        payloads = [
            b"",
            b"a",
            b"abcd" * 2048,
            (b"the quick brown fox jumps over the lazy dog. " * 200)[:N],
            rng.integers(0, 256, size=N, dtype=np.uint8).tobytes(),
            rng.integers(97, 105, size=N, dtype=np.uint8).tobytes(),
            b"\x00" * N,
            bytes(range(256)) * (N // 256),
        ]
        bufs, lens = make_chunks(payloads)
        words, totals = tp.compress_chunks_static(jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(len(lens), bool))
        words, totals = np.asarray(words), np.asarray(totals)
        d = ld.Decompressor()
        for i, p in enumerate(payloads):
            stream = tp.device_stream_to_bytes(words[i], totals[i])
            # zlib oracle
            assert zlib.decompressobj(-15).decompress(stream) == p, i
            # our decoder, known-size mode
            res, out, ain, aout = d.deflate_decompress(stream, len(p), known_size=True)
            assert res == ld.SUCCESS and out == p, i
            assert ain == len(stream)

    def test_compresses_text(self, pipeline):
        tp, jnp = pipeline
        text = (b"a common phrase repeated often. " * 400)[:N]
        bufs, lens = make_chunks([text])
        words, totals = tp.compress_chunks_static(jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(len(lens), bool))
        nbytes = (int(np.asarray(totals)[0]) + 7) // 8
        assert nbytes < len(text) // 3  # must actually compress

    def test_matches_within_window_only(self, pipeline, rng):
        # A chunk larger than 32769+ ensures distance masking is exercised:
        # repeat a rare pattern > 32768 apart; stream must stay valid.
        tp, jnp = pipeline
        n = 1 << 16
        buf = rng.integers(0, 256, size=n, dtype=np.uint8)
        pat = np.frombuffer(b"UNIQUEPATTERN!", dtype=np.uint8)
        buf[100 : 100 + len(pat)] = pat
        buf[100 + 40000 : 100 + 40000 + len(pat)] = pat
        data = buf.tobytes()
        bufs, lens = make_chunks([data], n=n)
        words, totals = tp.compress_chunks_static(jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(len(lens), bool))
        stream = tp.device_stream_to_bytes(np.asarray(words)[0], np.asarray(totals)[0])
        assert zlib.decompressobj(-15).decompress(stream) == data
