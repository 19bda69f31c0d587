"""Device decoder tests (CPU-backend JAX; same code path as TPU)."""

import zlib

import numpy as np
import pytest

import libdeflate_tpu as ld


@pytest.fixture(scope="module")
def dec():
    import jax.numpy as jnp

    from libdeflate_tpu.decompress import tpu as dtpu

    return dtpu, jnp


N = 8192
OUT = 16384


def pack(comp, n=N):
    buf = np.zeros(n, np.uint8)
    buf[: len(comp)] = np.frombuffer(comp, np.uint8)
    return buf


def raw(data, level=6):
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


class TestDeviceDecode:
    def test_zlib_streams_batch(self, dec, rng):
        dtpu, jnp = dec
        payloads = [
            b"hello world " * 100,
            rng.integers(0, 256, size=4000, dtype=np.uint8).tobytes(),
            b"\x01" * 5000,
            rng.integers(97, 103, size=7000, dtype=np.uint8).tobytes(),
        ]
        comps = [raw(p, l) for p in payloads for l in (1, 9)]
        expect = [p for p in payloads for _ in (1, 9)]
        bufs = np.stack([pack(c) for c in comps])
        lens = np.array([len(c) for c in comps], np.int32)
        outs, olens, ains, results = dtpu.decompress_chunks(
            jnp.asarray(bufs), jnp.asarray(lens), OUT
        )
        outs, olens, ains, results = map(np.asarray, (outs, olens, ains, results))
        for i, p in enumerate(expect):
            assert results[i] == 0 and olens[i] == len(p)
            assert outs[i, : len(p)].tobytes() == p
            assert ains[i] == len(comps[i])

    def test_device_compress_device_decode(self, dec, rng):
        """Full on-device round trip: TPU pipeline -> TPU decoder."""
        dtpu, jnp = dec
        from libdeflate_tpu.compress.tpu_pipeline import (
            compress_chunks_static,
            device_stream_to_bytes,
        )

        payloads = [
            (b"compression is fun, compression is fast. " * 150)[:N],
            rng.integers(97, 105, size=N, dtype=np.uint8).tobytes(),
        ]
        bufs = np.stack([pack(p) for p in payloads])
        lens = np.array([len(p) for p in payloads], np.int32)
        words, totals = compress_chunks_static(
            jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(2, bool)
        )
        streams = [
            device_stream_to_bytes(np.asarray(words)[i], np.asarray(totals)[i])
            for i in range(2)
        ]
        cbufs = np.stack([pack(s, 2 * N) for s in streams])
        clens = np.array([len(s) for s in streams], np.int32)
        outs, olens, ains, results = dtpu.decompress_chunks(
            jnp.asarray(cbufs), jnp.asarray(clens), OUT
        )
        outs, olens, results = map(np.asarray, (outs, olens, results))
        for i, p in enumerate(payloads):
            assert results[i] == 0 and olens[i] == len(p)
            assert outs[i, : len(p)].tobytes() == p

    def test_incomplete_code_cases(self, dec):
        """zlib-compat incomplete-code acceptance on device (reference:
        test_incomplete_codes.c role)."""
        dtpu, jnp = dec
        from libdeflate_tpu.compress.emit import BitWriter

        # dynamic block with a single-len-1-codeword offset code is what
        # zlib emits for e.g. b'aaaa...' — verify via a real zlib stream
        comp = raw(b"a" * 200, 9)
        out, olen, ain, res = dtpu.deflate_decompress_chunk(
            jnp.asarray(pack(comp)), jnp.int32(len(comp)), OUT
        )
        assert int(np.asarray(res)) == 0
        assert np.asarray(out)[: int(np.asarray(olen))].tobytes() == b"a" * 200

    def test_errors(self, dec):
        dtpu, jnp = dec
        cases = [
            b"\x07garbage",          # reserved block type
            b"\x01\x05\x00\x00\x00h",  # stored NLEN mismatch
            raw(b"x" * 1000)[:8],      # truncated
        ]
        for blob in cases:
            _, _, _, res = dtpu.deflate_decompress_chunk(
                jnp.asarray(pack(blob)), jnp.int32(len(blob)), OUT
            )
            assert int(np.asarray(res)) == ld.BAD_DATA, blob.hex()

    def test_insufficient_space(self, dec):
        dtpu, jnp = dec
        data = b"spacious " * 200
        comp = raw(data)
        _, _, _, res = dtpu.deflate_decompress_chunk(
            jnp.asarray(pack(comp)), jnp.int32(len(comp)), 64
        )
        assert int(np.asarray(res)) == ld.INSUFFICIENT_SPACE

    def test_agrees_with_host_on_garbage(self, dec, rng):
        dtpu, jnp = dec
        from libdeflate_tpu.decompress import host as pyhost

        for _ in range(40):
            blob = rng.integers(
                0, 256, size=int(rng.integers(1, 64)), dtype=np.uint8
            ).tobytes()
            _, olen, _, res = dtpu.deflate_decompress_chunk(
                jnp.asarray(pack(blob)), jnp.int32(len(blob)), OUT
            )
            rp = pyhost.deflate_decompress(blob, OUT, False)
            assert int(np.asarray(res)) == rp[0], blob.hex()
