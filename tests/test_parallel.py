"""Multi-device chunk-DP tests on the virtual 8-device CPU mesh."""

import zlib

import numpy as np
import pytest

import libdeflate_tpu as ld


@pytest.fixture(scope="module")
def mesh():
    import jax

    from libdeflate_tpu.parallel import mesh as mm

    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return mm.make_chunk_mesh()


class TestChunkDP:
    def test_gzip_dp_roundtrip(self, mesh, rng):
        from libdeflate_tpu.parallel.file_codec import gzip_compress_dp

        data = (open("/root/repo/SURVEY.md", "rb").read() * 3)[: 300 * 1024]
        out = gzip_compress_dp(data, mesh, chunk_size=32 * 1024)
        assert zlib.decompress(out, 31) == data
        d = ld.Decompressor()
        res, got, ain, aout = d.gzip_decompress(out, len(data), known_size=True)
        assert res == ld.SUCCESS and got == data
        assert ain == len(out)

    def test_zlib_dp_roundtrip(self, mesh, rng):
        from libdeflate_tpu.parallel.file_codec import zlib_compress_dp

        data = rng.integers(97, 110, size=200000, dtype=np.uint8).tobytes()
        out = zlib_compress_dp(data, mesh, chunk_size=16 * 1024)
        assert zlib.decompress(out) == data

    def test_incompressible_stored_fallback(self, mesh, rng):
        from libdeflate_tpu.parallel.file_codec import deflate_compress_dp

        data = rng.integers(0, 256, size=150000, dtype=np.uint8).tobytes()
        stream, crc, adler = deflate_compress_dp(data, mesh, chunk_size=16 * 1024)
        # bound contract: stored fallback keeps us under the bound + sync markers
        nchunks = -(-len(data) // (16 * 1024))
        assert len(stream) <= ld.deflate_compress_bound(len(data)) + 5 * nchunks
        assert zlib.decompressobj(-15).decompress(stream) == data
        assert crc == zlib.crc32(data)
        assert adler == zlib.adler32(data)

    def test_empty_and_tiny(self, mesh):
        from libdeflate_tpu.parallel.file_codec import gzip_compress_dp

        for data in (b"", b"x", b"ab" * 3):
            out = gzip_compress_dp(data, mesh, chunk_size=1024)
            assert zlib.decompress(out, 31) == data

    def test_chunk_boundary_exact(self, mesh, rng):
        from libdeflate_tpu.parallel.file_codec import gzip_compress_dp

        cs = 8192
        for n in (cs - 1, cs, cs + 1, 8 * cs, 8 * cs + 17):
            data = rng.integers(97, 105, size=n, dtype=np.uint8).tobytes()
            out = gzip_compress_dp(data, mesh, chunk_size=cs)
            assert zlib.decompress(out, 31) == data, n
