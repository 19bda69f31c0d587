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


def _compressed_chunks(data: bytes, chunk: int, ndev: int):
    """Per-chunk independent raw-DEFLATE streams (BFINAL on every chunk —
    the reference benchmark's chunked model, programs/benchmark.c:430-538),
    compressed with zlib so the decode direction is tested independently."""
    import zlib as _z

    n = len(data)
    nchunks = max(-(-n // chunk), 1)
    b = -(-nchunks // ndev) * ndev
    frags, olens = [], []
    for i in range(b):
        seg = data[i * chunk: (i + 1) * chunk]
        co = _z.compressobj(6, _z.DEFLATED, -15)
        frags.append(co.compress(seg) + co.flush())
        olens.append(len(seg))
    ncap = max(len(f) for f in frags)
    cbufs = np.zeros((b, ncap), np.uint8)
    in_lens = np.zeros(b, np.int32)
    for i, f in enumerate(frags):
        cbufs[i, : len(f)] = np.frombuffer(f, np.uint8)
        in_lens[i] = len(f)
    return cbufs, in_lens, np.asarray(olens, np.int32), nchunks


class TestChunkDecodeDP:
    """decompress_chunks_dp coverage (VERDICT r4 weak #3): round-trip with
    both decoder backends, chunk-boundary sizes, corrupt-chunk isolation,
    and the known-size (out_lens mismatch -> BAD_DATA) contract."""

    @pytest.mark.parametrize("decoder,interp", [("fsm", False),
                                                ("pallas", True)])
    def test_roundtrip_both_backends(self, mesh, rng, decoder, interp):
        from libdeflate_tpu.parallel import mesh as mm

        chunk = 512
        data = (b"mesh decode roundtrip payload / " * 40
                + rng.integers(0, 256, size=700, dtype=np.uint8).tobytes())
        cbufs, in_lens, out_lens, nchunks = _compressed_chunks(data, chunk, 8)
        dout, dlens, consumed, status, all_lens = mm.decompress_chunks_dp(
            mesh, cbufs, in_lens, out_lens, chunk,
            decoder=decoder, interpret=interp)
        dout, dlens, status = map(np.asarray, (dout, dlens, status))
        for i in range(nchunks):
            assert status[i] == 0, (decoder, i, status[i])
            lo, hi = i * chunk, min((i + 1) * chunk, len(data))
            assert dout[i, : hi - lo].tobytes() == data[lo:hi], (decoder, i)
            assert dlens[i] == hi - lo
        # the all-gathered layout matches the local lens on every shard
        assert np.asarray(all_lens)[:nchunks].tolist() == \
            dlens[:nchunks].tolist()

    @pytest.mark.parametrize("decoder,interp", [("fsm", False),
                                                ("pallas", True)])
    def test_chunk_boundary_sizes(self, mesh, rng, decoder, interp):
        from libdeflate_tpu.parallel import mesh as mm

        chunk = 256
        # last chunk exactly full / one byte short / one byte into a new chunk
        for n in (8 * chunk, 8 * chunk - 1, 7 * chunk + 1):
            data = rng.integers(97, 105, size=n, dtype=np.uint8).tobytes()
            cbufs, in_lens, out_lens, nchunks = _compressed_chunks(
                data, chunk, 8)
            dout, dlens, _, status, _ = mm.decompress_chunks_dp(
                mesh, cbufs, in_lens, out_lens, chunk,
                decoder=decoder, interpret=interp)
            dout, status = np.asarray(dout), np.asarray(status)
            assert status[:nchunks].tolist() == [0] * nchunks, n
            got = b"".join(dout[i, : int(np.asarray(dlens)[i])].tobytes()
                           for i in range(nchunks))
            assert got == data, (decoder, n)

    @pytest.mark.parametrize("decoder,interp", [("fsm", False),
                                                ("pallas", True)])
    def test_corrupt_chunk_isolated(self, mesh, rng, decoder, interp):
        """One corrupt chunk reports nonzero status; the others decode
        (per-chunk independence, the reference's per-call contract)."""
        from libdeflate_tpu.parallel import mesh as mm

        chunk = 512
        data = (b"abcdefgh" * 64 * 8)[: 8 * chunk]
        cbufs, in_lens, out_lens, nchunks = _compressed_chunks(data, chunk, 8)
        bad = 3
        cbufs = cbufs.copy()
        # destroy the block header + huffman prelude of chunk `bad`
        cbufs[bad, : min(8, in_lens[bad])] = 0xFF
        dout, dlens, _, status, _ = mm.decompress_chunks_dp(
            mesh, cbufs, in_lens, out_lens, chunk,
            decoder=decoder, interpret=interp)
        dout, status = np.asarray(dout), np.asarray(status)
        assert status[bad] != 0, decoder
        for i in range(nchunks):
            if i == bad:
                continue
            lo, hi = i * chunk, min((i + 1) * chunk, len(data))
            assert status[i] == 0 and \
                dout[i, : hi - lo].tobytes() == data[lo:hi], (decoder, i)

    def test_out_lens_mismatch_bad_data(self, mesh, rng):
        """Known-size contract at the mesh layer: produced != expected
        out_lens -> status BAD_DATA (libdeflate.h:211-246 NULL-actual_out
        semantics)."""
        from libdeflate_tpu.parallel import mesh as mm

        chunk = 512
        data = (b"0123456789abcdef" * 32 * 8)[: 8 * chunk]
        cbufs, in_lens, out_lens, nchunks = _compressed_chunks(data, chunk, 8)
        wrong = out_lens.copy()
        wrong[1] -= 7
        _, _, _, status, _ = mm.decompress_chunks_dp(
            mesh, cbufs, in_lens, wrong, chunk, decoder="fsm")
        status = np.asarray(status)
        assert status[1] == ld.BAD_DATA
        assert status[0] == 0 and status[2] == 0
