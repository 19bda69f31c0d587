"""Dynamic-Huffman device pipeline tests (CPU backend; same code as TPU).

Mirrors the reference's block-type coverage: dynamic blocks must
round-trip through the zlib oracle and through our own decoder, and the
per-chunk dynamic/static choice must never lose to the static-only path
(cf. the block-type compare at lib/deflate_compress.c:1748-1814)."""

import zlib

import numpy as np
import pytest

import libdeflate_tpu as ld


@pytest.fixture(scope="module")
def dyn():
    import jax.numpy as jnp

    from libdeflate_tpu.compress import tpu_dynamic as td
    from libdeflate_tpu.compress import tpu_pipeline as tp

    return td, tp, jnp


N = 8192


def make_chunks(payloads, n=N):
    bufs = np.zeros((len(payloads), n), dtype=np.uint8)
    lens = np.zeros(len(payloads), dtype=np.int32)
    for i, p in enumerate(payloads):
        bufs[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
        lens[i] = len(p)
    return bufs, lens


class TestDynamicBlocks:
    def test_roundtrip_mixed_payloads(self, dyn, rng):
        td, tp, jnp = dyn
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
        words, totals = td.compress_chunks_dynamic(
            jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(len(lens), bool)
        )
        words, totals = np.asarray(words), np.asarray(totals)
        d = ld.Decompressor()
        for i, p in enumerate(payloads):
            stream = tp.device_stream_to_bytes(words[i], totals[i])
            assert zlib.decompressobj(-15).decompress(stream) == p, i
            res, out, ain, aout = d.deflate_decompress(
                stream, len(p), known_size=True
            )
            assert res == ld.SUCCESS and out == p, i

    def test_beats_or_matches_static(self, dyn, rng):
        td, tp, jnp = dyn
        payloads = [
            (b"a common phrase repeated often. " * 400)[:N],
            rng.integers(0, 256, size=N, dtype=np.uint8).tobytes(),
            rng.integers(97, 103, size=N, dtype=np.uint8).tobytes(),
        ]
        bufs, lens = make_chunks(payloads)
        _, t_dyn = td.compress_chunks_dynamic(
            jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(len(lens), bool)
        )
        _, t_sta = tp.compress_chunks_static(
            jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(len(lens), bool)
        )
        # identical parse; dynamic picks the cheaper block type per chunk,
        # so it can never lose by more than the 2-byte rounding slack
        assert (np.asarray(t_dyn) <= np.asarray(t_sta) + 16).all()

    def test_text_ratio_improves_on_static(self, dyn, rng):
        td, tp, jnp = dyn
        words = (b"alpha bravo charlie delta echo foxtrot golf hotel india "
                 b"juliet kilo lima mike november oscar papa").split()
        text = b" ".join(words[i] for i in rng.integers(0, len(words), 2000))[:N]
        bufs, lens = make_chunks([text])
        _, t_dyn = td.compress_chunks_dynamic(
            jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(1, bool)
        )
        _, t_sta = tp.compress_chunks_static(
            jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(1, bool)
        )
        assert int(np.asarray(t_dyn)[0]) < int(np.asarray(t_sta)[0])

    def test_full_scale_chunk(self, dyn, rng):
        """1 MiB chunks exercise the production shapes: 32x32768 sort
        segments, the two-pass window, and prefix-sum exactness at the
        sizes where f32/int32 overflow bugs would hide."""
        import zlib

        td, tp, jnp = dyn
        from libdeflate_tpu.compress.tpu_dynamic import compress_chunks_dynamic2

        n = 1 << 20
        text = b"".join(
            b"word%d " % int(x) for x in rng.integers(0, 500, 40000)
        )[: n // 2]
        data = text + rng.integers(0, 256, n - len(text), np.uint8).tobytes()
        buf = np.frombuffer(data, np.uint8)[None, :]
        w, t = compress_chunks_dynamic2(
            jnp.asarray(buf), jnp.asarray([n], np.int32), jnp.asarray([True])
        )
        stream = tp.device_stream_to_bytes(
            np.asarray(w)[0], int(np.asarray(t)[0])
        )
        assert zlib.decompressobj(-15).decompress(stream) == data
        assert len(stream) < n  # half-compressible input must shrink

    def test_segment_boundary_lengths(self, dyn, rng):
        """Lengths straddling the sort/FSM segment boundaries inside a
        big-shape buffer (the N >= 32768 code path with the two-pass
        window) — where padding/masking bugs would live."""
        import zlib
        from libdeflate_tpu.compress.tpu_dynamic import compress_chunks_dynamic2

        td, tp, jnp = dyn
        n = 1 << 16
        lens = [0, 1, 3, 511, 512, 513, 16384, 16385, 32768, 32769, 65535]
        payloads = [rng.integers(0, 200, l, np.uint8).tobytes() for l in lens]
        bufs, plens = make_chunks(payloads, n=n)
        w, t = compress_chunks_dynamic2(
            jnp.asarray(bufs), jnp.asarray(plens),
            jnp.asarray([i % 2 == 0 for i in range(len(payloads))]),
        )
        w, t = np.asarray(w), np.asarray(t)
        for i, p in enumerate(payloads):
            s = tp.device_stream_to_bytes(w[i], t[i])
            assert zlib.decompressobj(-15).decompress(s) == p, lens[i]

    def test_fuzz_roundtrip(self, dyn, rng):
        td, tp, jnp = dyn
        payloads = []
        for trial in range(12):
            ln = int(rng.integers(0, N))
            kind = trial % 3
            if kind == 0:
                data = rng.integers(0, 256, ln, np.uint8).tobytes()
            elif kind == 1:
                data = (b"abcdefgh" * 4096)[:ln]
            else:
                data = (rng.integers(0, 6, max(ln // 5, 1), np.uint8).tobytes() * 6)[:ln]
            payloads.append(data)
        bufs, lens = make_chunks(payloads)
        words, totals = td.compress_chunks_dynamic(
            jnp.asarray(bufs), jnp.asarray(lens),
            jnp.asarray([i % 2 == 0 for i in range(len(payloads))]),
        )
        words, totals = np.asarray(words), np.asarray(totals)
        for i, p in enumerate(payloads):
            stream = tp.device_stream_to_bytes(words[i], totals[i])
            assert zlib.decompressobj(-15).decompress(stream) == p, i


class TestRatioRegression:
    def test_mixed_corpus_ratio_bounds(self, dyn, rng):
        """Pin the compression quality floor on a fixed mixed mini-corpus so
        parse/code changes cannot silently regress ratio."""
        import zlib
        from libdeflate_tpu.compress.tpu_dynamic import compress_chunks_dynamic
        from libdeflate_tpu.compress.tpu_pipeline import compress_chunks_static

        td, tp, jnp = dyn
        n = 1 << 16
        words = (b"alpha bravo charlie delta echo foxtrot golf hotel india "
                 b"juliet kilo lima mike november oscar papa").split()
        text = b" ".join(words[i] for i in rng.integers(0, len(words), 20000))[:n]
        rec = rng.integers(0, 256, 64, np.uint8).tobytes() * (n // 64)
        payloads = [text, rec, b"\x00" * n]
        bufs, lens = make_chunks(payloads, n=n)
        _, t_dyn = compress_chunks_dynamic(
            jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(3, bool)
        )
        sizes = (np.asarray(t_dyn) + 7) // 8
        # bounds chosen ~10% above current measured sizes
        assert sizes[0] < 0.43 * n, ("text", sizes[0])
        assert sizes[1] < 0.02 * n, ("records", sizes[1])
        assert sizes[2] < 600, ("zeros", sizes[2])
        _, t_sta = compress_chunks_static(
            jnp.asarray(bufs), jnp.asarray(lens), jnp.ones(3, bool)
        )
        assert (np.asarray(t_dyn) <= np.asarray(t_sta) + 16).all()


def test_wide_window_single_pass_roundtrip(rng):
    """The single-pass tier's 128 KiB matchfind segments (17-bit local
    positions; junk bucket collapsed onto the top real hash) only engage for
    chunks >= 128 KiB — exercise that path explicitly with content whose
    matches span farther back than a 64 KiB segment could reach."""
    import zlib

    import jax.numpy as jnp

    from libdeflate_tpu.compress.tpu_dynamic import compress_chunks_dynamic
    from libdeflate_tpu.compress.tpu_pipeline import device_stream_to_bytes

    n = 1 << 18  # 256 KiB: two wide segments
    piece = rng.integers(0, 256, size=50000, dtype=np.uint8).tobytes()
    data = (
        piece
        + rng.integers(97, 123, size=30000, dtype=np.uint8).tobytes()
        + piece
        + (b"the quick brown fox jumps over the lazy dog. " * 3000)
    )[:n]
    bufs = np.frombuffer(data, np.uint8)[None, :].copy()
    w, t = compress_chunks_dynamic(
        jnp.asarray(bufs), jnp.full(1, n, jnp.int32), jnp.ones(1, bool)
    )
    stream = device_stream_to_bytes(np.asarray(w)[0], np.asarray(t)[0])
    assert zlib.decompressobj(-15).decompress(stream) == data


def test_wide_window_partial_tail_chunk(rng):
    """Short live prefix in a large padded chunk: the adaptive min-match
    sampling must ignore padding bytes (regression: padding zeros counted
    as the alphabet and over-raised min_len on tail chunks)."""
    import zlib

    import jax.numpy as jnp

    from libdeflate_tpu.compress.tpu_dynamic import compress_chunks_dynamic
    from libdeflate_tpu.compress.tpu_pipeline import device_stream_to_bytes

    n_buf = 1 << 18
    live = 2000
    data = (b"abcdefgh_ijklmnop " * 200)[:live]
    buf = np.zeros(n_buf, np.uint8)
    buf[:live] = np.frombuffer(data, np.uint8)
    w, t = compress_chunks_dynamic(
        jnp.asarray(buf[None, :]), jnp.full(1, live, jnp.int32),
        jnp.ones(1, bool),
    )
    stream = device_stream_to_bytes(np.asarray(w)[0], np.asarray(t)[0])
    out = zlib.decompressobj(-15).decompress(stream)
    assert out == data
    # repetitive 18-byte-period text must actually compress (matches kept)
    assert len(stream) < live // 2
