"""Checksum tests vs the zlib oracle (reference: programs/test_checksums.c).

Randomized sizes/initial values, multipart splits, the Adler s2-overflow edge
(5553 bytes of 0xFF with max initial state), and host-vs-device agreement
(the analogue of the reference's forced-dispatch SIMD-variant testing).
"""

import zlib

import numpy as np
import pytest

from libdeflate_tpu.ops import checksums_host as host
from libdeflate_tpu.ops.crc32_math import crc32_combine


class TestHostAdler32:
    def test_empty(self):
        assert host.adler32(b"") == 1
        assert host.adler32(b"", 0xDEADBEEF) == 0xDEADBEEF

    def test_random_vs_zlib(self, rng):
        for _ in range(30):
            n = int(rng.integers(0, 40000))
            data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            init = int(rng.integers(0, 2**32))
            assert host.adler32(data, init) == zlib.adler32(data, init)

    def test_s2_overflow_edge(self):
        # programs/test_checksums.c: 5553 bytes of 0xFF with max initial state
        data = b"\xff" * 5553
        init = 0xFFFFFFFF
        assert host.adler32(data, init) == zlib.adler32(data, init)

    def test_multipart_splits(self, rng):
        data = rng.integers(0, 256, size=10000, dtype=np.uint8).tobytes()
        whole = host.adler32(data)
        for _ in range(10):
            cut = int(rng.integers(0, len(data)))
            a = host.adler32(data[:cut])
            assert host.adler32(data[cut:], a) == whole

    def test_combine(self, rng):
        a = rng.integers(0, 256, size=5000, dtype=np.uint8).tobytes()
        b = rng.integers(0, 256, size=7777, dtype=np.uint8).tobytes()
        comb = host.adler32_combine(host.adler32(a), host.adler32(b), len(b))
        assert comb == host.adler32(a + b)


class TestHostCrc32:
    def test_empty(self):
        assert host.crc32(b"") == 0
        assert host.crc32(b"", 123) == 123

    def test_known_value(self):
        assert host.crc32(b"123456789") == 0xCBF43926

    def test_random_vs_zlib(self, rng):
        for _ in range(30):
            n = int(rng.integers(0, 40000))
            data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            init = int(rng.integers(0, 2**32))
            assert host.crc32(data, init) == zlib.crc32(data, init)

    def test_multipart_splits(self, rng):
        data = rng.integers(0, 256, size=10000, dtype=np.uint8).tobytes()
        whole = host.crc32(data)
        for _ in range(10):
            cut = int(rng.integers(0, len(data)))
            c = host.crc32(data[:cut])
            assert host.crc32(data[cut:], c) == whole

    def test_combine(self, rng):
        a = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
        b = rng.integers(0, 256, size=9999, dtype=np.uint8).tobytes()
        comb = crc32_combine(host.crc32(a), host.crc32(b), len(b))
        assert comb == host.crc32(a + b)


class TestDeviceChecksums:
    """JAX kernels vs host/zlib on padded chunk arrays."""

    @pytest.fixture(scope="class")
    def jx(self):
        import jax

        from libdeflate_tpu.ops import checksums_jax

        return checksums_jax

    def test_adler_chunks(self, jx, rng):
        import jax.numpy as jnp

        N = 4096
        lengths = np.array([0, 1, 17, 4096, 2048, 5, 4095, 100], dtype=np.int32)
        bufs = rng.integers(0, 256, size=(8, N), dtype=np.uint8)
        out = np.asarray(jx.adler32_chunks(jnp.asarray(bufs), jnp.asarray(lengths)))
        for i, L in enumerate(lengths):
            assert int(out[i]) == zlib.adler32(bufs[i, :L].tobytes()), i

    def test_crc_chunks(self, jx, rng):
        import jax.numpy as jnp

        N = 4096
        lengths = np.array([0, 1, 17, 4096, 2048, 5, 4095, 100], dtype=np.int32)
        bufs = rng.integers(0, 256, size=(8, N), dtype=np.uint8)
        out = np.asarray(jx.crc32_chunks(jnp.asarray(bufs), jnp.asarray(lengths)))
        for i, L in enumerate(lengths):
            assert int(out[i]) == zlib.crc32(bufs[i, :L].tobytes()), i

    def test_adler_nonzero_init(self, jx, rng):
        import jax.numpy as jnp

        buf = rng.integers(0, 256, size=1000, dtype=np.uint8)
        init = 0x12345678
        got = int(
            jx.adler32_fixed(
                jnp.asarray(buf), jnp.int32(1000), jnp.uint32(init)
            )
        )
        assert got == zlib.adler32(buf.tobytes(), init)

    def test_crc_nonzero_init(self, jx, rng):
        import jax.numpy as jnp

        buf = rng.integers(0, 256, size=1000, dtype=np.uint8)
        init = 0x87654321
        got = int(
            jx.crc32_fixed(jnp.asarray(buf), jnp.int32(1000), jnp.uint32(init))
        )
        assert got == zlib.crc32(buf.tobytes(), init) , hex(got)
