"""CLI behavioral tests (role parity: scripts/gzip_tests.sh + exec_tests.sh).

Run the programs as real subprocesses against system gzip artifacts and
vice versa — the same implementation-mixing strategy the reference uses.
"""

import os
import subprocess
import sys
import zlib

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}


def run_prog(mod, *args, data=None):
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        input=data, capture_output=True, env=ENV, cwd=REPO,
    )


class TestGzipCLI:
    def test_compress_decompress_file(self, tmp_path, rng):
        p = tmp_path / "data.txt"
        payload = b"some test data for the cli " * 500
        p.write_bytes(payload)
        r = run_prog("libdeflate_tpu.programs.gzip_cli", "-k", str(p))
        assert r.returncode == 0, r.stderr
        gz = tmp_path / "data.txt.gz"
        assert gz.exists() and p.exists()
        # system gzip can read our output
        out = subprocess.run(["gunzip", "-c", str(gz)], capture_output=True)
        assert out.stdout == payload
        # our CLI decompresses (overwriting source needs -f since -k kept it)
        r = run_prog("libdeflate_tpu.programs.gzip_cli", "-d", "-f", str(gz))
        assert r.returncode == 0, r.stderr
        assert p.read_bytes() == payload
        assert not gz.exists()

    def test_decompress_system_gzip_output(self, tmp_path):
        payload = b"made by gnu gzip " * 300
        p = tmp_path / "x"
        p.write_bytes(payload)
        subprocess.run(["gzip", str(p)], check=True)
        r = run_prog(
            "libdeflate_tpu.programs.gzip_cli", "-d", "-c", str(p) + ".gz"
        )
        assert r.returncode == 0 and r.stdout == payload

    def test_stdin_stdout(self):
        payload = b"stream me please " * 100
        r = run_prog("libdeflate_tpu.programs.gzip_cli", "-c", "-", data=payload)
        assert r.returncode == 0
        assert zlib.decompress(r.stdout, 31) == payload
        r2 = run_prog("libdeflate_tpu.programs.gzip_cli", "-d", "-c", "-", data=r.stdout)
        assert r2.returncode == 0 and r2.stdout == payload

    def test_test_mode_and_levels(self, tmp_path):
        payload = bytes(range(256)) * 100
        p = tmp_path / "lv"
        for level in ("-1", "-9", "-12"):
            p.write_bytes(payload)
            r = run_prog("libdeflate_tpu.programs.gzip_cli", level, "-f", str(p))
            assert r.returncode == 0, (level, r.stderr)
            r = run_prog("libdeflate_tpu.programs.gzip_cli", "-t", str(p) + ".gz")
            assert r.returncode == 0
            r = run_prog("libdeflate_tpu.programs.gzip_cli", "-d", "-f", str(p) + ".gz")
            assert r.returncode == 0 and p.read_bytes() == payload

    def test_corrupt_rejected(self, tmp_path):
        p = tmp_path / "bad.gz"
        p.write_bytes(b"\x1f\x8b\x08\x00garbagegarbage")
        r = run_prog("libdeflate_tpu.programs.gzip_cli", "-t", str(p))
        assert r.returncode != 0

    def test_multimember(self, tmp_path):
        def gz(x):
            o = zlib.compressobj(6, zlib.DEFLATED, 31)
            return o.compress(x) + o.flush()
        p = tmp_path / "mm.gz"
        p.write_bytes(gz(b"hello ") + gz(b"world"))
        r = run_prog("libdeflate_tpu.programs.gzip_cli", "-d", "-c", str(p))
        assert r.returncode == 0 and r.stdout == b"hello world"


class TestBenchmarkProgram:
    def test_roundtrip_engines(self, tmp_path, rng):
        p = tmp_path / "bench.dat"
        p.write_bytes(rng.integers(97, 105, size=100000, dtype=np.uint8).tobytes())
        for extra in ([], ["-g"], ["-z"], ["-C", "zlib"], ["-D", "zlib"]):
            r = run_prog(
                "libdeflate_tpu.programs.benchmark", "-6", "-s", "32768",
                *extra, str(p),
            )
            assert r.returncode == 0, (extra, r.stderr.decode())
            assert b"Compressed" in r.stdout


class TestBenchmarkTpuEngine:
    def test_device_engine_roundtrip(self, tmp_path, rng):
        p = tmp_path / "dev.dat"
        p.write_bytes(rng.integers(97, 105, size=30000, dtype=np.uint8).tobytes())
        r = run_prog(
            "libdeflate_tpu.programs.benchmark", "-1", "-s", "8192",
            "-g", "-C", "ours-tpu", str(p),
        )
        assert r.returncode == 0, r.stderr.decode()
        assert b"Compressed" in r.stdout


class TestChecksumProgram:
    def test_crc_and_adler(self, tmp_path):
        p = tmp_path / "c.dat"
        payload = b"checksum me" * 1000
        p.write_bytes(payload)
        r = run_prog("libdeflate_tpu.programs.checksum", str(p))
        assert r.returncode == 0
        assert r.stdout.split()[0] == f"{zlib.crc32(payload):08x}".encode()
        r = run_prog("libdeflate_tpu.programs.checksum", "-A", str(p))
        assert r.stdout.split()[0] == f"{zlib.adler32(payload):08x}".encode()
        # -Z differential engine agrees
        r2 = run_prog("libdeflate_tpu.programs.checksum", "-Z", str(p))
        assert r2.stdout.split()[0] == f"{zlib.crc32(payload):08x}".encode()
