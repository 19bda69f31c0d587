"""Strict A/B of two native .so builds (same process, interleaved), plus
the reference decoder via /tmp/refdecomp on identical streams."""
import ctypes
import struct
import subprocess
import sys
import time
import zlib

sys.path.insert(0, "/root/repo")

from scripts.exp_native_decomp import make_cases, CHUNK


def load(path):
    lib = ctypes.CDLL(path)
    lib.ld_deflate_decompress.restype = ctypes.c_int
    lib.ld_deflate_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_int, ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_size_t)]
    return lib


def run_one(lib, comps, raws):
    outs = [ctypes.create_string_buffer(len(r)) for r in raws]
    ai, ao = ctypes.c_size_t(), ctypes.c_size_t()
    t0 = time.perf_counter()
    for c, r, ob in zip(comps, raws, outs):
        rc = lib.ld_deflate_decompress(c, len(c), ob, len(r), 1,
                                       ctypes.byref(ai), ctypes.byref(ao))
        assert rc == 0
    dt = time.perf_counter() - t0
    for r, ob in zip(raws, outs):
        assert ob.raw == r
    return dt


def ref_mbps(comps, raws, name):
    path = f"/tmp/refdec_{name}.bin"
    with open(path, "wb") as f:
        f.write(struct.pack("<I", len(comps)))
        for c, r in zip(comps, raws):
            f.write(struct.pack("<II", len(c), len(r)))
            f.write(c)
    out = subprocess.run(["/tmp/refdecomp", path, "1"],
                         capture_output=True, text=True, timeout=600).stdout
    return float(out.strip())


def main(libs):
    named = [(p.split("/")[-1], load(p)) for p in libs]
    for name, data in make_cases().items():
        nch = len(data) // CHUNK
        raws = [data[i*CHUNK:(i+1)*CHUNK] for i in range(nch)]
        comps = []
        for r in raws:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            comps.append(c.compress(r) + c.flush())
        best = {n: float("inf") for n, _ in named}
        refb = 0.0
        for _ in range(5):
            for n, lib in named:
                best[n] = min(best[n], run_one(lib, comps, raws))
            refb = max(refb, ref_mbps(comps, raws, name))
        row = "  ".join(f"{n}: {len(data)/best[n]/1e6:7.1f}" for n, _ in named)
        print(f"{name:8s}: {row}  ref: {refb:7.1f} MB/s")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/ldtpu_old.so", "/tmp/ldtpu_new.so"])
