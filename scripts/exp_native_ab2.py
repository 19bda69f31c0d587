"""Interleaved A/B of two native .so builds (old vs new) on the bench corpus.

Usage: python scripts/exp_native_ab2.py /tmp/old_native.so /tmp/new_native.so 1 2 5 6
Interleaves timing within one process so host clock drift cancels.
"""
import ctypes
import sys
import time

sys.path.insert(0, "/root/repo")

CHUNK = 1 << 20


def load(path):
    lib = ctypes.CDLL(path)
    lib.ld_deflate_compress.restype = ctypes.c_size_t
    lib.ld_deflate_compress.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t]
    return lib


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    levels = [int(x) for x in sys.argv[3:]] or [1, 2, 5, 6]
    a, b = load(a_path), load(b_path)

    from bench import make_corpus
    corpus = make_corpus(16)
    nch = len(corpus) // CHUNK
    chunks = [corpus[i * CHUNK:(i + 1) * CHUNK] for i in range(nch)]
    bound = CHUNK + 4096
    out = ctypes.create_string_buffer(bound)

    for lvl in levels:
        ta_best, tb_best = float("inf"), float("inf")
        ca = cb = 0
        for _ in range(5):
            for lib, which in ((a, "a"), (b, "b")):
                t0 = time.perf_counter()
                comp = 0
                for ch in chunks:
                    comp += lib.ld_deflate_compress(lvl, ch, len(ch), out, bound)
                dt = time.perf_counter() - t0
                if which == "a":
                    ta_best = min(ta_best, dt); ca = comp
                else:
                    tb_best = min(tb_best, dt); cb = comp
        sa = len(corpus) / ta_best / 1e6
        sb = len(corpus) / tb_best / 1e6
        print(f"L{lvl:<2d}: A {sa:7.1f} MB/s {ca/len(corpus)*100:6.3f}%"
              f"   B {sb:7.1f} MB/s {cb/len(corpus)*100:6.3f}%"
              f"   B/A {sb/sa:.3f}x", flush=True)


if __name__ == "__main__":
    main()
