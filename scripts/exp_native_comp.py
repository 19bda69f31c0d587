"""Same-moment native-vs-reference compress sweep on the bench corpus."""
import ctypes
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from libdeflate_tpu import native_backend

CHUNK = 1 << 20


def main():
    from bench import make_corpus
    corpus = make_corpus(16)
    path = "/tmp/comp_corpus.bin"
    open(path, "wb").write(corpus)
    nch = len(corpus) // CHUNK
    chunks = [corpus[i * CHUNK:(i + 1) * CHUNK] for i in range(nch)]

    lib = native_backend.get_lib()
    bound = CHUNK + 4096
    out = ctypes.create_string_buffer(bound)

    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 5, 6, 9, 12]
    for lvl in levels:
        ours_best, ours_c = float("inf"), 0
        ref_best, ref_c = 0.0, 0
        for _ in range(3):
            t0 = time.perf_counter()
            comp = 0
            for ch in chunks:
                comp += lib.ld_deflate_compress(lvl, ch, len(ch), out, bound)
            ours_best = min(ours_best, time.perf_counter() - t0)
            ours_c = comp
            o = subprocess.run(["/tmp/refcomp", path, str(lvl), "1"],
                               capture_output=True, text=True).stdout.split()
            ref_best = max(ref_best, float(o[0]))
            ref_c = int(o[1])
        ours = len(corpus) / ours_best / 1e6
        print(f"L{lvl:<2d}: ours {ours:7.1f} MB/s {ours_c/len(corpus)*100:6.3f}%"
              f"   ref {ref_best:7.1f} MB/s {ref_c/len(corpus)*100:6.3f}%"
              f"   speed {ours/ref_best:.3f}x", flush=True)


if __name__ == "__main__":
    main()
