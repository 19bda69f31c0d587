"""Persistent TPU experiment driver.

The axon relay charges ~280-550 s for the FIRST jit compile in a process
(PERF_NOTES.md round 3); interactive experimentation is only viable from one
long-lived process.  This server watches a queue directory for Python
snippets and execs them in a shared namespace (so arrays, jitted functions,
and the compile cache persist between jobs):

    python scripts/jobserver.py /tmp/jobs &
    cat > /tmp/jobs/001_warmup.py   # runs when the file appears
    # output lands in /tmp/jobs/001_warmup.out, marker .done (or .err)

Snippets see `NS` (the shared dict), plus whatever earlier snippets left
there.  A job named `quit.py` stops the server.
"""

from __future__ import annotations

import io
import os
import sys
import time
import traceback


def main(qdir: str) -> None:
    os.makedirs(qdir, exist_ok=True)
    ns: dict = {"NS": None}
    ns["NS"] = ns
    seen = set()
    print(f"jobserver ready on {qdir}", flush=True)
    while True:
        jobs = sorted(
            f for f in os.listdir(qdir)
            if f.endswith(".py") and f not in seen
        )
        for name in jobs:
            path = os.path.join(qdir, name)
            # wait for the writer to finish (size stable)
            s1 = os.path.getsize(path)
            time.sleep(0.2)
            if os.path.getsize(path) != s1:
                continue
            seen.add(name)
            if name == "quit.py":
                print("jobserver exiting", flush=True)
                return
            with open(path) as f:
                code = f.read()
            out = io.StringIO()
            t0 = time.time()
            old = sys.stdout
            ok = True
            try:
                sys.stdout = out
                exec(compile(code, path, "exec"), ns)
            except BaseException:
                ok = False
                out.write(traceback.format_exc())
            finally:
                sys.stdout = old
            dt = time.time() - t0
            base = path[:-3]
            with open(base + ".out", "w") as f:
                f.write(out.getvalue())
                f.write(f"\n[job {name} {'ok' if ok else 'ERR'} {dt:.1f}s]\n")
            open(base + (".done" if ok else ".err"), "w").close()
            print(f"{name}: {'ok' if ok else 'ERR'} {dt:.1f}s", flush=True)
        time.sleep(0.3)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jobs")
