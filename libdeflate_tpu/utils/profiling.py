"""In-repo profiling switches (SURVEY.md §5.1).

The reference keeps performance measurement external (monotonic timers in
programs/test_util.c:144-170 plus the benchmark program); the TPU build
additionally has a compiler in the loop, so two first-class tools live
here:

- ``timer`` / ``Phase``: wall-clock phase accounting with device sync
  (host materialization — ``block_until_ready`` returns early on relay
  stacks, PERF_NOTES.md), used by ``programs/benchmark.py --profile``.
- ``device_trace``: a context manager around ``jax.profiler`` so any
  benchmark or test can capture an XLA trace with
  ``LIBDEFLATE_TPU_TRACE=/dir`` or an explicit path, without importing
  profiler machinery at call sites.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import OrderedDict


def sync(tree) -> None:
    """Synchronize by materializing on host — the only reliable barrier
    on relay-attached devices (PERF_NOTES.md)."""
    import numpy as np

    try:
        import jax

        jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "device") else x, tree
        )
    except ImportError:  # pragma: no cover
        pass


class Phase:
    """Accumulating phase timer: ``with phases("parse"): ...`` then
    ``phases.report()``."""

    def __init__(self) -> None:
        self.totals: "OrderedDict[str, float]" = OrderedDict()
        self.counts: "OrderedDict[str, int]" = OrderedDict()

    @contextlib.contextmanager
    def __call__(self, name: str, sync_tree=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_tree is not None:
                sync(sync_tree)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, out=None) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [
            f"  {name:<24s} {t * 1e3:9.2f} ms  {t / total * 100:5.1f}%"
            f"  ({self.counts[name]}x)"
            for name, t in self.totals.items()
        ]
        text = "\n".join(lines)
        if out is not None:
            print(text, file=out)
        return text


@contextlib.contextmanager
def device_trace(trace_dir: str | None = None):
    """Capture a jax profiler trace if a directory is given (or via the
    LIBDEFLATE_TPU_TRACE env var); no-op otherwise."""
    trace_dir = trace_dir or os.environ.get("LIBDEFLATE_TPU_TRACE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
