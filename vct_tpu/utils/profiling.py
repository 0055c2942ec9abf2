"""Tracing / profiling subsystem (SURVEY.md §5).

The reference computes a frame delta and never shows it (main.cpp:83-87);
here every pipeline stage is timed explicitly, with optional Perfetto
traces via jax.profiler and cone-sample/s cost accounting shared with
bench.py.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp


def sync(x) -> float:
    """Force completion of everything producing x (readback of 8 scalars —
    jax.block_until_ready does not synchronize through the axon tunnel)."""
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    return float(jnp.sum(jnp.ravel(leaves[0])[:8]))


class StageTimer:
    """Wall-clock stage timing with device synchronization.

    with timer.stage("voxelize"):
        out = ...
        timer.done(out)      # sync point; optional — stage end syncs too
    """

    def __init__(self, log=None):
        self.records: List[Tuple[str, float]] = []
        self._log = log

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.time()
        box = {}
        try:
            yield box
        finally:
            if "result" in box:
                sync(box["result"])
            dt = time.time() - t0
            self.records.append((name, dt))
            if self._log:
                self._log(f"[{name}] {dt * 1e3:.1f} ms")

    def report(self) -> str:
        total = sum(dt for _, dt in self.records)
        lines = [f"{name:<24s} {dt * 1e3:10.1f} ms  {dt / total * 100:5.1f}%"
                 for name, dt in self.records]
        lines.append(f"{'total':<24s} {total * 1e3:10.1f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def perfetto_trace(trace_dir: Optional[str]):
    """jax.profiler trace scope -> Perfetto-compatible artifacts in
    trace_dir (no-op when trace_dir is None)."""
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {trace_dir}", file=sys.stderr)
