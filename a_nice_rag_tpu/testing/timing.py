"""Tunnel-proof device timing (the CLAUDE.md methodology, one place).

``block_until_ready`` has been observed returning before execution
finishes on tunneled PJRT backends, so every sample here forces a VALUE
read; device execution is serialized, so reading the final output's
data implies all chained work completed. The chained-dispatch mean
amortizes the ~25-35 ms tunnel RTT the way a pipelined server does.
Used by the benchmark scripts and the kernel autotuner — keep them on
this helper so methodology fixes land everywhere at once.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def _read_value(out) -> None:
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])


def chained_dispatch_ms(fn, n: int = 8, trials: int = 1) -> float:
    """Best-of-``trials`` mean latency of ``fn()`` over ``n`` chained
    dispatches with one value read per trial, in milliseconds."""
    out = fn()
    jax.block_until_ready(out)
    _read_value(out)
    best = float("inf")
    for _ in range(max(1, trials)):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _read_value(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best
