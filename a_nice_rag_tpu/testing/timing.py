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


def true_device_ms(
    make_call, q, *args, n_loop: int = 30, trials: int = 3
) -> float:
    """Dispatch-free device latency of ``make_call(q_perturbed, *args)``.

    Pass every large array through ``*args`` — closing over one embeds
    it as a compiled constant and ships it inside the remote-compile
    request (413s at ~780 MB through the tunnel).

    Runs the program ``n_loop`` times inside ONE jitted loop, threading
    the loop carry into the q operand (runtime +0.0) so XLA cannot
    hoist the call (varying any operand of the opaque custom call /
    fusion forces per-iteration execution). The trip count is a RUNTIME
    argument so the SAME compiled program measures a zero-iteration
    run: T(0) is exactly the per-call dispatch + value-read overhead
    (~one tunnel RTT, 20-30 ms here), and (T(n) - T(0)) / n is the
    bias-free device time. The old form divided T(n) by n without the
    subtraction, leaving ~RTT/n of residual — ~0.8 ms at n_loop=30,
    material for single-digit-ms kernels (round-4 correction; every
    earlier "TRUE" number carries that inflation).

    The perturbation must be ADDED (`q + isnan(x).astype(dtype)`) —
    multiplying by zero is foldable and re-enables hoisting (see
    CLAUDE.md timing notes).
    """
    import jax.numpy as jnp

    @jax.jit
    def loop(n, x0, qq, *a):
        def body(i, x):
            dq = qq + jnp.isnan(x).astype(qq.dtype)
            out = make_call(dq, *a)
            # Fold EVERY output leaf into the carry: a single leaf can
            # be input-independent (WRRF fused VALUES are pure rank
            # sums — only the ids vary with the query) and XLA then
            # DCEs the whole call out of the loop (measured: an int8
            # 2.1 GB scan "took" 0.0 ms). make_call must still return
            # at least one data-dependent output.
            acc = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
            return x + 0.0 * acc

        return jax.lax.fori_loop(0, n, body, x0)

    import numpy as _np

    def run(n) -> float:
        t0 = time.perf_counter()
        float(_np.asarray(
            loop(jnp.int32(n), jnp.zeros(()), q, *args)
        ).ravel()[0])
        return time.perf_counter() - t0

    run(n_loop)  # compile
    # min-of-mins: tunnel RTT jitter is additive-positive with
    # occasional multi-10-ms spikes; pairing one T(0) with one T(n)
    # per trial once zeroed a 4 ms kernel when its T(0) sample spiked.
    base = min(run(0) for _ in range(max(2, trials)))
    full = min(run(n_loop) for _ in range(max(1, trials)))
    return max(full - base, 0.0) / n_loop * 1e3
