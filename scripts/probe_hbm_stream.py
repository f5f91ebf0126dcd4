"""Attribute the streaming kernel's ~340 GB/s effective bandwidth.

The round-3 kernel anatomy (scripts/profile_kernel_anatomy.py) showed
the grid+DMA stream ALONE costs 5.9-6.4 ms at N=4M x 256 bf16 (2 GB),
i.e. ~340 GB/s vs the chip's 819 GB/s spec. This probe separates the
hypotheses:

  a) XLA full-matrix reduction (`jnp.sum` over the matrix) — XLA's own
     best-case HBM stream, no Pallas pipeline.
  b) Trivial Pallas kernel (running scalar sum per tile, no selection)
     at several block shapes — the Pallas pipeline's stream.
  c) Same with TWO independent matrices summed in one program —
     whether a second stream raises aggregate bandwidth (DMA engine
     underutilization vs true HBM ceiling).

If (a) ~= (b) ~= 340 GB/s the ceiling is environmental (shared chip /
platform) and the kernel is at its floor; if (a) >> (b), the Pallas
grid pipeline leaves bandwidth on the table and an emit_pipeline
double-buffer variant is worth building.

Timing: chained dispatch (testing.timing.chained_dispatch_ms). The
fori_loop-in-one-jit methodology is WRONG for pure streaming probes:
perturbing the streamed matrix per iteration adds a full extra HBM
pass (double-counts bandwidth), and a foldable perturbation lets XLA
hoist the whole stream out of the loop (the original version of this
probe had that bug — see CLAUDE.md timing notes). At the 2 GB / multi-
ms scale probed here, chained dispatch amortizes the tunnel RTT fine.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print = functools.partial(print, flush=True)

N = 1 << 22
D = 256
N_LOOP = 30


def true_ms(fn, *args, n_loop=N_LOOP):
    from a_nice_rag_tpu.testing.timing import chained_dispatch_ms

    f = jax.jit(fn)
    return chained_dispatch_ms(lambda: f(*args), n=8, trials=3)


def pallas_sum(x, block_n):
    n, d = x.shape

    def kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[0, 0] = 0.0

        o_ref[0, 0] += jnp.sum(x_ref[:].astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(n // block_n,),
        in_specs=[pl.BlockSpec((block_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(x)[0, 0]


def main():
    print("platform:", jax.devices()[0].platform)
    gb = N * D * 2 / 1e9

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (N, D), dtype=jnp.bfloat16)

    x = gen(jax.random.PRNGKey(0))
    y = gen(jax.random.PRNGKey(1))

    ms = true_ms(lambda a: jnp.sum(a.astype(jnp.float32)), x)
    print(f"a) XLA sum:            {ms:7.3f} ms  {gb/ms*1e3:6.1f} GB/s")

    for bn in (2048, 4096, 8192, 16384):
        ms = true_ms(lambda a, bn=bn: pallas_sum(a, bn), x)
        print(f"b) pallas bn={bn:5d}:   {ms:7.3f} ms  {gb/ms*1e3:6.1f} GB/s")

    ms = true_ms(
        lambda a, b: jnp.sum(a.astype(jnp.float32))
        + jnp.sum(b.astype(jnp.float32)),
        x, y,
    )
    print(f"c) XLA sum of TWO:     {ms:7.3f} ms  {2*gb/ms*1e3:6.1f} GB/s agg")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def pallas_sum2(x, y, block_n):
    n, d = x.shape

    def kernel(x_ref, y_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[0, 0] = 0.0

        o_ref[0, 0] += jnp.sum(x_ref[:].astype(jnp.float32))
        o_ref[0, 0] += jnp.sum(y_ref[:].astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(x, y)[0, 0]


def main_dual():
    print("platform:", jax.devices()[0].platform)
    gb = N * D * 2 / 1e9

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (N, D), dtype=jnp.bfloat16)

    x = gen(jax.random.PRNGKey(0))
    y = gen(jax.random.PRNGKey(1))
    for bn in (4096, 8192):
        ms = true_ms(lambda a, b, bn=bn: pallas_sum2(a, b, bn), x, y)
        print(f"d) pallas DUAL bn={bn:5d}: {ms:7.3f} ms "
              f"{2*gb/ms*1e3:6.1f} GB/s agg")


if __name__ == "__main__" and "dual" in sys.argv[1:]:
    main_dual()


def pallas_sum_k(parts, block_n):
    n, d = parts[0].shape
    m = len(parts)

    def kernel(*refs):
        o_ref = refs[-1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[0, 0] = 0.0

        for r in refs[:-1]:
            o_ref[0, 0] += jnp.sum(r[:].astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(m)
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(*parts)[0, 0]


def main_multi():
    print("platform:", jax.devices()[0].platform)

    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("rows",))
    def gen(key, rows):
        return jax.random.normal(key, (rows, D), dtype=jnp.bfloat16)

    total_rows = N  # constant total bytes across stream counts
    for m in (1, 2, 3, 4, 6, 8):
        rows = total_rows // m
        parts = [gen(jax.random.PRNGKey(i), rows=rows) for i in range(m)]
        jax.block_until_ready(parts)
        gb = total_rows * D * 2 / 1e9
        ms = true_ms(lambda *a: pallas_sum_k(a, 4096), *parts)
        print(f"e) pallas {m}-stream (same total {gb:.1f} GB): "
              f"{ms:7.3f} ms {gb/ms*1e3:6.1f} GB/s")


if __name__ == "__main__" and "multi" in sys.argv[1:]:
    main_multi()


def pallas_sum_biased(parts, bias, block_n):
    """Sum with a scalar OPERAND: threading the fori_loop carry through
    an operand of the opaque custom-call forces per-iteration execution
    (XLA cannot hoist it), with zero extra HBM traffic — the correct
    dispatch-free timing form for pure streams."""
    n, d = parts[0].shape
    m = len(parts)

    def kernel(b_ref, *refs):
        o_ref = refs[-1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[0, 0] = b_ref[0, 0]

        for r in refs[:-1]:
            o_ref[0, 0] += jnp.sum(r[:].astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(n // block_n,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)] + [
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(m)
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(bias.reshape(1, 1), *parts)[0, 0]


def main_true():
    import time as _t
    print("platform:", jax.devices()[0].platform)

    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("rows",))
    def gen(key, rows):
        return jax.random.normal(key, (rows, D), dtype=jnp.bfloat16)

    n_loop = 30
    for m in (1, 2, 4):
        rows = N // m
        parts = [gen(jax.random.PRNGKey(i), rows=rows) for i in range(m)]
        jax.block_until_ready(parts)
        gb = N * D * 2 / 1e9

        @jax.jit
        def loop(x0, *a):
            def body(i, x):
                s = pallas_sum_biased(a, x, 4096)
                return x * 0.0 + 0.0 * s  # runtime 0, not foldable

            return jax.lax.fori_loop(0, n_loop, body, x0)

        float(np.asarray(loop(jnp.zeros(()), *parts)).ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = _t.perf_counter()
            float(np.asarray(loop(jnp.zeros(()), *parts)).ravel()[0])
            best = min(best, (_t.perf_counter() - t0) / n_loop * 1e3)
        print(f"f) TRUE {m}-stream ({gb:.1f} GB): {best:7.3f} ms "
              f"{gb/best*1e3:6.1f} GB/s")


if __name__ == "__main__" and "true" in sys.argv[1:]:
    main_true()
