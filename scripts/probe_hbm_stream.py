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

All timings use the fori_loop-in-one-jit methodology (CLAUDE.md):
chained dispatch cannot resolve sub-ms device times via the tunnel.
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
    """Loop fn inside ONE jit with an unhoistable perturbation."""

    @jax.jit
    def loop(x0, *a):
        def body(i, x):
            da = tuple(
                v + jnp.isnan(x).astype(v.dtype) for v in a
            )
            return x + 0.0 * fn(*da)

        return jax.lax.fori_loop(0, n_loop, body, x0)

    float(np.asarray(loop(jnp.zeros(()), *args)).ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop(jnp.zeros(()), *args)).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n_loop * 1e3)
    return best


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


if __name__ == "__main__":
    main()
