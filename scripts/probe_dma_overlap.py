"""Probe: does the Pallas grid pipeline overlap tile DMA with compute?

The streaming top-k kernel's measured anatomy is ADDITIVE (stream 3.73
+ matmul 0.15 + trigger 1.6 + extraction ~5 = 9.7 ms TRUE at N=4M,
docs/BENCHMARKS.md): stage costs sum instead of hiding under the DMA.
Two hypotheses:

  (a) the Mosaic grid pipeline does not actually overlap the next
      tile's HBM->VMEM DMA with the current tile's compute — then a
      manually double-buffered kernel reclaims min(stream, compute);
  (b) DMA and VPU passes contend for VMEM bandwidth, so overlap exists
      but buys nothing — then manual double-buffering is dead too.

Discriminator: stream tiles through a grid kernel whose body does one
cheap reduction pass over the tile (the stream-only baseline) plus X
iterations of dummy VPU work on a SEPARATE small scratch buffer that
never touches the streamed tile. Plot TRUE ms vs X:

  overlap works  -> flat until the dummy work exceeds the per-tile DMA
                    time, then slope 1 (time = max(dma, compute));
  no overlap     -> slope 1 from X=0 (time = dma + compute).

The dummy work is pure VPU on a [128, 2048] f32 scratch — if (b) holds
in the real kernel it is because its passes read the STREAMED tile;
this probe's independence from the tile isolates the scheduling
question from the bandwidth question.

Usage: python scripts/probe_dma_overlap.py [N_LOG2=22] [BLOCK_N=16384]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from a_nice_rag_tpu.testing.timing import true_device_ms  # noqa: E402


def _kernel(seed_ref, e_ref, out_ref, acc, work, *, x_iters: int):
    j = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        acc[:, :] = seed_ref[:, :]
        work[:, :] = jnp.full(work.shape, 1.000001, jnp.float32)

    # One reduction pass over the streamed tile (the stream-only cost).
    acc[:, :] = acc[:, :] + jnp.sum(e_ref[:].astype(jnp.float32))

    # X iterations of dummy VPU work on an independent scratch buffer.
    if x_iters:
        def body(i, _):
            work[:, :] = work[:, :] * 1.000001 + 1e-9
            return 0

        jax.lax.fori_loop(0, x_iters, body, 0)

    @pl.when(j == n_tiles - 1)
    def _():
        out_ref[:, :] = acc[:, :] + work[0, 0]


@functools.partial(jax.jit, static_argnames=("x_iters", "block_n",
                                              "work_cols"))
def probe(seed, emb, x_iters: int, block_n: int, work_cols: int = 2048):
    n, d = emb.shape
    return pl.pallas_call(
        functools.partial(_kernel, x_iters=x_iters),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((128, work_cols), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, emb)


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    block_n = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    work_cols = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    n, d = 1 << n_log2, 256

    emb = jax.jit(
        lambda key: jax.random.normal(key, (n, d), jnp.float32).astype(
            jnp.bfloat16
        )
    )(jax.random.key(0))
    jax.block_until_ready(emb)
    seed = jnp.zeros((8, 128), jnp.float32)
    gb = n * d * 2 / 1e9
    n_tiles = n // block_n
    print(f"N=2^{n_log2} D={d} bf16 ({gb:.2f} GB), block_n={block_n}, "
          f"{n_tiles} tiles, platform={jax.devices()[0].platform}")

    t0 = None
    for x in (0, 1, 2, 4, 8, 16, 32, 64):
        ms = true_device_ms(
            lambda q, e, xx=x: probe(q, e, xx, block_n, work_cols),
            seed, emb, n_loop=20, trials=3,
        )
        if t0 is None:
            t0 = ms
        per_iter_us = (ms - t0) / (n_tiles * x) * 1e3 if x else 0.0
        print(f"  X={x:3d}: {ms:7.3f} ms  (+{ms - t0:6.3f} vs X=0, "
              f"{per_iter_us:.3f} us/iter/tile)  "
              f"stream {gb / ms * 1e3:6.1f} GB/s")


if __name__ == "__main__":
    main()
