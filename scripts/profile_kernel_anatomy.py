"""Attribute the streaming fused top-k kernel's residual over its DMA floor.

jax.profiler traces are not retrievable through the axon tunnel, so the
attribution is measured by ABLATION: four kernels share the exact same
launcher (grid, BlockSpecs, VMEM scratch, cost estimate) and differ only
in the work done per (doc tile, query block) visit:

1. dma_only   — touch one sublane of the streamed embedding tile; the
                grid + double-buffered HBM streaming with no compute.
2. mm_only    — the [Bq, D] x [D, Nt] dot, folded via a k-wide slice
                max (no full-tile selection passes).
3. mm_trigger — dot + the per-subtile row-max trigger pass + running
                kth compare, but extraction never fires (threshold inf).
4. full       — the production _iterate_visit (ungated scratch fold).

The deltas between consecutive rows attribute the end-to-end time to
DMA/grid, MXU, trigger passes, and extraction respectively. Results are
recorded in docs/BENCHMARKS.md (kernel anatomy section).

Usage: python scripts/profile_kernel_anatomy.py [N] [D] [B] [k] [bq] [bn] [sub]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import a_nice_rag_tpu.ops.pallas.fused_topk as FT
from a_nice_rag_tpu.testing.timing import chained_dispatch_ms as timeit

print = functools.partial(print, flush=True)
NEG = FT.NEG


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_005_888
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    bq = int(sys.argv[5]) if len(sys.argv) > 5 else 128
    bn = int(sys.argv[6]) if len(sys.argv) > 6 else 16384
    sub = int(sys.argv[7]) if len(sys.argv) > 7 else 2
    bq = min(bq, b)
    print("platform:", jax.devices()[0].platform,
          f"N={n} D={d} B={b} k={k} bq={bq} bn={bn} sub={sub}")

    @jax.jit
    def make():
        ke, kq = jax.random.split(jax.random.PRNGKey(0))
        return (jax.random.normal(ke, (n, d), dtype=jnp.bfloat16),
                jax.random.normal(kq, (b, d), dtype=jnp.bfloat16))

    emb, q = make()
    jax.block_until_ready(emb)
    float(np.asarray(q[0, 0]))

    w = bn // sub

    def visit_dma_only(q_ref, e_ref, vals_ref, idx_ref, run_v, run_i, s_scr):
        j = pl.program_id(0)
        i = pl.program_id(1)
        row0 = pl.multiple_of(i * bq, bq)
        # One sublane read keeps the tile DMA live without a full pass.
        touch = e_ref[0:8, 0:128].astype(jnp.float32)
        run_v[pl.ds(row0, bq), 0:1] = jnp.broadcast_to(
            jnp.max(touch).reshape(1, 1), (bq, 1)
        )

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            vals_ref[:] = jnp.zeros((bq, k), jnp.float32)
            idx_ref[:] = jnp.zeros((bq, k), jnp.int32)

    def visit_mm_only(q_ref, e_ref, vals_ref, idx_ref, run_v, run_i, s_scr):
        j = pl.program_id(0)
        i = pl.program_id(1)
        row0 = pl.multiple_of(i * bq, bq)
        sc = jax.lax.dot_general(
            q_ref[:], e_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rv = run_v[pl.ds(row0, bq), :]
        first = (j == 0)
        rv = jnp.where(first, jnp.full((bq, k), NEG, jnp.float32), rv)
        # k-wide slice fold: consumes the dot without a full-tile pass.
        run_v[pl.ds(row0, bq), :] = jnp.maximum(rv, sc[:, :k])

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            vals_ref[:] = run_v[pl.ds(row0, bq), :]
            idx_ref[:] = jnp.zeros((bq, k), jnp.int32)

    def visit_mm_trigger(q_ref, e_ref, vals_ref, idx_ref, run_v, run_i,
                         s_scr):
        j = pl.program_id(0)
        i = pl.program_id(1)
        row0 = pl.multiple_of(i * bq, bq)
        sc = jax.lax.dot_general(
            q_ref[:], e_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rv = run_v[pl.ds(row0, bq), :]
        first = (j == 0)
        rv = jnp.where(first, jnp.full((bq, k), NEG, jnp.float32), rv)
        # Same per-subtile trigger passes as production, but the
        # running kth is pinned to +inf so extraction never fires.
        kth = jnp.full((bq,), jnp.inf, jnp.float32)
        for s in range(sub):
            rm = jnp.max(sc[:, s * w:(s + 1) * w], axis=1)
            fired = jnp.max(rm - kth) > 0.0
            rv = jnp.where(fired, rv - 1.0, rv)
        run_v[pl.ds(row0, bq), :] = rv

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            vals_ref[:] = run_v[pl.ds(row0, bq), :]
            idx_ref[:] = jnp.zeros((bq, k), jnp.int32)

    def visit_full(q_ref, e_ref, vals_ref, idx_ref, run_v, run_i, s_scr):
        FT._kernel_iterate(
            q_ref, e_ref, vals_ref, idx_ref, run_v, run_i, s_scr,
            k=k, n_tile=bn, block_q=bq, has_mask=False, subtiles=sub,
        )

    results = {}
    for name, body in [("dma_only", visit_dma_only),
                       ("mm_only", visit_mm_only),
                       ("mm_trigger", visit_mm_trigger),
                       ("full", visit_full)]:
        f = pl.pallas_call(
            body,
            grid=(n // bn, b // bq),
            in_specs=[
                pl.BlockSpec((bq, d), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, d), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bq, k), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bq, k), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, k), jnp.float32),
                jax.ShapeDtypeStruct((b, k), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.int32),
                pltpu.VMEM((bq, bn // sub), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d, bytes_accessed=emb.size * 2,
                transcendentals=0,
            ),
        )
        try:
            ms = timeit(lambda: f(q, emb))
            results[name] = ms
            print(f"{name:12s} {ms:7.2f} ms")
        except Exception as e:
            print(f"{name:12s} FAILED {str(e)[:130]}")

    if len(results) == 4:
        dma = emb.size * 2 / 819e9 * 1e3
        print(f"\nattribution (N={n}, bf16, one-pass DMA floor "
              f"{dma:.2f} ms @819GB/s):")
        print(f"  grid+DMA stream      : {results['dma_only']:.2f} ms")
        print(f"  + MXU matmul         : "
              f"{results['mm_only'] - results['dma_only']:+.2f} ms")
        print(f"  + trigger passes     : "
              f"{results['mm_trigger'] - results['mm_only']:+.2f} ms")
        print(f"  + extraction (fires) : "
              f"{results['full'] - results['mm_trigger']:+.2f} ms")
        print(f"  = full kernel        : {results['full']:.2f} ms")


if __name__ == "__main__":
    main()
