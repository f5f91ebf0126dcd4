"""Measure the direct-store fused top-k kernel against the value-fold.

Flagship shape N=4M / D=256 bf16 / B=256 / k=32 (and optionally the
10.5M int8 shape), TRUE device ms via testing/timing.true_device_ms.
Sweeps (block_q, block_n, subtiles) for algo in {iterate, direct}.

Usage: python scripts/bench_direct_kernel.py [--int8] [N] [D] [B] [k]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.ops.pallas.fused_topk import (
    fused_dense_top_k,
    fused_dense_top_k_int8,
)
from a_nice_rag_tpu.testing.timing import true_device_ms

print = functools.partial(print, flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    int8 = "--int8" in sys.argv
    n = int(args[0]) if len(args) > 0 else 4_005_888
    d = int(args[1]) if len(args) > 1 else 256
    b = int(args[2]) if len(args) > 2 else 256
    k = int(args[3]) if len(args) > 3 else 32
    print("platform:", jax.devices()[0].platform,
          f"N={n} D={d} B={b} k={k} int8={int8}")

    if int8:
        @jax.jit
        def make():
            ke, kq = jax.random.split(jax.random.PRNGKey(0))
            v = (jax.random.normal(ke, (n, d)) * 40).astype(jnp.int8)
            qv = (jax.random.normal(kq, (b, d)) * 40).astype(jnp.int8)
            return (v, jnp.ones((n,), jnp.float32),
                    qv, jnp.ones((b,), jnp.float32))

        vals, scales, qv, qs = make()
        jax.block_until_ready(vals)
        float(np.asarray(qs[0]))

        def call(algo, bq, bn, sub):
            def f(qq, v, s, qsc):
                return fused_dense_top_k_int8(
                    v, s, qq, qsc, k, block_q=bq, block_n=bn,
                    algo=algo, subtiles=sub)
            return f

        ref_i = None
        for algo in ("iterate", "direct"):
            for bq in (128, 256):
                for bn in (8192, 16384):
                    for sub in (2, 4):
                        try:
                            f = call(algo, bq, bn, sub)
                            v, i = f(qv, vals, scales, qs)
                            i = np.sort(np.asarray(i), axis=1)
                            if ref_i is None:
                                ref_i = i
                            ok = (i == ref_i).all()
                            ms = true_device_ms(
                                f, qv, vals, scales, qs, n_loop=8,
                                trials=2)
                            gbs = n * d / ms * 1e3 / 1e9
                            print(f"{algo:8s} bq={bq} bn={bn:5d} "
                                  f"sub={sub}  {ms:7.2f} ms  "
                                  f"{gbs:5.0f} GB/s  ids_ok={ok}")
                        except Exception as e:
                            print(f"{algo:8s} bq={bq} bn={bn:5d} "
                                  f"sub={sub}  FAILED "
                                  f"{str(e)[:110]}")
        return

    @jax.jit
    def make():
        ke, kq = jax.random.split(jax.random.PRNGKey(0))
        return (jax.random.normal(ke, (n, d), dtype=jnp.bfloat16),
                jax.random.normal(kq, (b, d), dtype=jnp.bfloat16))

    emb, q = make()
    jax.block_until_ready(emb)
    float(np.asarray(q[0, 0]).astype(np.float32))

    def call(algo, bq, bn, sub):
        def f(qq, e):
            return fused_dense_top_k(e, qq, k, block_q=bq, block_n=bn,
                                     algo=algo, subtiles=sub)
        return f

    ref_i = None
    for algo in ("iterate", "direct"):
        for bq in (128, 256):
            for bn in (8192, 16384, 32768):
                for sub in (2, 4):
                    try:
                        f = call(algo, bq, bn, sub)
                        v, i = f(q, emb)
                        i = np.sort(np.asarray(i), axis=1)
                        if ref_i is None:
                            ref_i = i
                        ok = (i == ref_i).all()
                        ms = true_device_ms(f, q, emb, n_loop=12,
                                            trials=2)
                        gbs = n * d * 2 / ms * 1e3 / 1e9
                        print(f"{algo:8s} bq={bq} bn={bn:5d} sub={sub}"
                              f"  {ms:7.2f} ms  {gbs:5.0f} GB/s  "
                              f"ids_ok={ok}")
                    except Exception as e:
                        print(f"{algo:8s} bq={bq} bn={bn:5d} sub={sub}"
                              f"  FAILED {str(e)[:110]}")


if __name__ == "__main__":
    main()
