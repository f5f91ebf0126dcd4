"""Attribute the IVF micro-batch overhead (round-3 verdict weak #2:
25% tile fraction bought only 1.63x at 2M/B=8).

Hypothesis: per-grid-step fixed cost dominates at tile_n=1024 with a
B=8 score tile — sweep tile_n x subtiles x nprobe and report TRUE ms,
scheduled-tile bytes, and the implied fixed cost per step. Also times
the tile-table build alone (XLA sort/unique) to separate front-end
cost from kernel cost.

Usage: python scripts/probe_ivf_overhead.py [N] [D] [B]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.index.ivf import (
    build_ivf_dense,
    build_tile_table,
)
from a_nice_rag_tpu.ops.pallas.ivf_topk import ivf_dense_top_k
from a_nice_rag_tpu.testing.timing import true_device_ms

print = functools.partial(print, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_centers = 2048
    print("platform:", jax.devices()[0].platform, f"N={n} D={d} B={b}")

    @jax.jit
    def gen_corpus(key):
        kc, ka, kn = jax.random.split(key, 3)
        cent = jax.random.normal(kc, (n_centers, d), dtype=jnp.float32)
        cent = cent * jax.lax.rsqrt(
            jnp.sum(cent * cent, axis=1, keepdims=True) + 1e-12
        )
        which = jax.random.randint(ka, (n,), 0, n_centers)
        e = jnp.take(cent, which, axis=0)
        e = e + 0.08 * jax.random.normal(kn, (n, d), dtype=jnp.float32)
        inv = jax.lax.rsqrt(jnp.sum(e * e, axis=1, keepdims=True) + 1e-12)
        return (e * inv).astype(jnp.bfloat16)

    emb = gen_corpus(jax.random.PRNGKey(13))
    rng = np.random.default_rng(7)
    gold = rng.integers(0, n, size=b).astype(np.int32)

    @jax.jit
    def gen_queries(emb, gold_rows, key):
        g = jnp.take(emb, gold_rows, axis=0).astype(jnp.float32)
        q = g + 0.05 * jax.random.normal(key, g.shape, dtype=jnp.float32)
        inv = jax.lax.rsqrt(jnp.sum(q * q, axis=1, keepdims=True))
        return q * inv

    q = gen_queries(emb, jnp.asarray(gold), jax.random.PRNGKey(14))

    for tile_n in (1024, 2048, 4096):
        ivf = build_ivf_dense(emb, tile_n=tile_n, n_iters=8, seed=0)
        jax.block_until_ready(ivf.emb)
        mct = ivf.max_cluster_tiles
        for nprobe in (32,):
            maxt = min(ivf.n_tiles, 640 * 1024 // tile_n)

            @jax.jit
            def table_only(cent, cstart, qq):
                t, u = build_tile_table(
                    cent, cstart, qq, nprobe=nprobe, max_tiles=maxt,
                    tile_n=tile_n, mct=mct,
                )
                return t, u

            @jax.jit
            def full(qq, emb_p, cent, cstart):
                t, u = build_tile_table(
                    cent, cstart, qq, nprobe=nprobe, max_tiles=maxt,
                    tile_n=tile_n, mct=mct,
                )
                v, i = ivf_dense_top_k(
                    emb_p, qq, t, 16, tile_n=tile_n, n_real=n,
                )
                return v, i, u

            _, _, u = full(q, ivf.emb, ivf.centroids, ivf.cluster_start)
            n_sched = min(int(u), maxt)
            ms_tab = true_device_ms(
                lambda qq, c, s: table_only(c, s, qq)[0],
                q, ivf.centroids, ivf.cluster_start, n_loop=40, trials=2,
            )
            ms = true_device_ms(
                full, q, ivf.emb, ivf.centroids, ivf.cluster_start,
                n_loop=30, trials=2,
            )
            bytes_r = n_sched * tile_n * d * 2
            floor = bytes_r / 350e9 * 1e3
            over = ms - ms_tab - floor
            print(f"tile_n={tile_n:5d} nprobe={nprobe} maxt={maxt:4d} "
                  f"sched={n_sched:4d} ({n_sched*tile_n/n:5.1%})  "
                  f"full={ms:6.3f} ms  table={ms_tab:6.3f}  "
                  f"stream_floor@350={floor:6.3f}  residual={over:6.3f} "
                  f"({over/max(n_sched,1)*1e3:5.2f} us/tile)")


if __name__ == "__main__":
    main()
