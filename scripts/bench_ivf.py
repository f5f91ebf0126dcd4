"""IVF ANN vs exact streaming scan on the real TPU at 10.5M x 1024 int8.

The corpus is generated ON DEVICE with planted cluster structure and
laid out cluster-major BY CONSTRUCTION (doc row // cluster_size ==
cluster id), so the 10.7 GB matrix exists exactly once in HBM — the
build-time k-means + permutation path is exercised by tests at small
scale; this script measures the SERVE path: tile-table construction +
scalar-prefetch kernel vs the exact maskless streaming kernel.

Queries are noisy copies of random docs (planted gold); reported:
  * recall@10 of the planted gold (ANN quality),
  * per-batch latency / QPS for B in {16, 256} and an nprobe sweep,
  * the exact kernel's numbers on identical data as the baseline.

Usage: python scripts/bench_ivf.py [N] [D] [C]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.index.ivf import IVFDense, ivf_search
from a_nice_rag_tpu.testing.timing import chained_dispatch_ms as timeit


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _search(ivf, q, k, nprobe):
    """One program: tile table + kernel + perm map (one dispatch)."""
    v, i, nu = ivf_search(ivf, q, k, nprobe=nprobe)
    return v, i, nu


def main():
    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k_int8

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_485_760
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 2560
    k = 10
    tile_n = 1024
    assert n % c == 0, "uniform synthetic clusters need C | N"
    per = n // c
    print(f"platform: {jax.devices()[0].platform}  N={n} D={d} C={c} "
          f"per={per}")

    # Cluster-structured int8 corpus, generated in cluster-major order:
    # row r belongs to cluster r // per. Per-entry signal ~25, noise
    # ~20 -> cos(doc, centroid) ~ 0.78: clustered but not trivially so.
    @jax.jit
    def gen_centroids(key):
        e = jax.random.normal(key, (c, d), dtype=jnp.float32)
        return e * jax.lax.rsqrt(jnp.sum(e * e, axis=1, keepdims=True))

    cent = gen_centroids(jax.random.PRNGKey(0))

    @jax.jit
    def gen_values(cent, key):
        def chunk(i, out):
            ck = jax.random.fold_in(key, i)
            base = cent[i][None, :] * (25.0 * jnp.sqrt(jnp.float32(d)))
            noise = 20.0 * jax.random.normal(ck, (per, d), jnp.float32)
            v = jnp.clip(jnp.round(base + noise), -127, 127).astype(jnp.int8)
            return jax.lax.dynamic_update_slice(out, v, (i * per, 0))
        out = jnp.zeros((n, d), jnp.int8)
        return jax.lax.fori_loop(0, c, chunk, out)

    vals = gen_values(cent, jax.random.PRNGKey(1))
    scales = jnp.full((n,), 1.0 / 127.0, jnp.float32)
    jax.block_until_ready(vals)
    print("corpus ready:", vals.shape, "int8")

    cluster_start = jnp.asarray(
        np.arange(c + 1, dtype=np.int32) * per
    )
    ivf = IVFDense(
        centroids=cent,
        values=vals,
        scales=scales,
        perm=jnp.arange(n, dtype=jnp.int32),
        cluster_start=cluster_start,
        tile_n=tile_n,
        n_real=n,
        max_cluster_tiles=-(-per // tile_n) + 1,
    )

    rng = np.random.default_rng(5)
    for b in (16, 256):
        gold = rng.integers(0, n, size=b).astype(np.int32)

        @jax.jit
        def gen_q(vals, gold_rows, key):
            g = jnp.take(vals, jnp.asarray(gold_rows), axis=0)
            g = g.astype(jnp.float32)
            q = g + 30.0 * jax.random.normal(key, g.shape, jnp.float32)
            return q * jax.lax.rsqrt(
                jnp.sum(q * q, axis=1, keepdims=True)
            )

        q = gen_q(vals, gold, jax.random.PRNGKey(100 + b))
        from a_nice_rag_tpu.ops.quantized import quantize_queries
        qv, qs = quantize_queries(q)

        import csv as _csv
        out_csv = os.path.join(os.path.dirname(__file__), "..",
                               "results", "ivf_recall_sweep_10m.csv")
        new_file = not os.path.exists(out_csv)
        csv_f = open(out_csv, "a", newline="", encoding="utf-8")
        csv_w = _csv.writer(csv_f)
        if new_file:
            csv_w.writerow([
                "n", "d", "c", "batch", "nprobe", "tiles",
                "tile_fraction", "ms", "qps", "recall@10_planted",
                "overlap@10_vs_exact", "exact_ms",
                "exact_recall@10_planted",
            ])

        # Exact baseline (maskless streaming kernel).
        exact = lambda: fused_dense_top_k_int8(
            vals, scales, qv, qs, k, block_q=256, block_n=8192
        )
        v_e, i_e = exact()
        i_e = np.asarray(i_e)
        r_e = np.mean([gold[j] in i_e[j] for j in range(b)])
        ms_e = timeit(exact, n=5, trials=2)
        print(f"B={b:4d} exact:              {ms_e:8.2f} ms "
              f"({b / ms_e * 1e3:8.0f} QPS)  gold-recall@{k} {r_e:.3f}")

        for nprobe in (8, 16, 32, 64):
            fn = lambda: _search(ivf, q, k, nprobe)
            v_a, i_a, nu = fn()
            i_a = np.asarray(i_a)
            r_a = np.mean([gold[j] in i_a[j] for j in range(b)])
            ov = np.mean([
                len(set(i_a[j]) & set(i_e[j])) / k for j in range(b)
            ])
            ms_a = timeit(lambda: fn()[0], n=8, trials=2)
            frac = int(nu) * tile_n / n
            print(f"  nprobe={nprobe:3d} tiles={int(nu):5d} "
                  f"({frac:6.1%}): {ms_a:8.2f} ms "
                  f"({b / ms_a * 1e3:8.0f} QPS)  gold {r_a:.3f} "
                  f"overlap-vs-exact {ov:.3f}")
            csv_w.writerow([
                n, d, c, b, nprobe, int(nu), round(frac, 4),
                round(ms_a, 3), round(b / ms_a * 1e3, 1),
                round(float(r_a), 4), round(float(ov), 4),
                round(ms_e, 3), round(float(r_e), 4),
            ])
        csv_f.close()


if __name__ == "__main__":
    main()
