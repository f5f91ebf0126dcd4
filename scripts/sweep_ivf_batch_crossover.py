"""Exact-vs-IVF crossover as the batch widens (N=2M x 256 bf16).

The exact streaming kernel reads the whole corpus once per BATCH, so
its per-query cost collapses as B grows; the IVF route's scheduled
tile table grows ~linearly in B x nprobe until it covers most of the
corpus and the probe is pure overhead. This sweep measures both TRUE
device latencies at each batch size and writes
results/ivf_batch_crossover.csv — the measurement behind
FusedRetriever(ivf_route="auto", ivf_max_coverage=...), which probes
only while the expected cluster coverage 1-(1-p/C)^B stays below the
threshold (compare the tile_fraction column with the analytic model).

Same corpus construction as bench.py's ivf_scale_metrics (planted
2048-center cluster structure, within-cluster cosine ~0.61, query-gold
cosine ~0.78); recall@10 of the planted gold is reported per batch
size as the accuracy column.

Usage: python scripts/sweep_ivf_batch_crossover.py [out_csv]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.index.ivf import build_ivf_dense, build_tile_table
from a_nice_rag_tpu.ops.pallas.fused_topk import fused_dense_top_k
from a_nice_rag_tpu.ops.pallas.ivf_topk import ivf_dense_top_k
from a_nice_rag_tpu.testing.timing import true_device_ms

N = 1 << 21
D = 256
K = 16
NPROBE = 16
N_CENTERS = 2048
BATCHES = (1, 2, 4, 8, 16, 32, 64, 128, 256)


def main():
    out_csv = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "results",
        "ivf_batch_crossover.csv",
    )
    print(f"platform: {jax.devices()[0].platform}  N={N} D={D} "
          f"nprobe={NPROBE}")
    rng = np.random.default_rng(31)

    @jax.jit
    def gen_corpus(key):
        kc, ka, kn = jax.random.split(key, 3)
        cent = jax.random.normal(kc, (N_CENTERS, D), dtype=jnp.float32)
        cent = cent * jax.lax.rsqrt(
            jnp.sum(cent * cent, axis=1, keepdims=True) + 1e-12
        )
        which = jax.random.randint(ka, (N,), 0, N_CENTERS)
        e = jnp.take(cent, which, axis=0)
        e = e + 0.08 * jax.random.normal(kn, (N, D), dtype=jnp.float32)
        inv = jax.lax.rsqrt(jnp.sum(e * e, axis=1, keepdims=True) + 1e-12)
        return (e * inv).astype(jnp.bfloat16)

    emb = gen_corpus(jax.random.PRNGKey(13))
    t0 = time.perf_counter()
    ivf = build_ivf_dense(emb, tile_n=1024, n_iters=10, seed=0)
    jax.block_until_ready(ivf.emb)
    print(f"ivf build: {time.perf_counter() - t0:.1f}s "
          f"({ivf.n_clusters} clusters, {ivf.n_tiles} tiles)")
    mct = ivf.max_cluster_tiles
    n_probe = min(NPROBE, ivf.n_clusters)

    @jax.jit
    def gen_queries(emb, gold_rows, key):
        g = jnp.take(emb, gold_rows, axis=0).astype(jnp.float32)
        q = g + 0.05 * jax.random.normal(key, g.shape, dtype=jnp.float32)
        inv = jax.lax.rsqrt(jnp.sum(q * q, axis=1, keepdims=True))
        return q * inv

    rows = []
    for bi, B in enumerate(BATCHES):
        # Per-B tile budget: the worst case B*nprobe*mct, capped at a
        # full pass — exactly what the engine schedules (ivf_max_tiles
        # default).
        maxt = int(min(ivf.n_tiles, B * n_probe * mct))

        def ann(q, e, c, s, _maxt=maxt):
            table, n_uniq = build_tile_table(
                c, s, q, nprobe=n_probe, max_tiles=_maxt,
                tile_n=1024, mct=mct,
            )
            vals, pidx = ivf_dense_top_k(
                e, q, table, K, tile_n=1024, n_real=N,
            )
            return vals, pidx, n_uniq

        ann_j = jax.jit(ann)

        # Recall + tile fraction over 16 fresh gold batches.
        hits, fracs = 0, []
        n_check = max(2, min(16, 2048 // B))
        for t in range(n_check):
            gold = rng.integers(0, N, size=(B,)).astype(np.int32)
            q = gen_queries(emb, jnp.asarray(gold),
                            jax.random.PRNGKey(100 + 31 * bi + t))
            _, pidx, n_uniq = ann_j(q, ivf.emb, ivf.centroids,
                                    ivf.cluster_start)
            r = np.asarray(pidx)
            ids = np.where(r >= 0, np.asarray(ivf.perm)[r], -1)
            hits += sum(gold[b] in ids[b, :10] for b in range(B))
            fracs.append(min(int(n_uniq), maxt) / ivf.n_tiles)
        r10 = hits / (n_check * B)

        q0 = gen_queries(emb, jnp.asarray(
            rng.integers(0, N, size=(B,)).astype(np.int32)),
            jax.random.PRNGKey(7))
        n_loop = 50 if B <= 32 else 30
        ivf_ms = true_device_ms(
            lambda dq, e, c, s: ann_j(dq, e, c, s)[0],
            q0, ivf.emb, ivf.centroids, ivf.cluster_start,
            n_loop=n_loop, trials=3,
        )
        exact_ms = true_device_ms(
            lambda dq, e: fused_dense_top_k(e, dq, K)[0],
            q0, emb, n_loop=n_loop, trials=3,
        )
        winner = "ivf" if ivf_ms < exact_ms else "exact"
        rows.append(dict(
            batch=B, exact_ms=round(exact_ms, 3), ivf_ms=round(ivf_ms, 3),
            exact_per_q_ms=round(exact_ms / B, 4),
            ivf_per_q_ms=round(ivf_ms / B, 4),
            speedup=round(exact_ms / ivf_ms, 2), winner=winner,
            recall10_ivf=round(r10, 4),
            tile_fraction=round(float(np.mean(fracs)), 4),
        ))
        print(rows[-1])

    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    cols = list(rows[0].keys())
    with open(out_csv, "w") as f:
        f.write(",".join(cols) + "\n")
        for r in rows:
            f.write(",".join(str(r[c]) for c in cols) + "\n")
    print(f"wrote {out_csv}")
    # The engine default should sit at or below the measured crossover.
    cross = max((r["batch"] for r in rows if r["winner"] == "ivf"),
                default=0)
    print(f"crossover: IVF wins up to B={cross}")


if __name__ == "__main__":
    main()
