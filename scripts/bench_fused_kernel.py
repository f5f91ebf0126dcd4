"""A/B the streaming fused top-k kernel variants on the real TPU.

Chained-dispatch timing (N calls, one value read, /N) per CLAUDE.md —
fine here because kernel times are >> the ~2 ms dispatch floor.

Usage: python scripts/bench_fused_kernel.py [N] [D] [B] [k]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.testing.timing import chained_dispatch_ms as timeit


def main():
    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    print("platform:", jax.devices()[0].platform)

    # Generate ON DEVICE: a host->device upload of GBs through the
    # tunnel dominates wall clock and can blow past any timeout.
    n_pad = -(-n // 8192) * 8192

    @jax.jit
    def make():
        ke, kq = jax.random.split(jax.random.PRNGKey(0))
        emb = jax.random.normal(ke, (n_pad, d), dtype=jnp.bfloat16)
        q = jax.random.normal(kq, (b, d), dtype=jnp.bfloat16)
        return emb, q

    emb_bf, q_bf = make()
    jax.block_until_ready(emb_bf)
    float(np.asarray(q_bf[0, 0]))
    print("device arrays ready", emb_bf.shape, emb_bf.dtype)

    ref_v = ref_i = None
    # bf16 compare_dtype is dead on real Mosaic: argmax lowering is
    # f32-only AND tpu.matmul rejects non-32-bit accumulators, so any
    # bf16 trigger pass needs a full cast pass that cancels the saving.
    configs = [("gated", 128, 8192, True)] + [
        ("iterate", bq, bn, g)
        for bq in (128, 256)
        for bn in (8192, 16384)
        for g in (False, True)
    ]
    for algo, bq, bn, g in configs:
        if b % bq:
            continue
        cd = "gated" if g else "ungated"
        try:
            fn = lambda: fused_dense_top_k(
                emb_bf, q_bf, k, block_q=bq, block_n=bn, algo=algo,
                gated=g,
            )
            ms = timeit(fn)
            v, i = fn()
            v, i = np.asarray(v), np.asarray(i)
            if ref_v is None:
                ref_v, ref_i = v, i
                ok = "ref"
            elif (i == ref_i).all():
                ok = "ids-match"
            else:
                # bf16 comparison passes may legitimately reorder scores
                # within one bf16 ulp; report set overlap too.
                row_set = np.mean([
                    len(np.intersect1d(i[r], ref_i[r])) / i.shape[1]
                    for r in range(i.shape[0])
                ])
                ok = (f"IDS-DIFFER(pos={(i != ref_i).mean():.4f} "
                      f"set-overlap={row_set:.4f})")
            print(f"algo={algo:8s} bq={bq:4d} bn={bn:6d} cd={cd:8s}: "
                  f"{ms:8.2f} ms  [{ok}]")
        except Exception as e:
            print(f"algo={algo:8s} bq={bq:4d} bn={bn:6d} cd={cd:8s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")
    # roofline context
    bytes_ = emb_bf.size * 2
    print(f"emb bytes {bytes_/1e9:.2f} GB; one-pass DMA floor @819GB/s = "
          f"{bytes_/819e9*1e3:.2f} ms")


if __name__ == "__main__":
    main()
