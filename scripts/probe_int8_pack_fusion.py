"""int8 pack-fusion ablation at the BASELINE config-5 scale
(round-4 verdict next-step 5): N=10.5M x 1024, B=256, k=32.

Round 4 measured the bf16 pack epilogue +2.7 ms over int8 iterate (the
pack chain did not fuse with the dequant multiply), so int8 kept
iterate. Round 5 adds the EXACT i32-key fold (algo="xpack"), whose
pack is bitcast+select on the already-materialized f32 scores — this
probe measures all three folds TRUE device ms on identical data:

  iterate : f32 scratch, argmax + mask-write + re-max per iteration
  packed  : bf16-key|col i32 scratch (rounded ties), 1 traversal/iter
  xpack   : exact f32-order i32 scratch, 2 traversals/iter

plus the same trio at 2M x 256 bf16 (the flagship hybrid shape) for
the default-flip decision. Appends one line per measurement to stdout;
copy the table into docs/BENCHMARKS.md.

Usage: python scripts/probe_int8_pack_fusion.py [N] [D]
"""
import functools
import os
import sys

print = functools.partial(print, flush=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.ops.pallas import (
    fused_dense_top_k,
    fused_dense_top_k_int8,
)
from a_nice_rag_tpu.testing.timing import true_device_ms

B, K = 256, 32


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_485_760
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    print(f"platform: {jax.devices()[0].platform}  N={n} D={d} B={B} K={K}")

    @jax.jit
    def gen_int8(key):
        kv, kq = jax.random.split(key)
        vals = jax.random.randint(kv, (n, d), -110, 111, jnp.int8)
        scales = 0.5 + jax.random.uniform(kq, (n,), jnp.float32)
        return vals, scales

    vals, scales = gen_int8(jax.random.PRNGKey(0))
    jax.block_until_ready(vals)
    rng = np.random.default_rng(7)
    qv = jnp.asarray(rng.integers(-90, 91, (B, d)), jnp.int8)
    qs = jnp.asarray(0.5 + rng.random(B), jnp.float32)

    ref_ids = None
    for algo, st in (("iterate", 2), ("packed", 2), ("xpack", 1),
                     ("xpack", 2)):
        fn = lambda q, v, s, a=algo, t=st: fused_dense_top_k_int8(
            v, s, q, qs, K, block_q=256, block_n=16384, subtiles=t,
            algo=a,
        )[1]
        try:
            ids = np.asarray(jax.jit(fn)(qv, vals, scales))
        except Exception as e:  # noqa: BLE001 — lowering diagnostics
            print(f"int8 {algo}/st{st}: FAILED {str(e)[:140]}")
            continue
        if algo == "iterate":
            ref_ids = ids
        else:
            same = (ids == ref_ids).mean()
            print(f"  {algo}/st{st}: id agreement vs iterate {same:.6f}")
        ms = true_device_ms(
            lambda q, v, s: fn(q, v, s), qv, vals, scales,
            n_loop=12, trials=3,
        )
        gb = (n * d + B * d) / 1e9
        print(f"int8 {algo:8s}/st{st}: TRUE {ms:7.2f} ms  "
              f"({gb / ms * 1e3:.0f} GB/s)")

    # Flagship bf16 shape for the default-flip decision.
    n2, d2 = 1 << 21, 256

    @jax.jit
    def gen_bf16(key):
        e = jax.random.normal(key, (n2, d2), jnp.float32)
        inv = jax.lax.rsqrt(jnp.sum(e * e, axis=1, keepdims=True))
        return (e * inv).astype(jnp.bfloat16)

    emb = gen_bf16(jax.random.PRNGKey(1))
    jax.block_until_ready(emb)
    q2 = jnp.asarray(rng.standard_normal((B, d2)), jnp.float32)
    for algo, st in (("iterate", 2), ("packed", 1), ("xpack", 1),
                     ("xpack", 2)):
        fn2 = lambda q, e, a=algo, t=st: fused_dense_top_k(
            e, q, K, block_q=128, block_n=16384, subtiles=t, algo=a,
        )[1]
        try:
            ms = true_device_ms(lambda q, e: fn2(q, e), q2, emb,
                                n_loop=30, trials=3)
        except Exception as e:  # noqa: BLE001
            print(f"bf16 2M {algo}/st{st}: FAILED {str(e)[:140]}")
            continue
        gb = n2 * d2 * 2 / 1e9
        print(f"bf16 2M {algo:8s}/st{st}: TRUE {ms:6.2f} ms  "
              f"({gb / ms * 1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()
