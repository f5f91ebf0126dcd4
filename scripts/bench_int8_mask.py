"""A/B the int8 streaming kernel's mask handling on the real TPU.

Two variants at the bench's 10.5M x 1024 configuration:
  none    — mask=None (maskless kernel, no mask operand at all)
  masked  — all-true mask (whole-tile select pass per streamed tile)

Measured 2026-08-17 (v5e, through the tunnel): none 39.4/48.3/39.6 ms
vs masked 62.7/68.1/64.9 ms at (bq, bn) = (256, 8192)/(128, 8192)/
(256, 16384) — the mask select is a full extra VPU pass worth ~60% of
the maskless kernel. Deferring the select into the fold's scratch copy
was ALSO measured at 62.7 ms (no help; the pass costs the same
wherever it runs), which is why the engine instead drops the mask
operand entirely when the mask would be all-true
(ArrayIndex.filter_mask_or_none).

Chained-dispatch timing per CLAUDE.md (times >> 2 ms dispatch floor).

Usage: python scripts/bench_int8_mask.py [N] [D] [B] [k]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.testing.timing import chained_dispatch_ms as timeit


def main():
    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k_int8

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_485_760
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 25
    print("platform:", jax.devices()[0].platform)

    @jax.jit
    def make():
        kv, kq = jax.random.split(jax.random.PRNGKey(0))
        vals = jax.random.randint(kv, (n, d), -127, 128, dtype=jnp.int8)
        q = jax.random.randint(kq, (b, d), -127, 128, dtype=jnp.int8)
        return vals, q

    vals, qv = make()
    scales = jnp.full((n,), 1.0 / 127.0, jnp.float32)
    qs = jnp.full((b,), 1.0 / 127.0, jnp.float32)
    ones = jnp.ones((n,), jnp.bool_)
    jax.block_until_ready(vals)
    float(np.asarray(qv[0, 0]))
    print("device arrays ready", vals.shape)

    ref_i = None
    for name, mask in [("none", None), ("masked", ones)]:
        for bq, bn in ((256, 8192), (128, 8192), (256, 16384)):
            if b % bq:
                continue
            fn = lambda: fused_dense_top_k_int8(
                vals, scales, qv, qs, k, mask=mask,
                block_q=bq, block_n=bn,
            )
            try:
                ms = timeit(fn, n=5, trials=2)
            except Exception as e:
                print(f"{name:9s} bq={bq} bn={bn}: FAIL {str(e)[:100]}")
                continue
            v, i = fn()
            i = np.asarray(i)
            if ref_i is None:
                ref_i = i
            match = "ids==ref" if np.array_equal(
                np.sort(i, axis=1), np.sort(ref_i, axis=1)
            ) else "IDS DIFFER"
            print(f"{name:9s} bq={bq} bn={bn}: {ms:7.2f} ms  {match}")


if __name__ == "__main__":
    main()
