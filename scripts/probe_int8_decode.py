"""Does XLA stream int8 weights through a decode-style scan, or hoist
the int8->bf16 dequant out of the loop (materializing bf16 weights and
erasing the bandwidth win)?

Decode is weight-bandwidth-bound: ms/token ~ weight_bytes / HBM_BW.
If `(x @ W8.astype(bf16))` inside a scan streams the int8 bytes with a
fused dequant, int8 weight-only quantization halves decode latency for
free (no Pallas needed). If XLA hoists `convert(W8)` as loop-invariant,
each step reads bf16 bytes and int8 buys nothing — then only a Pallas
matvec kernel (int8 operand, i32 accumulate, like ops/pallas's
retrieval kernel) can claim the 2x.

Method: square W [H, H]; N chained matvec steps inside ONE jit via
fori_loop; carry perturbed with isnan(+) so nothing hoists on the data
side; one value read at the end (true device time, CLAUDE.md timing
methodology). Compare bf16-stored vs int8-stored weights at sizes
where weights dominate traffic.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

H = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = 64  # steps per timed call


def true_ms(fn, *args, reps=3):
    out = fn(*args)
    _ = float(np.asarray(out)[0, 0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out)[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3


def main():
    print("platform:", jax.devices()[0].platform, "H:", H, flush=True)
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-127, 128, (H, H)), jnp.int8)
    wb = w8.astype(jnp.bfloat16)
    scale = jnp.asarray(rng.random((H,)) * 0.01 + 0.005, jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((1, H)), jnp.bfloat16)

    @jax.jit
    def loop_bf16(x, w):
        def body(i, x):
            x = x + jnp.isnan(x).astype(x.dtype)  # no hoisting
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return jnp.tanh(y).astype(x.dtype)

        return jax.lax.fori_loop(0, N, body, x)

    @jax.jit
    def loop_int8_dequant(x, w, s):
        def body(i, x):
            x = x + jnp.isnan(x).astype(x.dtype)
            y = jnp.dot(x, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return jnp.tanh(y * s).astype(x.dtype)

        return jax.lax.fori_loop(0, N, body, x)

    @jax.jit
    def loop_int8_native(x, w, s):
        """int8 x int8 dot with i32 accumulate: quantize the activation
        per step (one [1,H] pass), dot in the integer domain."""
        def body(i, x):
            x = x + jnp.isnan(x).astype(x.dtype)
            ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            xs = ax.astype(jnp.float32) / 127.0
            x8 = jnp.clip(
                jnp.round(x.astype(jnp.float32) / xs), -127, 127
            ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x8, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * xs * s.astype(jnp.float32)
            return jnp.tanh(y).astype(x.dtype)

        return jax.lax.fori_loop(0, N, body, x)

    bytes_bf16 = 2 * H * H
    t_b = true_ms(loop_bf16, x0, wb)
    print(f"bf16 weights : {t_b:7.3f} ms/step "
          f"({bytes_bf16 / t_b / 1e6:6.0f} GB/s eff)", flush=True)
    t_q = true_ms(loop_int8_dequant, x0, w8, scale)
    print(f"int8 dequant : {t_q:7.3f} ms/step -> {t_b / t_q:4.2f}x "
          f"({bytes_bf16 / 2 / t_q / 1e6:6.0f} GB/s int8-eff)", flush=True)
    t_n = true_ms(loop_int8_native, x0, w8, scale)
    print(f"int8 native  : {t_n:7.3f} ms/step -> {t_b / t_n:4.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
