"""Lowering + speed probe: bf16 extraction passes and packed
value+index folds for the fused top-k kernel.

Round-3 rejected bf16 *compare* passes because Mosaic argmax is
f32-only and the matmul's f32 output needed a dedicated cast pass.
Two designs route around both:

a) bf16 scratch + argmax-free arg pick: the direct-store kernel casts
   the dot output INTO the bf16 scratch store (no extra pass), and the
   fold replaces argmax with max + (score == max -> min column) — every
   extraction pass then reads/writes HALF the bytes.
b) packed i32 scratch: store order-preserving-transformed bf16 score
   bits in the high 16 bits and (W-1-col) in the low bits; ONE i32 max
   reduction yields value AND column, the masked rewrite compares
   against the packed max. Same bytes as f32, but ~1 traversal per
   iteration instead of 3 and the trigger pass doubles as the first
   iteration's argmax.

This probe checks each building block lowers on real Mosaic, then
times full-kernel prototypes at the flagship shape.
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

print = functools.partial(print, flush=True)

B, W = 128, 8192


def probe(name, body, out_dtype=jnp.float32, out_shape=(B, 128)):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, W), jnp.float32)
    f = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
    )
    try:
        out = np.asarray(f(x))
        print(f"OK   {name}: {out.reshape(-1)[:3]}")
        return True
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:140]}")
        return False


def main():
    print("platform:", jax.devices()[0].platform)

    # --- a) bf16 building blocks -----------------------------------
    def bf16_max(x_ref, o_ref):
        ss = x_ref[:, :].astype(jnp.bfloat16)
        rm = jnp.max(ss, axis=1)  # bf16 reduce
        o_ref[:, :] = jnp.broadcast_to(
            rm[:, None].astype(jnp.float32), o_ref.shape
        )

    probe("bf16 row max", bf16_max)

    def bf16_argpick(x_ref, o_ref):
        ss = x_ref[:, :].astype(jnp.bfloat16)
        rm = jnp.max(ss, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        arg = jnp.min(
            jnp.where(ss == rm[:, None], col, jnp.int32(1 << 30)), axis=1
        )
        o_ref[:, :] = jnp.broadcast_to(
            arg[:, None].astype(jnp.float32), o_ref.shape
        )

    probe("bf16 eq-mask arg pick", bf16_argpick)

    def bf16_mask_write(x_ref, o_ref):
        ss = x_ref[:, :].astype(jnp.bfloat16)
        rm = jnp.max(ss, axis=1)
        ss2 = jnp.where(ss == rm[:, None], jnp.bfloat16(-3e38), ss)
        o_ref[:, :] = jnp.broadcast_to(
            jnp.max(ss2, axis=1)[:, None].astype(jnp.float32), o_ref.shape
        )

    probe("bf16 mask+remax", bf16_mask_write)

    # --- b) packed value+index blocks -------------------------------
    def packed(x_ref, o_ref):
        ss = x_ref[:, :].astype(jnp.bfloat16)
        u = pltpu.bitcast(ss, jnp.uint16).astype(jnp.int32)
        # order-preserving map: flip sign bit for positives, all bits
        # for negatives.
        key = jnp.where(u >= 0x8000, 0xFFFF - u, u + 0x8000)
        # bias to [-0x8000, 0x7FFF]: key<<16 must not overflow into the
        # i32 sign bit, or all positive scores order below negatives.
        key = key - 0x8000
        col = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        p = (key << 16) | (W - 1 - col)
        pm = jnp.max(p, axis=1)
        arg = (W - 1) - (pm & 0xFFFF)
        o_ref[:, :] = jnp.broadcast_to(
            arg[:, None].astype(jnp.float32), o_ref.shape
        )

    got = probe("packed i32 max (value+idx)", packed)

    if got:
        # cross-check against XLA argmax on bf16-rounded scores
        x = jax.random.normal(jax.random.PRNGKey(1), (B, W), jnp.float32)
        xb = x.astype(jnp.bfloat16)
        ref = np.asarray(jnp.argmax(xb, axis=1))

        f = pl.pallas_call(
            packed,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        )
        arg = np.asarray(f(x))[:, 0].astype(np.int64)
        # ties: packed picks smallest col; jnp.argmax also smallest.
        agree = (arg == ref).mean()
        vals_equal = np.asarray(
            jnp.take_along_axis(xb, arg[:, None], 1)
            == jnp.take_along_axis(xb, ref[:, None], 1)
        ).mean()
        print(f"packed argmax agreement: {agree:.3f} "
              f"(value-equal {vals_equal:.3f})")


if __name__ == "__main__":
    main()
