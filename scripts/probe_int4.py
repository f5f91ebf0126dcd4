"""Probe: int4-packed streaming dense scoring on the TPU.

The 10.5M x 1024 int8 streaming kernel is DMA-bound (~340 GB/s
effective; ROADMAP "Performance"). Packing two 4-bit values per byte
halves the streamed bytes — IF Mosaic can unpack nibbles cheaply. The
pack layout pairs column j with column j + D/2 in one byte (a fixed
column permutation of E and q leaves dot products invariant), so the
kernel unpacks into two contiguous [Nt, D/2] int8 halves and runs two
half-width int8 MXU dots — no lane interleave needed.

Stage 1 (correctness, small): nibble-extraction variants vs numpy.
  a) int8 arithmetic shifts:      lo = (p << 4) >> 4, hi = p >> 4
  b) int32 upcast + mask/xor:     lo = ((p32 & 15) ^ 8) - 8, hi = p32 >> 4
Stage 2 (throughput, N=10.5M x 1024): stripped kernels (stream + unpack
+ dot + trivial running-max fold) int4 vs int8, chained-dispatch timed.

Usage: python scripts/probe_int4.py [stage]
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

from a_nice_rag_tpu.testing.timing import chained_dispatch_ms

print = functools.partial(print, flush=True)


def pack_int4(e4: np.ndarray) -> np.ndarray:
    """[N, D] int4-valued int8 -> [N, D//2] packed bytes.

    Byte j holds (col j) in the low nibble and (col j + D/2) in the
    high nibble."""
    n, d = e4.shape
    lo = e4[:, : d // 2].astype(np.uint8) & 0xF
    hi = e4[:, d // 2:].astype(np.uint8) & 0xF
    return (lo | (hi << 4)).astype(np.int8)


def _unpack_i8shift(p):
    hi = p >> 4
    lo = (p << 4) >> 4
    return lo, hi


def _unpack_i32(p):
    p32 = p.astype(jnp.int32)
    hi = (p32 >> 4).astype(jnp.int8)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)
    return lo, hi


def _score_kernel(q_ref, e_ref, out_ref, *, unpack):
    lo, hi = unpack(e_ref[:])
    d2 = q_ref.shape[1] // 2
    acc = jax.lax.dot_general(
        q_ref[:, :d2], lo, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc += jax.lax.dot_general(
        q_ref[:, d2:], hi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = acc


def stage1():
    rng = np.random.default_rng(0)
    n, d, b = 1024, 256, 128
    e4 = rng.integers(-8, 8, (n, d), dtype=np.int8)
    q8 = rng.integers(-128, 128, (b, d), dtype=np.int8)
    want = q8.astype(np.int32) @ e4.astype(np.int32).T
    packed = pack_int4(e4)
    for name, unpack in [("i8shift", _unpack_i8shift), ("i32mask", _unpack_i32)]:
        try:
            got = pl.pallas_call(
                functools.partial(_score_kernel, unpack=unpack),
                out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
            )(jnp.asarray(q8), jnp.asarray(packed))
            got = np.asarray(got)
            ok = np.array_equal(got, want)
            print(f"stage1 {name}: {'EXACT' if ok else 'WRONG'}"
                  + ("" if ok else f" maxerr={np.abs(got - want).max()}"))
        except Exception as e:  # noqa: BLE001 — probe
            print(f"stage1 {name}: FAILED {type(e).__name__}: {str(e)[:300]}")


# ---------------------------------------------------------------- stage 2

def _fold_kernel_int4(q_ref, e_ref, out_ref, run_m, *, unpack):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        run_m[:] = jnp.full_like(run_m, -(2 ** 30))

    lo, hi = unpack(e_ref[:])
    d2 = q_ref.shape[1] // 2
    acc = jax.lax.dot_general(
        q_ref[:, :d2], lo, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc += jax.lax.dot_general(
        q_ref[:, d2:], hi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    run_m[:] = jnp.maximum(run_m[:], jnp.max(acc, axis=1, keepdims=True))

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = run_m[:]


def _fold_kernel_int8(q_ref, e_ref, out_ref, run_m):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        run_m[:] = jnp.full_like(run_m, -(2 ** 30))

    acc = jax.lax.dot_general(
        q_ref[:], e_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    run_m[:] = jnp.maximum(run_m[:], jnp.max(acc, axis=1, keepdims=True))

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = run_m[:]


def stage2(n=10_485_760, d=1024, b=256, bn=8192, unpack_name="i8shift"):
    unpack = {"i8shift": _unpack_i8shift, "i32mask": _unpack_i32}[unpack_name]

    # The int8 matrix (n*d bytes) and the packed matrix (n*d/2) together
    # exceed v5e HBM at 10.5M x 1024 — allocate, measure, and free them
    # SEQUENTIALLY.
    @jax.jit
    def make_q():
        return jax.random.randint(
            jax.random.PRNGKey(2), (b, d), -127, 128, dtype=jnp.int8
        )

    @jax.jit
    def make_e8():
        return jax.random.randint(
            jax.random.PRNGKey(1), (n, d), -127, 128, dtype=jnp.int8
        )

    @jax.jit
    def make_packed():
        return jax.random.randint(
            jax.random.PRNGKey(1), (n, d // 2), -128, 128, dtype=jnp.int8
        )

    q = make_q()
    jax.block_until_ready(q)

    def run_int8(e8):
        return pl.pallas_call(
            _fold_kernel_int8,
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((b, d), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, d), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, 1), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((b, 1), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d, bytes_accessed=n * d,
                transcendentals=0),
        )(q, e8)

    def run_int4(packed):
        return pl.pallas_call(
            functools.partial(_fold_kernel_int4, unpack=unpack),
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((b, d), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, d // 2), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, 1), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((b, 1), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d, bytes_accessed=n * d // 2,
                transcendentals=0),
        )(q, packed)

    f8 = jax.jit(run_int8)
    f4 = jax.jit(run_int4)
    e8 = make_e8()
    jax.block_until_ready(e8)
    t8 = chained_dispatch_ms(lambda: f8(e8), n=6, trials=3)
    del e8
    packed = make_packed()
    jax.block_until_ready(packed)
    t4 = chained_dispatch_ms(lambda: f4(packed), n=6, trials=3)
    del packed
    gb8 = n * d / 1e9
    gb4 = gb8 / 2
    print(f"stage2 N={n} D={d} B={b} bn={bn} unpack={unpack_name}")
    print(f"  int8 stream+dot+maxfold: {t8:7.2f} ms  ({gb8 / t8 * 1e3:6.1f} GB/s)")
    print(f"  int4 stream+unpack+dot:  {t4:7.2f} ms  ({gb4 / t4 * 1e3:6.1f} GB/s)")
    print(f"  speedup: {t8 / t4:.2f}x")


def stage3():
    """Native jnp.int4 dtype straight into the MXU (no unpack pass)."""
    rng = np.random.default_rng(0)
    n, d, b = 1024, 256, 128
    e4 = rng.integers(-8, 8, (n, d), dtype=np.int8)
    q8 = rng.integers(-128, 128, (b, d), dtype=np.int8)
    want = q8.astype(np.int32) @ e4.astype(np.int32).T

    def kernel(q_ref, e_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            q_ref[:], e_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    try:
        e_i4 = jnp.asarray(e4).astype(jnp.int4)
        got = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        )(jnp.asarray(q8), e_i4)
        got = np.asarray(got)
        ok = np.array_equal(got, want)
        print(f"stage3 native-int4 dot: {'EXACT' if ok else 'WRONG'}")
    except Exception as e:  # noqa: BLE001 — probe
        print(f"stage3 native-int4 dot: FAILED {type(e).__name__}: {str(e)[:300]}")
    # And as a pure load + in-kernel upcast (dot stays int8).
    def kernel_up(q_ref, e_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            q_ref[:], e_ref[:].astype(jnp.int8),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    try:
        e_i4 = jnp.asarray(e4).astype(jnp.int4)
        got = pl.pallas_call(
            kernel_up,
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        )(jnp.asarray(q8), e_i4)
        ok = np.array_equal(np.asarray(got), want)
        print(f"stage3 int4-load+i8-upcast dot: {'EXACT' if ok else 'WRONG'}")
    except Exception as e:  # noqa: BLE001 — probe
        print(f"stage3 int4-load+i8-upcast: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("platform:", jax.devices()[0].platform)
    if stage in ("1", "all"):
        stage1()
    if stage in ("3", "all"):
        stage3()
    if stage in ("2", "all"):
        # i32mask first: i8shift does not lower (stage 1).
        for up in ("i32mask",):
            try:
                stage2(unpack_name=up)
            except Exception as e:  # noqa: BLE001 — probe
                print(f"stage2 {up}: FAILED {type(e).__name__}: {str(e)[:300]}")

