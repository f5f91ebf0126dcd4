"""Pallas fused matmul+top-k parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a_nice_rag_tpu.ops.dense import dense_top_k
from a_nice_rag_tpu.ops.pallas import fused_dense_top_k

INTERPRET = jax.default_backend() != "tpu"


def test_fused_matches_xla_topk():
    rng = np.random.default_rng(111)
    emb = rng.standard_normal((1024, 128)).astype(np.float32)
    q = rng.standard_normal((64, 128)).astype(np.float32)
    vals_p, idx_p = fused_dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), k=16, block_q=64, block_n=256,
        interpret=INTERPRET,
    )
    vals_x, idx_x = dense_top_k(jnp.asarray(emb), jnp.asarray(q), 16)
    np.testing.assert_allclose(
        np.asarray(vals_p), np.asarray(vals_x), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


def test_fused_with_mask():
    rng = np.random.default_rng(113)
    emb = rng.standard_normal((512, 64)).astype(np.float32)
    q = rng.standard_normal((64, 64)).astype(np.float32)
    mask = np.zeros(512, bool)
    mask[100:300] = True
    vals_p, idx_p = fused_dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), k=8, block_q=64, block_n=128,
        mask=jnp.asarray(mask), interpret=INTERPRET,
    )
    idx_p = np.asarray(idx_p)
    assert ((idx_p >= 100) & (idx_p < 300)).all()
    vals_x, idx_x = dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), 8, mask=jnp.asarray(mask)
    )
    np.testing.assert_array_equal(idx_p, np.asarray(idx_x))


def test_fused_k_larger_than_valid_entries():
    rng = np.random.default_rng(117)
    emb = rng.standard_normal((256, 32)).astype(np.float32)
    q = rng.standard_normal((64, 32)).astype(np.float32)
    mask = np.zeros(256, bool)
    mask[:5] = True  # only 5 valid docs, k=8
    vals_p, idx_p = fused_dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), k=8, block_q=64, block_n=128,
        mask=jnp.asarray(mask), interpret=INTERPRET,
    )
    vals_p, idx_p = np.asarray(vals_p), np.asarray(idx_p)
    assert (idx_p[:, :5] < 5).all()
    assert np.isinf(vals_p[:, 5:]).all()
    assert (idx_p[:, 5:] == -1).all()


def test_fused_int8_matches_xla_quantized():
    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k_int8
    from a_nice_rag_tpu.ops.quantized import (
        quantize_embeddings,
        quantize_queries,
        quantized_dense_top_k,
    )

    rng = np.random.default_rng(211)
    emb = rng.standard_normal((1024, 128)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((64, 128)).astype(np.float32)
    qd = quantize_embeddings(jnp.asarray(emb))
    qv, qsc = quantize_queries(jnp.asarray(q))
    v_p, i_p = fused_dense_top_k_int8(
        qd.values, qd.scales, qv, qsc, k=10, block_q=64, block_n=256,
        interpret=INTERPRET,
    )
    v_x, i_x = quantized_dense_top_k(qd, jnp.asarray(q), 10)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
    np.testing.assert_allclose(
        np.asarray(v_p), np.asarray(v_x), rtol=1e-5, atol=1e-6
    )


def test_fused_int8_with_mask():
    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k_int8
    from a_nice_rag_tpu.ops.quantized import (
        quantize_embeddings,
        quantize_queries,
    )

    rng = np.random.default_rng(213)
    emb = rng.standard_normal((512, 64)).astype(np.float32)
    q = rng.standard_normal((64, 64)).astype(np.float32)
    qd = quantize_embeddings(jnp.asarray(emb))
    qv, qsc = quantize_queries(jnp.asarray(q))
    mask = np.zeros(512, bool)
    mask[200:400] = True
    _, i_p = fused_dense_top_k_int8(
        qd.values, qd.scales, qv, qsc, k=5, block_q=64, block_n=128,
        mask=jnp.asarray(mask), interpret=INTERPRET,
    )
    i_p = np.asarray(i_p)
    assert ((i_p >= 200) & (i_p < 400)).all()


def test_fused_new_levers_parity():
    """Round-3 kernel levers: row_groups decoupling and bf16 comparison
    passes (documented exact-tie caveat) match the f32 reference on
    integer-valued scores (exactly representable in bf16)."""
    import jax.numpy as jnp
    import numpy as np

    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k

    rng = np.random.default_rng(4)
    n, d, b, k = 4096, 64, 32, 8
    emb = rng.integers(-3, 4, size=(n, d)).astype(np.float32)
    q = rng.integers(-2, 3, size=(b, d)).astype(np.float32)
    scores = q @ emb.T
    ref = np.sort(scores, axis=1)[:, ::-1][:, :k]
    for kwargs in (dict(row_groups=4), dict(compare_dtype="bfloat16"),
                   dict(row_groups=4, compare_dtype="bfloat16",
                        subtiles=4),
                   dict(gated=True), dict(gated=True, subtiles=4)):
        v, i = fused_dense_top_k(
            jnp.asarray(emb), jnp.asarray(q), k, interpret=True,
            block_q=16, block_n=1024, **kwargs,
        )
        got = np.take_along_axis(scores, np.asarray(i), axis=1)
        np.testing.assert_array_equal(np.sort(got)[:, ::-1], ref)


def test_fused_dbuf_matches_xla_topk():
    """Manually double-buffered variant (algo='dbuf'): exact id parity
    with the XLA path on an aligned, maskless corpus (its fast path)."""
    rng = np.random.default_rng(311)
    emb = rng.standard_normal((2048, 128)).astype(np.float32)
    q = rng.standard_normal((128, 128)).astype(np.float32)
    vals_p, idx_p = fused_dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), k=16, block_q=64, block_n=1024,
        algo="dbuf", interpret=INTERPRET,
    )
    vals_x, idx_x = dense_top_k(jnp.asarray(emb), jnp.asarray(q), 16)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(
        np.asarray(vals_p), np.asarray(vals_x), rtol=1e-5, atol=1e-6
    )


def test_fused_dbuf_odd_tile_count():
    rng = np.random.default_rng(313)
    emb = rng.standard_normal((3072, 64)).astype(np.float32)  # 3 tiles
    q = rng.standard_normal((64, 64)).astype(np.float32)
    vals_p, idx_p = fused_dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), k=8, block_q=64, block_n=1024,
        algo="dbuf", interpret=INTERPRET,
    )
    vals_x, idx_x = dense_top_k(jnp.asarray(emb), jnp.asarray(q), 8)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


def test_fused_dbuf_mask_and_misalignment_fall_back():
    """dbuf with a mask or a misaligned doc axis silently routes to the
    general iterate kernel — autotuned algo= configs must not break
    filtered calls."""
    rng = np.random.default_rng(317)
    emb = jnp.asarray(rng.standard_normal((2048, 64)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    mask = np.zeros(2048, bool)
    mask[200:900] = True
    _, idx_m = fused_dense_top_k(
        emb, q, k=8, block_q=64, block_n=1024, algo="dbuf",
        mask=jnp.asarray(mask), interpret=INTERPRET,
    )
    _, idx_x = dense_top_k(emb, q, 8, mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(idx_m), np.asarray(idx_x))
    _, idx_u = fused_dense_top_k(
        emb[:2000], q, k=8, block_q=64, block_n=1024, algo="dbuf",
        interpret=INTERPRET,
    )
    _, idx_y = dense_top_k(emb[:2000], q, 8)
    np.testing.assert_array_equal(np.asarray(idx_u), np.asarray(idx_y))


def test_fused_packed_exact_on_bf16_grid():
    """algo="packed" folds (bf16 key | column) into one i32 word —
    ids exactly match the f32 path whenever scores are bf16-exact
    (here: +/-1 embeddings, integer dot products). On non-grid scores
    ids may differ among values within one bf16 ulp (documented)."""
    rng = np.random.default_rng(117)
    emb = rng.choice([-1.0, 1.0], (2048, 64)).astype(np.float32)
    q = rng.choice([-1.0, 1.0], (32, 64)).astype(np.float32)
    vals_p, idx_p = fused_dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), k=8, block_q=16, block_n=1024,
        algo="packed", interpret=INTERPRET,
    )
    sc = q @ emb.T
    for r in range(32):
        got = np.sort(sc[r][np.asarray(idx_p)[r]])[::-1]
        ref = np.sort(sc[r])[::-1][:8]
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_allclose(
            np.sort(np.asarray(vals_p)[r])[::-1], ref
        )


def test_fused_packed_mask_and_random_value_parity():
    """Masked packed fold: value sets match XLA to bf16 resolution and
    masked-out docs never appear."""
    rng = np.random.default_rng(119)
    emb = rng.standard_normal((3072, 64)).astype(np.float32)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    mask = rng.random(3072) > 0.4
    vals_p, idx_p = fused_dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), k=8, block_q=16, block_n=1024,
        mask=jnp.asarray(mask), algo="packed", interpret=INTERPRET,
    )
    vals_x, idx_x = dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), 8, mask=jnp.asarray(mask)
    )
    idx_p, vals_p = np.asarray(idx_p), np.asarray(vals_p)
    assert mask[idx_p[idx_p >= 0]].all()
    np.testing.assert_allclose(
        np.sort(vals_p, 1), np.sort(np.asarray(vals_x), 1),
        rtol=8e-3, atol=1e-6,
    )


def test_fused_packed_int8_parity():
    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k_int8

    rng = np.random.default_rng(121)
    vals = rng.integers(-4, 5, (2048, 64)).astype(np.int8)
    scales = np.ones(2048, np.float32)
    qv = rng.integers(-4, 5, (16, 64)).astype(np.int8)
    qs = np.ones(16, np.float32)
    v_p, i_p = fused_dense_top_k_int8(
        jnp.asarray(vals), jnp.asarray(scales), jnp.asarray(qv),
        jnp.asarray(qs), 8, block_q=16, block_n=1024, algo="packed",
        interpret=INTERPRET,
    )
    sc = (qv.astype(np.int32) @ vals.astype(np.int32).T).astype(np.float32)
    assert np.abs(sc).max() < 256  # integer scores bf16-exact
    for r in range(16):
        got = np.sort(sc[r][np.asarray(i_p)[r]])[::-1]
        ref = np.sort(sc[r])[::-1][:8]
        np.testing.assert_array_equal(got, ref)


def test_fused_exact2_matches_xla_topk():
    """algo="exact2" (carried-argmax fold: one traversal per
    extraction iteration) is EXACT — ids match the XLA reference
    bit-for-bit, unlike the bf16-rounded packed fold."""
    rng = np.random.default_rng(131)
    emb = rng.standard_normal((3072, 96)).astype(np.float32)
    q = rng.standard_normal((32, 96)).astype(np.float32)
    vals_p, idx_p = fused_dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), k=12, block_q=16,
        block_n=1024, algo="exact2", interpret=INTERPRET,
    )
    vals_x, idx_x = dense_top_k(jnp.asarray(emb), jnp.asarray(q), 12)
    np.testing.assert_allclose(
        np.asarray(vals_p), np.asarray(vals_x), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


def test_fused_exact2_masked_and_int8():
    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k_int8

    rng = np.random.default_rng(137)
    emb = rng.standard_normal((2048, 64)).astype(np.float32)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    mask = rng.random(2048) > 0.5
    _, idx_m = fused_dense_top_k(
        jnp.asarray(emb), jnp.asarray(q), k=8, block_q=16, block_n=1024,
        mask=jnp.asarray(mask), algo="exact2", interpret=INTERPRET,
    )
    _, idx_x = dense_top_k(jnp.asarray(emb), jnp.asarray(q), 8,
                           mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(idx_m), np.asarray(idx_x))

    vals = rng.integers(-90, 91, (2048, 64)).astype(np.int8)
    qv = rng.integers(-90, 91, (16, 64)).astype(np.int8)
    _, i8 = fused_dense_top_k_int8(
        jnp.asarray(vals), jnp.ones(2048, np.float32), jnp.asarray(qv),
        jnp.ones(16, np.float32), 8, block_q=16, block_n=1024,
        algo="exact2", interpret=INTERPRET,
    )
    sc = (qv.astype(np.int32) @ vals.astype(np.int32).T)
    ref = np.sort(np.argsort(-sc, axis=1)[:, :8], 1)
    np.testing.assert_array_equal(np.sort(np.asarray(i8), 1), ref)


def test_fused_packed_vs_iterate_fuzz():
    """Packed vs iterate across shapes/k/alignments: value SETS must
    match within bf16 resolution (ids may swap among one-ulp ties);
    on bf16-exact integer grids ids must match exactly."""
    rng = np.random.default_rng(211)
    for n, d, b, k, bq, bn in [
        (1536, 32, 8, 4, 8, 512),     # misaligned doc axis (pads)
        (4096, 64, 24, 16, 8, 1024),
        (3072, 128, 16, 5, 16, 1024),  # odd k
    ]:
        emb = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((b, d)).astype(np.float32)
        v_i, i_i = fused_dense_top_k(
            jnp.asarray(emb), jnp.asarray(q), k=k, block_q=bq,
            block_n=bn, algo="iterate", interpret=INTERPRET,
        )
        v_p, i_p = fused_dense_top_k(
            jnp.asarray(emb), jnp.asarray(q), k=k, block_q=bq,
            block_n=bn, algo="packed", interpret=INTERPRET,
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(v_p), 1), np.sort(np.asarray(v_i), 1),
            rtol=8e-3, atol=1e-6, err_msg=str((n, d, b, k)),
        )
        # integer grid: exact id parity
        embi = rng.choice([-1.0, 0.0, 1.0], (n, d)).astype(np.float32)
        qi = rng.choice([-1.0, 1.0], (b, d)).astype(np.float32)
        sc = qi @ embi.T
        _, ii = fused_dense_top_k(
            jnp.asarray(embi), jnp.asarray(qi), k=k, block_q=bq,
            block_n=bn, algo="packed", interpret=INTERPRET,
        )
        for r in range(b):
            got = np.sort(sc[r][np.asarray(ii)[r]])[::-1]
            ref = np.sort(sc[r])[::-1][:k]
            np.testing.assert_array_equal(got, ref,
                                          err_msg=str((n, d, b, k, r)))


def test_fused_xpack_exact_id_parity_fuzz():
    """algo="xpack" (exact i32-key fold) must match iterate EXACTLY —
    ids and f32 values — on continuous random scores (no rounding
    caveat: the i32 key preserves the full f32 ordering). This is the
    round-4 verdict's exact-packed requirement; reference ordering
    being matched: src/search_engine.py:128-138 (exact f32)."""
    rng = np.random.default_rng(977)
    for n, d, b, k, bq, bn in [
        (2048, 32, 8, 4, 8, 512),
        (4096, 64, 24, 16, 8, 1024),
        (3072, 128, 16, 5, 16, 1024),   # odd k
        (1536, 32, 8, 4, 8, 512),       # misaligned -> iterate fallback
    ]:
        emb = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((b, d)).astype(np.float32)
        v_i, i_i = fused_dense_top_k(
            jnp.asarray(emb), jnp.asarray(q), k=k, block_q=bq,
            block_n=bn, algo="iterate", interpret=INTERPRET,
        )
        v_x, i_x = fused_dense_top_k(
            jnp.asarray(emb), jnp.asarray(q), k=k, block_q=bq,
            block_n=bn, algo="xpack", interpret=INTERPRET,
        )
        np.testing.assert_array_equal(
            np.asarray(i_x), np.asarray(i_i), err_msg=str((n, d, b, k))
        )
        np.testing.assert_array_equal(
            np.asarray(v_x), np.asarray(v_i), err_msg=str((n, d, b, k))
        )


def test_fused_xpack_int8_and_mask_fallback():
    """xpack int8: exact id parity with the iterate int8 fold
    (including the deferred per-row q-scale); masked calls fall back
    to iterate (still exact, filter respected)."""
    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k_int8
    from a_nice_rag_tpu.ops.quantized import quantize_embeddings

    rng = np.random.default_rng(978)
    n, d, b, k = 2048, 64, 16, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    qd = quantize_embeddings(jnp.asarray(emb))
    qv = rng.integers(-90, 91, (b, d)).astype(np.int8)
    qsc = (0.5 + rng.random(b)).astype(np.float32)
    v_i, i_i = fused_dense_top_k_int8(
        qd.values, qd.scales, jnp.asarray(qv), jnp.asarray(qsc), k,
        block_q=8, block_n=1024, algo="iterate", interpret=INTERPRET,
    )
    v_x, i_x = fused_dense_top_k_int8(
        qd.values, qd.scales, jnp.asarray(qv), jnp.asarray(qsc), k,
        block_q=8, block_n=1024, algo="xpack", interpret=INTERPRET,
    )
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_i))
    np.testing.assert_allclose(np.asarray(v_x), np.asarray(v_i),
                               rtol=1e-6)
    # Masked: transparent iterate fallback, filter respected.
    mask = np.zeros(n, bool)
    mask[300:900] = True
    _, i_m = fused_dense_top_k_int8(
        qd.values, qd.scales, jnp.asarray(qv), jnp.asarray(qsc), k,
        block_q=8, block_n=1024, mask=jnp.asarray(mask), algo="xpack",
        interpret=INTERPRET,
    )
    i_m = np.asarray(i_m)
    assert ((i_m >= 300) & (i_m < 900)).all()


def test_xpack_key_map_monotone_roundtrip():
    """The exact i32 key map must be strictly monotone over f32 order
    (incl. denormals, +-0 as a refinement, +-inf) and round-trip
    exactly through unpack_xpack_vals."""
    from a_nice_rag_tpu.ops.pallas.fused_topk import (
        _xpack_scores,
        unpack_xpack_vals,
    )

    vals = np.array(
        [-np.inf, -3.3e38, -1.0, -2e-38, -1e-45, -0.0, 0.0, 1e-45,
         2e-38, 0.5, 1.0, 3.3e38, np.inf], np.float32,
    )
    rng = np.random.default_rng(5)
    vals = np.concatenate([
        vals, (rng.standard_normal(4096) * 10).astype(np.float32)
    ])
    # Exercise the REAL kernel-side map (pltpu.bitcast needs a pallas
    # trace — a hand-copied formula here could silently drift from the
    # function the kernels actually run).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _key_kernel(x_ref, o_ref):
        o_ref[:, :] = _xpack_scores(x_ref[:, :])

    pad = (-len(vals)) % 128
    v2 = np.pad(vals, (0, pad)).reshape(1, -1)
    keys2 = pl.pallas_call(
        _key_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v2.shape, jnp.int32),
        interpret=True,
    )(jnp.asarray(v2))
    keys = np.asarray(keys2).ravel()[:len(vals)]
    order_f = np.argsort(vals, kind="stable")
    # Monotone: sorting by key sorts by float value (ties only at +-0).
    key_sorted_vals = vals[np.argsort(keys, kind="stable")]
    f_sorted_vals = vals[order_f]
    eq = (key_sorted_vals == f_sorted_vals)
    zero = key_sorted_vals == 0.0
    assert (eq | zero).all()
    # Exact bit round-trip.
    back = np.asarray(unpack_xpack_vals(jnp.asarray(keys)))
    np.testing.assert_array_equal(
        back.view(np.int32), vals.view(np.int32)
    )
