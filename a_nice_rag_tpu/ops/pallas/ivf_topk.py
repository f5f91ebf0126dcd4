"""IVF-probed dense top-k (Pallas TPU kernel, scalar-prefetch DMA).

The streaming kernel in :mod:`fused_topk` reads the WHOLE embedding
matrix every batch — exact, HBM-bandwidth-bound. This kernel reads only
the document tiles covering the query batch's probed IVF clusters: the
host/XLA side builds a tile table (``[max_tiles]`` int32, -1 padded)
from the cluster offsets, and the kernel's BlockSpec index_map reads it
via scalar prefetch — data-dependent DMA, the idiomatic TPU form of
"gather a cluster".

Design notes:

* Clusters are stored contiguously (cluster-major permutation of the
  corpus, built by index/ivf.py). A cluster's covering tiles may
  over-scan into neighbouring clusters at the boundaries — harmless:
  the extra rows are real documents, scored exactly; top-k only ever
  gains candidates. No per-cluster padding, no wasted HBM.
* Sentinel (-1) table entries map their DMA to tile 0 — the Pallas
  pipeline skips re-fetching an unchanged block, so a run of sentinels
  costs one tile fetch — and skip their fold under ``pl.when``.
* Only the physically-last corpus tile can contain padding rows; its
  valid count is derived in-kernel from the static ``n_real`` and the
  scheduled tile id, and a masked fold runs for that tile only
  (at most one scheduled tile per batch pays the select pass).
* Scores/ids fold into the same running-top-k scratch machinery as
  fused_topk (in-place scratch-ref extraction); ids are PERMUTED row
  indices — callers map them back through the IVF permutation.

Replaces (at probe-fraction cost ~p/C of the exact scan):
reference src/search_engine.py:128-138 at scales it cannot touch.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from a_nice_rag_tpu.ops.pallas.fused_topk import (
    NEG,
    _finalize_iterate,
    _fold_tile_iterate,
    _fold_tile_scratch,
)


def _ivf_kernel(tiles_ref, *refs, k: int, tile_n: int,
                n_real: int, subtiles: int, use_scratch: bool,
                int8: bool):
    """Grid = (max_tiles,). tiles_ref: prefetched [max_tiles + 1] int32
    — the LAST slot carries the dynamic real-row count when the static
    ``n_real`` is 0 (per-shard counts differ under shard_map, where the
    kernel is traced once for all shards)."""
    if int8:
        (q_ref, qs_ref, e_ref, es_ref, vals_ref, idx_ref,
         run_v, run_i, s_scr) = refs
    else:
        q_ref, e_ref, vals_ref, idx_ref, run_v, run_i, s_scr = refs
    g = pl.program_id(0)
    n_steps = pl.num_programs(0)
    t = tiles_ref[g]
    n_real = tiles_ref[n_steps] if n_real == 0 else n_real

    @pl.when(g == 0)
    def _():
        run_v[:, :] = jnp.full_like(run_v, NEG)
        run_i[:, :] = jnp.full_like(run_i, -1)

    n_sub = subtiles
    while tile_n % n_sub:
        n_sub //= 2
    w = tile_n // n_sub

    @pl.when(t >= 0)
    def _():
        if int8:
            acc = jax.lax.dot_general(
                q_ref[:],
                e_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # Per-row qs deferred to the finalize (order-preserving:
            # qs > 0) — saves a [B, tile_n] multiply per scheduled tile.
            scores = acc.astype(jnp.float32) * es_ref[:, 0][None, :]
        else:
            scores = jax.lax.dot_general(
                q_ref[:],
                e_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, tile_n]
        # Only the physically-last corpus tile holds padding rows.
        nv = n_real - t * tile_n  # >= tile_n for every other tile
        rv = run_v[:, :]
        ri = run_i[:, :]

        def fold(sub, off, rv, ri):
            if use_scratch:
                s_scr[:, :] = sub
                return _fold_tile_scratch(s_scr, off, rv, ri)
            return _fold_tile_iterate(sub, off, rv, ri)

        @pl.when(nv >= tile_n)
        def _():
            v, i = rv, ri
            for s in range(n_sub):
                v, i = fold(
                    scores[:, s * w:(s + 1) * w], t * tile_n + s * w, v, i
                )
            run_v[:, :] = v
            run_i[:, :] = i

        @pl.when(nv < tile_n)
        def _():
            col = jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1
            )
            masked = jnp.where(col < nv, scores, jnp.asarray(NEG, scores.dtype))
            v, i = rv, ri
            for s in range(n_sub):
                v, i = fold(
                    masked[:, s * w:(s + 1) * w], t * tile_n + s * w, v, i
                )
            run_v[:, :] = v
            run_i[:, :] = i

    @pl.when(g == n_steps - 1)
    def _():
        _finalize_iterate(run_v[:, :], run_i[:, :], vals_ref, idx_ref, k,
                          qs_ref[:, 0] if int8 else None)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "n_real", "subtiles",
                     "vmem_limit_bytes", "interpret"),
)
def ivf_dense_top_k(
    emb: jax.Array,
    queries: jax.Array,
    tile_table: jax.Array,
    k: int,
    tile_n: int,
    n_real: int,
    subtiles: int = 2,
    vmem_limit_bytes: int = 96 * 1024 * 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over the tiles listed in ``tile_table``.

    emb [Np, D] cluster-major (Np a multiple of tile_n; rows >= n_real
    are padding), queries [B, D], tile_table [max_tiles] int32 tile
    indices (-1 padded after the real entries; real entries first).
    Returns (values [B, k] desc f32, PERMUTED row ids [B, k], -inf/-1
    for unfilled slots). Exact over the scheduled tiles' real rows.
    """
    return _ivf_call(
        (queries, emb), emb.shape, queries.shape[0], tile_table, k,
        tile_n, n_real, subtiles, vmem_limit_bytes, interpret,
        int8=False,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "n_real", "subtiles",
                     "vmem_limit_bytes", "interpret"),
)
def ivf_dense_top_k_int8(
    values: jax.Array,
    scales: jax.Array,
    q_values: jax.Array,
    q_scales: jax.Array,
    tile_table: jax.Array,
    k: int,
    tile_n: int,
    n_real: int,
    subtiles: int = 2,
    vmem_limit_bytes: int = 96 * 1024 * 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Int8 variant: values [Np, D] int8 + scales [Np] f32
    (cluster-major, ops.quantized layout), q_values [B, D] int8 +
    q_scales [B] f32. int8 x int8 -> int32 on the MXU, rescaled in the
    epilogue. Same tile-table semantics as :func:`ivf_dense_top_k`."""
    return _ivf_call(
        (q_values, q_scales[:, None], values, scales[:, None]),
        values.shape, q_values.shape[0], tile_table, k,
        tile_n, n_real, subtiles, vmem_limit_bytes, interpret,
        int8=True,
    )


def _ivf_call(operands, shape, b, tile_table, k, tile_n, n_real,
              subtiles, vmem_limit_bytes, interpret, *, int8: bool):
    npad, d = shape
    assert npad % tile_n == 0, (npad, tile_n)
    # n_real == 0 selects the DYNAMIC form: the table carries one extra
    # trailing slot holding the real-row count (see _ivf_kernel).
    assert 0 <= n_real <= npad
    max_tiles = tile_table.shape[0] - (1 if n_real == 0 else 0)
    assert max_tiles >= 1
    n_sub = subtiles
    while tile_n % n_sub:
        n_sub //= 2
    q_spec = pl.BlockSpec((b, d), lambda g, tiles: (0, 0),
                          memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec(
        (tile_n, d),
        lambda g, tiles: (jnp.maximum(tiles[g], 0), 0),
        memory_space=pltpu.VMEM,
    )
    if int8:
        # Scale vectors travel as [_, 1] 2D blocks (1D f32 blocks
        # demand 256-aligned slicing on TPU).
        qs_spec = pl.BlockSpec((b, 1), lambda g, tiles: (0, 0),
                               memory_space=pltpu.VMEM)
        es_spec = pl.BlockSpec(
            (tile_n, 1),
            lambda g, tiles: (jnp.maximum(tiles[g], 0), 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [q_spec, qs_spec, e_spec, es_spec]
    else:
        in_specs = [q_spec, e_spec]
    # The fold's scratch-ref fast path needs f32 scores (argmax in
    # Mosaic is f32-only); the score epilogue is always f32 here.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, k), lambda g, tiles: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda g, tiles: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
            pltpu.VMEM((b, tile_n // n_sub), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _ivf_kernel, k=k, tile_n=tile_n, n_real=n_real,
        subtiles=n_sub, use_scratch=True, int8=int8,
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(tile_table, *operands)
    return vals, idx
