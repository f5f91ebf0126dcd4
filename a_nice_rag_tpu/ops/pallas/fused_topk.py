"""Fused dense scoring + streaming top-k (Pallas TPU kernel).

The XLA path materializes the full [B, N] score matrix in HBM before
top-k — at corpus scale (N in the millions, SURVEY.md §7 stage 5) that
is the dominant HBM traffic (B=512, N=10M, f32 -> 20 GB per batch).
This kernel streams document tiles through VMEM instead: for each query
block it computes one [Bq, Nt] score tile on the MXU and folds the
tile's best k entries into a running top-k buffer held in VMEM scratch —
HBM sees the embedding matrix exactly once plus the final [B, K] result.

Mosaic has no native top_k lowering, so selection is a k-step
iterative max+argmax+mask loop on the VPU. Two cost controls keep it
off the critical path:

* tile skip: a tile whose row maxima cannot beat any query's current
  k-th best is skipped entirely (after warm-up, almost every tile —
  selection cost amortizes to ~zero for random-ish score streams);
* the merge of (running k) with (tile k) runs on a [Bq, 2k] buffer.

Scores accumulate in float32 regardless of embedding storage dtype.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # sentinel; cleaner than -inf inside the selection loop

# Mosaic requires the 1D mask operand's block to match XLA's T(1024)
# layout tile, so the document axis must be 1024-aligned and block_n a
# multiple of 1024.
_N_ALIGN = 1024


def _align_doc_axis(n: int, block_n: int, mask, *row_arrays):
    """Pad the doc axis to _N_ALIGN and pick a conforming block_n.

    Returns (n, block_n, mask, *row_arrays). The pad copies row_arrays —
    cheap for the small corpora that are ever misaligned; large indices
    should be built 8192-aligned so this is a no-op.
    """
    if n % _N_ALIGN:
        pad = _N_ALIGN - n % _N_ALIGN
        row_arrays = tuple(
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in row_arrays
        )
        mask = jnp.pad(mask, (0, pad))  # False: padded rows never win
        n += pad
    # Largest power-of-two tile <= requested that divides n. The old
    # list topped out at 8192, silently clamping every block_n=16384
    # request (all "bn=16384" autotune/bench rows through round 4
    # actually ran 8192); 65536 is the packed column field's ceiling.
    for cand in (65536, 32768, 16384, 8192, 4096, 2048, 1024):
        if cand <= max(block_n, _N_ALIGN) and n % cand == 0:
            block_n = cand
            break
    return (n, block_n, mask) + row_arrays


def _select_topk(scores: jax.Array, ids: jax.Array, k: int):
    """Iterative top-k along axis 1. scores [Bq, M], ids [Bq, M] ->
    (vals [Bq, k] desc, ids [Bq, k])."""
    bq, m = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, m), 1)

    def body(t, carry):
        s, out_v, out_i = carry
        row_max = jnp.max(s, axis=1)  # [Bq]
        arg = jnp.argmax(s, axis=1).astype(jnp.int32)  # [Bq]
        # Mosaic has no general gather; select the picked id by mask+max.
        picked_id = jnp.max(
            jnp.where(col == arg[:, None], ids, jnp.int32(-2147483647)),
            axis=1,
        )
        onehot_t = (
            jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1) == t
        )
        out_v = jnp.where(onehot_t, row_max[:, None], out_v)
        out_i = jnp.where(onehot_t, picked_id[:, None], out_i)
        s = jnp.where(col == arg[:, None], NEG, s)
        return s, out_v, out_i

    init_v = jnp.full((bq, k), NEG, jnp.float32)
    init_i = jnp.full((bq, k), -1, jnp.int32)
    _, vals, out_ids = jax.lax.fori_loop(
        0, k, body, (scores, init_v, init_i)
    )
    return vals, out_ids


def _fold_tile_iterate(scores, off, run_v, run_i):
    """Fold one score tile into the (UNSORTED) running top-k arrays;
    returns the updated (run_v, run_i).

    Iterate-until-clean selection: each iteration extracts at most one
    improving element per row (max + argmax), inserts it by replacing
    the row's current minimum slot, masks that column, and repeats
    while any row still beats its running k-th best. Cost scales with
    the tile's actual improvement count (~1-2 per firing tile in the
    steady state of a random-order stream) instead of a fixed m-step
    extraction; non-firing tiles pay one row-max pass. Ids come straight
    from ``argmax + off`` (columns are iota-local), avoiding the
    mask+max id-pick pass of the previous design.

    The running buffer is maintained unsorted; callers sort once at the
    final tile. Exact by construction: the loop only stops when no row
    can improve, so there is no count-cap fallback path.
    """
    bq, nt = scores.shape
    k = run_v.shape[1]
    neg = jnp.asarray(NEG, scores.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, nt), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1)
    row_max = jnp.max(scores, axis=1)
    kth = jnp.min(run_v, axis=1).astype(scores.dtype)

    def cond(c):
        it, _, rm, _, _, kth = c
        # Scalar reductions must be 32-bit on Mosaic; rm/kth are tiny
        # [Bq] vectors so the cast is off the critical path.
        gap = (rm - kth).astype(jnp.float32)
        return jnp.logical_and(it < nt, jnp.max(gap) > 0.0)

    def body(c):
        it, s, rm, rv, ri, kth = c
        arg = jnp.argmax(s, axis=1).astype(jnp.int32)
        imp = rm > kth
        amin = jnp.argmin(rv, axis=1).astype(jnp.int32)
        hot = jnp.logical_and(kcol == amin[:, None], imp[:, None])
        rv = jnp.where(hot, rm[:, None].astype(jnp.float32), rv)
        ri = jnp.where(hot, (arg + off)[:, None], ri)
        s = jnp.where(col == arg[:, None], neg, s)
        rm = jnp.max(s, axis=1)
        kth = jnp.min(rv, axis=1).astype(s.dtype)
        return it + 1, s, rm, rv, ri, kth

    _, _, _, rv, ri, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), scores, row_max, run_v, run_i, kth)
    )
    return rv, ri


def _fold_tile_scratch(s_ref, off, rv, ri, rm0=None, kth0=None):
    """Scratch-ref variant of :func:`_fold_tile_iterate`.

    The extraction loop mutates the score subtile IN PLACE through a
    VMEM scratch ref instead of carrying the [Bq, W] array through the
    while_loop — carried multi-MB arrays are copied per iteration by
    Mosaic, which round-3 measurements put at ~1.8 ms of the 13.4 ms
    N=4M kernel (scratch fold: 11.6 ms, ids identical).

    ``s_ref`` holds the subtile's scores (already written); rv/ri are
    the small [Bq, k] running arrays (carried — they are k-wide, copy
    cost negligible). ``rm0``/``kth0`` accept precomputed first-pass
    row maxima / running k-th values so gated callers don't pay the
    trigger pass twice.
    """
    bq, w = s_ref.shape
    k = rv.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1)
    if rm0 is None:
        rm0 = jnp.max(s_ref[:, :], axis=1)
    if kth0 is None:
        kth0 = jnp.min(rv, axis=1)

    def cond(c):
        it, rm, _, _, kth = c
        gap = (rm - kth).astype(jnp.float32)
        return jnp.logical_and(it < w, jnp.max(gap) > 0.0)

    def body(c):
        it, rm, rv, ri, kth = c
        ss = s_ref[:, :]
        arg = jnp.argmax(ss, axis=1).astype(jnp.int32)
        imp = rm > kth
        amin = jnp.argmin(rv, axis=1).astype(jnp.int32)
        hot = jnp.logical_and(kcol == amin[:, None], imp[:, None])
        rv = jnp.where(hot, rm[:, None].astype(jnp.float32), rv)
        ri = jnp.where(hot, (arg + off)[:, None], ri)
        ss = jnp.where(cols == arg[:, None], jnp.asarray(NEG, ss.dtype), ss)
        s_ref[:, :] = ss
        rm = jnp.max(ss, axis=1)
        kth = jnp.min(rv, axis=1).astype(rm.dtype)
        return it + 1, rm, rv, ri, kth

    _, _, rv, ri, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rm0, rv, ri, kth0.astype(rm0.dtype))
    )
    return rv, ri


def _packed_neg_sat() -> int:
    """Packed form of the NEG sentinel with a saturated column field —
    every real (> NEG) score packs strictly above it."""
    import ml_dtypes
    import numpy as np

    bits = int(
        np.asarray(NEG, dtype=ml_dtypes.bfloat16).view(np.uint16)
    )
    key = (0xFFFF - bits) - 0x8000  # NEG is negative: order-flip map
    return (key << 16) | 0xFFFF


_PACKED_NEG_SAT = _packed_neg_sat()
_I32_MIN = -2147483648


def _pack_scores(scores, n_tile: int):
    """Order-preserving (bf16 value, column) packing into one int32.

    High 16 bits: the score's bf16 bit pattern mapped monotonically to
    a signed 16-bit key (sign-flip map, then biased to [-0x8000,
    0x7FFF] so the <<16 never overflows into the i32 sign bit). Low 16
    bits: (n_tile - 1 - col), so among equal scores the SMALLEST column
    wins the max. One i32 max reduction then yields the row's best
    value AND its column — Mosaic's f32-only argmax is never needed,
    and each extraction iteration is a single read+mask+write+max
    traversal instead of argmax + mask-write + re-max.

    The cost: top-k is taken on bf16-ROUNDED scores — ids can differ
    from the f32 path only among scores within one bf16 ulp (the same
    documented tie caveat as ``compare_dtype``); returned values are
    bf16-resolution.
    """
    bq, w = scores.shape
    sb = scores.astype(jnp.bfloat16)
    u = pltpu.bitcast(sb, jnp.uint16).astype(jnp.int32)
    key = jnp.where(u >= 0x8000, 0xFFFF - u, u + 0x8000) - 0x8000
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1)
    return (key << 16) | (n_tile - 1 - col)


def unpack_packed_vals(kv: jax.Array) -> jax.Array:
    """XLA-side inverse of :func:`_pack_scores`'s key field: packed i32
    -> f32 score values (bf16 resolution). Runs OUTSIDE the kernel."""
    key = (kv >> 16) + 0x8000  # [0, 65535]
    u = jnp.where(key >= 0x8000, key - 0x8000, 0xFFFF - key)
    bits = u.astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(bits, jnp.bfloat16).astype(
        jnp.float32
    )


def _select_topk_i32(kv: jax.Array, ids: jax.Array, k: int):
    """Iterative top-k on PACKED i32 keys (descending). Mosaic argmax
    is f32-only, so the arg pick is eq-mask + min-column."""
    bq, m = kv.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, m), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1)

    def body(t, carry):
        s, out_v, out_i = carry
        row_max = jnp.max(s, axis=1)
        elig = s == row_max[:, None]
        arg = jnp.min(
            jnp.where(elig, col, jnp.int32(1 << 30)), axis=1
        )
        picked = jnp.max(
            jnp.where(col == arg[:, None], ids, jnp.int32(-2147483647)),
            axis=1,
        )
        onehot = kcol == t
        out_v = jnp.where(onehot, row_max[:, None], out_v)
        out_i = jnp.where(onehot, picked[:, None], out_i)
        s = jnp.where(col == arg[:, None], jnp.int32(_I32_MIN), s)
        return s, out_v, out_i

    init_v = jnp.full((bq, k), _I32_MIN, jnp.int32)
    init_i = jnp.full((bq, k), -1, jnp.int32)
    _, vals, out_ids = jax.lax.fori_loop(0, k, body, (kv, init_v, init_i))
    return vals, out_ids


def _fold_window_packed(p_ref, col0: int, w: int, tile_base, n_tile: int,
                        rv, ri):
    """Extraction on the packed scratch: one i32 max per window is both
    the trigger AND the first argument; each loop iteration is one
    masked rewrite + re-max traversal. rv holds packed keys
    (column-saturated), ri global ids."""
    bq = p_ref.shape[0]
    k = rv.shape[1]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1)
    pm0 = jnp.max(p_ref[:, col0:col0 + w], axis=1)
    kth0 = jnp.min(rv, axis=1)

    def cond(c):
        it, pm, _, _, kth = c
        fire = jnp.max(jnp.where(pm > kth, 1, 0))
        return jnp.logical_and(it < w, fire > 0)

    def body(c):
        it, pm, rv, ri, kth = c
        imp = pm > kth
        # eq-mask argmin over the k-wide running buffer (tiny).
        elig = rv == kth[:, None]
        slot = jnp.min(
            jnp.where(elig, kcol, jnp.int32(1 << 30)), axis=1
        )
        hot = jnp.logical_and(kcol == slot[:, None], imp[:, None])
        rv = jnp.where(hot, (pm | 0xFFFF)[:, None], rv)
        col_t = (n_tile - 1) - (pm & 0xFFFF)
        ri = jnp.where(hot, (tile_base + col_t)[:, None], ri)
        pp = p_ref[:, col0:col0 + w]
        pp = jnp.where(pp == pm[:, None], jnp.int32(_I32_MIN), pp)
        p_ref[:, col0:col0 + w] = pp
        pm = jnp.max(pp, axis=1)
        kth = jnp.min(rv, axis=1)
        return it + 1, pm, rv, ri, kth

    _, _, rv, ri, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), pm0, rv, ri, kth0)
    )
    return rv, ri


def _packed_visit(scores, kvals_ref, idx_ref, run_v, run_i, p_scr, *,
                  k: int, n_tile: int, block_q: int, subtiles: int):
    """Packed-fold visit: pack the tile's scores into the i32 scratch
    (fused into the store), fold static windows, emit PACKED values at
    the last tile (the launcher unpacks outside the kernel)."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(0)
    row0 = pl.multiple_of(i * block_q, block_q)
    p_scr[:, :] = _pack_scores(scores, n_tile)
    n_sub = subtiles
    width = n_tile
    while width % n_sub:
        n_sub //= 2
    w = width // n_sub
    rv = run_v[pl.ds(row0, block_q), :]
    ri = run_i[pl.ds(row0, block_q), :]
    first = (j == 0)
    rv = jnp.where(first, jnp.full((block_q, k), _I32_MIN, jnp.int32), rv)
    ri = jnp.where(first, jnp.full((block_q, k), -1, jnp.int32), ri)
    for s in range(n_sub):
        rv, ri = _fold_window_packed(
            p_scr, s * w, w, j * n_tile, n_tile, rv, ri
        )
    run_v[pl.ds(row0, block_q), :] = rv
    run_i[pl.ds(row0, block_q), :] = ri

    @pl.when(j == n_tiles - 1)
    def _():
        new_v, new_i = _select_topk_i32(rv, ri, k)
        kvals_ref[:] = new_v
        idx_ref[:] = jnp.where(new_v <= _PACKED_NEG_SAT, -1, new_i)


def _kernel_packed(*refs, k: int, n_tile: int, block_q: int,
                   has_mask: bool, subtiles: int = 2):
    if has_mask:
        q_ref, e_ref, mask_ref, kvals_ref, idx_ref, run_v, run_i, p_scr = refs
    else:
        q_ref, e_ref, kvals_ref, idx_ref, run_v, run_i, p_scr = refs
    scores = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_mask:
        scores = jnp.where(mask_ref[:][None, :], scores, NEG)
    _packed_visit(scores, kvals_ref, idx_ref, run_v, run_i, p_scr,
                  k=k, n_tile=n_tile, block_q=block_q, subtiles=subtiles)


def _kernel_packed_int8(*refs, k: int, n_tile: int, block_q: int,
                        has_mask: bool, subtiles: int = 2):
    if has_mask:
        (q_ref, qs_ref, e_ref, es_ref, mask_ref, kvals_ref, idx_ref,
         run_v, run_i, p_scr) = refs
    else:
        (q_ref, qs_ref, e_ref, es_ref, kvals_ref, idx_ref, run_v, run_i,
         p_scr) = refs
    acc = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Per-row qs deferred to the finalize (order-preserving: qs > 0),
    # saving a full [Bq, Nt] multiply pass per streamed tile.
    scores = acc.astype(jnp.float32) * es_ref[:, 0][None, :]
    if has_mask:
        scores = jnp.where(mask_ref[:][None, :], scores, NEG)
    _packed_visit(scores, kvals_ref, idx_ref, run_v, run_i, p_scr,
                  k=k, n_tile=n_tile, block_q=block_q, subtiles=subtiles)


def _xpack_scores(scores):
    """EXACT order-preserving f32 -> i32 key (algo="xpack").

    The classic sign-flip map in the signed domain: positive floats
    keep their bit pattern (non-negative i32, monotone), negative
    floats map to ``~bits ^ INT_MIN`` (negative i32, monotone, below
    every positive). Unlike :func:`_pack_scores` there is NO column
    field and NO rounding — the full 32-bit f32 ordering survives, so
    a single i32 max reduce is an exact f32 max. The column pick costs
    one extra eq-mask traversal per extraction iteration (see
    :func:`_fold_window_xpack`); ~2 traversals/iteration vs packed's 1
    and iterate's 3. (-0.0 orders just below +0.0 — a strict
    refinement of the f32 total order, unobservable for dot-product
    scores.)
    """
    i = pltpu.bitcast(scores, jnp.int32)
    return jnp.where(i >= 0, i, (~i) ^ jnp.int32(_I32_MIN))


def unpack_xpack_vals(kv: jax.Array) -> jax.Array:
    """XLA-side inverse of :func:`_xpack_scores` (exact). Runs OUTSIDE
    the kernel; callers must sentinel-check ``kv == _I32_MIN`` (an
    unfilled slot round-trips to NaN bits)."""
    i = jnp.where(kv >= 0, kv, ~(kv ^ jnp.int32(_I32_MIN)))
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _fold_window_xpack(p_ref, col0: int, w: int, tile_base, rv, ri):
    """Extraction on the EXACT i32-key scratch: the i32 max per window
    is the trigger and the exact value; the winning column is an
    eq-mask + min-col traversal (the key carries no column field), and
    the masked rewrite + re-max fuse into one more traversal — the
    packed fold's structure at one extra pass, with f32-exact ordering.
    rv holds exact keys, ri global ids."""
    bq = p_ref.shape[0]
    k = rv.shape[1]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1)
    pm0 = jnp.max(p_ref[:, col0:col0 + w], axis=1)
    kth0 = jnp.min(rv, axis=1)

    def cond(c):
        it, pm, _, _, kth = c
        fire = jnp.max(jnp.where(pm > kth, 1, 0))
        return jnp.logical_and(it < w, fire > 0)

    def body(c):
        it, pm, rv, ri, kth = c
        imp = pm > kth
        # eq-mask argmin over the k-wide running buffer (tiny).
        elig = rv == kth[:, None]
        slot = jnp.min(
            jnp.where(elig, kcol, jnp.int32(1 << 30)), axis=1
        )
        # Column pick: min column holding the max key (iterate's
        # argmax-first-occurrence semantics) — one [bq, w] traversal.
        pp = p_ref[:, col0:col0 + w]
        argc = jnp.min(
            jnp.where(pp == pm[:, None], cols, jnp.int32(1 << 30)),
            axis=1,
        )
        hot = jnp.logical_and(kcol == slot[:, None], imp[:, None])
        rv = jnp.where(hot, pm[:, None], rv)
        ri = jnp.where(hot, (tile_base + col0 + argc)[:, None], ri)
        # Masked rewrite of ONLY the picked column (exact ties must
        # survive for later iterations) + re-max, fused in one pass.
        pp = jnp.where(cols == argc[:, None], jnp.int32(_I32_MIN), pp)
        p_ref[:, col0:col0 + w] = pp
        pm = jnp.max(pp, axis=1)
        kth = jnp.min(rv, axis=1)
        return it + 1, pm, rv, ri, kth

    _, _, rv, ri, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), pm0, rv, ri, kth0)
    )
    return rv, ri


def _xpack_visit(scores, kvals_ref, idx_ref, run_v, run_i, p_scr, *,
                 k: int, n_tile: int, block_q: int, subtiles: int):
    """Exact-key fold visit: pack the tile's scores into the i32
    scratch (fused into the store), fold static windows, emit exact
    keys at the last tile (the launcher unpacks outside the kernel)."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(0)
    row0 = pl.multiple_of(i * block_q, block_q)
    p_scr[:, :] = _xpack_scores(scores)
    n_sub = subtiles
    width = n_tile
    while width % n_sub:
        n_sub //= 2
    w = width // n_sub
    rv = run_v[pl.ds(row0, block_q), :]
    ri = run_i[pl.ds(row0, block_q), :]
    first = (j == 0)
    rv = jnp.where(first, jnp.full((block_q, k), _I32_MIN, jnp.int32), rv)
    ri = jnp.where(first, jnp.full((block_q, k), -1, jnp.int32), ri)
    for s in range(n_sub):
        rv, ri = _fold_window_xpack(
            p_scr, s * w, w, j * n_tile, rv, ri
        )
    run_v[pl.ds(row0, block_q), :] = rv
    run_i[pl.ds(row0, block_q), :] = ri

    @pl.when(j == n_tiles - 1)
    def _():
        new_v, new_i = _select_topk_i32(rv, ri, k)
        kvals_ref[:] = new_v
        idx_ref[:] = new_i


def _kernel_xpack(*refs, k: int, n_tile: int, block_q: int,
                  has_mask: bool, subtiles: int = 2):
    if has_mask:
        q_ref, e_ref, mask_ref, kvals_ref, idx_ref, run_v, run_i, p_scr = refs
    else:
        q_ref, e_ref, kvals_ref, idx_ref, run_v, run_i, p_scr = refs
    scores = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_mask:
        scores = jnp.where(mask_ref[:][None, :], scores, NEG)
    _xpack_visit(scores, kvals_ref, idx_ref, run_v, run_i, p_scr,
                 k=k, n_tile=n_tile, block_q=block_q, subtiles=subtiles)


def _kernel_xpack_int8(*refs, k: int, n_tile: int, block_q: int,
                       has_mask: bool, subtiles: int = 2):
    if has_mask:
        (q_ref, qs_ref, e_ref, es_ref, mask_ref, kvals_ref, idx_ref,
         run_v, run_i, p_scr) = refs
    else:
        (q_ref, qs_ref, e_ref, es_ref, kvals_ref, idx_ref, run_v, run_i,
         p_scr) = refs
    acc = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Per-row qs deferred to the finalize (order-preserving: qs > 0).
    scores = acc.astype(jnp.float32) * es_ref[:, 0][None, :]
    if has_mask:
        scores = jnp.where(mask_ref[:][None, :], scores, NEG)
    _xpack_visit(scores, kvals_ref, idx_ref, run_v, run_i, p_scr,
                 k=k, n_tile=n_tile, block_q=block_q, subtiles=subtiles)


def _fold_window_carried(s_ref, col0: int, w: int, off, rv, ri):
    """EXACT fold at ~one traversal per iteration: the row max AND its
    argmax are computed together in the same traversal that writes the
    masked rewrite, then CARRIED into the next iteration — the packed
    fold's pass structure without its bf16 rounding (algo="exact2").

    Correctness note shared with the other folds: an iteration masks
    every row's current argmax column even when that row saw no
    improvement — harmless, since a value <= the running k-th can
    never improve later within this window (kth only rises).
    """
    bq = s_ref.shape[0]
    k = rv.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1)
    win0 = s_ref[:, col0:col0 + w]
    rm0 = jnp.max(win0, axis=1)
    a0 = jnp.argmax(win0, axis=1).astype(jnp.int32)
    kth0 = jnp.min(rv, axis=1)

    def cond(c):
        it, rm, _, _, _, kth = c
        return jnp.logical_and(it < w, jnp.max(rm - kth) > 0.0)

    def body(c):
        it, rm, arg, rv, ri, kth = c
        imp = rm > kth
        amin = jnp.argmin(rv, axis=1).astype(jnp.int32)
        hot = jnp.logical_and(kcol == amin[:, None], imp[:, None])
        rv = jnp.where(hot, rm[:, None], rv)
        ri = jnp.where(hot, (arg + off)[:, None], ri)
        ss = s_ref[:, col0:col0 + w]
        ss = jnp.where(cols == arg[:, None], jnp.asarray(NEG, ss.dtype),
                       ss)
        s_ref[:, col0:col0 + w] = ss
        rm = jnp.max(ss, axis=1)
        arg = jnp.argmax(ss, axis=1).astype(jnp.int32)
        kth = jnp.min(rv, axis=1)
        return it + 1, rm, arg, rv, ri, kth

    _, _, _, rv, ri, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rm0, a0, rv, ri, kth0)
    )
    return rv, ri


def _exact2_visit(scores, vals_ref, idx_ref, run_v, run_i, s_full, *,
                  k: int, n_tile: int, block_q: int, subtiles: int,
                  row_scale=None):
    """Direct-store visit over the carried-argmax fold."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(0)
    row0 = pl.multiple_of(i * block_q, block_q)
    s_full[:, :] = scores
    n_sub = subtiles
    width = n_tile
    while width % n_sub:
        n_sub //= 2
    w = width // n_sub
    rv = run_v[pl.ds(row0, block_q), :]
    ri = run_i[pl.ds(row0, block_q), :]
    first = (j == 0)
    rv = jnp.where(first, jnp.full((block_q, k), NEG, jnp.float32), rv)
    ri = jnp.where(first, jnp.full((block_q, k), -1, jnp.int32), ri)
    for s in range(n_sub):
        rv, ri = _fold_window_carried(
            s_full, s * w, w, j * n_tile + s * w, rv, ri
        )
    run_v[pl.ds(row0, block_q), :] = rv
    run_i[pl.ds(row0, block_q), :] = ri

    @pl.when(j == n_tiles - 1)
    def _():
        _finalize_iterate(rv, ri, vals_ref, idx_ref, k, row_scale)


def _kernel_exact2(*refs, k: int, n_tile: int, block_q: int,
                   has_mask: bool, subtiles: int = 2):
    if has_mask:
        q_ref, e_ref, mask_ref, vals_ref, idx_ref, run_v, run_i, s_full = refs
    else:
        q_ref, e_ref, vals_ref, idx_ref, run_v, run_i, s_full = refs
    scores = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_mask:
        scores = jnp.where(mask_ref[:][None, :], scores, NEG)
    _exact2_visit(scores, vals_ref, idx_ref, run_v, run_i, s_full,
                  k=k, n_tile=n_tile, block_q=block_q, subtiles=subtiles)


def _kernel_exact2_int8(*refs, k: int, n_tile: int, block_q: int,
                        has_mask: bool, subtiles: int = 2):
    if has_mask:
        (q_ref, qs_ref, e_ref, es_ref, mask_ref, vals_ref, idx_ref,
         run_v, run_i, s_full) = refs
    else:
        (q_ref, qs_ref, e_ref, es_ref, vals_ref, idx_ref, run_v, run_i,
         s_full) = refs
    acc = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Per-row qs deferred to the finalize (order-preserving: qs > 0),
    # saving a full [Bq, Nt] multiply pass per streamed tile.
    scores = acc.astype(jnp.float32) * es_ref[:, 0][None, :]
    if has_mask:
        scores = jnp.where(mask_ref[:][None, :], scores, NEG)
    _exact2_visit(scores, vals_ref, idx_ref, run_v, run_i, s_full,
                  k=k, n_tile=n_tile, block_q=block_q, subtiles=subtiles)


def _fold_window_scratch(s_ref, col0: int, w: int, off, rv, ri):
    """Static-window variant of :func:`_fold_tile_scratch`: the
    extraction loop mutates columns ``[col0, col0+w)`` of a WIDER
    scratch ref in place (``col0``/``w`` are Python ints, so every
    slice lowers as a static ref window).

    Used by the direct-store kernel, where the matmul writes the whole
    [Bq, block_n] score tile into scratch ONCE and the per-subtile fold
    reads/mutates it there — removing the per-subtile copy pass of the
    value-based fold (a full extra read+write of every score, ~2 of
    the ~4 mandatory VPU passes per tile).
    """
    bq = s_ref.shape[0]
    k = rv.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1)
    rm0 = jnp.max(s_ref[:, col0:col0 + w], axis=1)
    kth0 = jnp.min(rv, axis=1)

    def cond(c):
        it, rm, _, _, kth = c
        return jnp.logical_and(it < w, jnp.max(rm - kth) > 0.0)

    def body(c):
        it, rm, rv, ri, kth = c
        ss = s_ref[:, col0:col0 + w]
        arg = jnp.argmax(ss, axis=1).astype(jnp.int32)
        imp = rm > kth
        amin = jnp.argmin(rv, axis=1).astype(jnp.int32)
        hot = jnp.logical_and(kcol == amin[:, None], imp[:, None])
        rv = jnp.where(hot, rm[:, None], rv)
        ri = jnp.where(hot, (arg + off)[:, None], ri)
        ss = jnp.where(cols == arg[:, None], jnp.asarray(NEG, ss.dtype), ss)
        s_ref[:, col0:col0 + w] = ss
        rm = jnp.max(ss, axis=1)
        kth = jnp.min(rv, axis=1)
        return it + 1, rm, rv, ri, kth

    _, _, rv, ri, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rm0, rv, ri, kth0)
    )
    return rv, ri


def _direct_visit(scores, vals_ref, idx_ref, run_v, run_i, s_full, *,
                  k: int, n_tile: int, block_q: int, subtiles: int,
                  row_scale=None):
    """Direct-store visit: write the tile's scores into the full-width
    scratch once, then fold static subtile windows in place."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(0)
    row0 = pl.multiple_of(i * block_q, block_q)
    s_full[:, :] = scores
    n_sub = subtiles
    width = n_tile
    while width % n_sub:
        n_sub //= 2
    w = width // n_sub
    rv = run_v[pl.ds(row0, block_q), :]
    ri = run_i[pl.ds(row0, block_q), :]
    first = (j == 0)
    rv = jnp.where(first, jnp.full((block_q, k), NEG, jnp.float32), rv)
    ri = jnp.where(first, jnp.full((block_q, k), -1, jnp.int32), ri)
    for s in range(n_sub):
        rv, ri = _fold_window_scratch(
            s_full, s * w, w, j * n_tile + s * w, rv, ri
        )
    run_v[pl.ds(row0, block_q), :] = rv
    run_i[pl.ds(row0, block_q), :] = ri

    @pl.when(j == n_tiles - 1)
    def _():
        _finalize_iterate(rv, ri, vals_ref, idx_ref, k, row_scale)


def _kernel_direct(*refs, k: int, n_tile: int, block_q: int,
                   has_mask: bool, subtiles: int = 2):
    """Doc-major streaming fold with the matmul writing straight to
    scratch (no value-based copy pass). Grid = (n_tiles, b_blocks)."""
    if has_mask:
        q_ref, e_ref, mask_ref, vals_ref, idx_ref, run_v, run_i, s_full = refs
    else:
        q_ref, e_ref, vals_ref, idx_ref, run_v, run_i, s_full = refs
    scores = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_mask:
        scores = jnp.where(mask_ref[:][None, :], scores, NEG)
    _direct_visit(scores, vals_ref, idx_ref, run_v, run_i, s_full,
                  k=k, n_tile=n_tile, block_q=block_q, subtiles=subtiles)


def _kernel_direct_int8(*refs, k: int, n_tile: int, block_q: int,
                        has_mask: bool, subtiles: int = 2):
    if has_mask:
        (q_ref, qs_ref, e_ref, es_ref, mask_ref, vals_ref, idx_ref,
         run_v, run_i, s_full) = refs
    else:
        (q_ref, qs_ref, e_ref, es_ref, vals_ref, idx_ref, run_v, run_i,
         s_full) = refs
    acc = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Per-row qs deferred to the finalize (order-preserving: qs > 0),
    # saving a full [Bq, Nt] multiply pass per streamed tile.
    scores = acc.astype(jnp.float32) * es_ref[:, 0][None, :]
    if has_mask:
        scores = jnp.where(mask_ref[:][None, :], scores, NEG)
    _direct_visit(scores, vals_ref, idx_ref, run_v, run_i, s_full,
                  k=k, n_tile=n_tile, block_q=block_q, subtiles=subtiles)


def _finalize_iterate(run_v, run_i, vals_ref, idx_ref, k: int,
                      row_scale=None):
    """Sort the unsorted running buffer descending and emit outputs.

    ``row_scale`` [Bq] rescales the emitted VALUES only: the int8
    kernels fold UNSCALED-by-qs scores (a per-ROW positive factor never
    changes intra-row order, so folding it per tile was a full wasted
    VPU multiply pass over every streamed score) and recover the true
    values here on the tiny [Bq, k] buffer."""
    new_v, new_i = _select_topk(run_v, run_i, k)
    out_v = new_v if row_scale is None else new_v * row_scale[:, None]
    vals_ref[:] = jnp.where(new_v <= NEG, -jnp.inf, out_v)
    idx_ref[:] = jnp.where(new_v <= NEG, -1, new_i)


def _iterate_visit(scores, vals_ref, idx_ref, run_v, run_i, *,
                   k: int, n_tile: int, block_q: int, subtiles: int = 1,
                   row_groups: int = 1, s_scr=None, gated: bool = False,
                   row_scale=None):
    """Shared doc-major visit: fold this (doc tile, query block)'s scores
    into the full-batch running scratch and emit at the last doc tile.

    The block's rows are read and written through ``pl.ds`` dynamic
    ref slices at a block_q-aligned sublane offset.

    ``row_groups > 1`` additionally splits the block's ROWS into that
    many independently-triggered fold loops: one hot row no longer
    drags every row of the block through its extraction iterations —
    each iteration's passes run on a row_groups-times-smaller array."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(0)
    row0 = pl.multiple_of(i * block_q, block_q)

    # Sub-tile decoupling: folding S static column slices sequentially
    # keeps the total trigger work identical but runs each extraction
    # iteration on an S-times-smaller array, and a slice without
    # improvements skips its extraction entirely.
    n_sub = subtiles
    width = scores.shape[1]
    while width % n_sub:
        n_sub //= 2
    w = width // n_sub
    n_rg = max(row_groups, 1)
    # Each row group must be a whole number of 8-row sublanes; at tiny
    # block_q (dryrun shapes) that may only hold at n_rg == 1.
    while n_rg > 1 and (block_q % n_rg or (block_q // n_rg) % 8):
        n_rg //= 2
    rh = block_q // n_rg

    if n_rg == 1 and s_scr is not None and gated:
        # Gated fold: per subtile, ONE trigger pass (row max in the
        # scores' own dtype — bf16 when compare_dtype says so, halving
        # the pass) over the raw dot output; the f32 cast-copy into
        # scratch and the extraction loop run only under pl.when once a
        # row actually improves. In the steady state of a random-order
        # stream almost no subtile fires, so the per-tile cost drops
        # from copy+max (3 f32 pass-equivalents) to the single trigger
        # pass. Extraction stays f32: Mosaic's argmax lowering is
        # f32-only (_reduce_index_helper).
        @pl.when(j == 0)
        def _():
            run_v[pl.ds(row0, block_q), :] = jnp.full(
                (block_q, k), NEG, jnp.float32
            )
            run_i[pl.ds(row0, block_q), :] = jnp.full(
                (block_q, k), -1, jnp.int32
            )

        for s in range(n_sub):
            sub = scores[:, s * w:(s + 1) * w]
            rm0 = jnp.max(sub, axis=1).astype(jnp.float32)
            kth0 = jnp.min(run_v[pl.ds(row0, block_q), :], axis=1)
            fire = jnp.max(rm0 - kth0) > 0.0
            off = j * n_tile + s * w

            @pl.when(fire)
            def _(sub=sub, rm0=rm0, kth0=kth0, off=off):
                s_scr[:, :] = sub.astype(jnp.float32)
                rv = run_v[pl.ds(row0, block_q), :]
                ri = run_i[pl.ds(row0, block_q), :]
                rv, ri = _fold_tile_scratch(s_scr, off, rv, ri, rm0, kth0)
                run_v[pl.ds(row0, block_q), :] = rv
                run_i[pl.ds(row0, block_q), :] = ri

        @pl.when(j == n_tiles - 1)
        def _():
            _finalize_iterate(
                run_v[pl.ds(row0, block_q), :],
                run_i[pl.ds(row0, block_q), :],
                vals_ref, idx_ref, k, row_scale,
            )
        return

    rv = run_v[pl.ds(row0, block_q), :]
    ri = run_i[pl.ds(row0, block_q), :]
    first = (j == 0)
    rv = jnp.where(first, jnp.full((block_q, k), NEG, jnp.float32), rv)
    ri = jnp.where(first, jnp.full((block_q, k), -1, jnp.int32), ri)
    if n_rg == 1:
        for s in range(n_sub):
            if s_scr is not None and s_scr.dtype == scores.dtype:
                s_scr[:, :] = scores[:, s * w:(s + 1) * w]
                rv, ri = _fold_tile_scratch(
                    s_scr, j * n_tile + s * w, rv, ri
                )
            else:
                rv, ri = _fold_tile_iterate(
                    scores[:, s * w:(s + 1) * w], j * n_tile + s * w, rv, ri
                )
    else:
        rv_parts, ri_parts = [], []
        for g in range(n_rg):
            gv = rv[g * rh:(g + 1) * rh, :]
            gi = ri[g * rh:(g + 1) * rh, :]
            for s in range(n_sub):
                gv, gi = _fold_tile_iterate(
                    scores[g * rh:(g + 1) * rh, s * w:(s + 1) * w],
                    j * n_tile + s * w, gv, gi,
                )
            rv_parts.append(gv)
            ri_parts.append(gi)
        rv = jnp.concatenate(rv_parts, axis=0)
        ri = jnp.concatenate(ri_parts, axis=0)
    run_v[pl.ds(row0, block_q), :] = rv
    run_i[pl.ds(row0, block_q), :] = ri

    @pl.when(j == n_tiles - 1)
    def _():
        _finalize_iterate(rv, ri, vals_ref, idx_ref, k, row_scale)


def _kernel_iterate(*refs, k: int, n_tile: int, block_q: int,
                    has_mask: bool, subtiles: int = 1,
                    row_groups: int = 1, compare_dtype=jnp.float32,
                    gated: bool = False):
    """Doc-major streaming fold: grid = (n_tiles, b_blocks).

    The doc axis is the OUTER grid dimension and the running top-k
    scratch holds the FULL batch, so the embedding matrix streams
    through VMEM exactly once regardless of batch size (the query-major
    layout re-reads it B/block_q times — at B=2048 that is 16 extra
    HBM passes). The query tile cycles per doc tile; q is tiny.
    ``has_mask`` statically removes the mask operand and its
    whole-tile select pass — the common unfiltered case at scale.
    """
    if has_mask:
        q_ref, e_ref, mask_ref, vals_ref, idx_ref, run_v, run_i, s_scr = refs
    else:
        q_ref, e_ref, vals_ref, idx_ref, run_v, run_i, s_scr = refs

    # bf16 comparison mode: the dot emits bfloat16 scores, halving the
    # per-subtile TRIGGER pass (row max) and the mask select — the
    # passes that run on every tile. Extraction (argmax loop) stays
    # f32 on a cast copy: Mosaic's argmax lowering is f32-only.
    # Rounded-score top-k — ids may differ from the f32 path only among
    # scores within one bf16 ulp (documented exact-tie caveat).
    scores = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=compare_dtype,
    )
    if has_mask:
        scores = jnp.where(
            mask_ref[:][None, :], scores, jnp.asarray(NEG, compare_dtype)
        )
    _iterate_visit(scores, vals_ref, idx_ref, run_v, run_i,
                   k=k, n_tile=n_tile, block_q=block_q, subtiles=subtiles,
                   row_groups=row_groups, s_scr=s_scr, gated=gated)


def _kernel_iterate_int8(*refs, k: int, n_tile: int, block_q: int,
                         has_mask: bool, subtiles: int = 1,
                         row_groups: int = 1, gated: bool = False):
    if has_mask:
        (q_ref, qs_ref, e_ref, es_ref, mask_ref, vals_ref, idx_ref,
         run_v, run_i, s_scr) = refs
    else:
        (q_ref, qs_ref, e_ref, es_ref, vals_ref, idx_ref, run_v, run_i,
         s_scr) = refs

    acc = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Per-row qs deferred to the finalize (order-preserving: qs > 0),
    # saving a full [Bq, Nt] multiply pass per streamed tile.
    scores = acc.astype(jnp.float32) * es_ref[:, 0][None, :]
    if has_mask:
        scores = jnp.where(mask_ref[:][None, :], scores, NEG)
    _iterate_visit(scores, vals_ref, idx_ref, run_v, run_i,
                   k=k, n_tile=n_tile, block_q=block_q, subtiles=subtiles,
                   row_groups=row_groups, s_scr=s_scr, gated=gated,
                   row_scale=qs_ref[:, 0])


def _kernel_dbuf(q_ref, e_hbm, vals_ref, idx_ref, run_v, run_i,
                 ebuf0, ebuf1, s_scr, sem, *, k: int, block_n: int,
                 block_q: int, subtiles: int):
    """Manually double-buffered streaming fold (grid-free).

    The automatic grid pipeline's measured anatomy is ADDITIVE — the
    per-tile DMA time and the selection's VPU passes sum instead of
    hiding under each other (docs/BENCHMARKS.md round-3 ablation).
    This variant owns the pipeline: the embedding matrix stays in HBM
    (`memory_space=ANY`) and a static 2-slot unrolled loop issues the
    tile t+1 copy with `pltpu.make_async_copy` BEFORE folding tile t,
    so the fold's compute runs while the next tile streams. If the
    additivity is scheduling (hypothesis a of
    scripts/probe_dma_overlap.py) this reclaims min(stream, compute);
    if it is VMEM-port contention (hypothesis b) it changes nothing.

    Slot indexing, query-block offsets, and the odd-tile prologue are
    all static Python — no value-level dynamic slices (they do not
    lower on this Mosaic, CLAUDE.md).
    """
    n = e_hbm.shape[0]
    b = run_v.shape[0]
    n_tiles = n // block_n
    n_sub = subtiles
    while block_n % n_sub:
        n_sub //= 2
    w = block_n // n_sub

    run_v[:, :] = jnp.full((b, k), NEG, jnp.float32)
    run_i[:, :] = jnp.full((b, k), -1, jnp.int32)

    def dma(buf, slot, t):
        return pltpu.make_async_copy(
            e_hbm.at[pl.ds(t * block_n, block_n), :],
            buf,
            sem.at[slot],
        )

    def fold_tile(buf, t):
        """Fold one resident [block_n, D] tile for every query block."""
        e = buf[:, :]
        for qb in range(b // block_q):
            row0 = qb * block_q
            scores = jax.lax.dot_general(
                q_ref[row0:row0 + block_q, :],
                e,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rv = run_v[pl.ds(row0, block_q), :]
            ri = run_i[pl.ds(row0, block_q), :]
            for s in range(n_sub):
                s_scr[:, :] = scores[:, s * w:(s + 1) * w]
                rv, ri = _fold_tile_scratch(
                    s_scr, t * block_n + s * w, rv, ri
                )
            run_v[pl.ds(row0, block_q), :] = rv
            run_i[pl.ds(row0, block_q), :] = ri

    # Odd tile count: tile 0 runs through ebuf1 before the pair loop
    # (tile 1 already prefetching into ebuf0), so the steady-state loop
    # always finds its even tile in flight on ebuf0.
    if n_tiles % 2:
        dma(ebuf1, 1, 0).start()
        if n_tiles > 1:
            dma(ebuf0, 0, 1).start()
        dma(ebuf1, 1, 0).wait()
        fold_tile(ebuf1, 0)
        start = 1
    else:
        dma(ebuf0, 0, 0).start()
        start = 0
    n_pairs = (n_tiles - start) // 2

    def pair_body(p, _):
        t0 = start + 2 * p
        t1 = t0 + 1
        dma(ebuf1, 1, t1).start()
        dma(ebuf0, 0, t0).wait()
        fold_tile(ebuf0, t0)

        @pl.when(t0 + 2 < n_tiles)
        def _():
            dma(ebuf0, 0, t0 + 2).start()

        dma(ebuf1, 1, t1).wait()
        fold_tile(ebuf1, t1)
        return 0

    if n_pairs:
        jax.lax.fori_loop(0, n_pairs, pair_body, 0)

    for qb in range(b // block_q):
        row0 = qb * block_q
        new_v, new_i = _select_topk(
            run_v[pl.ds(row0, block_q), :],
            run_i[pl.ds(row0, block_q), :],
            k,
        )
        vals_ref[pl.ds(row0, block_q), :] = jnp.where(
            new_v <= NEG, -jnp.inf, new_v
        )
        idx_ref[pl.ds(row0, block_q), :] = jnp.where(
            new_v <= NEG, -1, new_i
        )


def _kernel(q_ref, e_ref, mask_ref, vals_ref, idx_ref, run_v, run_i, *,
            k: int, n_tile: int, m_fast: int):
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        run_v[:] = jnp.full_like(run_v, NEG)
        run_i[:] = jnp.full_like(run_i, -1)

    scores = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, Nt]
    scores = jnp.where(mask_ref[:][None, :], scores, NEG)

    # Only elements beating a query's current k-th best can enter the
    # running top-k. Count them per tile: zero -> skip; few (the common
    # steady state) -> cheap m_fast-step extraction; many (warm-up
    # tiles) -> full k-selection.
    bq = scores.shape[0]
    kth_best = run_v[:, k - 1]  # [Bq]
    improving = scores > kth_best[:, None]
    cnt = jnp.sum(improving.astype(jnp.int32), axis=1)  # [Bq]
    max_cnt = jnp.max(cnt)
    local_ids = jax.lax.broadcasted_iota(
        jnp.int32, (bq, n_tile), 1
    ) + j * n_tile

    @pl.when((max_cnt > 0) & (max_cnt <= m_fast))
    def _():
        cand = jnp.where(improving, scores, NEG)
        tile_v, tile_i = _select_topk(cand, local_ids, m_fast)
        merged_v = jnp.concatenate([run_v[:], tile_v], axis=1)
        merged_i = jnp.concatenate([run_i[:], tile_i], axis=1)
        new_v, new_i = _select_topk(merged_v, merged_i, k)
        run_v[:] = new_v
        run_i[:] = new_i

    @pl.when(max_cnt > m_fast)
    def _():
        tile_v, tile_i = _select_topk(scores, local_ids, k)
        merged_v = jnp.concatenate([run_v[:], tile_v], axis=1)
        merged_i = jnp.concatenate([run_i[:], tile_i], axis=1)
        new_v, new_i = _select_topk(merged_v, merged_i, k)
        run_v[:] = new_v
        run_i[:] = new_i

    @pl.when(j == n_tiles - 1)
    def _():
        out_v = run_v[:]
        vals_ref[:] = jnp.where(out_v <= NEG, -jnp.inf, out_v)
        idx_ref[:] = jnp.where(out_v <= NEG, -1, run_i[:])


def _kernel_int8(q_ref, qs_ref, e_ref, es_ref, mask_ref, vals_ref, idx_ref,
                 run_v, run_i, *, k: int, n_tile: int, m_fast: int):
    """Int8 variant: int8 x int8 -> int32 on the MXU, rescaled by the
    per-query and per-document quantization scales in the epilogue."""
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        run_v[:] = jnp.full_like(run_v, NEG)
        run_i[:] = jnp.full_like(run_i, -1)

    acc = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Bq, Nt] int32
    # Scale vectors travel as [_, 1] 2D blocks: 1D f32 blocks demand
    # 256-aligned slicing on TPU, which small block_q values break.
    scores = (
        acc.astype(jnp.float32)
        * qs_ref[:, 0][:, None]
        * es_ref[:, 0][None, :]
    )
    scores = jnp.where(mask_ref[:][None, :], scores, NEG)

    bq = scores.shape[0]
    kth_best = run_v[:, k - 1]
    improving = scores > kth_best[:, None]
    max_cnt = jnp.max(jnp.sum(improving.astype(jnp.int32), axis=1))
    local_ids = jax.lax.broadcasted_iota(
        jnp.int32, (bq, n_tile), 1
    ) + j * n_tile

    @pl.when((max_cnt > 0) & (max_cnt <= m_fast))
    def _():
        cand = jnp.where(improving, scores, NEG)
        tile_v, tile_i = _select_topk(cand, local_ids, m_fast)
        merged_v = jnp.concatenate([run_v[:], tile_v], axis=1)
        merged_i = jnp.concatenate([run_i[:], tile_i], axis=1)
        new_v, new_i = _select_topk(merged_v, merged_i, k)
        run_v[:] = new_v
        run_i[:] = new_i

    @pl.when(max_cnt > m_fast)
    def _():
        tile_v, tile_i = _select_topk(scores, local_ids, k)
        merged_v = jnp.concatenate([run_v[:], tile_v], axis=1)
        merged_i = jnp.concatenate([run_i[:], tile_i], axis=1)
        new_v, new_i = _select_topk(merged_v, merged_i, k)
        run_v[:] = new_v
        run_i[:] = new_i

    @pl.when(j == n_tiles - 1)
    def _():
        out_v = run_v[:]
        vals_ref[:] = jnp.where(out_v <= NEG, -jnp.inf, out_v)
        idx_ref[:] = jnp.where(out_v <= NEG, -1, run_i[:])


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_n", "m_fast", "vmem_limit_bytes",
                     "interpret", "algo", "subtiles", "gated"),
)
def fused_dense_top_k_int8(
    values: jax.Array,
    scales: jax.Array,
    q_values: jax.Array,
    q_scales: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
    block_q: int = 256,
    block_n: int = 8192,
    m_fast: int = 4,
    vmem_limit_bytes: int = 96 * 1024 * 1024,
    interpret: bool = False,
    algo: str = "iterate",
    subtiles: int = 2,
    gated: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming fused scoring+top-k over an int8-quantized index.

    values [N, D] int8 + scales [N] f32 (ops.quantized layout);
    q_values [B, D] int8 + q_scales [B] f32. Combines int8's 4x memory
    saving with O(1) HBM for scores — the XLA int8 path materializes
    [B, N] f32 scores, which is unaffordable at multi-million N with
    real batch sizes.

    Pass ``mask=None`` whenever no filtering is needed: the mask select
    is a full extra VPU pass per streamed tile, measured at +23 ms on
    the 39 ms maskless kernel at N=10.5M x 1024 (B=256) — deferring the
    select into the fold's scratch copy was measured NOT to help, the
    pass costs the same wherever it runs (scripts/bench_int8_mask.py).

    int8 keeps ``algo="iterate"`` as the default (round-5 documented
    rejection, scripts/probe_int8_pack_fusion.py same-session at
    N=10.5M x 1024 / B=256 / k=32): xpack measured 35.19/35.27 ms vs
    iterate 36.50 — exact ids but only ~3.6%, below the 15% flip bar
    and within shared-chip drift; packed measured 33.0 ms but selects
    on bf16(score*scale) keys (id agreement 0.49). The kernel is
    bandwidth-saturated (294-325 GB/s at the session stream rate), so
    fold-side VPU savings barely move it.
    """
    n, d = values.shape
    b = q_values.shape[0]
    # block_q=256 measured 39.4 ms vs 48.3 at 128 (N=10.5M x 1024,
    # B=256): one query block per doc tile folds each streamed tile
    # once. Halve until it divides the batch so any B keeps working.
    block_q = min(block_q, b)
    while b % block_q:
        block_q //= 2
    assert block_q >= 1
    if algo == "dbuf":
        # No int8 dbuf yet; a config autotuned on the f32/bf16 kernel
        # must not fall into the legacy count-gated branch below.
        algo = "iterate"
    if algo in ("packed", "xpack") and (mask is not None or n % _N_ALIGN):
        # Maskless-only (see the f32 launcher): the mask select does
        # not fuse with the pack chain.
        algo = "iterate"
    if algo in ("iterate", "direct", "packed", "exact2", "xpack"):
        # The mask pass can only be skipped when NO mask was requested
        # AND no doc-axis padding happens (padded rows score exactly 0.0
        # and would beat real negative scores).
        if mask is None and n % _N_ALIGN:
            mask = jnp.ones((n,), jnp.bool_)
        has_mask = mask is not None
        if has_mask:
            n, block_n, mask, values, scales = _align_doc_axis(
                n, block_n, mask, values, scales
            )
        else:
            n, block_n, _, values, scales = _align_doc_axis(
                n, block_n, jnp.ones((0,), jnp.bool_), values, scales
            )
        assert block_n <= 65536, "packed column field is 16-bit"
        grid = (n // block_n, b // block_q)
        if algo == "packed":
            kernel = functools.partial(
                _kernel_packed_int8, k=k, n_tile=block_n,
                block_q=block_q, has_mask=has_mask, subtiles=subtiles,
            )
        elif algo == "xpack":
            kernel = functools.partial(
                _kernel_xpack_int8, k=k, n_tile=block_n,
                block_q=block_q, has_mask=has_mask, subtiles=subtiles,
            )
        elif algo == "exact2":
            kernel = functools.partial(
                _kernel_exact2_int8, k=k, n_tile=block_n,
                block_q=block_q, has_mask=has_mask, subtiles=subtiles,
            )
        elif algo == "direct":
            kernel = functools.partial(
                _kernel_direct_int8, k=k, n_tile=block_n,
                block_q=block_q, has_mask=has_mask, subtiles=subtiles,
            )
        else:
            kernel = functools.partial(
                _kernel_iterate_int8, k=k, n_tile=block_n, block_q=block_q,
                has_mask=has_mask, subtiles=subtiles, gated=gated,
            )
        n_sub = subtiles
        while block_n % n_sub:
            n_sub //= 2
        in_specs = [
            pl.BlockSpec((block_q, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [q_values, q_scales[:, None], values, scales[:, None]]
        if has_mask:
            in_specs.append(
                pl.BlockSpec((block_n,), lambda j, i: (j,),
                             memory_space=pltpu.VMEM)
            )
            operands.append(mask)
        out_specs = [
            pl.BlockSpec((block_q, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        if algo in ("packed", "xpack"):
            scratch = [
                pltpu.VMEM((b, k), jnp.int32),  # packed/exact i32 keys
                pltpu.VMEM((b, k), jnp.int32),
                pltpu.VMEM((block_q, block_n), jnp.int32),
            ]
        else:
            scratch = [
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.int32),
                # Score scratch for the in-place extraction loop: the
                # direct/exact2 kernels store the full tile (no copy
                # pass), the value-fold copies one subtile at a time.
                pltpu.VMEM(
                    (block_q,
                     block_n if algo in ("direct", "exact2")
                     else block_n // n_sub),
                    jnp.float32,
                ),
            ]
    else:
        has_mask = True
        if mask is None:
            mask = jnp.ones((n,), jnp.bool_)
        n, block_n, mask, values, scales = _align_doc_axis(
            n, block_n, mask, values, scales
        )
        grid = (b // block_q, n // block_n)
        kernel = functools.partial(
            _kernel_int8, k=k, n_tile=block_n, m_fast=m_fast
        )
        in_specs = [
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
        ]
        operands = [q_values, q_scales[:, None], values, scales[:, None], mask]
        out_specs = [
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((block_q, k), jnp.float32),
            pltpu.VMEM((block_q, k), jnp.int32),
        ]
    vals_dtype = (jnp.int32 if algo in ("packed", "xpack")
                  else jnp.float32)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), vals_dtype),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=values.size + q_values.size
            + scales.size * 4 + q_scales.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    if algo == "packed":
        # qs was deferred out of the kernel (per-row factor, order-
        # preserving); recover the true values on the tiny [B, k] here.
        vals = jnp.where(
            vals <= _PACKED_NEG_SAT, -jnp.inf,
            unpack_packed_vals(vals) * q_scales[:, None],
        )
    elif algo == "xpack":
        vals = jnp.where(
            idx < 0, -jnp.inf,
            unpack_xpack_vals(vals) * q_scales[:, None],
        )
    return vals, idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_n", "m_fast", "vmem_limit_bytes",
                     "interpret", "algo", "subtiles", "row_groups",
                     "compare_dtype", "gated"),
)
def fused_dense_top_k(
    emb: jax.Array,
    queries: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
    block_q: int = 128,
    block_n: int = 8192,
    m_fast: int = 4,
    vmem_limit_bytes: int = 96 * 1024 * 1024,
    interpret: bool = False,
    algo: str = "xpack",
    subtiles: int = 2,
    row_groups: int = 1,
    compare_dtype: str = "float32",
    gated: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming fused scoring+top-k.

    Default fold is ``algo="xpack"`` (round 5): the exact
    order-preserving f32->i32 key fold — ids bit-match ``iterate``
    (fuzzed in tests/test_pallas_fused.py) at 10-16% lower TRUE device
    latency (2M bf16: 4.54 vs 5.08 ms at bn=8192, 5.21 vs 6.22 at
    bn=16384; 4M: 8.12 vs 9.62 — scripts/probe_int8_pack_fusion.py).
    Masked or non-1024-aligned calls auto-fall back to ``iterate``.

    emb: [N, D] (any N; misaligned doc axes are zero-padded to the
    1024-aligned layout Mosaic requires — a copy, so build large indices
    8192-aligned), queries: [B, D] (B divisible
    by block_q; pad externally), mask: [N] bool or None. Returns
    (values [B, k], indices [B, k]) matching ops.dense.dense_top_k up to
    tie order; masked-out/overhang slots report (-inf, -1).
    """
    n, d = emb.shape
    b = queries.shape[0]
    block_q = min(block_q, b)
    assert b % block_q == 0, f"B={b} must be divisible by block_q={block_q}"
    if algo == "dbuf" and (mask is not None or n % _N_ALIGN):
        # dbuf is the maskless aligned fast path: it has no mask operand
        # (the select is a full VPU pass per tile) and zero-padded rows
        # would score 0.0 past real negatives. Autotuned configs carry
        # algo per index signature, so a filtered call on a dbuf-tuned
        # engine must still work — route it to the general kernel.
        algo = "iterate"
    if algo in ("packed", "xpack") and (mask is not None or n % _N_ALIGN):
        # packed/xpack are ALSO maskless-only: the f32 mask select does
        # not fuse with the pack chain (measured 17.4 ms masked vs 3.4
        # maskless at N=2M — worse than the plain fold's 6.1). Filtered
        # or misaligned calls take the exact iterate path.
        algo = "iterate"
    if algo == "dbuf":
        n, block_n, _, emb = _align_doc_axis(
            n, block_n, jnp.ones((0,), jnp.bool_), emb
        )
        n_sub = subtiles
        while block_n % n_sub:
            n_sub //= 2
        kernel = functools.partial(
            _kernel_dbuf, k=k, block_n=block_n, block_q=block_q,
            subtiles=subtiles,
        )
        vals, idx = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, k), jnp.float32),
                jax.ShapeDtypeStruct((b, k), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.int32),
                pltpu.VMEM((block_n, d), emb.dtype),
                pltpu.VMEM((block_n, d), emb.dtype),
                pltpu.VMEM((block_q, block_n // n_sub), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d,
                bytes_accessed=emb.size * emb.dtype.itemsize
                + queries.size * queries.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(queries, emb)
        return vals, idx
    if algo in ("iterate", "direct", "packed", "exact2", "xpack"):
        # Skip the whole-tile mask select only when no mask was asked
        # for AND no padding happens (padded zero rows score 0.0, which
        # beats real negative scores).
        if mask is None and n % _N_ALIGN:
            mask = jnp.ones((n,), jnp.bool_)
        has_mask = mask is not None
        if has_mask:
            n, block_n, mask, emb = _align_doc_axis(n, block_n, mask, emb)
        else:
            n, block_n, _, emb = _align_doc_axis(
                n, block_n, jnp.ones((0,), jnp.bool_), emb
            )
        assert block_n <= 65536, "packed column field is 16-bit"
        grid = (n // block_n, b // block_q)
        if algo == "packed":
            kernel = functools.partial(
                _kernel_packed, k=k, n_tile=block_n, block_q=block_q,
                has_mask=has_mask, subtiles=subtiles,
            )
        elif algo == "xpack":
            kernel = functools.partial(
                _kernel_xpack, k=k, n_tile=block_n, block_q=block_q,
                has_mask=has_mask, subtiles=subtiles,
            )
        elif algo == "exact2":
            kernel = functools.partial(
                _kernel_exact2, k=k, n_tile=block_n, block_q=block_q,
                has_mask=has_mask, subtiles=subtiles,
            )
        elif algo == "direct":
            kernel = functools.partial(
                _kernel_direct, k=k, n_tile=block_n, block_q=block_q,
                has_mask=has_mask, subtiles=subtiles,
            )
        else:
            kernel = functools.partial(
                _kernel_iterate, k=k, n_tile=block_n, block_q=block_q,
                has_mask=has_mask, subtiles=subtiles,
                row_groups=row_groups,
                compare_dtype=jnp.dtype(compare_dtype), gated=gated,
            )
        in_specs = [
            pl.BlockSpec((block_q, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [queries, emb]
        if has_mask:
            in_specs.append(
                pl.BlockSpec((block_n,), lambda j, i: (j,),
                             memory_space=pltpu.VMEM)
            )
            operands.append(mask)
        out_specs = [
            pl.BlockSpec((block_q, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        n_sub = subtiles
        while block_n % n_sub:
            n_sub //= 2
        if algo in ("packed", "xpack"):
            scratch = [
                pltpu.VMEM((b, k), jnp.int32),  # packed/exact i32 keys
                pltpu.VMEM((b, k), jnp.int32),
                pltpu.VMEM((block_q, block_n), jnp.int32),
            ]
        else:
            scratch = [
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.int32),
                # Score scratch for the in-place extraction loop —
                # always f32 (Mosaic argmax is f32-only). The
                # direct/exact2 kernels store the full tile straight
                # from the matmul (no copy pass); the value-fold
                # copies one subtile at a time.
                pltpu.VMEM(
                    (block_q,
                     block_n if algo in ("direct", "exact2")
                     else block_n // n_sub),
                    jnp.float32,
                ),
            ]
    else:
        if mask is None:
            mask = jnp.ones((n,), jnp.bool_)
        n, block_n, mask, emb = _align_doc_axis(n, block_n, mask, emb)
        grid = (b // block_q, n // block_n)
        kernel = functools.partial(
            _kernel, k=k, n_tile=block_n, m_fast=m_fast
        )
        in_specs = [
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
        ]
        operands = [queries, emb, mask]
        out_specs = [
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((block_q, k), jnp.float32),
            pltpu.VMEM((block_q, k), jnp.int32),
        ]
    vals_dtype = (jnp.int32 if algo in ("packed", "xpack")
                  else jnp.float32)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), vals_dtype),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=emb.size * emb.dtype.itemsize
            + queries.size * queries.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    if algo == "packed":
        vals = jnp.where(
            vals <= _PACKED_NEG_SAT, -jnp.inf, unpack_packed_vals(vals)
        )
    elif algo == "xpack":
        vals = jnp.where(idx < 0, -jnp.inf, unpack_xpack_vals(vals))
    return vals, idx
