"""Dense (cosine) retrieval scoring.

Replaces the reference hot loop ``np.dot(q, E.T)`` + argpartition top-k
(``src/search_engine.py:80-92`` / ``:128-138``). Embeddings are
unit-normalized at index build time (the reference relies on Voyage
returning unit-norm vectors), so the dot product IS the cosine similarity.

The scoring matmul is the MXU target: [B, D] x [D, N] with a float32
accumulator. Embeddings may be stored bfloat16 to halve HBM traffic; the
accumulation dtype is controlled separately for ranking-parity use cases.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from a_nice_rag_tpu.ops.topk import hierarchical_top_k, masked_top_k

# Above this document count, avoid a full sort and use the two-stage top-k.
_HIERARCHICAL_THRESHOLD = 16384


def dense_scores(
    emb: jax.Array,
    queries: jax.Array,
    score_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Similarity scores [B, N] = queries [B, D] @ emb [N, D]^T."""
    return jax.lax.dot_general(
        queries,
        emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=score_dtype,
    )


@partial(jax.jit, static_argnames=("k", "score_dtype"))
def dense_top_k(
    emb: jax.Array,
    queries: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
    score_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Fused dense scoring + masked top-k (XLA path).

    emb: [N, D] (unit-norm), queries: [B, D], mask: optional [N] bool
    (True = candidate; padding rows and filename-type filtering are
    expressed through this mask). Returns (values [B, k], indices [B, k]).
    """
    scores = dense_scores(emb, queries, score_dtype)
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, -jnp.inf)
    n = scores.shape[-1]
    if n > _HIERARCHICAL_THRESHOLD and n % 1024 == 0:
        return hierarchical_top_k(scores, k)
    return masked_top_k(scores, k)


# Streaming Pallas kernel pays off once the [B, N] score matrix stops
# fitting comfortably in HBM traffic budgets.
_PALLAS_THRESHOLD = 1 << 18


def dense_top_k_auto(
    emb: jax.Array,
    queries: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
    backend: str = "auto",
    block_q: int = 128,
    block_n: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Backend-routing wrapper: the streaming Pallas kernel
    (ops.pallas.fused_dense_top_k) on TPU for large corpora when shapes
    tile cleanly, the XLA path otherwise."""
    n = emb.shape[0]
    b = queries.shape[0]
    use_pallas = backend == "pallas" or (
        backend == "auto"
        and jax.default_backend() == "tpu"
        and n >= _PALLAS_THRESHOLD
        and n % block_n == 0
        and b % block_q == 0
        and k <= 128
    )
    if use_pallas:
        from a_nice_rag_tpu.ops.pallas import fused_dense_top_k

        return fused_dense_top_k(
            emb, queries, k, mask=mask, block_q=block_q, block_n=block_n
        )
    return dense_top_k(emb, queries, k, mask=mask)
