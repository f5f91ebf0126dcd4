"""Weighted reciprocal-rank fusion (WRRF) on rank arrays.

Replaces the dict-accumulation loop of the reference
(``src/search_engine.py:21-34``): for each ranked list m with weight w_m,

    fused[doc] += w_m * 1 / (k + rank)      (rank 1-based)

expressed as a scatter-add over the padded document axis so fusion runs
inside the same jit as the per-model top-k kernels. Documents in no list
keep score -inf so they can never enter the fused top-n (the reference
only ranks union members).

Tie-breaking note: the reference sorts a Python dict (stable by first-touch
order); the array version breaks ties by document index. RRF score ties
across different documents are rare and do not affect Recall@k/MRR parity
on realistic data.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from a_nice_rag_tpu.ops.topk import masked_top_k


@partial(jax.jit, static_argnames=("n_docs_padded",))
def wrrf_scores(
    indices: jax.Array,
    weights: jax.Array,
    n_docs_padded: int,
    k_rrf: float = 40.0,
) -> jax.Array:
    """Fused WRRF scores.

    indices: [L, B, K] global document ids per ranked list (descending
             rank order), -1 = padding (shorter lists).
    weights: [L] per-list fusion weights.
    Returns [B, N_pad] fused scores; documents absent from every list
    get 0 (mask them out with ``wrrf_top_n``).
    """
    l, b, k = indices.shape
    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)  # [K]
    contrib = weights[:, None] / (k_rrf + ranks)[None, :]  # [L, K]
    contrib = jnp.broadcast_to(contrib[:, None, :], (l, b, k))
    valid = indices >= 0
    ids = jnp.where(valid, indices, n_docs_padded)  # dump row for padding
    contrib = jnp.where(valid, contrib, 0.0)

    def per_query(ids_q: jax.Array, c_q: jax.Array) -> jax.Array:
        s = jnp.zeros(n_docs_padded + 1, dtype=jnp.float32)
        s = s.at[ids_q.reshape(-1)].add(c_q.reshape(-1))
        return s[:n_docs_padded]

    # [L, B, K] -> [B, L, K] so we vmap over queries.
    return jax.vmap(per_query)(
        jnp.swapaxes(ids, 0, 1), jnp.swapaxes(contrib, 0, 1)
    )


@partial(jax.jit, static_argnames=("n", "n_docs_padded"))
def wrrf_top_n(
    indices: jax.Array,
    weights: jax.Array,
    n: int,
    n_docs_padded: int,
    k_rrf: float = 40.0,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """WRRF fusion + top-n. Returns (scores [B, n], doc ids [B, n]).

    Entries with fused score 0 (document in no list) are masked to -inf;
    callers should treat returned ids with value == -inf as absent.
    """
    scores = wrrf_scores(indices, weights, n_docs_padded, k_rrf)
    live = scores > 0.0
    if mask is not None:
        live = live & mask[None, :]
    scores = jnp.where(live, scores, -jnp.inf)
    return masked_top_k(scores, n)
