"""On-device spherical k-means for IVF coarse quantization.

The reference has no ANN structure at all — its dense search is a full
``np.dot`` over the corpus (src/search_engine.py:128-138). The TPU
rebuild adds an IVF (inverted-file) layer on top of the exact streaming
kernels: cluster the corpus once at build time, then probe only the
top-``p`` clusters per query. This module is the build-time half.

TPU-first design: Lloyd iterations are expressed entirely as matmuls —
assignment is ``argmax(X @ C^T)`` (cosine == dot on unit-norm rows) and
the centroid update is ``onehot(A)^T @ X``, both MXU-shaped — streamed
over row chunks inside one jit per iteration. No scatter (serializes on
TPU), no host round-trips inside an iteration, static shapes
throughout.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _compute_dtype(x):
    """Matmul dtype for a chunk: floats pass through; int8 corpora
    (ops.quantized layout) compute in bf16 — casting PER CHUNK keeps
    the 4x-compressed matrix as the only full-size resident array."""
    return x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.bfloat16


@functools.partial(jax.jit, static_argnames=("chunk",))
def _lloyd_iter(x, cent, n_valid, chunk: int):
    """One Lloyd iteration. x [Np, D] (rows >= n_valid are padding),
    cent [C, D] f32 unit-norm. Returns (new_cent [C, D], counts [C])."""
    npad, d = x.shape
    c = cent.shape[0]
    cdt = _compute_dtype(x)
    cent_t = cent.astype(cdt).T  # [D, C]

    def body(i, carry):
        sums, counts = carry
        xc = jax.lax.dynamic_slice(x, (i * chunk, 0), (chunk, d))
        xc = xc.astype(cdt)
        scores = jnp.dot(
            xc, cent_t, preferred_element_type=jnp.float32
        )  # [chunk, C]
        a = jnp.argmax(scores, axis=1)  # [chunk]
        row = i * chunk + jnp.arange(chunk)
        valid = row < n_valid
        onehot = (
            (a[:, None] == jnp.arange(c)[None, :]) & valid[:, None]
        ).astype(cdt)  # [chunk, C]
        sums = sums + jnp.dot(
            onehot.T, xc, preferred_element_type=jnp.float32
        )
        counts = counts + jnp.sum(onehot, axis=0, dtype=jnp.float32)
        return sums, counts

    sums = jnp.zeros((c, d), jnp.float32)
    counts = jnp.zeros((c,), jnp.float32)
    sums, counts = jax.lax.fori_loop(0, npad // chunk, body, (sums, counts))
    # Empty clusters keep their previous centroid (deterministic; they
    # simply attract no probes).
    norm = jnp.sqrt(jnp.sum(sums * sums, axis=1, keepdims=True))
    new = jnp.where(
        (counts[:, None] > 0) & (norm > 0), sums / jnp.maximum(norm, 1e-12),
        cent,
    )
    return new, counts


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign(x, cent, chunk: int):
    """Final hard assignment. Returns [Np] int32 cluster ids."""
    npad, d = x.shape
    cdt = _compute_dtype(x)
    cent_t = cent.astype(cdt).T

    def body(i, out):
        xc = jax.lax.dynamic_slice(x, (i * chunk, 0), (chunk, d))
        xc = xc.astype(cdt)
        scores = jnp.dot(xc, cent_t, preferred_element_type=jnp.float32)
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice(out, a, (i * chunk,))

    out = jnp.zeros((npad,), jnp.int32)
    return jax.lax.fori_loop(0, npad // chunk, body, out)


def spherical_kmeans(
    x: jax.Array,
    n_clusters: int,
    n_iters: int = 10,
    seed: int = 0,
    chunk: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Cluster unit-norm rows by cosine. Returns
    (centroids [C, D] f32 unit-norm, assignments [N] int32).

    ``x`` may be any float dtype; rows need not be exactly unit-norm
    (argmax of dot is what IVF probing uses either way). Rows are padded
    to a chunk multiple internally; padding never contributes.
    """
    n, d = x.shape
    c = int(n_clusters)
    assert c >= 1 and n >= c, (n, c)
    chunk = min(chunk, -(-n // 256) * 256)  # small inputs: one chunk
    npad = -(-n // chunk) * chunk
    if npad != n:
        x = jnp.pad(x, ((0, npad - n), (0, 0)))

    # Init: a random row subset (k-means++ costs C sequential passes —
    # with 10 Lloyd iterations behind it, random init measures the same
    # on planted-cluster synthetics).
    rows = jax.random.choice(
        jax.random.PRNGKey(seed), n, shape=(c,), replace=False
    )
    cent = jnp.take(x, rows, axis=0).astype(jnp.float32)
    cent = cent / jnp.maximum(
        jnp.sqrt(jnp.sum(cent * cent, axis=1, keepdims=True)), 1e-12
    )

    n_valid = jnp.int32(n)
    for _ in range(n_iters):
        cent, _ = _lloyd_iter(x, cent, n_valid, chunk)
    assign = _assign(x, cent, chunk)[:n]
    return cent, assign
