"""Int8 quantized scoring: fidelity vs f32 path."""

import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.ops.dense import dense_top_k
from a_nice_rag_tpu.ops.quantized import (
    quantize_embeddings,
    quantized_dense_top_k,
)
from a_nice_rag_tpu.testing import synth_corpus


def test_quantized_scores_close_and_recall_preserved():
    c = synth_corpus(n_docs=600, dim=128, n_queries=32, seed=161)
    emb = c.embeddings["voyage-3-large"]
    q = c.query_embeddings["voyage-3-large"]
    qd = quantize_embeddings(jnp.asarray(emb))
    assert qd.values.dtype == jnp.int8
    v8, i8 = quantized_dense_top_k(qd, jnp.asarray(q), 10)
    v32, i32 = dense_top_k(jnp.asarray(emb), jnp.asarray(q), 10)
    v8, i8 = np.asarray(v8), np.asarray(i8)
    v32, i32 = np.asarray(v32), np.asarray(i32)
    # Scores within quantization error.
    np.testing.assert_allclose(v8, v32, atol=0.02)
    # Top-1 (the planted gold) must agree for every query; the rest of
    # the list may permute among near-ties.
    np.testing.assert_array_equal(i8[:, 0], i32[:, 0])
    overlap = np.mean(
        [len(set(i8[b]) & set(i32[b])) / 10 for b in range(len(q))]
    )
    assert overlap >= 0.9, overlap


def test_quantized_memory_is_quarter():
    c = synth_corpus(n_docs=128, dim=64, n_queries=2, seed=163)
    emb = jnp.asarray(c.embeddings["voyage-3-large"])
    qd = quantize_embeddings(emb)
    assert qd.values.size * qd.values.dtype.itemsize == emb.size * 1
    assert emb.size * emb.dtype.itemsize == 4 * qd.values.size
