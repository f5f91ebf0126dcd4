"""Sort-based sparse BM25 top-k vs the dense-score reference path."""

import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.index import build_index
from a_nice_rag_tpu.ops.bm25 import bm25_scores, bm25_top_k_sparse
from a_nice_rag_tpu.testing import synth_corpus


def _setup(n_docs=400, seed=131):
    c = synth_corpus(n_docs=n_docs, dim=8, n_queries=16, seed=seed)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    terms = jnp.asarray(idx.pad_term_ids(c.query_tokens, 16))
    return c, idx, terms


def test_sparse_topk_matches_dense_scores():
    c, idx, terms = _setup()
    k = 10
    ref_scores = np.asarray(bm25_scores(idx.bm25, terms, budget=8192))
    vals, ids = bm25_top_k_sparse(idx.bm25, terms, k, budget=8192)
    vals, ids = np.asarray(vals), np.asarray(ids)
    for b in range(terms.shape[0]):
        expect = np.sort(ref_scores[b])[::-1][:k]
        # Positive-score prefix must match exactly.
        pos = expect > 0
        np.testing.assert_allclose(vals[b][pos], expect[pos], rtol=1e-5,
                                   atol=1e-6)
        for j in np.where(pos)[0]:
            got = ids[b, j]
            np.testing.assert_allclose(
                ref_scores[b, got], vals[b, j], rtol=1e-5, atol=1e-6
            )


def test_sparse_topk_with_mask():
    c, idx, terms = _setup(n_docs=200, seed=133)
    mask = idx.filter_mask("NG")
    vals, ids = bm25_top_k_sparse(idx.bm25, terms, 5, mask=mask, budget=4096)
    ids = np.asarray(ids)
    vals = np.asarray(vals)
    for b in range(ids.shape[0]):
        for j in range(5):
            if ids[b, j] >= 0:
                assert c.sources[ids[b, j]].upper().startswith("NG")
            else:
                assert not np.isfinite(vals[b, j])


def test_sparse_topk_empty_query():
    _, idx, _ = _setup(n_docs=150, seed=137)
    empty = jnp.full((2, 8), -1, jnp.int32)
    vals, ids = bm25_top_k_sparse(idx.bm25, empty, 5, budget=1024)
    assert (np.asarray(ids) == -1).all()
    assert (~np.isfinite(np.asarray(vals))).all()
