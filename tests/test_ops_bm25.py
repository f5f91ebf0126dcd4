"""Parity tests: BM25 eager-impact kernel vs golden Okapi (rank_bm25 math)."""

import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.index import build_bm25_arrays
from a_nice_rag_tpu.ops import bm25_scores, bm25_top_k
from a_nice_rag_tpu.ops.bm25 import postings_required
from a_nice_rag_tpu.testing import GoldenBm25Okapi, synth_corpus


def _setup(n_docs=400, seed=5, k1=1.7, b=0.83, epsilon=0.05):
    c = synth_corpus(n_docs=n_docs, dim=16, n_queries=24, seed=seed)
    n_pad = ((n_docs + 127) // 128) * 128
    arrays, vocab, stats = build_bm25_arrays(
        c.tokens, n_pad, k1=k1, b=b, epsilon=epsilon
    )
    golden = GoldenBm25Okapi(c.tokens, k1=k1, b=b, epsilon=epsilon)
    return c, arrays, vocab, stats, golden, n_pad


def _term_ids(vocab, tokens, t_max=16):
    ids = np.full(t_max, -1, dtype=np.int32)
    for i, t in enumerate(tokens[:t_max]):
        ids[i] = vocab.get(t, -1)
    return ids


def test_bm25_scores_match_golden():
    c, arrays, vocab, stats, golden, n_pad = _setup()
    q = np.stack([_term_ids(vocab, toks) for toks in c.query_tokens])
    scores = np.asarray(bm25_scores(arrays, jnp.asarray(q), budget=8192))
    assert scores.shape == (len(c.query_tokens), n_pad)
    for i, toks in enumerate(c.query_tokens):
        expect = golden.get_scores(toks[:16])
        np.testing.assert_allclose(
            scores[i, : len(expect)], expect, rtol=2e-5, atol=1e-5
        )
        # Padding rows must stay zero.
        assert (scores[i, len(expect):] == 0).all()


def test_bm25_duplicate_query_terms_count_per_occurrence():
    c, arrays, vocab, stats, golden, n_pad = _setup(n_docs=150, seed=7)
    toks = c.query_tokens[0][:3]
    doubled = toks + toks
    q = np.stack([_term_ids(vocab, toks), _term_ids(vocab, doubled)])
    scores = np.asarray(bm25_scores(arrays, jnp.asarray(q), budget=4096))
    np.testing.assert_allclose(
        scores[1], 2 * scores[0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        scores[1, :150], golden.get_scores(doubled), rtol=2e-5, atol=1e-5
    )


def test_bm25_oov_and_empty_query():
    _, arrays, vocab, _, _, n_pad = _setup(n_docs=100, seed=9)
    empty = np.full((1, 8), -1, dtype=np.int32)
    scores = np.asarray(bm25_scores(arrays, jnp.asarray(empty), budget=1024))
    assert (scores == 0).all()


def test_bm25_top_k_and_budget():
    c, arrays, vocab, stats, golden, n_pad = _setup(n_docs=300, seed=11)
    q = np.stack([_term_ids(vocab, toks) for toks in c.query_tokens[:4]])
    need = np.asarray(postings_required(arrays, jnp.asarray(q)))
    assert (need <= 8192).all()
    vals, idx = bm25_top_k(arrays, jnp.asarray(q), k=10, budget=8192)
    vals, idx = np.asarray(vals), np.asarray(idx)
    for i in range(4):
        expect = golden.get_scores(c.query_tokens[i][:16])
        order = np.argsort(expect)[::-1][:10]
        np.testing.assert_allclose(vals[i], expect[order], rtol=2e-5, atol=1e-5)


def test_bm25_empty_docs_excluded_from_stats():
    tokens = [["a", "b"], [], ["b", "c", "c"], ["a"]]
    arrays, vocab, stats = build_bm25_arrays(tokens, 128)
    golden = GoldenBm25Okapi([t for t in tokens if t])
    q = np.array([[vocab["b"], -1]], dtype=np.int32)
    scores = np.asarray(bm25_scores(arrays, jnp.asarray(q), budget=64))[0]
    expect = golden.get_scores(["b"])  # over non-empty docs 0, 2, 3
    np.testing.assert_allclose(scores[0], expect[0], rtol=1e-5)
    assert scores[1] == 0.0
    np.testing.assert_allclose(scores[2], expect[1], rtol=1e-5)
    np.testing.assert_allclose(scores[3], expect[2], rtol=1e-5)
    assert stats["corpus_size"] == 3
