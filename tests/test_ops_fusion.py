"""Parity tests: array WRRF vs the golden dict implementation."""

import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.ops import wrrf_scores, wrrf_top_n
from a_nice_rag_tpu.testing import golden_wrrf


def test_wrrf_scores_match_golden():
    rng = np.random.default_rng(13)
    n_pad = 256
    k = 20
    # Two ranked lists of doc rows, some overlap.
    list_a = rng.permutation(200)[:k]
    list_b = rng.permutation(200)[:k]
    weights = {"dense": 5.0, "bm25": 1.0}
    golden = dict(
        golden_wrrf(
            [(list(list_a), "dense"), (list(list_b), "bm25")], weights, k=40
        )
    )
    idx = jnp.asarray(
        np.stack([list_a, list_b])[:, None, :].astype(np.int32)
    )  # [L=2, B=1, K]
    w = jnp.asarray([5.0, 1.0], dtype=jnp.float32)
    scores = np.asarray(wrrf_scores(idx, w, n_pad, k_rrf=40.0))[0]
    for doc in range(n_pad):
        expect = golden.get(doc, 0.0)
        np.testing.assert_allclose(scores[doc], expect, rtol=1e-6, atol=1e-7)


def test_wrrf_top_n_order_matches_golden():
    rng = np.random.default_rng(17)
    n_pad = 128
    k = 15
    list_a = rng.permutation(100)[:k]
    list_b = rng.permutation(100)[:k]
    fused = golden_wrrf(
        [(list(list_a), "m1"), (list(list_b), "m2")], {"m1": 2.0, "m2": 1.0}, k=60
    )
    idx = jnp.asarray(np.stack([list_a, list_b])[:, None, :].astype(np.int32))
    w = jnp.asarray([2.0, 1.0], dtype=jnp.float32)
    n = 10
    vals, ids = wrrf_top_n(idx, w, n, n_pad, k_rrf=60.0)
    vals, ids = np.asarray(vals)[0], np.asarray(ids)[0]
    expect_scores = np.array([s for _, s in fused[:n]])
    np.testing.assert_allclose(vals, expect_scores, rtol=1e-6)
    # Where scores are unique the doc ids must agree exactly.
    for i in range(n):
        same_score = np.isclose(expect_scores, expect_scores[i]).sum()
        if same_score == 1:
            assert ids[i] == fused[i][0]


def test_wrrf_padding_and_absent_docs():
    n_pad = 64
    idx = jnp.asarray(
        np.array([[[3, 5, -1, -1]], [[5, -1, -1, -1]]], dtype=np.int32)
    )  # L=2, B=1, K=4
    w = jnp.asarray([1.0, 1.0], dtype=jnp.float32)
    vals, ids = wrrf_top_n(idx, w, 4, n_pad, k_rrf=10.0)
    vals, ids = np.asarray(vals)[0], np.asarray(ids)[0]
    # doc 5: rank2 in list0 + rank1 in list1; doc 3: rank1 in list0.
    np.testing.assert_allclose(vals[0], 1 / 12 + 1 / 11, rtol=1e-6)
    assert ids[0] == 5
    np.testing.assert_allclose(vals[1], 1 / 11, rtol=1e-6)
    assert ids[1] == 3
    # Only two real docs; the rest must be -inf.
    assert np.isinf(vals[2]) and vals[2] < 0
