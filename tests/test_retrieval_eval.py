"""Eval harness parity: device rank-of-gold vs naive golden evaluation."""

import os

import numpy as np
import pytest

from a_nice_rag_tpu.evals import (
    EvalConfig,
    RetrievalEvaluator,
    STANDARD_CONFIGURATIONS,
    calculate_metrics,
)
from a_nice_rag_tpu.evals.retrieval_eval import seed42_split
from a_nice_rag_tpu.index import build_index
from a_nice_rag_tpu.retrieval import SearchEngine
from a_nice_rag_tpu.retrieval.rerank import IdentityReranker
from a_nice_rag_tpu.testing import (
    GoldenBm25Okapi,
    golden_dense_top_k,
    golden_wrrf,
    synth_corpus,
)

MODELS = ["voyage-3-large", "text-embedding-3-large"]


@pytest.fixture(scope="module")
def setup():
    c = synth_corpus(n_docs=300, dim=32, n_queries=40, seed=71, models=MODELS)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    ev = RetrievalEvaluator(idx, SearchEngine(idx, reranker=IdentityReranker()))
    return c, idx, ev


def _golden_ranks_dense(c, model, k_cap):
    ranks = []
    emb = c.embeddings[model]
    for i, q in enumerate(c.query_embeddings[model]):
        _, order = golden_dense_top_k(emb, q, len(c.ids))
        ids = [c.ids[j] for j in order][:k_cap]
        ranks.append(ids.index(c.gold_ids[i]) + 1 if c.gold_ids[i] in ids else -1)
    return np.array(ranks)


def test_dense_only_matches_golden(setup):
    c, idx, ev = setup
    cfg = EvalConfig("dense", {m: (1.0 if m == "voyage-3-large" else 0.0)
                               for m in MODELS} | {"BM25": 0.0}, False,
                     similarity_k=300, common_sections_n=300)
    m = ev.evaluate_config(
        cfg, {"voyage-3-large": c.query_embeddings["voyage-3-large"]},
        c.gold_ids, filename_type_filter=None,
    )
    expect = calculate_metrics(_golden_ranks_dense(c, "voyage-3-large", 300))
    assert m["mrr"] == pytest.approx(expect["mrr"], abs=1e-3)
    assert m["recall@10"] == pytest.approx(expect["recall@10"], abs=1e-9)
    assert m["found"] == expect["found"]


def test_bm25_only_matches_golden(setup):
    c, idx, ev = setup
    cfg = EvalConfig("bm25", _zero() | {"BM25": 1.0}, True,
                     similarity_k=300, common_sections_n=300)
    m = ev.evaluate_config(
        cfg, {"voyage-3-large": c.query_embeddings["voyage-3-large"]},
        c.gold_ids, query_token_lists=c.query_tokens,
        filename_type_filter=None,
    )
    golden = GoldenBm25Okapi(c.tokens)
    ranks = []
    for i, toks in enumerate(c.query_tokens):
        scores = golden.get_scores(toks[:32])
        gold_row = c.ids.index(c.gold_ids[i])
        rank = 1 + int((scores > scores[gold_row]).sum())
        ranks.append(rank)
    expect = calculate_metrics(np.array(ranks))
    assert m["mrr"] == pytest.approx(expect["mrr"], abs=5e-3)
    assert m["recall@10"] == pytest.approx(expect["recall@10"], abs=0.05)


def test_hybrid_fusion_matches_golden(setup):
    c, idx, ev = setup
    weights = _zero() | {"voyage-3-large": 5.0, "BM25": 1.0}
    cfg = EvalConfig("hybrid", weights, True, similarity_k=50,
                     common_sections_n=50)
    m = ev.evaluate_config(
        cfg, {"voyage-3-large": c.query_embeddings["voyage-3-large"]},
        c.gold_ids, query_token_lists=c.query_tokens,
        filename_type_filter=None, wrrf_k=40.0,
    )
    golden = GoldenBm25Okapi(c.tokens)
    emb = c.embeddings["voyage-3-large"]
    ranks = []
    for i in range(len(c.gold_ids)):
        _, d_order = golden_dense_top_k(emb, c.query_embeddings["voyage-3-large"][i], 50)
        d_ids = [c.ids[j] for j in d_order]
        scores = golden.get_scores(c.query_tokens[i][:32])
        b_order = np.argsort(scores)[::-1][:50]
        b_ids = [c.ids[j] for j in b_order]
        fused = golden_wrrf([(d_ids, "voyage-3-large"), (b_ids, "BM25")],
                            weights, k=40)
        ids = [sid for sid, _ in fused][:50]
        ranks.append(ids.index(c.gold_ids[i]) + 1 if c.gold_ids[i] in ids else -1)
    expect = calculate_metrics(np.array(ranks))
    # Tie ordering inside fused lists can shift ranks by a position or
    # two; aggregate metrics must agree closely.
    assert m["mrr"] == pytest.approx(expect["mrr"], abs=0.02)
    assert m["recall@10"] == pytest.approx(expect["recall@10"], abs=0.05)
    assert m["success_rate"] == pytest.approx(expect["success_rate"], abs=0.03)


def test_reranker_config_path(setup):
    c, idx, ev = setup
    weights = _zero() | {"voyage-3-large": 5.0, "BM25": 1.0}
    cfg = EvalConfig("rerank", weights, True, similarity_k=25,
                     common_sections_n=15, use_reranker=True,
                     reranker_top_k=10)
    m = ev.evaluate_config(
        cfg, {"voyage-3-large": c.query_embeddings["voyage-3-large"]},
        c.gold_ids, query_token_lists=c.query_tokens,
        query_texts=[f"q{i}" for i in range(len(c.gold_ids))],
        filename_type_filter=None,
    )
    assert m["total"] == len(c.gold_ids)
    assert m["recall@10"] > 0.5  # identity rerank keeps fused order


def test_run_writes_and_resumes_csv(setup, tmp_path):
    c, idx, ev = setup
    out = os.path.join(tmp_path, "results.csv")
    cfgs = [
        EvalConfig("A", _zero() | {"voyage-3-large": 1.0}, False, 300, 300),
        EvalConfig("B", _zero() | {"BM25": 1.0}, True, 300, 300),
    ]
    kw = dict(
        query_embeddings={"voyage-3-large": c.query_embeddings["voyage-3-large"]},
        gold_ids=c.gold_ids,
        query_token_lists=c.query_tokens,
        filename_type_filter=None,
        output_csv=out,
    )
    r1 = ev.run(cfgs, **kw)
    assert set(r1) == {"A", "B"}
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 3 and lines[0].startswith("Model,MRR")
    # Resume: nothing re-evaluated.
    r2 = ev.run(cfgs, **kw)
    assert r2 == {}
    assert len(open(out).read().strip().splitlines()) == 3


def test_standard_configurations_shape():
    assert len(STANDARD_CONFIGURATIONS) == 9
    names = [c.name for c in STANDARD_CONFIGURATIONS]
    assert "Voyage-3-Large + BM25 (Reranker 2)" in names
    hybrid = next(c for c in STANDARD_CONFIGURATIONS
                  if c.name == "Voyage-3-Large + BM25")
    assert hybrid.model_weights["voyage-3-large"] == 5.0
    assert hybrid.model_weights["BM25"] == 1.0


def test_seed42_split_deterministic():
    a_train, a_val = seed42_split(100)
    b_train, b_val = seed42_split(100)
    np.testing.assert_array_equal(a_train, b_train)
    assert len(a_val) == 15 and len(a_train) == 85
    assert set(a_train) | set(a_val) == set(range(100))


def _zero():
    return {m: 0.0 for m in MODELS} | {"voyage-3.5": 0.0, "Qwen3": 0.0, "BM25": 0.0}
