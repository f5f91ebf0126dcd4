"""RAG orchestration over a mesh-sharded corpus: RAGSystem +
ShardedSearchEngine (parallel/engine.py) must reproduce the single-chip
SearchEngine's retrieval sets and keep the streaming contract."""

import numpy as np
import pytest

from a_nice_rag_tpu.config import InfoSource
from a_nice_rag_tpu.index import build_index
from a_nice_rag_tpu.parallel import (
    ShardedSearchEngine,
    make_mesh,
    shard_index,
    shard_ivf,
)
from a_nice_rag_tpu.rag import FakeLLMClient, RAGSystem
from a_nice_rag_tpu.retrieval.embed import PrecomputedEmbedder
from a_nice_rag_tpu.retrieval.engine import SearchEngine
from a_nice_rag_tpu.retrieval.rerank import IdentityReranker
from a_nice_rag_tpu.testing import synth_corpus

W = {"voyage-3-large": 5.0, "BM25": 1.0}


@pytest.fixture(scope="module")
def setup():
    c = synth_corpus(n_docs=600, dim=48, n_queries=8, seed=77)
    idx = build_index(ids=c.ids, sources=c.sources, contents=c.contents,
                      urls=c.urls, embeddings=c.embeddings,
                      token_lists=c.tokens)
    mesh = make_mesh(shape=(2, 4), axis_names=("dp", "corpus"))
    sidx = shard_index(idx, mesh)
    return c, idx, mesh, sidx


def test_retrieve_contract_matches_single_chip(setup):
    c, idx, mesh, sidx = setup
    se = SearchEngine(idx)
    sse = ShardedSearchEngine(sidx)
    kw = dict(
        query_embeddings={"voyage-3-large":
                          c.query_embeddings["voyage-3-large"]},
        query_token_lists=c.query_tokens,
        similarity_k=12, common_sections_n=10, wrrf_k=40.0,
        model_weights=W, filename_type_filter=None,
        use_hybrid_search=True,
    )
    a = se.retrieve(**kw)
    s = sse.retrieve(**kw)
    for qa, qs in zip(a, s):
        assert set(qa) == set(qs)
    # Filtered retrieval respects the filter on the sharded path too.
    sf = sse.retrieve(**{**kw, "filename_type_filter": "NG"})
    row_of = idx.meta.id_to_row
    for q_docs in sf:
        for did in q_docs:
            assert idx.meta.sources[row_of[did]].upper().startswith("NG")
    # Odd batch sizes are padded to the dp axis and truncated back.
    odd = sse.retrieve(**{
        **kw,
        "query_embeddings": {"voyage-3-large":
                             c.query_embeddings["voyage-3-large"][:3]},
        "query_token_lists": c.query_tokens[:3],
    })
    assert len(odd) == 3
    for qa, qs in zip(a[:3], odd):
        assert set(qa) == set(qs)


def test_rag_stream_over_sharded_mesh(setup):
    c, idx, mesh, sidx = setup
    queries = [f"question {i}" for i in range(8)]
    table = {q: c.query_embeddings["voyage-3-large"][i]
             for i, q in enumerate(queries)}
    embedder = PrecomputedEmbedder(table)
    sse = ShardedSearchEngine(sidx, embedder=embedder,
                              reranker=IdentityReranker())
    system = RAGSystem(indexes={}, embedder=embedder,
                       reranker=IdentityReranker(),
                       llm_clients={"fake": FakeLLMClient()})
    system.attach_index(InfoSource.NICE, idx, engine=sse)
    chunks = []
    s_data = None
    for chunk, sources, raw, s_data in system.query_rag_stream(
        queries[0], "fake-llm", use_hybrid_search=True, use_reranker=True
    ):
        chunks.append(chunk)
    assert len(chunks) > 1
    assert "".join(chunks).startswith("[fake:fake-llm]")
    assert c.gold_ids[0] in (d["section_id"] for d in s_data)


def test_rag_stream_over_sharded_ivf(setup):
    """The ANN route (nprobe) serves the RAG layer end-to-end."""
    c, idx, mesh, sidx = setup
    sidx_ivf = shard_ivf(sidx, "voyage-3-large", tile_n=64)
    queries = [f"question {i}" for i in range(8)]
    table = {q: c.query_embeddings["voyage-3-large"][i]
             for i, q in enumerate(queries)}
    embedder = PrecomputedEmbedder(table)
    sse = ShardedSearchEngine(sidx_ivf, embedder=embedder, nprobe=8)
    system = RAGSystem(indexes={}, embedder=embedder,
                       llm_clients={"fake": FakeLLMClient()})
    system.attach_index(InfoSource.NICE, idx, engine=sse)
    hits = 0
    for i, q in enumerate(queries):
        docs = system.retrieve_for_query(
            q, InfoSource.NICE, 12, 10, 40.0, W, None,
            use_hybrid_search=True, use_reranker=False,
            reranker_model="rerank-2", reranker_top_k=None,
        )
        hits += c.gold_ids[i] in [d["id"] for d in docs]
    assert hits >= 7, hits


def test_http_rag_over_sharded_mesh(setup):
    """Full production stack: HTTP /v1/search and /v1/rag serve through
    the sharded mesh engine with zero http_api changes."""
    import json
    import urllib.request

    from a_nice_rag_tpu.serving.http_api import serve

    c, idx, mesh, sidx = setup
    queries = [f"question {i}" for i in range(8)]
    table = {q: c.query_embeddings["voyage-3-large"][i]
             for i, q in enumerate(queries)}
    embedder = PrecomputedEmbedder(table)
    sse = ShardedSearchEngine(sidx, embedder=embedder)
    system = RAGSystem(indexes={}, embedder=embedder,
                       llm_clients={"fake": FakeLLMClient()})
    system.attach_index(InfoSource.NICE, idx, engine=sse)
    srv = serve(system, port=0, background=True)
    try:
        port = srv.server_address[1]

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                return json.loads(resp.read())

        out = post("/v1/search", {"query": queries[0],
                                  "use_hybrid_search": True})
        assert c.gold_ids[0] in [d["id"] for d in out["results"]]
        rag_out = post("/v1/rag", {"query": queries[1],
                                   "llm_model": "fake-llm",
                                   "use_hybrid_search": True})
        assert rag_out["answer"].startswith("[fake:fake-llm]")
        assert c.gold_ids[1] in (
            d["section_id"] for d in rag_out["sources"]
        )
    finally:
        srv.shutdown()


def test_bm25_only_placeholder_contract(setup):
    """RAGSystem's BM25-only path passes a '__none__' placeholder dict;
    the adapter must serve it (zero dense models, BM25 list only) and
    match the single-chip engine's set."""
    c, idx, mesh, sidx = setup
    sse = ShardedSearchEngine(sidx)
    se = SearchEngine(idx)
    kw = dict(
        query_embeddings={"__none__": np.zeros((1, 1), np.float32)},
        query_token_lists=c.query_tokens[:2],
        similarity_k=12, common_sections_n=10, wrrf_k=40.0,
        model_weights={"BM25": 1.0}, use_hybrid_search=True,
    )
    a = se.retrieve(**kw)
    s = sse.retrieve(**kw)
    for qa, qs in zip(a, s):
        assert qa and set(qa) == set(qs)
