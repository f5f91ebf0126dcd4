"""HTTP serving API: health/search/rag endpoints over a live server."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from a_nice_rag_tpu.config import InfoSource
from a_nice_rag_tpu.index import build_index
from a_nice_rag_tpu.rag import FakeLLMClient, RAGSystem
from a_nice_rag_tpu.serving.http_api import serve
from a_nice_rag_tpu.testing import synth_corpus


@pytest.fixture(scope="module")
def server():
    c = synth_corpus(n_docs=120, dim=16, n_queries=4, seed=201)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents, urls=c.urls,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    rag = RAGSystem(
        indexes={InfoSource.NICE: idx},
        llm_clients={"fake": FakeLLMClient()},
    )
    srv = serve(rag, port=0, background=True)
    yield c, srv, srv.server_address[1]
    srv.shutdown()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def test_health(server):
    c, srv, port = server
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/v1/health", timeout=30
    ) as resp:
        out = json.loads(resp.read())
    assert out["status"] == "ok"
    assert out["sources"]["nice"]["n_docs"] == 120
    assert out["sources"]["nice"]["bm25"] is True


def test_search_with_precomputed_embedding(server):
    c, srv, port = server
    out = _post(port, "/v1/search", {
        "query": "anything",
        "query_embedding": c.query_embeddings["voyage-3-large"][0].tolist(),
        "model_weights": {"voyage-3-large": 1.0},
        "common_sections_n": 5,
    })
    assert len(out["results"]) == 5
    assert out["results"][0]["id"] == c.gold_ids[0]
    assert "document" in out["results"][0]


def test_rag_endpoint(server):
    c, srv, port = server
    # No embedder configured -> search inside RAG falls back to BM25-less
    # dense skip; use hybrid BM25 via query text.
    out = _post(port, "/v1/rag", {
        "query": " ".join(c.query_tokens[1][:4]),
        "llm_model": "fake-llm",
        "model_weights": {"voyage-3-large": 0.0, "BM25": 1.0},
        "use_hybrid_search": True,
        "use_reranker": False,
    })
    assert out["answer"].startswith("[fake:fake-llm]")
    assert out["sources"]


def test_error_paths(server):
    c, srv, port = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/search", {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/nope", {"x": 1})
    assert e.value.code == 404
