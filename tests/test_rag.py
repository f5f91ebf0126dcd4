"""RAG orchestration: streaming contract, routing, prompts, tracing."""

import numpy as np
import pytest

from a_nice_rag_tpu.config import InfoSource
from a_nice_rag_tpu.index import build_index
from a_nice_rag_tpu.rag import (
    FakeLLMClient,
    RAGSystem,
    build_context_text,
    clean_section_id,
    route_model,
)
from a_nice_rag_tpu.rag.prompts import NOT_FOUND_SENTENCE, build_chat_messages
from a_nice_rag_tpu.retrieval.embed import PrecomputedEmbedder
from a_nice_rag_tpu.retrieval.rerank import IdentityReranker
from a_nice_rag_tpu.testing import synth_corpus


@pytest.fixture(scope="module")
def rag():
    c = synth_corpus(n_docs=200, dim=32, n_queries=8, seed=61)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents, urls=c.urls,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    queries = [f"question {i}" for i in range(8)]
    table = {
        q: c.query_embeddings["voyage-3-large"][i]
        for i, q in enumerate(queries)
    }
    fake = FakeLLMClient()
    system = RAGSystem(
        indexes={InfoSource.NICE: idx},
        embedder=PrecomputedEmbedder(table),
        reranker=IdentityReranker(),
        llm_clients={"fake": fake},
    )
    return c, system, queries, fake


def test_stream_contract(rag):
    c, system, queries, fake = rag
    chunks = []
    sources = raw = s_data = None
    for chunk, sources, raw, s_data in system.query_rag_stream(
        queries[0], "fake-llm", use_hybrid_search=True, use_reranker=True
    ):
        chunks.append(chunk)
    answer = "".join(chunks)
    assert answer.startswith("[fake:fake-llm]")
    assert len(chunks) > 1, "must stream in deltas"
    # Gold doc should be in context and sources.
    assert c.gold_ids[0] in (d["section_id"] for d in s_data)
    assert "- Section" in sources
    assert "--- Context Chunk ---" in raw or raw
    # The prompt sent to the LLM embeds the context with source headers.
    sent = fake.calls[-1]["messages"]
    assert sent[0]["role"] == "system"
    assert NOT_FOUND_SENTENCE in sent[0]["content"]
    assert "Source Information: [Identifier:" in sent[1]["content"]
    assert queries[0] in sent[1]["content"]


def test_validation_errors(rag):
    _, system, queries, _ = rag
    with pytest.raises(ValueError, match="empty"):
        list(system.query_rag_stream("  ", "fake"))
    with pytest.raises(ValueError, match="similarity_k"):
        list(system.query_rag_stream("q", "fake", similarity_k=0))
    with pytest.raises(ValueError, match="info_source"):
        list(system.query_rag_stream(queries[0], "fake", info_source="bogus"))


def test_unrouted_model_yields_error(rag):
    _, system, queries, _ = rag
    out = list(system.query_rag_stream(queries[0], "some-unknown-model"))
    assert len(out) == 1
    assert "Unsupported LLM model" in out[0][0]


def test_routing_table():
    clients = {"openai": "O", "gemini": "G", "openrouter": "R", "fake": "F"}
    assert route_model("gpt-4.1-mini", clients)[0] == "O"
    assert route_model("gpt-5-turbo", clients)[1] == {"reasoning_effort": "minimal"}
    assert route_model("o4-mini", clients) == ("O", {})
    assert route_model("gemini-2.5-flash", clients)[0] == "G"
    assert route_model("claude-sonnet-4", clients)[0] == "R"
    assert route_model("fake-echo", clients)[0] == "F"
    assert route_model("mystery-model", clients) is None
    assert route_model("claude-sonnet-4", {"openai": "O"}) is None


def test_clean_section_id():
    assert clean_section_id("NG136_Treatment_of_adults", "NG136") == (
        "Treatment of adults"
    )
    assert clean_section_id("Other  thing", "NG1") == "Other thing"
    assert clean_section_id("", "NG1") == ""


def test_context_text_format():
    docs = [
        {"id": "CG1_Intro", "source": "CG1", "document": "text one"},
        {"id": "CG2_Scope", "source": "CG2", "document": "text two"},
    ]
    ctx, raw = build_context_text(docs)
    assert ctx.count("Source Information: [Identifier:") == 2
    assert "\n\n---\n\n" in ctx
    assert raw == "text one\n\n--- Context Chunk ---\n\ntext two"


def test_trace_recorded(rag):
    _, system, queries, _ = rag
    list(system.query_rag_stream(queries[1], "fake-llm"))
    t = system.last_trace
    assert "retrieval" in t.durations and "llm" in t.durations
    d = t.to_dict()
    assert d["name"] == "query"
    assert {c["name"] for c in d["children"]} >= {"retrieval", "llm"}


def test_bm25_only_weights(rag):
    c, system, queries, _ = rag
    out = list(
        system.query_rag_stream(
            queries[2],
            "fake-llm",
            model_weights={"voyage-3-large": 0.0, "BM25": 1.0},
            use_hybrid_search=True,
            use_reranker=False,
        )
    )
    # Falls back to BM25 via query-text preprocessing; still streams.
    assert out and out[0][0]


def test_multi_model_query_embedding_contract(rag):
    """A single embedding array cannot serve 2+ active dense models; a
    per-model dict (the reference's query_embeddings contract) can."""
    c, system, queries, fake = rag
    idx = system.indexes[InfoSource.NICE]
    # Give the index a second dense model in a different space/dim.
    rng = np.random.default_rng(9)
    import jax.numpy as jnp
    idx.dense["voyage-3.5"] = jnp.asarray(
        rng.standard_normal((idx.n_docs_padded, 16)).astype(np.float32)
    )
    try:
        weights = {"voyage-3-large": 1.0, "voyage-3.5": 1.0}
        q32 = c.query_embeddings["voyage-3-large"][0]
        with pytest.raises(ValueError, match="embedding spaces"):
            system.retrieve_for_query(
                queries[0], InfoSource.NICE, 5, 5, 40.0, weights, None,
                False, False, "rerank-2", None, query_embedding=q32,
            )
        q16 = rng.standard_normal(16).astype(np.float32)
        docs = system.retrieve_for_query(
            queries[0], InfoSource.NICE, 5, 5, 40.0, weights, None,
            False, False, "rerank-2", None,
            query_embedding={"voyage-3-large": q32, "voyage-3.5": q16},
        )
        assert docs, "dict-contract retrieval returned nothing"
        # Missing model in the dict falls back to the embedder only for
        # the model the embedder serves; the other is skipped.
        docs2 = system.retrieve_for_query(
            queries[0], InfoSource.NICE, 5, 5, 40.0, weights, None,
            False, False, "rerank-2", None,
            query_embedding={"voyage-3.5": q16},
        )
        assert docs2
    finally:
        del idx.dense["voyage-3.5"]
