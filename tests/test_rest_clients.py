"""REST client plumbing with mocked HTTP: SSE stream parsing, embed and
rerank response handling."""

import io
import json

import numpy as np
import pytest


class _FakeResp(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_sse_stream_parsing(monkeypatch):
    from a_nice_rag_tpu.rag.providers import OpenAICompatClient

    def chunk(text):
        return (
            "data: "
            + json.dumps({"choices": [{"delta": {"content": text}}]})
        ).encode()

    lines = [
        b": keepalive comment",
        chunk("Hel"),
        b"",
        b"data: {broken json",  # must be skipped, not crash
        chunk("lo"),
        b'data: {"choices": []}',  # empty choices skipped
        chunk(" world"),
        b"data: [DONE]",
        chunk("NEVER"),  # after DONE: ignored
    ]
    body = b"\n".join(lines)
    captured = {}

    def fake_urlopen(req, timeout):
        captured["url"] = req.full_url
        captured["auth"] = req.headers.get("Authorization")
        captured["payload"] = json.loads(req.data)
        return _FakeResp(body)

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    client = OpenAICompatClient("k-123", base_url="https://api.example.com/v1")
    out = list(client.stream_chat("m", [{"role": "user", "content": "q"}],
                                  temperature=0))
    assert "".join(out) == "Hello world"
    assert captured["url"].endswith("/chat/completions")
    assert captured["auth"] == "Bearer k-123"
    assert captured["payload"]["stream"] is True
    assert captured["payload"]["temperature"] == 0


def test_voyage_embedder_and_reranker(monkeypatch):
    from a_nice_rag_tpu.retrieval.embed import VoyageEmbedder
    from a_nice_rag_tpu.retrieval.rerank import VoyageReranker

    def fake_urlopen(req, timeout):
        payload = json.loads(req.data)
        if req.full_url.endswith("/embeddings"):
            # Out-of-order indices must be re-sorted by the client.
            data = [
                {"index": 1, "embedding": [1.0, 0.0]},
                {"index": 0, "embedding": [0.0, 1.0]},
            ]
            return _FakeResp(json.dumps({"data": data}).encode())
        assert req.full_url.endswith("/rerank")
        return _FakeResp(json.dumps({
            "data": [
                {"index": 1, "relevance_score": 0.9},
                {"index": 0, "relevance_score": 0.2},
            ]
        }).encode())

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    emb = VoyageEmbedder(api_key="k")
    vecs = emb.embed_queries(["a", "b"])
    np.testing.assert_array_equal(vecs, [[0.0, 1.0], [1.0, 0.0]])

    rr = VoyageReranker(api_key="k")
    docs = [{"id": "x", "document": "dx"}, {"id": "y", "document": "dy"}]
    out = rr.rerank("q", docs, top_k=2)
    assert [d["id"] for d in out] == ["y", "x"]
    assert out[0]["rerank_score"] == 0.9


def test_openai_judge_truncation_detection(monkeypatch):
    from a_nice_rag_tpu.evals.ragas.llm import (
        LLMDidNotFinishException,
        OpenAICompatJudgeLLM,
    )

    body = json.dumps({
        "choices": [{"message": {"content": "partial"},
                     "finish_reason": "length"}],
    }).encode()
    monkeypatch.setattr(
        "urllib.request.urlopen", lambda req, timeout: _FakeResp(body)
    )
    judge = OpenAICompatJudgeLLM(api_key="k")
    with pytest.raises(LLMDidNotFinishException):
        judge._call("p", 1, 0.0)


def test_prompt_to_content_parts():
    from a_nice_rag_tpu.evals.ragas.llm import prompt_to_content_parts

    parts = prompt_to_content_parts(
        "Check this:\n![image](https://x.test/a.png)\nand "
        "![scan](data:image/png;base64,AAAA)\nfaithful?"
    )
    assert [p["type"] for p in parts] == [
        "text", "image_url", "text", "image_url", "text"
    ]
    assert parts[1]["image_url"]["url"] == "https://x.test/a.png"
    assert parts[3]["image_url"]["url"].startswith("data:image/png")
    # No images -> one text part, verbatim.
    only = prompt_to_content_parts("plain")
    assert only == [{"type": "text", "text": "plain"}]


def test_multimodal_judge_ships_image_parts(monkeypatch):
    from a_nice_rag_tpu.evals.ragas.llm import MultimodalJudgeLLM

    sent = {}

    class _Resp:
        def __init__(self, body):
            self.body = body
        def read(self):
            return self.body
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout):
        sent["payload"] = json.loads(req.data.decode())
        return _Resp(json.dumps({
            "choices": [{"finish_reason": "stop",
                         "message": {"content": '{"verdict": 1}'}}]
        }).encode())

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    judge = MultimodalJudgeLLM(model="vision-x", api_key="k")
    out = judge.generate("q ![image](https://x.test/a.png) a")
    assert out == ['{"verdict": 1}']
    content = sent["payload"]["messages"][0]["content"]
    assert isinstance(content, list)
    assert content[1] == {"type": "image_url",
                          "image_url": {"url": "https://x.test/a.png"}}
    # Text-only prompts stay plain strings (upstream-compatible).
    judge.generate("no images here")
    assert isinstance(sent["payload"]["messages"][0]["content"], str)
