"""Streaming structured outputs: partial-JSON snapshots + final parse."""

import asyncio
import json

from a_nice_rag_tpu.evals.ragas.llm import BaseJudgeLLM, FakeJudgeLLM
from a_nice_rag_tpu.evals.ragas.prompt import parse_partial_json


def test_parse_partial_json_prefixes():
    doc = json.dumps(
        {"statements": ["first claim", "second claim"],
         "score": 0.75, "done": True}
    )
    seen = []
    for cut in range(1, len(doc) + 1):
        snap = parse_partial_json(doc[:cut])
        if snap is not None:
            seen.append(snap)
    # every snapshot is a dict prefix of the final object
    assert seen[-1] == json.loads(doc)
    for snap in seen:
        assert isinstance(snap, dict)
        for key, val in snap.items():
            assert key in ("statements", "score", "done")
    # the statements list grows monotonically across snapshots
    lens = [len(s.get("statements", [])) for s in seen]
    assert lens == sorted(lens)


def test_parse_partial_json_edge_cases():
    assert parse_partial_json("no json here") is None
    assert parse_partial_json('{"a": 12.') == {"a": 12}
    assert parse_partial_json('{"a": tru') == {}
    assert parse_partial_json('{"key') == {}
    assert parse_partial_json('{"key":') == {}
    assert parse_partial_json('{"a": "val') == {"a": "val"}
    assert parse_partial_json('[1, 2,') == [1, 2]
    assert parse_partial_json('```json\n{"a": [1') == {"a": [1]}
    # malformed (mismatched closer) is rejected, not "repaired"
    assert parse_partial_json('{"a": 1]') is None


def test_generate_stream_yields_snapshots_then_final():
    from a_nice_rag_tpu.evals.ragas.metrics.faithfulness import (
        StatementGeneratorPrompt,
        StatementsIn,
    )

    payload = json.dumps(
        {"statements": ["claim one", "claim two", "claim three"]}
    )
    prompt = StatementGeneratorPrompt()

    async def run():
        items = []
        async for item in prompt.generate_stream(
            FakeJudgeLLM(lambda p: payload),
            StatementsIn(question="q", answer="a"),
        ):
            items.append(item)
        return items

    items = asyncio.run(run())
    final = items[-1]
    assert final.statements == ["claim one", "claim two", "claim three"]
    snapshots = items[:-1]
    assert snapshots, "expected at least one partial snapshot"
    assert all(isinstance(s, dict) for s in snapshots)


def test_generate_stream_repairs_broken_final():
    from a_nice_rag_tpu.evals.ragas.metrics.faithfulness import (
        StatementGeneratorPrompt,
        StatementsIn,
    )

    def judge(p):
        if "failed JSON schema validation" in p:
            return json.dumps({"statements": ["fixed"]})
        return "garbage {{{ not json"

    prompt = StatementGeneratorPrompt()

    async def run():
        items = []
        async for item in prompt.generate_stream(
            FakeJudgeLLM(judge), StatementsIn(question="q", answer="a")
        ):
            items.append(item)
        return items

    items = asyncio.run(run())
    assert items[-1].statements == ["fixed"]


def test_default_astream_single_chunk():
    class OneShot(BaseJudgeLLM):
        async def agenerate(self, prompt, n=1, temperature=1e-8):
            return ['{"x": 1}'] * n

    async def run():
        chunks = []
        async for c in OneShot().astream("p"):
            chunks.append(c)
        return chunks

    assert asyncio.run(run()) == ['{"x": 1}']


def test_astream_abandon_does_not_block():
    """Breaking out of an astream must not hang waiting for the rest of
    the server stream (the worker is torn down lazily via the closed
    flag)."""
    import time

    from a_nice_rag_tpu.evals.ragas.llm import OpenAICompatJudgeLLM

    llm = OpenAICompatJudgeLLM.__new__(OpenAICompatJudgeLLM)

    def fake_stream_call(prompt, temperature, emit):
        for i in range(1000):
            emit(f"chunk{i} ")
            time.sleep(0.001)

    llm._stream_call = fake_stream_call

    async def run():
        chunks = []
        t0 = time.perf_counter()
        async for c in llm.astream("p"):
            chunks.append(c)
            if len(chunks) >= 3:
                break
        return chunks, time.perf_counter() - t0

    chunks, elapsed = asyncio.run(run())
    assert len(chunks) == 3
    # 1000 chunks x 1ms would be ~1s if close blocked on the worker
    assert elapsed < 0.5, elapsed
