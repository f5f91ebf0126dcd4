"""Fully-local structured judging: LocalGuidedJudgeLLM runs eval
prompts through the continuous-batching server under a SCHEMA-compiled
decoding constraint (models/constrain.schema_dfa), so the structured
output validates against the prompt's pydantic output model with ZERO
repair round-trips — the guarantee the reference's FixOutputFormat
loop (reference ragas_modified/prompt.py) only approximates post-hoc.

StructuredPrompt passes its output schema to judges that accept
``schema=``; the judge compiles + registers the DFA on the server at
first use (GenerationServer.register_constraint — runtime registry
growth, stable ids, per-shape program caching).
"""

import asyncio
from typing import Literal

import pytest
from pydantic import BaseModel

from a_nice_rag_tpu.evals.ragas.llm import (
    LLMDidNotFinishException,
    LocalGuidedJudgeLLM,
)
from a_nice_rag_tpu.evals.ragas.prompt import StructuredPrompt
from a_nice_rag_tpu.models.decoder import init_decoder, small_lm_config
from a_nice_rag_tpu.serving.genserver import GenerationServer


class _In(BaseModel):
    question: str
    answer: str


class _Out(BaseModel):
    verdict: Literal[0, 1]
    label: Literal["yes", "no"]


class _VerdictPrompt(StructuredPrompt[_In, _Out]):
    instruction = "Judge whether the answer addresses the question."
    input_model = _In
    output_model = _Out


def _server(**kw):
    model, params = init_decoder(small_lm_config())
    return GenerationServer(model, params, slots=2, max_len=768,
                            chunk=4, **kw)


def test_local_guided_judge_validates_without_repair():
    """Server built WITHOUT constraints: the judge auto-compiles the
    prompt's output schema, registers it at runtime, and every sample
    validates with retries=0."""
    srv = _server()
    try:
        judge = LocalGuidedJudgeLLM(srv, max_tokens=96)
        prompt = _VerdictPrompt()
        outs = asyncio.run(prompt.generate_multiple(
            judge, _In(question="q?", answer="a."), n=3,
            temperature=1.0, retries=0,  # zero repair round-trips
        ))
        assert len(outs) == 3
        for out in outs:
            assert isinstance(out, _Out)
            assert out.verdict in (0, 1)
            assert out.label in ("yes", "no")
        # One schema -> one registered constraint, reused across calls.
        names = srv.stats()["constraints"]
        assert len([n for n in names if n.startswith("schema:")]) == 1
        asyncio.run(prompt.generate(judge,
                                    _In(question="r?", answer="b."),
                                    temperature=1.0, retries=0))
        assert srv.stats()["constraints"] == names
    finally:
        srv.stop()


def test_register_constraint_while_serving():
    """Runtime registration is safe mid-serving: an unconstrained
    stream continues across a registry rebuild, and ids stay stable."""
    srv = _server(constraints={"digits": r"[0-9]{1,2}"})
    try:
        r1 = srv.submit(list(range(10, 20)), 24)
        srv.tick()
        assert not r1.finished
        srv.register_constraint("yesno", ["yes", "no"])
        out = srv.complete([256, 9], 12, constraint="yesno")
        text = bytes(t for t in out["tokens"] if t < 256).decode()
        assert text in ("yes", "no")
        # Pre-existing constraint still routes correctly after rebuild.
        out2 = srv.complete([256, 8], 8, constraint="digits",
                            temperature=1.0)
        t2 = bytes(t for t in out2["tokens"] if t < 256).decode()
        assert t2.isdigit() and 1 <= len(t2) <= 2
        srv.drain()
        assert r1.finished
    finally:
        srv.stop()


def test_local_guided_judge_truncation_raises():
    """A budget too small for any complete sentence surfaces as
    LLMDidNotFinishException (matching the REST judges' semantics)."""
    srv = _server()
    try:
        judge = LocalGuidedJudgeLLM(srv, max_tokens=3)
        schema = _Out.model_json_schema()
        with pytest.raises(LLMDidNotFinishException):
            asyncio.run(judge.agenerate("judge this", n=1,
                                        temperature=1.0,
                                        schema=schema))
    finally:
        srv.stop()


def test_generic_json_fallback_self_registers():
    srv = _server()
    try:
        judge = LocalGuidedJudgeLLM(srv, constraint="json_object",
                                    max_tokens=64, auto_schema=False)
        import json as _json

        texts = asyncio.run(judge.agenerate("emit", n=1,
                                            temperature=1.0))
        body = texts[0].lstrip(" \t\n\r")
        assert body[:1] == "{"
        assert "json_object" in srv.stats()["constraints"]
    finally:
        srv.stop()
