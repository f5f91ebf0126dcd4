"""Fully-local structured judging: LocalGuidedJudgeLLM runs eval
prompts through the continuous-batching server under a SCHEMA-compiled
decoding constraint (models/constrain.schema_dfa), so the structured
output validates against the prompt's pydantic output model with ZERO
repair round-trips — the guarantee the reference's FixOutputFormat
loop (reference ragas_modified/prompt.py) only approximates post-hoc.
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
from a_nice_rag_tpu.models.constrain import schema_dfa
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


def _server():
    model, params = init_decoder(small_lm_config())
    return GenerationServer(
        model, params, slots=2, max_len=768, chunk=4,
        # compact=True: no inter-token whitespace, so a weak model
        # can't burn its budget on runs of spaces.
        constraints={"verdict": schema_dfa(_Out.model_json_schema(),
                                           compact=True)},
    )


def test_local_guided_judge_validates_without_repair():
    srv = _server()
    try:
        judge = LocalGuidedJudgeLLM(srv, constraint="verdict",
                                    max_tokens=96)
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
    finally:
        srv.stop()


def test_local_guided_judge_truncation_raises():
    """A budget too small for any complete sentence surfaces as
    LLMDidNotFinishException (matching the REST judges' semantics)."""
    srv = _server()
    try:
        judge = LocalGuidedJudgeLLM(srv, constraint="verdict",
                                    max_tokens=3)
        with pytest.raises(LLMDidNotFinishException):
            asyncio.run(judge.agenerate("judge this", n=1,
                                        temperature=1.0))
    finally:
        srv.stop()
