"""MetricWithLLM.train(): genetic instruction optimization on a metric.

Mirrors the reference's prompt-training surface
(ragas_modified/metrics/base.py:345-427 + optimizers/genetic.py): a
labeled trainset drives mutate/crossover over one prompt's instruction,
fitness = agreement with the labels, winner installed on the metric.
"""

import asyncio
import json

import pytest

from a_nice_rag_tpu.evals.ragas.dataset import SingleTurnSample
from a_nice_rag_tpu.evals.ragas.llm import FakeJudgeLLM
from a_nice_rag_tpu.evals.ragas.losses import MSELoss
from a_nice_rag_tpu.evals.ragas.metrics.faithfulness import Faithfulness
from a_nice_rag_tpu.evals.ragas.run_config import RunConfig


def _sample():
    return SingleTurnSample(
        user_input="How is stage 2 hypertension treated?",
        response="Drug treatment is offered. Lifestyle advice alone works.",
        retrieved_contexts=[
            "NG136: offer antihypertensive drug treatment for stage 2."
        ],
    )


class _Responder:
    """Scripted judge: statement prompts set a flag when the evolved
    instruction marker is present; the following NLI call answers
    perfectly iff the flag is set (so better instructions really do
    score better)."""

    def __init__(self):
        self.improved = False
        self.mutations = 0

    def __call__(self, prompt: str):
        if "Improve this evaluation-prompt instruction" in prompt or \
                "Combine the strengths" in prompt:
            self.mutations += 1
            return f"IMPROVED v{self.mutations}: break the answer into statements."
        if "statements" in prompt and "verdict" not in prompt:
            self.improved = "IMPROVED" in prompt
            return json.dumps(
                {"statements": ["drugs are offered", "lifestyle suffices"]}
            )
        verdicts = [
            {"statement": "s1", "reason": "r", "verdict": 1},
            {"statement": "s2", "reason": "r", "verdict": 1 if self.improved else 0},
        ]
        return json.dumps({"verdicts": verdicts})


def test_train_improves_and_installs_instruction():
    metric = Faithfulness(llm=FakeJudgeLLM(_Responder()))
    base = metric.statement_prompt.instruction
    result = metric.train(
        [_sample()], [1.0],
        prompt_name="statement_prompt",
        generations=2, population=3,
    )
    # The evolved instruction scores 1.0 (perfect agreement) vs 0.75 for
    # the base (score 0.5 against target 1.0 under MSE).
    assert result.best_score == pytest.approx(1.0)
    assert "IMPROVED" in result.best_instruction
    assert metric.statement_prompt.instruction == result.best_instruction
    assert metric.statement_prompt.instruction != base
    # History recorded every scored candidate.
    assert len(result.history) >= 3
    base_entries = [s for ins, s in result.history if ins == base]
    assert base_entries and base_entries[0] == pytest.approx(0.75)


def test_get_set_prompts_surface():
    metric = Faithfulness(llm=FakeJudgeLLM(lambda p: "{}"))
    prompts = metric.get_prompts()
    assert set(prompts) == {"statement_prompt", "nli_prompt"}
    new = prompts["statement_prompt"]
    new.instruction = "custom"
    metric.set_prompts(statement_prompt=new)
    assert metric.statement_prompt.instruction == "custom"
    with pytest.raises(ValueError, match="no prompt named"):
        metric.set_prompts(nope=new)


def test_train_validations():
    metric = Faithfulness(llm=FakeJudgeLLM(lambda p: "{}"))
    with pytest.raises(ValueError, match="align"):
        metric.train([], [])
    with pytest.raises(ValueError, match="no prompt"):
        asyncio.run(
            metric.atrain([_sample()], [1.0], prompt_name="bogus")
        )


def test_default_prompt_and_custom_loss():
    metric = Faithfulness(llm=FakeJudgeLLM(_Responder()))
    result = metric.train(
        [_sample()], [1.0], loss=MSELoss(), generations=1, population=2,
        run_config=RunConfig(max_workers=2),
    )
    # prompt_name defaults to the alphabetically first prompt (nli_prompt).
    assert result.best_score >= 0.75
