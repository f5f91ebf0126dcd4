"""LLM-judged evaluation framework with scripted fake judges."""

import json
import math

import numpy as np
import pytest

from a_nice_rag_tpu.evals.ragas import (
    EvaluationDataset,
    FakeJudgeEmbeddings,
    FakeJudgeLLM,
    RunConfig,
    SingleTurnSample,
    evaluate,
)
from a_nice_rag_tpu.evals.ragas.cache import DiskCacheBackend, cacher
from a_nice_rag_tpu.evals.ragas.cost import CostTracker, TokenUsage
from a_nice_rag_tpu.evals.ragas.executor import Executor
from a_nice_rag_tpu.evals.ragas.metrics import (
    AspectCritic,
    BleuScore,
    ExactMatch,
    Faithfulness,
    LLMContextPrecisionWithReference,
    LLMContextRecall,
    NonLLMStringSimilarity,
    ResponseRelevancy,
    RougeScore,
    RubricsScore,
    SemanticSimilarity,
    StringPresence,
)
from a_nice_rag_tpu.evals.ragas.prompt import extract_json


def _sample():
    return SingleTurnSample(
        user_input="How is stage 2 hypertension treated?",
        retrieved_contexts=[
            "Offer antihypertensive drug treatment to adults with stage 2 hypertension."
        ],
        response="Drug treatment is offered for stage 2 hypertension.",
        reference="Adults with stage 2 hypertension should be offered drug treatment.",
    )


def _faithfulness_judge(prompt: str) -> str:
    if "Decompose" in prompt or "self-contained statements" in prompt:
        return json.dumps(
            {"statements": ["Drug treatment is offered for stage 2 hypertension.",
                            "Lifestyle advice alone is sufficient."]}
        )
    return json.dumps(
        {
            "verdicts": [
                {"statement": "s1", "reason": "supported", "verdict": 1},
                {"statement": "s2", "reason": "not supported", "verdict": 0},
            ]
        }
    )


def test_faithfulness_scoring():
    llm = FakeJudgeLLM(_faithfulness_judge)
    metric = Faithfulness(llm=llm)
    metric.init(RunConfig())
    import asyncio

    score = asyncio.run(metric.single_turn_ascore(_sample()))
    assert score == 0.5


def test_answer_relevancy_committal_and_noncommittal():
    import asyncio

    q = "How is stage 2 hypertension treated?"

    def committal(prompt):
        return json.dumps({"question": q, "noncommittal": 0})

    emb = FakeJudgeEmbeddings()
    metric = ResponseRelevancy(llm=FakeJudgeLLM(committal), embeddings=emb)
    metric.init(RunConfig())
    score = asyncio.run(metric.single_turn_ascore(_sample()))
    # Generated question == original -> identical embedding -> dot == 1.
    assert score == pytest.approx(1.0, abs=1e-5)

    def noncommittal(prompt):
        return json.dumps({"question": q, "noncommittal": 1})

    metric2 = ResponseRelevancy(llm=FakeJudgeLLM(noncommittal), embeddings=emb)
    metric2.init(RunConfig())
    s2 = asyncio.run(
        metric2.single_turn_ascore(
            SingleTurnSample(
                user_input=q, response="No relevant NICE guidelines were found."
            )
        )
    )
    assert s2 == 0.0


def test_context_precision_average_precision():
    import asyncio

    calls = {"n": 0}

    def judge(prompt):
        calls["n"] += 1
        verdict = 1 if calls["n"] in (1, 3) else 0
        return json.dumps({"reason": "r", "verdict": verdict})

    metric = LLMContextPrecisionWithReference(llm=FakeJudgeLLM(judge))
    metric.init(RunConfig())
    sample = SingleTurnSample(
        user_input="q",
        retrieved_contexts=["c1", "c2", "c3"],
        reference="ref",
    )
    score = asyncio.run(metric.single_turn_ascore(sample))
    # Useful at ranks 1 and 3: AP = (1/1 + 2/3) / 2
    assert score == pytest.approx((1.0 + 2 / 3) / 2)


def test_context_recall():
    import asyncio

    def judge(prompt):
        return json.dumps(
            {
                "classifications": [
                    {"statement": "a", "reason": "r", "attributed": 1},
                    {"statement": "b", "reason": "r", "attributed": 1},
                    {"statement": "c", "reason": "r", "attributed": 0},
                ]
            }
        )

    metric = LLMContextRecall(llm=FakeJudgeLLM(judge))
    metric.init(RunConfig())
    score = asyncio.run(metric.single_turn_ascore(_sample()))
    assert score == pytest.approx(2 / 3)


def test_string_metrics():
    import asyncio

    s = SingleTurnSample(response="the cat sat on the mat",
                         reference="the cat sat on the mat")
    assert asyncio.run(ExactMatch().single_turn_ascore(s)) == 1.0
    assert asyncio.run(BleuScore().single_turn_ascore(s)) == pytest.approx(1.0)
    assert asyncio.run(RougeScore().single_turn_ascore(s)) == pytest.approx(1.0)
    s2 = SingleTurnSample(response="a completely different sentence here",
                          reference="the cat sat on the mat")
    assert asyncio.run(BleuScore().single_turn_ascore(s2)) < 0.3
    assert asyncio.run(
        NonLLMStringSimilarity().single_turn_ascore(
            SingleTurnSample(response="kitten", reference="sitting")
        )
    ) == pytest.approx(1 - 3 / 7)
    assert asyncio.run(
        StringPresence().single_turn_ascore(
            SingleTurnSample(response="x the cat y", reference="the cat")
        )
    ) == 1.0


def test_semantic_similarity_identical_texts():
    import asyncio

    metric = SemanticSimilarity(embeddings=FakeJudgeEmbeddings())
    s = SingleTurnSample(response="same text", reference="same text")
    assert asyncio.run(metric.single_turn_ascore(s)) == pytest.approx(1.0)


def test_aspect_critic_and_rubrics():
    import asyncio

    critic = AspectCritic(
        name="harmlessness",
        definition="Is the response free of harmful advice?",
        llm=FakeJudgeLLM(lambda p: json.dumps({"reason": "ok", "verdict": 1})),
    )
    critic.init(RunConfig())
    assert asyncio.run(critic.single_turn_ascore(_sample())) == 1.0

    rubric = RubricsScore(
        llm=FakeJudgeLLM(lambda p: json.dumps({"reason": "good", "score": 4}))
    )
    rubric.init(RunConfig())
    assert asyncio.run(rubric.single_turn_ascore(_sample())) == 4.0


def test_evaluate_end_to_end_with_nan_isolation():
    flaky = {"n": 0}

    def judge(prompt):
        if "Decompose" in prompt or "statements" in prompt.lower():
            flaky["n"] += 1
            if flaky["n"] % 2 == 0:
                return "THIS IS NOT JSON AT ALL" * 3
            return json.dumps({"statements": ["s"]})
        return json.dumps(
            {"verdicts": [{"statement": "s", "reason": "r", "verdict": 1}]}
        )

    ds = EvaluationDataset([_sample(), _sample()])
    result = evaluate(
        ds,
        metrics=[Faithfulness(), ExactMatch()],
        llm=FakeJudgeLLM(judge),
        embeddings=FakeJudgeEmbeddings(),
        show_progress=False,
    )
    agg = result.aggregate()
    assert "faithfulness" in agg and "exact_match" in agg
    assert result["exact_match"] == [0.0, 0.0]
    df = result.to_pandas()
    assert "faithfulness" in df.columns and len(df) == 2


def test_prompt_repair_loop():
    import asyncio

    from a_nice_rag_tpu.evals.ragas.metrics.faithfulness import (
        StatementGeneratorPrompt,
        StatementsIn,
    )

    calls = {"n": 0}

    def judge(prompt):
        calls["n"] += 1
        if "failed JSON schema validation" in prompt:
            return json.dumps({"statements": ["fixed"]})
        return "not json {broken"

    prompt = StatementGeneratorPrompt()
    out = asyncio.run(
        prompt.generate(
            FakeJudgeLLM(judge), StatementsIn(question="q", answer="a")
        )
    )
    assert out.statements == ["fixed"]
    assert calls["n"] >= 2


def test_extract_json_variants():
    assert extract_json('```json\n{"a": 1}\n```') == '{"a": 1}'
    assert extract_json('prefix {"a": {"b": 2}} suffix') == '{"a": {"b": 2}}'
    assert extract_json("[1, 2, 3] tail") == "[1, 2, 3]"


def test_executor_order_and_nan():
    import asyncio

    ex = Executor(show_progress=False)

    async def job(i):
        await asyncio.sleep(0.01 * (5 - i))
        if i == 2:
            raise RuntimeError("boom")
        return i

    for i in range(5):
        ex.submit(job, i)
    out = ex.results()
    assert out[0] == 0 and out[1] == 1 and out[3] == 3 and out[4] == 4
    assert math.isnan(out[2])


def test_cache_and_cost(tmp_path):
    backend = DiskCacheBackend(str(tmp_path / "cache"))
    calls = {"n": 0}

    @cacher(backend)
    def expensive(x):
        calls["n"] += 1
        return x * 2

    assert expensive(21) == 42
    assert expensive(21) == 42
    assert calls["n"] == 1

    tracker = CostTracker()
    tracker.record(TokenUsage(100, 50, "gpt-4o-mini"))
    tracker.record(TokenUsage(10, 5, "gpt-4o-mini"))
    assert tracker.total_tokens().input_tokens == 110
    assert tracker.total_cost(1e-6, 2e-6) == pytest.approx(
        110 * 1e-6 + 55 * 2e-6
    )


def test_metric_column_validation():
    import asyncio

    with pytest.raises(ValueError, match="requires columns"):
        asyncio.run(
            Faithfulness(llm=FakeJudgeLLM()).single_turn_ascore(
                SingleTurnSample(user_input="q")
            )
        )


def test_prompt_save_load_and_adapt(tmp_path):
    import asyncio
    import os

    from a_nice_rag_tpu.evals.ragas.metrics.faithfulness import (
        StatementGeneratorPrompt,
    )

    prompt = StatementGeneratorPrompt()
    path = os.path.join(tmp_path, "prompt.json")
    prompt.save(path)
    fresh = StatementGeneratorPrompt()
    fresh.instruction = "overwritten"
    fresh.examples = []
    fresh.load(path)
    assert fresh.instruction == prompt.instruction
    assert len(fresh.examples) == len(prompt.examples)
    assert fresh.examples[0][0].question == prompt.examples[0][0].question

    def translator(p):
        # Echo back the JSON with a marker prefix on each string value.
        import re as _re

        payload = extract_json(p)
        return _re.sub(r'"((?:[^"\\]|\\.)+)"(?=\s*[,\}\]])',
                       lambda m: f'"XX {m.group(1)}"' if not m.group(1) in
                       ("question", "answer", "statements", "input", "output")
                       else m.group(0), payload)

    adapted = asyncio.run(prompt.adapt(FakeJudgeLLM(translator), "spanish"))
    assert adapted.examples[0][0].question.startswith("XX ")


def test_ensembler_majority_vote():
    from a_nice_rag_tpu.evals.ragas.metrics import Ensembler

    reps = [
        [{"verdict": 1, "x": "a"}, {"verdict": 0, "x": "b"}],
        [{"verdict": 1, "x": "a"}, {"verdict": 1, "x": "b"}],
        [{"verdict": 0, "x": "a"}, {"verdict": 1, "x": "b"}],
    ]
    out = Ensembler.from_discrete(reps, "verdict")
    assert [o["verdict"] for o in out] == [1, 1]
    assert Ensembler.from_discrete([], "verdict") == []


def test_judge_cost_tracking(monkeypatch):
    import io as _io
    import json as _json

    from a_nice_rag_tpu.evals.ragas.cost import CostTracker
    from a_nice_rag_tpu.evals.ragas.llm import OpenAICompatJudgeLLM

    tracker = CostTracker()
    judge = OpenAICompatJudgeLLM(api_key="test-key", cost_tracker=tracker)

    class FakeResp(_io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    body = _json.dumps(
        {
            "model": "gpt-4o-mini",
            "choices": [
                {"message": {"content": "ok"}, "finish_reason": "stop"}
            ],
            "usage": {"prompt_tokens": 12, "completion_tokens": 3},
        }
    ).encode()
    monkeypatch.setattr(
        "urllib.request.urlopen", lambda req, timeout: FakeResp(body)
    )
    out = judge._call("hello", 1, 0.0)
    assert out == ["ok"]
    assert tracker.total_tokens().input_tokens == 12
    assert tracker.total_cost(1e-6) > 0
