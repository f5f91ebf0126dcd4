"""Extended metric library, multi-turn evaluation, testset synthesis,
validation/analytics/optimizer aux modules."""

import asyncio
import json

import numpy as np
import pytest

from a_nice_rag_tpu.evals.ragas import (
    EvaluationDataset,
    FakeJudgeEmbeddings,
    FakeJudgeLLM,
    RunConfig,
    evaluate,
)
from a_nice_rag_tpu.evals.ragas.dataset import (
    AIMessage,
    HumanMessage,
    Message,
    MultiTurnSample,
    SingleTurnSample,
    ToolCall,
    ToolMessage,
)
from a_nice_rag_tpu.evals.ragas.metrics import (
    AgentGoalAccuracyWithReference,
    AnswerAccuracy,
    AnswerCorrectness,
    ContextEntityRecall,
    ContextUtilization,
    DataCompyScore,
    FactualCorrectness,
    InstanceRubrics,
    LLMSQLEquivalence,
    NoiseSensitivity,
    SummarizationScore,
    ToolCallAccuracy,
    TopicAdherenceScore,
)
from a_nice_rag_tpu.evals.ragas.validation import (
    remap_column_names,
    validate_required_columns,
)


def _run(metric, sample, multi=False):
    metric.init(RunConfig())
    coro = (
        metric.multi_turn_ascore(sample)
        if multi
        else metric.single_turn_ascore(sample)
    )
    return asyncio.run(coro)


def test_answer_correctness_f1_blend():
    def judge(prompt):
        return json.dumps({"TP": ["a"], "FP": ["b"], "FN": ["c"]})

    m = AnswerCorrectness(
        llm=FakeJudgeLLM(judge), embeddings=FakeJudgeEmbeddings(),
        weights=[1.0, 0.0],
    )
    s = SingleTurnSample(user_input="q", response="r", reference="r")
    # f1 = 1 / (1 + 0.5*2) = 0.5
    assert _run(m, s) == pytest.approx(0.5)


def test_factual_correctness_modes():
    def judge(prompt):
        if "standalone factual claims" in prompt:
            return json.dumps({"claims": ["c1", "c2"]})
        return json.dumps(
            {"verdicts": [{"claim": "c1", "verdict": 1},
                          {"claim": "c2", "verdict": 0}]}
        )

    s = SingleTurnSample(response="r", reference="g")
    assert _run(FactualCorrectness(FakeJudgeLLM(judge), "precision"), s) == 0.5
    assert _run(FactualCorrectness(FakeJudgeLLM(judge), "f1"), s) == pytest.approx(0.5)


def test_context_entity_recall():
    calls = {"n": 0}

    def judge(prompt):
        calls["n"] += 1
        if calls["n"] == 1:  # reference entities
            return json.dumps({"entities": ["NICE", "metformin", "adults"]})
        return json.dumps({"entities": ["nice", "metformin"]})

    m = ContextEntityRecall(llm=FakeJudgeLLM(judge))
    s = SingleTurnSample(reference="...", retrieved_contexts=["..."])
    assert _run(m, s) == pytest.approx(2 / 3)


def test_noise_sensitivity():
    calls = {"n": 0}

    def judge(prompt):
        if "self-contained statements" in prompt or "Decompose" in prompt:
            return json.dumps({"statements": ["s1", "s2"]})
        calls["n"] += 1
        if calls["n"] == 1:  # vs retrieved contexts: both supported
            verdicts = [1, 1]
        else:  # vs reference: only s1 supported
            verdicts = [1, 0]
        return json.dumps(
            {"verdicts": [
                {"statement": f"s{i+1}", "reason": "r", "verdict": v}
                for i, v in enumerate(verdicts)
            ]}
        )

    m = NoiseSensitivity(llm=FakeJudgeLLM(judge))
    s = SingleTurnSample(
        user_input="q", response="r", reference="g", retrieved_contexts=["c"]
    )
    assert _run(m, s) == pytest.approx(0.5)  # s2 from noise


def test_nv_answer_accuracy_dual_rating():
    m = AnswerAccuracy(
        llm=FakeJudgeLLM(lambda p: [json.dumps({"rating": 4}),
                                    json.dumps({"rating": 2})])
    )
    s = SingleTurnSample(user_input="q", response="r", reference="g")
    assert _run(m, s) == pytest.approx((4 + 2) / 2 / 4)


def test_context_utilization_alias():
    m = ContextUtilization(
        llm=FakeJudgeLLM(lambda p: json.dumps({"reason": "r", "verdict": 1}))
    )
    s = SingleTurnSample(
        user_input="q", response="r", retrieved_contexts=["c1", "c2"]
    )
    assert _run(m, s) == 1.0
    assert m.name == "context_utilization"


def test_summarization_score():
    def judge(prompt):
        if "Answer each question using ONLY the summary" in prompt:
            return json.dumps({"answers": [1, 0]})
        if "For each keyphrase write one question" in prompt:
            return json.dumps({"questions": ["q1?", "q2?"]})
        return json.dumps({"keyphrases": ["k1", "k2"]})

    m = SummarizationScore(llm=FakeJudgeLLM(judge), length_penalty=False)
    s = SingleTurnSample(reference_contexts=["long text " * 20],
                         response="short summary")
    assert _run(m, s) == pytest.approx(0.5)


def test_sql_equivalence_and_datacompy():
    m = LLMSQLEquivalence(
        llm=FakeJudgeLLM(lambda p: json.dumps({"reason": "r", "equivalent": 1}))
    )
    s = SingleTurnSample(
        response="SELECT a FROM t", reference="SELECT a FROM t WHERE 1=1",
        reference_contexts=["table t (a int)"],
    )
    assert _run(m, s) == 1.0

    d = DataCompyScore()
    s2 = SingleTurnSample(
        response="a,b\n1,2\n3,4\n", reference="a,b\n1,2\n5,6\n"
    )
    # 1 of 2 rows match both ways -> f1 = 0.5
    assert _run(d, s2) == pytest.approx(0.5)


def test_instance_rubrics_uses_sample_rubrics():
    m = InstanceRubrics(
        llm=FakeJudgeLLM(lambda p: json.dumps({"reason": "r", "score": 3}))
    )
    s = SingleTurnSample(
        user_input="q", response="r",
        rubrics={"score1_description": "bad", "score5_description": "good"},
    )
    assert _run(m, s) == 3.0


def _convo():
    return MultiTurnSample(
        user_input=[
            Message(role="user", content="Book me a cardiology referral"),
            Message(role="tool_call",
                    content=json.dumps({"name": "book", "args": {"dept": "cardio"}})),
            Message(role="assistant", content="Referral booked."),
        ],
        reference="Get a cardiology referral booked",
        reference_tool_calls=[{"name": "book", "args": {"dept": "cardio"}}],
    )


def test_typed_message_hierarchy_tool_call_accuracy():
    """Typed channel (reference ragas_modified/messages.py:6-134):
    AIMessage.tool_calls is read natively by ToolCallAccuracy; the
    pretty_repr renders per-type; pydantic keeps subclass instances."""
    s = MultiTurnSample(
        user_input=[
            HumanMessage(content="Book me a cardiology referral"),
            AIMessage(content="",
                      tool_calls=[ToolCall(name="book",
                                           args={"dept": "cardio"})]),
            ToolMessage(content="booked id=7"),
            AIMessage(content="Referral booked."),
        ],
        reference_tool_calls=[{"name": "book", "args": {"dept": "cardio"}}],
    )
    assert isinstance(s.user_input[1], AIMessage)
    assert s.user_input[1].tool_calls[0].name == "book"
    rep = s.pretty_repr()
    assert "Human: Book me" in rep and "ToolOutput: booked" in rep
    assert "book: {'dept': 'cardio'}" in rep
    assert _run(ToolCallAccuracy(), s, multi=True) == 1.0
    partial = MultiTurnSample(
        user_input=[
            AIMessage(content="", tool_calls=[
                ToolCall(name="book", args={"dept": "cardio", "ts": 1})
            ]),
        ],
        reference_tool_calls=[
            {"name": "book", "args": {"dept": "cardio", "ts": 2}}
        ],
    )
    assert _run(ToolCallAccuracy(), partial, multi=True) == 0.5
    # dict inputs route to the typed classes by role/type
    s2 = MultiTurnSample(user_input=[
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"type": "tool", "content": "out", "role": "tool"},
    ])
    assert isinstance(s2.user_input[0], HumanMessage)
    assert isinstance(s2.user_input[1], AIMessage)
    assert isinstance(s2.user_input[2], ToolMessage)


def test_agent_goal_and_tool_call_accuracy():
    m = AgentGoalAccuracyWithReference(
        llm=FakeJudgeLLM(lambda p: json.dumps({"reason": "r", "achieved": 1}))
    )
    assert _run(m, _convo(), multi=True) == 1.0
    t = ToolCallAccuracy()
    assert _run(t, _convo(), multi=True) == 1.0
    bad = _convo()
    bad.reference_tool_calls = [{"name": "book", "args": {"dept": "neuro"}}]
    assert _run(ToolCallAccuracy(), bad, multi=True) == 0.0


def test_topic_adherence():
    def judge(prompt):
        if "topics the user asked" in prompt:
            return json.dumps({"topics": ["referrals", "weather"]})
        return json.dumps(
            {"verdicts": [{"topic": "referrals", "on_topic": 1},
                          {"topic": "weather", "on_topic": 0}]}
        )

    m = TopicAdherenceScore(llm=FakeJudgeLLM(judge), mode="precision")
    assert _run(m, _convo(), multi=True) == pytest.approx(0.5)


def test_multi_turn_evaluate():
    ds = EvaluationDataset([_convo(), _convo()])
    result = evaluate(
        ds,
        [AgentGoalAccuracyWithReference()],
        llm=FakeJudgeLLM(lambda p: json.dumps({"reason": "r", "achieved": 1})),
        show_progress=False,
    )
    assert result.aggregate()["agent_goal_accuracy"] == 1.0


def test_validation_and_remap():
    rows = remap_column_names(
        [{"question": "q", "answer": "a", "contexts": ["c"],
          "ground_truth": "g"}]
    )
    assert rows[0]["user_input"] == "q"
    ds = EvaluationDataset.from_list(rows)
    from a_nice_rag_tpu.evals.ragas.metrics import Faithfulness

    validate_required_columns(ds, [Faithfulness(llm=FakeJudgeLLM())])
    ds2 = EvaluationDataset.from_list([{"user_input": "q"}])
    with pytest.raises(ValueError, match="requires"):
        validate_required_columns(ds2, [Faithfulness(llm=FakeJudgeLLM())])


def test_analytics_opt_out(tmp_path, monkeypatch):
    from a_nice_rag_tpu.evals.ragas import analytics

    log = str(tmp_path / "events.jsonl")
    monkeypatch.delenv("ANR_DO_NOT_TRACK", raising=False)
    assert analytics.track("evaluate", {"n": 1}, log_path=log)
    monkeypatch.setenv("ANR_DO_NOT_TRACK", "true")
    assert not analytics.track("evaluate", {"n": 2}, log_path=log)
    assert len(open(log).readlines()) == 1


def test_testset_synthesis():
    from a_nice_rag_tpu.evals.ragas.testset import (
        build_knowledge_graph,
        generate_testset,
    )

    def judge(prompt):
        if "Summarize the passage" in prompt:
            return json.dumps(
                {"summary": "s", "themes": ["t"], "entities": ["hypertension"]}
            )
        return json.dumps({"query": "What is recommended?",
                           "reference": "The guideline recommends X."})

    chunks = [
        {"id": f"c{i}", "content": f"passage about hypertension {i}"}
        for i in range(4)
    ]
    llm = FakeJudgeLLM(judge)
    emb = FakeJudgeEmbeddings()
    kg = asyncio.run(build_knowledge_graph(chunks, llm, emb))
    assert len(kg.nodes) == 4
    assert kg.relationships, "shared entities must create relationships"
    ds = asyncio.run(
        generate_testset(chunks, llm, emb, testset_size=5,
                         multi_hop_fraction=0.4)
    )
    assert len(ds) == 5
    assert any(len(s.reference_contexts) == 2 for s in ds.samples)
    assert all(s.user_input and s.reference for s in ds.samples)


def test_genetic_optimizer():
    from a_nice_rag_tpu.evals.ragas.optimizers import optimize_instruction

    llm = FakeJudgeLLM(lambda p: "An improved instruction.")

    async def score_fn(instruction):
        return 0.9 if "improved" in instruction.lower() else 0.3

    result = asyncio.run(
        optimize_instruction(llm, "Base instruction.", score_fn,
                             generations=2, population=3)
    )
    assert result.best_score == pytest.approx(0.9)
    assert "improved" in result.best_instruction.lower()
