"""Third-party integration adapters (dependency-free paths)."""

import asyncio
import json
import types

import pytest

from a_nice_rag_tpu.evals.ragas.dataset import EvaluationDataset, SingleTurnSample
from a_nice_rag_tpu.evals.ragas.integrations import (
    EvaluatorChain,
    bedrock_to_messages,
    evaluate_query_engine,
    langgraph_to_messages,
    rag_context_to_dataset,
    swarm_to_messages,
    transform_to_ragas_dataset,
)


def test_swarm_converter_tool_calls():
    msgs = swarm_to_messages(
        [
            {"role": "user", "content": "weather in london?"},
            {
                "role": "assistant",
                "content": None,
                "tool_calls": [
                    {
                        "function": {
                            "name": "get_weather",
                            "arguments": json.dumps({"city": "london"}),
                        }
                    }
                ],
            },
            {"role": "tool", "content": "rainy, 12C"},
            {"role": "assistant", "content": "It is rainy, 12C."},
        ]
    )
    roles = [m.role for m in msgs]
    assert roles == ["human", "ai", "tool", "ai"]
    # Typed channel (reference ragas_modified/messages.py:82-134): the
    # assistant turn carries structured ToolCall objects.
    tc = msgs[1].tool_calls[0]
    assert tc.name == "get_weather"
    assert tc.args == {"city": "london"}


def test_langgraph_converter_duck_typed():
    human = types.SimpleNamespace(type="human", content="hi", tool_calls=None)
    ai = types.SimpleNamespace(
        type="ai",
        content="calling tool",
        tool_calls=[{"name": "lookup", "args": {"q": "x"}}],
    )
    tool = types.SimpleNamespace(type="tool", content="result", tool_calls=None)
    msgs = langgraph_to_messages([human, ai, tool])
    assert [m.role for m in msgs] == ["human", "ai", "tool"]
    assert msgs[1].tool_calls[0].name == "lookup"
    assert msgs[1].content == "calling tool"


def test_r2r_transform():
    resp = {
        "results": {
            "generated_answer": "42",
            "search_results": {
                "chunk_search_results": [{"text": "chunk a"}, {"text": "chunk b"}],
                "web_search_results": [{"snippet": "web c"}],
            },
        }
    }
    ds = transform_to_ragas_dataset(["q1"], [resp], references=["ref"])
    s = ds.samples[0]
    assert s.user_input == "q1" and s.response == "42"
    assert s.retrieved_contexts == ["chunk a", "chunk b", "web c"]
    assert s.reference == "ref"


def test_r2r_warns_on_unsupported_results():
    resp = {
        "results": {
            "generated_answer": "x",
            "search_results": {
                "graph_search_results": [{"x": 1}],
                "chunk_search_results": [{"text": "t"}],
            },
        }
    }
    with pytest.warns(UserWarning):
        transform_to_ragas_dataset(["q"], [resp])


def test_evaluator_chain_key_remapping():
    class FakeMetric:
        name = "fake_score"

        async def _single_turn_ascore(self, sample):
            assert sample.user_input == "q"
            assert sample.response == "a"
            assert sample.retrieved_contexts == ["c1"]
            return 0.5

    doc = types.SimpleNamespace(page_content="c1")
    chain = EvaluatorChain(FakeMetric())
    out = chain({"question": "q", "result": "a", "source_documents": [doc]})
    assert out == {"fake_score": 0.5}


def test_llama_index_evaluate_duck_typed():
    from a_nice_rag_tpu.evals.ragas.metrics import ExactMatch

    class FakeEngine:
        async def aquery(self, q):
            node = types.SimpleNamespace(
                node=types.SimpleNamespace(text=f"ctx for {q}")
            )
            return types.SimpleNamespace(
                response=f"answer to {q}", source_nodes=[node]
            )

    ds = EvaluationDataset(
        samples=[
            SingleTurnSample(user_input="q1", reference="answer to q1"),
            SingleTurnSample(user_input="q2", reference="answer to q2"),
        ]
    )
    result = evaluate_query_engine(FakeEngine(), ds, [ExactMatch()])
    scores = [row["exact_match"] for row in result.scores]
    assert scores == [1.0, 1.0]


def test_griptape_rag_context():
    ctx = types.SimpleNamespace(
        query="what?",
        outputs=[types.SimpleNamespace(to_text=lambda: "the answer")],
        text_chunks=["c1", "c2"],
    )
    ds = rag_context_to_dataset([ctx])
    assert ds.samples[0].response == "the answer"
    assert ds.samples[0].retrieved_contexts == ["c1", "c2"]


def test_bedrock_trace_extraction():
    traces = [
        {
            "trace": {
                "orchestrationTrace": {
                    "modelInvocationInput": {
                        "text": json.dumps(
                            {
                                "messages": [
                                    {"role": "user", "content": "hello"},
                                    {"role": "assistant", "content": "hi"},
                                    {"role": "user", "content": "pending"},
                                ]
                            }
                        )
                    }
                }
            }
        },
        {
            "trace": {
                "orchestrationTrace": {
                    "observation": {"finalResponse": {"text": "final answer"}}
                }
            }
        },
    ]
    msgs = bedrock_to_messages(traces)
    assert [m.role for m in msgs] == ["human", "ai", "ai"]
    assert msgs[-1].content == "final answer"


def test_bedrock_kb_trace_groups():
    from a_nice_rag_tpu.evals.ragas.integrations.amazon_bedrock import (
        extract_kb_trace,
    )

    traces = [
        {
            "trace": {
                "orchestrationTrace": {
                    "invocationInput": {
                        "invocationType": "KNOWLEDGE_BASE",
                        "knowledgeBaseLookupInput": {"text": "kb question"},
                    }
                }
            }
        },
        {
            "trace": {
                "orchestrationTrace": {
                    "observation": {
                        "knowledgeBaseLookupOutput": {
                            "retrievedReferences": [
                                {"content": {"text": "ref text"}}
                            ]
                        }
                    }
                }
            }
        },
        {
            "trace": {
                "orchestrationTrace": {
                    "observation": {"finalResponse": {"text": "kb answer"}}
                }
            }
        },
    ]
    groups = extract_kb_trace(traces)
    assert groups == [
        {
            "user_input": "kb question",
            "retrieved_contexts": ["ref text"],
            "response": "kb answer",
        }
    ]


def test_gated_adapters_raise_actionable_errors():
    from a_nice_rag_tpu.evals.ragas.integrations import langsmith, opik
    from a_nice_rag_tpu.evals.ragas.integrations.helicone import (
        HeliconeSingleton,
    )

    with pytest.raises(ImportError, match="langsmith"):
        langsmith.upload_dataset(
            EvaluationDataset(samples=[SingleTurnSample(user_input="q")]),
            "ds",
        )
    with pytest.raises(ImportError, match="opik"):
        opik.OpikTracer()
    cfg = HeliconeSingleton(api_key="k")
    assert cfg.default_headers()["Helicone-Auth"] == "Bearer k"
    assert cfg.judge_base_url().endswith("/v1/")
