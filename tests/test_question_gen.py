"""Question generation, RAGAS runner plumbing, and corpus stats."""

import os
import sqlite3

import numpy as np

from a_nice_rag_tpu.evals.question_gen import (
    embed_and_store_queries,
    filter_chunks,
    generate_questions,
    write_query_db,
)
from a_nice_rag_tpu.evals.run_ragas_eval import (
    collect_rag_answers,
    score_rows,
)
from a_nice_rag_tpu.index.io import load_reference_query_db
from a_nice_rag_tpu.rag import FakeLLMClient
from a_nice_rag_tpu.utils.corpus_stats import corpus_stats


def _chunks():
    return [
        {"title": "NG1_Recommendations", "source": "NG1",
         "content": "x" * 200},
        {"title": "NG1_Committee discussion", "source": "NG1",
         "content": "y" * 200},  # boilerplate title
        {"title": "QS9_Something", "source": "QS9", "content": "z" * 200},
        {"title": "CG2_Short", "source": "CG2", "content": "tiny"},
        {"title": "CG2_Appendix B", "source": "CG2", "content": "w" * 200},
        {"title": "CG2_Treatment", "source": "CG2", "content": "t" * 200},
    ]


def test_filter_chunks():
    kept = filter_chunks(_chunks())
    assert [c["title"] for c in kept] == ["NG1_Recommendations", "CG2_Treatment"]


def test_generate_and_store_queries(tmp_path):
    kept = filter_chunks(_chunks())
    client = FakeLLMClient(lambda msgs: "What does the guideline say?")
    rows = generate_questions(kept, client, max_workers=2)
    assert len(rows) == 2
    assert rows[0]["query"].startswith("What")

    class TinyEmbedder:
        def embed_queries(self, texts):
            return np.ones((len(texts), 8), np.float32)

    tmpl = os.path.join(tmp_path, "{model}_queries.db")
    embed_and_store_queries(rows, {"tiny": TinyEmbedder()}, tmpl)
    ids, texts, emb = load_reference_query_db(tmpl.format(model="tiny"))
    assert ids == [r["id"] for r in rows]
    assert emb.shape == (2, 8)


def test_write_query_db_null_embeddings(tmp_path):
    db = os.path.join(tmp_path, "q.db")
    write_query_db(db, [{"id": "a", "query": "q"}])
    conn = sqlite3.connect(db)
    rows = conn.execute("SELECT id, query_embedding FROM queries").fetchall()
    conn.close()
    assert rows == [("a", None)]


def test_collect_and_score_rag_answers():
    import json

    from a_nice_rag_tpu.config import InfoSource
    from a_nice_rag_tpu.evals.ragas import FakeJudgeEmbeddings, FakeJudgeLLM
    from a_nice_rag_tpu.index import build_index
    from a_nice_rag_tpu.rag import RAGSystem
    from a_nice_rag_tpu.retrieval.embed import PrecomputedEmbedder
    from a_nice_rag_tpu.testing import synth_corpus

    c = synth_corpus(n_docs=100, dim=16, n_queries=2, seed=101)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    questions = ["what about q0?", "what about q1?"]
    table = {
        q: c.query_embeddings["voyage-3-large"][i]
        for i, q in enumerate(questions)
    }
    rag = RAGSystem(
        indexes={InfoSource.NICE: idx},
        embedder=PrecomputedEmbedder(table),
        llm_clients={"fake": FakeLLMClient(lambda m: "An answer.")},
    )
    rows = collect_rag_answers(rag, questions, "fake-llm", use_reranker=False)
    assert len(rows) == 2
    assert rows[0]["response"] == "An answer."
    assert len(rows[0]["retrieved_contexts"]) > 1

    def judge(prompt):
        if "self-contained statements" in prompt or "Decompose" in prompt:
            return json.dumps({"statements": ["s"]})
        if "verdicts" in prompt or "Judge each clinical statement" in prompt:
            return json.dumps(
                {"verdicts": [{"statement": "s", "reason": "r", "verdict": 1}]}
            )
        return json.dumps({"question": "what about q0?", "noncommittal": 0})

    result = score_rows(
        rows, FakeJudgeLLM(judge), FakeJudgeEmbeddings(), show_progress=False
    )
    agg = result.aggregate()
    assert agg["faithfulness"] == 1.0
    assert 0.0 <= agg["answer_relevancy"] <= 1.0


def test_corpus_stats():
    stats = corpus_stats(_chunks())
    assert stats["n_chunks"] == 6
    assert stats["n_guidelines"] == 3
    assert stats["per_guideline"]["CG2"]["chunks"] == 3
