"""Run the full RAGAS generation-quality harness end-to-end OFFLINE.

The reference's §6.3 numbers (ragas_results/ragas_evaluation_results.csv)
come from real judge LLMs; API keys are not available in this
environment, so those rows cannot be reproduced bit-for-bit (PARITY.md).
This script is the committed evidence that the ENTIRE pipeline runs:

  NICEQA questions -> RAGSystem.query_rag_stream (offline FakeLLMClient)
  -> EvaluationDataset -> evaluate(Faithfulness, ResponseRelevancy)
  with a deterministic scripted judge -> aggregate CSV,

mirroring the reference's evaluation notebook flow
(notebooks/evaluation.ipynb; src/query_rag.py:434-513 for the answer
collection). The scripted judge is a lexical-overlap stand-in — its
absolute scores are NOT comparable to a real LLM judge and the output
CSV says so in its judge column. Swap in OpenAICompatJudgeLLM + real
keys via evals/run_ragas_eval.py for the real measurement.

Writes results/ragas_evaluation_results_fake_judge.csv.
"""
import csv
import functools
import json
import os
import re
import sys
import time

print = functools.partial(print, flush=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NICEQA = "/root/reference/data/NICEQA.csv"
_INPUT_RE = re.compile(r"Input: (\{.*\})\s*Output:\s*$", re.S)


def _last_input(prompt: str):
    """Parse the structured prompt's trailing 'Input: {...}' JSON (the
    part after 'Now process this input:', skipping few-shot examples)."""
    tail = prompt.rsplit("Now process this input:", 1)[-1]
    m = _INPUT_RE.search(tail)
    return json.loads(m.group(1)) if m else {}


def fake_judge_responder(prompt: str) -> str:
    """Deterministic lexical judge for the two metric prompt families.

    * statement generation -> sentence-split the response;
    * NLI verdicts -> supported iff >=40% of a statement's content
      words appear in the supplied context;
    * question generation (relevancy) -> echo the 'Question: ...' line
      the offline RAG answer carries; noncommittal iff the not-found
      sentence appears.
    """
    data = _last_input(prompt)
    if "statements" in data:  # NLI stage
        ctx = " ".join(data.get("context", "")).lower() \
            if isinstance(data.get("context"), list) \
            else str(data.get("context", "")).lower()
        verdicts = []
        for s in data["statements"]:
            words = [w for w in re.findall(r"[a-z0-9]+", s.lower())
                     if len(w) > 3]
            hit = sum(1 for w in words if w in ctx)
            verdict = 1 if words and hit / len(words) >= 0.4 else 0
            verdicts.append(
                {"statement": s, "reason": "lexical overlap",
                 "verdict": verdict}
            )
        return json.dumps({"verdicts": verdicts})
    if "response" in data and "noncommittal" in prompt:  # question gen
        resp = data["response"]
        m = re.search(r"Question: (.+)", resp)
        noncommittal = int("No relevant NICE guidelines" in resp)
        return json.dumps(
            {"question": m.group(1).strip() if m else resp[:80],
             "noncommittal": noncommittal}
        )
    if "answer" in data or "response" in data:  # statement generation
        text = data.get("answer") or data.get("response") or ""
        # Per the statement prompt's instruction, non-claims (the echoed
        # question line, greetings) are not statements.
        text = re.sub(r"^Question: .*$", "", text, flags=re.M)
        statements = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text)
                      if len(s.strip()) > 12]
        return json.dumps({"statements": statements[:8] or [text[:80]]})
    return "{}"


def fake_rag_llm(messages) -> str:
    """Offline generator: answers with the question echoed (so the
    relevancy round-trip is exact) plus the first context chunk's words
    (so faithfulness verdicts have lexical support)."""
    user = messages[-1]["content"]
    question = user.split("\n\n", 1)[0]
    ctx = user.split("Context from", 1)[-1]
    chunk = " ".join(re.findall(r"[A-Za-z0-9]+", ctx)[:60])
    return (
        f"Question: {question}\n"
        f"According to the supplied NICE guidance, {chunk}."
    )


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from a_nice_rag_tpu.config import InfoSource
    from a_nice_rag_tpu.evals.ragas import EvaluationDataset, evaluate
    from a_nice_rag_tpu.evals.ragas.embeddings import FakeJudgeEmbeddings
    from a_nice_rag_tpu.evals.ragas.llm import FakeJudgeLLM
    from a_nice_rag_tpu.evals.ragas.metrics import (
        Faithfulness,
        ResponseRelevancy,
    )
    from a_nice_rag_tpu.evals.run_ragas_eval import (
        collect_rag_answers,
        load_niceqa_csv,
    )
    from a_nice_rag_tpu.index import build_index
    from a_nice_rag_tpu.rag import RAGSystem
    from a_nice_rag_tpu.rag.providers import FakeLLMClient
    from a_nice_rag_tpu.testing import calibrated_quality_corpus

    t0 = time.time()
    if os.path.exists(NICEQA):
        questions = [r["Question"] for r in load_niceqa_csv(NICEQA)]
        qa_source = "NICEQA.csv (70 real questions)"
    else:
        questions = [f"What does guidance section {i} recommend?"
                     for i in range(20)]
        qa_source = "synthetic fallback questions"
    print(f"questions: {len(questions)} from {qa_source}")

    # Offline corpus: the reference corpus chunks are not mounted, so
    # retrieval runs over the calibrated synthetic corpus — the point
    # here is the harness path, not retrieval quality (that is gated by
    # the synthetic retrieval sweep).
    c = calibrated_quality_corpus(
        n_docs=2048, dim=128, n_queries=8, vocab_size=8000, seed=42
    )
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens, urls=c.urls,
    )

    class _HashEmbedder:
        """Deterministic offline query embedder (model-keyed)."""

        model = "voyage-3-large"

        def embed_queries(self, texts):
            rng_rows = [
                np.random.default_rng(abs(hash(t)) % (2**32))
                .standard_normal(128).astype(np.float32)
                for t in texts
            ]
            v = np.stack(rng_rows)
            return v / np.linalg.norm(v, axis=-1, keepdims=True)

    rag = RAGSystem(
        indexes={InfoSource.NICE: idx},
        embedder=_HashEmbedder(),
        llm_clients={"openai": FakeLLMClient(responder=fake_rag_llm)},
    )
    rows = collect_rag_answers(
        rag, questions, "gpt-4.1-mini", use_reranker=False
    )
    print(f"collected {len(rows)} answers in {time.time()-t0:.1f}s")

    result = evaluate(
        EvaluationDataset.from_list(rows),
        [Faithfulness(), ResponseRelevancy()],
        llm=FakeJudgeLLM(fake_judge_responder),
        embeddings=FakeJudgeEmbeddings(),
        show_progress=False,
    )
    agg = result.aggregate()
    print("aggregate:", {k: round(v, 4) for k, v in agg.items()})

    out = os.path.join(
        os.path.dirname(__file__), "..", "results",
        "ragas_evaluation_results_fake_judge.csv",
    )
    with open(out, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(
            ["llm_model", "embedding_model", "num_chunks",
             "evaluation_llm", "n_questions", "answer_relevancy",
             "faithfulness"]
        )
        w.writerow(
            ["FakeLLMClient(offline)", "hash-embedder(offline)", 10,
             "FakeJudgeLLM(lexical-overlap; NOT a real judge)",
             len(questions),
             f"{agg.get('answer_relevancy', float('nan')):.4f}",
             f"{agg.get('faithfulness', float('nan')):.4f}"]
        )
    print(f"wrote {os.path.normpath(out)} in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
