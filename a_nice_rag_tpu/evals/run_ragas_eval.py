"""End-to-end generation-quality evaluation runner.

Equivalent of the reference's evaluation notebook
(notebooks/evaluation.ipynb): run the RAG system over a QA set (the
70-question NICEQA CSV format: Guideline ID, Section, Question), collect
answers + retrieved contexts, score with Faithfulness + ResponseRelevancy
(judge LLM + judge embeddings), and write per-sample and aggregate CSVs.
Also supports the LLM-only baseline (no retrieval) for the comparison
rows in BASELINE.md.
"""

from __future__ import annotations

import argparse
import csv
import logging
import os
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


def load_niceqa_csv(path: str) -> List[Dict]:
    with open(path, "r", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def collect_rag_answers(
    rag_system,
    questions: List[str],
    llm_model: str,
    model_weights: Optional[Dict[str, float]] = None,
    use_hybrid_search: bool = True,
    use_reranker: bool = True,
    reranker_top_k: int = 10,
) -> List[Dict]:
    """Run each question through query_rag_stream; returns evaluation rows
    (user_input, response, retrieved_contexts)."""
    rows = []
    for q in questions:
        chunks, raw = [], ""
        for chunk, _, raw, _ in rag_system.query_rag_stream(
            q,
            llm_model,
            model_weights=model_weights,
            use_hybrid_search=use_hybrid_search,
            use_reranker=use_reranker,
            reranker_top_k=reranker_top_k,
        ):
            chunks.append(chunk)
        contexts = raw.split("\n\n--- Context Chunk ---\n\n") if raw else []
        rows.append(
            {
                "user_input": q,
                "response": "".join(chunks),
                "retrieved_contexts": contexts,
            }
        )
    return rows


def collect_baseline_answers(
    chat_client, questions: List[str], llm_model: str
) -> List[Dict]:
    """LLM-only baseline: no retrieval, question asked directly."""
    rows = []
    for q in questions:
        text = "".join(
            chat_client.stream_chat(
                llm_model, [{"role": "user", "content": q}], temperature=0
            )
        )
        rows.append(
            {"user_input": q, "response": text, "retrieved_contexts": [""]}
        )
    return rows


def score_rows(
    rows: List[Dict],
    judge_llm,
    judge_embeddings,
    metrics: Optional[List] = None,
    show_progress: bool = True,
):
    from a_nice_rag_tpu.evals.ragas import EvaluationDataset, evaluate
    from a_nice_rag_tpu.evals.ragas.metrics import (
        Faithfulness,
        ResponseRelevancy,
    )

    dataset = EvaluationDataset.from_list(rows)
    metrics = metrics or [Faithfulness(), ResponseRelevancy()]
    return evaluate(
        dataset,
        metrics,
        llm=judge_llm,
        embeddings=judge_embeddings,
        show_progress=show_progress,
    )


def write_results_csv(
    result, llm_model: str, output: str, per_sample_output: Optional[str] = None
) -> None:
    agg = result.aggregate()
    exists = os.path.exists(output)
    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    with open(output, "a", encoding="utf-8", newline="") as f:
        writer = csv.writer(f)
        if not exists:
            writer.writerow(["llm_model"] + list(agg.keys()))
        writer.writerow([llm_model] + [f"{v:.4f}" for v in agg.values()])
    if per_sample_output:
        result.to_pandas().to_csv(per_sample_output, index=False)


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--qa-csv", required=True, help="NICEQA-format CSV")
    p.add_argument("--question-column", default="Question")
    p.add_argument("--llm-model", default="gpt-4.1-mini")
    p.add_argument("--judge-model", default="gpt-4.1-mini")
    p.add_argument("--baseline", action="store_true", help="LLM-only, no RAG")
    p.add_argument("--output", default="results/ragas_evaluation_results.csv")
    p.add_argument("--per-sample-output", default=None)
    args = p.parse_args(argv)

    from a_nice_rag_tpu.evals.ragas.llm import OpenAICompatJudgeLLM
    from a_nice_rag_tpu.evals.ragas.embeddings import EmbedderJudgeEmbeddings
    from a_nice_rag_tpu.rag import RAGSystem, build_default_clients
    from a_nice_rag_tpu.retrieval.embed import OpenAIEmbedder

    questions = [
        r[args.question_column] for r in load_niceqa_csv(args.qa_csv)
    ]
    judge = OpenAICompatJudgeLLM(model=args.judge_model)
    judge_emb = EmbedderJudgeEmbeddings(
        OpenAIEmbedder(model="text-embedding-3-small")
    )
    if args.baseline:
        clients = build_default_clients()
        rows = collect_baseline_answers(
            clients["openai"], questions, args.llm_model
        )
    else:
        rows = collect_rag_answers(RAGSystem(), questions, args.llm_model)
    result = score_rows(rows, judge, judge_emb)
    write_results_csv(
        result, args.llm_model, args.output, args.per_sample_output
    )
    print(result)


if __name__ == "__main__":
    main()
