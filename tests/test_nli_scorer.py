"""NLI fine-tune recipe -> local FaithfulnesswithHHEM scorer."""

import asyncio
import json

import numpy as np
import pytest

from a_nice_rag_tpu.models.encoder import EncoderConfig
from a_nice_rag_tpu.models.nli import (
    nli_scorer_for_corpus,
    synth_nli_pairs,
)

DOCS = [
    "Offer lifestyle advice to adults with hypertension. Blood pressure "
    "should be measured in both arms at diagnosis. Treatment with ACE "
    "inhibitors is recommended for adults under 55 years.",
    "Methotrexate is the first-line DMARD for rheumatoid arthritis. "
    "Folic acid supplementation reduces methotrexate toxicity. Monitor "
    "full blood count every 2 weeks until the dose is stable.",
    "Children with asthma should have a personalised action plan. "
    "Inhaled corticosteroids are the preferred preventer therapy. Review "
    "inhaler technique at every asthma consultation.",
    "Statins are recommended for the primary prevention of "
    "cardiovascular disease. Atorvastatin 20 mg is the usual starting "
    "dose. Liver function should be checked before starting treatment.",
    "Antibiotic prophylaxis is not routinely recommended for dental "
    "procedures. Amoxicillin remains the first choice for "
    "community-acquired pneumonia. Review antibiotic treatment after 48 "
    "hours of therapy.",
    "Screen all pregnant women for gestational diabetes risk factors. "
    "An oral glucose tolerance test is offered at 24 to 28 weeks. "
    "Metformin can be used when lifestyle changes are insufficient.",
]


def test_synth_pairs_shapes_and_balance():
    prem, hyp, lab = synth_nli_pairs(DOCS, n_pairs=64, seed=1)
    assert len(prem) == len(hyp) == len(lab) == 64
    assert 0.25 <= lab.mean() <= 0.75  # roughly balanced by construction


@pytest.fixture(scope="module")
def trained():
    return nli_scorer_for_corpus(
        DOCS,
        n_pairs=256,
        seed=0,
        cfg=EncoderConfig(n_layers=2, dim=128, max_len=192),
        epochs=6,
        batch_size=32,
    )


@pytest.mark.slow
def test_nli_training_separates_entailment(trained):
    assert trained.losses[-1] < trained.losses[0]
    assert trained.holdout_auc > 0.7, trained.holdout_auc

    scorer = trained.scorer
    premise = DOCS[0]
    entailed = "Blood pressure should be measured in both arms at diagnosis."
    drifted = "Inhaled corticosteroids are the preferred preventer therapy."
    assert scorer(premise, entailed) > scorer(premise, drifted)


@pytest.mark.slow
def test_hhem_metric_with_trained_scorer(trained):
    from a_nice_rag_tpu.evals.ragas.dataset import SingleTurnSample
    from a_nice_rag_tpu.evals.ragas.llm import FakeJudgeLLM
    from a_nice_rag_tpu.evals.ragas.metrics.multimodal import (
        FaithfulnesswithHHEM,
    )

    def statement_judge(prompt):
        # statement generation: echo the answer's sentences
        data = json.loads(prompt[prompt.rfind("Input:") + 6 :].strip().split(
            "\nOutput:")[0])
        sents = [s.strip() + "." for s in data["answer"].split(".") if s.strip()]
        return json.dumps({"statements": sents})

    metric = FaithfulnesswithHHEM(
        llm=FakeJudgeLLM(statement_judge),
        nli_scorer=trained.scorer,
        threshold=0.5,
    )
    faithful = SingleTurnSample(
        user_input="How should blood pressure be measured?",
        response="Blood pressure should be measured in both arms at "
        "diagnosis. Treatment with ACE inhibitors is recommended for "
        "adults under 55 years.",
        retrieved_contexts=[DOCS[0]],
    )
    unfaithful = SingleTurnSample(
        user_input="How should blood pressure be measured?",
        response="Inhaled corticosteroids are the preferred preventer "
        "therapy. Metformin can be used when lifestyle changes are "
        "insufficient.",
        retrieved_contexts=[DOCS[0]],
    )
    s_faithful = asyncio.run(metric._single_turn_ascore(faithful))
    s_unfaithful = asyncio.run(metric._single_turn_ascore(unfaithful))
    assert s_faithful > s_unfaithful
