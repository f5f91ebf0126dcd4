"""RetrievalEvaluationSystem facade, failure recovery, multimodal/HHEM
metrics, ingestion pipeline CLI."""

import asyncio
import json
import os

import jax
import numpy as np
import pytest

from a_nice_rag_tpu.config import InfoSource
from a_nice_rag_tpu.evals.ragas import FakeJudgeLLM, RunConfig
from a_nice_rag_tpu.evals.ragas.dataset import SingleTurnSample
from a_nice_rag_tpu.evals.ragas.metrics import (
    FaithfulnesswithHHEM,
    MultiModalFaithfulness,
)
from a_nice_rag_tpu.index import build_index
from a_nice_rag_tpu.retrieval.eval_system import RetrievalEvaluationSystem
from a_nice_rag_tpu.testing import golden_dense_top_k, synth_corpus


@pytest.fixture(scope="module")
def setup():
    c = synth_corpus(n_docs=200, dim=32, n_queries=8, seed=151)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    return c, idx


def test_retrieval_evaluation_system(setup):
    c, idx = setup
    sys_ = RetrievalEvaluationSystem(indexes={InfoSource.NICE: idx})
    ids = sys_.retrieve_documents(
        query_embeddings={
            "voyage-3-large": c.query_embeddings["voyage-3-large"][0]
        },
        query_tokens=c.query_tokens[0],
        model_weights={"voyage-3-large": 5.0, "BM25": 1.0},
        use_hybrid_search=True,
        use_reranker=False,
        similarity_k=20,
        common_sections_n=10,
    )
    assert len(ids) == 10
    assert c.gold_ids[0] in ids
    with pytest.raises(ValueError, match="cannot be empty"):
        sys_.retrieve_documents(query_embeddings={})
    assert sys_.retrieve_documents(
        query_embeddings={"voyage-3-large": c.query_embeddings["voyage-3-large"][0]},
        info_source="NICE",
        model_weights={"voyage-3-large": 1.0},
        use_reranker=False,
    )


def test_reshard_surviving(setup):
    from a_nice_rag_tpu.parallel import make_mesh, shard_index
    from a_nice_rag_tpu.parallel.sharded import (
        reshard_surviving,
        sharded_dense_top_k,
    )

    c, idx = setup
    mesh = make_mesh(shape=(1, 4), axis_names=("dp", "corpus"),
                     devices=jax.devices()[:4])
    sidx = shard_index(idx, mesh)
    # "Lose" two devices; recover on the other two.
    survivors = [jax.devices()[0], jax.devices()[2]]
    sidx2 = reshard_surviving(sidx, survivors)
    assert sidx2.n_shards == 2
    q = c.query_embeddings["voyage-3-large"][:2]
    vals, rows = sharded_dense_top_k(sidx2, "voyage-3-large", q, 10)
    for b in range(2):
        _, g_idx = golden_dense_top_k(
            c.embeddings["voyage-3-large"], q[b], 10
        )
        np.testing.assert_array_equal(rows[b], g_idx)


def test_multimodal_faithfulness_and_hhem(setup):
    m = MultiModalFaithfulness(
        llm=FakeJudgeLLM(lambda p: json.dumps({"reason": "r", "verdict": 1}))
    )
    m.init(RunConfig())
    s = SingleTurnSample(
        user_input="q",
        response="a",
        retrieved_contexts=["text ctx", "https://example.org/scan.png"],
    )
    assert asyncio.run(m.single_turn_ascore(s)) == 1.0
    # The rendered prompt should mark the image.
    assert "![image](https://example.org/scan.png)" in m.llm.prompts[-1]

    def judge(prompt):
        return json.dumps({"statements": ["s1", "s2"]})

    scores = {"s1": 0.9, "s2": 0.1}
    hhem = FaithfulnesswithHHEM(
        llm=FakeJudgeLLM(judge),
        nli_scorer=lambda premise, hyp: scores[hyp],
    )
    hhem.init(RunConfig())
    assert asyncio.run(hhem.single_turn_ascore(s)) == 0.5
    with pytest.raises(ValueError, match="nli_scorer"):
        FaithfulnesswithHHEM(llm=FakeJudgeLLM())


def test_ingest_pipeline_cli(tmp_path):
    from a_nice_rag_tpu.ingest.run_pipeline import main
    from a_nice_rag_tpu.ingest.xml_to_md import convert_file

    # Seed an XML file, then run convert -> chunk -> preprocess.
    xml_dir = os.path.join(tmp_path, "xml")
    os.makedirs(xml_dir)
    xml = (
        "<Guidance><Title>Test guideline</Title>"
        "<GuidanceNumber>NG1</GuidanceNumber><Chapters><Chapter>"
        "<Title>Recommendations</Title><Content><![CDATA[<p>"
        + "Patients with diabetes need reviews. " * 30
        + "</p>]]></Content></Chapter></Chapters></Guidance>"
    )
    with open(os.path.join(xml_dir, "NG1_structured_document.xml"), "w") as f:
        f.write(xml)
    main([
        "--workdir", str(tmp_path),
        "--stages", "convert,chunk,preprocess",
        "--max-tokens", "200", "--min-tokens", "20",
    ])
    assert os.path.exists(os.path.join(tmp_path, "md", "NG1_structured_document.md"))
    chunks = json.load(open(os.path.join(tmp_path, "chunked_guidelines.json")))
    assert chunks and chunks[0]["source"] == "NG1"
    assert os.path.exists(os.path.join(tmp_path, "chunks_bm25.csv"))
