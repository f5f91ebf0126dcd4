"""Cross-seed fuzz: hybrid engine vs golden pipeline on varied corpora."""

import numpy as np
import pytest

from a_nice_rag_tpu.index import build_index
from a_nice_rag_tpu.retrieval import SearchEngine
from a_nice_rag_tpu.testing import (
    GoldenBm25Okapi,
    golden_dense_top_k,
    golden_wrrf,
    synth_corpus,
)


@pytest.mark.parametrize("seed,n_docs,dim", [(301, 130, 24), (302, 257, 40),
                                             (303, 77, 16)])
def test_hybrid_engine_fuzz(seed, n_docs, dim):
    c = synth_corpus(n_docs=n_docs, dim=dim, n_queries=6, seed=seed,
                     vocab_size=200)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    eng = SearchEngine(idx)
    weights = {"voyage-3-large": 3.0, "BM25": 1.0}
    k = min(9, n_docs)
    got = eng.retrieve(
        query_embeddings={"voyage-3-large": c.query_embeddings["voyage-3-large"]},
        query_token_lists=c.query_tokens,
        model_weights=weights,
        similarity_k=k,
        common_sections_n=k,
        wrrf_k=50.0,
        use_hybrid_search=True,
    )
    golden_bm25 = GoldenBm25Okapi(c.tokens)
    emb = c.embeddings["voyage-3-large"]
    for b in range(6):
        _, d_idx = golden_dense_top_k(emb, c.query_embeddings["voyage-3-large"][b], k)
        scores = golden_bm25.get_scores(c.query_tokens[b])
        b_idx = np.argsort(scores)[::-1][:k]
        if scores[b_idx[-1]] <= 0:
            continue  # zero-score tail makes tie order unspecified
        fused = golden_wrrf(
            [([c.ids[i] for i in d_idx], "voyage-3-large"),
             ([c.ids[i] for i in b_idx], "BM25")],
            weights, k=50,
        )
        assert set(got[b]) == {sid for sid, _ in fused[:k]}
