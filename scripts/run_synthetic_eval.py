"""Run the full 9-configuration retrieval evaluation on a synthetic
corpus at reference scale.

The reference's quality CSVs (results/retrieval_evaluation_results.csv)
cannot be replayed bit-for-bit here — its embedding DBs and corpus
chunks are not in the mounted data — so this sweep demonstrates the
harness end-to-end on a synthetic corpus with the same shape: ~9.7k
docs, four dense models, BM25, the same nine configurations
(src/retrieval_eval.py:131-255 parity), seed-42 split, CSV append.
Reranker configs run through the order-preserving IdentityReranker
(mechanism coverage; the on-TPU cross-encoder is untrained here).

Writes results/retrieval_evaluation_results_synthetic.csv.
"""
import functools
import os
import sys

print = functools.partial(print, flush=True)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax

    from a_nice_rag_tpu.evals.retrieval_eval import (
        STANDARD_CONFIGURATIONS,
        RetrievalEvaluator,
        seed42_split,
    )
    from a_nice_rag_tpu.index import build_index
    from a_nice_rag_tpu.retrieval import SearchEngine
    from a_nice_rag_tpu.retrieval.rerank import IdentityReranker
    from a_nice_rag_tpu.testing import calibrated_quality_corpus

    print("platform:", jax.devices()[0].platform)
    models = [
        "voyage-3-large", "voyage-3.5", "text-embedding-3-large", "Qwen3",
    ]
    # Calibrated per-model noise reproduces the reference's qualitative
    # quality structure (dense spread, dense > BM25, fusion lifts) —
    # see testing.synth.REFERENCE_QUALITY_NOISE and tests/test_quality_gate.py.
    c = calibrated_quality_corpus(
        n_docs=9728, dim=256, n_queries=2048, vocab_size=20000, seed=42,
    )
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    ev = RetrievalEvaluator(
        idx, SearchEngine(idx, reranker=IdentityReranker())
    )
    # The reference evaluates the LARGER seed-42 partition
    # (src/retrieval_eval.py:273-274, :338).
    eval_idx, _ = seed42_split(len(c.gold_ids))
    q_embs = {m: c.query_embeddings[m][eval_idx] for m in models}
    gold = [c.gold_ids[i] for i in eval_idx]
    tokens = [c.query_tokens[i] for i in eval_idx]

    out = os.path.join(
        os.path.dirname(__file__), "..", "results",
        "retrieval_evaluation_results_synthetic.csv",
    )
    results = ev.run(
        STANDARD_CONFIGURATIONS,
        q_embs,
        gold,
        query_token_lists=tokens,
        query_texts=[f"query {i}" for i in eval_idx],
        filename_type_filter=None,
        output_csv=out,
    )
    for name, m in results.items():
        print(f"{name:45s} MRR={m['mrr']:.3f} R@1={m['recall@1']:.3f} "
              f"R@10={m['recall@10']:.3f}")


if __name__ == "__main__":
    main()
