"""Run the GP-EI BM25 hyperparameter sweep on a synthetic corpus.

Reference parity flow (src/processing/bm25_test.py): 50 calls /
10 initial / seed 42 over k1, b, epsilon, tokenization, maximizing
validation Recall@15, then one final test-set evaluation of the best
config. Writes results/bm25_optimization_results_synthetic.csv (same
role as the reference's results/bm25_optimization_results.csv).
"""
import csv
import functools
import os
import sys

print = functools.partial(print, flush=True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from a_nice_rag_tpu.ingest.bm25_tune import tune_bm25
    from a_nice_rag_tpu.testing import synth_corpus

    c = synth_corpus(
        n_docs=2048, dim=32, n_queries=512, vocab_size=4000, seed=42
    )
    rows = [
        {"id": i_, "content": " ".join(toks), "tokens_regular": toks,
         "tokens_lemmatized": toks}
        for i_, toks in zip(c.ids, c.tokens)
    ]
    n_val = 128
    q = {"regular": c.query_tokens, "lemmatized": c.query_tokens}
    val_q = {k: v[:n_val] for k, v in q.items()}
    test_q = {k: v[n_val:] for k, v in q.items()}

    res = tune_bm25(
        rows,
        val_q,
        c.gold_ids[:n_val],
        test_query_tokens=test_q,
        test_gold_ids=c.gold_ids[n_val:],
        n_calls=50,
        n_initial=10,
        seed=42,
    )
    print("best:", res.best_params, "val R@15:", round(res.best_score, 4))

    out = os.path.join(
        os.path.dirname(__file__), "..", "results",
        "bm25_optimization_results_synthetic.csv",
    )
    keys = sorted({k for h in res.history for k in h})
    with open(out, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        for h in res.history:
            w.writerow({k: h.get(k, "") for k in keys})
    print("wrote", out, f"({len(res.history)} rows)")


if __name__ == "__main__":
    main()
