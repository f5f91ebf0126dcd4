"""End-to-end CLI test: reference-format query DBs + artifact ->
run_retrieval_eval main() -> results CSV."""

import os
import sqlite3

import numpy as np

from a_nice_rag_tpu.evals.run_ragas_eval import load_niceqa_csv
from a_nice_rag_tpu.index import build_index, save_index
from a_nice_rag_tpu.ingest.bm25_build import write_tokens_csv
from a_nice_rag_tpu.testing import synth_corpus


def _write_query_db(path, ids, queries, emb):
    conn = sqlite3.connect(path)
    conn.execute(
        "CREATE TABLE queries (id TEXT, query TEXT, query_embedding BLOB)"
    )
    for i, qid in enumerate(ids):
        conn.execute(
            "INSERT INTO queries VALUES (?,?,?)",
            (qid, queries[i], emb[i].astype(np.float32).tobytes()),
        )
    conn.commit()
    conn.close()


def test_run_retrieval_eval_cli(tmp_path):
    from a_nice_rag_tpu.evals.run_retrieval_eval import main

    c = synth_corpus(n_docs=200, dim=32, n_queries=40, seed=171)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    artifact = os.path.join(tmp_path, "artifact")
    save_index(idx, artifact)

    qdb = os.path.join(tmp_path, "queries.db")
    _write_query_db(
        qdb, c.gold_ids, [f"q {i}" for i in range(40)],
        c.query_embeddings["voyage-3-large"],
    )
    tokens_csv = os.path.join(tmp_path, "q_tokens.csv")
    write_tokens_csv(
        [
            {"id": c.gold_ids[i], "source": "x", "content": "",
             "tokens_regular": c.query_tokens[i],
             "tokens_lemmatized": c.query_tokens[i]}
            for i in range(40)
        ],
        tokens_csv,
    )
    out_csv = os.path.join(tmp_path, "results.csv")
    main([
        "--index", artifact,
        "--queries-db", f"voyage-3-large={qdb}",
        "--bm25-queries", tokens_csv,
        "--output", out_csv,
        "--filter", "",
        "--no-split",
    ])
    lines = open(out_csv).read().strip().splitlines()
    assert lines[0].startswith("Model,MRR")
    names = [line.split(",")[0] for line in lines[1:]]
    # Non-rerank standard configs that have data available should report:
    # voyage-3-large dense, BM25, hybrid. Configs for missing models are
    # expected to fail-soft (no row).
    assert "Voyage-3-Large" in names
    assert "BM25" in names
    assert "Voyage-3-Large + BM25" in names
    row = dict(zip(lines[0].split(","), lines[1 + names.index("Voyage-3-Large")].split(",")))
    assert float(row["MRR"]) > 0.5  # planted golds must be findable


def test_load_niceqa_csv_against_reference_asset():
    path = "/root/reference/data/NICEQA.csv"
    if not os.path.exists(path):
        return
    rows = load_niceqa_csv(path)
    assert len(rows) == 70
    assert "Question" in rows[0]
