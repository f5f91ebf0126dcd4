"""One-command §6.1 replay tested end to end on generated
reference-format fixtures (chunk DBs + BM25 pickle + query DBs + token
CSV): import -> artifact -> 9-config sweep -> CSV."""

import csv
import os

import numpy as np

from a_nice_rag_tpu.evals.replay_reference import main as replay_main
from a_nice_rag_tpu.testing import synth_corpus
from a_nice_rag_tpu.testing.reference_fixture import write_reference_fixture

MODELS = ["voyage-3-large", "voyage-3.5", "text-embedding-3-large", "Qwen3"]


def test_replay_reference_end_to_end(tmp_path):
    c = synth_corpus(n_docs=900, dim=48, n_queries=60, seed=611,
                     models=MODELS, vocab_size=700)
    fix = write_reference_fixture(
        str(tmp_path / "ref"), c, bm25_subset_stride=2
    )
    out_csv = str(tmp_path / "results.csv")
    argv = ["--workdir", str(tmp_path / "work"), "--output", out_csv,
            "--bm25-pickle", fix.bm25_pickle,
            "--bm25-queries", fix.bm25_queries_csv,
            "--filter", "CG,NG"]
    for m, p in fix.chunk_dbs.items():
        argv += ["--chunk-db", f"{m}={p}"]
    for m, p in fix.query_dbs.items():
        argv += ["--queries-db", f"{m}={p}"]
    replay_main(argv)

    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    # 7 configurations without the external rerank API.
    names = [r["Model"] for r in rows]
    assert len(rows) == 7, names
    assert "Voyage-3-Large" in names and "BM25" in names
    assert "Voyage-3-Large + BM25" in names
    by_name = {r["Model"]: r for r in rows}
    # Dense retrieval on the planted-signal corpus finds gold docs.
    for dense_cfg in ("Voyage-3-Large", "Text-Embedding-3-Large"):
        assert float(by_name[dense_cfg]["Recall@10"]) >= 0.5, (
            dense_cfg, by_name[dense_cfg])
    # BM25 sees only the stride-2 subset of docs but gold queries whose
    # doc survived must be findable: positive but plausibly lower.
    assert float(by_name["BM25"]["MRR"]) > 0.0
    # Hybrid at 5:1 must not collapse below the dense-only floor - 0.15.
    assert float(by_name["Voyage-3-Large + BM25"]["Recall@10"]) >= (
        float(by_name["Voyage-3-Large"]["Recall@10"]) - 0.15
    )
    # Re-running resumes: already-evaluated configurations are skipped,
    # not duplicated (the eval CLI's append/resume contract).
    replay_main(argv)
    with open(out_csv) as f:
        assert len(list(csv.DictReader(f))) == 7


def test_fixture_pickle_round_trips_exact_scores(tmp_path):
    """The fixture's BM25 pickle imports with bit-compatible scoring."""
    from a_nice_rag_tpu.index.io import load_reference_bm25_pickle
    from a_nice_rag_tpu.ops.bm25 import bm25_scores
    from a_nice_rag_tpu.testing import GoldenBm25Okapi
    import jax.numpy as jnp

    c = synth_corpus(n_docs=150, dim=16, n_queries=6, seed=13)
    fix = write_reference_fixture(str(tmp_path / "ref"), c)
    arrays, vocab, stats, section_ids, _, _ = load_reference_bm25_pickle(
        fix.bm25_pickle
    )
    assert section_ids == c.ids
    golden = GoldenBm25Okapi(c.tokens, k1=1.7, b=0.83, epsilon=0.05)
    for qi in range(3):
        toks = c.query_tokens[qi]
        want = golden.get_scores(toks)
        terms = np.full((1, 16), -1, np.int32)
        for j, t in enumerate(toks[:16]):
            terms[0, j] = vocab.get(t, -1)
        got = np.asarray(
            bm25_scores(arrays, jnp.asarray(terms))
        )[0][: len(c.ids)]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
