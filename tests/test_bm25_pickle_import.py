"""Importing a reference-format BM25 pickle without rank_bm25/langchain
installed: a pickle referencing those modules is synthesized with
temporary fake modules, then loaded by the stub unpickler."""

import pickle
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from a_nice_rag_tpu.index.io import load_reference_bm25_pickle
from a_nice_rag_tpu.ops.bm25 import bm25_scores
from a_nice_rag_tpu.testing import GoldenBm25Okapi, synth_corpus


def _make_reference_pickle(tmp_path, corpus_tokens, ids, sources, contents):
    """Pickle {bm25, sections, section_ids, config} with objects whose
    classes claim to live in rank_bm25 / langchain (as the reference's
    artifact does)."""
    golden = GoldenBm25Okapi(corpus_tokens, k1=1.7, b=0.83, epsilon=0.05)

    rank_mod = types.ModuleType("rank_bm25")

    class BM25Okapi:
        pass

    BM25Okapi.__module__ = "rank_bm25"
    BM25Okapi.__qualname__ = "BM25Okapi"
    rank_mod.BM25Okapi = BM25Okapi

    lc_doc_mod = types.ModuleType("langchain.schema.document")

    class Document:
        def __init__(self, page_content, metadata):
            self.page_content = page_content
            self.metadata = metadata

    Document.__module__ = "langchain.schema.document"
    Document.__qualname__ = "Document"
    lc_doc_mod.Document = Document
    lc_mod = types.ModuleType("langchain")
    lc_schema = types.ModuleType("langchain.schema")

    bm25 = BM25Okapi()
    bm25.idf = golden.idf
    bm25.doc_freqs = golden.doc_freqs
    bm25.doc_len = list(map(int, golden.doc_len))
    bm25.avgdl = golden.avgdl
    bm25.corpus_size = golden.corpus_size
    bm25.k1, bm25.b, bm25.epsilon = 1.7, 0.83, 0.05

    sections = [
        Document(contents[i], {"id": ids[i], "source": sources[i]})
        for i in range(len(ids))
    ]
    payload = {
        "bm25": bm25,
        "sections": sections,
        "section_ids": list(ids),
        "config": {"k1": 1.7, "b": 0.83, "epsilon": 0.05},
    }
    mods = {
        "rank_bm25": rank_mod,
        "langchain": lc_mod,
        "langchain.schema": lc_schema,
        "langchain.schema.document": lc_doc_mod,
    }
    sys.modules.update(mods)
    try:
        path = str(tmp_path / "bm25_index.pkl")
        with open(path, "wb") as f:
            pickle.dump(payload, f)
    finally:
        for name in mods:
            del sys.modules[name]
    return path, golden


def test_import_reference_pickle_exact_scores(tmp_path):
    c = synth_corpus(n_docs=120, dim=8, n_queries=8, seed=191)
    path, golden = _make_reference_pickle(
        tmp_path, c.tokens, c.ids, c.sources, c.contents
    )
    # rank_bm25 must NOT be importable for this test to mean anything.
    with pytest.raises(ImportError):
        import rank_bm25  # noqa: F401

    arrays, vocab, stats, section_ids, contents, sources = (
        load_reference_bm25_pickle(path)
    )
    assert section_ids == c.ids
    assert contents == c.contents
    assert stats["k1"] == 1.7 and stats["corpus_size"] == 120

    terms = np.full((8, 16), -1, np.int32)
    for i, toks in enumerate(c.query_tokens):
        tids = [vocab.get(t, -1) for t in toks[:16]]
        terms[i, : len(tids)] = tids
    scores = np.asarray(bm25_scores(arrays, jnp.asarray(terms), budget=4096))
    for i, toks in enumerate(c.query_tokens):
        expect = golden.get_scores(toks[:16])
        np.testing.assert_allclose(
            scores[i, : len(expect)], expect, rtol=1e-6, atol=1e-7
        )


def test_full_reference_migration_cli(tmp_path):
    """chunk DB + pickle (with BM25's own doc ordering/subset) -> artifact,
    verified against golden scores on the chunk-DB row space."""
    import os
    import sqlite3

    from a_nice_rag_tpu.index import load_index
    from a_nice_rag_tpu.ingest.import_reference import main

    c = synth_corpus(n_docs=90, dim=16, n_queries=6, seed=193)
    # chunk DB holds ALL docs in corpus order
    db = str(tmp_path / "chunks.db")
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE chunks (id TEXT PRIMARY KEY, content TEXT, "
        "source TEXT, embedding BLOB, url TEXT)"
    )
    emb = c.embeddings["voyage-3-large"]
    for i in range(90):
        conn.execute(
            "INSERT INTO chunks VALUES (?,?,?,?,?)",
            (c.ids[i], c.contents[i], c.sources[i],
             emb[i].astype(np.float32).tobytes(), c.urls[i]),
        )
    conn.commit()
    conn.close()
    # BM25 pickle over a REVERSED subset ordering (exercises the remap)
    sub = list(range(89, 4, -1))
    pkl, golden = _make_reference_pickle(
        tmp_path,
        [c.tokens[i] for i in sub],
        [c.ids[i] for i in sub],
        [c.sources[i] for i in sub],
        [c.contents[i] for i in sub],
    )
    out = str(tmp_path / "artifact")
    main(["--chunk-db", f"voyage-3-large={db}", "--bm25-pickle", pkl,
          "--output", out])
    idx = load_index(out)
    assert idx.n_docs == 90
    assert np.asarray(idx.bm25_doc_mask)[:5].sum() == 0  # not in pickle
    # Scores land on chunk-DB rows and match golden (pickle ordering).
    toks = c.query_tokens[0][:16]
    terms = np.full((1, 16), -1, np.int32)
    tids = [idx.vocab.get(t, -1) for t in toks]
    terms[0, : len(tids)] = tids
    scores = np.asarray(bm25_scores(idx.bm25, jnp.asarray(terms), budget=4096))[0]
    expect = golden.get_scores(toks)
    for j, row in enumerate(sub):
        np.testing.assert_allclose(scores[row], expect[j], rtol=1e-6,
                                   atol=1e-7)


def test_unpickler_stubs_malicious_globals(tmp_path):
    """The BM25-pickle importer must never resolve an importable callable
    outside the allowlist: a REDUCE on os.system becomes an inert stub
    (the reference tree is untrusted content)."""
    import pickle

    from a_nice_rag_tpu.index.io import _StubObject, _StubUnpickler

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("echo pwned > /tmp/pwned_proof",))

    p = tmp_path / "evil.pkl"
    with open(p, "wb") as f:
        pickle.dump({"bm25": Evil()}, f)
    import os as _os

    proof = "/tmp/pwned_proof"
    if _os.path.exists(proof):
        _os.remove(proof)
    with open(p, "rb") as f:
        out = _StubUnpickler(f).load()
    assert not _os.path.exists(proof), "REDUCE payload executed!"
    assert isinstance(out["bm25"], _StubObject)
    # Allowlisted containers and numpy arrays still round-trip.
    payload = {"a": np.arange(3), "b": {1, 2}, "c": [np.float64(2.5)]}
    p2 = tmp_path / "ok.pkl"
    with open(p2, "wb") as f:
        pickle.dump(payload, f)
    with open(p2, "rb") as f:
        back = _StubUnpickler(f).load()
    np.testing.assert_array_equal(back["a"], payload["a"])
    assert back["b"] == {1, 2} and float(back["c"][0]) == 2.5


def test_load_index_rejects_wrong_format_version(tmp_path):
    import json

    from a_nice_rag_tpu.index import build_index, load_index, save_index
    from a_nice_rag_tpu.testing import synth_corpus

    c = synth_corpus(n_docs=50, dim=16, n_queries=2, seed=5)
    idx = build_index(ids=c.ids, sources=c.sources, contents=c.contents,
                      embeddings=c.embeddings, token_lists=c.tokens)
    path = str(tmp_path / "ix")
    save_index(idx, path)
    meta = json.load(open(f"{path}/meta.json"))
    meta["format_version"] = 99
    json.dump(meta, open(f"{path}/meta.json", "w"))
    with pytest.raises(ValueError, match="format_version"):
        load_index(path)
