"""Index build, filtering, persistence, and reference-format import."""

import os
import sqlite3

import numpy as np

from a_nice_rag_tpu.index import (
    build_index,
    load_index,
    load_reference_chunk_db,
    load_reference_query_db,
    save_index,
)
from a_nice_rag_tpu.testing import synth_corpus


def _build(c):
    return build_index(
        ids=c.ids,
        sources=c.sources,
        contents=c.contents,
        urls=c.urls,
        embeddings=c.embeddings,
        token_lists=c.tokens,
    )


def test_build_and_filter_mask():
    c = synth_corpus(n_docs=100, dim=32, seed=21)
    idx = _build(c)
    assert idx.n_docs == 100
    assert idx.n_docs_padded == 128
    all_mask = np.asarray(idx.filter_mask(None))
    assert all_mask[:100].all() and not all_mask[100:].any()
    cg = np.asarray(idx.filter_mask("CG"))
    for i in range(100):
        assert cg[i] == c.sources[i].upper().startswith("CG")
    both = np.asarray(idx.filter_mask("cg, ng"))
    for i in range(100):
        assert both[i] == (
            c.sources[i].upper().startswith("CG")
            or c.sources[i].upper().startswith("NG")
        )


def test_filter_mask_or_none():
    """None only when the mask would be all-true: aligned corpus, no
    filter, no tombstones — the engine's maskless kernel fast path."""
    from a_nice_rag_tpu.index.updates import delete_documents

    c_pad = synth_corpus(n_docs=100, dim=32, seed=21)
    idx_pad = _build(c_pad)
    # Padded doc axis (100 -> 128): pad rows must stay masked out.
    assert idx_pad.filter_mask_or_none(None) is not None

    c = synth_corpus(n_docs=128, dim=32, seed=22)
    idx = _build(c)
    assert idx.n_docs == idx.n_docs_padded == 128
    assert idx.filter_mask_or_none(None) is None
    # A filter string always yields a real mask.
    assert idx.filter_mask_or_none("CG") is not None
    # Tombstones invalidate the cached triviality via the version bump.
    delete_documents(idx, [c.ids[0]])
    m = idx.filter_mask_or_none(None)
    assert m is not None and not bool(np.asarray(m)[0])


def test_fused_retriever_trivial_mask_parity():
    """The maskless fast path returns the same fused ids as a forced
    all-true mask on an aligned corpus."""
    import jax.numpy as jnp

    from a_nice_rag_tpu.retrieval import FusedRetriever

    c = synth_corpus(n_docs=128, dim=32, n_queries=8, seed=31)
    idx = _build(c)
    assert idx.filter_mask_or_none(None) is None
    r = FusedRetriever(
        idx, ("voyage-3-large",), use_bm25=True,
        similarity_k=10, common_sections_n=10, budget=1024,
    )
    q = {"voyage-3-large": c.query_embeddings["voyage-3-large"]}
    terms = idx.pad_term_ids(c.query_tokens, 8)
    w = {"voyage-3-large": 5.0, "BM25": 1.0}
    fids, _, _ = r(q, terms, w, None, 40.0)
    # Forced mask path (bypasses the trivial-mask shortcut).
    mask = idx.filter_mask(None)
    bmask = mask & jnp.asarray(idx.bm25_doc_mask)
    fids_m, _, _ = r._run(
        tuple(idx.dense_matrix(m) for m in ("voyage-3-large",)),
        idx.bm25_dense if idx.bm25_dense is not None else idx.bm25,
        (jnp.asarray(q["voyage-3-large"]),),
        jnp.asarray(terms),
        mask,
        bmask,
        r._weights_device(w),
        r._scalar_device(40.0),
    )
    np.testing.assert_array_equal(np.asarray(fids), np.asarray(fids_m))


def test_save_load_roundtrip(tmp_path):
    c = synth_corpus(n_docs=60, dim=16, seed=23)
    idx = _build(c)
    path = os.path.join(tmp_path, "artifact")
    save_index(idx, path)
    loaded = load_index(path)
    assert loaded.meta.ids == idx.meta.ids
    assert loaded.vocab == idx.vocab
    np.testing.assert_array_equal(
        np.asarray(loaded.dense["voyage-3-large"]),
        np.asarray(idx.dense["voyage-3-large"]),
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.bm25.impact), np.asarray(idx.bm25.impact)
    )
    assert loaded.bm25_stats["avgdl"] == idx.bm25_stats["avgdl"]


def test_reference_sqlite_import(tmp_path):
    c = synth_corpus(n_docs=12, dim=8, seed=25)
    db = os.path.join(tmp_path, "chunks.db")
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE chunks (id TEXT PRIMARY KEY, content TEXT, "
        "source TEXT, embedding BLOB, url TEXT)"
    )
    emb = c.embeddings["voyage-3-large"]
    for i in range(12):
        conn.execute(
            "INSERT INTO chunks VALUES (?,?,?,?,?)",
            (c.ids[i], c.contents[i], c.sources[i],
             emb[i].astype(np.float32).tobytes(), c.urls[i]),
        )
    conn.commit()
    conn.close()
    ids, contents, sources, urls, loaded = load_reference_chunk_db(db)
    assert ids == c.ids
    np.testing.assert_allclose(loaded, emb, rtol=1e-6)

    qdb = os.path.join(tmp_path, "queries.db")
    conn = sqlite3.connect(qdb)
    conn.execute(
        "CREATE TABLE queries (id TEXT, query TEXT, query_embedding BLOB)"
    )
    qe = c.query_embeddings["voyage-3-large"]
    conn.execute(
        "INSERT INTO queries VALUES (?,?,?)",
        ("q0", "a question", qe[0].astype(np.float32).tobytes()),
    )
    conn.execute("INSERT INTO queries VALUES (?,?,NULL)", ("q1", "skipped"))
    conn.commit()
    conn.close()
    qids, qtexts, qemb = load_reference_query_db(qdb)
    assert qids == ["q0"]
    np.testing.assert_allclose(qemb[0], qe[0], rtol=1e-6)


def test_term_id_mapping():
    c = synth_corpus(n_docs=50, dim=8, seed=27)
    idx = _build(c)
    ids = idx.pad_term_ids([["term1", "not-in-vocab"], []], t_max=4)
    assert ids.shape == (2, 4)
    assert ids[0, 0] == idx.vocab["term1"]
    assert ids[0, 1] == -1
    assert (ids[1] == -1).all()


def test_index_manager_memoizes(tmp_path):
    import os

    from a_nice_rag_tpu.index.manager import IndexManager, add_url_column

    c = synth_corpus(n_docs=20, dim=8, seed=29)
    idx = _build(c)
    path = os.path.join(tmp_path, "artifact")
    save_index(idx, path)
    mgr = IndexManager()
    a = mgr.load_artifact(path)
    b = mgr.load_artifact(path)
    assert a is b
    mgr.invalidate(path)
    assert mgr.load_artifact(path) is not a

    # url migration on a reference-format DB without the url column
    db = os.path.join(tmp_path, "nourle.db")
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE chunks (id TEXT PRIMARY KEY, content TEXT, "
        "source TEXT, embedding BLOB)"
    )
    conn.execute("INSERT INTO chunks VALUES ('a','x','NG1',NULL)")
    conn.commit()
    conn.close()
    assert add_url_column(db) == 1
    assert add_url_column(db) == 0  # idempotent
    conn = sqlite3.connect(db)
    url = conn.execute("SELECT url FROM chunks").fetchone()[0]
    conn.close()
    assert url == "https://www.nice.org.uk/guidance/ng1"
