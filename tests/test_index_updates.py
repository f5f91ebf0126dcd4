"""Online index updates: tombstone deletes + frozen-stats appends."""

import jax.numpy as jnp
import numpy as np
import pytest

from a_nice_rag_tpu.index import (
    append_documents,
    build_index,
    delete_documents,
    load_index,
    save_index,
    undelete_documents,
)
from a_nice_rag_tpu.ops.bm25 import bm25_scores
from a_nice_rag_tpu.ops.dense import dense_top_k
from a_nice_rag_tpu.retrieval import FusedRetriever
from a_nice_rag_tpu.testing import synth_corpus


def _index(n_docs=200, seed=31):
    c = synth_corpus(n_docs=n_docs, dim=32, n_queries=8, seed=seed,
                     vocab_size=300)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents, urls=c.urls,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    return c, idx


def test_delete_excludes_from_all_paths(tmp_path):
    c, idx = _index()
    q = jnp.asarray(c.query_embeddings["voyage-3-large"])
    _, before = dense_top_k(
        idx.dense["voyage-3-large"], q, 5,
        mask=jnp.asarray(idx.filter_mask(None)),
    )
    victim_rows = set(np.asarray(before)[:, 0].tolist())
    victims = [c.ids[r] for r in victim_rows]

    assert delete_documents(idx, victims) == len(victims)
    _, after = dense_top_k(
        idx.dense["voyage-3-large"], q, 5,
        mask=jnp.asarray(idx.filter_mask(None)),
    )
    assert not victim_rows & set(np.asarray(after).ravel().tolist())

    # Through the fused engine too (mask built inside).
    fr = FusedRetriever(idx, ("voyage-3-large",), use_bm25=True,
                        similarity_k=10, common_sections_n=10)
    terms = jnp.asarray(idx.pad_term_ids(c.query_tokens, 16))
    ids, _, _ = fr(
        {"voyage-3-large": c.query_embeddings["voyage-3-large"]}, terms,
        {"voyage-3-large": 5.0, "BM25": 1.0}, None, 40.0,
    )
    assert not victim_rows & set(int(i) for i in np.asarray(ids).ravel()
                                 if i >= 0)

    # Tombstones survive save/load; undelete restores.
    save_index(idx, str(tmp_path / "art"))
    idx2 = load_index(str(tmp_path / "art"))
    assert sorted(np.flatnonzero(idx2.meta.deleted)) == sorted(victim_rows)
    assert undelete_documents(idx2, victims) == len(victims)
    assert not idx2.meta.deleted.any()


def test_append_preserves_existing_and_retrieves_new():
    c, idx = _index(n_docs=150, seed=37)
    c2 = synth_corpus(n_docs=40, dim=32, n_queries=4, seed=38,
                      vocab_size=300)
    new_ids = [f"new_{d}" for d in c2.ids]

    terms = jnp.asarray(idx.pad_term_ids(c.query_tokens, 16))
    bm25_before = np.asarray(bm25_scores(idx.bm25, terms, budget=8192))

    idx2 = append_documents(
        idx, new_ids, c2.sources, c2.contents,
        {"voyage-3-large": c2.embeddings["voyage-3-large"]},
        token_lists=c2.tokens,
    )
    assert idx2.meta.n_docs == 190
    # Existing documents' BM25 scores are bit-identical (frozen stats).
    terms2 = jnp.asarray(idx2.pad_term_ids(c.query_tokens, 16))
    bm25_after = np.asarray(bm25_scores(idx2.bm25, terms2, budget=8192))
    np.testing.assert_array_equal(
        bm25_after[:, :150], bm25_before[:, :150]
    )
    # Existing dense rows bit-identical.
    np.testing.assert_array_equal(
        np.asarray(idx2.dense["voyage-3-large"])[:150],
        np.asarray(idx.dense["voyage-3-large"])[:150],
    )

    # New documents are retrievable by their own queries (dense).
    q2 = jnp.asarray(c2.query_embeddings["voyage-3-large"])
    _, top = dense_top_k(
        idx2.dense["voyage-3-large"], q2, 1,
        mask=jnp.asarray(idx2.filter_mask(None)),
    )
    got_rows = np.asarray(top)[:, 0]
    want_rows = [idx2.meta.id_to_row[f"new_{g}"] for g in c2.gold_ids]
    assert (got_rows == np.asarray(want_rows)).mean() >= 0.5

    # And by BM25 for a term distinctive to an appended doc.
    probe = jnp.asarray(idx2.pad_term_ids([c2.tokens[0][:8]], 16))
    s = np.asarray(bm25_scores(idx2.bm25, probe, budget=8192))[0]
    assert s[idx2.meta.id_to_row[new_ids[0]]] > 0

    # Appending a duplicate id fails loudly.
    with pytest.raises(ValueError, match="already present"):
        append_documents(
            idx2, [c.ids[0]], ["CG1"], ["x"],
            {"voyage-3-large": np.zeros((1, 32), np.float32)},
            token_lists=[["tok"]],
        )


def test_append_dense_only_index():
    c, _ = _index()
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings,
    )
    idx2 = append_documents(
        idx, ["extra"], ["NG999"], ["content"],
        {"voyage-3-large": np.ones((1, 32), np.float32) / np.sqrt(32)},
    )
    assert idx2.meta.n_docs == idx.meta.n_docs + 1
    assert idx2.bm25 is None


def test_delete_invalidates_live_retriever_masks():
    """A FusedRetriever built BEFORE a delete must stop returning the
    tombstoned docs (its derived bm25 mask cache is version-keyed)."""
    c, idx = _index(n_docs=120, seed=41)
    fr = FusedRetriever(idx, ("voyage-3-large",), use_bm25=True,
                        similarity_k=8, common_sections_n=8)
    terms = jnp.asarray(idx.pad_term_ids(c.query_tokens, 16))
    q = {"voyage-3-large": c.query_embeddings["voyage-3-large"]}
    w = {"voyage-3-large": 5.0, "BM25": 1.0}
    ids, _, _ = fr(q, terms, w, None, 40.0)
    victims_rows = sorted({int(np.asarray(ids)[b, 0]) for b in range(4)})
    delete_documents(idx, [c.ids[r] for r in victims_rows])
    ids2, _, _ = fr(q, terms, w, None, 40.0)
    returned = {int(i) for i in np.asarray(ids2).ravel() if i >= 0}
    assert not set(victims_rows) & returned


def test_interleaved_update_rounds_fuzz():
    """Multiple delete/append/undelete rounds keep retrieval consistent:
    live docs retrievable, tombstoned docs never returned, metadata and
    row mapping intact."""
    rng = np.random.default_rng(71)
    c, idx = _index(n_docs=100, seed=53)
    from a_nice_rag_tpu.index import undelete_documents

    alive = set(idx.meta.ids)
    dead = set()
    for round_i in range(4):
        # delete a few random live docs
        victims = list(rng.choice(sorted(alive), size=5, replace=False))
        delete_documents(idx, victims)
        alive -= set(victims)
        dead |= set(victims)
        # resurrect one
        back = victims[0]
        undelete_documents(idx, [back])
        alive.add(back)
        dead.discard(back)
        # append a couple of new docs
        c2 = synth_corpus(n_docs=2, dim=32, n_queries=1,
                          seed=100 + round_i, vocab_size=300)
        new_ids = [f"r{round_i}_{d}" for d in c2.ids]
        idx = append_documents(
            idx, new_ids, c2.sources, c2.contents,
            {"voyage-3-large": c2.embeddings["voyage-3-large"]},
            token_lists=c2.tokens,
        )
        alive |= set(new_ids)

        mask = np.asarray(idx.filter_mask(None))
        live_rows = {idx.meta.id_to_row[d] for d in alive}
        dead_rows = {idx.meta.id_to_row[d] for d in dead}
        assert all(mask[r] for r in live_rows)
        assert not any(mask[r] for r in dead_rows)
        # id_to_row is a bijection over all docs
        assert len(idx.meta.id_to_row) == idx.meta.n_docs

    # BM25 still retrieves a live appended doc by its own tokens
    probe = jnp.asarray(idx.pad_term_ids([c2.tokens[0][:8]], 16))
    s = np.asarray(bm25_scores(idx.bm25, probe, budget=8192))[0]
    assert s[idx.meta.id_to_row[new_ids[0]]] > 0
