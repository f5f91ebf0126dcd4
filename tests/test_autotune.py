"""Fused-kernel block autotuner: defaults, memoization, disk cache."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.ops.pallas import FusedKernelConfig, tune_fused_blocks
from a_nice_rag_tpu.ops.pallas.autotune import _memory_cache, _signature


def _arrays():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((1024, 64)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    return emb, q


def test_non_tpu_returns_defaults_without_measuring():
    emb, q = _arrays()
    cfg = tune_fused_blocks(emb, q, 8)
    assert cfg == FusedKernelConfig()
    assert jax.devices()[0].platform != "tpu"  # conftest forces CPU


def test_disk_cache_roundtrip(tmp_path):
    emb, q = _arrays()
    sig = _signature(1024, 64, 64, 8, str(emb.dtype))
    path = tmp_path / "tuned.json"
    path.write_text(json.dumps(
        {sig: {"block_q": 256, "block_n": 16384, "subtiles": 4}}
    ))
    _memory_cache.pop(sig, None)
    cfg = tune_fused_blocks(emb, q, 8, cache_path=str(path))
    assert cfg == FusedKernelConfig(256, 16384, 4)
    # memoized now
    assert _memory_cache[sig] == cfg


def test_config_plumbs_into_retrievers():
    from a_nice_rag_tpu.index import build_index
    from a_nice_rag_tpu.retrieval import FusedRetriever
    from a_nice_rag_tpu.testing import synth_corpus

    c = synth_corpus(n_docs=256, dim=32, n_queries=8, seed=11)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    fr = FusedRetriever(
        idx, ("voyage-3-large",), use_bm25=True, similarity_k=10,
        common_sections_n=5,
        pallas_config=FusedKernelConfig(64, 8192, 2),
    )
    ids, vals, _ = fr(
        {"voyage-3-large": c.query_embeddings["voyage-3-large"]},
        jnp.asarray(idx.pad_term_ids(c.query_tokens, 16)),
        {"voyage-3-large": 5.0, "BM25": 1.0}, None, 40.0,
    )
    assert np.asarray(ids).shape[1] == 5
