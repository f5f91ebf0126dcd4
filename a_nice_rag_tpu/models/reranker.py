"""On-TPU cross-encoder reranker.

Replaces the external rerank API (reference src/search_engine.py:161-203)
with a local cross-encoder: the shared transformer backbone runs over
[query ; SEP ; document] and a scalar head produces a relevance score.
``OnDeviceReranker`` adapts it to the retrieval.rerank.Reranker protocol
(attaches ``rerank_score``, sorts descending, truncates to top_k).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.models.encoder import Block, EncoderConfig, RMSNorm
from a_nice_rag_tpu.models.tokenizer import HashingTokenizer


class CrossEncoderReranker(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, token_ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        mask = token_ids > 0
        x = nn.Embed(cfg.vocab_size, cfg.dim, dtype=cfg.dtype)(token_ids)
        positions = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
        for _ in range(cfg.n_layers):
            x = Block(cfg)(x, mask, positions)
        x = RMSNorm(cfg.dim)(x)
        w = mask.astype(jnp.float32)[:, :, None]
        pooled = (x.astype(jnp.float32) * w).sum(1) / jnp.maximum(w.sum(1), 1.0)
        return nn.Dense(1, dtype=jnp.float32)(pooled)[:, 0]


class OnDeviceReranker:
    """retrieval.rerank.Reranker protocol over the cross-encoder."""

    def __init__(
        self,
        cfg: Optional[EncoderConfig] = None,
        params=None,
        tokenizer: Optional[HashingTokenizer] = None,
        seed: int = 0,
    ):
        self.cfg = cfg or EncoderConfig(n_layers=2)
        self.model = CrossEncoderReranker(self.cfg)
        self.tokenizer = tokenizer or HashingTokenizer(
            vocab_size=self.cfg.vocab_size
        )
        if params is None:
            rng = jax.random.PRNGKey(seed)
            params = self.model.init(rng, jnp.ones((1, 8), jnp.int32))
        self.params = params
        self._score = jax.jit(
            lambda p, ids: self.model.apply(p, ids)
        )

    def score(self, queries: List[str], documents: List[str]) -> np.ndarray:
        ids = self.tokenizer.encode_pairs(queries, documents)
        return np.asarray(self._score(self.params, jnp.asarray(ids)))

    def rerank(
        self,
        query_text: str,
        documents: List[Dict],
        model: str = "on-device",
        top_k: Optional[int] = None,
    ) -> List[Dict]:
        texts = [d.get("document", "") for d in documents]
        scores = self.score([query_text] * len(texts), texts)
        order = np.argsort(scores)[::-1]
        out = [
            {**documents[i], "rerank_score": float(scores[i])} for i in order
        ]
        return out[:top_k] if top_k else out
