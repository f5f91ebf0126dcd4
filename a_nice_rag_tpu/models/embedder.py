"""On-device embedder: retrieval.embed.Embedder protocol over the flax
encoder, closing the loop for a fully-local pipeline (ingestion, query
embedding, retrieval, rerank — no SaaS)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.models.encoder import EncoderConfig, init_encoder
from a_nice_rag_tpu.models.tokenizer import HashingTokenizer


class OnDeviceEmbedder:
    def __init__(
        self,
        cfg: Optional[EncoderConfig] = None,
        params=None,
        tokenizer: Optional[HashingTokenizer] = None,
        seed: int = 0,
    ):
        self.cfg = cfg or EncoderConfig(n_layers=2)
        self.model, init_params = init_encoder(self.cfg, seed)
        self.params = params if params is not None else init_params
        self.tokenizer = tokenizer or HashingTokenizer(
            vocab_size=self.cfg.vocab_size
        )
        self._encode = jax.jit(lambda p, ids: self.model.apply(p, ids))

    def _embed(self, texts: Sequence[str]) -> np.ndarray:
        ids = self.tokenizer.encode_batch(list(texts))
        return np.asarray(self._encode(self.params, jnp.asarray(ids)))

    embed_queries = _embed
    embed_documents = _embed
