"""Encoder training driver: epochs over (query, document) pairs with
periodic checkpointing, resume, and retrieval-recall evaluation.

Wraps models/train.py's step functions into the loop a user actually
runs: shuffled in-batch-negative batches, loss tracking, best-checkpoint
selection by planted recall, resume from the latest orbax checkpoint.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.models.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from a_nice_rag_tpu.models.encoder import EncoderConfig, init_encoder
from a_nice_rag_tpu.models.tokenizer import HashingTokenizer
from a_nice_rag_tpu.models.train import make_train_step

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainResult:
    params: object
    losses: List[float]
    eval_recall: List[Tuple[int, float]]
    steps: int


def _recall_at_k(model, params, tok, queries, documents, k=1) -> float:
    d = model.apply(params, jnp.asarray(tok.encode_batch(documents)))
    q = model.apply(params, jnp.asarray(tok.encode_batch(queries)))
    from a_nice_rag_tpu.ops.dense import dense_top_k

    _, idx = dense_top_k(d, q, k)
    hits = (np.asarray(idx) == np.arange(len(queries))[:, None]).any(axis=1)
    return float(hits.mean())


def train_encoder(
    queries: Sequence[str],
    documents: Sequence[str],
    cfg: Optional[EncoderConfig] = None,
    batch_size: int = 32,
    epochs: int = 3,
    seed: int = 0,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 100,
    eval_every: int = 50,
    eval_fraction: float = 0.1,
    tokenizer: Optional[HashingTokenizer] = None,
) -> TrainResult:
    """Contrastive training over aligned (query, document) pairs.

    Resumes from ``checkpoint_dir``'s latest step when present.
    """
    assert len(queries) == len(documents)
    cfg = cfg or EncoderConfig()
    tok = tokenizer or HashingTokenizer(vocab_size=cfg.vocab_size)
    model, params = init_encoder(cfg, seed)
    step_fn, optimizer = make_train_step(model)
    opt_state = optimizer.init(params)

    start_step = 0
    if checkpoint_dir and latest_step(checkpoint_dir) is not None:
        start_step, params, restored_opt = restore_checkpoint(
            checkpoint_dir, template=params
        )
        if restored_opt is not None:
            # Orbax round-trips tuples as lists; rebuild onto optax's
            # state treedef.
            leaves, treedef = jax.tree.flatten(opt_state)
            raw = jax.tree.leaves(restored_opt)
            opt_state = jax.tree.unflatten(
                treedef,
                [jnp.asarray(r, getattr(l, "dtype", None))
                 for l, r in zip(leaves, raw)],
            )
        logger.info("resumed from step %d", start_step)

    rng = np.random.default_rng(seed)
    n = len(queries)
    n_eval = max(1, int(n * eval_fraction))
    eval_q, eval_d = list(queries[:n_eval]), list(documents[:n_eval])

    losses: List[float] = []
    recalls: List[Tuple[int, float]] = []
    step = start_step
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n - batch_size + 1, batch_size):
            sel = order[lo : lo + batch_size]
            q_ids = jnp.asarray(tok.encode_batch([queries[i] for i in sel]))
            d_ids = jnp.asarray(tok.encode_batch([documents[i] for i in sel]))
            params, opt_state, loss = step_fn(params, opt_state, q_ids, d_ids)
            losses.append(float(loss))
            step += 1
            if eval_every and step % eval_every == 0:
                r = _recall_at_k(model, params, tok, eval_q, eval_d)
                recalls.append((step, r))
                logger.info("step %d loss %.4f recall@1 %.3f",
                            step, losses[-1], r)
            if checkpoint_dir and step % checkpoint_every == 0:
                save_checkpoint(checkpoint_dir, step, params, opt_state)
    if checkpoint_dir:
        save_checkpoint(checkpoint_dir, step, params, opt_state)
    recalls.append((step, _recall_at_k(model, params, tok, eval_q, eval_d)))
    return TrainResult(
        params=params, losses=losses, eval_recall=recalls, steps=step
    )
