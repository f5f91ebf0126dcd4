"""Speculative decoding (models/speculative.py): the streamed output
must be bit-identical to plain target-only greedy decoding, while the
draft absorbs the sequential work (1..gamma+1 tokens per round)."""

import jax.numpy as jnp

from a_nice_rag_tpu.models.decoder import (
    ByteTokenizer,
    generate_stream,
    init_decoder,
    small_lm_config,
    train_lm_steps,
)
from a_nice_rag_tpu.models.speculative import speculative_generate_stream


def test_speculative_matches_greedy_independent_draft():
    """A draft that knows nothing about the target still yields the
    target's exact greedy stream — only the round count suffers."""
    target, tp = init_decoder(small_lm_config())
    draft, dp = init_decoder(
        small_lm_config(hidden_size=64, num_layers=1), seed=9
    )
    prompt = list(range(10, 30))
    ref = list(generate_stream(target, tp, prompt, max_new_tokens=40))
    stats = {}
    got = list(speculative_generate_stream(
        target, tp, draft, dp, prompt, max_new_tokens=40, gamma=4,
        stats=stats,
    ))
    assert got == ref
    assert stats["rounds"] >= 1
    # Every round must make progress (>= 1 token: the correction).
    assert stats["accepted"] >= stats["rounds"]


def test_speculative_accepts_when_draft_agrees():
    """A trained (confident-logits) model drafting for itself accepts
    nearly every proposal: mean tokens/round approaches gamma+1. Uses
    a memorized phrase so argmax is stable across forward shapes."""
    tok = ByteTokenizer()
    phrase = "the dose is 42 mg daily. "
    ids = tok.encode(phrase * 6)
    cfg = small_lm_config(hidden_size=96, num_layers=2)
    model, params = init_decoder(cfg, seed=1, max_len=len(ids))
    params, _ = train_lm_steps(
        model, params, jnp.asarray(ids, jnp.int32)[None, :], n_steps=150
    )
    prompt = tok.encode(phrase * 2)
    ref = list(generate_stream(model, params, prompt, max_new_tokens=30))
    stats = {}
    got = list(speculative_generate_stream(
        model, params, model, params, prompt, max_new_tokens=30,
        gamma=4, stats=stats,
    ))
    assert got == ref
    mean_tok_per_round = stats["accepted"] / stats["rounds"]
    assert mean_tok_per_round > 3.0, stats


def test_speculative_eos_stops_stream():
    target, tp = init_decoder(small_lm_config())
    draft, dp = init_decoder(
        small_lm_config(hidden_size=64, num_layers=1), seed=9
    )
    prompt = [256, 9, 17, 33]
    ref = list(generate_stream(target, tp, prompt, max_new_tokens=24))
    fake_eos = ref[7]
    a = list(generate_stream(target, tp, prompt, max_new_tokens=24,
                             eos_id=fake_eos))
    b = list(speculative_generate_stream(
        target, tp, draft, dp, prompt, max_new_tokens=24, gamma=4,
        eos_id=fake_eos,
    ))
    assert a == b and fake_eos not in b and len(b) < len(ref)
