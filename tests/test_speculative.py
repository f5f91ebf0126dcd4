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


def test_spec_accept_preserves_target_distribution():
    """The rejection-sampling core: over many trials with fixed draft
    distribution q and target distribution p, the marginal of the
    emitted token (accepted proposal OR residual replacement) must be
    exactly p — the draft can change latency, never the distribution."""
    import jax
    import numpy as np

    from a_nice_rag_tpu.models.speculative import spec_accept

    V = 6
    p = jnp.asarray([0.35, 0.05, 0.2, 0.1, 0.25, 0.05])
    q = jnp.asarray([0.10, 0.30, 0.2, 0.2, 0.15, 0.05])

    def one(key):
        k1, k2 = jax.random.split(key)
        d = jax.random.categorical(k1, jnp.log(q))[None]
        out, _ = spec_accept(d.astype(jnp.int32), q[None, :], p[None, :],
                             jnp.log(p)[None, :], k2)
        return out[0]

    N = 40_000
    toks = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(0), N))
    emp = np.bincount(np.asarray(toks), minlength=V) / N
    assert np.abs(emp - np.asarray(p)).max() < 0.01, emp


def test_speculative_sampled_mode_runs_and_accepts():
    """Sampled speculation with a self-draft accepts most proposals
    (p == q up to cross-shape numerics) and respects the budget."""
    target, tp = init_decoder(small_lm_config())
    prompt = list(range(10, 30))
    stats = {}
    s = list(speculative_generate_stream(
        target, tp, target, tp, prompt, max_new_tokens=40, gamma=4,
        temperature=0.9, top_k=50, seed=3, stats=stats,
    ))
    assert len(s) == 40
    assert stats["accepted"] / stats["rounds"] > 2.0, stats


def test_speculative_multi_round_dispatch():
    """rounds=R scans R speculation rounds inside one dispatched
    program; the stream stays bit-identical to plain greedy, including
    EOS raised mid-block."""
    target, tp = init_decoder(small_lm_config())
    draft, dp = init_decoder(
        small_lm_config(hidden_size=64, num_layers=1), seed=9
    )
    prompt = list(range(10, 30))
    ref = list(generate_stream(target, tp, prompt, max_new_tokens=30))
    got = list(speculative_generate_stream(
        target, tp, draft, dp, prompt, max_new_tokens=30, gamma=4,
        rounds=3,
    ))
    assert got == ref
    e = ref[7]
    a = list(generate_stream(target, tp, prompt, max_new_tokens=30,
                             eos_id=e))
    b = list(speculative_generate_stream(
        target, tp, draft, dp, prompt, max_new_tokens=30, gamma=4,
        rounds=3, eos_id=e,
    ))
    assert a == b
