"""Speculative decoding: draft-proposes, target-verifies, greedy-exact.

Autoregressive decode is memory-bound — every step streams the target
model's weights for ONE token of progress. Speculative decoding
(Leviathan et al., 2023) lets a small draft model propose ``gamma``
tokens autoregressively, then the target model scores all of them in a
SINGLE forward pass (s = gamma+1 positions — the same weight stream
buys up to gamma+1 tokens). The accepted prefix is exactly what plain
greedy decoding of the target would have produced, so output quality is
bit-identical to the target-only stream; only the latency changes.

TPU-first shape: one jitted program per speculation round — the draft's
gamma-step ``lax.scan``, the target's verify forward over the proposal
window, and the accept/correct logic (cumprod prefix-match, no dynamic
shapes) all fuse into ONE dispatch. Both models' KV caches ride the
per-offset write/attend machinery of models/decoder._CachedBlock;
rejected positions' cache rows are overwritten before any later query
position can attend them (same argument as right-padded batch prefill).

The reference has no generation stack at all (SaaS-only,
reference src/query_rag.py:434-513); this accelerates the on-device one.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.models.decoder import EOS, DecoderLM, init_caches

_SPEC_PROGRAMS: dict = {}


def _spec_programs(target: DecoderLM, draft: DecoderLM, gamma: int):
    """Jitted (prefill_both, spec_round) for one (target, draft, gamma),
    cached at module level (fresh jit objects per call would recompile
    per request — see decoder._decode_programs)."""
    try:
        key = (hash(target), hash(draft), int(gamma))
    except TypeError:
        key = (id(target), id(draft), int(gamma))
    if key in _SPEC_PROGRAMS:
        return _SPEC_PROGRAMS[key]

    @jax.jit
    def prefill_both(tp, dp, ids, tkc, tvc, dkc, dvc):
        tlogits, tkc, tvc = target.apply(tp, ids, tkc, tvc, jnp.int32(0))
        _, dkc, dvc = draft.apply(dp, ids, dkc, dvc, jnp.int32(0))
        tok = jnp.argmax(tlogits[:, -1], -1).astype(jnp.int32)
        return tok, tkc, tvc, dkc, dvc

    @jax.jit
    def spec_round(tp, dp, tok, tkc, tvc, dkc, dvc, pos):
        """One speculation round. ``tok`` [1] is the last accepted
        token (write slot ``pos``). Returns (out [gamma+1], m) where
        out[:m] are the tokens plain target-greedy would emit next:
        the accepted draft prefix plus the target's correction (or, on
        full acceptance, its bonus token)."""

        def dbody(carry, _):
            tok, dkc, dvc, p = carry
            logits, dkc, dvc = draft.apply(dp, tok[:, None], dkc, dvc, p)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return (nxt, dkc, dvc, p + 1), nxt

        (_, dkc, dvc, _), ds = jax.lax.scan(
            dbody, (tok, dkc, dvc, pos), None, length=gamma
        )
        ds = ds[:, 0]  # [gamma] proposals d_1..d_gamma

        seq = jnp.concatenate([tok, ds])[None, :]  # [1, gamma+1]
        tlogits, tkc, tvc = target.apply(tp, seq, tkc, tvc, pos)
        gs = jnp.argmax(tlogits[0], -1).astype(jnp.int32)  # g_1..g_{gamma+1}

        match = (ds == gs[:gamma]).astype(jnp.int32)
        n_acc = jnp.cumprod(match).sum()  # accepted draft tokens, 0..gamma
        # out[j] = ds[j] for j < n_acc, gs[j] at j == n_acc (correction
        # on mismatch; bonus token g_{gamma+1} on full acceptance).
        ds_pad = jnp.concatenate([ds, ds[-1:]])
        out = jnp.where(jnp.arange(gamma + 1) < n_acc, ds_pad, gs)
        m = n_acc + 1
        new_tok = out[m - 1][None]
        return out, m, new_tok, tkc, tvc, dkc, dvc, pos + m

    progs = (prefill_both, spec_round)
    _SPEC_PROGRAMS[key] = progs
    return progs


def speculative_generate_stream(
    target: DecoderLM,
    target_params,
    draft: DecoderLM,
    draft_params,
    prompt_ids: List[int],
    max_new_tokens: int = 64,
    gamma: int = 4,
    eos_id: int = EOS,
    max_len: Optional[int] = None,
    stats: Optional[dict] = None,
) -> Iterator[int]:
    """Greedy streaming generation, bit-identical to
    ``generate_stream(target, target_params, ...)`` (greedy), with the
    draft model absorbing most of the sequential work. One dispatch per
    round yields 1..gamma+1 tokens. Pass ``stats={}`` to receive
    ``rounds`` and ``accepted`` counters (mean tokens/round =
    accepted/rounds — the speedup factor when the draft is ~free)."""
    n_prompt = len(prompt_ids)
    smax = max_len or (n_prompt + max_new_tokens + gamma + 1)
    assert n_prompt + max_new_tokens + gamma + 1 <= smax + gamma + 1
    tkc, tvc = init_caches(target.cfg, 1, smax)
    dkc, dvc = init_caches(draft.cfg, 1, smax)
    prefill_both, spec_round = _spec_programs(target, draft, gamma)

    ids = jnp.asarray(prompt_ids, jnp.int32)[None, :]
    tok, tkc, tvc, dkc, dvc = prefill_both(
        target_params, draft_params, ids, tkc, tvc, dkc, dvc
    )
    t = int(tok[0])
    if t == eos_id:
        return
    yield t
    emitted = 1
    pos = jnp.int32(n_prompt)
    rounds = accepted = 0
    while emitted < max_new_tokens:
        if int(pos) + gamma + 1 > smax:
            break  # cache exhausted (caller sized max_len too small)
        out, m, tok, tkc, tvc, dkc, dvc, pos = spec_round(
            target_params, draft_params, tok, tkc, tvc, dkc, dvc, pos
        )
        block = np.asarray(out)
        m = int(m)
        rounds += 1
        accepted += m
        for t in block[:m]:
            t = int(t)
            if t == eos_id or emitted >= max_new_tokens:
                if stats is not None:
                    stats.update(rounds=rounds, accepted=accepted)
                return
            yield t
            emitted += 1
    if stats is not None:
        stats.update(rounds=rounds, accepted=accepted)
