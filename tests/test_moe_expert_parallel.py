"""MoE encoder + expert parallelism (ep axis) and sequence sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from a_nice_rag_tpu.models.moe import (
    MoEEncoderConfig,
    init_moe_encoder,
    make_moe_train_step,
    moe_param_shardings,
)

CFG = MoEEncoderConfig(
    vocab_size=256, dim=64, n_layers=2, n_heads=2, max_len=32, out_dim=64,
    n_experts=4,
)


@pytest.fixture(scope="module")
def moe():
    model, params = init_moe_encoder(CFG, seed=0)
    rng = np.random.default_rng(0)
    toks = lambda: jnp.asarray(
        rng.integers(1, 256, size=(8, 16)).astype(np.int32)
    )
    return model, params, toks


def test_moe_forward_unit_norm_and_balanced_aux(moe):
    model, params, toks = moe
    out, aux = model.apply(params, toks())
    norms = np.asarray(jnp.linalg.norm(out, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # Aux loss is ~1 when routing is balanced, >> 1 when collapsed.
    assert 0.5 < float(aux) < 4.0


def test_moe_capacity_overflow_drops_to_residual(moe):
    model, params, _ = moe
    # All-identical tokens route identically -> most overflow capacity;
    # the forward must stay finite (overflow = residual passthrough).
    tokens = jnp.full((4, 16), 7, jnp.int32)
    out, _ = model.apply(params, tokens)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_expert_parallel_training_converges(moe):
    model, params, toks = moe
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("dp", "ep"))
    step, p, opt, bs = make_moe_train_step(model, params, mesh)
    q = jax.device_put(toks(), bs)
    d = jax.device_put(toks(), bs)
    losses = []
    for _ in range(6):
        p, opt, loss = step(p, opt, q, d)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # Expert tensors are genuinely sharded over ep.
    for path, leaf in jax.tree_util.tree_leaves_with_path(p):
        if "w_gate" in jax.tree_util.keystr(path):
            assert leaf.sharding.spec in (P("ep"), P("ep", None, None))
            break
    else:
        pytest.fail("no expert tensor found")


def test_sequence_parallel_batch_sharding():
    from a_nice_rag_tpu.models.encoder import EncoderConfig, init_encoder
    from a_nice_rag_tpu.models.train import make_sharded_train_step

    cfg = EncoderConfig(vocab_size=256, dim=64, n_layers=2, n_heads=2,
                        max_len=32, out_dim=64)
    model, params = init_encoder(cfg, seed=0)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("dp", "tp", "sp"))
    step, p, opt, bs = make_sharded_train_step(
        model, params, mesh, sp_axis="sp"
    )
    assert bs.spec == P("dp", "sp")
    rng = np.random.default_rng(1)
    toks = lambda: jax.device_put(jnp.asarray(
        rng.integers(1, 256, size=(4, 16)).astype(np.int32)), bs)
    q, d = toks(), toks()
    losses = []
    for _ in range(4):
        p, opt, loss = step(p, opt, q, d)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
