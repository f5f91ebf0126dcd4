"""GPipe pipeline-parallel training: parity + convergence on a dp x pp
mesh (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from a_nice_rag_tpu.models.encoder import EncoderConfig, init_encoder
from a_nice_rag_tpu.models.pipeline import (
    make_pipeline_forward,
    make_pipeline_train_step,
    merge_pipeline_params,
    split_pipeline_params,
)
from a_nice_rag_tpu.models.train import make_train_step

CFG = EncoderConfig(
    vocab_size=512, dim=64, n_layers=4, n_heads=2, max_len=32, out_dim=64
)


@pytest.fixture(scope="module")
def setup():
    model, params = init_encoder(CFG, seed=0)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("dp", "pp"))
    rng = np.random.default_rng(0)
    toks = lambda: jnp.asarray(
        rng.integers(1, 512, size=(8, 16)).astype(np.int32)
    )
    return model, params, mesh, toks


def test_param_split_merge_roundtrip(setup):
    model, params, mesh, _ = setup
    head, blocks, tail = split_pipeline_params(params, 4)
    merged = merge_pipeline_params(head, blocks, tail)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_forward_matches_single_device(setup):
    model, params, mesh, toks = setup
    tokens = toks()
    ref = np.asarray(model.apply(params, tokens))
    head, blocks, tail = split_pipeline_params(params, 4)
    fwd = make_pipeline_forward(CFG, mesh, n_micro=2)
    with mesh:
        got = np.asarray(fwd(head, blocks, tail, tokens))
    # bf16 block compute; outputs are unit-norm f32.
    np.testing.assert_allclose(got, ref, atol=2e-2)
    assert np.abs(got - ref).max() < 2e-2


@pytest.mark.slow
def test_pipeline_training_matches_and_converges(setup):
    model, params, mesh, toks = setup
    q, d = toks(), toks()

    # Single-device step for the loss-parity reference.
    sd_step, _ = make_train_step(model)
    import optax

    opt0 = optax.adamw(1e-3).init(params)
    _, _, sd_loss = sd_step(params, opt0, q, d)

    step, pp, opt, _ = make_pipeline_train_step(CFG, params, mesh, n_micro=2)
    with mesh:
        losses = []
        for _ in range(5):
            pp, opt, loss = step(pp, opt, q, d)
            losses.append(float(loss))
    # First-step loss equals the single-device loss (same params/data).
    np.testing.assert_allclose(losses[0], float(sd_loss), rtol=5e-2)
    assert losses[-1] < losses[0]

    # Trained pipeline params convert back to a working encoder tree.
    merged = merge_pipeline_params(*jax.device_get(pp))
    out = model.apply(merged, q)
    assert np.isfinite(np.asarray(out)).all()


def test_bubble_schedule_odd_micro(setup):
    """n_micro not equal to n_stages still yields exact outputs."""
    model, params, mesh, toks = setup
    tokens = toks()
    ref = np.asarray(model.apply(params, tokens))
    head, blocks, tail = split_pipeline_params(params, 4)
    fwd = make_pipeline_forward(CFG, mesh, n_micro=4)
    with mesh:
        got = np.asarray(fwd(head, blocks, tail, tokens))
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_pipeline_params_checkpoint_roundtrip(tmp_path, setup):
    """Pipelined (head, blocks, tail) tuple trees round-trip through the
    orbax checkpoint layer and merge back into a working encoder."""
    from a_nice_rag_tpu.models.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    model, params, mesh, toks = setup
    head, blocks, tail = split_pipeline_params(params, 4)
    pipe = (head, blocks, tail)
    save_checkpoint(str(tmp_path / "ck"), 3, pipe, None)
    step, restored, _ = restore_checkpoint(
        str(tmp_path / "ck"), template=pipe
    )
    assert step == 3
    for a, b in zip(jax.tree.leaves(pipe), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    merged = merge_pipeline_params(*restored)
    out = model.apply(merged, toks())
    assert np.isfinite(np.asarray(out)).all()
