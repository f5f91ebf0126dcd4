"""Model checkpointing (orbax): save/restore encoder or cross-encoder
params + optimizer state for resumable training, with step-numbered
directories and latest-step lookup. This extends the framework's
checkpoint/resume story (SURVEY.md §5) from index artifacts to trained
model state.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


def save_checkpoint(
    path: str, step: int, params: Any, opt_state: Optional[Any] = None
) -> str:
    """Write {path}/{step} atomically; returns the checkpoint dir."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckpt_dir = os.path.join(path, str(step))
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        ckptr.save(ckpt_dir, payload, force=True)
    return ckpt_dir


def latest_step(path: str) -> Optional[int]:
    try:
        steps = [int(d) for d in os.listdir(path) if d.isdigit()]
    except FileNotFoundError:
        return None
    return max(steps) if steps else None


def restore_checkpoint(
    path: str, step: Optional[int] = None, template: Any = None
) -> Tuple[int, Any, Optional[Any]]:
    """Restore (step, params, opt_state). ``template`` (a matching pytree
    of arrays) restores with correct shardings/dtypes when given."""
    step = step if step is not None else latest_step(path)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {path}")
    ckpt_dir = os.path.join(os.path.abspath(path), str(step))
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(ckpt_dir)
    params = restored["params"]
    if template is not None:
        import jax
        import jax.numpy as jnp

        leaves, treedef = jax.tree.flatten(template)
        raw, raw_def = jax.tree.flatten(params)
        # zip would silently truncate/scramble on a count or structure
        # mismatch (renamed keys, custom nodes) — fail fast instead.
        if len(raw) != len(leaves):
            raise ValueError(
                f"checkpoint at {ckpt_dir} has {len(raw)} leaves but the "
                f"template has {len(leaves)}; structures: restored="
                f"{raw_def}, template={treedef}"
            )
        for i, (l, r) in enumerate(zip(leaves, raw)):
            ls = getattr(l, "shape", None)
            rs = getattr(r, "shape", None)
            if ls is not None and rs is not None and tuple(ls) != tuple(rs):
                raise ValueError(
                    f"checkpoint leaf {i} shape {rs} != template leaf "
                    f"shape {ls} (restored={raw_def}, template={treedef})"
                )
        params = jax.tree.unflatten(
            treedef,
            [jnp.asarray(r, getattr(l, "dtype", None))
             for l, r in zip(leaves, raw)],
        )
    return step, params, restored.get("opt_state")
