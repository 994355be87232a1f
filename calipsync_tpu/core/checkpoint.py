"""Checkpoint save/restore via Orbax.

The reference saves a bare ``state_dict`` at the final epoch only
(/root/reference/step2_train_unet.py:126-128) and cannot resume interrupted
runs. Here checkpoints carry {params, batch_stats, opt_state, step} plus the
data-order RNG state, support periodic saves and resume, and restore with
resharding onto whatever mesh the restoring process uses (SURVEY.md
section 5, checkpoint/resume).
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str | pathlib.Path, step: int,
                    tree: Any) -> pathlib.Path:
    """Save a pytree under ``{directory}/step_{step}``; returns the path."""
    path = pathlib.Path(directory).absolute() / f"step_{step}"
    with _checkpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return path


def latest_step(directory: str | pathlib.Path) -> Optional[int]:
    d = pathlib.Path(directory)
    if not d.exists():
        return None
    steps = []
    for p in d.iterdir():
        if p.is_dir() and p.name.startswith("step_"):
            try:
                steps.append(int(p.name.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_checkpoint(directory: str | pathlib.Path, template: Any,
                       step: Optional[int] = None,
                       sharding=None) -> Any:
    """Restore the pytree saved at ``step`` (default: latest).

    ``template`` provides structure/dtypes. If ``sharding`` is given (a
    NamedSharding or pytree of them), arrays are restored directly onto that
    sharding — this is how a checkpoint written on one mesh is resharded
    onto another.
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = pathlib.Path(directory).absolute() / f"step_{step}"

    def spec(x):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        s = sharding
        if s is not None and not isinstance(
                s, jax.sharding.Sharding):  # pytree of shardings
            raise ValueError("pass a single sharding or None")
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

    target = jax.tree.map(spec, template)
    with _checkpointer() as ckptr:
        return ckptr.restore(path, target)
