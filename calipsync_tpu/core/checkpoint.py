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


class PreemptionGuard:
    """Flag-only SIGTERM/SIGINT latch for checkpoint-at-a-safe-point.

    Preemptible TPU pools deliver SIGTERM with a grace window; the
    reference has no notion of this (it saves only at the final epoch,
    /root/reference/step2_train_unet.py:126-128). The handler just sets
    a flag — the training loop polls ``triggered`` at batch boundaries,
    saves a checkpoint and returns cleanly, so a preempted run resumes
    with ``resume=True`` instead of losing the whole run.

    Use as a context manager; previous handlers are restored on exit.
    A second signal while the flag is already set re-raises the default
    behavior (so a stuck save can still be killed).
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self.signals = (tuple(signals) if signals is not None
                        else (_signal.SIGTERM, _signal.SIGINT))
        self._prev = {}
        self._triggered = False

    @property
    def triggered(self) -> bool:
        return self._triggered

    def _handle(self, signum, frame):
        if self._triggered:  # second signal: escalate to the old handler
            prev = self._prev.get(signum)
            if not callable(prev) and prev not in (
                    self._signal.SIG_IGN, self._signal.SIG_DFL):
                # None = previous handler was installed from C (not
                # reinstallable via signal.signal) — default-terminate
                prev = self._signal.SIG_DFL
            self._signal.signal(signum, prev)
            self._signal.raise_signal(signum)
            return
        self._triggered = True

    def __enter__(self) -> "PreemptionGuard":
        import threading

        if threading.current_thread() is not threading.main_thread():
            return self  # handlers are installable from the main thread only
        for s in self.signals:
            self._prev[s] = self._signal.signal(s, self._handle)
        return self

    def __exit__(self, *exc) -> None:
        for s, prev in self._prev.items():
            self._signal.signal(s, prev)
        self._prev.clear()
