"""Tracing, per-stage timers and compiled-cost analysis.

The reference's only instrumentation is wall-clock prints and thop FLOPs
(SURVEY.md section 5). Here: a reusable stage timer (same keys as the
synthesizer's stats), `jax.profiler` trace capture, and XLA cost analysis
of any jitted function — the TPU-native replacement for thop
(/root/reference/module/unet.py:392-394).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


def device_sync(tree) -> None:
    """Completion barrier that is reliable on remote backends.

    On the axon tunnel, ``jax.block_until_ready`` can return at
    dispatch-ack instead of execution completion (it was observed to
    no-op in processes that had not yet fetched any value), which makes
    naive timing measure only enqueue throughput. A 1-element
    device-to-host fetch of a value data-dependent on the output cannot
    return early. Use this (not ``block_until_ready``) to end any timed
    region.
    """
    import numpy as np

    leaf = jax.tree.leaves(tree)[0]
    idx = (0,) * getattr(leaf, "ndim", 0)
    np.asarray(jax.device_get(leaf[idx] if idx else leaf))


class StageTimer:
    """Accumulating wall-clock timers keyed by stage name."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_ms": round(1000 * v / max(1, self.counts[k]), 3)}
                for k, v in self.totals.items()}

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v['total_s']:.2f}s/{v['count']}x "
            f"({v['mean_ms']:.2f}ms)" for k, v in self.summary().items())


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn, *example_args, **example_kwargs) -> dict:
    """XLA cost analysis of jit(fn) on the example arguments.

    Returns {'flops', 'bytes_accessed', 'gflops'} (plus the raw analysis).
    The generator measures ~8.2 GFLOP/sample fwd (the reference's thop
    reports 4.08 G multiply-accumulates = the same compute).
    """
    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):  # per-device list on some backends
        analysis = analysis[0]
    analysis = dict(analysis or {})
    flops = float(analysis.get("flops", 0.0))
    return {"flops": flops, "gflops": flops / 1e9,
            "bytes_accessed": analysis.get("bytes accessed", 0.0),
            "raw": analysis}


def generator_cost(batch: int = 1) -> dict:
    """Cost analysis of the flagship generator forward."""
    import jax.numpy as jnp

    from calipsync_tpu.nn.unet import Generator

    model = Generator()
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))
    return compiled_cost(
        lambda v, x, a: model.apply(v, x, a, train=False), variables,
        jnp.zeros((batch, 160, 160, 6)), jnp.zeros((batch, 32, 32, 32)))
