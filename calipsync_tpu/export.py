"""Model export + numeric parity harness.

The reference exports to ONNX and verifies with onnxruntime at
rtol 1e-3 / atol 1e-5 (/root/reference/module/unet.py:348-406). The
TPU-native story is StableHLO via ``jax.export``: serialize the jitted
forward, reload, and assert the same parity bar — usable as a deployment
artifact for any PJRT runtime.
"""

from __future__ import annotations

import pathlib
from typing import Any, Sequence

import jax
import numpy as np

PARITY_RTOL = 1e-3  # the reference's own bar (module/unet.py:384-385)
PARITY_ATOL = 1e-5


def export_stablehlo(fn, example_args: Sequence[Any],
                     path: str | pathlib.Path) -> pathlib.Path:
    """Serialize jit(fn) on the example shapes to a StableHLO artifact."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    p = pathlib.Path(path)
    p.write_bytes(data)
    return p


def load_stablehlo(path: str | pathlib.Path):
    """Deserialize an exported artifact; returns a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(pathlib.Path(path).read_bytes())
    return exported.call


def check_export_parity(fn, example_args: Sequence[Any],
                        path: str | pathlib.Path) -> None:
    """Round-trip export and assert numeric parity (the reference's ONNX
    allclose check, generalized)."""
    reloaded = load_stablehlo(export_stablehlo(fn, example_args, path))
    want = jax.jit(fn)(*example_args)
    got = reloaded(*example_args)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=PARITY_RTOL,
            atol=PARITY_ATOL), want, got)


def export_generator(variables: dict, path: str | pathlib.Path,
                     batch: int = 1) -> pathlib.Path:
    """Export the flagship generator forward at a fixed batch size."""
    import jax.numpy as jnp

    from calipsync_tpu.nn.unet import Generator

    model = Generator()

    def fwd(variables, x, audio):
        return model.apply(variables, x, audio, train=False)

    return export_stablehlo(
        fwd, (variables, jnp.zeros((batch, 160, 160, 6)),
              jnp.zeros((batch, 32, 32, 32))), path)
