"""Output-fidelity evaluation: PSNR / perceptual distance / parity harness.

The driver target is "PSNR/LPIPS parity with the PyTorch reference"
(BASELINE.md). The reference publishes no fidelity numbers and its example
clip is stripped from the snapshot, so this module provides the
measurement tooling:

  - :func:`psnr` / :func:`batch_psnr` on uint8 or [0,1] float frames
  - :func:`vgg_distance`: LPIPS-style perceptual distance using the same
    VGG19-conv3_3 features the training loss uses (normalized MSE in
    feature space)
  - :func:`generator_parity_report`: run our generator and the torch
    reference on identical inputs/weights and report PSNR + max error —
    the quantitative form of the golden tests in tests/test_unet_parity.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean(np.square(a - b)))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def batch_psnr(a: np.ndarray, b: np.ndarray,
               data_range: float = 255.0) -> np.ndarray:
    """Per-frame PSNR over leading dim."""
    return np.asarray([psnr(x, y, data_range) for x, y in zip(a, b)])


def vgg_distance(vgg_variables: dict, a: jax.Array, b: jax.Array) -> float:
    """Perceptual distance in VGG19-conv3_3 feature space ([0,1] RGB
    NHWC inputs); lower is closer. LPIPS-class metric built from the
    in-repo feature net (no external LPIPS weights in this image)."""
    from calipsync_tpu.nn.vgg import VGG19Features

    net = VGG19Features()
    fa = net.apply(vgg_variables, jnp.asarray(a, jnp.float32))
    fb = net.apply(vgg_variables, jnp.asarray(b, jnp.float32))
    fa = fa / (jnp.linalg.norm(fa, axis=-1, keepdims=True) + 1e-10)
    fb = fb / (jnp.linalg.norm(fb, axis=-1, keepdims=True) + 1e-10)
    return float(jnp.mean(jnp.square(fa - fb)))


def lpips_distance(lpips_variables: dict, a, b, net: str = "vgg",
                   module=None) -> np.ndarray:
    """Real LPIPS (Zhang et al. 2018) between two NHWC RGB [0,1] or uint8
    frame batches -> per-frame distances (B,). Pass variables imported from
    the standard checkpoints via :func:`calipsync_tpu.nn.lpips.import_lpips`
    (learned metric), or from :func:`make_default_lpips` (deterministic
    no-weights fallback: random trunk + uniform heads)."""
    from calipsync_tpu.nn.lpips import LPIPS

    def to01(x):
        x = jnp.asarray(x)
        return x.astype(jnp.float32) / (255.0 if x.dtype == jnp.uint8
                                        else 1.0)

    if module is not None:
        fn = jax.jit(lambda v, x, y: module.apply(v, x, y))
    else:
        fn = _lpips_apply_fn(net)
    return np.asarray(fn(lpips_variables, to01(a), to01(b)))


@functools.lru_cache(maxsize=4)
def _lpips_apply_fn(net: str):
    """One jitted apply per net variant — repeated lpips_distance calls
    (chunked video eval) reuse the trace instead of re-jitting a fresh
    lambda every call."""
    from calipsync_tpu.nn.lpips import LPIPS

    module = LPIPS(net=net)
    return jax.jit(lambda v, x, y: module.apply(v, x, y))


def make_default_lpips(net: str = "vgg", seed: int = 0,
                       image_size: int = 64):
    """LPIPS module + deterministic variables without external weights:
    seeded random trunk (random deep features are a known usable perceptual
    proxy) and uniform 1/C linear heads (plain unit-normalized feature MSE
    per tap). Replace with imported real weights when available."""
    from calipsync_tpu.nn.lpips import LPIPS

    module = LPIPS(net=net)
    x = jnp.zeros((1, image_size, image_size, 3))
    variables = module.init(jax.random.key(seed), x, x)
    params = dict(variables["params"])
    for k in list(params):
        if k.startswith("lin"):
            kern = params[k]["kernel"]
            params[k] = {"kernel": jnp.full_like(kern, 1.0 / kern.shape[2])}
    return module, {"params": params}


def generator_parity_report(reference_torch_model,
                            batch: int = 2, seed: int = 0,
                            dtype=None) -> dict:
    """Same weights + inputs through torch reference and our generator.

    Returns {'psnr_db', 'max_abs_err', 'mean_abs_err'} over the sigmoid
    outputs scaled to [0,255]. fp32 runs should exceed 60 dB; bf16
    (dtype=jnp.bfloat16) quantifies the serving-precision cost.
    """
    import torch

    from calipsync_tpu.core.weights import (import_generator,
                                            torch_state_dict_to_numpy)
    from calipsync_tpu.nn.unet import Generator

    rng = np.random.default_rng(seed)
    x = rng.random((batch, 6, 160, 160), dtype=np.float32)
    a = rng.standard_normal((batch, 32, 32, 32)).astype(np.float32)

    reference_torch_model = reference_torch_model.eval()
    with torch.no_grad():
        ref = reference_torch_model(torch.from_numpy(x),
                                    torch.from_numpy(a)).numpy()

    variables = import_generator(
        torch_state_dict_to_numpy(reference_torch_model))
    model = Generator(dtype=dtype)
    ours = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(a.transpose(0, 2, 3, 1)), train=False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)

    err = np.abs(ours - ref) * 255.0
    return {"psnr_db": psnr(ours * 255.0, ref * 255.0),
            "max_abs_err": float(err.max()),
            "mean_abs_err": float(err.mean())}
