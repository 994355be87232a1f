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


def sync_metrics(syncnet_variables: dict, crops, features,
                 model=None, mode: str = "hubert", max_offset: int = 15,
                 batch: int = 64, apply_fn=None) -> dict:
    """LSE-style audio/visual sync scoring via a SyncNet offset scan.

    The reference uses its SyncNet only as a training filter
    (module/syncnet.py:357-361 cosine loss; train_utils 3-strikes rule);
    this gives the same embeddings an evaluation surface, following the
    standard SyncNet protocol (Chung & Zisserman; Wav2Lip's LSE-D/LSE-C):
    embed every frame and its audio window once, then scan integer frame
    offsets ``o`` in [-max_offset, max_offset] —

        sim(o) = mean_i cos(face_emb[i], audio_emb[i + o])

    Args:
      syncnet_variables: {'params','batch_stats'} for :class:`SyncNet`
        (imported real weights for meaningful absolute numbers).
      crops: (N, 160, 160, 3) uint8/float mouth crops, the generator's
        output convention (BGR [0,1] after /255).
      features: (T, 2, 1024) HuBERT rows (or WeNet rows), frame i's
        window taken exactly as training does (audio/windows.py).
      apply_fn: optional override (variables, faces, windows) ->
        (audio_emb, face_emb) — used by tests and custom encoders.

    Returns dict with:
      av_offset_frames: argmax offset (0 = in sync; positive = audio
        leads video by that many frames).
      lse_c: confidence = sim(best) - median over the scan (higher =
        stronger sync signal, Wav2Lip's LSE-C convention).
      lse_d: 1 - sim(best), a distance (lower is better).
      sim_at_zero / sim_best: raw mean cosine similarities.
    """
    from calipsync_tpu.audio.windows import batched_windows
    from calipsync_tpu.nn.syncnet import SyncNet

    crops = np.asarray(crops)
    n = len(crops)
    if crops.dtype == np.uint8:
        crops = crops.astype(np.float32) / 255.0
    if apply_fn is None:
        net = model or SyncNet(mode=mode)
        apply_fn = jax.jit(lambda v, f, a: net.apply(v, f, a, train=False))

    feats_dev = jnp.asarray(features, jnp.float32)
    a_parts, f_parts = [], []
    for start in range(0, n, batch):
        idx = np.arange(start, min(start + batch, n), dtype=np.int32)
        pad = batch - len(idx)
        windows = batched_windows(
            feats_dev, jnp.asarray(np.pad(idx, (0, pad))), mode=mode)
        faces = jnp.asarray(np.pad(crops[idx],
                                   ((0, pad), (0, 0), (0, 0), (0, 0))))
        a_emb, f_emb = apply_fn(syncnet_variables, faces, windows)
        a_parts.append(np.asarray(a_emb, np.float64)[:len(idx)])
        f_parts.append(np.asarray(f_emb, np.float64)[:len(idx)])
    a = np.concatenate(a_parts)
    f = np.concatenate(f_parts)
    a /= np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    f /= np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)

    offsets = np.arange(-max_offset, max_offset + 1)
    sims = np.full(len(offsets), -np.inf)
    for k, o in enumerate(offsets):
        lo, hi = max(0, -o), min(n, n - o)
        if hi - lo < 1:
            continue
        sims[k] = float(np.mean(np.sum(f[lo:hi] * a[lo + o:hi + o],
                                       axis=1)))
    best = int(np.argmax(sims))
    finite = sims[np.isfinite(sims)]
    return {
        "n_frames": n,
        "av_offset_frames": int(offsets[best]),
        "sim_best": round(float(sims[best]), 6),
        "sim_at_zero": round(float(sims[max_offset]), 6),
        "lse_c": round(float(sims[best] - np.median(finite)), 6),
        "lse_d": round(float(1.0 - sims[best]), 6),
    }


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
