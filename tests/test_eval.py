"""Fidelity metrics + quantitative generator parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calipsync_tpu.eval import (batch_psnr, generator_parity_report, psnr,
                                vgg_distance)


def test_psnr_basics():
    a = np.full((16, 16, 3), 100, np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] += 10
    assert 40 < psnr(a, b) < 100
    assert batch_psnr(a[None], b[None]).shape == (1,)


def test_vgg_distance_orders_similarity():
    from calipsync_tpu.nn.vgg import VGG19Features

    vgg_vars = jax.jit(VGG19Features().init)(jax.random.key(0),
                                             jnp.zeros((1, 64, 64, 3)))
    rng = np.random.default_rng(0)
    a = rng.random((1, 64, 64, 3), dtype=np.float32)
    near = np.clip(a + rng.normal(0, 0.01, a.shape).astype(np.float32),
                   0, 1)
    far = rng.random((1, 64, 64, 3), dtype=np.float32)
    d_same = vgg_distance(vgg_vars, a, a)
    d_near = vgg_distance(vgg_vars, a, near)
    d_far = vgg_distance(vgg_vars, a, far)
    assert d_same < 1e-10
    assert d_same < d_near < d_far


def test_sync_metrics_recovers_planted_offset():
    """Offset-scan mechanics: embedders that read a scalar signal out of
    the face crop and the audio window must recover a planted A/V shift.

    Face i carries signal s[i]; the feature rows carry s shifted by +3
    (audio leads video), so cos-sim between face i and audio window i+3
    peaks at offset +3."""
    from calipsync_tpu.eval import sync_metrics

    rng = np.random.default_rng(0)
    n, shift = 60, 3
    s = rng.standard_normal(n + 20).astype(np.float32)

    crops = np.zeros((n, 160, 160, 3), np.float32)
    crops[:, 0, 0, 0] = s[:n]
    feats = np.zeros((n, 2, 1024), np.float32)
    # row i carries the signal of video frame i - shift; windows average
    # rows around i, so correlation still peaks at o == +shift
    feats[shift:, 0, 0] = s[:n - shift]

    def toy_apply(_variables, faces, windows):
        # 2-D embeddings: (signal, 1) - cosine sim tracks signal product.
        # The window's CENTER row (frame i itself) packs its (0,0) value
        # at NHWC (0, 0, 16): rows (16,2,1024) -> NCHW (32,32,32) puts
        # row 8 (of [i-8, i+8)) at channels 16-17 (audio/windows.py).
        f = jnp.stack([faces[:, 0, 0, 0], jnp.ones(faces.shape[0])], 1)
        a = jnp.stack([windows[:, 0, 0, 16],
                       jnp.ones(windows.shape[0])], 1)
        return a, f

    report = sync_metrics({}, crops, feats, apply_fn=toy_apply,
                          max_offset=8)
    assert report["av_offset_frames"] == shift, report
    assert report["lse_c"] > 0.1, report
    assert report["sim_best"] > report["sim_at_zero"], report


def test_sync_metrics_real_syncnet_smoke():
    """The real SyncNet path: shapes, finiteness, sane ranges (random
    weights give relative scores only; mechanics are proven above)."""
    from calipsync_tpu.eval import sync_metrics
    from calipsync_tpu.nn.syncnet import SyncNet

    net = SyncNet(mode="hubert")
    variables = jax.jit(net.init)(jax.random.key(0),
                                  jnp.zeros((1, 160, 160, 3)),
                                  jnp.zeros((1, 32, 32, 32)))
    rng = np.random.default_rng(1)
    crops = rng.integers(0, 256, (10, 160, 160, 3), dtype=np.uint8)
    feats = rng.standard_normal((10, 2, 1024)).astype(np.float32)
    report = sync_metrics(variables, crops, feats, model=net,
                          max_offset=2, batch=4)
    assert report["n_frames"] == 10
    assert -2 <= report["av_offset_frames"] <= 2
    assert np.isfinite(report["lse_d"]) and np.isfinite(report["lse_c"])
    assert -1.0 <= report["sim_best"] <= 1.0


def test_generator_parity_fp32_exceeds_60db(reference_modules):
    ref = reference_modules.Model(6, "hubert")
    report = generator_parity_report(ref, batch=1)
    assert report["psnr_db"] > 60.0, report
    assert report["max_abs_err"] < 0.5, report  # < half a uint8 step


def test_generator_parity_bf16_documented(reference_modules):
    """bf16 serving precision: quantify, don't assume."""
    ref = reference_modules.Model(6, "hubert")
    report = generator_parity_report(ref, batch=1, dtype=jnp.bfloat16)
    # bf16 matmuls cost precision; require visually-lossless territory
    assert report["psnr_db"] > 35.0, report
