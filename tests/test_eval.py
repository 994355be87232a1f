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
