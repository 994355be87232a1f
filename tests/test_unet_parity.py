"""Golden parity: calipsync_tpu Generator vs. the PyTorch reference.

The reference's own numeric bar is rtol 1e-3 / atol 1e-5 (its ONNX export
check, /root/reference/module/unet.py:384-385). We hold the JAX model to the
same bar in fp32 eval mode, with randomized weights AND randomized BatchNorm
running stats (catches mean/var mapping and conv-bias folding bugs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calipsync_tpu.core.weights import (import_generator,
                                        torch_state_dict_to_numpy)
from calipsync_tpu.nn.unet import Generator

RTOL, ATOL = 1e-3, 1e-5


def _randomize_state_dict(model, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            new[k] = v
        elif k.endswith("running_var"):
            new[k] = torch.rand(v.shape, generator=g) * 1.5 + 0.25
        elif k.endswith("running_mean"):
            new[k] = torch.randn(v.shape, generator=g) * 0.2
        elif k.endswith("gamma"):
            new[k] = torch.randn(v.shape, generator=g) * 0.5
        else:
            new[k] = torch.randn(v.shape, generator=g) * 0.1
    model.load_state_dict(new)
    return model


def test_generator_matches_reference(reference_modules):
    import torch

    batch = 3
    ref = reference_modules.Model(6, "hubert").eval()
    _randomize_state_dict(ref, seed=7)

    rng = np.random.default_rng(0)
    x_nchw = rng.standard_normal((batch, 6, 160, 160)).astype(np.float32)
    a_nchw = rng.standard_normal((batch, 32, 32, 32)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_nchw),
                      torch.from_numpy(a_nchw)).numpy()

    variables = import_generator(torch_state_dict_to_numpy(ref))
    model = Generator(n_channels=6, mode="hubert")
    apply = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))
    out = apply(variables,
                jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
                jnp.asarray(a_nchw.transpose(0, 2, 3, 1)))
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(out_nchw, ref_out, rtol=RTOL, atol=ATOL)


def test_generator_param_count():
    """Reference headline: 19.79M params (README.md:41, verified 19.794M)."""
    model = Generator(n_channels=6, mode="hubert")
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert abs(n - 19_794_000) / 19_794_000 < 0.01, n


def test_generator_forward_shapes_and_train_mode():
    model = Generator(n_channels=6, mode="hubert")
    x = jnp.zeros((2, 160, 160, 6))
    a = jnp.zeros((2, 32, 32, 32))
    variables = jax.jit(model.init)(jax.random.key(0), x, a)
    out = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))(
        variables, x, a)
    assert out.shape == (2, 160, 160, 3)
    assert out.dtype == jnp.float32

    out, updates = jax.jit(lambda v, x, a: model.apply(
        v, x, a, train=True, mutable=["batch_stats"]))(variables, x, a)
    assert out.shape == (2, 160, 160, 3)
    assert "batch_stats" in updates


def test_wenet_mode_shapes():
    model = Generator(n_channels=6, mode="wenet")
    x = jnp.zeros((1, 160, 160, 6))
    a = jnp.zeros((1, 16, 32, 256))  # wenet features, NHWC
    variables = jax.jit(model.init)(jax.random.key(0), x, a)
    out = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))(
        variables, x, a)
    assert out.shape == (1, 160, 160, 3)


def test_generator_wenet_matches_reference(reference_modules):
    """Golden parity for the WENET audio branch (AudioConvWenet path +
    256-channel feature layout), same bar as the hubert test."""
    import torch

    batch = 2
    ref = reference_modules.Model(6, "wenet").eval()
    _randomize_state_dict(ref, seed=11)

    rng = np.random.default_rng(4)
    x_nchw = rng.standard_normal((batch, 6, 160, 160)).astype(np.float32)
    a_nchw = rng.standard_normal((batch, 256, 16, 32)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_nchw),
                      torch.from_numpy(a_nchw)).numpy()

    variables = import_generator(torch_state_dict_to_numpy(ref),
                                 mode="wenet")
    model = Generator(n_channels=6, mode="wenet")
    apply = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))
    out = apply(variables, jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
                jnp.asarray(a_nchw.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref_out, rtol=RTOL, atol=ATOL)
