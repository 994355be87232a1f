"""LPIPS metric: golden parity vs a torch implementation of the published
math, importer key coverage, and metric properties.

The real learned checkpoints (torchvision vgg16/alexnet + the lpips
package's linear heads) are not in this image, so the golden test builds
fixture state_dicts in their EXACT key layouts with random values and
compares our flax LPIPS against a minimal torch implementation of the
published forward (Zhang et al. 2018, richzhang/PerceptualSimilarity
lpips.py) — this pins the layout conversion (NCHW->NHWC transposes,
pooling/padding conventions) and the normalization/head/average math.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from calipsync_tpu.eval import lpips_distance, make_default_lpips
from calipsync_tpu.nn.lpips import (_ALEX_LAYERS, _VGG16_STAGES, LPIPS,
                                    import_lpips)

RTOL, ATOL = 1e-4, 1e-6


def _fixture_state_dicts(net: str, seed: int = 0):
    """Random weights in the torchvision + lpips-package key layouts."""
    import torch

    g = torch.Generator().manual_seed(seed)
    trunk = {}
    if net == "vgg":
        cin = 3
        convs = [(ci, w) for stage, w in _VGG16_STAGES for ci in stage]
        for ci, width in convs:
            trunk[f"features.{ci}.weight"] = torch.randn(
                (width, cin, 3, 3), generator=g) * 0.2
            trunk[f"features.{ci}.bias"] = torch.randn(
                (width,), generator=g) * 0.1
            cin = width
        chans = [w for _, w in _VGG16_STAGES]
    else:
        cin = 3
        for ci, width, k, _, _, _ in _ALEX_LAYERS:
            trunk[f"features.{ci}.weight"] = torch.randn(
                (width, cin, k, k), generator=g) * 0.2
            trunk[f"features.{ci}.bias"] = torch.randn(
                (width,), generator=g) * 0.1
            cin = width
        chans = [l[1] for l in _ALEX_LAYERS]
    heads = {f"lin{k}.model.1.weight":
             torch.rand((1, c, 1, 1), generator=g) * 0.1
             for k, c in enumerate(chans)}
    return trunk, heads


def _torch_lpips(trunk_sd, heads_sd, a01, b01, net: str):
    """Published LPIPS forward in torch (inputs NCHW [0,1])."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def trunk(x):
        taps = []
        if net == "vgg":
            for si, (convs, _) in enumerate(_VGG16_STAGES):
                if si:
                    x = F.max_pool2d(x, 2, 2)
                for ci in convs:
                    x = F.relu(F.conv2d(x, trunk_sd[f"features.{ci}.weight"],
                                        trunk_sd[f"features.{ci}.bias"],
                                        padding=1))
                taps.append(x)
        else:
            for ci, _, k, s, p, pool in _ALEX_LAYERS:
                if pool:
                    x = F.max_pool2d(x, 3, 2)
                x = F.relu(F.conv2d(x, trunk_sd[f"features.{ci}.weight"],
                                    trunk_sd[f"features.{ci}.bias"],
                                    stride=s, padding=p))
                taps.append(x)
        return taps

    def unit(x):
        return x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

    a = (2 * a01 - 1 - shift) / scale
    b = (2 * b01 - 1 - shift) / scale
    total = 0
    for k, (fa, fb) in enumerate(zip(trunk(a), trunk(b))):
        d = (unit(fa) - unit(fb)) ** 2
        total = total + F.conv2d(
            d, heads_sd[f"lin{k}.model.1.weight"]).mean(dim=(1, 2, 3))
    return total.numpy()


@pytest.mark.parametrize("net,size", [("vgg", 64), ("alex", 80)])
def test_lpips_matches_torch_math(net, size):
    import torch

    trunk_sd, heads_sd = _fixture_state_dicts(net, seed=3)
    rng = np.random.default_rng(1)
    a = rng.random((2, size, size, 3), dtype=np.float32)
    b = rng.random((2, size, size, 3), dtype=np.float32)

    with torch.no_grad():
        ref = _torch_lpips(trunk_sd, heads_sd,
                           torch.from_numpy(a.transpose(0, 3, 1, 2)),
                           torch.from_numpy(b.transpose(0, 3, 1, 2)), net)

    variables = import_lpips({k: v.numpy() for k, v in trunk_sd.items()},
                             {k: v.numpy() for k, v in heads_sd.items()},
                             net=net)
    ours = lpips_distance(variables, a, b, net=net)
    np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=ATOL)


def test_lpips_importer_key_coverage():
    """Importer must consume every trunk/head key and fail on extras or
    missing keys (real-checkpoint schema guarantee)."""
    trunk_sd, heads_sd = _fixture_state_dicts("vgg")
    trunk_np = {k: v.numpy() for k, v in trunk_sd.items()}
    heads_np = {k: v.numpy() for k, v in heads_sd.items()}
    import_lpips(trunk_np, heads_np)  # clean load

    with pytest.raises(ValueError, match="unused trunk"):
        import_lpips({**trunk_np, "features.99.weight":
                      np.zeros((1, 1, 1, 1), np.float32)}, heads_np)
    with pytest.raises(ValueError, match="unused head"):
        import_lpips(trunk_np, {**heads_np, "lin9.model.1.weight":
                                np.zeros((1, 1, 1, 1), np.float32)})
    missing = dict(trunk_np)
    missing.pop("features.0.weight")
    with pytest.raises(KeyError):
        import_lpips(missing, heads_np)


def test_lpips_properties_and_default_variables():
    """lpips(x,x)=0; distance grows with noise; uint8 inputs accepted."""
    module, variables = make_default_lpips(net="vgg", seed=0)
    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    d0 = lpips_distance(variables, x, x, module=module)
    np.testing.assert_allclose(d0, 0.0, atol=1e-7)

    small = np.clip(x.astype(np.int16) +
                    rng.integers(-8, 9, x.shape), 0, 255).astype(np.uint8)
    big = np.clip(x.astype(np.int16) +
                  rng.integers(-64, 65, x.shape), 0, 255).astype(np.uint8)
    d_small = lpips_distance(variables, x, small, module=module)
    d_big = lpips_distance(variables, x, big, module=module)
    assert np.all(d_small > 0) and np.all(d_big > d_small)
