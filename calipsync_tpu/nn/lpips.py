"""LPIPS perceptual metric (Zhang et al. 2018), TPU-native.

BASELINE.md's fidelity target is "PSNR/LPIPS parity". This is the real
LPIPS network — a frozen classification trunk (VGG16 or AlexNet) tapped at
the standard five stages, unit-normalized per channel, squared-difference,
learned 1x1 linear heads, spatial average, summed over stages — not the
single-layer VGG19 proxy in :mod:`calipsync_tpu.eval` (kept there as the
no-weights fallback).

Weight importers accept the two standard checkpoint layouts:
  - torchvision ``vgg16``/``alexnet`` state_dicts (``features.N.weight``)
    for the trunk, and
  - the ``lpips`` package's learned heads (``lin{k}.model.1.weight``,
    shape (1, C, 1, 1)) for the linear layers.

Inputs are NHWC RGB in [0, 1]; internally shifted to the LPIPS [-1, 1]
convention and normalized by the published shift/scale constants. The
whole metric is one jittable function (trunk + heads fuse into a single
XLA program; everything is conv/elementwise, MXU-friendly).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# LPIPS ScalingLayer constants (RGB, [-1,1] inputs).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (torchvision features conv indices per stage, channels per stage)
_VGG16_STAGES: Tuple[Tuple[Tuple[int, ...], int], ...] = (
    ((0, 2), 64), ((5, 7), 128), ((10, 12, 14), 256),
    ((17, 19, 21), 512), ((24, 26, 28), 512))
# AlexNet: (conv index, out_ch, kernel, stride, pad, maxpool-before)
_ALEX_LAYERS = (
    (0, 64, 11, 4, 2, False),
    (3, 192, 5, 1, 2, True),
    (6, 384, 3, 1, 1, True),
    (8, 256, 3, 1, 1, False),
    (10, 256, 3, 1, 1, False),
)


class VGG16Trunk(nn.Module):
    """torchvision VGG16 ``features`` prefix; returns the five LPIPS taps
    (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> Sequence[jax.Array]:
        taps = []
        for si, (convs, width) in enumerate(_VGG16_STAGES):
            if si:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci in convs:
                x = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{ci}")(x)
                x = jax.nn.relu(x)
            taps.append(x)
        return taps


class AlexTrunk(nn.Module):
    """torchvision AlexNet ``features``; returns the five post-ReLU taps."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> Sequence[jax.Array]:
        taps = []
        for ci, width, k, s, p, pool in _ALEX_LAYERS:
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(width, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{ci}")(x)
            x = jax.nn.relu(x)
            taps.append(x)
        return taps


class LPIPS(nn.Module):
    """lpips(a, b) for NHWC RGB in [0,1] -> per-example distance (B,).

    Math per richzhang/PerceptualSimilarity ``lpips.LPIPS`` (eval mode):
    scale inputs, run the trunk, unit-normalize each tap over channels
    (eps 1e-10), squared difference, 1x1 linear head per tap (bias-free,
    non-negative weights in the released checkpoints), mean over space,
    sum over taps.
    """

    net: str = "vgg"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        trunk = (VGG16Trunk(dtype=self.dtype, name="trunk")
                 if self.net == "vgg"
                 else AlexTrunk(dtype=self.dtype, name="trunk"))
        shift = jnp.asarray((_SHIFT + 1.0) / 2.0)  # fold [0,1]->[-1,1] in
        scale = jnp.asarray(_SCALE / 2.0)

        def prep(x):
            return (x.astype(self.dtype or jnp.float32) - shift) / scale

        taps_a = trunk(prep(a))
        taps_b = trunk(prep(b))
        total = 0.0
        for k, (fa, fb) in enumerate(zip(taps_a, taps_b)):
            # torch normalize_tensor: x / (||x||_channels + 1e-10)
            na = fa / (jnp.sqrt(jnp.sum(jnp.square(fa), -1,
                                        keepdims=True)) + 1e-10)
            nb = fb / (jnp.sqrt(jnp.sum(jnp.square(fb), -1,
                                        keepdims=True)) + 1e-10)
            diff = jnp.square(na - nb)
            head = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32, name=f"lin{k}")
            total = total + jnp.mean(head(diff), axis=(1, 2, 3))
        return total.astype(jnp.float32)


def import_lpips(trunk_sd, heads_sd, net: str = "vgg") -> dict:
    """(torchvision trunk state_dict, lpips-package heads state_dict) ->
    flax variables for :class:`LPIPS`. Raises KeyError on any missing key
    and ValueError if a state_dict has unused extra ``features``/``lin``
    keys (importer-coverage guarantee, VERDICT r1 item 9)."""
    used = set()

    def conv(sd, key):
        w = np.asarray(sd[f"{key}.weight"])
        used.add(f"{key}.weight")
        out = {"kernel": jnp.asarray(
            np.ascontiguousarray(w.transpose(2, 3, 1, 0)))}
        if f"{key}.bias" in sd:
            out["bias"] = jnp.asarray(np.asarray(sd[f"{key}.bias"]))
            used.add(f"{key}.bias")
        return out

    trunk = {}
    conv_ids = ([ci for convs, _ in _VGG16_STAGES for ci in convs]
                if net == "vgg" else [l[0] for l in _ALEX_LAYERS])
    for ci in conv_ids:
        trunk[f"conv{ci}"] = conv(trunk_sd, f"features.{ci}")
    extra = {k for k in trunk_sd if k.startswith("features.")} - used
    if extra:
        raise ValueError(f"unused trunk keys: {sorted(extra)[:4]}...")

    heads = {}
    used_h = set()
    for k in range(5):
        key = f"lin{k}.model.1.weight"
        w = np.asarray(heads_sd[key])  # (1, C, 1, 1)
        used_h.add(key)
        heads[f"lin{k}"] = {"kernel": jnp.asarray(
            np.ascontiguousarray(w.transpose(2, 3, 1, 0)))}
    extra_h = {k for k in heads_sd if "lin" in k and k.endswith("weight")} \
        - used_h
    if extra_h:
        raise ValueError(f"unused head keys: {sorted(extra_h)}")

    params = dict(heads)
    params["trunk"] = trunk
    return {"params": params}
