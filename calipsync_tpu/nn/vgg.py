"""VGG19 feature extractor for the perceptual loss.

The reference's PerceptualLoss truncates torchvision VGG19 ``features`` at
layer index 14 (conv3_3, *without* its ReLU) and takes MSE between feature
maps of prediction and target in [0,1] RGB — no ImageNet normalization
(/root/reference/step2_train_unet.py:12-36). This is that network in flax
NHWC, with an importer for the ``vgg19-dcbb9e9d.pth`` state_dict layout
(keys ``features.N.weight`` / ``features.N.bias``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg19.features indices of the conv layers we keep, and whether
# a ReLU / 2x2 maxpool follows them inside the truncated prefix [0..14].
_LAYERS = (
    (0, 64, True, False),
    (2, 64, True, True),
    (5, 128, True, False),
    (7, 128, True, True),
    (10, 256, True, False),
    (12, 256, True, False),
    (14, 256, False, False),  # conv3_3: loss taps pre-activation
)


class VGG19Features(nn.Module):
    """conv1_1 .. conv3_3 prefix of VGG19, NHWC in [0,1]."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for idx, width, relu, pool in _LAYERS:
            x = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{idx}")(x)
            if relu:
                x = jax.nn.relu(x)
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def import_vgg19_features(sd) -> dict:
    """torch ``vgg19`` state_dict (or its ``features.``-prefixed subset) ->
    flax params for :class:`VGG19Features`."""
    def get(k):
        for cand in (k, f"features.{k}"):
            if cand in sd:
                return np.asarray(sd[cand])
        raise KeyError(k)

    params = {}
    for idx, _, _, _ in _LAYERS:
        w = get(f"{idx}.weight")
        params[f"conv{idx}"] = {
            "kernel": jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 1, 0))),
            "bias": jnp.asarray(get(f"{idx}.bias")),
        }
    return {"params": params}
