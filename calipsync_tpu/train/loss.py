"""Training losses: L1 + weighted VGG19 perceptual.

Matches /root/reference/step2_train_unet.py:79,110-112: total =
L1(pred, label) + 0.1 * MSE(vgg(pred), stop_grad(vgg(label))) with VGG19
truncated at conv3_3 and fed raw [0,1] RGB (no ImageNet normalization).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from calipsync_tpu.nn.vgg import VGG19Features


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def perceptual_loss(vgg_variables, pred: jax.Array,
                    target: jax.Array,
                    dtype=None) -> jax.Array:
    vgg = VGG19Features(dtype=dtype)
    f_pred = vgg.apply(vgg_variables, pred)
    f_target = jax.lax.stop_gradient(vgg.apply(vgg_variables, target))
    return jnp.mean(jnp.square(f_pred.astype(jnp.float32) -
                               f_target.astype(jnp.float32)))


def generator_loss(pred: jax.Array, target: jax.Array,
                   vgg_variables: Optional[dict] = None,
                   perceptual_weight: float = 0.1,
                   dtype=None) -> tuple[jax.Array, dict]:
    """Total loss + per-term metrics. vgg_variables=None disables the
    perceptual term (weight effectively 0)."""
    pix = l1_loss(pred, target)
    metrics = {"loss_pixel": pix}
    total = pix
    if vgg_variables is not None and perceptual_weight > 0:
        per = perceptual_loss(vgg_variables, pred, target, dtype=dtype)
        metrics["loss_perceptual"] = per
        total = total + perceptual_weight * per
    metrics["loss"] = total
    return total, metrics
