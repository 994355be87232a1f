"""PFLD-GhostOne landmark regressor with MobileOne reparameterization.

TPU-native rebuild of the reference's 0.878M-param landmark net
(/root/reference/utils/lip_detector/tools/pfld_mobileone.py:12-133 and
base_module.py:87-420): a GhostNet-style backbone whose convs are MobileOne
blocks — multi-branched (num_branches x conv-BN + 1x1 scale-BN + skip-BN) at
train time, folded to single convs for inference.

The fold is a *pure param-pytree transform* (:func:`fold_mobileone_params`,
SURVEY.md section 7 "hard parts" (6)): the same flax module runs in either
form via ``deploy=True/False``, and folded inference is what the serving
path uses (one conv per block = far fewer kernels for XLA to launch).

Forward contract: (B, 192, 192, 3) RGB in [0,1] -> (B, 220) landmark
residuals (add mean_face, reshape (110, 2); see vision/lip_detector.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

NUM_BRANCHES = 6  # reference pfld_mobileone.py:17


class MobileOneBlock(nn.Module):
    """Multi-branch (train) / single-conv (deploy) MobileOne block."""

    features: int
    kernel: int = 3
    stride: int = 1
    depthwise: bool = False
    linear: bool = False
    branches: int = NUM_BRANCHES
    deploy: bool = False
    dtype: Optional[Dtype] = None

    def _act(self, x):
        return x if self.linear else jax.nn.relu(x)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inp = x.shape[-1]
        groups = inp if self.depthwise else 1
        pad = self.kernel // 2
        conv_kw = dict(strides=(self.stride, self.stride),
                       feature_group_count=groups, dtype=self.dtype,
                       param_dtype=jnp.float32)

        if self.deploy:
            y = nn.Conv(self.features, (self.kernel, self.kernel),
                        padding=((pad, pad), (pad, pad)), use_bias=True,
                        name="reparam", **conv_kw)(x)
            return self._act(y)

        def conv_bn(name, k, p):
            y = nn.Conv(self.features, (k, k), padding=((p, p), (p, p)),
                        use_bias=False, name=f"{name}_conv", **conv_kw)(x)
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=f"{name}_bn")(y)

        out = sum(conv_bn(f"branch{i}", self.kernel, pad)
                  for i in range(self.branches))
        if self.kernel > 1:
            out = out + conv_bn("scale", 1, 0)
        if inp == self.features and self.stride == 1:
            out = out + nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name="skip_bn")(x)
        return self._act(out)


class GhostOneModule(nn.Module):
    """primary 1x1 -> cheap depthwise 3x3, channel-concat halves."""

    features: int
    linear: bool = False
    deploy: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        half = math.ceil(self.features / 2)
        x1 = MobileOneBlock(half, kernel=1, linear=self.linear,
                            deploy=self.deploy, dtype=self.dtype,
                            name="primary")(x, train)
        x2 = MobileOneBlock(half, kernel=3, depthwise=True,
                            linear=self.linear, deploy=self.deploy,
                            dtype=self.dtype, name="cheap")(x1, train)
        return jnp.concatenate([x1, x2], axis=-1)


class GhostOneBottleneck(nn.Module):
    hidden: int
    features: int
    stride: int = 1
    deploy: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = GhostOneModule(self.hidden, linear=False, deploy=self.deploy,
                           dtype=self.dtype, name="ghost1")(x, train)
        if self.stride == 2:
            x = MobileOneBlock(self.hidden, kernel=3, stride=2,
                               depthwise=True, linear=True,
                               deploy=self.deploy, dtype=self.dtype,
                               name="down")(x, train)
        return GhostOneModule(self.features, linear=True,
                              deploy=self.deploy, dtype=self.dtype,
                              name="ghost2")(x, train)


def _w(v: float, width: float = 0.5) -> int:
    return int(v * width)


class PFLDGhostOne(nn.Module):
    """The landmark net. ``deploy=True`` expects folded params."""

    width: float = 0.5
    input_size: int = 192
    landmarks: int = 110
    deploy: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        w, d, dt = self.width, self.deploy, self.dtype
        kw = dict(deploy=d, dtype=dt)
        x = x.astype(dt or x.dtype)

        x = MobileOneBlock(_w(64, w), kernel=3, stride=2,
                           name="conv1", **kw)(x, train)
        x = MobileOneBlock(_w(64, w), kernel=3, stride=1, depthwise=True,
                           name="conv2", **kw)(x, train)
        x1 = jnp.mean(x, axis=(1, 2))

        x = GhostOneBottleneck(_w(96, w), _w(80, w), 2,
                               name="conv3_1", **kw)(x, train)
        x = GhostOneBottleneck(_w(120, w), _w(80, w), 1,
                               name="conv3_2", **kw)(x, train)
        x = GhostOneBottleneck(_w(120, w), _w(80, w), 1,
                               name="conv3_3", **kw)(x, train)
        x2 = jnp.mean(x, axis=(1, 2))

        x = GhostOneBottleneck(_w(200, w), _w(96, w), 2,
                               name="conv4_1", **kw)(x, train)
        x = GhostOneBottleneck(_w(240, w), _w(96, w), 1,
                               name="conv4_2", **kw)(x, train)
        x = GhostOneBottleneck(_w(240, w), _w(96, w), 1,
                               name="conv4_3", **kw)(x, train)
        x3 = jnp.mean(x, axis=(1, 2))

        x = GhostOneBottleneck(_w(336, w), _w(144, w), 2,
                               name="conv5_1", **kw)(x, train)
        x = GhostOneBottleneck(_w(504, w), _w(144, w), 1,
                               name="conv5_2", **kw)(x, train)
        x = GhostOneBottleneck(_w(504, w), _w(144, w), 1,
                               name="conv5_3", **kw)(x, train)
        x = GhostOneBottleneck(_w(504, w), _w(144, w), 1,
                               name="conv5_4", **kw)(x, train)
        x4 = jnp.mean(x, axis=(1, 2))

        x = GhostOneBottleneck(_w(216, w), _w(16, w), 1,
                               name="conv6", **kw)(x, train)
        x = MobileOneBlock(_w(32, w), kernel=3, stride=1,
                           name="conv7", **kw)(x, train)
        # conv8: k=input_size//16 valid conv, no BN, no bias, ReLU
        k8 = self.input_size // 16
        x = nn.Conv(_w(128, w), (k8, k8), padding="VALID", use_bias=False,
                    dtype=dt, param_dtype=jnp.float32, name="conv8")(x)
        x = jax.nn.relu(x)
        x5 = x[:, 0, 0, :]

        multi = jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)
        out = nn.Dense(self.landmarks * 2, use_bias=True, dtype=dt,
                       param_dtype=jnp.float32, name="conv_out")(multi)
        return out.astype(jnp.float32)


class AuxiliaryNet(nn.Module):
    """FPN auxiliary head used when training PFLD (reference
    pfld_mobileone.py:252-286): 1x1 laterals at four backbone stages,
    top-down nearest upsampling with 3x3 merges, 1-channel output map.
    Conv-BN-ReLU blocks without bias (Conv_Block, base_module.py:12-17).
    """

    width: float = 1.0
    dtype: Optional[Dtype] = None

    def _cbr(self, x, feats, k, name, train):
        pad = k // 2
        y = nn.Conv(feats, (k, k), padding=((pad, pad), (pad, pad)),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"{name}_conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"{name}_bn")(y)
        return jax.nn.relu(y)

    @nn.compact
    def __call__(self, out1, out2, out3, out4, train: bool = False):
        w = int(64 * self.width)
        o1 = self._cbr(out1, w, 1, "conv1", train)
        o2 = self._cbr(out2, w, 1, "conv2", train)
        o3 = self._cbr(out3, w, 1, "conv3", train)
        o4 = self._cbr(out4, w, 1, "conv4", train)

        def up_to(x, ref):
            b, h, w_, c = x.shape
            rh, rw = ref.shape[1], ref.shape[2]
            return jax.image.resize(x, (b, rh, rw, c), method="nearest")

        o3 = self._cbr(o3 + up_to(o4, o3), w, 3, "merge3", train)
        o2 = self._cbr(o2 + up_to(o3, o2), w, 3, "merge2", train)
        o1 = self._cbr(o1 + up_to(o2, o1), w, 3, "merge1", train)
        return self._cbr(o1, 1, 1, "conv_out", train)


# ---------------------------------------------------------------------------
# Reparameterization: fold multi-branch params -> deploy params
# ---------------------------------------------------------------------------

def _fuse_conv_bn(kernel, bn_p, bn_s, eps=1e-5):
    std = np.sqrt(np.asarray(bn_s["var"]) + eps)
    t = np.asarray(bn_p["scale"]) / std
    fused_k = np.asarray(kernel) * t[None, None, None, :]
    fused_b = np.asarray(bn_p["bias"]) - np.asarray(bn_s["mean"]) * t
    return fused_k, fused_b


def _fold_block(params: dict, stats: dict) -> dict:
    """One MobileOneBlock's train-form params -> {'reparam': {kernel,bias}}."""
    branch_names = sorted(k[: -len("_conv")] for k in params
                          if k.startswith("branch") and k.endswith("_conv"))
    k0 = np.asarray(params[f"{branch_names[0]}_conv"]["kernel"])
    kh, kw, in_per_group, out = k0.shape

    kernel = np.zeros_like(k0)
    bias = np.zeros((out,), np.float32)
    for b in branch_names:
        fk, fb = _fuse_conv_bn(params[f"{b}_conv"]["kernel"],
                               params[f"{b}_bn"], stats[f"{b}_bn"])
        kernel += fk
        bias += fb
    if "scale_conv" in params:
        fk, fb = _fuse_conv_bn(params["scale_conv"]["kernel"],
                               params["scale_bn"], stats["scale_bn"])
        pad = kh // 2
        kernel += np.pad(fk, ((pad, pad), (pad, pad), (0, 0), (0, 0)))
        bias += fb
    if "skip_bn" in params:
        ident = np.zeros((kh, kw, in_per_group, out), np.float32)
        c = kh // 2
        for o in range(out):
            ident[c, c, o % in_per_group, o] = 1.0
        fk, fb = _fuse_conv_bn(ident, params["skip_bn"], stats["skip_bn"])
        kernel += fk
        bias += fb
    return {"reparam": {"kernel": jnp.asarray(kernel),
                        "bias": jnp.asarray(bias)}}


def _is_mobileone(p: dict) -> bool:
    return isinstance(p, dict) and any(
        k.startswith("branch") and k.endswith("_conv") for k in p)


def fold_mobileone_params(variables: dict) -> dict:
    """Train-form {'params', 'batch_stats'} -> deploy-form {'params'}.

    Walks the pytree, replacing every MobileOne block subtree with its
    folded single conv. Mathematically exact (RepVGG-style BN fusion);
    matches the reference's ``reparameterize()``
    (base_module.py:299-361) up to float rounding.
    """
    def walk(p, s):
        if _is_mobileone(p):
            return _fold_block(p, s or {})
        if isinstance(p, dict):
            return {k: walk(v, (s or {}).get(k)) for k, v in p.items()}
        return p

    return {"params": walk(variables["params"],
                           variables.get("batch_stats", {}))}


# ---------------------------------------------------------------------------
# Torch importer (train-form checkpoints, e.g. checkpoint_epoch_335.pth.tar)
# ---------------------------------------------------------------------------

def import_pfld(sd, width: float = 0.5) -> dict:
    """Reference train-mode PFLD state_dict -> flax train-form variables.

    The checkpoint dict is keyed 'pfld_backbone'
    (/root/reference/utils/lip_detector/lip_detector.py:24-25); pass that
    sub-dict. The unused 'localization' STN branch is ignored.
    """
    def conv_k(k):
        return np.ascontiguousarray(np.asarray(sd[k]).transpose(2, 3, 1, 0))

    def bn(prefix):
        return ({"scale": np.asarray(sd[f"{prefix}.weight"]),
                 "bias": np.asarray(sd[f"{prefix}.bias"])},
                {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
                 "var": np.asarray(sd[f"{prefix}.running_var"])})

    def mobileone(tp):
        p, s = {}, {}
        i = 0
        while f"{tp}.rbr_conv.{i}.conv.weight" in sd:
            p[f"branch{i}_conv"] = {
                "kernel": conv_k(f"{tp}.rbr_conv.{i}.conv.weight")}
            p[f"branch{i}_bn"], s[f"branch{i}_bn"] = bn(
                f"{tp}.rbr_conv.{i}.bn")
            i += 1
        if f"{tp}.rbr_scale.conv.weight" in sd:
            p["scale_conv"] = {"kernel": conv_k(f"{tp}.rbr_scale.conv.weight")}
            p["scale_bn"], s["scale_bn"] = bn(f"{tp}.rbr_scale.bn")
        if f"{tp}.rbr_skip.weight" in sd:
            p["skip_bn"], s["skip_bn"] = bn(f"{tp}.rbr_skip")
        return p, s

    def ghost_module(tp):
        p, s = {}, {}
        p["primary"], s["primary"] = mobileone(f"{tp}.primary_conv")
        p["cheap"], s["cheap"] = mobileone(f"{tp}.cheap_operation")
        return p, s

    def bottleneck(tp, stride):
        p, s = {}, {}
        p["ghost1"], s["ghost1"] = ghost_module(f"{tp}.ghost_conv.0")
        if stride == 2:
            p["down"], s["down"] = mobileone(f"{tp}.ghost_conv.1")
        p["ghost2"], s["ghost2"] = ghost_module(f"{tp}.ghost_conv.2")
        return p, s

    params: dict = {}
    stats: dict = {}
    params["conv1"], stats["conv1"] = mobileone("conv1")
    params["conv2"], stats["conv2"] = mobileone("conv2")
    strides = {"conv3_1": 2, "conv3_2": 1, "conv3_3": 1,
               "conv4_1": 2, "conv4_2": 1, "conv4_3": 1,
               "conv5_1": 2, "conv5_2": 1, "conv5_3": 1, "conv5_4": 1,
               "conv6": 1}
    for name, s2 in strides.items():
        params[name], stats[name] = bottleneck(name, s2)
    params["conv7"], stats["conv7"] = mobileone("conv7")
    params["conv8"] = {"kernel": conv_k("conv8.0.weight")}
    # conv_out is 1x1 conv in torch; our flax head is a Dense on the pooled
    # vector — same math. torch (O, I, 1, 1) -> (I, O)
    w = np.asarray(sd["conv_out.weight"])[:, :, 0, 0]
    params["conv_out"] = {"kernel": np.ascontiguousarray(w.T),
                          "bias": np.asarray(sd["conv_out.bias"])}

    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    return {"params": to_j(params), "batch_stats": to_j(stats)}
