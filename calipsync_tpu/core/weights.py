"""PyTorch -> JAX weight importers.

Converts reference PyTorch ``state_dict``s (e.g. the base UNet checkpoint
``checkpoint_e140.pth`` used at /root/reference/all_pipeline.py:131, or any
fine-tuned generator from /root/reference/step2_train_unet.py:126-128) into
the flax param/batch_stats pytrees used by calipsync_tpu models.

Layout conversions:
  torch Conv2d (O, I, kh, kw)          -> flax (kh, kw, I, O)
  torch depthwise (C, 1, kh, kw)       -> flax (kh, kw, 1, C)  [same transpose]
  torch Linear (O, I)                  -> flax (I, O)
  torch BatchNorm weight/bias/mean/var -> flax scale/bias + batch_stats

Conv biases that feed directly into a BatchNorm are *folded into the BN
running mean* (mean' = mean - bias): a pre-BN shift is exactly absorbed by
normalization in both train and eval mode, so our conv layers are bias-free
(one less fused op on TPU) while staying bit-equivalent in fp32.

All functions take a dict of numpy arrays (use :func:`load_torch_state_dict`
to read a .pth without importing torch at inference time elsewhere).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

Array = np.ndarray
SD = Mapping[str, Array]


def load_torch_state_dict(path: str, key: str | None = None
                          ) -> Dict[str, Array]:
    """Load a torch .pth/.pth.tar into numpy arrays (torch only needed here).

    Handles the reference's real checkpoint wrappers: a bare state_dict, a
    ``{'state_dict': ...}`` wrapper (image_infer_v1/models/unet.py:330-334),
    or — via ``key`` — a named sub-dict such as ``'pfld_backbone'`` in the
    landmark tar (utils/lip_detector/lip_detector.py:24-25).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None and isinstance(obj, dict) and key in obj:
        obj = obj[key]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict") and not isinstance(obj, dict):
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def torch_state_dict_to_numpy(module) -> Dict[str, Array]:
    """state_dict of a live torch module -> numpy dict (for tests)."""
    return {k: v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


def _conv_kernel(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _bn(sd: SD, p: str, fold_bias: Array | None = None) -> Tuple[dict, dict]:
    mean = np.asarray(sd[f"{p}.running_mean"])
    if fold_bias is not None:
        mean = mean - fold_bias
    params = {"scale": np.asarray(sd[f"{p}.weight"]),
              "bias": np.asarray(sd[f"{p}.bias"])}
    stats = {"mean": mean, "var": np.asarray(sd[f"{p}.running_var"])}
    return params, stats


def _conv_bn(sd: SD, conv_p: str, bn_p: str) -> Tuple[dict, dict]:
    """torch Conv2d (+optional bias) followed by BatchNorm2d -> ConvBNAct."""
    bias = sd.get(f"{conv_p}.bias")
    bn_params, bn_stats = _bn(sd, bn_p, fold_bias=bias)
    params = {"conv": {"kernel": _conv_kernel(np.asarray(sd[f"{conv_p}.weight"]))},
              "bn": bn_params}
    stats = {"bn": bn_stats}
    return params, stats


def _inverted_residual(sd: SD, p: str) -> Tuple[dict, dict]:
    """Reference InvertedResidual Sequential indices: 0/1 expand, 3/4 dw, 6/7 proj."""
    params, stats = {}, {}
    for name, ci, bi in (("expand", 0, 1), ("depthwise", 3, 4),
                         ("project", 6, 7)):
        pp, ss = _conv_bn(sd, f"{p}.conv.{ci}", f"{p}.conv.{bi}")
        params[name], stats[name] = pp, ss
    return params, stats


def _double_conv_dw(sd: SD, p: str) -> Tuple[dict, dict]:
    params, stats = {}, {}
    for name, i in (("ir1", 0), ("ir2", 1)):
        pp, ss = _inverted_residual(sd, f"{p}.double_conv.{i}")
        params[name], stats[name] = pp, ss
    return params, stats


def _conv_bias(sd: SD, p: str) -> dict:
    """Plain torch Conv2d with bias -> flax Conv params."""
    out = {"kernel": _conv_kernel(np.asarray(sd[f"{p}.weight"]))}
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _dense(sd: SD, p: str) -> dict:
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{p}.weight"]).T)}
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _audio_conv_hubert(sd: SD, p: str) -> Tuple[dict, dict]:
    params, stats = {}, {}
    for name in ("conv1", "conv2", "conv4", "conv6", "conv7"):
        params[name], stats[name] = _inverted_residual(sd, f"{p}.{name}")
    params["conv3"], stats["conv3"] = _conv_bn(sd, f"{p}.conv3", f"{p}.bn3")
    params["conv5"], stats["conv5"] = _conv_bn(sd, f"{p}.conv5", f"{p}.bn5")
    bn7_p, bn7_s = _bn(sd, f"{p}.bn7")
    params["bn7"], stats["bn7"] = bn7_p, bn7_s
    return params, stats


def _audio_conv_wenet(sd: SD, p: str) -> Tuple[dict, dict]:
    params, stats = {}, {}
    for name in ("conv1", "conv2", "conv4", "conv6", "conv7"):
        params[name], stats[name] = _inverted_residual(sd, f"{p}.{name}")
    params["conv3"], stats["conv3"] = _conv_bn(sd, f"{p}.conv3", f"{p}.bn3")
    params["conv5"], stats["conv5"] = _conv_bn(sd, f"{p}.conv5", f"{p}.bn5")
    return params, stats


def _mlp_fusion(sd: SD, p: str) -> Tuple[dict, dict]:
    params = {"fc1": _dense(sd, f"{p}.fc1"), "fc2": _dense(sd, f"{p}.fc2")}
    stats = {}
    for name, tp in (("bn1", f"{p}.bn1"), ("bn2", f"{p}.bn2")):
        pp, ss = _bn(sd, tp)
        params[name], stats[name] = pp, ss
    return params, stats


def _attention_block(sd: SD, p: str) -> Tuple[dict, dict]:
    params = {
        "proj_in": _conv_bias(sd, f"{p}.attention_adjust_p_1"),
        "proj_out": _conv_bias(sd, f"{p}.attention_adjust_b_1"),
        "attn": {
            "query": _conv_bias(sd, f"{p}.cross_attention.query_conv"),
            "key": _conv_bias(sd, f"{p}.cross_attention.key_conv"),
            "value": _conv_bias(sd, f"{p}.cross_attention.value_conv"),
            "gamma": np.asarray(sd[f"{p}.cross_attention.gamma"]),
        },
    }
    bn_p, bn_s = _bn(sd, f"{p}.bn")
    params["bn"] = bn_p
    return params, {"bn": bn_s}


def import_generator(sd: SD, mode: str = "hubert",
                     n_blocks: int = 4) -> Dict[str, dict]:
    """Reference ``Model`` state_dict -> {'params': ..., 'batch_stats': ...}.

    Key layout documented at /root/reference/module/unet.py:273-345.
    """
    params: dict = {}
    stats: dict = {}

    p, s = _inverted_residual(sd, "inc.inconv.0")
    params["inc"], stats["inc"] = {"ir": p}, {"ir": s}

    for i in range(1, 5):
        p, s = _double_conv_dw(sd, f"down{i}.maxpool_conv.0")
        params[f"down{i}"], stats[f"down{i}"] = {"conv": p}, {"conv": s}

    if mode == "hubert":
        p, s = _audio_conv_hubert(sd, "audio_model")
    else:
        p, s = _audio_conv_wenet(sd, "audio_model")
    params["audio_model"], stats["audio_model"] = p, s

    p, s = _mlp_fusion(sd, "mlp_fusion")
    params["mlp_fusion"], stats["mlp_fusion"] = p, s

    for name, tp in (("bn_tx", "bn_tx"), ("bn_kx", "bn_kx"),
                     ("outc_bn", "outc_bn")):
        pp, ss = _bn(sd, tp)
        params[name], stats[name] = pp, ss

    for i in range(n_blocks):
        p, s = _attention_block(sd, f"attention_blocks.{i}")
        params[f"attention_blocks_{i}"] = p
        stats[f"attention_blocks_{i}"] = s

    for name, i in (("fuse_conv1", 0), ("fuse_conv2", 1)):
        p, s = _double_conv_dw(sd, f"fuse_conv.{i}")
        params[name], stats[name] = p, s

    for i in range(1, 5):
        p, s = _double_conv_dw(sd, f"up{i}.conv")
        params[f"up{i}"], stats[f"up{i}"] = {"conv": p}, {"conv": s}

    params["outc"] = {"conv": _conv_bias(sd, "outc.conv")}

    import jax.numpy as jnp
    import jax

    to_jnp = lambda t: jax.tree.map(jnp.asarray, t)
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}
