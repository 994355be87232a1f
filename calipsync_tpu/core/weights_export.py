"""JAX -> PyTorch generator weight export (inverse of core/weights.py).

Lets a generator trained here (step2, TPU) be served by the reference's
own torch stack: :func:`export_generator` produces a state_dict with the
reference ``Model``'s exact key set (/root/reference/module/unet.py:273-345,
582 keys for hubert/4 blocks), loadable with ``strict=True``.

Inverse layout conversions (see core/weights.py for the forward ones):
  flax conv kernel (kh, kw, I, O) -> torch Conv2d weight (O, I, kh, kw)
  flax dense kernel (I, O)        -> torch Linear weight (O, I)
  flax bn scale/bias + batch_stats mean/var -> torch BN
  weight/bias/running_mean/running_var (+ zero num_batches_tracked)

The import direction folds pre-BN conv biases into the BN running mean
(mean' = mean - bias), which is bit-exact; the inverse therefore emits a
ZERO bias for the two reference convs declared with bias=True ahead of a
BatchNorm (audio_model.conv3/conv5) and the folded mean as-is — the
loaded torch model computes identically.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Array = np.ndarray


def _np(x) -> Array:
    return np.asarray(x, dtype=np.float32)


def _conv_kernel_t(k) -> Array:
    """flax (kh, kw, I, O) -> torch (O, I, kh, kw)."""
    return np.ascontiguousarray(_np(k).transpose(3, 2, 0, 1))


def _bn_out(out: Dict[str, Array], p: str, params: Mapping,
            stats: Mapping) -> None:
    out[f"{p}.weight"] = _np(params["scale"])
    out[f"{p}.bias"] = _np(params["bias"])
    out[f"{p}.running_mean"] = _np(stats["mean"])
    out[f"{p}.running_var"] = _np(stats["var"])
    out[f"{p}.num_batches_tracked"] = np.zeros((), np.int64)


def _conv_bn_out(out: Dict[str, Array], conv_p: str, bn_p: str,
                 params: Mapping, stats: Mapping,
                 conv_has_bias: bool = False) -> None:
    """ConvBNAct -> torch conv + bn keys. ``conv_has_bias`` matches the
    reference nn.Conv2d declaration; the value is zero because the import
    folded it into the running mean (exactly equivalent)."""
    out[f"{conv_p}.weight"] = _conv_kernel_t(params["conv"]["kernel"])
    if conv_has_bias:
        out[f"{conv_p}.bias"] = np.zeros(
            out[f"{conv_p}.weight"].shape[0], np.float32)
    _bn_out(out, bn_p, params["bn"], stats["bn"])


def _ir_out(out: Dict[str, Array], p: str, params: Mapping,
            stats: Mapping) -> None:
    """InvertedResidual Sequential indices 0/1, 3/4, 6/7 (bias=False)."""
    for name, ci, bi in (("expand", 0, 1), ("depthwise", 3, 4),
                         ("project", 6, 7)):
        _conv_bn_out(out, f"{p}.conv.{ci}", f"{p}.conv.{bi}",
                     params[name], stats[name])


def _double_conv_out(out: Dict[str, Array], p: str, params: Mapping,
                     stats: Mapping) -> None:
    for name, i in (("ir1", 0), ("ir2", 1)):
        _ir_out(out, f"{p}.double_conv.{i}", params[name], stats[name])


def _conv_bias_out(out: Dict[str, Array], p: str, params: Mapping) -> None:
    out[f"{p}.weight"] = _conv_kernel_t(params["kernel"])
    if "bias" in params:
        out[f"{p}.bias"] = _np(params["bias"])


def _dense_out(out: Dict[str, Array], p: str, params: Mapping) -> None:
    out[f"{p}.weight"] = np.ascontiguousarray(_np(params["kernel"]).T)
    if "bias" in params:
        out[f"{p}.bias"] = _np(params["bias"])


def _audio_out(out: Dict[str, Array], p: str, params: Mapping,
               stats: Mapping, mode: str) -> None:
    for name in ("conv1", "conv2", "conv4", "conv6", "conv7"):
        _ir_out(out, f"{p}.{name}", params[name], stats[name])
    _conv_bn_out(out, f"{p}.conv3", f"{p}.bn3", params["conv3"],
                 stats["conv3"], conv_has_bias=True)
    _conv_bn_out(out, f"{p}.conv5", f"{p}.bn5", params["conv5"],
                 stats["conv5"], conv_has_bias=True)
    if mode == "hubert":
        _bn_out(out, f"{p}.bn7", params["bn7"], stats["bn7"])


def export_generator(variables: Mapping, mode: str = "hubert",
                     n_blocks: int = 4) -> Dict[str, Array]:
    """{'params', 'batch_stats'} flax tree -> reference torch state_dict
    (numpy values). Exact inverse of weights.import_generator: importing
    the result reproduces the input tree bit-for-bit (fp32)."""
    params, stats = variables["params"], variables["batch_stats"]
    out: Dict[str, Array] = {}

    _ir_out(out, "inc.inconv.0", params["inc"]["ir"], stats["inc"]["ir"])
    for i in range(1, 5):
        _double_conv_out(out, f"down{i}.maxpool_conv.0",
                         params[f"down{i}"]["conv"],
                         stats[f"down{i}"]["conv"])

    _audio_out(out, "audio_model", params["audio_model"],
               stats["audio_model"], mode)

    _dense_out(out, "mlp_fusion.fc1", params["mlp_fusion"]["fc1"])
    _dense_out(out, "mlp_fusion.fc2", params["mlp_fusion"]["fc2"])
    for name in ("bn1", "bn2"):
        _bn_out(out, f"mlp_fusion.{name}", params["mlp_fusion"][name],
                stats["mlp_fusion"][name])

    for name in ("bn_tx", "bn_kx", "outc_bn"):
        _bn_out(out, name, params[name], stats[name])

    for i in range(n_blocks):
        p = params[f"attention_blocks_{i}"]
        s = stats[f"attention_blocks_{i}"]
        tp = f"attention_blocks.{i}"
        _conv_bias_out(out, f"{tp}.attention_adjust_p_1", p["proj_in"])
        _conv_bias_out(out, f"{tp}.attention_adjust_b_1", p["proj_out"])
        _conv_bias_out(out, f"{tp}.cross_attention.query_conv",
                       p["attn"]["query"])
        _conv_bias_out(out, f"{tp}.cross_attention.key_conv",
                       p["attn"]["key"])
        _conv_bias_out(out, f"{tp}.cross_attention.value_conv",
                       p["attn"]["value"])
        out[f"{tp}.cross_attention.gamma"] = _np(p["attn"]["gamma"])
        _bn_out(out, f"{tp}.bn", p["bn"], s["bn"])

    for name, i in (("fuse_conv1", 0), ("fuse_conv2", 1)):
        _double_conv_out(out, f"fuse_conv.{i}", params[name], stats[name])
    for i in range(1, 5):
        _double_conv_out(out, f"up{i}.conv", params[f"up{i}"]["conv"],
                         stats[f"up{i}"]["conv"])

    _conv_bias_out(out, "outc.conv", params["outc"]["conv"])
    return out


def export_syncnet(variables: Mapping, mode: str = "hubert"
                   ) -> Dict[str, Array]:
    """SyncNet flax variables -> reference SyncNet_color state_dict
    (/root/reference/module/syncnet.py:110-246). Inverse of
    nn.syncnet.import_syncnet; no bias folding (the reference's convs
    keep their bias ahead of BN here)."""
    from calipsync_tpu.nn.syncnet import _FACE_PLAN, _audio_plan

    params, stats = variables["params"], variables["batch_stats"]
    out: Dict[str, Array] = {}

    def conv_bn(tp: str, p: Mapping, s: Mapping) -> None:
        out[f"{tp}.conv_block.0.weight"] = _conv_kernel_t(
            p["conv"]["kernel"])
        out[f"{tp}.conv_block.0.bias"] = _np(p["conv"]["bias"])
        out[f"{tp}.conv_block.1.weight"] = _np(p["bn"]["scale"])
        out[f"{tp}.conv_block.1.bias"] = _np(p["bn"]["bias"])
        out[f"{tp}.conv_block.1.running_mean"] = _np(s["bn"]["mean"])
        out[f"{tp}.conv_block.1.running_var"] = _np(s["bn"]["var"])
        out[f"{tp}.conv_block.1.num_batches_tracked"] = np.zeros((),
                                                                 np.int64)

    for i in range(len(_FACE_PLAN)):
        conv_bn(f"face_encoder.{i}", params[f"face{i}"], stats[f"face{i}"])
    for i in range(len(_audio_plan(mode))):
        conv_bn(f"audio_encoder.{i}", params[f"audio{i}"],
                stats[f"audio{i}"])
    return out


def save_torch_checkpoint(state_dict: Mapping[str, Array], path: str,
                          wrap: bool = False) -> str:
    """Write a .pth the reference loaders accept (torch required here).
    ``wrap=True`` adds the ``{'state_dict': ...}`` wrapper some reference
    loaders strip (image_infer_v1/models/unet.py:330-334)."""
    import torch

    # copy: exported leaves can be read-only jax-backed views, which
    # torch.from_numpy would alias and warn about
    sd = {k: torch.from_numpy(np.array(v)) for k, v in state_dict.items()}
    torch.save({"state_dict": sd} if wrap else sd, path)
    return path
