"""One-shot verification of real checkpoint files against every importer.

First contact with the reference's real pretrained weights happens outside
this image (they are not shipped here), so this flow exists to make that
first contact a single command instead of a debugging session:

    python -m calipsync_tpu.cli verify-weights --weights-dir weights/ \
        [--generator ckpt.pth] [--syncnet syncnet.pth] [--hubert hf_dir/] \
        [--vgg vgg19-dcbb9e9d.pth] [--lpips-trunk t.pth --lpips-heads h.pth]

For every file present it loads the checkpoint, runs the matching importer
with a key-tracking wrapper, and reports: keys consumed / unconsumed
(after the documented allowlists), imported parameter counts, and any
loader error — the same coverage contract the schema tests prove on
fixture layouts (tests/test_importer_key_schema.py).

Expected weights-dir layout is the reference's
(utils/lip_detector/lip_detector.py:11-14, all_pipeline.py:128-131):
mean_face.txt, sfd_face.pth, checkpoint_epoch_335.pth.tar, and optionally
yolov8n_face_state_dict.pth.
"""

from __future__ import annotations

import os
from collections.abc import Mapping
from typing import Callable, Optional

import numpy as np

# Keys the reference itself never loads into compute; mirrored from
# tests/test_importer_key_schema.py.
_COMMON_ALLOW = ("num_batches_tracked",)


class KeyTracker(Mapping):
    """state_dict wrapper recording which keys an importer reads."""

    def __init__(self, sd):
        self._sd = dict(sd)
        self.accessed: set = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return self._sd[k]

    def get(self, k, default=None):
        return self[k] if k in self._sd else default

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)

    def unconsumed(self, allow_substrings=()):
        allow = _COMMON_ALLOW + tuple(allow_substrings)
        return sorted(k for k in self._sd
                      if k not in self.accessed
                      and not any(s in k for s in allow))


def _param_count(tree) -> int:
    import jax

    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree))


def _check(name: str, path: str, load_sd: Callable[[], dict],
           importer: Callable[[Mapping], dict],
           allow=()) -> dict:
    if not os.path.exists(path):
        return {"artifact": name, "path": path, "status": "missing"}
    try:
        sd = load_sd()
        tracked = KeyTracker(sd)
        variables = importer(tracked)
        unconsumed = tracked.unconsumed(allow)
        return {
            "artifact": name, "path": path,
            "status": "ok" if not unconsumed else "unconsumed-keys",
            "keys_total": len(tracked),
            "keys_consumed": len(tracked.accessed),
            "keys_unconsumed": unconsumed[:20],
            "imported_params": _param_count(variables),
        }
    except Exception as e:  # report, don't abort the sweep
        return {"artifact": name, "path": path, "status": "error",
                "error": f"{type(e).__name__}: {e}"}


def verify_weights(weights_dir: Optional[str] = None,
                   generator: Optional[str] = None,
                   generator_mode: str = "hubert",
                   syncnet: Optional[str] = None,
                   hubert: Optional[str] = None,
                   vgg: Optional[str] = None,
                   lpips_trunk: Optional[str] = None,
                   lpips_heads: Optional[str] = None) -> list:
    """Run every applicable importer; returns a list of report dicts."""
    from calipsync_tpu.core.weights import load_torch_state_dict

    reports = []

    if weights_dir:
        mf = os.path.join(weights_dir, "mean_face.txt")
        if os.path.exists(mf):
            try:
                from calipsync_tpu.vision.lip_detector import load_mean_face

                vals = load_mean_face(mf)
                reports.append({"artifact": "mean_face", "path": mf,
                                "status": "ok",
                                "landmarks": int(vals.shape[0])})
            except Exception as e:
                reports.append({"artifact": "mean_face", "path": mf,
                                "status": "error",
                                "error": f"{type(e).__name__}: {e}"})
        else:
            reports.append({"artifact": "mean_face", "path": mf,
                            "status": "missing"})

        from calipsync_tpu.nn.s3fd import import_s3fd

        p = os.path.join(weights_dir, "sfd_face.pth")
        reports.append(_check("s3fd", p,
                              lambda: load_torch_state_dict(p), import_s3fd))

        from calipsync_tpu.nn.pfld import fold_mobileone_params, import_pfld

        p2 = os.path.join(weights_dir, "checkpoint_epoch_335.pth.tar")
        # 'localization' is an STN branch the reference defines but never
        # calls in forward (pfld_mobileone.py:90)
        reports.append(_check(
            "pfld", p2,
            lambda: load_torch_state_dict(p2, key="pfld_backbone"),
            lambda sd: fold_mobileone_params(import_pfld(sd)),
            allow=("localization.",)))

        p3 = os.path.join(weights_dir, "yolov8n_face_state_dict.pth")
        if os.path.exists(p3):
            from calipsync_tpu.nn.yolo import import_yolov8_face

            reports.append(_check("yolov8n-face", p3,
                                  lambda: load_torch_state_dict(p3),
                                  import_yolov8_face))

    if generator:
        from calipsync_tpu.core.weights import import_generator

        reports.append(_check(
            "generator", generator,
            lambda: load_torch_state_dict(generator),
            lambda sd: import_generator(sd, mode=generator_mode)))

    if syncnet:
        from calipsync_tpu.nn.syncnet import import_syncnet

        reports.append(_check(
            "syncnet", syncnet,
            lambda: load_torch_state_dict(syncnet),
            lambda sd: import_syncnet(sd, mode=generator_mode)))

    if hubert:
        reports.append(_verify_hubert(hubert))

    if vgg:
        from calipsync_tpu.nn.vgg import import_vgg19_features

        # torchvision vgg19 ships the classifier head; the reference uses
        # only .features up to conv3_3 (step2_train_unet.py:14-25)
        reports.append(_check("vgg19", vgg,
                              lambda: load_torch_state_dict(vgg),
                              import_vgg19_features,
                              allow=("classifier.",)))

    if lpips_trunk and lpips_heads:
        from calipsync_tpu.nn.lpips import import_lpips

        def _imp(sd):
            heads = load_torch_state_dict(lpips_heads)
            return import_lpips(sd, heads)

        reports.append(_check("lpips", lpips_trunk,
                              lambda: load_torch_state_dict(lpips_trunk),
                              _imp, allow=("classifier.",)))

    return reports


def _verify_hubert(hubert_dir: str) -> dict:
    if not os.path.isdir(hubert_dir):
        return {"artifact": "hubert", "path": hubert_dir,
                "status": "missing"}
    try:
        import json as _json
        import pathlib

        from calipsync_tpu.nn.hubert import HubertConfig, import_hubert

        p = pathlib.Path(hubert_dir)
        cfg_json = _json.loads((p / "config.json").read_text())

        class _NS:
            def __init__(self, d):
                self.__dict__.update(d)

        config = HubertConfig.from_hf(_NS(cfg_json))
        st = p / "model.safetensors"
        if st.exists():
            from safetensors.numpy import load_file

            sd = load_file(str(st))
        else:
            import torch

            sd = {k: v.numpy() for k, v in torch.load(
                str(p / "pytorch_model.bin"), map_location="cpu").items()}
        tracked = KeyTracker(sd)
        variables = import_hubert(tracked, config)
        # masked_spec_embed is SpecAugment training state the eval-mode
        # extractor never applies (utils/hubert.py inference path)
        unconsumed = tracked.unconsumed(("masked_spec_embed",))
        return {"artifact": "hubert", "path": hubert_dir,
                "status": "ok" if not unconsumed else "unconsumed-keys",
                "keys_total": len(tracked),
                "keys_consumed": len(tracked.accessed),
                "keys_unconsumed": unconsumed[:20],
                "imported_params": _param_count(variables),
                "hidden_size": config.hidden_size,
                "layers": config.num_hidden_layers}
    except Exception as e:
        return {"artifact": "hubert", "path": hubert_dir,
                "status": "error", "error": f"{type(e).__name__}: {e}"}
