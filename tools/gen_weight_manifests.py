"""Generate literal key->shape manifests for the two remaining external
checkpoints (VERDICT r4 next #6), committed as tests/fixtures/*.tsv:

- ``hubert_large_ls960_ft_state_dict_keys.tsv``: the on-disk layout of
  ``facebook/hubert-large-ls960-ft`` (the checkpoint the reference
  loads at utils/hubert_extractor.py:84). Derived from the OFFICIAL
  transformers implementation — ``HubertForCTC`` built on a meta
  device with the published config (hidden 1024 / 24 layers / 16
  heads / ffn 4096 / feat_extract_norm='layer' / do_stable_layer_norm
  / conv_bias / vocab 32) — NOT from this repo's JAX twin, so a layout
  misunderstanding shared by twin and importer fails the manifest test
  instead of passing silently. torch>=2.1 names the pos-conv
  weight-norm 'parametrizations.weight.original0/1'; the published
  file predates that and stores 'weight_g/weight_v', so the dump is
  renamed to the on-disk form.
- ``vgg19_state_dict_keys.tsv``: the torchvision ``vgg19`` layout of
  ``vgg19-dcbb9e9d.pth`` (reference all_pipeline.py:130), derived from
  the published configuration-E layer list exactly the way
  torchvision's make_layers() numbers modules.

Run from the repo root: ``python tools/gen_weight_manifests.py``.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def gen_hubert() -> str:
    import torch
    from transformers import HubertConfig, HubertForCTC

    cfg = HubertConfig(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, feat_extract_norm="layer",
        do_stable_layer_norm=True, conv_bias=True, vocab_size=32,
        feat_proj_layer_norm=True)
    with torch.device("meta"):
        model = HubertForCTC(cfg)
    rows = []
    for k, v in model.state_dict().items():
        k = (k.replace("parametrizations.weight.original0", "weight_g")
             .replace("parametrizations.weight.original1", "weight_v"))
        rows.append((k, tuple(v.shape)))
    n_params = sum(int(np.prod(s)) if s else 1 for _, s in rows)
    path = os.path.join(FIXTURES,
                        "hubert_large_ls960_ft_state_dict_keys.tsv")
    with open(path, "w") as f:
        f.write("# facebook/hubert-large-ls960-ft (HubertForCTC) "
                "state_dict key -> shape manifest\n")
        f.write(f"# {len(rows)} keys, {n_params} parameters; generated "
                "by tools/gen_weight_manifests.py from the official "
                "transformers HubertForCTC on a meta device\n")
        for k, s in rows:
            f.write(f"{k}\t{','.join(map(str, s))}\n")
    return path


def gen_vgg19() -> str:
    # torchvision configuration 'E' (vgg19): conv widths with 'M' pools;
    # make_layers numbers Conv2d/ReLU/MaxPool sequentially, so conv
    # module indices are reproduced by the same walk
    cfg_e = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    rows = []
    idx, in_ch = 0, 3
    for v in cfg_e:
        if v == "M":
            idx += 1  # MaxPool2d
            continue
        rows.append((f"features.{idx}.weight", (v, in_ch, 3, 3)))
        rows.append((f"features.{idx}.bias", (v,)))
        idx += 2  # Conv2d + ReLU
        in_ch = v
    for i, (out_f, in_f) in zip((0, 3, 6),
                                ((4096, 25088), (4096, 4096),
                                 (1000, 4096))):
        rows.append((f"classifier.{i}.weight", (out_f, in_f)))
        rows.append((f"classifier.{i}.bias", (out_f,)))
    n_params = sum(int(np.prod(s)) for _, s in rows)
    path = os.path.join(FIXTURES, "vgg19_state_dict_keys.tsv")
    with open(path, "w") as f:
        f.write("# torchvision vgg19 (vgg19-dcbb9e9d.pth) state_dict "
                "key -> shape manifest\n")
        f.write(f"# {len(rows)} keys, {n_params} parameters; generated "
                "by tools/gen_weight_manifests.py from torchvision's "
                "published configuration-E layer walk\n")
        for k, s in rows:
            f.write(f"{k}\t{','.join(map(str, s))}\n")
    return path


if __name__ == "__main__":
    print(gen_vgg19())
    print(gen_hubert())
