"""JAX -> torch generator export (core/weights_export.py).

Golden inverse-direction parity: a TPU-trained generator exported with
export_generator must load into the live reference Model with
strict=True and produce the same outputs (the reference's own numeric
bar, rtol 1e-3 / atol 1e-5 — /root/reference/module/unet.py:384-385).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calipsync_tpu.core.weights import import_generator
from calipsync_tpu.core.weights_export import (export_generator,
                                               save_torch_checkpoint)
from calipsync_tpu.nn.unet import Generator

RTOL, ATOL = 1e-3, 1e-5


def _random_variables(mode="hubert", seed=0):
    """Init + randomize every leaf (incl. BN stats and the zero-init
    gamma) so layout mistakes can't hide behind init constants."""
    model = Generator(n_channels=6, mode=mode)
    # audio input: hubert (B,32,32,32) / wenet (B,16,32,256) NHWC
    # (reference NCHW (B,32,32,32) / (B,256,16,32), module/unet.py:109-194)
    audio = jnp.zeros((1, 32, 32, 32) if mode == "hubert"
                      else (1, 16, 32, 256))
    variables = jax.jit(model.init)(jax.random.key(seed),
                                    jnp.zeros((1, 160, 160, 6)), audio)
    rng = np.random.default_rng(seed)

    def rand(path, leaf):
        name = path[-1].key
        a = np.asarray(leaf, np.float32)
        if name == "var":
            return jnp.asarray(rng.uniform(0.25, 1.75, a.shape)
                               .astype(np.float32))
        if name == "mean":
            return jnp.asarray((rng.standard_normal(a.shape) * 0.2)
                               .astype(np.float32))
        return jnp.asarray((rng.standard_normal(a.shape) * 0.1)
                           .astype(np.float32))

    return model, jax.tree_util.tree_map_with_path(rand, variables)


@pytest.mark.parametrize("mode", ["hubert", "wenet"])
def test_export_import_round_trip(mode):
    _, variables = _random_variables(mode)
    sd = export_generator(variables, mode=mode)
    back = import_generator(sd, mode=mode)
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


def test_export_loads_strict_and_matches_reference(reference_modules,
                                                   tmp_path):
    import torch

    model, variables = _random_variables("hubert", seed=3)
    sd = export_generator(variables, mode="hubert")

    # the reference's exact key inventory, via strict load of the .pth
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(sd, path)
    ref = reference_modules.Model(6, "hubert").eval()
    ref.load_state_dict(torch.load(path, map_location="cpu",
                                   weights_only=True), strict=True)

    rng = np.random.default_rng(11)
    x_nchw = rng.standard_normal((2, 6, 160, 160)).astype(np.float32)
    a_nchw = rng.standard_normal((2, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_nchw),
                      torch.from_numpy(a_nchw)).numpy()

    apply = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))
    out = apply(variables,
                jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
                jnp.asarray(a_nchw.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref_out, rtol=RTOL, atol=ATOL)


def test_cli_export_torch(tmp_path, capsys):
    """`cli export-torch` round-trips a torch checkpoint through the
    import->export pair and reports the reference key count."""
    import json

    import torch

    from calipsync_tpu.cli import main

    _, variables = _random_variables("hubert", seed=7)
    src = str(tmp_path / "in.pth")
    save_torch_checkpoint(export_generator(variables), src)
    out = str(tmp_path / "out.pth")
    main(["export-torch", "--ckpt", src, "--out", out])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["keys"] == 582
    a = torch.load(src, map_location="cpu", weights_only=True)
    b = torch.load(out, map_location="cpu", weights_only=True)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k].numpy(), b[k].numpy(),
                                      err_msg=k)


def test_syncnet_export_round_trip_and_strict_load(reference_modules,
                                                   tmp_path):
    """export_syncnet loads into the live reference SyncNet_color with
    strict=True and round-trips through import_syncnet bit-exact."""
    import torch

    from calipsync_tpu.core.weights_export import export_syncnet
    from calipsync_tpu.nn.syncnet import SyncNet, import_syncnet

    model = SyncNet(mode="hubert")
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 160, 160, 3)),
        jnp.zeros((1, 32, 32, 32)))
    rng = np.random.default_rng(2)

    def rand(path, leaf):
        a = np.asarray(leaf, np.float32)
        if path[-1].key == "var":
            return jnp.asarray(rng.uniform(0.25, 1.75, a.shape)
                               .astype(np.float32))
        return jnp.asarray((rng.standard_normal(a.shape) * 0.1)
                           .astype(np.float32))

    variables = jax.tree_util.tree_map_with_path(rand, variables)
    sd = export_syncnet(variables, mode="hubert")

    import sys
    sys.path.insert(0, "/root/reference")
    from module.syncnet import SyncNet_color

    ref = SyncNet_color("hubert").eval()
    ref.load_state_dict({k: torch.from_numpy(np.array(v))
                         for k, v in sd.items()}, strict=True)

    back = import_syncnet(sd, mode="hubert")
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


def test_export_wrap_matches_reference_loader_convention(tmp_path):
    """wrap=True produces the {'state_dict': ...} wrapper that
    load_torch_state_dict (and the reference's image_infer_v1 loader,
    models/unet.py:330-334) strips."""
    import torch

    from calipsync_tpu.core.weights import load_torch_state_dict

    _, variables = _random_variables("hubert", seed=5)
    sd = export_generator(variables)
    path = str(tmp_path / "wrapped.pth")
    save_torch_checkpoint(sd, path, wrap=True)
    raw = torch.load(path, map_location="cpu", weights_only=True)
    assert set(raw.keys()) == {"state_dict"}
    back = load_torch_state_dict(path)
    assert set(back.keys()) == set(sd.keys())
    np.testing.assert_array_equal(back["outc.conv.weight"],
                                  sd["outc.conv.weight"])
