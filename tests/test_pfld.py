"""PFLD-GhostOne parity vs reference torch + reparameterization fold."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calipsync_tpu.nn.pfld import (PFLDGhostOne, fold_mobileone_params,
                                   import_pfld)


@pytest.fixture(scope="module")
def ref_pfld(reference_path):
    """Load the reference's pfld_mobileone as a synthetic package (its dir
    has no __init__.py and uses relative imports)."""
    tools = reference_path / "utils" / "lip_detector" / "tools"
    pkg = types.ModuleType("ref_pfld_pkg")
    pkg.__path__ = [str(tools)]
    sys.modules["ref_pfld_pkg"] = pkg
    for name in ("base_module", "pfld_mobileone"):
        spec = importlib.util.spec_from_file_location(
            f"ref_pfld_pkg.{name}", tools / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_pfld_pkg.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_pfld_pkg.pfld_mobileone"]


def _randomize(model, seed):
    import torch

    g = torch.Generator().manual_seed(seed)
    new = {}
    for k, v in model.state_dict().items():
        if k.endswith("num_batches_tracked"):
            new[k] = v
        elif k.endswith("running_var"):
            new[k] = torch.rand(v.shape, generator=g) * 1.5 + 0.25
        else:
            new[k] = torch.randn(v.shape, generator=g) * 0.1
    model.load_state_dict(new)
    return model


def test_pfld_matches_reference(ref_pfld):
    import torch

    ref = ref_pfld.PFLD_GhostOne(0.5, 192, 110).eval()
    _randomize(ref, seed=3)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 192, 192), dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    variables = import_pfld(sd)
    model = PFLDGhostOne()
    out = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-5)


def test_fold_matches_trainform(ref_pfld):
    """Folded single-conv params reproduce multi-branch eval outputs."""
    ref = ref_pfld.PFLD_GhostOne(0.5, 192, 110).eval()
    _randomize(ref, seed=5)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = import_pfld(sd)

    model = PFLDGhostOne()
    deploy = PFLDGhostOne(deploy=True)
    folded = fold_mobileone_params(variables)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 192, 192, 3), dtype=np.float32))
    a = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x))
    b = np.asarray(jax.jit(deploy.apply)(folded, x))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pfld_param_count():
    """Reference headline: 0.878M params (BASELINE.md). That count is the
    train-form multi-branch net incl. its unused STN branch (2,418 params);
    our train form is 875,894 = 878,312 - 2,418."""
    model = PFLDGhostOne()
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 192, 192, 3)))
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n == 875_894, n
    # folded deploy form is ~2.8x smaller — the point of reparameterization
    deploy_vars = fold_mobileone_params(variables)
    nd = sum(x.size for x in jax.tree.leaves(deploy_vars["params"]))
    assert nd == 312_370, nd
