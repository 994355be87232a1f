"""Training-scale options: gradient accumulation, rematerialization and
ZeRO-1 optimizer-state sharding (trainer.py).

None of these exist in the reference (one GPU, one batch, full Adam
state — /root/reference/step2_train_unet.py:94-123); they are the TPU
levers for growing batch / model state beyond one chip's HBM. Every
test here is an equality proof on the 8-virtual-device CPU mesh:

- grad accumulation: step(np.repeat(batch, M), accum=M) must equal
  step(batch, accum=1) — with per-device sample tiling each microbatch
  sees the exact same sync-BN statistics, so losses and grads match.
- remat: jax.checkpoint is a recompute schedule, not an approximation —
  the step must match the stored-activation step.
- ZeRO-1: psum_scatter + shard-Adam + all_gather must equal the
  pmean + replicated-Adam path (the update math is elementwise).

SGD is used where the assert is on post-step params: through Adam a
near-zero grad element's step-1 update is lr*sign(g), so benign fp
reassociation between two compiled programs can swing single elements
by 2*lr (see test_train_step.py::test_multi_step_matches_per_step).
SGD updates are linear in the grad, so param deltas bound grad deltas.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from calipsync_tpu.config import ModelConfig, TrainConfig
from calipsync_tpu.core.mesh import make_mesh, replicate, shard_batch
from calipsync_tpu.data.dataset import LipSyncDataset, batch_iterator
from calipsync_tpu.train.trainer import (adam, build_model,
                                         create_train_state,
                                         create_zero1_state, make_train_step,
                                         replicated_opt_to_zero1,
                                         zero1_opt_to_replicated,
                                         zero1_state_sharding)


def _batch(ds, n, seed=0):
    return next(iter(batch_iterator(ds, n, np.random.default_rng(seed),
                                    shuffle=False, num_workers=2)))


def _repeat_batch(batch, m):
    """Tile each sample m times IN PLACE in the batch axis: on a D-device
    mesh with local batch m, device i then sees m copies of sample i."""
    return {k: np.repeat(v, m, axis=0) for k, v in batch.items()}


@pytest.fixture(scope="module")
def setup(synthetic_step1_dir):
    mesh = make_mesh(data=4)
    model = build_model(ModelConfig(), axis_name="data")
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))
    # hold as numpy: the step fns donate the TrainState, and device_put
    # of an on-device array can alias buffers — donation would delete
    # the fixture's arrays for the NEXT test run.
    variables = jax.tree.map(np.asarray, variables)
    ds = LipSyncDataset(str(synthetic_step1_dir))
    feats = jnp.asarray(ds.audio_feats)
    return mesh, model, variables, ds, feats


def _run(mesh, model, variables, ds, feats, train_cfg, tx, batches,
         zero1=False):
    if zero1:
        state = create_zero1_state(model, tx, jax.random.key(0), mesh,
                                   init_variables=variables)
        state = jax.device_put(state, zero1_state_sharding(state, mesh))
    else:
        state = create_train_state(model, tx, jax.random.key(0),
                                   init_variables=variables)
        state = replicate(state, mesh)
    fn = make_train_step(model, tx, mesh, train_cfg, use_perceptual=False)
    losses = []
    for b in batches:
        state, m = fn(state, shard_batch(b, mesh), feats, {})
        losses.append(float(m["loss"]))
    return state, losses


def test_grad_accum_matches_single_pass(setup):
    """step(repeat(batch, 2), grad_accum=2) == step(batch, grad_accum=1):
    identical loss and identical SGD params (each microbatch reproduces
    the full sync-BN statistics of the un-tiled batch)."""
    mesh, model, variables, ds, feats = setup
    tx = optax.sgd(1e-3)
    base = _batch(ds, 4, seed=0)

    s1, l1 = _run(mesh, model, variables, ds, feats,
                  TrainConfig(batch_size=4), tx, [base])
    s2, l2 = _run(mesh, model, variables, ds, feats,
                  TrainConfig(batch_size=8, grad_accum=2), tx,
                  [_repeat_batch(base, 2)])

    np.testing.assert_allclose(l2, l1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    assert int(s2.step) == 1  # M microbatches = ONE optimizer step


def test_remat_step_is_exact(setup):
    """remat=True recomputes activations in the backward pass; the loss
    and the SGD params must match the stored-activation step."""
    mesh, model, variables, ds, feats = setup
    tx = optax.sgd(1e-3)
    batch = _batch(ds, 4, seed=1)

    s1, l1 = _run(mesh, model, variables, ds, feats,
                  TrainConfig(batch_size=4), tx, [batch])
    s2, l2 = _run(mesh, model, variables, ds, feats,
                  TrainConfig(batch_size=4, remat=True), tx, [batch])

    np.testing.assert_allclose(l2, l1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_zero1_matches_pmean_sgd(setup):
    """ZeRO-1 (psum_scatter -> shard update -> all_gather) equals the
    pmean + replicated-optimizer path exactly under SGD."""
    mesh, model, variables, ds, feats = setup
    tx = optax.sgd(1e-3)
    batches = [_batch(ds, 4, seed=2), _batch(ds, 4, seed=3)]

    s1, l1 = _run(mesh, model, variables, ds, feats,
                  TrainConfig(batch_size=4), tx, batches)
    s2, l2 = _run(mesh, model, variables, ds, feats,
                  TrainConfig(batch_size=4, zero1=True), tx, batches,
                  zero1=True)

    np.testing.assert_allclose(l2, l1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_zero1_adam_state_is_sharded(setup):
    """With Adam, each rank holds 1/D of the moments: global moment
    leaves are (D, ceil(n/D)) sharded over the data axis, and the
    2-step loss sequence matches the pmean path (params agree within
    the Adam sign-flip envelope, as in the multi-step test)."""
    mesh, model, variables, ds, feats = setup
    train_cfg = TrainConfig(batch_size=4)
    tx = adam(train_cfg)
    batches = [_batch(ds, 4, seed=4), _batch(ds, 4, seed=5)]

    s1, l1 = _run(mesh, model, variables, ds, feats, train_cfg, tx, batches)
    s2, l2 = _run(mesh, model, variables, ds, feats,
                  TrainConfig(batch_size=4, zero1=True), tx, batches,
                  zero1=True)
    np.testing.assert_allclose(l2, l1, rtol=1e-6)

    n = sum(x.size for x in jax.tree.leaves(s1.params))
    d = 4
    shard = -(-n // d)
    moments = [x for x in jax.tree.leaves(s2.opt_state)
               if getattr(x, "ndim", 0) >= 1]
    assert moments, "Adam state should hold sharded moment leaves"
    for m in moments:
        assert m.shape == (d, shard), m.shape
        # each device holds ONE (1, shard) block, not a replica
        shapes = {s.data.shape for s in m.addressable_shards}
        assert shapes == {(1, shard)}, shapes
    lr = train_cfg.lr
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2 * lr * len(batches))


def test_combined_accum_remat_zero1(setup):
    """All three compose in one step function: loss is finite and the
    same repeated batch improves (Adam), proving the update is live."""
    mesh, model, variables, ds, feats = setup
    train_cfg = TrainConfig(batch_size=8, grad_accum=2, remat=True,
                            zero1=True)
    tx = adam(train_cfg)
    batch = _batch(ds, 8, seed=6)
    state = create_zero1_state(model, tx, jax.random.key(0), mesh,
                               init_variables=variables)
    state = jax.device_put(state, zero1_state_sharding(state, mesh))
    fn = make_train_step(model, tx, mesh, train_cfg, use_perceptual=False)
    losses = []
    for _ in range(2):
        state, m = fn(state, shard_batch(batch, mesh), feats, {})
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[1] < losses[0], losses
    assert int(state.step) == 2


def test_zero1_checkpoint_resume(setup, tmp_path):
    """A ZeRO-1 state round-trips through Orbax save/restore — sharded
    (D, shard) moment leaves included: save after step 1, restore onto
    a fresh template, re-place with zero1_state_sharding, step again —
    params equal the uninterrupted 2-step run (SGD, exact)."""
    from calipsync_tpu.core import checkpoint as ckpt

    mesh, model, variables, ds, feats = setup
    cfg = TrainConfig(batch_size=4, zero1=True)
    tx = optax.sgd(1e-3)
    batches = [_batch(ds, 4, seed=8), _batch(ds, 4, seed=9)]

    s_ref, _ = _run(mesh, model, variables, ds, feats, cfg, tx, batches,
                    zero1=True)

    s1, _ = _run(mesh, model, variables, ds, feats, cfg, tx, batches[:1],
                 zero1=True)
    ckpt.save_checkpoint(tmp_path, 1, {"state": s1})
    template = create_zero1_state(model, tx, jax.random.key(1), mesh,
                                  init_variables=variables)
    restored = ckpt.restore_checkpoint(tmp_path, {"state": template})["state"]
    assert int(restored.step) == 1
    restored = jax.device_put(restored, zero1_state_sharding(restored, mesh))
    fn = make_train_step(model, tx, mesh, cfg, use_perceptual=False)
    s2, _ = fn(restored, shard_batch(batches[1], mesh), feats, {})
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_zero1_checkpoint_is_topology_free(setup):
    """The canonical checkpoint layout (step2_train's save/restore form)
    carries no device count: a ZeRO-1 state trained on the 4-device mesh
    converts to the tx.init(params) structure — restorable by a
    non-ZeRO-1 run — and re-stacks onto a 2-device mesh with every
    moment value preserved, then keeps training there."""
    mesh, model, variables, ds, feats = setup
    cfg = TrainConfig(batch_size=4, zero1=True)
    tx = adam(cfg)
    s1, _ = _run(mesh, model, variables, ds, feats, cfg, tx,
                 [_batch(ds, 4, seed=10)], zero1=True)  # moments nonzero

    canon = zero1_opt_to_replicated(s1.opt_state, s1.params)
    plain = tx.init(jax.tree.map(np.asarray, s1.params))
    assert (jax.tree.structure(canon) == jax.tree.structure(plain)), \
        "canonical layout must match a non-zero1 template"

    mesh2 = make_mesh(data=2)
    z2 = replicated_opt_to_zero1(canon, s1.params, tx, mesh2)
    moments = [x for x in jax.tree.leaves(z2) if getattr(x, "ndim", 0) >= 1]
    n = sum(x.size for x in jax.tree.leaves(s1.params))
    assert all(m.shape == (2, -(-n // 2)) for m in moments)
    back = zero1_opt_to_replicated(z2, s1.params)
    for a, b in zip(jax.tree.leaves(canon), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)

    # the restacked state steps on the new topology
    state = s1.replace(opt_state=z2)
    state = jax.device_put(state, zero1_state_sharding(state, mesh2))
    fn = make_train_step(model, tx, mesh2, cfg, use_perceptual=False)
    state, m = fn(state, shard_batch(_batch(ds, 4, seed=11), mesh2),
                  feats, {})
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 2


def test_resident_zero1_matches_host_zero1(setup, synthetic_step1_dir):
    """The device-resident step supports ZeRO-1 too: same losses as the
    host-batch ZeRO-1 step for the same indices."""
    from calipsync_tpu.data.dataset import ResidentLipSyncDataset
    from calipsync_tpu.train.trainer import make_resident_train_step

    mesh, model, variables, ds, feats_host = setup
    train_cfg = TrainConfig(batch_size=4, zero1=True)
    tx = optax.sgd(1e-3)

    res_ds = ResidentLipSyncDataset(str(synthetic_step1_dir), mesh=mesh)
    feats = replicate(jnp.asarray(ds.audio_feats), mesh)

    host_batches = list(batch_iterator(ds, 4, np.random.default_rng(7),
                                       shuffle=True, drop_last=True,
                                       num_workers=2))[:2]
    res_batches = list(res_ds.epoch_indices(4, np.random.default_rng(7),
                                            shuffle=True,
                                            drop_last=True))[:2]

    s1, l_host = _run(mesh, model, variables, ds, feats_host, train_cfg,
                      tx, host_batches, zero1=True)

    state = create_zero1_state(model, tx, jax.random.key(0), mesh,
                               init_variables=variables)
    state = jax.device_put(state, zero1_state_sharding(state, mesh))
    fn = make_resident_train_step(model, tx, mesh, train_cfg,
                                  use_perceptual=False)
    l_res = []
    for idx, fidx, ex in res_batches:
        state, m = fn(state, res_ds.store_dev, jnp.asarray(idx),
                      jnp.asarray(fidx), jnp.asarray(ex), feats, {})
        l_res.append(float(m["loss"]))
    np.testing.assert_allclose(l_res, l_host, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
