"""DP training step on the virtual 8-device CPU mesh + checkpoint resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calipsync_tpu.config import ModelConfig, TrainConfig
from calipsync_tpu.core import checkpoint as ckpt
from calipsync_tpu.core.mesh import make_mesh, replicate, shard_batch
from calipsync_tpu.data.dataset import LipSyncDataset, batch_iterator
from calipsync_tpu.nn.vgg import VGG19Features
from calipsync_tpu.train.trainer import (adam, build_model,
                                         create_train_state, make_eval_step,
                                         make_train_step)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _batch(ds, n, seed=0):
    return next(iter(batch_iterator(ds, n, np.random.default_rng(seed),
                                    shuffle=False, num_workers=2)))


def test_train_step_runs_and_improves(synthetic_step1_dir):
    # 4-device sub-mesh + batch 4: this host has a single CPU core, so keep
    # the executed FLOPs small while still exercising real sharding.
    mesh = make_mesh(data=4)
    model_cfg = ModelConfig()
    train_cfg = TrainConfig(batch_size=4, perceptual_weight=0.1)
    model = build_model(model_cfg, axis_name="data")
    tx = adam(train_cfg)
    state = create_train_state(model, tx, jax.random.key(0))

    vgg = VGG19Features()
    vgg_vars = jax.jit(vgg.init)(jax.random.key(1),
                                 jnp.zeros((1, 160, 160, 3)))

    ds = LipSyncDataset(str(synthetic_step1_dir))
    feats = jnp.asarray(ds.audio_feats)

    step_fn = make_train_step(model, tx, mesh, train_cfg)
    state = replicate(state, mesh)
    vgg_vars = replicate(vgg_vars, mesh)

    batch = shard_batch(_batch(ds, 4, seed=0), mesh)
    losses = []
    for _ in range(2):  # same batch twice: Adam must reduce its loss
        state, metrics = step_fn(state, batch, feats, vgg_vars)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(state.step) == 2
    assert losses[1] < losses[0], losses


def test_bf16_mixed_precision_train_step(synthetic_step1_dir):
    """bfloat16 compute with fp32 params/stats: step runs, loss finite,
    params stay fp32 (mixed precision, not low-precision weights)."""
    mesh = make_mesh(data=2)
    model_cfg = ModelConfig(dtype="bfloat16")
    train_cfg = TrainConfig(batch_size=2, perceptual_weight=0.0)
    model = build_model(model_cfg, axis_name="data")
    tx = adam(train_cfg)
    state = create_train_state(model, tx, jax.random.key(0))
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(state.params))

    ds = LipSyncDataset(str(synthetic_step1_dir))
    feats = jnp.asarray(ds.audio_feats)
    vgg_vars = jax.jit(VGG19Features().init)(jax.random.key(1),
                                             jnp.zeros((1, 160, 160, 3)))
    step_fn = make_train_step(model, tx, mesh, train_cfg,
                              use_perceptual=False)
    state = replicate(state, mesh)
    vgg_vars = replicate(vgg_vars, mesh)
    batch = shard_batch(_batch(ds, 2, seed=0), mesh)
    state, metrics = step_fn(state, batch, feats, vgg_vars)
    assert np.isfinite(float(metrics["loss"]))
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(state.params))


def test_eval_step_sharded(mesh):
    model_cfg = ModelConfig()
    model = build_model(model_cfg, axis_name="data")
    state_model = build_model(model_cfg, axis_name=None)
    variables = jax.jit(state_model.init)(jax.random.key(0),
                                          jnp.zeros((1, 160, 160, 6)),
                                          jnp.zeros((1, 32, 32, 32)))
    eval_fn = make_eval_step(model, mesh)
    imgs = jnp.zeros((8, 160, 160, 6))
    audio = jnp.zeros((8, 32, 32, 32))
    out = eval_fn(replicate(variables, mesh),
                  jax.device_put(imgs, jax.NamedSharding(
                      mesh, jax.sharding.PartitionSpec("data"))),
                  jax.device_put(audio, jax.NamedSharding(
                      mesh, jax.sharding.PartitionSpec("data"))))
    assert out.shape == (8, 160, 160, 3)


def test_checkpoint_roundtrip(tmp_path, mesh):
    tree = {"params": {"w": jnp.arange(8.0).reshape(2, 4)},
            "step": jnp.int32(5)}
    path = ckpt.save_checkpoint(tmp_path, 5, tree)
    assert path.exists()
    assert ckpt.latest_step(tmp_path) == 5
    restored = ckpt.restore_checkpoint(tmp_path, tree)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    assert int(restored["step"]) == 5

    # restore resharded (replicated over the mesh)
    from calipsync_tpu.core.mesh import replicated
    resharded = ckpt.restore_checkpoint(tmp_path, tree,
                                        sharding=replicated(mesh))
    assert resharded["params"]["w"].sharding.mesh.shape["data"] == 8


def test_resident_step_matches_host_batch_step(synthetic_step1_dir):
    """The device-resident data path is numerically IDENTICAL to the
    host-batch path for the same sample indices: same loss sequence, same
    parameters after two steps."""
    from calipsync_tpu.data.dataset import ResidentLipSyncDataset
    from calipsync_tpu.train.trainer import make_resident_train_step

    mesh = make_mesh(data=4)
    model_cfg = ModelConfig()
    train_cfg = TrainConfig(batch_size=4, perceptual_weight=0.1)
    model = build_model(model_cfg, axis_name="data")
    tx = adam(train_cfg)
    vgg_vars = replicate(jax.jit(VGG19Features().init)(
        jax.random.key(1), jnp.zeros((1, 160, 160, 3))), mesh)

    host_ds = LipSyncDataset(str(synthetic_step1_dir))
    res_ds = ResidentLipSyncDataset(str(synthetic_step1_dir), mesh=mesh)
    feats = replicate(jnp.asarray(host_ds.audio_feats), mesh)

    # identical sampling streams on both sides
    host_batches = list(batch_iterator(
        host_ds, 4, np.random.default_rng(5), shuffle=True,
        drop_last=True, num_workers=2))
    res_batches = list(res_ds.epoch_indices(
        4, np.random.default_rng(5), shuffle=True, drop_last=True))
    assert len(host_batches) == len(res_batches)
    for hb, (idx, fidx, ex) in zip(host_batches, res_batches):
        np.testing.assert_array_equal(hb["index"], idx)

    def run(step_kind):
        state = create_train_state(model, tx, jax.random.key(0))
        state = replicate(state, mesh)
        losses = []
        if step_kind == "host":
            fn = make_train_step(model, tx, mesh, train_cfg)
            for hb in host_batches[:2]:
                state, m = fn(state, shard_batch(hb, mesh), feats,
                              vgg_vars)
                losses.append(float(m["loss"]))
        else:
            fn = make_resident_train_step(model, tx, mesh, train_cfg)
            for idx, fidx, ex in res_batches[:2]:
                state, m = fn(state, res_ds.store_dev, jnp.asarray(idx),
                              jnp.asarray(fidx), jnp.asarray(ex), feats,
                              vgg_vars)
                losses.append(float(m["loss"]))
        return state, losses

    s_host, l_host = run("host")
    s_res, l_res = run("resident")
    np.testing.assert_allclose(l_res, l_host, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_host.params),
                    jax.tree.leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_multi_step_matches_per_step(synthetic_step1_dir):
    """make_resident_multi_step (one (K,B) block = K steps in ONE XLA
    program) is numerically identical to K sequential calls of
    make_resident_train_step: same per-step losses, same parameters.
    On the CPU mesh the scan auto-unrolls (XLA:CPU deadlocks on
    collectives inside a while body); unroll does not change numerics."""
    from calipsync_tpu.data.dataset import ResidentLipSyncDataset
    from calipsync_tpu.train.trainer import (make_resident_multi_step,
                                             make_resident_train_step)

    mesh = make_mesh(data=4)
    train_cfg = TrainConfig(batch_size=4, perceptual_weight=0.1)
    model = build_model(ModelConfig(), axis_name="data")
    tx = adam(train_cfg)
    vgg_vars = replicate(jax.jit(VGG19Features().init)(
        jax.random.key(1), jnp.zeros((1, 160, 160, 3))), mesh)

    ds = ResidentLipSyncDataset(str(synthetic_step1_dir), mesh=mesh)
    feats = replicate(jnp.asarray(ds.audio_feats), mesh)
    batches = list(ds.epoch_indices(4, np.random.default_rng(5),
                                    shuffle=True, drop_last=True))[:2]
    arr = np.asarray(batches)  # (2, 3, 4)

    def init_state():
        return replicate(create_train_state(model, tx, jax.random.key(0)),
                         mesh)

    per_fn = make_resident_train_step(model, tx, mesh, train_cfg)
    s1 = init_state()
    per_losses = []
    for idx, fidx, ex in batches:
        s1, m = per_fn(s1, ds.store_dev, jnp.asarray(idx),
                       jnp.asarray(fidx), jnp.asarray(ex), feats,
                       vgg_vars)
        per_losses.append(float(m["loss"]))

    multi_fn = make_resident_multi_step(model, tx, mesh, train_cfg)
    s2 = init_state()
    s2, m2 = multi_fn(s2, ds.store_dev, jnp.asarray(arr[:, 0]),
                      jnp.asarray(arr[:, 1]), jnp.asarray(arr[:, 2]),
                      feats, vgg_vars)

    np.testing.assert_allclose(np.asarray(m2["loss"]), per_losses,
                               rtol=1e-6)
    assert int(s2.step) == 2
    # Element-wise param equality is ill-conditioned through Adam: for a
    # near-zero gradient element the step-1 update is lr*sign(g), so fp
    # reassociation between the two compiled programs can flip signs and
    # swing single elements by up to 2*lr. The loss sequence above is
    # the sound parity check (step 2's loss is computed FROM step 1's
    # carried params, so it proves the scan carry); params are bounded
    # by the sign-flip envelope per step.
    lr = train_cfg.lr
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2 * lr * len(per_losses))
