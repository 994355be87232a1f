"""Data-parallel jitted training step for the lip-sync generator.

Replaces the reference's single-GPU torch loop
(/root/reference/step2_train_unet.py:94-123) with a TPU-native design:

  - One `shard_map` over a named ``data`` mesh axis; the per-shard step
    computes grads locally and ``pmean``s them over ICI (the collective NCCL
    would do on GPU is XLA's psum here). The same code path runs on 1 chip
    (1-device mesh) and on N chips / N virtual CPU devices.
  - BatchNorm uses cross-replica batch statistics (flax ``axis_name``),
    documented choice per SURVEY.md section 7 "hard parts" (1): sync-BN
    keeps train-mode numerics independent of the data-axis size.
  - uint8 crops are normalized to [0,1] on device; audio windows are
    gathered on device from the resident feature array.
  - Adam with torch defaults (b1=0.9, b2=0.999, eps=1e-8), lr 1e-3.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from calipsync_tpu.audio.windows import batched_windows
from calipsync_tpu.config import ModelConfig, TrainConfig
from calipsync_tpu.nn.unet import Generator
from calipsync_tpu.train.loss import generator_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def _dtype_of(cfg: ModelConfig):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.dtype]


def build_model(model_cfg: ModelConfig, axis_name: Optional[str]) -> Generator:
    return Generator(n_channels=model_cfg.n_channels, mode=model_cfg.mode,
                     n_blocks=model_cfg.n_blocks, dtype=_dtype_of(model_cfg),
                     axis_name=axis_name, attn_impl=model_cfg.attn_impl)


def create_train_state(model: Generator, tx: optax.GradientTransformation,
                       rng: jax.Array,
                       init_variables: Optional[dict] = None) -> TrainState:
    """Init (or adopt imported) variables and wrap them in a TrainState."""
    if init_variables is None:
        audio_shape = ((1, 32, 32, 32) if model.mode == "hubert"
                       else (1, 16, 32, 256))
        init_variables = jax.jit(model.init)(
            rng, jnp.zeros((1, 160, 160, model.n_channels)),
            jnp.zeros(audio_shape))
    params = init_variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=init_variables["batch_stats"],
                      opt_state=tx.init(params))


def make_train_step(model: Generator, tx: optax.GradientTransformation,
                    mesh: Mesh, train_cfg: TrainConfig,
                    use_perceptual: bool = True,
                    axis_name="data"):
    """Build the jitted DP train step.

    Returns fn(state, batch, audio_feats, vgg_variables) -> (state, metrics):
      batch: {'ref','masked','target': (B,160,160,3) uint8,
              'index': (B,) int32} with B sharded over ``axis_name``;
      audio_feats: (T, 2, 1024) fp32, replicated;
      vgg_variables: VGG19Features variables (replicated), or pass
        use_perceptual=False and feed an empty dict.

    ``axis_name`` may be a single mesh axis ('data') or a tuple of axes
    (('host', 'data') for the hybrid DCN x ICI mesh of
    core.mesh.make_hybrid_mesh): the batch shards over all of them and
    gradients/metrics pmean over all of them — the host-axis part of the
    all-reduce crosses DCN, the rest rides ICI. Build the model with the
    same axis_name so sync-BN statistics span every replica.

    VGG weights are an explicit argument (not a closure) so they are jit
    inputs rather than HLO constants — keeps compile fast and cacheable.
    """
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    compute_dtype = model.dtype or jnp.float32

    def shard_step(state: TrainState, batch: dict, audio_feats: jax.Array,
                   vgg_variables):
        imgs = jnp.concatenate([batch["ref"], batch["masked"]], axis=-1)
        imgs = imgs.astype(compute_dtype) / 255.0
        labels = batch["target"].astype(jnp.float32) / 255.0
        audio = batched_windows(audio_feats, batch["index"],
                                mode=model.mode).astype(compute_dtype)

        def loss_fn(params):
            pred, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, audio, train=True, mutable=["batch_stats"])
            total, metrics = generator_loss(
                pred, labels, vgg_variables if use_perceptual else None,
                perceptual_weight=train_cfg.perceptual_weight,
                dtype=compute_dtype)
            return total, (updates["batch_stats"], metrics)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(state.params)
        grads = jax.lax.pmean(grads, axes)
        metrics = jax.lax.pmean(metrics, axes)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    batch_spec = {"ref": P(axes), "masked": P(axes),
                  "target": P(axes), "index": P(axes)}
    mapped = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), batch_spec, P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def make_resident_train_step(model: Generator,
                             tx: optax.GradientTransformation,
                             mesh: Mesh, train_cfg: TrainConfig,
                             crop=None, use_perceptual: bool = True,
                             axis_name="data"):
    """Device-resident variant of :func:`make_train_step`: the speaker's
    per-frame crops live in HBM once (data.dataset.ResidentLipSyncDataset)
    and a step receives only index vectors — the crop gather, mouth-rect
    masking and /255 normalization fuse into the compiled step, so the
    host ships 12 bytes/sample instead of ~230 KB and never JPEG-decodes
    during training (SURVEY.md section 7 hard part (5)).

    Returns fn(state, store (N, S) uint8 [replicated], idx (B,),
    fidx (B,), ex (B,), audio_feats, vgg_variables) -> (state, metrics),
    numerically identical to the host-batch step for the same indices
    (tests/test_train_step.py).
    """
    shard_step = _resident_shard_step(model, tx, train_cfg, crop,
                                      use_perceptual, axis_name)
    axes = ((axis_name,) if isinstance(axis_name, str)
            else tuple(axis_name))

    mapped = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(), P(axes), P(axes), P(axes), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def _resident_shard_step(model, tx, train_cfg, crop, use_perceptual,
                         axis_name):
    """Per-shard resident step body (runs inside shard_map)."""
    from calipsync_tpu.config import CropConfig

    crop = crop or CropConfig()
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    compute_dtype = model.dtype or jnp.float32
    y0, y1 = crop.mask_y, crop.mask_y + crop.mask_h
    x0, x1 = crop.mask_x, crop.mask_x + crop.mask_w
    size = crop.size

    def shard_step(state: TrainState, store: jax.Array, idx: jax.Array,
                   fidx: jax.Array, ex: jax.Array, audio_feats: jax.Array,
                   vgg_variables):
        real_u8 = jnp.take(store, fidx, axis=0).reshape(-1, size, size, 3)
        ref_u8 = jnp.take(store, ex, axis=0).reshape(-1, size, size, 3)
        real = real_u8.astype(compute_dtype) / 255.0
        masked = real.at[:, y0:y1, x0:x1, :].set(0.0)
        imgs = jnp.concatenate([ref_u8.astype(compute_dtype) / 255.0,
                                masked], axis=-1)
        labels = real_u8.astype(jnp.float32) / 255.0
        audio = batched_windows(audio_feats, idx,
                                mode=model.mode).astype(compute_dtype)

        def loss_fn(params):
            pred, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, audio, train=True, mutable=["batch_stats"])
            total, metrics = generator_loss(
                pred, labels, vgg_variables if use_perceptual else None,
                perceptual_weight=train_cfg.perceptual_weight,
                dtype=compute_dtype)
            return total, (updates["batch_stats"], metrics)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(state.params)
        grads = jax.lax.pmean(grads, axes)
        metrics = jax.lax.pmean(metrics, axes)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    return shard_step


def make_resident_multi_step(model: Generator,
                             tx: optax.GradientTransformation,
                             mesh: Mesh, train_cfg: TrainConfig,
                             crop=None, use_perceptual: bool = True,
                             axis_name="data",
                             unroll: Optional[bool] = None):
    """K steps per dispatch: ``lax.scan`` over pre-uploaded index blocks.

    The per-step variant pays one host->device round-trip per step for
    12 bytes of indices — on a remote link (20-40 ms RTT) that bounds
    training at ~10 steps/s regardless of chip speed. Here the host ships
    a (K, B) index block once and the whole K-step epoch chunk runs as ONE
    XLA program; the reference has no equivalent (its loop is
    host-driven per batch, step2_train_unet.py:94-123).

    The scan lives INSIDE the shard_map (one GSPMD program looping on
    device) — scanning over a jitted shard_map'd step would re-enter
    pjit per iteration and measure ~8x slower.

    Returns fn(state, store, idx (K,B), fidx (K,B), ex (K,B),
    audio_feats, vgg_variables) -> (state, metrics) where metrics are
    per-step stacked (each leaf (K,)). The per-step loss sequence matches
    K calls of make_resident_train_step to rtol 1e-6 (step k's loss is
    computed from step k-1's carried params, proving the scan carry);
    raw params agree to Adam's sign-flip envelope — for a near-zero grad
    element the step-1 update is lr*sign(g), so cross-program fp
    reassociation can swing single elements by up to 2*lr
    (tests/test_train_step.py::test_multi_step_matches_per_step).

    ``unroll``: True emits K straight-line copies of the step instead of
    a device loop. Default (None) picks by backend: loop on TPU,
    unrolled on CPU — XLA:CPU's thunk runtime deadlocks on a collective
    (psum/pmean) inside a while-loop body (the single intra-op worker
    blocks in the rendezvous; observed on the 8-virtual-device test
    mesh), so the CPU path must be loop-free. TPU compiles the loop body
    once and is unaffected.
    """
    shard_step = _resident_shard_step(model, tx, train_cfg, crop,
                                      use_perceptual, axis_name)
    axes = ((axis_name,) if isinstance(axis_name, str)
            else tuple(axis_name))
    if unroll is None:
        unroll = jax.default_backend() == "cpu"

    def shard_many(state: TrainState, store, idx, fidx, ex, audio_feats,
                   vgg_variables):
        def body(st, xs):
            i, f, e = xs
            return shard_step(st, store, i, f, e, audio_feats,
                              vgg_variables)

        return jax.lax.scan(body, state, (idx, fidx, ex), unroll=unroll)

    mapped = jax.shard_map(
        shard_many, mesh=mesh,
        in_specs=(P(), P(), P(None, axes), P(None, axes),
                  P(None, axes), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def make_eval_step(model: Generator, mesh: Mesh, axis_name: str = "data"):
    """Jitted data-sharded generator forward for validation/inference.

    fn(variables, imgs6 (B,160,160,6) float in [0,1], audio (B,32,32,32))
    -> (B,160,160,3) fp32. B sharded over the mesh.
    """
    def fwd(variables, imgs, audio):
        return model.apply(variables, imgs, audio, train=False)

    mapped = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False)
    return jax.jit(mapped)


def adam(train_cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(train_cfg.lr)
