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

Scale options (TrainConfig; none exist in the reference — they are the
standard TPU levers for batch/state beyond one chip's HBM, all proven
equal to the plain step in tests/test_train_scale.py):

  - ``grad_accum``: M microbatches per optimizer update — a ``lax.scan``
    of fwd/bwd passes with carried BN state, grads averaged, ONE update.
    Activation memory is that of a single microbatch.
  - ``remat``: ``jax.checkpoint`` around the UNet apply — the backward
    pass recomputes activations instead of storing them (~1 extra
    forward of FLOPs for the activation-memory floor). Numerically
    identical.
  - ``zero1``: ZeRO stage-1 optimizer-state sharding. Grads arrive via
    ``psum_scatter`` (reduce_scatter over ICI), each rank Adam-updates
    its 1/D param shard, updated shards ``all_gather`` back. Same bytes
    on the wire as the pmean all-reduce (reduce-scatter + all-gather IS
    an all-reduce), optimizer HBM drops 2P -> 2P/D. Requires
    :func:`create_zero1_state` + :func:`zero1_state_sharding` and an
    elementwise optimizer (Adam/SGD family: state leaves param-shaped
    or scalar).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


def _axes_tuple(axis_name) -> tuple:
    return (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)


def _axes_size(mesh: Mesh, axes: tuple) -> int:
    return math.prod(mesh.shape[a] for a in axes)


def _scan_unroll() -> bool:
    """XLA:CPU's thunk runtime deadlocks on a collective (psum/pmean)
    inside a while-loop body — the single intra-op worker blocks in the
    rendezvous (observed on the 8-virtual-device test mesh). Device
    loops that may contain collectives (sync-BN inside the grad_accum
    scan, the multi-step scan) therefore unroll on CPU; TPU compiles
    the loop body once and is unaffected."""
    return jax.default_backend() == "cpu"


def build_model(model_cfg: ModelConfig, axis_name: Optional[str]) -> Generator:
    return Generator(n_channels=model_cfg.n_channels, mode=model_cfg.mode,
                     n_blocks=model_cfg.n_blocks, dtype=_dtype_of(model_cfg),
                     axis_name=axis_name, attn_impl=model_cfg.attn_impl)


def _init_variables(model: Generator, rng: jax.Array,
                    init_variables: Optional[dict]) -> dict:
    if init_variables is not None:
        return init_variables
    audio_shape = ((1, 32, 32, 32) if model.mode == "hubert"
                   else (1, 16, 32, 256))
    return jax.jit(model.init)(
        rng, jnp.zeros((1, 160, 160, model.n_channels)),
        jnp.zeros(audio_shape))


def _flat_param_spec(params) -> jax.ShapeDtypeStruct:
    """Shape/dtype of ``ravel_pytree(params)[0]`` without materializing it."""
    return jax.eval_shape(lambda p: ravel_pytree(p)[0], params)


def create_train_state(model: Generator, tx: optax.GradientTransformation,
                       rng: jax.Array,
                       init_variables: Optional[dict] = None) -> TrainState:
    """Init (or adopt imported) variables and wrap them in a TrainState."""
    init_variables = _init_variables(model, rng, init_variables)
    params = init_variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=init_variables["batch_stats"],
                      opt_state=tx.init(params))


def create_zero1_state(model: Generator, tx: optax.GradientTransformation,
                       rng: jax.Array, mesh: Mesh, axis_name="data",
                       init_variables: Optional[dict] = None) -> TrainState:
    """TrainState whose optimizer state is ZeRO-1 sharded.

    Moment leaves are stacked ``(D, ceil(P/D))`` blocks over the
    flattened param vector — rank i owns block i, created directly ON
    the mesh with the leading axis sharded: peak optimizer memory per
    device is 2P/D from the start (never the replicated 2P — that would
    defeat ZeRO-1 exactly when the state doesn't fit one chip). Pair
    with a step built from a ``TrainConfig(zero1=True)``; re-running
    :func:`zero1_state_sharding` + ``device_put`` is a no-op. The
    optimizer must be elementwise (its ``init`` is called on a flat
    shard, not the param pytree)."""
    init_variables = _init_variables(model, rng, init_variables)
    params = init_variables["params"]
    axes = _axes_tuple(axis_name)
    d = _axes_size(mesh, axes)
    flat = _flat_param_spec(params)
    shard = -(-flat.shape[0] // d)
    # init values come from a zeros shard (elementwise optimizers init
    # moments to zeros; count to 0) — shard-sized, ~P/D bytes.
    opt_shard = tx.init(jnp.zeros((shard,), flat.dtype))
    shd = NamedSharding(mesh, P(axes))

    def stack(l):
        if getattr(l, "ndim", 0) < 1:
            return l
        # broadcast with a sharded out_sharding: each device materializes
        # only its own (1, shard) block, never the full (D, shard) array.
        return jax.jit(lambda v: jnp.broadcast_to(v[None], (d,) + v.shape),
                       out_shardings=shd)(l)

    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=init_variables["batch_stats"],
                      opt_state=jax.tree.map(stack, opt_shard))


def zero1_opt_to_replicated(opt_state, params):
    """Stacked ZeRO-1 moment leaves -> the param-pytree layout
    ``tx.init(params)`` produces.

    This is the CANONICAL checkpoint form: it carries no trace of the
    device count or the zero1 flag, so a checkpoint written by a ZeRO-1
    run restores onto any topology and into non-ZeRO-1 runs (and vice
    versa via :func:`replicated_opt_to_zero1`). step2_train converts on
    save/restore; padded-tail elements are dropped here and re-created
    as zeros there."""
    flat, unravel = ravel_pytree(params)
    n = flat.shape[0]

    def conv(l):
        if getattr(l, "ndim", 0) < 1:
            return l
        return unravel(l.reshape(-1)[:n])

    return jax.tree.map(conv, opt_state)


def replicated_opt_to_zero1(opt_state, params,
                            tx: optax.GradientTransformation, mesh: Mesh,
                            axis_name="data"):
    """Param-pytree optimizer state -> stacked ``(D, shard)`` ZeRO-1
    leaves placed sharded on ``mesh`` (inverse of
    :func:`zero1_opt_to_replicated`; padded tails are zeros, which are
    neutral under elementwise optimizers because the matching grad/param
    tail elements are zero too — see ``_make_update_fn``)."""
    axes = _axes_tuple(axis_name)
    d = _axes_size(mesh, axes)
    flat_spec = _flat_param_spec(params)
    n = flat_spec.shape[0]
    shard = -(-n // d)
    struct = jax.eval_shape(tx.init,
                            jax.ShapeDtypeStruct((shard,), flat_spec.dtype))
    shd = NamedSharding(mesh, P(axes))

    def conv(sl, rep):
        # `struct` is a tree-prefix of `opt_state`: where it holds a
        # (shard,) moment leaf, `rep` is the whole param-shaped subtree.
        if sl.ndim < 1:
            return jnp.asarray(rep, sl.dtype)
        # Via host numpy, NOT jit: `rep` may be committed to a DIFFERENT
        # mesh than the target (resuming on a new topology is the point
        # of the canonical layout) and jit refuses mixed device sets.
        # device_put with the NamedSharding moves only each device's own
        # (1, shard) block; the full vector exists once, on host.
        flat = np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(rep)])
        flat = np.pad(flat.astype(sl.dtype), (0, d * shard - n))
        return jax.device_put(flat.reshape(d, shard), shd)

    return jax.tree.map(conv, struct, opt_state)


def zero1_state_sharding(state: TrainState, mesh: Mesh,
                         axis_name="data") -> TrainState:
    """NamedShardings to ``jax.device_put`` a :func:`create_zero1_state`
    result: stacked moment leaves shard their leading dim over the mesh
    axes, everything else replicates."""
    axes = _axes_tuple(axis_name)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axes))
    return TrainState(
        step=rep,
        params=jax.tree.map(lambda _: rep, state.params),
        batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
        opt_state=jax.tree.map(
            lambda l: shd if getattr(l, "ndim", 0) >= 1 else rep,
            state.opt_state))


def _state_spec(tx: optax.GradientTransformation, train_cfg: TrainConfig,
                axes: tuple):
    """shard_map spec-prefix for TrainState: everything replicated
    except, under ZeRO-1, the stacked (D, shard) optimizer leaves."""
    if not train_cfg.zero1:
        return P()
    opt_shapes = jax.eval_shape(tx.init,
                                jax.ShapeDtypeStruct((1,), jnp.float32))
    opt_spec = jax.tree.map(lambda l: P(axes) if l.ndim >= 1 else P(),
                            opt_shapes)
    return TrainState(step=P(), params=P(), batch_stats=P(),
                      opt_state=opt_spec)


def _make_grad_fn(model: Generator, train_cfg: TrainConfig,
                  use_perceptual: bool, compute_dtype):
    """value_and_grad of the generator loss for one microbatch. With
    ``train_cfg.remat`` the UNet apply is wrapped in ``jax.checkpoint``
    so the backward pass recomputes its activations (the VGG loss trunk
    stays stored — the UNet dominates activation memory)."""
    def apply_fn(params, stats, im, au):
        return model.apply({"params": params, "batch_stats": stats},
                           im, au, train=True, mutable=["batch_stats"])

    if train_cfg.remat:
        apply_fn = jax.checkpoint(apply_fn)

    def loss_fn(params, stats, im, lb, au, vgg_variables):
        pred, updates = apply_fn(params, stats, im, au)
        total, metrics = generator_loss(
            pred, lb, vgg_variables if use_perceptual else None,
            perceptual_weight=train_cfg.perceptual_weight,
            dtype=compute_dtype)
        return total, (updates["batch_stats"], metrics)

    return jax.value_and_grad(loss_fn, has_aux=True)


def _local_grads(grad_fn, accum: int, unroll: bool, params, stats,
                 imgs, labels, audio, vgg_variables):
    """Per-shard (grads, new_batch_stats, metrics).

    ``accum > 1`` scans fwd/bwd over microbatches with carried BN state
    and averages grads+metrics — ONE optimizer update per call with the
    activation memory of a single microbatch. BN batch statistics are
    per-microbatch (torch grad accumulation behaves the same way)."""
    if accum == 1:
        (_, (stats, metrics)), grads = grad_fn(params, stats, imgs, labels,
                                               audio, vgg_variables)
        return grads, stats, metrics
    if imgs.shape[0] % accum:
        raise ValueError(f"per-shard batch {imgs.shape[0]} is not "
                         f"divisible by grad_accum={accum}")

    def split(x):
        return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

    ims, lbs, aus = split(imgs), split(labels), split(audio)
    (_, (stats, metrics)), grads = grad_fn(params, stats, ims[0], lbs[0],
                                           aus[0], vgg_variables)

    if unroll:
        # Straight-line Python loop, NOT lax.scan(unroll=True): scan
        # over a length-1 xs (accum=2) still emits a while loop even
        # fully unrolled, and a while body holding the sync-BN
        # collectives deadlocks XLA:CPU's thunk runtime (_scan_unroll).
        for i in range(1, accum):
            (_, (stats, m)), g = grad_fn(params, stats, ims[i], lbs[i],
                                         aus[i], vgg_variables)
            grads = jax.tree.map(jnp.add, grads, g)
            metrics = jax.tree.map(jnp.add, metrics, m)
    else:
        def body(carry, xs):
            st, gs, ms = carry
            im, lb, au = xs
            (_, (st, m)), g = grad_fn(params, st, im, lb, au,
                                      vgg_variables)
            return (st, jax.tree.map(jnp.add, gs, g),
                    jax.tree.map(jnp.add, ms, m)), None

        (stats, grads, metrics), _ = jax.lax.scan(
            body, (stats, grads, metrics), (ims[1:], lbs[1:], aus[1:]))
    inv = 1.0 / accum
    return (jax.tree.map(lambda g: g * inv, grads), stats,
            jax.tree.map(lambda m: m * inv, metrics))


def _make_update_fn(tx: optax.GradientTransformation, mesh: Mesh,
                    train_cfg: TrainConfig, axes: tuple):
    """The optimizer half of a shard step: (state, local grads, stats,
    metrics) -> (new state, pmean'd metrics). Either the pmean path
    (replicated optimizer) or ZeRO-1 (reduce-scattered grads, local
    1/D shard update, param shards all-gathered back)."""
    if not train_cfg.zero1:
        def update(state, grads, new_stats, metrics):
            grads = jax.lax.pmean(grads, axes)
            metrics = jax.lax.pmean(metrics, axes)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=new_params,
                                 batch_stats=new_stats,
                                 opt_state=new_opt), metrics

        return update

    d = _axes_size(mesh, axes)

    def update(state, grads, new_stats, metrics):
        metrics = jax.lax.pmean(metrics, axes)
        flat_g, _ = ravel_pytree(grads)
        flat_p, unravel = ravel_pytree(state.params)
        n = flat_g.shape[0]
        shard = -(-n // d)
        pad = d * shard - n
        # mean grads, but only my 1/D shard of them (reduce_scatter);
        # padded tail elements carry zero grads -> zero updates.
        gshard = jax.lax.psum_scatter(jnp.pad(flat_g, (0, pad)), axes,
                                      scatter_dimension=0, tiled=True) / d
        idx = jax.lax.axis_index(axes)
        pshard = jax.lax.dynamic_slice(jnp.pad(flat_p, (0, pad)),
                                       (idx * shard,), (shard,))
        opt_local = jax.tree.map(
            lambda l: l[0] if getattr(l, "ndim", 0) >= 1 else l,
            state.opt_state)
        updates, new_opt = tx.update(gshard, opt_local, pshard)
        new_pshard = optax.apply_updates(pshard, updates)
        flat_new = jax.lax.all_gather(new_pshard, axes, tiled=True)
        new_params = unravel(flat_new[:n])
        new_opt = jax.tree.map(
            lambda l: l[None] if getattr(l, "ndim", 0) >= 1 else l,
            new_opt)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats,
                             opt_state=new_opt), metrics

    return update


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

    ``train_cfg.grad_accum / remat / zero1`` select the scale options
    (module docstring); with ``zero1`` the state must come from
    :func:`create_zero1_state` placed by :func:`zero1_state_sharding`,
    and with ``grad_accum`` the per-shard batch must divide by it.
    """
    axes = _axes_tuple(axis_name)
    compute_dtype = model.dtype or jnp.float32
    grad_fn = _make_grad_fn(model, train_cfg, use_perceptual, compute_dtype)
    update_fn = _make_update_fn(tx, mesh, train_cfg, axes)
    accum = train_cfg.grad_accum
    unroll = _scan_unroll()

    def shard_step(state: TrainState, batch: dict, audio_feats: jax.Array,
                   vgg_variables):
        imgs = jnp.concatenate([batch["ref"], batch["masked"]], axis=-1)
        imgs = imgs.astype(compute_dtype) / 255.0
        labels = batch["target"].astype(jnp.float32) / 255.0
        audio = batched_windows(audio_feats, batch["index"],
                                mode=model.mode).astype(compute_dtype)
        grads, new_stats, metrics = _local_grads(
            grad_fn, accum, unroll, state.params, state.batch_stats,
            imgs, labels, audio, vgg_variables)
        return update_fn(state, grads, new_stats, metrics)

    batch_spec = {"ref": P(axes), "masked": P(axes),
                  "target": P(axes), "index": P(axes)}
    state_spec = _state_spec(tx, train_cfg, axes)
    mapped = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(state_spec, batch_spec, P(), P()),
        out_specs=(state_spec, P()),
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
    (tests/test_train_step.py). The same TrainConfig scale options apply
    (tests/test_train_scale.py covers resident ZeRO-1).
    """
    shard_step = _resident_shard_step(model, tx, mesh, train_cfg, crop,
                                      use_perceptual, axis_name)
    axes = _axes_tuple(axis_name)
    state_spec = _state_spec(tx, train_cfg, axes)

    mapped = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(state_spec, P(), P(axes), P(axes), P(axes), P(), P()),
        out_specs=(state_spec, P()),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def _resident_shard_step(model, tx, mesh, train_cfg, crop, use_perceptual,
                         axis_name):
    """Per-shard resident step body (runs inside shard_map)."""
    from calipsync_tpu.config import CropConfig

    crop = crop or CropConfig()
    axes = _axes_tuple(axis_name)
    compute_dtype = model.dtype or jnp.float32
    grad_fn = _make_grad_fn(model, train_cfg, use_perceptual, compute_dtype)
    update_fn = _make_update_fn(tx, mesh, train_cfg, axes)
    accum = train_cfg.grad_accum
    unroll = _scan_unroll()
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
        grads, new_stats, metrics = _local_grads(
            grad_fn, accum, unroll, state.params, state.batch_stats,
            imgs, labels, audio, vgg_variables)
        return update_fn(state, grads, new_stats, metrics)

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
    unrolled on CPU (see :func:`_scan_unroll`).
    """
    shard_step = _resident_shard_step(model, tx, mesh, train_cfg, crop,
                                      use_perceptual, axis_name)
    axes = _axes_tuple(axis_name)
    state_spec = _state_spec(tx, train_cfg, axes)
    if unroll is None:
        unroll = _scan_unroll()

    def shard_many(state: TrainState, store, idx, fidx, ex, audio_feats,
                   vgg_variables):
        if unroll:
            # Python loop, not lax.scan(unroll=True): a length-1 scan
            # still emits a while loop even "fully unrolled", and a
            # while body holding collectives deadlocks XLA:CPU's thunk
            # runtime (_scan_unroll).
            ms = []
            for i in range(idx.shape[0]):
                state, m = shard_step(state, store, idx[i], fidx[i],
                                      ex[i], audio_feats, vgg_variables)
                ms.append(m)
            return state, jax.tree.map(lambda *xs: jnp.stack(xs), *ms)

        def body(st, xs):
            i, f, e = xs
            return shard_step(st, store, i, f, e, audio_feats,
                              vgg_variables)

        return jax.lax.scan(body, state, (idx, fidx, ex))

    mapped = jax.shard_map(
        shard_many, mesh=mesh,
        in_specs=(state_spec, P(), P(None, axes), P(None, axes),
                  P(None, axes), P(), P()),
        out_specs=(state_spec, P()),
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
