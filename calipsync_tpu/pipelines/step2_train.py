"""Step 2: single-speaker generator finetune.

Rebuild of /root/reference/step2_train_unet.py:38-138 as a data-parallel
TPU training loop: DP mesh over all devices, shard_map train step (pmean
grads over ICI), host decode overlapped with device compute via the
Prefetcher, Orbax checkpoints with resume support.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from calipsync_tpu.config import PipelineConfig
from calipsync_tpu.core import checkpoint as ckpt
from calipsync_tpu.core.mesh import (batch_axes, build_mesh, replicate,
                                     shard_batch)
from calipsync_tpu.core.weights import import_generator, load_torch_state_dict
from calipsync_tpu.data.dataset import (LipSyncDataset, Prefetcher,
                                        ResidentLipSyncDataset,
                                        batch_iterator)
from calipsync_tpu.nn.vgg import VGG19Features, import_vgg19_features
from calipsync_tpu.train.trainer import (adam, build_model,
                                         create_train_state,
                                         create_zero1_state,
                                         make_resident_multi_step,
                                         make_resident_train_step,
                                         make_train_step,
                                         replicated_opt_to_zero1,
                                         zero1_opt_to_replicated,
                                         zero1_state_sharding)


def load_vgg_variables(vgg_path: Optional[str]):
    """vgg19-dcbb9e9d.pth -> flax variables, or None to skip the
    perceptual term."""
    if not vgg_path:
        return None
    return import_vgg19_features(load_torch_state_dict(vgg_path))


def train_digital_model(dataset_dir: str, save_dir: str,
                        vgg_path: Optional[str] = None,
                        unet_checkpoint: Optional[str] = None,
                        cfg: PipelineConfig = PipelineConfig(),
                        resume: bool = False,
                        log_every: int = 10,
                        loss_history: Optional[list] = None) -> str:
    """Finetune the generator on one speaker's step1 data.

    ``unet_checkpoint`` may be a torch .pth (base-model warm start, the
    reference flow at all_pipeline.py:92) or an Orbax dir (ours).
    ``loss_history``: optional list that receives every step's scalar
    loss (appended per epoch; used by trajectory-comparison tools).
    Returns the final checkpoint path.

    With ``cfg.train.preemption_safe`` (default), SIGTERM/SIGINT make
    the loop checkpoint at the next batch boundary and return cleanly;
    rerun with ``resume=True`` to continue (preemptible TPU pools send
    SIGTERM with a grace window — the reference loses the whole run).
    """
    if cfg.train.preemption_safe:
        with ckpt.PreemptionGuard() as guard:
            return _train_impl(dataset_dir, save_dir, vgg_path,
                               unet_checkpoint, cfg, resume, log_every,
                               guard, loss_history)
    return _train_impl(dataset_dir, save_dir, vgg_path, unet_checkpoint,
                       cfg, resume, log_every, None, loss_history)


def _train_impl(dataset_dir: str, save_dir: str,
                vgg_path: Optional[str],
                unet_checkpoint: Optional[str],
                cfg: PipelineConfig,
                resume: bool,
                log_every: int,
                guard: Optional[ckpt.PreemptionGuard],
                loss_history: Optional[list] = None) -> str:
    os.makedirs(save_dir, exist_ok=True)
    mesh = build_mesh(cfg.mesh)  # 1-D or hybrid (host, data) per config
    axes = batch_axes(mesh)
    axis = axes if cfg.train.sync_batchnorm else None
    model = build_model(cfg.model, axis_name=axis)
    tx = adam(cfg.train)

    init_variables = None
    if unet_checkpoint and os.path.isfile(unet_checkpoint):
        init_variables = import_generator(
            load_torch_state_dict(unet_checkpoint), mode=cfg.model.mode,
            n_blocks=cfg.model.n_blocks)
    if cfg.train.zero1:
        # ZeRO-1: Adam moments live as 1/D shards per rank (trainer.py)
        state = create_zero1_state(model, tx,
                                   jax.random.key(cfg.train.seed), mesh,
                                   axis_name=axes,
                                   init_variables=init_variables)
    else:
        state = create_train_state(model, tx,
                                   jax.random.key(cfg.train.seed),
                                   init_variables)
    # Checkpoints always hold the CANONICAL optimizer layout (param-pytree
    # moments, tx.init(params) shape) so they carry no trace of the device
    # count or the zero1 flag: a run checkpointed on 8 chips with zero1
    # resumes on 4 chips without it, and vice versa.
    def save_state(key: int, st) -> str:
        if cfg.train.zero1:
            st = st.replace(opt_state=zero1_opt_to_replicated(st.opt_state,
                                                              st.params))
        return str(ckpt.save_checkpoint(save_dir, key, st))

    start_epoch = 0
    if resume and ckpt.latest_step(save_dir) is not None:
        start_epoch = ckpt.latest_step(save_dir)  # checkpoints keyed by epoch
        if cfg.train.zero1:
            template = state.replace(
                opt_state=jax.eval_shape(tx.init, state.params))
            restored = ckpt.restore_checkpoint(save_dir, template)
            state = restored.replace(opt_state=replicated_opt_to_zero1(
                restored.opt_state, restored.params, tx, mesh, axes))
        else:
            state = ckpt.restore_checkpoint(save_dir, state)

    vgg_variables = load_vgg_variables(vgg_path)
    use_perceptual = vgg_variables is not None
    if not use_perceptual:
        # keep the step signature stable; zeros tree with no compute cost
        vgg_variables = jax.jit(VGG19Features().init)(
            jax.random.key(0), jnp.zeros((1, 160, 160, 3)))

    resident = cfg.train.resident_data
    if resident:
        # Size guard (ADVICE r2): the resident store costs
        # n_frames * size^2 * 3 bytes of HBM; a long speaker video (an
        # hour is ~6.9 GB at 77 KB/frame) must not OOM the device by
        # default. Same valve as FrameSynthesizer.preload_max_bytes.
        img_dir = os.path.join(dataset_dir, "full_body_img")
        n_frames = len([f for f in os.listdir(img_dir)
                        if f.endswith(".jpg")])
        store_bytes = n_frames * cfg.crop.size * cfg.crop.size * 3
        if store_bytes > cfg.train.resident_max_bytes:
            print(f"training crop store {store_bytes >> 20} MiB exceeds "
                  f"resident_max_bytes; using the streaming dataset")
            resident = False
    k = max(1, cfg.train.steps_per_dispatch) if resident else 1
    if resident:
        maker = (make_resident_multi_step if k > 1
                 else make_resident_train_step)
        step_fn = maker(model, tx, mesh, cfg.train, crop=cfg.crop,
                        use_perceptual=use_perceptual, axis_name=axes)
        ds = ResidentLipSyncDataset(dataset_dir, cfg.model.mode, cfg.crop,
                                    mesh=mesh,
                                    num_workers=cfg.train.num_workers)
    else:
        step_fn = make_train_step(model, tx, mesh, cfg.train,
                                  use_perceptual=use_perceptual,
                                  axis_name=axes)
        ds = LipSyncDataset(dataset_dir, cfg.model.mode, cfg.crop)
    feats_dev = replicate(jnp.asarray(ds.audio_feats), mesh)
    if cfg.train.zero1:
        state = jax.device_put(state,
                               zero1_state_sharding(state, mesh, axes))
    else:
        state = replicate(state, mesh)
    vgg_variables = replicate(vgg_variables, mesh)

    rng = np.random.default_rng(cfg.train.seed)
    last_path = ""
    preempted = False
    for epoch in range(start_epoch, cfg.train.epochs):
        t0 = time.time()
        if resident:
            batches = ds.epoch_indices(cfg.train.batch_size, rng,
                                       shuffle=True, drop_last=True)
        else:
            it = batch_iterator(ds, cfg.train.batch_size, rng,
                                shuffle=True, drop_last=True,
                                num_workers=cfg.train.num_workers)
            batches = Prefetcher(it, depth=2,
                                 put_fn=lambda b: shard_batch(b, mesh))
        # losses stay on device (tiny scalars); ONE stacked fetch per
        # epoch — float() per step would block the host on the link RTT
        # every batch. Log-point fetches still sync, but only 1/log_every.
        losses, n_batches = [], 0
        try:
            if resident and k > 1:
                # group index batches into (K, B) blocks: K steps run as
                # one XLA program (no per-step round-trip). Partial tail
                # blocks are dropped (the same drop_last policy as
                # partial batches) unless the whole epoch is smaller
                # than one block, which is wrap-padded so tiny datasets
                # still train.
                all_batches = list(batches)
                stop = (len(all_batches) // k) * k
                if stop == 0 and all_batches:
                    n0 = len(all_batches)
                    all_batches = [all_batches[i % n0] for i in range(k)]
                    stop = k
                for bi in range(0, stop, k):
                    # blocks are exactly k long by construction (tail
                    # dropped / wrap-padded above): the compiled (K, B)
                    # shape admits no partial blocks
                    arr = np.asarray(all_batches[bi:bi + k])  # (K, 3, B)
                    state, metrics = step_fn(
                        state, ds.store_dev, jnp.asarray(arr[:, 0]),
                        jnp.asarray(arr[:, 1]), jnp.asarray(arr[:, 2]),
                        feats_dev, vgg_variables)
                    losses.append(metrics["loss"])
                    n_batches += k
                    if log_every and (bi // k) % max(
                            1, log_every // k) == 0:
                        print(f"epoch {epoch + 1}/{cfg.train.epochs} "
                              f"batch {n_batches} "
                              f"loss {float(metrics['loss'][-1]):.6f}")
                    if guard is not None and guard.triggered:
                        preempted = True
                        break
            else:
                for batch in batches:
                    if resident:
                        idx, fidx, ex = batch
                        state, metrics = step_fn(state, ds.store_dev,
                                                 jnp.asarray(idx),
                                                 jnp.asarray(fidx),
                                                 jnp.asarray(ex),
                                                 feats_dev, vgg_variables)
                    else:
                        state, metrics = step_fn(state, batch, feats_dev,
                                                 vgg_variables)
                    losses.append(metrics["loss"])
                    n_batches += 1
                    if log_every and n_batches % log_every == 0:
                        print(f"epoch {epoch + 1}/{cfg.train.epochs} "
                              f"batch {n_batches} "
                              f"loss {float(metrics['loss']):.6f}")
                    if guard is not None and guard.triggered:
                        preempted = True
                        break
        finally:
            if isinstance(batches, Prefetcher):
                batches.close()  # don't leak the decode thread on error
        if preempted:
            # this epoch is incomplete: checkpoint keyed by `epoch` (not
            # epoch+1) so resume=True redoes it from the saved state; an
            # existing periodic save at the same key is overwritten
            last_path = save_state(epoch, state)
            print(f"preempted during epoch {epoch + 1} after "
                  f"{n_batches} batches; checkpoint saved to {last_path}"
                  f" — rerun with resume=True to continue")
            return last_path
        if loss_history is not None and losses:
            flat = np.concatenate([np.atleast_1d(np.asarray(l))
                                   for l in losses])
            loss_history.extend(float(x) for x in flat)
        epoch_loss = (float(jnp.sum(jnp.concatenate(
            [jnp.atleast_1d(l) for l in losses]))) if losses else 0.0)
        final = epoch == cfg.train.epochs - 1
        periodic = (cfg.train.checkpoint_every
                    and (epoch + 1) % cfg.train.checkpoint_every == 0)
        if final or periodic:
            last_path = save_state(epoch + 1, state)
        if n_batches:
            print(f"epoch {epoch + 1} done in {time.time() - t0:.2f}s "
                  f"avg loss {epoch_loss / n_batches:.6f}")
    return last_path
