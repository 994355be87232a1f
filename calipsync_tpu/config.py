"""Typed configuration for the CALipSync-TPU framework.

The reference hard-codes every constant in place (fps=25 at
/root/reference/inference.py:36, crop literals at
/root/reference/dataset/dataset.py:91-98, sample rates at
/root/reference/image_infer_v1/infer_api.py:58-62, ...). Here they live in
one typed, serializable config tree (SURVEY.md section 5 calls this out as a
day-one requirement).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass(frozen=True)
class CropConfig:
    """Mouth-crop geometry (reference: dataset/dataset.py:83-98)."""

    resize: int = 168          # square resize of the raw mouth bbox
    margin: int = 4            # center crop [margin : resize - margin]
    size: int = 160            # model input resolution
    mask_x: int = 5            # cv2.rectangle((5, 5, 150, 145)) semantics:
    mask_y: int = 5            # rows [y, y+h-1], cols [x, x+w-1] filled black
    mask_w: int = 150
    mask_h: int = 145


@dataclass(frozen=True)
class AudioConfig:
    sample_rate: int = 16_000          # HuBERT input rate
    fps: int = 25                      # output video rate
    window: int = 16                   # HuBERT rows per frame window (+-8)
    hubert_dim: int = 1024
    min_rms_db: float = -150.0         # silence gate (step1:183-188)
    playback_rates: tuple[int, ...] = (16_000, 24_000, 32_000)


@dataclass(frozen=True)
class ModelConfig:
    n_channels: int = 6
    mode: str = "hubert"               # 'hubert' | 'wenet'
    n_blocks: int = 4
    dtype: str = "float32"             # compute dtype: 'float32'|'bfloat16'
    attn_impl: str = "xla"             # 'xla' | 'pallas'


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 16               # global batch (sharded over data axis)
    lr: float = 1e-3
    epochs: int = 20
    perceptual_weight: float = 0.1
    num_workers: int = 4
    seed: int = 0
    checkpoint_every: int = 0          # 0 = final epoch only (ref behavior)
    sync_batchnorm: bool = True        # cross-replica BN stats under DP
    # device-resident training data: every frame decoded once, crops in
    # HBM (~77 KB/frame), steps fed by index vectors — no JPEG decode in
    # the training loop. Disable for datasets larger than device memory.
    resident_data: bool = True
    # Safety valve (mirrors FrameSynthesizer.preload_max_bytes): when the
    # crop store would exceed this many bytes of HBM, step2 falls back to
    # the streaming LipSyncDataset instead of OOMing the device.
    resident_max_bytes: int = 4 << 30
    # K train steps per device dispatch on the resident path (lax.scan
    # inside shard_map, trainer.make_resident_multi_step): removes the
    # per-step host round-trip — pays when step time < link RTT. 1 =
    # one dispatch per step. Partial tail blocks are dropped (the same
    # drop_last policy as partial batches); an epoch smaller than one
    # block is wrap-padded so tiny datasets still train.
    steps_per_dispatch: int = 1
    # SIGTERM/SIGINT checkpoint the run at the next batch boundary and
    # return cleanly (resume=True continues). Preemptible TPU pools send
    # SIGTERM with a grace window; set False when the caller owns the
    # process's signal handling.
    preemption_safe: bool = True
    # Microbatches per optimizer update (grad accumulation): the
    # per-shard batch splits into this many sequential fwd/bwd passes
    # (lax.scan), grads average, ONE Adam update — grows the effective
    # batch without growing activation memory. BN batch statistics are
    # per-microbatch (same semantics as torch grad accumulation).
    grad_accum: int = 1
    # Rematerialize generator activations in the backward pass
    # (jax.checkpoint around the UNet apply): ~1 extra forward of FLOPs
    # for an activation-memory floor. Numerically identical to the
    # stored-activation step.
    remat: bool = False
    # ZeRO-1 optimizer-state sharding: each data-parallel rank keeps
    # 1/D of the Adam moments; grads arrive via psum_scatter
    # (reduce_scatter over ICI), the shard updates locally, updated
    # param shards all_gather back. Same update math as the pmean path
    # (tests assert equality); optimizer HBM drops 2P -> 2P/D. Requires
    # create_zero1_state (trainer.py) instead of create_train_state.
    zero1: bool = False


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh spec: data-parallel over ICI, optional DCN host axis.

    dcn=1 (default) builds a 1-D ``(data,)`` mesh over local devices;
    dcn>1 (or -1 = process count) builds the 2-D ``(host, data)`` mesh of
    core.mesh.make_hybrid_mesh, where the host axis crosses DCN. Requires
    core.mesh.maybe_initialize_distributed() to have run multi-process."""

    data: int = -1                     # -1 = all (per-host) devices
    axis_name: str = "data"
    dcn: int = 1                       # host axis size; -1 = process count
    dcn_axis_name: str = "host"
    # HuBERT model-parallel axis (audio/hubert_pipeline.py): 1 = off;
    # >1 builds a (model,) mesh over the first `model` local devices and
    # shards the 315M-param extractor across them. `hubert_parallel`
    # picks tensor (core/tp.py) or GPipe pipeline (core/pp.py) sharding;
    # PP needs num_hidden_layers % model == 0 (24 % S for large).
    model: int = 1
    model_axis_name: str = "model"
    hubert_parallel: str = "tp"        # 'tp' | 'pp'
    pp_microbatches: int = 0           # 0 = one per pipeline stage


@dataclass(frozen=True)
class InferConfig:
    batch_size: int = 8
    fps: int = 25
    buffer_threshold_s: float = 1.0    # streaming synthesis window
    motion_min_pct: int = 5            # ping-pong segment length, % of total
    motion_max_pct: int = 15
    # 'yuv420': device packs planar I420 predictions — half the d2h bytes,
    # lossless in delivered quality for 4:2:0 sinks (RTMP/mp4). 'bgr' is
    # the reference-exact byte-for-byte transfer (used by parity tests).
    # 'adaptive' (default) measures each format's real throughput and
    # keeps the winner: yuv420 when the tunnel is link-bound, bgr when
    # the host is the bottleneck (FrameSynthesizer._choose_call_format).
    transfer_format: str = "adaptive"
    # Streaming first-window head batch: the first device batch of each
    # synthesis window runs at this small padded shape so the first
    # frame's compute + d2h is tiny (time-to-first-frame), then the
    # window continues at batch_size. 0 = off. Output-identical
    # (pad-invariant per sample); offline paths ignore it.
    first_window_batch: int = 4


@dataclass(frozen=True)
class PipelineConfig:
    crop: CropConfig = field(default_factory=CropConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    infer: InferConfig = field(default_factory=InferConfig)


def _from_dict(cls, data: dict) -> Any:
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
            v = _from_dict(f.type, v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def load_config(path: str | pathlib.Path | None = None,
                overrides: Optional[dict] = None) -> PipelineConfig:
    """Load a PipelineConfig from JSON, with optional nested overrides."""
    data: dict = {}
    if path is not None:
        data = json.loads(pathlib.Path(path).read_text())
    if overrides:
        def merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    merge(dst[k], v)
                else:
                    dst[k] = v
        merge(data, overrides)
    return _from_dict(PipelineConfig, data)


def save_config(cfg: PipelineConfig, path: str | pathlib.Path) -> None:
    pathlib.Path(path).write_text(
        json.dumps(dataclasses.asdict(cfg), indent=2))
