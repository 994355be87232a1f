"""FrameSynthesizer: batched lip-sync frame generation + paste-back.

TPU-native rebuild of the reference serving core
(/root/reference/image_infer_v1/tools/frame_synthesizer/infer_api.py:12-456):

  - "Motion generalization" ping-pong walk over physical frames (random
    5-15%-of-total segments, direction flips at clip ends) with an explicit
    numpy Generator instead of global random state.
  - Threaded batch frame loading (frames/positions/masks from the step3
    layout) overlapped with TPU compute via a one-batch pipeline.
  - The UNet forward runs jitted at a fixed batch size (short tails are
    padded) — one compiled shape for the whole stream; normalization,
    6-channel concat, audio-window gather and uint8 quantization all happen
    on device.
  - Paste-back compositing (fillPoly face polygon -> area-proportional
    dilate -> optional XSeg-mask blend -> alpha composite) is uint8 host
    work, pixel-matching the reference.

Per-stage wall timers and an end-of-run FPS line mirror the reference's
time_stats instrumentation.
"""

from __future__ import annotations

import itertools
import os
import threading
import time
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from calipsync_tpu.audio.windows import batched_windows
from calipsync_tpu.config import CropConfig
from calipsync_tpu.nn.unet import Generator
from calipsync_tpu.vision.geometry import (CropParams, mouth_bbox_infer)


def yuv420_pack(pred255: jax.Array) -> jax.Array:
    """Device-side BGR -> planar I420 pack: (B, S, S, 3) float in [0, 255]
    -> (B, S*S*3//2) uint8 [Y plane | U plane | V plane].

    Halves the device->host bytes per frame (the serving bottleneck on
    this tunnel is d2h bandwidth, not chip FLOPs) and is *free* in
    delivered quality: both reference sinks re-encode 4:2:0 anyway — the
    RTMP pusher's NVENC yuv420p (player_rtmp_windows.py:65-93) and any
    mp4 x264 mux. Video-range BT.601, the exact pair of OpenCV's
    COLOR_YUV2BGR_I420 on the host; chroma is a 2x2 mean (higher fidelity
    than cv2's own top-left subsample). Rounded, not truncated — the path
    is already lossy, rounding halves the quantization error.
    """
    b, g, r = pred255[..., 0], pred255[..., 1], pred255[..., 2]
    y = 16.0 + (65.738 * r + 129.057 * g + 25.064 * b) * (1.0 / 256.0)
    u = 128.0 + (-37.945 * r - 74.494 * g + 112.439 * b) * (1.0 / 256.0)
    v = 128.0 + (112.439 * r - 94.154 * g - 18.285 * b) * (1.0 / 256.0)

    def sub(c):  # 2x2 mean chroma
        n, h, w = c.shape
        return c.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    def q(c):
        return jnp.clip(jnp.round(c), 0.0, 255.0).astype(jnp.uint8)

    n = pred255.shape[0]
    return jnp.concatenate([q(y).reshape(n, -1),
                            q(sub(u)).reshape(n, -1),
                            q(sub(v)).reshape(n, -1)], axis=1)


def yuv420_unpack(flat_u8: np.ndarray, size: int) -> np.ndarray:
    """Host-side inverse of :func:`yuv420_pack` for ONE frame:
    (S*S*3//2,) uint8 -> (S, S, 3) uint8 BGR via OpenCV's I420 decode."""
    return cv2.cvtColor(flat_u8.reshape(size * 3 // 2, size),
                        cv2.COLOR_YUV2BGR_I420)


def _pack_pred(pred, transfer_format: str):
    """Common output packing: model output (B,S,S,3) float [0,1] -> flat
    uint8 rows for d2h. 'bgr' keeps the reference's exact quantization
    (float*255 C-cast truncation); 'yuv420' halves the bytes."""
    pred = pred * 255.0
    if transfer_format == "yuv420":
        return yuv420_pack(pred)
    return pred.astype(jnp.uint8).reshape(pred.shape[0], -1)


def make_generate_fn(model: Generator, transfer_format: str = "bgr"):
    """Jitted end-to-end device step: uint8 crops -> uint8 mouth frames.

    fn(variables, ref_u8 (B,160,160,3), masked_u8 (B,160,160,3),
       audio_feats (T,2,1024), indices (B,)) -> (B, S) uint8 flat rows
    (S = size*size*3 for 'bgr', size*size*3//2 for 'yuv420')
    """
    @jax.jit
    def fn(variables, ref_u8, masked_u8, audio_feats, indices):
        dtype = model.dtype or jnp.float32
        imgs = jnp.concatenate([ref_u8, masked_u8], axis=-1)
        imgs = imgs.astype(dtype) / 255.0
        audio = batched_windows(audio_feats, indices,
                                mode=model.mode).astype(dtype)
        pred = model.apply(variables, imgs, audio, train=False)
        return _pack_pred(pred, transfer_format)

    return fn


def make_generate_resident_fn(model: Generator, crop: CropConfig,
                              transfer_format: str = "bgr"):
    """Device-resident variant: the speaker's mouth crops live in HBM once
    and batches are addressed by index, so the host sends only two tiny
    int32 vectors per step. Masking is recomputed on device (a zeroed
    rectangle costs nothing fused into the normalize).

    Crops are stored and predictions returned FLAT, (N, size*size*3)
    uint8: a trailing dim of 3 would be lane-padded to 128 in TPU tiled
    layout, making the device<->host copy ~40x larger than the payload
    (measured: 571ms vs 306ms per 128-frame batch over this tunnel).

    fn(variables, crops_u8 (N, S) [resident], phys_idx (B,),
       audio_feats (T,2,1024) [resident], feat_idx (B,)) -> (B, S) uint8
    where S = size*size*3.
    """
    y0, y1 = crop.mask_y, crop.mask_y + crop.mask_h
    x0, x1 = crop.mask_x, crop.mask_x + crop.mask_w
    size = crop.size

    @jax.jit
    def fn(variables, crops_u8, phys_idx, audio_feats, feat_idx):
        dtype = model.dtype or jnp.float32
        ref = jnp.take(crops_u8, phys_idx, axis=0)
        ref = ref.reshape(-1, size, size, 3).astype(dtype) / 255.0
        masked = ref.at[:, y0:y1, x0:x1, :].set(0.0)
        imgs = jnp.concatenate([ref, masked], axis=-1)
        audio = batched_windows(audio_feats, feat_idx,
                                mode=model.mode).astype(dtype)
        pred = model.apply(variables, imgs, audio, train=False)
        return _pack_pred(pred, transfer_format)

    return fn


def make_generate_resident_sharded_fn(model: Generator, crop: CropConfig,
                                      mesh, axis_name: str = "data",
                                      transfer_format: str = "bgr"):
    """Multi-chip variant of :func:`make_generate_resident_fn`: the batch
    (phys_idx/feat_idx and the returned predictions) is sharded over the
    mesh's data axis while the crop store, audio features and params are
    replicated — frame windows fan out across chips over ICI and only the
    uint8 predictions come home (the north-star multi-stream serving
    sharding; reference has no equivalent, SURVEY.md section 2).
    """
    from jax.sharding import PartitionSpec as P

    y0, y1 = crop.mask_y, crop.mask_y + crop.mask_h
    x0, x1 = crop.mask_x, crop.mask_x + crop.mask_w
    size = crop.size

    def shard_fn(variables, crops_u8, phys_idx, audio_feats, feat_idx):
        dtype = model.dtype or jnp.float32
        ref = jnp.take(crops_u8, phys_idx, axis=0)
        ref = ref.reshape(-1, size, size, 3).astype(dtype) / 255.0
        masked = ref.at[:, y0:y1, x0:x1, :].set(0.0)
        imgs = jnp.concatenate([ref, masked], axis=-1)
        audio = batched_windows(audio_feats, feat_idx,
                                mode=model.mode).astype(dtype)
        pred = model.apply(variables, imgs, audio, train=False)
        return _pack_pred(pred, transfer_format)

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False)
    return jax.jit(mapped)


class PingPongSequencer:
    """Physical-frame walk (reference _generate_frame_sequence:147-190)."""

    def __init__(self, total_frames: int, rng: np.random.Generator,
                 min_pct: int = 5, max_pct: int = 15):
        self.total_frames = total_frames
        self.rng = rng
        self.min_pct = min_pct
        self.max_pct = max_pct
        self.direction: Optional[int] = None
        self.target = 0
        self.processed = 0
        self.position = 0

    def next(self, needed: int) -> list[int]:
        seq: list[int] = []
        if self.processed >= self.target or self.direction is None:
            pct = int(self.rng.integers(self.min_pct, self.max_pct + 1))
            self.target = self.total_frames * pct // 100
            self.direction = int(self.rng.choice([1, -1]))
            self.processed = 0
        while len(seq) < needed:
            seq.append(self.position)
            self.position += self.direction
            if self.position >= self.total_frames:
                self.position = self.total_frames - 2
                self.direction = -1
            elif self.position < 0:
                self.position = 1
                self.direction = 1
        self.processed += len(seq)
        return seq


class FrameSynthesizer:
    def __init__(self, variables: dict, data_dir: str,
                 model: Optional[Generator] = None, batch_size: int = 8,
                 crop: CropConfig = CropConfig(),
                 seed: Optional[int] = None,
                 max_cached_frames: int = 4000,
                 preload: bool = True,
                 mesh=None, axis_name: str = "data",
                 pipeline_depth: int = 3,
                 transfer_format: str = "bgr",
                 preload_max_bytes: int = 4 << 30,
                 first_batch_size: int = 0):
        """
        Args:
          variables: generator {'params','batch_stats'} (imported or trained)
          data_dir: step3 ``infer_data`` directory (frames/positions/masks)
          model: Generator module (default: bf16-free fp32 hubert model)
          batch_size: device batch; tails are padded to it
          max_cached_frames: LRU bound on the HOST cache of decoded frames
            + derived crops/masks (~1-4 MB/frame depending on resolution).
            The ping-pong walk is sequential with slow direction flips, so
            revisits are local and an LRU far smaller than the clip still
            hits almost always. Independent of ``preload``: a 5-minute
            clip (7,500 frames) keeps the device-resident fast path even
            when the host cache is capped below the clip length.
          preload: decode every physical frame up front and park the whole
            speaker's mouth-crop array in device HBM (~75 KB/frame, so
            even 7,500 frames are ~550 MB). Per step the host then uploads
            only two int32 index vectors — the device gathers its own
            inputs. This is the main lever against host<->device bandwidth
            (SURVEY.md section 7 (5)); disable only for latency-critical
            init.
          mesh: optional jax Mesh — shards each batch's frame windows over
            the ``axis_name`` devices (multi-chip serving). Requires
            preload and batch_size divisible by the mesh size.
          pipeline_depth: in-flight device batches; d2h copies run in
            worker threads and partially parallelize (~20% measured), so
            depth >2 overlaps transfer of batch k with compute of k+1 and
            compositing of k-1.
          transfer_format: 'bgr' (reference-exact uint8 crops), 'yuv420'
            (device packs planar I420 — HALF the d2h bytes per frame; the
            host decodes via cv2. Free in delivered quality when the sink
            re-encodes 4:2:0, i.e. RTMP/mp4, which is every reference
            player backend; measured full-frame PSNR vs 'bgr' output is
            recorded in tests/test_synthesizer.py), or 'adaptive': each
            call runs one format and feeds its MEASURED fps into a
            per-(format, call-size) EMA table; the next call takes the
            argmax, re-measuring the loser every ~30 s (see the
            "adaptive transfer format" section below for why a
            cost-model probe was rejected). Motivation: bgr wins
            host-bound windows (550 vs 403 fps), yuv420 wins link-bound
            ones (478 vs 255) — BENCH_r04_local.json / BENCH_r04.json —
            and the optimum flips with tunnel conditions.
          first_batch_size: when >0, the FIRST device batch of each
            iterate call runs at this smaller padded shape, so the first
            frame's time-to-delivery pays a small compute + d2h (e.g.
            4 x 19 KB yuv420 rows instead of 32 x) — the rest of the call
            proceeds at ``batch_size``. Output-identical (generation is
            pad-invariant per sample; tested); costs one extra cached
            executable. Serving sets this (latency-sensitive first
            window, reference image_infer_v1/infer_api.py:215-315);
            offline/bench paths leave it 0.
        """
        self.data_dir = data_dir
        self.batch_size = batch_size
        self.mesh = None  # set below; set_first_batch_size reads it
        self.axis_name = axis_name
        self.set_first_batch_size(first_batch_size)
        self.crop = crop
        self.frames_dir = os.path.join(data_dir, "frames")
        self.positions_dir = os.path.join(data_dir, "positions")
        self.masks_dir = os.path.join(data_dir, "masks")
        self.total_frames = len([f for f in os.listdir(self.frames_dir)
                                 if f.endswith(".jpg")])
        self.model = model or Generator()
        self.variables = variables
        self.mesh = mesh
        # Feature-transfer dtype: when the model computes in bf16,
        # uploading the HuBERT rows as bf16 is bit-identical (the device
        # path is gather -> zero-mask -> astype(bf16), and casting before
        # the value-preserving gather equals casting after) and HALVES
        # h2d bytes — per 1 s serving window the fp32 feature upload
        # (2 MB bucket) otherwise outweighs the yuv420 frame d2h.
        import ml_dtypes

        self._feat_dtype = (ml_dtypes.bfloat16
                            if self.model.dtype == jnp.bfloat16
                            else np.float32)
        if transfer_format not in ("bgr", "yuv420", "adaptive"):
            raise ValueError(f"unknown transfer_format: {transfer_format}")
        self.transfer_format = transfer_format
        # concrete formats this synthesizer can dispatch; adaptive keeps
        # both executables live and flips between them
        fmts = (("bgr", "yuv420") if transfer_format == "adaptive"
                else (transfer_format,))
        # adaptive starts on yuv420 (the safe choice on a slow tunnel —
        # its worst case is a sub-ms host decode, bgr's worst case is 2x
        # the link bytes); measurements take over within two calls
        self._active_format = fmts[-1]
        self._fmt_fps: Dict[tuple, float] = {}
        self._last_explore = 0.0
        self._replicate = lambda x: x
        self._generate_fns = {f: make_generate_fn(self.model, f)
                              for f in fmts}
        if mesh is not None:
            if not preload:
                raise ValueError("mesh sharding requires preload=True")
            if batch_size % mesh.shape[axis_name]:
                raise ValueError("batch_size must divide over the mesh")
            self.set_first_batch_size(self.first_batch_size)
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._replicate = lambda x: jax.device_put(x, rep)
            self.variables = jax.tree.map(self._replicate, variables)
            self._generate_resident_fns = {
                f: make_generate_resident_sharded_fn(
                    self.model, crop, mesh, axis_name, f) for f in fmts}
        else:
            # pin params on device ONCE: torch-imported variables are
            # host numpy trees, and passing those to a jitted call
            # re-uploads all ~79 MB of them over the tunnel per dispatch
            self.variables = jax.device_put(variables)
            self._generate_resident_fns = {
                f: make_generate_resident_fn(self.model, crop, f)
                for f in fmts}
        self.executor = ThreadPoolExecutor(max_workers=max(4, batch_size))
        self.sequencer = PingPongSequencer(
            self.total_frames, np.random.default_rng(seed))
        self.last_logical_index = -1
        self.pipeline_depth = pipeline_depth
        self.max_cached_frames = max_cached_frames
        self._cache: "OrderedDict[int, dict]" = OrderedDict()
        self._cache_lock = threading.Lock()
        self._crops_dev = None
        if preload and self.total_frames > 0:
            store_bytes = self.total_frames * crop.size * crop.size * 3
            if store_bytes > preload_max_bytes:
                if mesh is not None:
                    # silent degrade would void the 'mesh requires
                    # preload' invariant above: the streaming fallback
                    # is unsharded, so multi-chip serving would quietly
                    # run at single-chip-or-worse throughput
                    raise ValueError(
                        f"crop store {store_bytes >> 20} MiB exceeds "
                        f"preload_max_bytes ({preload_max_bytes >> 20} "
                        f"MiB) and mesh sharding requires the resident "
                        f"store; raise preload_max_bytes or serve "
                        f"without a mesh")
                # safety valve for extreme clips (an hour of frames is
                # ~7 GB of HBM + minutes of decode): degrade to the
                # streaming upload path instead of exhausting the device
                print(f"crop store {store_bytes >> 20} MiB exceeds "
                      f"preload_max_bytes; using streaming path")
            else:
                self.preload()

    def set_first_batch_size(self, n: int) -> int:
        """Validated setter for the first-window head batch (the single
        place its constraints live): degenerate sizes (negative, or >=
        batch_size) and head shapes that don't divide over the serving
        mesh disable the head (0). Returns the effective value. Safe to
        call between iterate calls (each call re-reads it)."""
        requested = n
        if n < 0 or n >= self.batch_size:
            n = 0
        if n and self.mesh is not None and n % self.mesh.shape[
                self.axis_name]:
            n = 0
        if requested > 0 and n == 0:
            # a silently-dropped head batch loses the low-latency first
            # frame with no signal — mirror the preload degrade message
            print(f"first_batch_size {requested} disabled: must be in "
                  f"[1, batch_size) and divide over the serving mesh")
        self.first_batch_size = n
        return n

    # ---------------- per-physical-frame cache ----------------

    def _build_entry(self, phys_idx: int) -> dict:
        """Load one physical frame and precompute everything derived from
        (frame, landmarks): model input crops and the dilated face-polygon
        compositing mask. All of it is reused every time the ping-pong walk
        revisits this frame."""
        cfg = self.crop
        n = str(phys_idx % self.total_frames).zfill(6)
        img = cv2.imread(os.path.join(self.frames_dir, f"{n}.jpg"))
        lms = np.loadtxt(os.path.join(self.positions_dir, f"{n}.txt"))
        xseg = None
        mask_path = os.path.join(self.masks_dir, f"{n}.jpg")
        if os.path.exists(mask_path):
            m = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
            if m is not None:
                xseg = m.astype(np.float32) / 255.0

        h, w = img.shape[:2]
        p = mouth_bbox_infer(lms, h, w)
        crop168 = cv2.resize(img[p.ymin:p.ymax, p.xmin:p.xmax],
                             (cfg.resize, cfg.resize))
        m = cfg.margin
        real = np.ascontiguousarray(crop168[m:cfg.resize - m,
                                            m:cfg.resize - m])
        masked = real.copy()
        masked[cfg.mask_y:cfg.mask_y + cfg.mask_h,
               cfg.mask_x:cfg.mask_x + cfg.mask_w] = 0

        # compositing mask (reference process_batch:279-315): face polygon
        # scaled into the (width, width) paste square, area-proportional
        # dilation, optional XSeg blend
        face_mask = np.zeros((p.ymax - p.ymin, p.xmax - p.xmin), np.uint8)
        pts = np.asarray(lms[:33], dtype=np.float64).copy()
        pts[:, 0] -= p.xmin
        pts[:, 1] -= p.ymin
        pts[:, 0] *= p.width / (p.xmax - p.xmin)
        pts[:, 1] *= p.width / (p.ymax - p.ymin)
        cv2.fillPoly(face_mask, [pts.astype(np.int32)], 255)
        area = np.sum(face_mask > 0)
        expand = max(1, int(np.sqrt(area / np.pi) * 0.15))
        kernel = np.ones((expand * 2 + 1, expand * 2 + 1), np.uint8)
        face_mask = cv2.dilate(face_mask, kernel, iterations=1)
        fm = (face_mask.astype(np.float32) / 255.0)[..., None]
        if xseg is not None:
            # resize to the face-mask's own shape: equals the
            # reference's (width, width) whenever the bbox is unclamped
            # (the only case that composites — clamped bboxes take the
            # shape-mismatch fallback, reference :317-324); resizing to
            # (width, width) unconditionally would crash this
            # precompute on clamped frames before the fallback runs
            rm = cv2.resize(xseg, (p.xmax - p.xmin, p.ymax - p.ymin))
            fm = fm * rm[..., None]

        return {"img": img, "lms": lms, "params": p, "crop168": crop168,
                "ref": real, "masked": masked, "fm": fm}

    def _frame_entry(self, phys_idx: int) -> dict:
        phys_idx = phys_idx % self.total_frames
        with self._cache_lock:
            e = self._cache.get(phys_idx)
            if e is not None:
                self._cache.move_to_end(phys_idx)
                return e
        e = self._build_entry(phys_idx)  # outside the lock (ms-scale work)
        with self._cache_lock:
            self._cache[phys_idx] = e
            while len(self._cache) > self.max_cached_frames:
                self._cache.popitem(last=False)
        return e

    def _entries_for(self, seq):
        return list(self.executor.map(self._frame_entry, seq))

    def preload(self) -> None:
        """Decode all physical frames and upload the crop store to HBM
        (flat layout — see make_generate_resident_fn). Host entries pass
        through the LRU cache, so clips longer than max_cached_frames keep
        only their tail cached — the HBM store itself is never capped."""
        crops = np.stack(list(self.executor.map(
            lambda i: self._frame_entry(i)["ref"].reshape(-1),
            range(self.total_frames))))
        self._crops_dev = (self._replicate(crops) if self.mesh is not None
                           else jax.device_put(crops))

    # ---------------- synthesis ----------------

    # ---------------- adaptive transfer format ----------------
    #
    # Decision signal: MEASURED end-to-end throughput per format, not a
    # link-bandwidth cost model. (A probe-based model was tried first
    # and failed in production: a d2h probe racing the pipeline's own
    # transfers read 10 GB/s on a 21 MB/s tunnel window and picked the
    # wrong format.) Each iterate call runs ONE format; its achieved
    # fps feeds an EMA keyed by (format, call-size class); the next
    # call takes the argmax, re-measuring the loser every
    # ``explore_interval_s`` so a shifted tunnel window gets noticed.
    # Size classes keep 25-row streaming windows (fixed overheads
    # dominate) from being compared against 1000-row offline passes.

    _EXPLORE_INTERVAL_S = 30.0

    def _size_class(self, n_rows: int) -> str:
        return "small" if n_rows <= 64 else "large"

    def _note_call_fps(self, fmt: str, n_rows: int, wall: float) -> None:
        if self.transfer_format != "adaptive" or not n_rows or wall <= 0:
            return
        key = (fmt, self._size_class(n_rows))
        fps = n_rows / wall
        old = self._fmt_fps.get(key)
        self._fmt_fps[key] = fps if old is None else 0.5 * old + 0.5 * fps

    def _choose_call_format(self, n_rows: int) -> str:
        """Pick the transfer format for one whole iterate call. Pure
        table lookup — never blocks, so it is safe ahead of the
        latency-critical head batch."""
        if self.transfer_format != "adaptive":
            return self._active_format
        cls = self._size_class(n_rows)
        bgr = self._fmt_fps.get(("bgr", cls))
        yuv = self._fmt_fps.get(("yuv420", cls))
        if bgr is None and yuv is None:
            choice = self._active_format  # bootstrap on the default
        elif bgr is None:
            choice = "bgr"                # measure the unmeasured arm
            self._last_explore = time.time()  # bootstrap IS an explore
        elif yuv is None:
            choice = "yuv420"
            self._last_explore = time.time()
        elif (time.time() - self._last_explore
                > self._EXPLORE_INTERVAL_S):
            self._last_explore = time.time()
            choice = "bgr" if bgr <= yuv else "yuv420"  # refresh loser
        else:
            choice = "bgr" if bgr > yuv else "yuv420"
        self._active_format = choice
        return choice

    def _dispatch(self, entries, seq, feature_indices, audio_feats_dev,
                  pad_to: Optional[int] = None):
        """Stage inputs and start the device forward (async). ``pad_to``
        overrides the padded batch shape (the small first-window batch);
        default is ``batch_size``. Returns device predictions packed in
        ``self._active_format`` (fixed for non-adaptive synthesizers)."""
        n = len(entries)
        pad_to = pad_to or self.batch_size
        fmt = self._active_format
        feat_idx = np.zeros((pad_to,), np.int32)
        feat_idx[:n] = feature_indices
        if self._crops_dev is not None:
            phys_idx = np.zeros((pad_to,), np.int32)
            phys_idx[:n] = [s % self.total_frames for s in seq]
            return self._generate_resident_fns[fmt](
                self.variables, self._crops_dev, jnp.asarray(phys_idx),
                audio_feats_dev, jnp.asarray(feat_idx))
        cfg = self.crop
        ref_u8 = np.zeros((pad_to, cfg.size, cfg.size, 3), np.uint8)
        masked_u8 = np.zeros_like(ref_u8)
        for i, e in enumerate(entries):
            ref_u8[i] = e["ref"]
            masked_u8[i] = e["masked"]
        return self._generate_fns[fmt](
            self.variables, jnp.asarray(ref_u8), jnp.asarray(masked_u8),
            audio_feats_dev, jnp.asarray(feat_idx))

    def _paste_back(self, pred_u8: np.ndarray, entry: dict) -> np.ndarray:
        """Composite one generated mouth into a copy of its full frame
        (reference process_batch:263-349; fused native blend when the C++
        runtime is built, numpy fp32 otherwise — same truncating cast)."""
        from calipsync_tpu.native_ext import composite_frame

        cfg = self.crop
        p: CropParams = entry["params"]
        crop_img = entry["crop168"].copy()
        m = cfg.margin
        crop_img[m:cfg.resize - m, m:cfg.resize - m] = pred_u8
        crop_img = cv2.resize(crop_img, (p.width, p.width))

        if crop_img.shape[:2] != (p.ymax - p.ymin, p.xmax - p.xmin):
            return entry["img"].copy()  # shape-mismatch fallback (:317-324)
        return composite_frame(entry["img"], crop_img,
                               entry["fm"][..., 0], p.ymin, p.xmin)

    def _composite_batch(self, preds_dev, entries,
                         fmt: Optional[str] = None) -> list[np.ndarray]:
        if preds_dev is None:
            return [e["img"].copy() for e in entries]
        cfg = self.crop
        if fmt is None:  # non-adaptive callers: the format never changes
            fmt = self._active_format
        preds = np.asarray(preds_dev)[:len(entries)]  # blocks on d2h
        if fmt == "yuv420":
            # per-frame decode, no re-stack copy — _paste_back indexes
            preds = [yuv420_unpack(p, cfg.size) for p in preds]
        else:
            preds = preds.reshape(-1, cfg.size, cfg.size, 3)
        out = []
        for i, e in enumerate(entries):
            try:
                out.append(self._paste_back(preds[i], e))
            except Exception:
                out.append(e["img"].copy())  # per-frame fallback
        return out

    def iterate_synthesized_frames(
            self, features: np.ndarray, start_frame_idx: int = 0,
            is_generate_sync_frame: bool = True,
            row_range: Optional[tuple] = None) -> Iterator[Dict]:
        """Yield {'frame','index','physical_index'} dicts for each output
        frame driven by the HuBERT features (reference :359-451).

        Three-stage software pipeline, depth 2: the main thread dispatches
        device batches (async under jit); worker threads block on the d2h
        copy and composite; results are yielded strictly in order. While
        the TPU computes batch k and its predictions stream back over the
        interconnect, the host CPU composites batch k-1.

        ``row_range=(lo, hi)`` generates frames only for feature rows
        [lo, hi) of the passed array while the rest of the array provides
        audio-window context (the window spans rows [i-8, i+8), so a
        caller feeding feature *slices* of a longer clip — the pipelined
        offline manager — passes an 8-row margin on each side and results
        are bit-identical to one call over the full array, provided span
        starts stay multiples of ``batch_size`` so the ping-pong
        sequencer sees the same next() partition)."""
        self.last_logical_index = start_frame_idx - 1
        stats = {"load_frame": 0.0, "process_batch": 0.0}
        total = len(features)
        lo, hi = (0, total) if row_range is None else row_range
        if not (0 <= lo <= hi <= total):
            raise ValueError(f"row_range {row_range} out of bounds for "
                             f"{total} feature rows")
        n_rows = hi - lo
        # Bucket the feature length: T is a static shape under jit, so
        # padding to a multiple keeps one compiled executable per bucket
        # instead of one per clip length. Zero rows are exactly the
        # reference's edge padding, and indices past `total` are never
        # requested, so results are unchanged.
        bucket = 256
        # Short (streaming-window) feature blocks get their own small
        # bucket: a 25-frame window padded to 256 rows uploads 8x the
        # bytes it needs; 64 covers every 1-2 s window with one extra
        # cached executable.
        padded_t = (64 if total <= 64
                    else max(bucket, -(-total // bucket) * bucket))
        feats = np.zeros((padded_t,) + features.shape[1:],
                         self._feat_dtype)
        feats[:total] = features
        feats_dev = (self._replicate(feats) if self.mesh is not None
                     else jnp.asarray(feats))
        from collections import deque

        inflight: deque = deque()  # (future -> frames, seq)
        t_start = time.time()

        def emit(frames, seq):
            for frame, phys in zip(frames, seq):
                self.last_logical_index += 1
                yield {"frame": frame, "index": self.last_logical_index,
                       "physical_index": phys}

        # batch partition: optional small head (first_batch_size) so the
        # first frame ships early, then full batches
        ranges = []
        pos = lo
        if self.first_batch_size and hi - lo > self.first_batch_size:
            ranges.append((pos, pos + self.first_batch_size))
            pos += self.first_batch_size
        while pos < hi:
            ranges.append((pos, min(pos + self.batch_size, hi)))
            pos += self.batch_size

        # The sequencer redraws its random segment at next() call
        # boundaries (reference :147-190 draws per batch call), so it is
        # always pulled at the canonical batch_size partition — the head
        # batch only re-slices the resulting index stream for dispatch.
        # This keeps the physical walk bit-identical for any
        # first_batch_size (and for row_range spans whose starts are
        # multiples of batch_size, the pipelined manager's invariant).
        def canonical_seq_stream():
            p = lo
            while p < hi:
                n = min(self.batch_size, hi - p)
                yield from self.sequencer.next(n)
                p += n

        seq_iter = canonical_seq_stream()
        # one transfer format per call (chosen from the measured-fps
        # table; zero-latency, safe ahead of the head batch) — the
        # call's achieved fps is fed back in the finally block
        call_fmt = self._choose_call_format(n_rows)

        try:
            for ri, (start, end) in enumerate(ranges):
                head = (ri == 0 and self.first_batch_size
                        and end - start == self.first_batch_size)
                seq = list(itertools.islice(seq_iter, end - start))

                t0 = time.time()
                entries = self._entries_for(seq)
                stats["load_frame"] += time.time() - t0

                if not is_generate_sync_frame:
                    yield from emit([e["img"].copy() for e in entries], seq)
                    continue

                try:
                    preds = self._dispatch(entries, seq,
                                           list(range(start, end)),
                                           feats_dev,
                                           pad_to=(self.first_batch_size
                                                   if head else None))
                except Exception as e:  # batch fallback (reference :352-357)
                    print(f"frame batch dispatch failed: {e}")
                    preds = None
                if preds is not None and hasattr(preds,
                                                 "copy_to_host_async"):
                    preds.copy_to_host_async()  # start d2h behind compute
                inflight.append((self.executor.submit(
                    self._composite_batch, preds, entries, call_fmt),
                    seq))
                # pop eagerly once the head batch is composited — frames
                # reach the consumer (player buffer) at the earliest
                # possible moment instead of only when the pipeline is
                # full; identical order/content, lower latency
                while len(inflight) >= self.pipeline_depth or (
                        inflight and inflight[0][0].done()):
                    fut, s = inflight.popleft()
                    yield from emit(fut.result(), s)
            while inflight:
                fut, s = inflight.popleft()
                yield from emit(fut.result(), s)
        finally:
            stats["process_batch"] = time.time() - t_start - \
                stats["load_frame"]
            t = time.time() - t_start
            if is_generate_sync_frame:
                # frames actually DELIVERED — an early-closed generator
                # must not report the full row count over a short wall
                emitted = self.last_logical_index - start_frame_idx + 1
                self._note_call_fps(call_fmt, min(emitted, n_rows), t)
            if t > 0 and n_rows:
                print(f"synthesis: {n_rows / t:.2f} fps "
                      f"(load {stats['load_frame']:.2f}s, "
                      f"generate+paste {stats['process_batch']:.2f}s)")

    def __del__(self):
        if hasattr(self, "executor"):
            self.executor.shutdown(wait=False)
