"""Multi-stream serving: many concurrent avatars on one (or N) chips.

The reference serves exactly one stream per process (its
VideoStreamManager owns one synthesizer; SURVEY.md section 2 lists
multi-stream batching as a required new component). Here a single device
executable serves any number of streams:

  - All speakers' mouth-crop stores are concatenated into ONE device-
    resident array; a stream's physical frame index is offset by its
    speaker's base. One compiled generate executable serves every stream.
  - Each scheduling tick, pending per-stream feature windows are packed
    into shared device batches (streams' frames interleave freely), so a
    chip runs at its efficient batch size even when each stream only needs
    25 frames/s.
  - Every stream keeps its own ping-pong sequencer state and paste-back
    caches; window-edge audio semantics match the reference exactly (each
    window is padded with 8 zero rows on both sides in the shared feature
    buffer, reproducing the per-call zero padding of
    frame_synthesizer/infer_api.py:99-145).
  - Pass ``mesh=`` to also shard each packed batch across chips.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from calipsync_tpu.config import CropConfig
from calipsync_tpu.infer.synthesizer import (FrameSynthesizer,
                                             PingPongSequencer,
                                             make_generate_resident_fn,
                                             make_generate_resident_sharded_fn,
                                             yuv420_unpack)
from calipsync_tpu.nn.unet import Generator

_PAD = 8  # +-8-row window context


@dataclass
class _Stream:
    stream_id: str
    speaker: int
    sequencer: PingPongSequencer
    logical_index: int = -1


class MultiStreamSynthesizer:
    def __init__(self, variables: dict, speaker_dirs: Sequence[str],
                 model: Optional[Generator] = None, batch_size: int = 64,
                 crop: CropConfig = CropConfig(), seed: int = 0,
                 mesh=None, axis_name: str = "data",
                 feature_bucket: int = 512,
                 transfer_format: str = "bgr"):
        self.model = model or Generator()
        self.crop = crop
        self.batch_size = batch_size
        self.mesh = mesh
        if mesh is not None and batch_size % mesh.shape[axis_name]:
            # same constructor-time check as FrameSynthesizer: a
            # non-divisible batch fails deep inside shard_map with a
            # cryptic partition error on the first tick — and must fail
            # before the expensive combined-store build below
            raise ValueError("batch_size must divide over the mesh")
        self.feature_bucket = feature_bucket
        self.transfer_format = transfer_format
        self._rng = np.random.default_rng(seed)

        # per-speaker frame caches via plain FrameSynthesizers (no preload
        # upload; we build one combined store instead)
        self._speakers: List[FrameSynthesizer] = [
            FrameSynthesizer(variables, d, model=self.model,
                             batch_size=batch_size, crop=crop,
                             preload=False)
            for d in speaker_dirs]
        offsets = []
        stores = []
        base = 0
        for s in self._speakers:
            entries = s._entries_for(range(s.total_frames))
            stores.append(np.stack([e["ref"].reshape(-1)
                                    for e in entries]))
            offsets.append(base)
            base += s.total_frames
        self._offsets = offsets
        combined = np.concatenate(stores, axis=0)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._put = lambda x: jax.device_put(x, rep)
            self.variables = jax.tree.map(self._put, variables)
            self._generate = make_generate_resident_sharded_fn(
                self.model, crop, mesh, axis_name, transfer_format)
        else:
            self._put = jax.device_put
            # pin params on device once (torch-imported trees are host
            # numpy; see FrameSynthesizer)
            self.variables = jax.device_put(variables)
            self._generate = make_generate_resident_fn(self.model, crop,
                                                       transfer_format)
        self._crops_dev = self._put(combined)

        self._streams: Dict[str, _Stream] = {}

    # ------------- stream registry -------------

    def add_stream(self, stream_id: str, speaker: int = 0,
                   seed: Optional[int] = None) -> None:
        if speaker >= len(self._speakers):
            raise ValueError(f"unknown speaker {speaker}")
        rng = np.random.default_rng(
            self._rng.integers(2**63) if seed is None else seed)
        self._streams[stream_id] = _Stream(
            stream_id, speaker,
            PingPongSequencer(self._speakers[speaker].total_frames, rng))

    def remove_stream(self, stream_id: str) -> None:
        self._streams.pop(stream_id, None)

    # ------------- scheduling tick -------------

    def synthesize_windows(self, requests: Dict[str, np.ndarray]
                           ) -> Dict[str, List[dict]]:
        """One tick: {stream_id: features (K,2,1024)} ->
        {stream_id: [{'frame','index','physical_index'}, ...]}.

        All requested frames are packed into shared batches of
        ``batch_size`` (padded tail) and run through the one resident
        executable; compositing uses each stream's speaker caches.
        """
        jobs = []  # (stream, speaker, phys_idx_global, feat_idx, entry)
        feat_blocks = []
        feat_base = 0
        for stream_id, features in requests.items():
            st = self._streams[stream_id]
            spk = self._speakers[st.speaker]
            k = len(features)
            seq = st.sequencer.next(k)
            # window-edge isolation: 8 zero rows around each block
            block = np.zeros((k + 2 * _PAD, 2, 1024), np.float32)
            block[_PAD:_PAD + k] = features
            feat_blocks.append(block)
            phys_seq = [seq[i] % spk.total_frames for i in range(k)]
            # threaded entry fetch: serial per-frame JPEG decode on an
            # LRU miss would stall every stream's tick
            entries = spk._entries_for(phys_seq)
            for i in range(k):
                jobs.append((st, spk,
                             self._offsets[st.speaker] + phys_seq[i],
                             feat_base + _PAD + i, entries[i]))
            feat_base += k + 2 * _PAD

        if not jobs:
            return {sid: [] for sid in requests}

        feats = np.concatenate(feat_blocks, axis=0)
        padded_t = max(self.feature_bucket,
                       -(-len(feats) // self.feature_bucket)
                       * self.feature_bucket)
        feats = np.pad(feats, ((0, padded_t - len(feats)), (0, 0), (0, 0)))
        if self.model.dtype == jnp.bfloat16:
            # bit-identical to uploading fp32 and casting on device
            # (see FrameSynthesizer._feat_dtype); halves the per-tick
            # feature h2d (a 16-stream tick uploads ~8 MB fp32)
            import ml_dtypes

            feats = feats.astype(ml_dtypes.bfloat16)
        feats_dev = self._put(feats)

        # dispatch ALL device batches first (async under jit), then gather:
        # transfers and compute of batch k overlap the gather of batch k-1
        pending = []
        for start in range(0, len(jobs), self.batch_size):
            chunk = jobs[start:start + self.batch_size]
            phys = np.zeros((self.batch_size,), np.int32)
            fidx = np.zeros((self.batch_size,), np.int32)
            for i, (_, _, p, f, _) in enumerate(chunk):
                phys[i] = p
                fidx[i] = f
            preds = self._generate(self.variables, self._crops_dev,
                                   jnp.asarray(phys), feats_dev,
                                   jnp.asarray(fidx))
            if hasattr(preds, "copy_to_host_async"):
                preds.copy_to_host_async()
            pending.append((start, len(chunk), preds))

        # gather + composite PER BATCH: np.asarray blocks only on that
        # batch's (already started) d2h copy, so unpack + paste-back of
        # batch k runs on the host while batches k+1.. stream over the
        # link — the same overlap the single-stream pipeline gets from
        # its worker threads, without thread overhead at tick scale
        out: Dict[str, List[dict]] = {sid: [] for sid in requests}
        size = self.crop.size
        job_pos = 0
        for _start, n, preds in pending:
            rows = np.asarray(preds)[:n]
            for r in rows:
                st, spk, phys_g, _, entry = jobs[job_pos]
                job_pos += 1
                if self.transfer_format == "yuv420":
                    pred = yuv420_unpack(r, size)
                else:
                    pred = r.reshape(size, size, 3)
                st.logical_index += 1
                frame = spk._paste_back(pred, entry)
                out[st.stream_id].append({
                    "frame": frame, "index": st.logical_index,
                    "physical_index": phys_g - self._offsets[st.speaker]})
        return out
