"""S3FD face detector (VGG16-SSD) in JAX/flax.

TPU-native rebuild of the reference's S3FD stack
(/root/reference/utils/lip_detector/tools/s3fd/nets.py:28-174,
box_utils.py:7-217, main.py:12-60, detect_face.py:5-81). The conv backbone
+ heads run as one jitted NHWC forward on device; anchor generation, box
decode and greedy NMS are tiny O(num_priors) host work done in numpy.

SURVEY.md section 7 picks S3FD as the in-repo-specified detector (the YOLO
path depends on external ultralytics weights); the detector interface stays
pluggable (vision/lip_detector.py).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (out_channels, source?) per VGG conv; pools between groups as in VGG16.
_VGG_PLAN = (  # torch nn.ModuleList indices documented in nets.py:34-75
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))

S3FD_MEAN_BGR = np.array([104.0, 117.0, 123.0], dtype=np.float32)

VARIANCES = (0.1, 0.2)
MIN_SIZES = (16, 32, 64, 128, 256, 512)
STEPS = (4, 8, 16, 32, 64, 128)


def _maxpool(x, ceil_mode=False):
    if ceil_mode and (x.shape[1] % 2 or x.shape[2] % 2):
        pad_h = x.shape[1] % 2
        pad_w = x.shape[2] % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class L2Norm(nn.Module):
    scale: float
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.constant(self.scale),
                       (x.shape[-1],), jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                                keepdims=True)) + 1e-10
        return (x / norm * w).astype(x.dtype)


def s3fd_feature_maps(h: int, w: int) -> tuple[tuple[int, int], ...]:
    """Source feature-map sizes for an input of (h, w) — mirrors the torch
    pooling arithmetic (floor pools, one ceil pool, stride-2 k3 p1 extras)."""
    def floor2(n):
        return n // 2

    def ceil2(n):
        return -(-n // 2)

    def conv_s2(n):
        return (n - 1) // 2 + 1

    s1 = (floor2(floor2(h)), floor2(floor2(w)))
    s2 = (ceil2(s1[0]), ceil2(s1[1]))
    s3 = (floor2(s2[0]), floor2(s2[1]))
    s4 = (floor2(s3[0]), floor2(s3[1]))
    s5 = (conv_s2(s4[0]), conv_s2(s4[1]))
    s6 = (conv_s2(s5[0]), conv_s2(s5[1]))
    return (s1, s2, s3, s4, s5, s6)


class S3FDBackbone(nn.Module):
    """BGR-mean-subtracted image (B,H,W,3) -> (loc (B,N,4), conf (B,N,2)).
    Prior order matches the reference's flattening (per source map,
    row-major H,W); map sizes come from :func:`s3fd_feature_maps`."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array):
        dt = self.dtype
        conv = lambda f, name, **kw: nn.Conv(
            f, (3, 3), padding=((1, 1), (1, 1)), use_bias=True, dtype=dt,
            param_dtype=jnp.float32, name=name, **kw)
        conv1x1 = lambda f, name: nn.Conv(f, (1, 1), padding="VALID",
                                          use_bias=True, dtype=dt,
                                          param_dtype=jnp.float32, name=name)
        x = x.astype(dt or x.dtype)
        sources = []

        i = 0
        for stage, widths in enumerate(_VGG_PLAN):
            for w in widths:
                x = jax.nn.relu(conv(w, f"vgg{i}")(x))
                i += 1
            if stage == 2:
                sources.append(L2Norm(10.0, dtype=dt, name="l2norm3_3")(x))
                x = _maxpool(x, ceil_mode=True)
            elif stage == 3:
                sources.append(L2Norm(8.0, dtype=dt, name="l2norm4_3")(x))
                x = _maxpool(x)
            elif stage == 4:
                sources.append(L2Norm(5.0, dtype=dt, name="l2norm5_3")(x))
                x = _maxpool(x)
            else:
                x = _maxpool(x)
        # fc6/fc7 equivalents
        x = jax.nn.relu(nn.Conv(1024, (3, 3), padding=((6, 6), (6, 6)),
                                kernel_dilation=(6, 6), use_bias=True,
                                dtype=dt, param_dtype=jnp.float32,
                                name="vgg13")(x))
        x = jax.nn.relu(conv1x1(1024, "vgg14")(x))
        sources.append(x)

        x = jax.nn.relu(conv1x1(256, "extra0")(x))
        x = jax.nn.relu(conv(512, "extra1", strides=(2, 2))(x))
        sources.append(x)
        x = jax.nn.relu(conv1x1(128, "extra2")(x))
        x = jax.nn.relu(conv(256, "extra3", strides=(2, 2))(x))
        sources.append(x)

        locs, confs = [], []
        for k, s in enumerate(sources):
            b = s.shape[0]
            loc = conv(4, f"loc{k}")(s)
            c_out = 4 if k == 0 else 2
            conf = conv(c_out, f"conf{k}")(s)
            if k == 0:
                # max-out background label (nets.py:144-145)
                bg = jnp.max(conf[..., 0:3], axis=-1, keepdims=True)
                conf = jnp.concatenate([bg, conf[..., 3:]], axis=-1)
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, 2))

        loc = jnp.concatenate(locs, axis=1).astype(jnp.float32)
        conf = jax.nn.softmax(
            jnp.concatenate(confs, axis=1).astype(jnp.float32), axis=-1)
        return loc, conf


@functools.lru_cache(maxsize=32)
def priors_np(im_h: int, im_w: int,
              fmaps: tuple[tuple[int, int], ...]) -> np.ndarray:
    """Anchor centers/sizes in normalized coords (box_utils.py:176-217)."""
    out = []
    for k, (fh, fw) in enumerate(fmaps):
        f_kw = im_w / STEPS[k]
        f_kh = im_h / STEPS[k]
        j = (np.arange(fw) + 0.5) / f_kw
        i = (np.arange(fh) + 0.5) / f_kh
        cx, cy = np.meshgrid(j, i)
        s_kw = MIN_SIZES[k] / im_w
        s_kh = MIN_SIZES[k] / im_h
        n = fh * fw
        out.append(np.stack([cx.ravel(), cy.ravel(),
                             np.full(n, s_kw), np.full(n, s_kh)], axis=1))
    return np.concatenate(out, axis=0).astype(np.float32)


def decode_np(loc: np.ndarray, priors: np.ndarray,
              variances=VARIANCES) -> np.ndarray:
    """Offset regression -> corner boxes (box_utils.py:41-59)."""
    centers = priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:]
    sizes = priors[:, 2:] * np.exp(loc[:, 2:] * variances[1])
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1)
    return boxes


def nms_np(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy IoU NMS over [x1,y1,x2,y2,score] rows (box_utils.py:7-38)."""
    if len(dets) == 0:
        return np.zeros((0,), int)
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], \
        dets[:, 3], dets[:, 4]
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return np.asarray(keep, int)


class S3FDDetector:
    """Host-facing detector with the reference wrapper's interface
    (detect_face.py:27-81): ``detect(images) -> [(bboxes xywh, indices)]``
    with last-good-detection fallback."""

    def __init__(self, variables: dict, dtype=None,
                 conf_threshold: float = 0.1, scale: float = 0.25,
                 det_conf_th: float = 0.8, nms_thresh: float = 0.3,
                 cross_scale_nms: float = 0.1, top_k: int = 750,
                 batch_size: int = 16, topk_device: int = 512):
        self.variables = variables
        self.model = S3FDBackbone(dtype=dtype)
        self.conf_threshold = conf_threshold
        self.scale = scale
        self.det_conf_th = det_conf_th
        self.nms_thresh = nms_thresh
        self.cross_scale_nms = cross_scale_nms
        self.top_k = top_k
        self.batch_size = batch_size
        self.topk_device = topk_device
        self._topk_sticky_off = False
        self.last_detection = None

        model = self.model

        @jax.jit
        def fwd_u8(variables, x_u8):
            # mean subtraction on device: uint8 over the wire (4x fewer
            # h2d bytes than host-side float32), face-class scores only
            # (halves the d2h)
            x = x_u8.astype(jnp.float32) - jnp.asarray(S3FD_MEAN_BGR,
                                                       jnp.float32)
            loc, conf = model.apply(variables, x)
            return loc, conf[..., 1]

        self._fwd_batch = fwd_u8

        @jax.jit
        def fwd_u8_topk(variables, x_u8):
            # Compact the prior grid ON DEVICE: only the top-k scored
            # rows (plus their prior indices and the >0.05 count) cross
            # d2h — ~8x fewer bytes than the full (P,4)+(P,) grids. The
            # host falls back to the full forward for any image whose
            # above-threshold count exceeds k, so results stay
            # bit-identical to the uncompacted path always.
            #
            # Everything is packed into ONE (B, 6K+1) float32 buffer
            # (idx/count bitcast, not converted): on this remote tunnel
            # each separate host fetch is a 20-40 ms round trip, and the
            # 4-fetch version measured SLOWER than the full grid despite
            # 8x fewer bytes (interleaved A/B, tools/bench_preprocess.py).
            x = x_u8.astype(jnp.float32) - jnp.asarray(S3FD_MEAN_BGR,
                                                       jnp.float32)
            loc, conf = model.apply(variables, x)
            s = conf[..., 1]
            k = min(self.topk_device, s.shape[1])
            count = jnp.sum((s > 0.05).astype(jnp.int32), axis=1)
            vals, idx = jax.lax.top_k(s, k)
            l = jnp.take_along_axis(loc, idx[..., None], axis=1)
            body = jnp.concatenate(
                [l, vals[..., None],
                 jax.lax.bitcast_convert_type(idx.astype(jnp.int32),
                                              jnp.float32)[..., None]],
                axis=-1)                       # (B, K, 6)
            packed = jnp.concatenate(
                [body.reshape(body.shape[0], -1),
                 jax.lax.bitcast_convert_type(count, jnp.float32)[:, None]],
                axis=-1)                       # (B, 6K+1)
            return packed

        self._fwd_batch_topk = fwd_u8_topk

    def _scaled(self, image_bgr: np.ndarray) -> np.ndarray:
        import cv2

        return cv2.resize(image_bgr, dsize=(0, 0), fx=self.scale,
                          fy=self.scale, interpolation=cv2.INTER_LINEAR)

    def _forward_scaled(self, scaled_batch: np.ndarray):
        """(B, h, w, 3) uint8 -> (loc (B,P,4), scores (B,P)) numpy. The
        batch pads to a power-of-2 bucket so XLA compiles a handful of
        shapes; one dispatch serves the whole batch (the per-call link
        round-trip dominates single-image dispatch on this tunnel)."""
        n = len(scaled_batch)
        b = 1
        while b < n:
            b *= 2
        if b > n:
            scaled_batch = np.concatenate(
                [scaled_batch, np.zeros((b - n,) + scaled_batch.shape[1:],
                                        scaled_batch.dtype)])
        loc, scores = self._fwd_batch(self.variables,
                                      jnp.asarray(scaled_batch))
        return np.asarray(loc)[:n], np.asarray(scores)[:n]

    def _forward_scaled_topk(self, scaled_batch: np.ndarray):
        """Compacted forward: (B,h,w,3) uint8 -> numpy (loc_k (B,K,4),
        scores_k (B,K), prior idx_k (B,K), count (B,)) — see fwd_u8_topk."""
        n = len(scaled_batch)
        b = 1
        while b < n:
            b *= 2
        if b > n:
            scaled_batch = np.concatenate(
                [scaled_batch, np.zeros((b - n,) + scaled_batch.shape[1:],
                                        scaled_batch.dtype)])
        packed = np.asarray(self._fwd_batch_topk(
            self.variables, jnp.asarray(scaled_batch)))  # ONE d2h fetch
        count = packed[:, -1].copy().view(np.int32)[:n]
        body = np.ascontiguousarray(
            packed[:, :-1].reshape(len(packed), -1, 6)[:n])
        idx = body[..., 5].copy().view(np.int32)
        return body[..., 0:4], body[..., 4], idx, count

    def _decode_one(self, loc: np.ndarray, scores: np.ndarray,
                    priors: np.ndarray, src_h: int, src_w: int,
                    conf_th: float) -> np.ndarray:
        """Per-frame host decode -> [x1,y1,x2,y2,score] in source coords."""
        # Detect stage (box_utils.py:129-173): thresh 0.05, NMS 0.3
        mask = scores > 0.05
        if not mask.any():
            return np.empty((0, 5), np.float32)
        boxes = decode_np(loc[mask], priors[mask])
        return self._nms_tail(boxes, scores[mask], src_h, src_w, conf_th)

    def _decode_one_topk(self, loc_k: np.ndarray, scores_k: np.ndarray,
                         idx_k: np.ndarray, priors: np.ndarray,
                         src_h: int, src_w: int,
                         conf_th: float) -> np.ndarray:
        """Decode from device-compacted rows. Rows are re-sorted back to
        prior order first, so the result is bit-identical to
        :meth:`_decode_one` whenever the >0.05 set fit in k (the caller
        checks ``count`` and falls back otherwise)."""
        mask = scores_k > 0.05
        if not mask.any():
            return np.empty((0, 5), np.float32)
        idx = idx_k[mask]
        order = np.argsort(idx)
        idx = idx[order]
        boxes = decode_np(loc_k[mask][order], priors[idx])
        return self._nms_tail(boxes, scores_k[mask][order],
                              src_h, src_w, conf_th)

    def _nms_tail(self, boxes: np.ndarray, s: np.ndarray,
                  src_h: int, src_w: int, conf_th: float) -> np.ndarray:
        h, w = src_h, src_w
        dets = np.concatenate([boxes, s[:, None]], axis=1)
        keep = nms_np(dets, self.nms_thresh)[:self.top_k]
        dets = dets[keep]
        # wrapper stage (main.py:46-58): conf filter + cross-scale NMS 0.1
        dets = dets[dets[:, 4] > conf_th]
        if len(dets):
            scale_vec = np.array([w, h, w, h], np.float32)
            dets = np.concatenate([dets[:, :4] * scale_vec, dets[:, 4:]],
                                  axis=1)
            dets = dets[nms_np(dets, self.cross_scale_nms)]
        return dets

    def _detect_single(self, image_bgr: np.ndarray,
                       conf_th: float) -> np.ndarray:
        """One image -> [x1,y1,x2,y2,score] in source pixel coords."""
        h, w = image_bgr.shape[:2]
        scaled = self._scaled(image_bgr)
        loc, scores = self._forward_scaled(scaled[None])
        priors = priors_np(scaled.shape[0], scaled.shape[1],
                           s3fd_feature_maps(scaled.shape[0],
                                             scaled.shape[1]))
        return self._decode_one(loc[0], scores[0], priors, h, w, conf_th)

    def detect(self, images: Sequence[np.ndarray]):
        """Batched forward: same-shape frames go through ONE device
        dispatch per ``batch_size`` chunk (uint8 h2d, face scores d2h) —
        the per-call round-trip and float upload of per-image dispatch
        dominated on remote links. Decode/NMS stay per-frame on host,
        bit-identical to the single path; the last-good-detection
        fallback is applied in input order."""
        n = len(images)
        scaled = [self._scaled(img) for img in images]
        all_dets: list = [None] * n

        by_shape: dict = {}
        for i, s in enumerate(scaled):
            by_shape.setdefault(s.shape, []).append(i)
        for shape, idxs in by_shape.items():
            priors = priors_np(shape[0], shape[1],
                               s3fd_feature_maps(shape[0], shape[1]))
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start:start + self.batch_size]
                stack = np.stack([scaled[i] for i in chunk])
                if self.topk_device and not self._topk_sticky_off:
                    loc_k, s_k, idx_k, count = self._forward_scaled_topk(
                        stack)
                    overflow = [j for j in range(len(chunk))
                                if count[j] > loc_k.shape[1]]
                    if len(overflow) * 2 > len(chunk):
                        # >half the batch exceeded k: this input regime
                        # (e.g. an untrained net scoring every prior
                        # >0.05) defeats compaction — running both
                        # forwards per batch measured SLOWER than the
                        # full grid alone. Disable compaction for the
                        # rest of this detector's life; isolated
                        # overflows below still fall back per-frame.
                        self._topk_sticky_off = True
                    for j, i in enumerate(chunk):
                        if j in overflow:
                            continue
                        h, w = images[i].shape[:2]
                        all_dets[i] = self._decode_one_topk(
                            loc_k[j], s_k[j], idx_k[j], priors, h, w,
                            self.det_conf_th)
                    if not overflow:
                        continue
                    # rare: more than k priors above 0.05 — re-run those
                    # frames through the full grid for exactness
                    sub = [chunk[j] for j in overflow]
                    loc, scores = self._forward_scaled(
                        np.stack([scaled[i] for i in sub]))
                    for j, i in enumerate(sub):
                        h, w = images[i].shape[:2]
                        all_dets[i] = self._decode_one(
                            loc[j], scores[j], priors, h, w,
                            self.det_conf_th)
                    continue
                loc, scores = self._forward_scaled(stack)
                for j, i in enumerate(chunk):
                    h, w = images[i].shape[:2]
                    all_dets[i] = self._decode_one(
                        loc[j], scores[j], priors, h, w,
                        self.det_conf_th)

        detections = []
        for dets in all_dets:
            if len(dets) == 0:
                if self.last_detection is None:
                    detections.append((np.array([]), []))
                else:
                    detections.append(self.last_detection)
                continue
            xywh = np.column_stack([dets[:, :2], dets[:, 2:4] - dets[:, :2]])
            current = (xywh, list(range(len(dets))))
            self.last_detection = current
            detections.append(current)
        return detections


# ---------------------------------------------------------------------------
# Torch importer (sfd_face.pth layout)
# ---------------------------------------------------------------------------

_VGG_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28, 31, 33)


def import_s3fd(sd) -> dict:
    def conv(tk):
        return {"kernel": np.ascontiguousarray(
                    np.asarray(sd[f"{tk}.weight"]).transpose(2, 3, 1, 0)),
                "bias": np.asarray(sd[f"{tk}.bias"])}

    params: dict = {}
    for our_i, torch_i in enumerate(_VGG_CONV_IDX):
        params[f"vgg{our_i}"] = conv(f"vgg.{torch_i}")
    params["l2norm3_3"] = {"weight": np.asarray(sd["L2Norm3_3.weight"])}
    params["l2norm4_3"] = {"weight": np.asarray(sd["L2Norm4_3.weight"])}
    params["l2norm5_3"] = {"weight": np.asarray(sd["L2Norm5_3.weight"])}
    for i in range(4):
        params[f"extra{i}"] = conv(f"extras.{i}")
    for i in range(6):
        params[f"loc{i}"] = conv(f"loc.{i}")
        params[f"conf{i}"] = conv(f"conf.{i}")
    return {"params": jax.tree.map(jnp.asarray, params)}
