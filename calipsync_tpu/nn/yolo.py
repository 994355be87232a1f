"""YOLOv8n-face in flax (NHWC) — the reference's ACTIVE face detector.

The reference wraps the ultralytics runtime around ``yolov8n-face.pt``
(/root/reference/utils/lip_detector/tools/detect_face_yolo.py:1-38,
lip_detector.py:12-22) — a YOLOv8-n *pose*-style model with 1 class and
5 facial keypoints. That runtime is not in this image, so this is a
from-scratch TPU-native implementation of the same network family:

  backbone  CSP stages of Conv(k3,s2) + C2f, then SPPF            (0-9)
  neck      PAN: 2x nearest upsample + concat + C2f, then down    (10-21)
  head      per-scale decoupled branches: box (4*reg_max via DFL),
            cls (1 sigmoid), keypoints (5 x (x, y, conf))          (22)

Everything through the head runs in ONE jitted call on fixed 640x640
letterboxed batches (TPU-friendly static shapes); the DFL expectation,
box/keypoint decode and sigmoids are fused into the same XLA program so
only small (N, anchors, 20) tensors come back over d2h. Greedy NMS stays
on host (data-dependent control flow, microseconds at these counts).

``import_yolov8_face`` consumes the ultralytics ``model.{i}.*`` key
layout so the real checkpoint drops in. Parity is tested against an
independent torch implementation of the same architecture
(tests/_torch_yolov8.py) — see tests/test_yolo.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype

REG_MAX = 16
NUM_KPT = 5
STRIDES = (8, 16, 32)


class ConvBNSiLU(nn.Module):
    """ultralytics Conv: conv2d(bias-less, explicit k//2 pad) + BN(eps 1e-3)
    + SiLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.97, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return jax.nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype, name="cv1")(
            x, train)
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype, name="cv2")(
            y, train)
        return x + y if self.shortcut else y


class C2f(nn.Module):
    """Cross-stage partial block: split after cv1, chain n bottlenecks on
    the second half, concat everything into cv2."""

    features: int
    n: int = 1
    shortcut: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        c = self.features // 2
        y = ConvBNSiLU(self.features, 1, dtype=self.dtype, name="cv1")(
            x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(Bottleneck(c, self.shortcut, self.dtype,
                                 name=f"m{i}")(ys[-1], train))
        return ConvBNSiLU(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), train)


class SPPF(nn.Module):
    features: int
    pool: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        c = self.features // 2
        x = ConvBNSiLU(c, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.pool // 2
        outs = [x]
        for _ in range(3):
            outs.append(nn.max_pool(outs[-1], (self.pool, self.pool),
                                    strides=(1, 1),
                                    padding=((p, p), (p, p))))
        return ConvBNSiLU(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(outs, axis=-1), train)


def _upsample2x_nearest(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (n, h, 2, w, 2, c)).reshape(n, h * 2, w * 2, c)


class _HeadBranch(nn.Module):
    """Two ConvBNSiLU(k3) then a plain biased 1x1 conv (ultralytics
    Detect/Pose cv2/cv3/cv4 Sequential: 0, 1, 2)."""

    mid: int
    out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBNSiLU(self.mid, 3, dtype=self.dtype, name="c0")(x, train)
        x = ConvBNSiLU(self.mid, 3, dtype=self.dtype, name="c1")(x, train)
        return nn.Conv(self.out, (1, 1), use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name="c2")(x)


class YoloV8Face(nn.Module):
    """Full detector trunk + pose-style face head.

    channels: per-stage widths; (16, 32, 64, 128, 256) is the 'n' scale.
    depths: C2f bottleneck counts per backbone stage; (1, 2, 2, 1) is 'n'.
    Returns, per scale s in (8, 16, 32):
      box  (N, H_s, W_s, 4*REG_MAX) raw DFL logits
      cls  (N, H_s, W_s, 1)         raw logits
      kpt  (N, H_s, W_s, NUM_KPT*3) raw offsets/logits
    """

    channels: Sequence[int] = (16, 32, 64, 128, 256)
    depths: Sequence[int] = (1, 2, 2, 1)
    num_classes: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        d = self.depths
        dt = self.dtype
        # backbone (ultralytics layers 0-9)
        x = ConvBNSiLU(ch[0], 3, 2, dt, name="l0")(x, train)
        x = ConvBNSiLU(ch[1], 3, 2, dt, name="l1")(x, train)
        x = C2f(ch[1], d[0], True, dt, name="l2")(x, train)
        x = ConvBNSiLU(ch[2], 3, 2, dt, name="l3")(x, train)
        p3 = C2f(ch[2], d[1], True, dt, name="l4")(x, train)
        x = ConvBNSiLU(ch[3], 3, 2, dt, name="l5")(p3, train)
        p4 = C2f(ch[3], d[2], True, dt, name="l6")(x, train)
        x = ConvBNSiLU(ch[4], 3, 2, dt, name="l7")(p4, train)
        x = C2f(ch[4], d[3], True, dt, name="l8")(x, train)
        p5 = SPPF(ch[4], 5, dt, name="l9")(x, train)

        # PAN neck (layers 10-21)
        x = jnp.concatenate([_upsample2x_nearest(p5), p4], axis=-1)
        n4 = C2f(ch[3], d[0], False, dt, name="l12")(x, train)
        x = jnp.concatenate([_upsample2x_nearest(n4), p3], axis=-1)
        n3 = C2f(ch[2], d[0], False, dt, name="l15")(x, train)     # P3 out
        x = ConvBNSiLU(ch[2], 3, 2, dt, name="l16")(n3, train)
        x = jnp.concatenate([x, n4], axis=-1)
        n4 = C2f(ch[3], d[0], False, dt, name="l18")(x, train)     # P4 out
        x = ConvBNSiLU(ch[3], 3, 2, dt, name="l19")(n4, train)
        x = jnp.concatenate([x, p5], axis=-1)
        n5 = C2f(ch[4], d[0], False, dt, name="l21")(x, train)     # P5 out

        # decoupled head per scale (layer 22; Pose = Detect + cv4 kpts)
        c_box = max(16, ch[2] // 4, REG_MAX * 4)
        c_cls = max(ch[2], min(self.num_classes, 100))
        c_kpt = max(ch[2] // 4, NUM_KPT * 3)
        outs = []
        for i, f in enumerate((n3, n4, n5)):
            box = _HeadBranch(c_box, 4 * REG_MAX, dt, name=f"box{i}")(
                f, train)
            cls = _HeadBranch(c_cls, self.num_classes, dt, name=f"cls{i}")(
                f, train)
            kpt = _HeadBranch(c_kpt, NUM_KPT * 3, dt, name=f"kpt{i}")(
                f, train)
            outs.append((box, cls, kpt))
        return outs


def decode_outputs(outs):
    """Raw per-scale head outputs -> (boxes_xyxy (N,A,4), scores (N,A),
    kpts (N,A,5,3)) in letterboxed-image pixels. Pure jnp — jitted
    together with the net so only the decoded tensors cross d2h.

    Box: DFL softmax expectation over REG_MAX bins -> l,t,r,b distances
    from the anchor center, times stride. Keypoints: ultralytics pose
    decode ``(raw_xy * 2 + center - 0.5) * stride``; conf = sigmoid.
    """
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    all_boxes, all_scores, all_kpts = [], [], []
    for (box, cls, kpt), stride in zip(outs, STRIDES):
        n, h, w, _ = box.shape
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        cx = (gx + 0.5).reshape(-1)
        cy = (gy + 0.5).reshape(-1)

        dist = box.astype(jnp.float32).reshape(n, h * w, 4, REG_MAX)
        dist = jax.nn.softmax(dist, axis=-1) @ bins          # (N,HW,4)
        x1 = (cx[None] - dist[..., 0]) * stride
        y1 = (cy[None] - dist[..., 1]) * stride
        x2 = (cx[None] + dist[..., 2]) * stride
        y2 = (cy[None] + dist[..., 3]) * stride
        all_boxes.append(jnp.stack([x1, y1, x2, y2], axis=-1))

        all_scores.append(jax.nn.sigmoid(
            cls.astype(jnp.float32).reshape(n, h * w)))

        k = kpt.astype(jnp.float32).reshape(n, h * w, NUM_KPT, 3)
        kx = (k[..., 0] * 2.0 + (cx[None, :, None] - 0.5)) * stride
        ky = (k[..., 1] * 2.0 + (cy[None, :, None] - 0.5)) * stride
        kc = jax.nn.sigmoid(k[..., 2])
        all_kpts.append(jnp.stack([kx, ky, kc], axis=-1))
    return (jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_scores, axis=1),
            jnp.concatenate(all_kpts, axis=1))


# ---------------------------------------------------------------------------
# host-facing detector (reference detect_face_yolo.py interface)
# ---------------------------------------------------------------------------

def letterbox(img: np.ndarray, size: int = 640) -> tuple[np.ndarray,
                                                          float, int, int]:
    """ultralytics LetterBox: fit-preserving resize onto a gray (114)
    canvas, padding split evenly. Returns (canvas, scale, pad_x, pad_y)."""
    import cv2

    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = round(h * r), round(w * r)
    resized = cv2.resize(img, (nw, nh)) if (nh, nw) != (h, w) else img
    canvas = np.full((size, size, 3), 114, np.uint8)
    top = (size - nh) // 2
    left = (size - nw) // 2
    canvas[top:top + nh, left:left + nw] = resized
    return canvas, r, left, top


class YoloV8FaceDetector:
    """Reference-shaped wrapper: ``detect(images) -> [(bboxes xywh,
    indices)]`` with last-good-detection fallback
    (detect_face_yolo.py:12-38), plus ``detect_with_keypoints`` for the
    legacy landmark path (5 facial points, get_landmark.py usage)."""

    def __init__(self, variables: dict,
                 model: Optional[YoloV8Face] = None,
                 conf_threshold: float = 0.1, nms_threshold: float = 0.5,
                 img_size: int = 640, batch_size: int = 1):
        self.model = model or YoloV8Face()
        self.variables = variables
        self.conf_threshold = conf_threshold
        self.nms_threshold = nms_threshold
        self.img_size = img_size
        self.batch_size = batch_size
        self.last_detection = None

        mdl = self.model

        @jax.jit
        def fwd(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            outs = mdl.apply(variables, x, train=False)
            return decode_outputs(outs)

        self._fwd = fwd

    def _forward(self, canvases: np.ndarray):
        """(B,640,640,3) uint8 RGB -> numpy (boxes, scores, kpts). Pads to
        batch_size so the jit sees one shape."""
        n = len(canvases)
        if n < self.batch_size:
            canvases = np.concatenate(
                [canvases, np.zeros((self.batch_size - n,) +
                                    canvases.shape[1:], np.uint8)])
        boxes, scores, kpts = self._fwd(self.variables,
                                        jnp.asarray(canvases))
        return (np.asarray(boxes)[:n], np.asarray(scores)[:n],
                np.asarray(kpts)[:n])

    def _detect_raw(self, images):
        from calipsync_tpu.nn.s3fd import nms_np

        canvases, metas = [], []
        for img in images:
            canvas, r, px, py = letterbox(
                np.ascontiguousarray(img[..., ::-1]), self.img_size)
            canvases.append(canvas)
            metas.append((r, px, py, img.shape[1], img.shape[0]))
        results = []
        for start in range(0, len(canvases), self.batch_size):
            chunk = np.stack(canvases[start:start + self.batch_size])
            boxes, scores, kpts = self._forward(chunk)
            for bi in range(len(chunk)):
                r, px, py, w, h = metas[start + bi]
                keep = scores[bi] >= self.conf_threshold
                b, s, k = boxes[bi][keep], scores[bi][keep], kpts[bi][keep]
                dets = np.concatenate([b, s[:, None]], axis=1)
                order = nms_np(dets, self.nms_threshold)
                b, s, k = b[order], s[order], k[order]
                b[:, 0::2] = (b[:, 0::2] - px) / r     # un-letterbox
                b[:, 1::2] = (b[:, 1::2] - py) / r
                k[..., 0] = (k[..., 0] - px) / r
                k[..., 1] = (k[..., 1] - py) / r
                # ultralytics clips boxes.xyxy (and keypoints) to image
                # bounds; downstream crop/landmark code relies on that.
                np.clip(b[:, 0::2], 0, w, out=b[:, 0::2])
                np.clip(b[:, 1::2], 0, h, out=b[:, 1::2])
                np.clip(k[..., 0], 0, w, out=k[..., 0])
                np.clip(k[..., 1], 0, h, out=k[..., 1])
                results.append((b, s, k))
        return results

    def detect(self, images):
        """Reference output contract: list of (bboxes (M,4) x,y,w,h,
        indices) per image, falling back to the previous frame's result
        when nothing is found (detect_face_yolo.py:17-36)."""
        out = []
        for b, s, k in self._detect_raw(images):
            if len(b) == 0:
                if self.last_detection is None:
                    print("no face detected and no previous detection")
                    out.append((np.zeros((0, 4), np.float32), []))
                else:
                    print("no face detected; reusing previous detection")
                    out.append(self.last_detection)
                continue
            xywh = np.column_stack([b[:, :2], b[:, 2:] - b[:, :2]])
            cur = (xywh.astype(np.float32), list(range(len(b))))
            self.last_detection = cur
            out.append(cur)
        return out

    def detect_with_keypoints(self, image):
        """(bboxes_xywh (M,4), indices, kps (M,5,2)) — the contract
        LegacyLandmark consumes (utils/get_landmark.py:70-114, same shape
        as SCRFDDetector.detect_with_keypoints)."""
        b, s, k = self._detect_raw([image])[0]
        xywh = np.column_stack([b[:, :2], b[:, 2:] - b[:, :2]]).astype(
            np.float32)
        return xywh, list(range(len(b))), k[..., :2].astype(np.float32)


# ---------------------------------------------------------------------------
# ultralytics checkpoint importer
# ---------------------------------------------------------------------------

def import_yolov8_face(sd, channels=(16, 32, 64, 128, 256),
                       depths=(1, 2, 2, 1)) -> dict:
    """ultralytics ``model.{i}.*`` state_dict (numpy values) -> flax
    variables for :class:`YoloV8Face`.

    Layer indices follow the v8 yaml: backbone 0-9, neck C2f at 12/15/18/21,
    downsample convs at 16/19, head 22 with cv2 (box), cv3 (cls), cv4
    (keypoints) branches and the fixed-arange ``dfl.conv.weight``
    projection (consumed and verified, not stored — decode_outputs
    computes the expectation directly).
    """
    params: dict = {}
    stats: dict = {}

    def conv_k(key):
        return np.ascontiguousarray(np.asarray(sd[key]).transpose(2, 3, 1, 0))

    def cbs(tp):
        p = {"conv": {"kernel": conv_k(f"{tp}.conv.weight")},
             "bn": {"scale": np.asarray(sd[f"{tp}.bn.weight"]),
                    "bias": np.asarray(sd[f"{tp}.bn.bias"])}}
        s = {"bn": {"mean": np.asarray(sd[f"{tp}.bn.running_mean"]),
                    "var": np.asarray(sd[f"{tp}.bn.running_var"])}}
        return p, s

    def bottleneck(tp):
        p, s = {}, {}
        p["cv1"], s["cv1"] = cbs(f"{tp}.cv1")
        p["cv2"], s["cv2"] = cbs(f"{tp}.cv2")
        return p, s

    def c2f(tp, n):
        p, s = {}, {}
        p["cv1"], s["cv1"] = cbs(f"{tp}.cv1")
        p["cv2"], s["cv2"] = cbs(f"{tp}.cv2")
        for i in range(n):
            p[f"m{i}"], s[f"m{i}"] = bottleneck(f"{tp}.m.{i}")
        return p, s

    def head_branch(tp):
        p, s = {}, {}
        p["c0"], s["c0"] = cbs(f"{tp}.0")
        p["c1"], s["c1"] = cbs(f"{tp}.1")
        p["c2"] = {"kernel": conv_k(f"{tp}.2.weight"),
                   "bias": np.asarray(sd[f"{tp}.2.bias"])}
        return p, s

    plan = [("l0", "cbs", None), ("l1", "cbs", None),
            ("l2", "c2f", depths[0]), ("l3", "cbs", None),
            ("l4", "c2f", depths[1]), ("l5", "cbs", None),
            ("l6", "c2f", depths[2]), ("l7", "cbs", None),
            ("l8", "c2f", depths[3]), ("l9", "sppf", None)]
    neck = [("l12", "c2f", depths[0]), ("l15", "c2f", depths[0]),
            ("l16", "cbs", None), ("l18", "c2f", depths[0]),
            ("l19", "cbs", None), ("l21", "c2f", depths[0])]
    for name, kind, n in plan + neck:
        idx = name[1:]
        tp = f"model.{idx}"
        if kind == "cbs":
            params[name], stats[name] = cbs(tp)
        elif kind == "sppf":
            p, s = {}, {}
            p["cv1"], s["cv1"] = cbs(f"{tp}.cv1")
            p["cv2"], s["cv2"] = cbs(f"{tp}.cv2")
            params[name], stats[name] = p, s
        else:
            params[name], stats[name] = c2f(tp, n)

    head = "model.22"
    for i in range(3):
        params[f"box{i}"], stats[f"box{i}"] = head_branch(f"{head}.cv2.{i}")
        params[f"cls{i}"], stats[f"cls{i}"] = head_branch(f"{head}.cv3.{i}")
        params[f"kpt{i}"], stats[f"kpt{i}"] = head_branch(f"{head}.cv4.{i}")

    dfl = np.asarray(sd[f"{head}.dfl.conv.weight"]).reshape(-1)
    if not np.allclose(dfl, np.arange(REG_MAX)):
        raise ValueError("unexpected DFL projection in checkpoint")

    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    return {"params": to_j(params), "batch_stats": to_j(stats)}
