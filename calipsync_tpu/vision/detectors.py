"""Face detector backends behind the common ``detect(images)`` interface.

The reference keeps the detector pluggable
(/root/reference/utils/lip_detector/lip_detector.py:21-22) with three
implementations; same here:

  - S3FD (active default): nn/s3fd.py — fully in-repo, JAX backbone.
  - YOLOv8-face adapter: wraps ultralytics when installed (the reference's
    active path, detect_face_yolo.py:4-42) — gated; this image has no
    ultralytics.
  - SCRFD: anchor-based ONNX detector via cv2.dnn (reference
    utils/detect_face.py:6-106), FPN strides 8/16/32, 2 anchors/cell.

All return ``[(bboxes_xywh float array, indices list)]`` per image, with
the last-good-detection fallback the pipelines rely on.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from calipsync_tpu.nn.s3fd import S3FDDetector, nms_np  # re-export

Detection = Tuple[np.ndarray, list]


class YoloFaceDetector:
    """ultralytics YOLOv8n-face adapter (reference detect_face_yolo.py).

    Requires the optional ``ultralytics`` package + a yolov8n-face.pt
    checkpoint; raises a clear error otherwise.
    """

    def __init__(self, weight_path: str, conf_threshold: float = 0.5):
        try:
            from ultralytics import YOLO  # type: ignore
        except ImportError as e:
            raise RuntimeError(
                "YoloFaceDetector requires the 'ultralytics' package; use "
                "S3FDDetector (in-repo) instead") from e
        self.model = YOLO(weight_path)
        self.conf_threshold = conf_threshold
        self.last_detection: Optional[Detection] = None

    def detect(self, images: Sequence[np.ndarray]) -> List[Detection]:
        results = self.model(list(images), conf=self.conf_threshold,
                             verbose=False)
        out: List[Detection] = []
        for res in results:
            boxes = res.boxes.xyxy.cpu().numpy() if len(res.boxes) else \
                np.zeros((0, 4))
            if len(boxes) == 0:
                out.append(self.last_detection
                           if self.last_detection is not None
                           else (np.array([]), []))
                continue
            xywh = np.column_stack([boxes[:, :2],
                                    boxes[:, 2:4] - boxes[:, :2]])
            current = (xywh, list(range(len(boxes))))
            self.last_detection = current
            out.append(current)
        return out


class SCRFDDetector:
    """SCRFD ONNX face detector via cv2.dnn (reference utils/detect_face.py:
    6-106): 640x640 letterboxed input, FPN strides (8, 16, 32), 2 anchors
    per cell, distance-to-bbox decode, score threshold + NMS."""

    STRIDES = (8, 16, 32)
    NUM_ANCHORS = 2
    INPUT = 640

    def __init__(self, onnx_path: str, conf_threshold: float = 0.5,
                 nms_threshold: float = 0.4):
        import cv2

        self.net = cv2.dnn.readNetFromONNX(onnx_path)
        self.conf_threshold = conf_threshold
        self.nms_threshold = nms_threshold
        self.last_detection: Optional[Detection] = None
        self._cv2 = cv2

    def _anchor_centers(self, h: int, w: int, stride: int) -> np.ndarray:
        ys, xs = np.mgrid[:h, :w]
        centers = np.stack([xs, ys], axis=-1).reshape(-1, 2) * stride
        return np.repeat(centers, self.NUM_ANCHORS, axis=0).astype(
            np.float32)

    def _detect_single(self, img: np.ndarray) -> np.ndarray:
        cv2 = self._cv2
        h0, w0 = img.shape[:2]
        scale = self.INPUT / max(h0, w0)
        resized = cv2.resize(img, (int(w0 * scale), int(h0 * scale)))
        canvas = np.zeros((self.INPUT, self.INPUT, 3), np.uint8)
        canvas[:resized.shape[0], :resized.shape[1]] = resized

        blob = cv2.dnn.blobFromImage(canvas, 1.0 / 128.0,
                                     (self.INPUT, self.INPUT),
                                     (127.5, 127.5, 127.5), swapRB=True)
        self.net.setInput(blob)
        outs = self.net.forward(self.net.getUnconnectedOutLayersNames())

        dets = []
        n_levels = len(self.STRIDES)
        for i, stride in enumerate(self.STRIDES):
            scores = outs[i].reshape(-1)
            bbox = outs[i + n_levels].reshape(-1, 4) * stride
            fh = fw = self.INPUT // stride
            centers = self._anchor_centers(fh, fw, stride)
            keep = scores > self.conf_threshold
            if not keep.any():
                continue
            c = centers[keep]
            d = bbox[keep]
            boxes = np.stack([c[:, 0] - d[:, 0], c[:, 1] - d[:, 1],
                              c[:, 0] + d[:, 2], c[:, 1] + d[:, 3]],
                             axis=1) / scale
            dets.append(np.column_stack([boxes, scores[keep]]))
        if not dets:
            return np.empty((0, 5), np.float32)
        dets = np.concatenate(dets, axis=0)
        return dets[nms_np(dets, self.nms_threshold)]

    def detect(self, images: Sequence[np.ndarray]) -> List[Detection]:
        out: List[Detection] = []
        for img in images:
            dets = self._detect_single(img)
            if len(dets) == 0:
                out.append(self.last_detection
                           if self.last_detection is not None
                           else (np.array([]), []))
                continue
            xywh = np.column_stack([dets[:, :2], dets[:, 2:4] - dets[:, :2]])
            current = (xywh, list(range(len(dets))))
            self.last_detection = current
            out.append(current)
        return out
