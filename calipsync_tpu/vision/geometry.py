"""Mouth-crop geometry shared by training data, inference and compositing.

Reproduces the reference's pixel-exact crop pipeline:
  - training crop: /root/reference/dataset/dataset.py:73-134
  - inference crop with boundary clamping:
    /root/reference/image_infer_v1/tools/frame_synthesizer/infer_api.py:205-245

Two numerics notes (verified against cv2):
  - The reference calls ``cv2.resize(img, (168,168), cv2.INTER_AREA)`` —
    but the third positional argument of cv2.resize is ``dst``, not
    ``interpolation``, so the *actual* interpolation is the default
    INTER_LINEAR. We use INTER_LINEAR explicitly to match real behavior.
  - ``cv2.rectangle(img, (5,5,150,145), 0, -1)`` fills rows [5,149] and
    cols [5,154] inclusive, i.e. numpy slice [5:150, 5:155].

These run on host (uint8 O(HW) work; cv2's SIMD resize is the right tool —
SURVEY.md section 7 "hard parts" (3)).
"""

from __future__ import annotations

from dataclasses import dataclass

import cv2
import numpy as np

from calipsync_tpu.config import CropConfig

DEFAULT_CROP = CropConfig()


def load_landmarks(path: str) -> np.ndarray:
    """Read a .lms/.txt landmark file -> (N, 2) int32 (float text allowed)."""
    return np.loadtxt(path, dtype=np.float32).astype(np.int32)


_E18_CACHE: dict = {}


def _e18(v) -> str:
    """'%.18e' of an integer-valued coordinate, cached — landmark coords
    are small ints, so formatting reduces to a dict hit."""
    i = int(v)
    if i == v:
        s = _E18_CACHE.get(i)
        if s is None:
            s = _E18_CACHE[i] = "%.18e" % float(i)
        return s
    return "%.18e" % float(v)


def save_landmarks_txt(path: str, lms: np.ndarray,
                       fmt: str = "%.18e") -> None:
    """Write landmarks byte-identically to ``np.savetxt(path, lms, fmt)``
    for the two formats the pipelines use ('%.18e' the step3 positions
    default, '%d' the step1 .lms files) — ~10x faster on the 1-core host
    than savetxt's per-row % formatting."""
    rows = np.asarray(lms)
    if fmt == "%d":
        text = "".join(f"{int(x)} {int(y)}\n" for x, y in rows)
    elif fmt == "%.18e":
        text = "".join(f"{_e18(x)} {_e18(y)}\n" for x, y in rows)
    else:
        np.savetxt(path, rows, fmt=fmt)
        return
    with open(path, "w") as f:
        f.write(text)


def mouth_bbox_train(lms: np.ndarray) -> tuple[int, int, int, int]:
    """Training-path square mouth bbox: x from lms[1]/lms[31], y from
    lms[52], side = width (dataset/dataset.py:83-88). No clamping."""
    xmin = int(lms[1][0])
    ymin = int(lms[52][1])
    xmax = int(lms[31][0])
    width = xmax - xmin
    return xmin, ymin, xmax, ymin + width


@dataclass(frozen=True)
class CropParams:
    """Clamped crop region; ``width`` is the pre-clamp square side used for
    the paste-back resize (frame_synthesizer/infer_api.py:250,277)."""

    ymin: int
    ymax: int
    xmin: int
    xmax: int
    width: int


def mouth_bbox_infer(lms: np.ndarray, img_h: int, img_w: int) -> CropParams:
    """Inference-path bbox with the reference's boundary clamping
    (frame_synthesizer/infer_api.py:205-231)."""
    xmin = int(lms[1][0])
    ymin = int(lms[52][1])
    xmax = int(lms[31][0])
    width = xmax - xmin
    ymax = ymin + width

    if ymax > img_h:
        diff = ymax - img_h
        ymax = img_h
        ymin = max(0, ymin - diff)
    if ymin < 0:
        ymax = min(img_h, ymax - ymin)
        ymin = 0
    xmin = max(xmin, 0)
    xmax = min(xmax, img_w)
    return CropParams(ymin, ymax, xmin, xmax, width)


def crop_resize_168(img: np.ndarray, ymin: int, ymax: int,
                    xmin: int, xmax: int,
                    cfg: CropConfig = DEFAULT_CROP) -> np.ndarray:
    """Crop bbox and resize to the 168x168 working square (INTER_LINEAR)."""
    crop = img[ymin:ymax, xmin:xmax]
    return cv2.resize(crop, (cfg.resize, cfg.resize),
                      interpolation=cv2.INTER_LINEAR)


def center_160(crop168: np.ndarray, cfg: CropConfig = DEFAULT_CROP) -> np.ndarray:
    """168 -> central 160 region [4:164, 4:164]."""
    m = cfg.margin
    return np.ascontiguousarray(crop168[m:cfg.resize - m, m:cfg.resize - m])


def mask_mouth(img160: np.ndarray, cfg: CropConfig = DEFAULT_CROP) -> np.ndarray:
    """Black out the mouth rectangle; returns a copy."""
    out = img160.copy()
    out[cfg.mask_y:cfg.mask_y + cfg.mask_h,
        cfg.mask_x:cfg.mask_x + cfg.mask_w] = 0
    return out


def train_pair_uint8(img: np.ndarray, lms: np.ndarray,
                     img_ex: np.ndarray, lms_ex: np.ndarray,
                     cfg: CropConfig = DEFAULT_CROP
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One training example's image planes, all uint8 HWC:

    Returns (reference_crop, masked_crop, target_crop) — the model input is
    concat([reference, masked]) / 255 and the label is target / 255
    (normalization happens on device, fused into the forward).
    """
    x0, y0, x1, y1 = mouth_bbox_train(lms)
    real = center_160(crop_resize_168(img, y0, y1, x0, x1, cfg), cfg)
    masked = mask_mouth(real, cfg)

    ex0, ey0, ex1, ey1 = mouth_bbox_train(lms_ex)
    ref = center_160(crop_resize_168(img_ex, ey0, ey1, ex0, ex1, cfg), cfg)
    return ref, masked, real


def infer_input_uint8(img: np.ndarray, lms: np.ndarray,
                      cfg: CropConfig = DEFAULT_CROP
                      ) -> tuple[np.ndarray, np.ndarray, CropParams,
                                 np.ndarray]:
    """Inference-path input planes for one frame.

    Returns (reference_crop160, masked_crop160, crop_params, crop168):
    crop168 is kept for paste-back (prediction is written into its center).
    """
    h, w = img.shape[:2]
    p = mouth_bbox_infer(lms, h, w)
    crop168 = crop_resize_168(img, p.ymin, p.ymax, p.xmin, p.xmax, cfg)
    real = center_160(crop168, cfg)
    masked = mask_mouth(real, cfg)
    return real, masked, p, crop168
