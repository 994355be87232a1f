"""AuxiliaryNet, detector adapters, legacy landmark utility."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_auxiliary_net_shapes():
    from calipsync_tpu.nn.pfld import AuxiliaryNet

    # backbone stage widths at width_factor=1 (reference AuxiliaryNet
    # defaults: 64/80/96/144 channels at descending resolutions)
    o1 = jnp.zeros((2, 48, 48, 64))
    o2 = jnp.zeros((2, 24, 24, 80))
    o3 = jnp.zeros((2, 12, 12, 96))
    o4 = jnp.zeros((2, 6, 6, 144))
    net = AuxiliaryNet(width=1.0)
    variables = jax.jit(net.init)(jax.random.key(0), o1, o2, o3, o4)
    out = net.apply(variables, o1, o2, o3, o4, train=False)
    assert out.shape == (2, 48, 48, 1)
    out, upd = net.apply(variables, o1, o2, o3, o4, train=True,
                         mutable=["batch_stats"])
    assert "batch_stats" in upd


def test_yolo_adapter_gated():
    from calipsync_tpu.vision.detectors import YoloFaceDetector

    with pytest.raises(RuntimeError, match="ultralytics"):
        YoloFaceDetector("/nonexistent/yolov8n-face.pt")


def test_scrfd_anchor_centers():
    from calipsync_tpu.vision.detectors import SCRFDDetector

    det = SCRFDDetector.__new__(SCRFDDetector)  # no onnx file needed
    det.NUM_ANCHORS = SCRFDDetector.NUM_ANCHORS
    centers = SCRFDDetector._anchor_centers(det, 4, 4, 8)
    assert centers.shape == (32, 2)  # 4*4 cells * 2 anchors
    np.testing.assert_array_equal(centers[0], [0, 0])
    np.testing.assert_array_equal(centers[1], [0, 0])
    np.testing.assert_array_equal(centers[2], [8, 0])
    np.testing.assert_array_equal(centers[-1], [24, 24])


def test_legacy_landmark_rotation_roundtrip():
    from calipsync_tpu.vision.legacy_landmark import (LegacyLandmark,
                                                      eye_roll_angle,
                                                      square_crop_with_pad)

    assert eye_roll_angle(np.array([0, 0]), np.array([10, 0])) == 0.0
    assert abs(eye_roll_angle(np.array([0, 0]),
                              np.array([10, 10])) - 45.0) < 1e-6

    img = np.random.default_rng(0).integers(
        0, 256, (100, 100, 3)).astype(np.uint8)
    crop, (ox, oy) = square_crop_with_pad(img, 10, 10, 40, 40)
    assert crop.shape[0] == crop.shape[1] == 42  # 1.05 * 40
    # edge bbox: padding engaged, offset can go negative
    crop2, (ox2, oy2) = square_crop_with_pad(img, -5, -5, 40, 40)
    assert crop2.shape[0] == crop2.shape[1] == 42
    assert ox2 < 0 or oy2 < 0

    class _KPDet:
        def detect_with_keypoints(self, img):
            bboxes = np.array([[20.0, 20.0, 50.0, 50.0]])
            kps = np.array([[[30.0, 35.0], [60.0, 35.0]]])  # level eyes
            return bboxes, [0], kps

    from calipsync_tpu.nn.pfld import PFLDGhostOne, fold_mobileone_params
    from calipsync_tpu.vision.lip_detector import LipDetector

    pfld = PFLDGhostOne()
    variables = jax.jit(pfld.init)(jax.random.key(0),
                                   jnp.zeros((1, 192, 192, 3)))
    lip = LipDetector(fold_mobileone_params(variables),
                      np.zeros(220, np.float32), face_detector=None)
    legacy = LegacyLandmark(lip, _KPDet())
    results = legacy.landmarks(img)
    assert len(results) == 1
    pts, alpha = results[0]
    assert pts.shape == (110, 2) and alpha == 0.0
