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


def _scrfd_outs(pos_idx=6480, bbox_d=(40, 40, 40, 40),
                kps_pad=((300, 300), (340, 340), (320, 330), (310, 350),
                         (330, 350))):
    """Synthetic SCRFD head outputs: one positive anchor at stride 8,
    grid cell (40, 40) -> center (320, 320); distances in stride units."""
    n8, n16, n32 = 80 * 80 * 2, 40 * 40 * 2, 20 * 20 * 2
    scores = [np.zeros((1, n, 1), np.float32) for n in (n8, n16, n32)]
    scores[0][0, pos_idx, 0] = 0.9
    bboxes = [np.zeros((1, n, 4), np.float32) for n in (n8, n16, n32)]
    bboxes[0][0, pos_idx] = np.asarray(bbox_d, np.float32) / 8.0
    kpss = [np.zeros((1, n, 10), np.float32) for n in (n8, n16, n32)]
    cx, cy = 320.0, 320.0
    for k, (px, py) in enumerate(kps_pad):
        kpss[0][0, pos_idx, 2 * k] = (px - cx) / 8.0
        kpss[0][0, pos_idx, 2 * k + 1] = (py - cy) / 8.0
    return scores + bboxes + kpss


def _fake_scrfd(outs, conf=0.5, nms=0.4):
    import cv2

    from calipsync_tpu.vision.detectors import SCRFDDetector

    det = SCRFDDetector.__new__(SCRFDDetector)
    det.conf_threshold = conf
    det.nms_threshold = nms
    det.last_detection = None
    det._cv2 = cv2

    class _Net:
        def setInput(self, blob):
            self.blob = blob

        def getUnconnectedOutLayersNames(self):
            return tuple(str(i) for i in range(9))

        def forward(self, names):
            return outs

    det.net = _Net()
    return det


def test_scrfd_keypoint_decode_square():
    """Square source: no pad, unit ratio — decode must be exact
    (reference utils/detect_face.py:66-106)."""
    det = _fake_scrfd(_scrfd_outs())
    img = np.zeros((640, 640, 3), np.uint8)
    bboxes, indices, kps = det.detect_with_keypoints(img)
    assert list(indices) == [0]
    np.testing.assert_allclose(bboxes[0], [280, 280, 80, 80], atol=1e-4)
    np.testing.assert_allclose(kps[0, 0], [300, 300], atol=1e-4)
    np.testing.assert_allclose(kps[0, 1], [340, 340], atol=1e-4)


def test_scrfd_keypoint_decode_padded_portrait():
    """2:1 portrait source: centered width pad (padw=160) and 2x ratios
    must un-map bboxes AND keypoints back to source coordinates."""
    det = _fake_scrfd(_scrfd_outs())
    img = np.zeros((1280, 640, 3), np.uint8)
    bboxes, indices, kps = det.detect_with_keypoints(img)
    assert list(indices) == [0]
    np.testing.assert_allclose(bboxes[0], [240, 560, 160, 160], atol=1e-3)
    np.testing.assert_allclose(kps[0, 0], [280, 600], atol=1e-3)
    np.testing.assert_allclose(kps[0, 1], [360, 680], atol=1e-3)


def test_detect_stride_propagates_boxes():
    """detect_stride=N: the detector runs on every Nth frame of the
    stream (state carried across batches), boxes are reused in between,
    and on a static face the landmarks match stride=1 exactly (PFLD
    still runs per frame)."""
    from calipsync_tpu.nn.pfld import PFLDGhostOne, fold_mobileone_params
    from calipsync_tpu.vision.lip_detector import LipDetector

    class CountingDetector:
        def __init__(self):
            self.calls = 0

        def detect(self, images):
            self.calls += len(images)
            return [(np.array([[200, 300, 180, 180]], np.float32),
                     [0]) for _ in images]

    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (720, 640, 3)).astype(np.uint8)
    frames = [frame] * 7  # static face

    pfld = PFLDGhostOne()
    variables = jax.jit(pfld.init)(jax.random.key(0),
                                   jnp.zeros((1, 192, 192, 3)))
    variables = jax.tree.map(lambda x: x * 0.05, variables)
    folded = fold_mobileone_params(variables)
    mean_face = np.zeros(220, np.float32)

    d1, d3 = CountingDetector(), CountingDetector()
    lip1 = LipDetector(folded, mean_face, d1)
    lip3 = LipDetector(folded, mean_face, d3, detect_stride=3)

    res1 = lip1.detect_landmarks(frames)
    # two batches, to exercise the cross-batch phase carry
    res3 = (lip3.detect_landmarks(frames[:4])
            + lip3.detect_landmarks(frames[4:]))
    assert d1.calls == 7
    assert d3.calls == 3  # frames 0, 3, 6
    for a, b in zip(res1, res3):
        np.testing.assert_array_equal(a[0], b[0])

    # a new video must NOT inherit the previous stream's carry/phase
    # (pipelines call reset_stride() per video): frame 0 of the next
    # stream gets a fresh detection
    lip3.reset_stride()
    assert lip3.detect_landmarks([frame]) is not None
    assert d3.calls == 4  # fresh detection at the new stream's frame 0

    # empty batches are a no-op at any stride
    assert lip3.detect_landmarks([]) == []


def test_non_finite_landmarks_drop_to_the_no_detection_contract(
        monkeypatch):
    """A non-finite PFLD output must NOT cast to INT_MIN coordinates
    (silent crop corruption); it drops the face so the existing
    no-detection fallbacks (gap fill / last-good) take over."""
    from calipsync_tpu.nn.pfld import PFLDGhostOne, fold_mobileone_params
    from calipsync_tpu.vision.lip_detector import LipDetector

    class OneFace:
        def detect(self, images):
            return [(np.array([[50, 50, 80, 80]], np.float32), [0])
                    for _ in images]

    pfld = PFLDGhostOne()
    variables = jax.jit(pfld.init)(jax.random.key(0),
                                   jnp.zeros((1, 192, 192, 3)))
    folded = fold_mobileone_params(variables)
    lip = LipDetector(folded, np.zeros(220, np.float32), OneFace())
    monkeypatch.setattr(
        lip, "_pfld_batch",
        lambda crops: np.full((len(crops), 220), np.nan, np.float32))
    frame = np.zeros((240, 240, 3), np.uint8)
    assert lip.detect_landmarks([frame]) == [None]


def test_legacy_landmark_on_real_scrfd_decode():
    """LegacyLandmark driven by the production SCRFD keypoint decode (not
    a stub): the eye keypoints above give a 45-degree roll; the rotate-
    level-and-back round trip must return 110 in-range landmarks."""
    from calipsync_tpu.nn.pfld import PFLDGhostOne, fold_mobileone_params
    from calipsync_tpu.vision.legacy_landmark import LegacyLandmark
    from calipsync_tpu.vision.lip_detector import LipDetector

    det = _fake_scrfd(_scrfd_outs())
    img = np.random.default_rng(1).integers(
        0, 256, (1280, 640, 3)).astype(np.uint8)

    pfld = PFLDGhostOne()
    variables = jax.jit(pfld.init)(jax.random.key(0),
                                   jnp.zeros((1, 192, 192, 3)))
    # damp the random init: untrained weights can overflow fp32 on real
    # images (trained checkpoints don't)
    variables = jax.tree.map(lambda x: x * 0.05, variables)
    lip = LipDetector(fold_mobileone_params(variables),
                      np.zeros(220, np.float32), face_detector=None)
    legacy = LegacyLandmark(lip, det)
    results = legacy.landmarks(img)
    assert len(results) == 1
    pts, alpha = results[0]
    assert pts.shape == (110, 2)
    assert abs(alpha - 45.0) < 1e-4  # eyes (280,600) -> (360,680)


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
    variables = jax.tree.map(lambda x: x * 0.05, variables)
    lip = LipDetector(fold_mobileone_params(variables),
                      np.zeros(220, np.float32), face_detector=None)
    legacy = LegacyLandmark(lip, _KPDet())
    results = legacy.landmarks(img)
    assert len(results) == 1
    pts, alpha = results[0]
    assert pts.shape == (110, 2) and alpha == 0.0


def test_xseg_mask_generator_geometry():
    """XSegMaskGenerator reproduces the reference generate_mask geometry
    (step3_prepare_infer_data.py:28-89): lower-face square, 100%/100%/50%
    context expansion clamped to the frame, model at 256, mask cut back
    out and resized to the 168 lips grid."""
    import cv2

    from calipsync_tpu.vision.xseg import XSegMaskGenerator

    calls = {}

    def fake_session(inp):
        calls["shape"] = inp.shape
        calls["max"] = float(inp.max())
        # deterministic mask: horizontal gradient
        g = np.linspace(0, 1, 256, dtype=np.float32)
        return np.broadcast_to(g, (256, 256))[None, ..., None].copy()

    gen = XSegMaskGenerator(session=fake_session)
    frame = np.full((400, 300, 3), 128, np.uint8)
    lms = np.zeros((110, 2), np.int64)
    lms[1] = (100, 200)    # xmin
    lms[31] = (180, 200)   # xmax -> width 80
    lms[52] = (150, 180)   # ymin
    mask = gen(frame, lms)

    assert mask.shape == (168, 168) and mask.dtype == np.float32
    assert calls["shape"] == (1, 256, 256, 3)
    assert calls["max"] <= 1.0  # /255 preprocessing

    # independent expectation of the crop/resize chain
    new_xmin, new_ymin = max(0, 100 - 80), max(0, 180 - 80)
    new_xmax, new_ymax = min(300, 180 + 80), min(400, 180 + 80 + 40)
    eh, ew = new_ymax - new_ymin, new_xmax - new_xmin
    g = np.linspace(0, 1, 256, dtype=np.float32)
    full = np.broadcast_to(g, (256, 256))
    expanded = cv2.resize(full, (ew, eh))
    x1, y1 = 100 - new_xmin, 180 - new_ymin
    want = cv2.resize(expanded[y1:y1 + 80, x1:x1 + 80], (168, 168))
    np.testing.assert_allclose(mask, want, atol=1e-6)


def test_xseg_mask_generator_fallback_paths():
    from calipsync_tpu.vision.xseg import XSegMaskGenerator

    gen = XSegMaskGenerator(session=lambda inp: np.zeros(
        (1, 256, 256, 1), np.float32))
    frame = np.zeros((100, 100, 3), np.uint8)
    # lower-face square extends past the expanded (clamped) crop ->
    # all-ones fallback, exactly as the reference (:87-89)
    lms = np.zeros((110, 2), np.int64)
    lms[1] = (10, 60)
    lms[31] = (90, 60)
    lms[52] = (60, 50)   # ymin 50, width 80 -> ymax 130 > frame
    mask = gen(frame, lms)
    np.testing.assert_array_equal(mask, np.ones((168, 168), np.float32))

    with pytest.raises(ValueError):
        XSegMaskGenerator()


def test_xseg_accepts_every_session_output_layout():
    """The pluggable-session contract is just 'mask for a 1x256x256x3
    input': NHWC, NCHW, squeezed (1,H,W) and bare (H,W) must all decode
    to the same (168,168) mask; ambiguous layouts must raise, not write
    garbage compositing masks."""
    from calipsync_tpu.vision.xseg import XSegMaskGenerator

    g = np.linspace(0, 1, 256, dtype=np.float32)
    full = np.broadcast_to(g, (256, 256)).copy()
    layouts = {
        "nhwc": full[None, ..., None],
        "nchw": full[None, None],
        "squeezed_1hw": full[None],
        "bare_hw": full,
    }
    frame = np.full((400, 300, 3), 128, np.uint8)
    lms = np.zeros((110, 2), np.int64)
    lms[1] = (100, 200)
    lms[31] = (180, 200)
    lms[52] = (150, 180)

    masks = {}
    for name, out in layouts.items():
        gen = XSegMaskGenerator(session=lambda inp, out=out: out)
        masks[name] = gen(frame, lms)
    for name in ("nchw", "squeezed_1hw", "bare_hw"):
        np.testing.assert_allclose(masks[name], masks["nhwc"], atol=1e-6,
                                   err_msg=name)

    bad = XSegMaskGenerator(session=lambda inp: np.zeros((1, 256, 3),
                                                         np.float32))
    with pytest.raises(ValueError):
        bad(frame, lms)
