"""YOLOv8n-face: parity vs an independent torch oracle, decode math,
importer key coverage, detector interface semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calipsync_tpu.nn.yolo import (NUM_KPT, REG_MAX, STRIDES, YoloV8Face,
                                   YoloV8FaceDetector, decode_outputs,
                                   import_yolov8_face, letterbox)

RTOL, ATOL = 1e-3, 1e-5


def _randomized_torch(seed=0):
    import torch

    from _torch_yolov8 import YoloV8FaceTorch

    ref = YoloV8FaceTorch().eval()
    g = torch.Generator().manual_seed(seed)
    sd = ref.state_dict()
    new = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "dfl" in k:
            new[k] = v
        elif k.endswith("running_var"):
            new[k] = torch.rand(v.shape, generator=g) * 1.5 + 0.25
        elif k.endswith("running_mean"):
            new[k] = torch.randn(v.shape, generator=g) * 0.2
        else:
            new[k] = torch.randn(v.shape, generator=g) * 0.1
    ref.load_state_dict(new)
    return ref


@pytest.fixture(scope="module")
def torch_and_flax():
    ref = _randomized_torch(seed=3)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = import_yolov8_face(sd)
    return ref, variables


def test_raw_heads_match_torch_oracle(torch_and_flax):
    """Two independent implementations of the architecture agree at the
    reference's numeric bar on imported weights (all 9 head tensors)."""
    import torch

    ref, variables = torch_and_flax
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    model = YoloV8Face()
    outs = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(x))
    for (jb, jc, jk), (tb, tc, tk) in zip(outs, ref_outs):
        for j, t in ((jb, tb), (jc, tc), (jk, tk)):
            np.testing.assert_allclose(
                np.asarray(j), t.numpy().transpose(0, 2, 3, 1),
                rtol=RTOL, atol=1e-4)


def test_decode_dfl_and_keypoints_math():
    """Hand-built raw outputs -> known boxes/keypoints: one-hot DFL bins
    at (l,t,r,b)=(2,1,3,4) on a single P3 cell, kpt offsets decoded as
    (raw*2 + cx - 0.5) * stride."""
    n, h, w = 1, 2, 2
    outs = []
    for si, stride in enumerate(STRIDES):
        hh, ww = h >> si or 1, w >> si or 1
        box = np.full((n, hh, ww, 4 * REG_MAX), -1e4, np.float32)
        cls = np.full((n, hh, ww, 1), -1e4, np.float32)
        kpt = np.zeros((n, hh, ww, NUM_KPT * 3), np.float32)
        outs.append((box, cls, kpt))
    # activate cell (0, 1) on the stride-8 scale
    b0 = outs[0][0]
    for d, bin_i in enumerate((2, 1, 3, 4)):
        b0[0, 0, 1, d * REG_MAX + bin_i] = 1e4  # one-hot softmax
    outs[0][1][0, 0, 1, 0] = 1e4               # sigmoid -> 1.0
    outs[0][2][0, 0, 1, 0] = 0.25               # kpt0 x raw
    outs[0][2][0, 0, 1, 1] = -0.5               # kpt0 y raw

    boxes, scores, kpts = jax.jit(decode_outputs)(
        [tuple(map(jnp.asarray, o)) for o in outs])
    boxes, scores, kpts = map(np.asarray, (boxes, scores, kpts))
    a = int(np.argmax(scores[0]))
    assert scores[0, a] > 0.999
    cx, cy = 1.5, 0.5  # cell (0,1) center
    np.testing.assert_allclose(
        boxes[0, a], [(cx - 2) * 8, (cy - 1) * 8, (cx + 3) * 8,
                      (cy + 4) * 8], rtol=1e-5)
    np.testing.assert_allclose(
        kpts[0, a, 0, :2], [(0.25 * 2 + cx - 0.5) * 8,
                            (-0.5 * 2 + cy - 0.5) * 8], rtol=1e-5)


def test_importer_consumes_every_ultralytics_key(torch_and_flax):
    from test_importer_key_schema import TrackingDict

    ref, _ = torch_and_flax
    sd = TrackingDict({k: v.detach().numpy()
                       for k, v in ref.state_dict().items()})
    import_yolov8_face(sd)
    assert sd.unconsumed(("num_batches_tracked",)) == []


def test_letterbox_geometry():
    img = np.zeros((200, 100, 3), np.uint8)
    canvas, r, px, py = letterbox(img, 640)
    assert canvas.shape == (640, 640, 3)
    assert r == pytest.approx(3.2)
    assert (px, py) == (160, 0)
    assert (canvas[0, 0] == 114).all()       # padding value
    assert (canvas[0, 320] == 0).all()       # image content


def test_detector_contract_and_fallback(torch_and_flax):
    """Reference detect() contract: (xywh, indices) per image and
    last-good-detection reuse when a frame has no face
    (detect_face_yolo.py:17-36)."""
    _, variables = torch_and_flax
    det = YoloV8FaceDetector(variables, conf_threshold=0.0,
                             nms_threshold=0.5, img_size=64)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (80, 60, 3), np.uint8)
    (boxes, idxs), = det.detect([img])
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert len(boxes) > 0 and idxs == list(range(len(boxes)))
    assert det.last_detection is not None

    det.conf_threshold = 2.0  # nothing can pass
    (boxes2, idxs2), = det.detect([img])
    np.testing.assert_array_equal(boxes2, boxes)  # previous result reused

    fresh = YoloV8FaceDetector(variables, conf_threshold=2.0, img_size=64)
    (boxes3, idxs3), = fresh.detect([img])
    assert len(boxes3) == 0 and idxs3 == []  # no history -> empty

    bb, idx, kk = det.detect_with_keypoints(img)
    assert bb.shape[1] == 4 and kk.shape[1:] == (NUM_KPT, 2)
    assert idx == list(range(len(bb)))


def test_legacy_landmark_runs_on_yolo_keypoints(torch_and_flax):
    """LegacyLandmark (C20) drives off the native YOLOv8-face keypoints —
    a second production detector for the eye-roll path."""
    import cv2

    from calipsync_tpu.vision.legacy_landmark import LegacyLandmark

    _, variables = torch_and_flax
    det = YoloV8FaceDetector(variables, conf_threshold=0.0, img_size=64)

    class _Lip:  # PFLD stub: landmark grid centered on the crop
        mean_face = np.zeros((220,), np.float32)

        def _pfld_batch(self, crops):
            out = np.zeros((len(crops), 220), np.float32)
            out[:] = 0.5
            return out

    legacy = LegacyLandmark(_Lip(), det)
    img = np.random.default_rng(2).integers(0, 255, (96, 96, 3), np.uint8)
    res = legacy.landmarks(img)
    assert len(res) > 0
    lm, roll = res[0]
    assert lm.shape == (110, 2) and np.isfinite(roll)
