"""Composed end-to-end golden parity vs the torch reference serving path.

Round-1 parity tests proved every stage in isolation (UNet, crop geometry,
audio windows, compositing math). This module runs the reference's ACTUAL
serving code — `image_infer_v1.tools.frame_synthesizer.infer_api
.FrameSynthesizer.iterate_synthesized_frames` (torch, CPU) — side by side
with `calipsync_tpu.infer.synthesizer.FrameSynthesizer` on identical
assets, identical imported weights and an injected identical frame-index
walk, and compares the COMPOSITED OUTPUT FRAMES. This catches anything a
stage-wise match can miss: quantization points, paste-back rounding,
clamped-bbox edge cases, mask-blend conventions.

Reference path under test:
  /root/reference/image_infer_v1/tools/frame_synthesizer/infer_api.py:192-451

The measured numbers are recorded into PARITY_r02.json at the repo root
(the committed fidelity artifact; see BASELINE.md "PSNR/LPIPS parity").
"""

import json
import pathlib
import sys

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
ARTIFACT = REPO_ROOT / "PARITY_r02.json"


def _record(key: str, value) -> None:
    # strict JSON: infinite PSNR (bit-exact frames) is recorded as null
    value = {k: (None if isinstance(v, float) and not np.isfinite(v) else v)
             for k, v in value.items()}
    data = json.loads(ARTIFACT.read_text()) if ARTIFACT.exists() else {}
    data[key] = value
    ARTIFACT.write_text(json.dumps(data, indent=2, sort_keys=True) + "\n")


def _scripted(walk):
    """A shared deterministic frame walk injected into both synthesizers
    (replaces reference global-`random` state and our seeded sequencer so
    the two systems visit the same physical frames)."""
    state = {"pos": 0}

    def next_fn(needed):
        s = walk[state["pos"]:state["pos"] + needed]
        state["pos"] += needed
        return list(s)

    return next_fn


@pytest.fixture(scope="module")
def ref_serving(reference_path):
    sys.path.insert(0, str(reference_path))
    try:
        from image_infer_v1.tools.frame_synthesizer.infer_api import \
            FrameSynthesizer as RefFS
        from image_infer_v1.models.unet import Model as RefModel
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference serving code: {e}")
    return RefFS, RefModel


@pytest.fixture(scope="module")
def shared_weights(ref_serving, tmp_path_factory):
    """One randomized torch checkpoint used by BOTH systems."""
    import test_unet_parity as up

    _, RefModel = ref_serving
    torch_model = up._randomize_state_dict(RefModel(6, "hubert").eval(),
                                           seed=13)
    ckpt = tmp_path_factory.mktemp("ckpt") / "unet.pth"
    import torch

    torch.save(torch_model.state_dict(), str(ckpt))
    return torch_model, str(ckpt)


def _run_pair(ref_serving, shared_weights, data_dir, feats, walk,
              batch_size=4):
    """Drive both serving paths; return (ref_frames, our_frames, phys)."""
    from calipsync_tpu.core.weights import (import_generator,
                                            torch_state_dict_to_numpy)
    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.nn.unet import Generator

    RefFS, _ = ref_serving
    torch_model, ckpt = shared_weights

    ref_synth = RefFS(ckpt, str(data_dir), device="cpu",
                      batch_size=batch_size)
    ref_synth._generate_frame_sequence = _scripted(walk)
    ref_items = list(ref_synth.iterate_synthesized_frames(feats))

    variables = import_generator(torch_state_dict_to_numpy(torch_model))
    ours = FrameSynthesizer(variables, str(data_dir), model=Generator(),
                            batch_size=batch_size, seed=0)
    ours.sequencer.next = _scripted(walk)
    our_items = list(ours.iterate_synthesized_frames(feats))

    assert [i["physical_index"] for i in ref_items] == \
           [i["physical_index"] for i in our_items]
    return ([i["frame"] for i in ref_items],
            [i["frame"] for i in our_items],
            [i["physical_index"] for i in ref_items])


def test_composed_serving_parity(ref_serving, shared_weights,
                                 synthetic_step3_dir):
    """Full composed path, no XSeg masks: frames must match at >50 dB PSNR
    with near-total exact-pixel agreement (residual diffs are fp32 rtol-1e-3
    model noise landing on uint8 truncation boundaries)."""
    from calipsync_tpu.eval import batch_psnr
    from calipsync_tpu.infer.synthesizer import PingPongSequencer

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((10, 2, 1024)).astype(np.float32)
    walk = PingPongSequencer(12, np.random.default_rng(17)).next(16)

    ref_frames, our_frames, _ = _run_pair(
        ref_serving, shared_weights, synthetic_step3_dir, feats, walk)

    a = np.stack(ref_frames)
    b = np.stack(our_frames)
    scores = batch_psnr(a, b)
    exact = float(np.mean(a == b))
    maxdiff = int(np.max(np.abs(a.astype(np.int16) - b.astype(np.int16))))
    _record("composed_no_mask", {
        "n_frames": len(ref_frames),
        "psnr_db_min": float(np.min(scores)),
        "psnr_db_mean": float(np.mean(scores)),
        "exact_pixel_fraction": exact,
        "max_abs_pixel_diff": maxdiff,
    })
    assert scores.min() > 50.0, scores
    assert exact > 0.99, exact


def test_composed_serving_parity_with_xseg(ref_serving, shared_weights,
                                           synthetic_step3_dir, tmp_path):
    """Same, with non-trivial XSeg masks present: exercises the combined
    face-polygon x mask blend (reference process_batch:327-345)."""
    import shutil

    import cv2

    from calipsync_tpu.eval import batch_psnr
    from calipsync_tpu.infer.synthesizer import PingPongSequencer

    masked_dir = tmp_path / "infer_data"
    shutil.copytree(synthetic_step3_dir, masked_dir)
    yy, xx = np.mgrid[0:168, 0:168].astype(np.float32) / 167.0
    grad = (255 * (0.25 + 0.75 * yy * xx)).astype(np.uint8)
    for f in (masked_dir / "frames").glob("*.jpg"):
        cv2.imwrite(str(masked_dir / "masks" / f.name), grad)

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((8, 2, 1024)).astype(np.float32)
    walk = PingPongSequencer(12, np.random.default_rng(23)).next(12)

    ref_frames, our_frames, _ = _run_pair(
        ref_serving, shared_weights, masked_dir, feats, walk)

    a = np.stack(ref_frames)
    b = np.stack(our_frames)
    scores = batch_psnr(a, b)

    # real-LPIPS metric between the two systems' composited output (BGR ->
    # RGB, downscaled for the 1-core CPU budget); deterministic no-weights
    # variables — see eval.make_default_lpips
    from calipsync_tpu.eval import lpips_distance, make_default_lpips

    sa = np.stack([cv2.resize(f, (112, 112))[..., ::-1] for f in ref_frames])
    sb = np.stack([cv2.resize(f, (112, 112))[..., ::-1] for f in our_frames])
    module, lvars = make_default_lpips(net="vgg", seed=0, image_size=112)
    lp = lpips_distance(lvars, sa, sb, module=module)

    _record("composed_xseg_mask", {
        "n_frames": len(ref_frames),
        "psnr_db_min": float(np.min(scores)),
        "psnr_db_mean": float(np.mean(scores)),
        "exact_pixel_fraction": float(np.mean(a == b)),
        "lpips_mean": float(lp.mean()),
        "lpips_max": float(lp.max()),
    })
    assert scores.min() > 50.0, scores
    assert lp.max() < 1e-4, lp


def test_prediction_quantization_points(ref_serving, shared_weights,
                                        synthetic_step3_dir):
    """Compare at the reference's quantization point: the uint8 mouth
    prediction BEFORE compositing (process_batch:265-266 `float*255 ->
    np.uint8` C-cast truncation) vs our on-device `(pred*255).astype(u8)`.
    Any disagreement must be +-1 from fp32 noise at truncation boundaries."""
    import torch

    import jax.numpy as jnp

    from calipsync_tpu.core.weights import (import_generator,
                                            torch_state_dict_to_numpy)
    from calipsync_tpu.infer.synthesizer import (FrameSynthesizer,
                                                 make_generate_fn)
    from calipsync_tpu.nn.unet import Generator

    torch_model, _ = shared_weights
    variables = import_generator(torch_state_dict_to_numpy(torch_model))
    model = Generator()
    synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                             model=model, batch_size=4, seed=0,
                             preload=False)
    rng = np.random.default_rng(9)
    feats = rng.standard_normal((4, 2, 1024)).astype(np.float32)
    seq = [0, 3, 7, 11]
    entries = [synth._frame_entry(i) for i in seq]

    # reference-side: exact process_batch input construction + quantization
    img_in = np.stack([
        np.concatenate([e["ref"].transpose(2, 0, 1).astype(np.float32) / 255,
                        e["masked"].transpose(2, 0, 1).astype(np.float32)
                        / 255]) for e in entries])
    auds = np.stack([
        np.pad(feats, ((8, 8), (0, 0), (0, 0)))[i:i + 16].reshape(32, 32, 32)
        for i in range(4)])
    with torch.no_grad():
        ref_pred = torch_model(torch.from_numpy(img_in),
                               torch.from_numpy(auds)).numpy()
    ref_u8 = np.array(ref_pred.transpose(0, 2, 3, 1) * 255, dtype=np.uint8)

    gen = make_generate_fn(model)
    ours = np.asarray(gen(variables,
                          jnp.stack([jnp.asarray(e["ref"]) for e in entries]),
                          jnp.stack([jnp.asarray(e["masked"])
                                     for e in entries]),
                          jnp.asarray(feats),
                          jnp.arange(4, dtype=jnp.int32)))
    ours = ours.reshape(4, 160, 160, 3)

    diff = np.abs(ours.astype(np.int16) - ref_u8.astype(np.int16))
    mismatch = float(np.mean(diff > 0))
    _record("pred_uint8_quantization", {
        "mismatch_fraction": mismatch,
        "max_abs_diff": int(diff.max()),
    })
    assert diff.max() <= 1, diff.max()
    assert mismatch < 0.01, mismatch


def test_composed_yuv420_parity_vs_reference(ref_serving, shared_weights,
                                             synthetic_step3_dir):
    """The half-bandwidth yuv420 transfer measured against the TORCH
    REFERENCE output (not just our own bgr path): full composed frames at
    >38 dB PSNR — the only loss is chroma subsampling, which every
    reference sink re-applies at encode time anyway. Recorded in the
    fidelity artifact."""
    from calipsync_tpu.core.weights import (import_generator,
                                            torch_state_dict_to_numpy)
    from calipsync_tpu.eval import batch_psnr
    from calipsync_tpu.infer.synthesizer import (FrameSynthesizer,
                                                 PingPongSequencer)
    from calipsync_tpu.nn.unet import Generator

    RefFS, _ = ref_serving
    torch_model, ckpt = shared_weights
    rng = np.random.default_rng(6)
    feats = rng.standard_normal((8, 2, 1024)).astype(np.float32)
    walk = PingPongSequencer(12, np.random.default_rng(23)).next(12)

    ref_synth = RefFS(ckpt, str(synthetic_step3_dir), device="cpu",
                      batch_size=4)
    ref_synth._generate_frame_sequence = _scripted(walk)
    ref_frames = [i["frame"]
                  for i in ref_synth.iterate_synthesized_frames(feats)]

    variables = import_generator(torch_state_dict_to_numpy(torch_model))
    ours = FrameSynthesizer(variables, str(synthetic_step3_dir),
                            model=Generator(), batch_size=4, seed=0,
                            transfer_format="yuv420")
    ours.sequencer.next = _scripted(walk)
    our_frames = [i["frame"]
                  for i in ours.iterate_synthesized_frames(feats)]

    scores = batch_psnr(np.stack(ref_frames), np.stack(our_frames))
    _record("composed_yuv420_transfer", {
        "n_frames": len(ref_frames),
        "psnr_db_min": float(np.min(scores)),
        "psnr_db_mean": float(np.mean(scores)),
    })
    assert scores.min() > 38.0, scores
