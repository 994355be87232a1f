"""End-to-end pipeline integration: video -> train -> assets -> video out.

Drives the real pipeline code with stub perception models (random-weight
detectors can't find synthetic faces) and a fake HuBERT, over a synthetic
video + wav side-car, on the virtual CPU mesh.
"""

import os

import numpy as np
import pytest

import jax

from calipsync_tpu.config import (MeshConfig, ModelConfig, PipelineConfig,
                                  TrainConfig)


class _StubLipDetector:
    """Deterministic plausible landmarks for synthetic frames."""

    def detect_landmarks(self, images):
        results = []
        for img in images:
            h, w = img.shape[:2]
            rng = np.random.default_rng(int(img[::97, ::97].sum()) % 1000)
            lms = np.zeros((110, 2), np.int32)
            xmin = w // 4
            width = w // 3
            ymin = h // 2
            cx, cy = xmin + width // 2, ymin + width // 2
            theta = np.linspace(0, 2 * np.pi, 33, endpoint=False)
            lms[:33, 0] = (cx + 0.45 * width * np.cos(theta)).astype(int)
            lms[:33, 1] = (cy + 0.45 * width * np.sin(theta)).astype(int)
            lms[33:] = rng.integers(xmin, xmin + width, (77, 2))
            lms[1] = (xmin, cy)
            lms[31] = (xmin + width, cy)
            lms[52] = (cx, ymin)
            results.append([lms])
        return results


class _StubHubert:
    def extract(self, speech):
        n = max(4, len(speech) // 640)
        return np.random.default_rng(0).standard_normal(
            (n, 2, 1024)).astype(np.float32)

    def extract_from_file(self, path):
        from calipsync_tpu.audio.io import load_audio

        return self.extract(load_audio(path, 16_000))


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    import cv2

    from calipsync_tpu.audio.io import save_wav

    d = tmp_path_factory.mktemp("video")
    path = str(d / "speaker.mp4")
    rng = np.random.default_rng(0)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (320, 320))
    for _ in range(10):
        vw.write(rng.integers(0, 256, (320, 320, 3)).astype(np.uint8))
    vw.release()
    # wav side-car (no ffmpeg binary on this image to demux audio)
    t = np.linspace(0, 1.0, 16_000, endpoint=False)
    save_wav(str(d / "speaker.wav"),
             (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32), 16_000)
    return path


def _tiny_cfg():
    return PipelineConfig(
        model=ModelConfig(),
        train=TrainConfig(batch_size=4, epochs=1, num_workers=2,
                          perceptual_weight=0.0),
        mesh=MeshConfig(data=4),
    )


def test_full_pipeline(synthetic_video, tmp_path):
    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.pipelines.inference import VideoStreamManager
    from calipsync_tpu.pipelines.step1_preprocess import TrainPreprocessor
    from calipsync_tpu.pipelines.step2_train import train_digital_model
    from calipsync_tpu.pipelines.step3_prepare import InferPreprocessor
    from calipsync_tpu.train.trainer import build_model

    cfg = _tiny_cfg()
    data_dir = str(tmp_path / "data")

    # --- step1 ---
    step1 = TrainPreprocessor(_StubLipDetector(), _StubHubert())
    out = step1.process_video(synthetic_video, data_dir)
    assert out["total_frames"] == 10
    assert os.path.exists(os.path.join(data_dir, "aud_hu.npy"))
    assert os.path.exists(os.path.join(data_dir, "full_body_img", "9.jpg"))
    assert os.path.exists(os.path.join(data_dir, "landmarks", "9.lms"))
    assert os.path.exists(os.path.join(data_dir, "faces", "0.jpg"))

    # --- step2 (1 epoch, 4-device DP, no perceptual term) ---
    ckpt_path = train_digital_model(data_dir, str(tmp_path / "ckpt"),
                                    cfg=cfg, log_every=0)
    assert ckpt_path and os.path.isdir(ckpt_path)

    # --- step3 ---
    step3 = InferPreprocessor(_StubLipDetector())
    out3 = step3.process_video(synthetic_video, str(tmp_path / "assets"))
    assert out3["processed_frames"] == 10
    infer_dir = out3["infer_dir"]
    assert os.path.exists(os.path.join(infer_dir, "frames", "000009.jpg"))
    assert os.path.exists(os.path.join(tmp_path, "assets", "sample.jpg"))

    # --- inference: trained checkpoint -> video out ---
    from calipsync_tpu.cli import load_generator_variables

    variables = load_generator_variables(str(tmp_path / "ckpt"), cfg)
    model = build_model(cfg.model, axis_name=None)
    synth = FrameSynthesizer(variables, infer_dir, model=model,
                             batch_size=4, seed=0)
    mgr = VideoStreamManager(synth, _StubHubert(), fps=25)
    wav = synthetic_video.replace(".mp4", ".wav")
    result = mgr.process_single_file(wav, str(tmp_path / "out.mp4"))
    assert result["frames"] >= 4
    assert os.path.getsize(tmp_path / "out.mp4") > 0
    # no ffmpeg on this image: the box-level remux must still deliver a
    # single playable A/V file (PCM track), not a wav side-car
    from calipsync_tpu.media.mp4 import has_pcm_audio

    assert result["audio_side_car"] is None
    assert has_pcm_audio(str(tmp_path / "out.mp4"))


def test_train_resume(synthetic_step1_dir, tmp_path):
    """checkpoint_every + resume: a restarted run continues from the saved
    epoch instead of repeating or skipping (checkpoints are keyed by
    epoch, not optimizer step)."""
    from calipsync_tpu.core import checkpoint as ckpt
    from calipsync_tpu.pipelines.step2_train import train_digital_model

    cfg = PipelineConfig(
        train=TrainConfig(batch_size=4, epochs=2, num_workers=2,
                          perceptual_weight=0.0, checkpoint_every=1),
        mesh=MeshConfig(data=4))
    save = str(tmp_path / "ckpt")
    # run only epoch 1 (epochs=1), then resume with epochs=2
    cfg1 = PipelineConfig(train=TrainConfig(
        batch_size=4, epochs=1, num_workers=2, perceptual_weight=0.0,
        checkpoint_every=1), mesh=MeshConfig(data=4))
    train_digital_model(str(synthetic_step1_dir), save, cfg=cfg1,
                        log_every=0)
    assert ckpt.latest_step(save) == 1
    train_digital_model(str(synthetic_step1_dir), save, cfg=cfg,
                        resume=True, log_every=0)
    assert ckpt.latest_step(save) == 2


def test_clone_orchestrator(synthetic_video, tmp_path):
    from calipsync_tpu.pipelines.all_pipeline import clone_video_local

    weights_path, model_id = clone_video_local(
        synthetic_video, str(tmp_path), _StubLipDetector(), _StubHubert(),
        cfg=_tiny_cfg())
    model_dir = os.path.join(str(tmp_path), model_id)
    assert os.path.isdir(weights_path)
    # intermediates cleaned, inference assets kept
    assert not os.path.exists(os.path.join(model_dir, "full_body_img"))
    assert os.path.isdir(os.path.join(model_dir, "infer_data", "frames"))


def test_steps_per_dispatch_trains(synthetic_step1_dir, tmp_path):
    """steps_per_dispatch=2: the production loop groups index batches
    into (K,B) blocks through make_resident_multi_step and still writes
    a restorable checkpoint. The 12-frame fixture at batch 4 gives 2-3
    batches/epoch -> exercises the block grouping incl. the tail-drop."""
    from calipsync_tpu.core import checkpoint as ckpt
    from calipsync_tpu.pipelines.step2_train import train_digital_model

    cfg = PipelineConfig(
        train=TrainConfig(batch_size=4, epochs=1, num_workers=2,
                          perceptual_weight=0.0, resident_data=True,
                          steps_per_dispatch=2),
        mesh=MeshConfig(data=4))
    path = train_digital_model(str(synthetic_step1_dir),
                               str(tmp_path / "ckpt"), cfg=cfg,
                               log_every=1)
    assert path and os.path.isdir(path)
    assert ckpt.latest_step(str(tmp_path / "ckpt")) == 1


def test_resident_max_bytes_valve(synthetic_step1_dir, tmp_path, capsys):
    """An oversized training crop store falls back to the streaming
    dataset instead of replicating into HBM (ADVICE r2) — mirroring
    FrameSynthesizer.preload_max_bytes — and training still completes."""
    from calipsync_tpu.pipelines.step2_train import train_digital_model

    cfg = PipelineConfig(
        train=TrainConfig(batch_size=4, epochs=1, num_workers=2,
                          perceptual_weight=0.0, resident_data=True,
                          resident_max_bytes=1024),
        mesh=MeshConfig(data=4))
    path = train_digital_model(str(synthetic_step1_dir),
                               str(tmp_path / "ckpt"), cfg=cfg,
                               log_every=0)
    assert path and os.path.isdir(path)
    assert "resident_max_bytes" in capsys.readouterr().out


def test_preemption_checkpoints_and_resumes(synthetic_step1_dir, tmp_path,
                                            monkeypatch, capsys):
    """A SIGTERM mid-epoch (simulated via the guard flag) checkpoints at
    the next batch boundary, keyed by the INCOMPLETE epoch, and a
    resume=True rerun finishes the full run."""
    from calipsync_tpu.core import checkpoint as ckpt
    from calipsync_tpu.pipelines import step2_train

    class _FakeGuard:
        """Trips after the Nth batch-boundary poll."""

        def __init__(self, after=1):
            self.polls, self.after = 0, after

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            pass

        @property
        def triggered(self):
            self.polls += 1
            return self.polls > self.after

    monkeypatch.setattr(ckpt, "PreemptionGuard", _FakeGuard)
    cfg = PipelineConfig(
        train=TrainConfig(batch_size=4, epochs=2, num_workers=2,
                          perceptual_weight=0.0),
        mesh=MeshConfig(data=4))
    save = str(tmp_path / "ckpt")
    path = step2_train.train_digital_model(str(synthetic_step1_dir), save,
                                           cfg=cfg, log_every=0)
    assert path and os.path.isdir(path)
    assert ckpt.latest_step(save) == 0  # epoch 0 incomplete -> key 0
    assert "preempted" in capsys.readouterr().out

    monkeypatch.undo()  # real (never-triggered) guard for the rerun
    step2_train.train_digital_model(str(synthetic_step1_dir), save,
                                    cfg=cfg, resume=True, log_every=0)
    assert ckpt.latest_step(save) == 2
