"""SyncNet, audio slicer, video normalizer, export, profiling, CLI."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------- SyncNet ----------------

def test_syncnet_matches_reference(reference_path):
    import sys

    import torch

    sys.path.insert(0, str(reference_path))
    from module.syncnet import SyncNet_color

    from calipsync_tpu.nn.syncnet import SyncNet, import_syncnet

    ref = SyncNet_color("hubert").eval()
    torch.manual_seed(0)
    sd = ref.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.3
        elif not k.endswith("num_batches_tracked"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    ref.load_state_dict(sd)

    rng = np.random.default_rng(0)
    face = rng.random((2, 3, 160, 160), dtype=np.float32)
    audio = rng.random((2, 32, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref_a, ref_f = ref(torch.from_numpy(face), torch.from_numpy(audio))

    variables = import_syncnet(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    model = SyncNet(mode="hubert", pool="flatten")
    a, f = jax.jit(lambda v, x, y: model.apply(v, x, y, train=False))(
        variables, jnp.asarray(face.transpose(0, 2, 3, 1)),
        jnp.asarray(audio.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(a), ref_a.numpy(), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f), ref_f.numpy(), rtol=1e-3,
                               atol=1e-5)


def test_syncnet_param_count():
    """BASELINE.md: 26.34M params (verified)."""
    from calipsync_tpu.nn.syncnet import SyncNet

    model = SyncNet(mode="hubert")
    v = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 160, 160, 3)),
                            jnp.zeros((1, 32, 32, 32)))
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert abs(n - 26_340_000) / 26_340_000 < 0.01, n


def test_syncnet_trainer_steps(synthetic_step1_dir, tmp_path):
    from calipsync_tpu.train.syncnet_trainer import train_sync_net

    it = train_sync_net(str(tmp_path / "sync"), str(synthetic_step1_dir),
                        batch_size=4, epochs=1)
    seen = list(it)
    assert len(seen) == -(-25 // 4)  # n_batches
    _, total, e, epochs, loss, best, _ = seen[-1]
    assert np.isfinite(loss) and best <= loss + 1e-6
    assert os.path.isdir(tmp_path / "sync" / "best")
    assert os.path.isdir(tmp_path / "sync" / "last")


# ---------------- slicer / normalizer ----------------

def test_audio_slicer_vad(tmp_path):
    from calipsync_tpu.audio.io import save_wav
    from calipsync_tpu.audio.slicer import process_and_split_audio

    sr = 16_000
    rng = np.random.default_rng(0)
    # 14 s: speech (noise bursts) separated by silence
    audio = np.zeros(sr * 14, np.float32)
    for start in (1.0, 5.0, 9.0):
        s = int(start * sr)
        audio[s:s + sr * 3] = rng.standard_normal(sr * 3) * 0.3
    path = str(tmp_path / "long.wav")
    save_wav(path, audio, sr)

    segs = process_and_split_audio(path, str(tmp_path / "out"),
                                   min_seconds=5, max_seconds=12)
    assert len(segs) >= 1
    # reference grouping (slice_origin_audio.py:55-106): every speech
    # span lands in exactly one segment (the tail too, even if short);
    # segments never exceed target+last-sentence overhang.
    for i, (s, e, text) in enumerate(segs):
        assert e > s
        if i:
            assert s >= segs[i - 1][1]
        assert os.path.exists(tmp_path / "out" / f"{i}.wav")
        assert os.path.exists(tmp_path / "out" / f"{i}.txt")
    # full coverage: the three 3 s speech bursts all fall inside segments
    for burst_start in (1.0, 5.0, 9.0):
        mid = burst_start + 1.5
        assert any(s <= mid <= e for s, e, _ in segs)


def test_video_normalizer():
    from calipsync_tpu.vision.normalize import process_frame

    wide = np.zeros((720, 1920, 3), np.uint8)
    out = process_frame(wide)
    assert out.shape == (1280, 720, 3)
    tall = np.zeros((2000, 500, 3), np.uint8)
    assert process_frame(tall).shape == (1280, 720, 3)


# ---------------- export / profiling ----------------

def test_stablehlo_export_parity(tmp_path):
    from calipsync_tpu.export import check_export_parity

    def fn(w, x):
        return jnp.tanh(x @ w) * 2.0

    w = jnp.asarray(np.random.default_rng(0).random((8, 4), np.float32))
    x = jnp.asarray(np.random.default_rng(1).random((3, 8), np.float32))
    check_export_parity(fn, (w, x), tmp_path / "fn.stablehlo")


def test_stage_timer():
    from calipsync_tpu.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert "a:" in t.report()


def test_generator_cost_flops():
    from calipsync_tpu.profiling import generator_cost

    c = generator_cost(batch=1)
    # reference thop: 4.08 G MACs == ~8.2 GFLOPs (allow XLA fusion slack)
    assert 4.0 < c["gflops"] < 12.0, c["gflops"]


# ---------------- CLI ----------------

def test_cli_parses_all_subcommands():
    from calipsync_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["step1", "--help"])
    with pytest.raises(SystemExit):
        main([])  # missing subcommand


def test_cli_clone_recipe_flags(monkeypatch):
    """clone defaults to the measured bf16 recipe and threads
    --dtype/--epochs into the PipelineConfig it hands the orchestrator
    (CLONE_r05.json)."""
    import calipsync_tpu.cli as cli

    seen = {}

    def fake_clone(video, out, lip, hubert, vgg_path=None,
                   unet_checkpoint=None, cfg=None, **kw):
        seen["cfg"] = cfg
        return "/w", "mid"

    monkeypatch.setattr("calipsync_tpu.pipelines.all_pipeline."
                        "clone_video_local", fake_clone)
    monkeypatch.setattr(cli, "build_lip_detector", lambda *a, **k: None)
    monkeypatch.setattr(cli, "build_hubert", lambda *a, **k: None)

    cli.main(["clone", "--video", "v.mp4", "--out", "o",
             "--weights", "w", "--hubert", "h"])
    assert seen["cfg"].model.dtype == "bfloat16"
    assert seen["cfg"].train.epochs == 20  # TrainConfig default

    cli.main(["clone", "--video", "v.mp4", "--out", "o",
              "--weights", "w", "--hubert", "h",
              "--dtype", "float32", "--epochs", "40"])
    assert seen["cfg"].model.dtype == "float32"
    assert seen["cfg"].train.epochs == 40


def test_syncnet_wenet_matches_reference(reference_path):
    """SyncNet wenet mode (256-channel audio stack) at the parity bar."""
    import sys

    import torch

    sys.path.insert(0, str(reference_path))
    from module.syncnet import SyncNet_color

    from calipsync_tpu.nn.syncnet import SyncNet, import_syncnet

    ref = SyncNet_color("wenet").eval()
    sd = ref.state_dict()
    g = torch.Generator().manual_seed(2)
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.3
        elif not k.endswith("num_batches_tracked"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    ref.load_state_dict(sd)

    rng = np.random.default_rng(1)
    face = rng.random((2, 3, 160, 160), dtype=np.float32)
    audio = rng.random((2, 256, 16, 32), dtype=np.float32)
    with torch.no_grad():
        ref_a, ref_f = ref(torch.from_numpy(face), torch.from_numpy(audio))

    variables = import_syncnet(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        mode="wenet")
    model = SyncNet(mode="wenet", pool="flatten")
    a, f = jax.jit(lambda v, x, y: model.apply(v, x, y, train=False))(
        variables, jnp.asarray(face.transpose(0, 2, 3, 1)),
        jnp.asarray(audio.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(a), ref_a.numpy(), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f), ref_f.numpy(), rtol=1e-3,
                               atol=1e-5)


def test_cli_eval_psnr(tmp_path, capsys):
    """cli eval: frame-wise PSNR between two real video files."""
    import json

    import cv2

    from calipsync_tpu.cli import main

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    noisy = np.clip(base.astype(np.int16)
                    + rng.integers(-3, 4, base.shape), 0, 255
                    ).astype(np.uint8)
    paths = []
    for name, frames in (("a.mp4", base), ("b.mp4", noisy)):
        p = str(tmp_path / name)
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                             (64, 64))
        for f in frames:
            vw.write(f)
        vw.release()
        paths.append(p)

    main(["eval", "--a", paths[0], "--b", paths[1]])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_frames"] == 4
    assert 20.0 < out["psnr_db_mean"] < 60.0
    # self-comparison is perfect (mp4 decode is deterministic)
    main(["eval", "--a", paths[0], "--b", paths[0]])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["psnr_db_mean"] is None or out2["psnr_db_mean"] > 90.0


def test_cli_syncnet_train_and_featurize(synthetic_step1_dir, tmp_path,
                                         monkeypatch):
    """The reference's two argparse mains (module/syncnet.py:417-430,
    utils/hubert.py:102-106) exist as CLI commands."""
    from calipsync_tpu import cli

    class _StubExtractor:
        def extract_from_file(self, path):
            return np.zeros((6, 2, 1024), np.float32)

    monkeypatch.setattr(cli, "build_hubert",
                        lambda path, dtype=None, mesh_cfg=None:
                        _StubExtractor())
    out = tmp_path / "f.npy"
    cli.main(["featurize", "--audio", "x.wav", "--out", str(out),
              "--hubert", "dummy"])
    assert np.load(out).shape == (6, 2, 1024)

    save = tmp_path / "sync_cli"
    cli.main(["syncnet-train", "--data", str(synthetic_step1_dir),
              "--save", str(save), "--epochs", "1", "--batch-size", "4",
              "--log-every", "0"])
    assert (save / "last").is_dir()


def test_preemption_guard_signal_latch():
    """PreemptionGuard: first signal only sets the flag, second signal
    escalates to the previous handler, exit restores handlers."""
    import signal

    from calipsync_tpu.core.checkpoint import PreemptionGuard

    seen = []
    original = signal.signal(signal.SIGUSR1, lambda s, f: seen.append(s))
    try:
        with PreemptionGuard(signals=(signal.SIGUSR1,)) as g:
            assert g.triggered is False
            signal.raise_signal(signal.SIGUSR1)
            assert g.triggered is True
            assert seen == []           # first signal: flag only
            signal.raise_signal(signal.SIGUSR1)
            assert seen == [signal.SIGUSR1]  # second: previous handler
        handler = signal.getsignal(signal.SIGUSR1)
        assert handler is not signal.SIG_DFL  # restored, not dropped
    finally:
        signal.signal(signal.SIGUSR1, original)


def test_preemption_guard_noop_off_main_thread():
    import signal
    import threading

    from calipsync_tpu.core.checkpoint import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    result = {}

    def run():
        with PreemptionGuard() as g:
            result["triggered"] = g.triggered

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert result == {"triggered": False}
    assert signal.getsignal(signal.SIGTERM) is before
