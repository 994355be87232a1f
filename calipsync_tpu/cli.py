"""Command-line interface for the CALipSync-TPU pipelines.

The reference documents a CLI (usage.md) whose scripts don't exist in its
repo; entry points are hard-coded ``__main__`` blocks
(/root/reference/all_pipeline.py:122-136). This is the real thing:

    python -m calipsync_tpu.cli step1  --video v.mp4 --out data/ ...
    python -m calipsync_tpu.cli train  --data data/ --save ckpt/ ...
    python -m calipsync_tpu.cli step3  --video v.mp4 --out assets/ ...
    python -m calipsync_tpu.cli infer  --assets assets/infer_data \\
        --ckpt ckpt/ --audio a.wav --out out.mp4
    python -m calipsync_tpu.cli clone  --video v.mp4 --out models/ ...
    python -m calipsync_tpu.cli cost   # compiled FLOPs/bytes of the model

Weight-directory layout matches the reference's
(utils/lip_detector/lip_detector.py:11-14): mean_face.txt, sfd_face.pth,
checkpoint_epoch_335.pth.tar.
"""

from __future__ import annotations

import argparse
import json
import os


def build_lip_detector(weights_dir: str, dtype=None,
                       detect_stride: int = 1):
    """Weights dir -> LipDetector. Detector priority mirrors the
    reference's (lip_detector.py:12-22, yolov8n-face active): a
    ``yolov8n_face_state_dict.pth`` (plain state_dict — dump once with
    ``YOLO(p).model.state_dict()`` where ultralytics exists) selects the
    native JAX YOLOv8-face; otherwise S3FD (``sfd_face.pth``)."""
    from calipsync_tpu.core.weights import load_torch_state_dict
    from calipsync_tpu.nn.pfld import fold_mobileone_params, import_pfld
    from calipsync_tpu.nn.s3fd import S3FDDetector, import_s3fd
    from calipsync_tpu.vision.lip_detector import (LipDetector,
                                                   load_mean_face)

    mean_face = load_mean_face(os.path.join(weights_dir, "mean_face.txt"))
    yolo_path = os.path.join(weights_dir, "yolov8n_face_state_dict.pth")
    if os.path.exists(yolo_path):
        from calipsync_tpu.nn.yolo import (YoloV8FaceDetector,
                                           import_yolov8_face)

        yolo_vars = import_yolov8_face(load_torch_state_dict(yolo_path))
        # batch the forward: each dispatch is a 20-40 ms tunnel round
        # trip, so per-frame (batch_size=1) detection would be RTT-bound
        # exactly like pre-batching S3FD was (PERF.md preprocess row)
        detector = YoloV8FaceDetector(yolo_vars, batch_size=16)
    else:
        s3fd_vars = import_s3fd(load_torch_state_dict(
            os.path.join(weights_dir, "sfd_face.pth")))
        detector = S3FDDetector(s3fd_vars, dtype=dtype)
    # the real landmark tar is keyed 'pfld_backbone'
    # (reference lip_detector.py:24-25); bare state_dicts pass through
    pfld_sd = load_torch_state_dict(
        os.path.join(weights_dir, "checkpoint_epoch_335.pth.tar"),
        key="pfld_backbone")
    pfld_vars = fold_mobileone_params(import_pfld(pfld_sd))
    return LipDetector(pfld_vars, mean_face, detector, dtype=dtype,
                       detect_stride=detect_stride)


def build_hubert(hubert_path: str, dtype=None, mesh_cfg=None):
    """HF checkpoint dir -> extractor; `mesh_cfg` (config.MeshConfig)
    with model > 1 shards the 315M-param HuBERT across that many chips,
    tensor-parallel (hubert_parallel='tp') or GPipe pipeline-parallel
    ('pp', core/pp.py) per the config."""
    from calipsync_tpu.audio.hubert_pipeline import load_hf_checkpoint

    mesh = None
    parallel = "tp"
    pp_microbatches = None
    if mesh_cfg is not None and mesh_cfg.model > 1:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        devices = jax.devices()
        if len(devices) < mesh_cfg.model:
            raise SystemExit(
                f"mesh.model={mesh_cfg.model} but only {len(devices)} "
                "devices visible")
        mesh = Mesh(np.asarray(devices[:mesh_cfg.model]),
                    (mesh_cfg.model_axis_name,))
        parallel = mesh_cfg.hubert_parallel
        pp_microbatches = mesh_cfg.pp_microbatches or None
    return load_hf_checkpoint(hubert_path, dtype=dtype, mesh=mesh,
                              model_axis=(mesh_cfg.model_axis_name
                                          if mesh_cfg else "model"),
                              parallel=parallel,
                              pp_microbatches=pp_microbatches)


def load_generator_variables(ckpt_path: str, cfg):
    """Torch .pth or Orbax checkpoint dir -> generator variables."""
    import jax

    from calipsync_tpu.core import checkpoint as ckpt
    from calipsync_tpu.core.weights import (import_generator,
                                            load_torch_state_dict)

    if os.path.isfile(ckpt_path):
        return import_generator(load_torch_state_dict(ckpt_path),
                                mode=cfg.model.mode,
                                n_blocks=cfg.model.n_blocks)
    # Orbax TrainState checkpoint
    from calipsync_tpu.train.trainer import (adam, build_model,
                                             create_train_state)

    model = build_model(cfg.model, axis_name=None)
    state = create_train_state(model, adam(cfg.train), jax.random.key(0))
    state = ckpt.restore_checkpoint(ckpt_path, state)
    return {"params": state.params, "batch_stats": state.batch_stats}


def _load_cfg(args):
    from calipsync_tpu.config import load_config

    return load_config(getattr(args, "config", None))


def cmd_step1(args):
    from calipsync_tpu.pipelines.step1_preprocess import TrainPreprocessor

    cfg = _load_cfg(args)
    pre = TrainPreprocessor(build_lip_detector(args.weights),
                            build_hubert(args.hubert, mesh_cfg=cfg.mesh),
                            crop=cfg.crop)
    out = pre.process_video(args.video, args.out, audio_path=args.audio)
    print(json.dumps(out))


def cmd_train(args):
    import dataclasses

    from calipsync_tpu.pipelines.step2_train import train_digital_model

    cfg = _load_cfg(args)
    scale = {k: v for k, v in (("grad_accum", args.grad_accum),
                               ("remat", args.remat),
                               ("zero1", args.zero1)) if v is not None}
    if scale:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **scale))
    path = train_digital_model(args.data, args.save, vgg_path=args.vgg,
                               unet_checkpoint=args.base, cfg=cfg,
                               resume=args.resume)
    print(path)


def cmd_step3(args):
    from calipsync_tpu.pipelines.step3_prepare import InferPreprocessor

    mask_gen = None
    if getattr(args, "xseg", None):
        from calipsync_tpu.vision.xseg import XSegMaskGenerator

        mask_gen = XSegMaskGenerator(model_path=args.xseg)
    pre = InferPreprocessor(
        build_lip_detector(args.weights,
                           detect_stride=args.detect_stride),
        mask_generator=mask_gen)
    out = pre.process_video(args.video, args.out)
    print(json.dumps(out))


def cmd_infer(args):
    import jax.numpy as jnp

    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.pipelines.inference import VideoStreamManager
    from calipsync_tpu.train.trainer import build_model

    cfg = _load_cfg(args)
    variables = load_generator_variables(args.ckpt, cfg)
    model = build_model(cfg.model, axis_name=None)
    synth = FrameSynthesizer(variables, args.assets, model=model,
                             batch_size=cfg.infer.batch_size,
                             crop=cfg.crop, seed=args.seed,
                             transfer_format=cfg.infer.transfer_format)
    mgr = VideoStreamManager(synth,
                             build_hubert(args.hubert, mesh_cfg=cfg.mesh),
                             fps=cfg.infer.fps,
                             pipelined=False if args.no_pipelined
                             else None)
    out = mgr.process_single_file(args.audio, args.out)
    print(json.dumps(out))


def cmd_clone(args):
    import dataclasses

    from calipsync_tpu.pipelines.all_pipeline import clone_video_local

    cfg = _load_cfg(args)
    # the clone recipe defaults to bf16 compute (CLONE_r05.json: same
    # holdout quality as fp32 at equal epochs, ~1.4x faster); the CLI
    # flag always wins for this command — pass --dtype float32 to
    # reproduce the reference's fp32 finetune exactly
    if getattr(args, "dtype", None):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, dtype=args.dtype))
    if getattr(args, "epochs", None):
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           epochs=args.epochs))
    weights_path, model_id = clone_video_local(
        args.video, args.out, build_lip_detector(args.weights),
        build_hubert(args.hubert, mesh_cfg=cfg.mesh), vgg_path=args.vgg,
        unet_checkpoint=args.base, cfg=cfg)
    print(json.dumps({"weights": weights_path, "model_id": model_id}))


def cmd_syncnet_train(args):
    """Train the SyncNet evaluator on a step1 dataset (the reference
    exposes this as module/syncnet.py:417-430's argparse main)."""
    from calipsync_tpu.train.syncnet_trainer import train_sync_net

    last = None
    for (batch_idx, total, epoch, epochs, loss, best,
         elapsed) in train_sync_net(
            args.save, args.data, mode=args.mode,
            batch_size=args.batch_size, lr=args.lr, epochs=args.epochs,
            base_last_model=args.base, seed=args.seed):
        last = (epoch, epochs, loss, best)
        if args.log_every and batch_idx % args.log_every == 0:
            print(f"epoch {epoch + 1}/{epochs} batch {batch_idx}/{total} "
                  f"loss {loss:.4f} best {best:.4f} ({elapsed:.0f}s)")
    if last is None:
        raise SystemExit("empty dataset")
    print(json.dumps({"save_dir": args.save, "epochs": last[1],
                      "final_loss": round(float(last[2]), 6),
                      "best_loss": round(float(last[3]), 6)}))


def cmd_featurize(args):
    """Audio file -> HuBERT feature rows .npy (the reference exposes this
    as utils/hubert.py:102-106's argparse main)."""
    import numpy as np

    ex = build_hubert(args.hubert, mesh_cfg=_load_cfg(args).mesh)
    feats = ex.extract_from_file(args.audio)
    np.save(args.out, feats)
    print(json.dumps({"out": args.out, "rows": int(feats.shape[0]),
                      "shape": list(feats.shape)}))


def cmd_cost(args):
    from calipsync_tpu.profiling import generator_cost

    print(json.dumps(generator_cost(batch=args.batch)["gflops"]))


def cmd_export_torch(args):
    """Export a generator checkpoint (Orbax dir or torch .pth) to the
    reference Model's torch state_dict layout — strict-loadable, so a
    TPU-trained generator serves on the reference's own stack."""
    from calipsync_tpu.core.weights_export import (export_generator,
                                                   save_torch_checkpoint)

    cfg = _load_cfg(args)
    variables = load_generator_variables(args.ckpt, cfg)
    sd = export_generator(variables, mode=cfg.model.mode,
                          n_blocks=cfg.model.n_blocks)
    save_torch_checkpoint(sd, args.out, wrap=args.wrap)
    print(json.dumps({"out": args.out, "keys": len(sd),
                      "mode": cfg.model.mode, "wrapped": bool(args.wrap)}))


def cmd_verify_weights(args):
    """Run every applicable importer over real checkpoint files and
    report key coverage + parameter counts (calipsync_tpu.verify_weights)."""
    from calipsync_tpu.verify_weights import verify_weights

    reports = verify_weights(
        weights_dir=args.weights_dir, generator=args.generator,
        generator_mode=args.mode, syncnet=args.syncnet,
        hubert=args.hubert, vgg=args.vgg,
        lpips_trunk=args.lpips_trunk, lpips_heads=args.lpips_heads)
    print(json.dumps(reports, indent=2))
    bad = [r for r in reports if r["status"] in ("error",
                                                 "unconsumed-keys")]
    raise SystemExit(1 if bad else 0)


def cmd_sync_score(args):
    """LSE-style lip-sync scoring of a generated video against its audio
    features (SyncNet offset scan, eval.sync_metrics)."""
    import cv2
    import numpy as np

    from calipsync_tpu.eval import sync_metrics

    if not args.lips_dir and not args.video:
        raise SystemExit("pass --video or --lips-dir")
    if args.lips_dir:
        import glob as _glob

        paths = sorted(_glob.glob(os.path.join(args.lips_dir, "*.jpg")))
        if args.max_frames:
            paths = paths[:args.max_frames]
        if not paths:
            raise SystemExit(f"no *.jpg crops in {args.lips_dir}")
        imgs = []
        for p in paths:
            img = cv2.imread(p)
            if img is None:
                raise SystemExit(f"unreadable image: {p}")
            imgs.append(cv2.resize(img, (160, 160)))
        crops = np.stack(imgs)
    else:
        cap = cv2.VideoCapture(args.video)
        frames = []
        while len(frames) < args.max_frames:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.resize(f, (160, 160)))
        cap.release()
        if not frames:
            raise SystemExit(f"no frames in {args.video}")
        crops = np.stack(frames)

    feats = np.load(args.features)
    variables = None
    if args.syncnet:
        from calipsync_tpu.core.weights import load_torch_state_dict
        from calipsync_tpu.nn.syncnet import import_syncnet

        variables = import_syncnet(load_torch_state_dict(args.syncnet),
                                   mode=args.mode)
    else:
        import jax
        import jax.numpy as jnp

        from calipsync_tpu.nn.syncnet import SyncNet

        variables = jax.jit(SyncNet(mode=args.mode).init)(
            jax.random.key(0), jnp.zeros((1, 160, 160, 3)),
            jnp.zeros((1, 32, 32, 32) if args.mode == "hubert"
                      else (1, 16, 32, 256)))
    report = sync_metrics(variables, crops, feats, mode=args.mode,
                          max_offset=args.max_offset)
    report["weights"] = args.syncnet or "random-init (relative scores only)"
    print(json.dumps(report, indent=2))


def cmd_eval(args):
    """Frame-wise PSNR (+ optional LPIPS) between two videos — the
    fidelity harness behind the PARITY artifacts, as a user surface."""
    import cv2
    import numpy as np

    from calipsync_tpu.eval import batch_psnr

    def read_frames(path, limit):
        cap = cv2.VideoCapture(path)
        frames = []
        while len(frames) < limit:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(f)
        cap.release()
        return frames

    fa = read_frames(args.a, args.max_frames)
    fb = read_frames(args.b, args.max_frames)
    n = min(len(fa), len(fb))
    if n == 0:
        raise SystemExit("no comparable frames")
    a = np.stack(fa[:n])
    b = np.stack(fb[:n])
    if a.shape != b.shape:
        raise SystemExit(f"shape mismatch: {a.shape} vs {b.shape}")
    scores = batch_psnr(a, b)

    def fin(x):  # bit-identical frames -> infinite PSNR -> null
        return round(float(x), 3) if np.isfinite(x) else None

    out = {"n_frames": n,
           "psnr_db_mean": fin(np.mean(scores)),
           "psnr_db_min": fin(np.min(scores))}
    if args.lpips:
        if not args.lpips_trunk:
            raise SystemExit("--lpips also needs --lpips-trunk "
                             "(torchvision vgg16/alexnet checkpoint)")
        from calipsync_tpu.core.weights import load_torch_state_dict
        from calipsync_tpu.eval import lpips_distance
        from calipsync_tpu.nn.lpips import import_lpips

        variables = import_lpips(
            load_torch_state_dict(args.lpips_trunk),
            load_torch_state_dict(args.lpips), net=args.lpips_net)
        # LPIPS weights are RGB-trained; cv2 frames are BGR
        ra, rb = a[..., ::-1], b[..., ::-1]
        chunk = 32
        d: list = []
        for s in range(0, n, chunk):
            xa, xb = ra[s:s + chunk], rb[s:s + chunk]
            m = len(xa)
            if m < chunk:  # pad to the compiled batch shape
                pad = np.zeros((chunk - m,) + xa.shape[1:], xa.dtype)
                xa = np.concatenate([xa, pad])
                xb = np.concatenate([xb, pad])
            d.extend(lpips_distance(variables, xa, xb,
                                    net=args.lpips_net)[:m])
        out["lpips_mean"] = round(float(np.mean(d)), 5)
        out["lpips_max"] = round(float(np.max(d)), 5)
    print(json.dumps(out))


def cmd_slice(args):
    from calipsync_tpu.audio.slicer import process_and_split_audio

    asr_fn = None
    if args.asr:
        from calipsync_tpu.audio.asr import load_hf_ctc_checkpoint

        asr_fn = load_hf_ctc_checkpoint(args.asr).as_asr_fn()
    segs = process_and_split_audio(args.audio, args.out,
                                   min_seconds=args.min_seconds,
                                   max_seconds=args.max_seconds,
                                   asr_fn=asr_fn)
    print(json.dumps({"segments": len(segs)}))


def cmd_serve(args):
    """Real-time streaming server: watches a directory for audio files.

    Drop ``<name>.wav`` into --watch to queue it (prefix ``danmu_`` for
    the high-priority queue); the avatar idles on silence otherwise.
    """
    import time

    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.metrics import get_logger, global_metrics
    from calipsync_tpu.serve.players import (FilePlayer, NullPlayer,
                                             RTMPPlayer, VirtualCamPlayer,
                                             WindowPlayer)
    from calipsync_tpu.serve.stream_manager import StreamingVideoManager
    from calipsync_tpu.train.trainer import build_model

    log = get_logger("calipsync.serve")
    cfg = _load_cfg(args)
    variables = load_generator_variables(args.ckpt, cfg)
    model = build_model(cfg.model, axis_name=None)
    synth = FrameSynthesizer(variables, args.assets, model=model,
                             batch_size=cfg.infer.batch_size, crop=cfg.crop,
                             transfer_format=cfg.infer.transfer_format,
                             first_batch_size=cfg.infer.first_window_batch)

    sample_rate = 24_000  # manager output rate; pegs the player clock
    kw = dict(fps=cfg.infer.fps, sample_rate=sample_rate)
    if args.player == "window":
        player = WindowPlayer(**kw)
    elif args.player == "rtmp":
        player = RTMPPlayer(args.rtmp_url, args.width, args.height, **kw)
    elif args.player == "file":
        player = FilePlayer(args.out or "stream.mp4", realtime=True, **kw)
    elif args.player == "virtualcam":
        player = VirtualCamPlayer(device=args.cam_device,
                                  width=args.width, height=args.height,
                                  **kw)
    else:
        player = NullPlayer(**kw)

    mgr = StreamingVideoManager(
        synth, build_hubert(args.hubert, mesh_cfg=cfg.mesh), player,
        buffer_threshold=int(cfg.infer.fps * cfg.infer.buffer_threshold_s),
        output_sample_rate=sample_rate, fps=cfg.infer.fps,
        is_interrupt=args.interrupt)
    log.info("warming up (compiling cold-path executables)...")
    mgr.warmup()
    mgr.start_playing()
    log.info("serving; drop .wav files into %s (danmu_* = priority)",
             args.watch)
    os.makedirs(args.watch, exist_ok=True)
    seen = set()
    try:
        while True:
            for f in sorted(os.listdir(args.watch)):
                if not f.endswith(".wav") or f in seen:
                    continue
                seen.add(f)
                queue = "danmu" if f.startswith("danmu_") else "normal"
                n = mgr.add_audio_to_queue(os.path.join(args.watch, f),
                                           queue_name=queue)
                log.info("queued %s -> %s (%d frames)", f, queue, n)
            time.sleep(0.2)
    except KeyboardInterrupt:
        log.info("stopping; metrics: %s", global_metrics().snapshot())
        mgr.stop_playing()
        if isinstance(player, FilePlayer) and player.frames:
            log.info("wrote %s", player.finalize())


def main(argv=None):
    p = argparse.ArgumentParser(prog="calipsync_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, *names):
        if "weights" in names:
            sp.add_argument("--weights", required=True,
                            help="lip-detector weights dir")
        if "hubert" in names:
            sp.add_argument("--hubert", required=True,
                            help="HF hubert checkpoint dir")
        sp.add_argument("--config", default=None, help="JSON config file")

    sp = sub.add_parser("step1", help="video -> training data")
    sp.add_argument("--video", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--audio", default=None, help="side-car wav")
    common(sp, "weights", "hubert")
    sp.set_defaults(fn=cmd_step1)

    sp = sub.add_parser("train", help="finetune the generator")
    sp.add_argument("--data", required=True)
    sp.add_argument("--save", required=True)
    sp.add_argument("--vgg", default=None)
    sp.add_argument("--base", default=None, help="warm-start checkpoint")
    sp.add_argument("--resume", action="store_true")
    sp.add_argument("--grad-accum", type=int, default=None,
                    help="microbatches per optimizer update (lax.scan "
                         "fwd/bwd, ONE Adam step)")
    # BooleanOptionalAction: --remat/--no-remat etc., so a switch enabled
    # by a --config file can still be turned OFF from the command line
    # (default None = "not specified", config value wins).
    sp.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="recompute generator activations in the "
                         "backward pass (jax.checkpoint)")
    sp.add_argument("--zero1", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="ZeRO-1: shard Adam moments 1/D per rank "
                         "(reduce_scatter grads, all_gather params)")
    common(sp)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("step3", help="video -> inference assets")
    sp.add_argument("--video", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--xseg", default=None,
                    help="optional xseg.onnx path: generate per-frame "
                         "compositing masks (reference ships this "
                         "disabled)")
    sp.add_argument("--detect-stride", type=int, default=1,
                    help="run face detection every Nth frame, reusing "
                         "boxes in between (PFLD still per-frame)")
    common(sp, "weights")
    sp.set_defaults(fn=cmd_step3)

    sp = sub.add_parser("infer", help="audio -> lip-synced video")
    sp.add_argument("--assets", required=True, help="infer_data dir")
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--audio", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--seed", type=int, default=None)
    sp.add_argument("--no-pipelined", action="store_true",
                    help="strict reference ordering: featurize the whole "
                         "clip before synthesizing (default overlaps "
                         "featurize/synthesize/encode)")
    common(sp, "hubert")
    sp.set_defaults(fn=cmd_infer)

    sp = sub.add_parser("clone", help="full video -> per-speaker model")
    sp.add_argument("--video", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--vgg", default=None)
    sp.add_argument("--base", default=None)
    sp.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="finetune compute dtype. bfloat16 is the "
                         "measured recipe: same quality per epoch as "
                         "fp32 at ~1.4x the step rate on the clone "
                         "pipeline's own data (CLONE_r05.json)")
    sp.add_argument("--epochs", type=int, default=None,
                    help="override TrainConfig.epochs (CLONE_r05's "
                         "curve: 40 closes the sync-similarity gap "
                         "0.9695 -> 0.9964 on the synthetic fixture)")
    common(sp, "weights", "hubert")
    sp.set_defaults(fn=cmd_clone)

    sp = sub.add_parser("serve", help="real-time streaming avatar")
    sp.add_argument("--assets", required=True, help="infer_data dir")
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--watch", default="serve_queue",
                    help="directory watched for .wav files")
    sp.add_argument("--player", default="window",
                    choices=["window", "rtmp", "file", "virtualcam",
                             "null"])
    sp.add_argument("--rtmp-url", default=None)
    sp.add_argument("--cam-device", default="/dev/video0",
                    help="v4l2loopback device for --player virtualcam")
    sp.add_argument("--out", default=None, help="file player output")
    sp.add_argument("--width", type=int, default=1080)
    sp.add_argument("--height", type=int, default=1920)
    sp.add_argument("--interrupt", action="store_true",
                    help="priority audio preempts mid-file")
    common(sp, "hubert")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("cost", help="compiled model cost analysis")
    sp.add_argument("--batch", type=int, default=1)
    sp.set_defaults(fn=cmd_cost)

    sp = sub.add_parser("export-torch",
                        help="generator checkpoint -> reference torch "
                             "state_dict .pth (train on TPU, serve on "
                             "the reference stack)")
    sp.add_argument("--ckpt", required=True,
                    help="Orbax checkpoint dir or torch .pth")
    sp.add_argument("--out", required=True, help=".pth output path")
    sp.add_argument("--config", default=None)
    sp.add_argument("--wrap", action="store_true",
                    help="wrap as {'state_dict': ...}")
    sp.set_defaults(fn=cmd_export_torch)

    sp = sub.add_parser("syncnet-train",
                        help="train the SyncNet evaluator on a step1 "
                             "dataset (reference module/syncnet.py main)")
    sp.add_argument("--data", required=True, help="step1 output dir")
    sp.add_argument("--save", required=True, help="checkpoint dir")
    sp.add_argument("--mode", default="hubert",
                    choices=["hubert", "wenet"])
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--lr", type=float, default=1e-3)
    sp.add_argument("--epochs", type=int, default=40)
    sp.add_argument("--base", default=None,
                    help="warm-start checkpoint dir")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--log-every", type=int, default=10)
    sp.set_defaults(fn=cmd_syncnet_train)

    sp = sub.add_parser("featurize",
                        help="audio file -> HuBERT feature rows .npy "
                             "(reference utils/hubert.py main)")
    sp.add_argument("--audio", required=True)
    sp.add_argument("--out", required=True, help=".npy output path")
    common(sp, "hubert")
    sp.set_defaults(fn=cmd_featurize)

    sp = sub.add_parser("eval",
                        help="frame-wise PSNR/LPIPS between two videos")
    sp.add_argument("--a", required=True)
    sp.add_argument("--b", required=True)
    sp.add_argument("--max-frames", type=int, default=250)
    sp.add_argument("--lpips", default=None,
                    help="lpips heads checkpoint (.pth) to add LPIPS")
    sp.add_argument("--lpips-trunk", default=None,
                    help="torchvision trunk checkpoint for LPIPS")
    sp.add_argument("--lpips-net", default="vgg", choices=["vgg", "alex"])
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser(
        "sync-score",
        help="LSE-style lip-sync score of a generated video vs its "
             "audio features (SyncNet offset scan)")
    sp.add_argument("--video", default=None,
                    help="generated mp4 (frames resized to 160x160)")
    sp.add_argument("--lips-dir", default=None,
                    help="directory of pre-cropped mouth jpgs "
                         "(step3 infer_data/lips_jpg) - preferred")
    sp.add_argument("--features", required=True,
                    help="aud_hu.npy HuBERT rows for the same audio")
    sp.add_argument("--syncnet", default=None,
                    help="trained SyncNet .pth (absent = random init, "
                         "relative scores only)")
    sp.add_argument("--mode", default="hubert",
                    choices=["hubert", "wenet"])
    sp.add_argument("--max-offset", type=int, default=15)
    sp.add_argument("--max-frames", type=int, default=500)
    sp.set_defaults(fn=cmd_sync_score)

    sp = sub.add_parser(
        "verify-weights",
        help="check real checkpoint files against every importer "
             "(key coverage, param counts)")
    sp.add_argument("--weights-dir", default=None,
                    help="reference weight-dir layout: mean_face.txt, "
                         "sfd_face.pth, checkpoint_epoch_335.pth.tar "
                         "[, yolov8n_face_state_dict.pth]")
    sp.add_argument("--generator", default=None, help="UNet .pth")
    sp.add_argument("--mode", default="hubert",
                    choices=["hubert", "wenet"])
    sp.add_argument("--syncnet", default=None, help="SyncNet .pth")
    sp.add_argument("--hubert", default=None, help="HF checkpoint dir")
    sp.add_argument("--vgg", default=None, help="torchvision vgg19 .pth")
    sp.add_argument("--lpips-trunk", default=None)
    sp.add_argument("--lpips-heads", default=None)
    sp.set_defaults(fn=cmd_verify_weights)

    sp = sub.add_parser(
        "slice", help="slice audio into 5-12 s speech segments "
                      "(reference get_srt stack; funasr -> JAX CTC ASR)")
    sp.add_argument("--audio", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--asr", default=None,
                    help="local HF Wav2Vec2ForCTC dir: transcribing "
                         "slicer (JAX CTC); energy-VAD fallback otherwise")
    sp.add_argument("--min-seconds", type=float, default=5.0)
    sp.add_argument("--max-seconds", type=float, default=12.0)
    sp.set_defaults(fn=cmd_slice)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
