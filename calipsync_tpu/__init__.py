"""calipsync_tpu: TPU-native single-speaker lip-sync framework.

JAX/XLA/Pallas rebuild of the CASync/CALipSync system (see README.md and
STATUS.md). Top-level conveniences re-export the main entry points; heavy
modules import lazily.
"""

__version__ = "0.1.0"

from calipsync_tpu.config import PipelineConfig, load_config  # noqa: F401


def __getattr__(name):
    """Lazy re-exports so `import calipsync_tpu` stays light."""
    lazy = {
        "Generator": ("calipsync_tpu.nn.unet", "Generator"),
        "HubertModel": ("calipsync_tpu.nn.hubert", "HubertModel"),
        "HubertFeatureExtractor": (
            "calipsync_tpu.audio.hubert_pipeline", "HubertFeatureExtractor"),
        "FrameSynthesizer": (
            "calipsync_tpu.infer.synthesizer", "FrameSynthesizer"),
        "StreamingVideoManager": (
            "calipsync_tpu.serve.stream_manager", "StreamingVideoManager"),
        "MultiStreamSynthesizer": (
            "calipsync_tpu.serve.multi_stream", "MultiStreamSynthesizer"),
        "LipDetector": ("calipsync_tpu.vision.lip_detector", "LipDetector"),
        "train_digital_model": (
            "calipsync_tpu.pipelines.step2_train", "train_digital_model"),
        "clone_video_local": (
            "calipsync_tpu.pipelines.all_pipeline", "clone_video_local"),
        "YoloV8FaceDetector": (
            "calipsync_tpu.nn.yolo", "YoloV8FaceDetector"),
        "S3FDDetector": ("calipsync_tpu.nn.s3fd", "S3FDDetector"),
        "CTCRecognizer": ("calipsync_tpu.audio.asr", "CTCRecognizer"),
        "XSegMaskGenerator": (
            "calipsync_tpu.vision.xseg", "XSegMaskGenerator"),
        "LPIPS": ("calipsync_tpu.nn.lpips", "LPIPS"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'calipsync_tpu' has no attribute {name!r}")
