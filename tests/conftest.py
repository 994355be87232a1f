"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding (pjit/shard_map collectives, checkpoint resharding) is
tested without TPU hardware by forcing the host platform and splitting it
into 8 virtual devices, per SURVEY.md section 4.
"""

import os

# NOTE: jax is already imported at interpreter start by the environment's
# sitecustomize (TPU plugin registration), so env vars alone are too late;
# the runtime config update below does the actual platform forcing.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

# Persistent compile cache: the generator graph takes ~20s to compile on the
# virtual-device CPU backend; cache it across test runs.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(REPO_ROOT / ".cache" / "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE = pathlib.Path("/root/reference")

# Test tiers (VERDICT r2 item: the full suite takes ~1 h on this 1-core
# host). Modules that build torch reference twins, run multi-process
# launchers, train, or compile many executables are marked `heavy`;
# `pytest -m "not heavy"` is the fast tier for iteration, the full run
# stays the merge gate.
HEAVY_TEST_MODULES = {
    "test_composed_parity.py", "test_unet_parity.py", "test_hubert.py",
    "test_s3fd.py", "test_pfld.py", "test_yolo.py", "test_lpips.py",
    "test_tp.py", "test_multihost.py", "test_pipelines_e2e.py",
    "test_train_step.py", "test_train_scale.py", "test_kernels.py",
    "test_multi_stream.py", "test_synthesizer.py",
    "test_weights_export.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        if fname in HEAVY_TEST_MODULES:
            item.add_marker(pytest.mark.heavy)


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only PyTorch reference, for golden parity tests."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not available")
    return REFERENCE


@pytest.fixture(scope="session")
def synthetic_step1_dir(tmp_path_factory):
    """A tiny synthetic step1 output directory (the reference's example clip
    was stripped from the snapshot — SURVEY.md section 6), with plausible
    geometry: valid mouth bboxes and a convex 33-point face polygon."""
    import cv2
    import numpy as np

    root = tmp_path_factory.mktemp("step1_data")
    (root / "full_body_img").mkdir()
    (root / "landmarks").mkdir()
    rng = np.random.default_rng(42)
    n_frames = 12
    H = W = 480
    for i in range(n_frames):
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "full_body_img" / f"{i}.jpg"),
                    img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        lms = np.zeros((110, 2), dtype=np.int64)
        xmin = 120 + int(rng.integers(-8, 8))
        width = 180 + int(rng.integers(-10, 10))
        xmax = xmin + width
        ymin = 200 + int(rng.integers(-8, 8))
        # 33-point face outline polygon (used by the paste-back compositor)
        theta = np.linspace(0, 2 * np.pi, 33, endpoint=False)
        cx, cy = (xmin + xmax) // 2, ymin + width // 2
        lms[:33, 0] = (cx + 0.45 * width * np.cos(theta)).astype(np.int64)
        lms[:33, 1] = (cy + 0.45 * width * np.sin(theta)).astype(np.int64)
        lms[33:] = rng.integers(xmin, xmax, (77, 2))
        lms[1] = (xmin, cy)
        lms[31] = (xmax, cy)
        lms[52] = (cx, ymin)
        np.savetxt(str(root / "landmarks" / f"{i}.lms"), lms, fmt="%d")
    feats = rng.standard_normal((26, 2, 1024)).astype(np.float32)
    np.save(str(root / "aud_hu.npy"), feats)
    return root


@pytest.fixture(scope="session")
def synthetic_step3_dir(synthetic_step1_dir, tmp_path_factory):
    """Mirror of the step1 fixture in the step3 infer_data layout."""
    import shutil

    import numpy as np

    root = tmp_path_factory.mktemp("step3_data")
    infer = root / "infer_data"
    for d in ("frames", "positions", "lips_jpg", "masks"):
        (infer / d).mkdir(parents=True)
    src_imgs = sorted((synthetic_step1_dir / "full_body_img").glob("*.jpg"),
                      key=lambda p: int(p.stem))
    for i, img in enumerate(src_imgs):
        n = str(i).zfill(6)
        shutil.copy(img, infer / "frames" / f"{n}.jpg")
        lms = np.loadtxt(synthetic_step1_dir / "landmarks" / f"{i}.lms")
        np.savetxt(str(infer / "positions" / f"{n}.txt"), lms)
    return infer


@pytest.fixture(scope="session")
def reference_modules(reference_path):
    """Import the reference's torch modules (read-only, never copied)."""
    sys.path.insert(0, str(reference_path))
    try:
        import module.unet as ref_unet  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference modules: {e}")
    return ref_unet
