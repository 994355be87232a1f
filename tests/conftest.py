"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding (pjit/shard_map collectives, checkpoint resharding) is
tested without TPU hardware by forcing the host platform and splitting it
into 8 virtual devices, per SURVEY.md section 4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only PyTorch reference, for golden parity tests."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not available")
    return REFERENCE


@pytest.fixture(scope="session")
def reference_modules(reference_path):
    """Import the reference's torch modules (read-only, never copied)."""
    sys.path.insert(0, str(reference_path))
    try:
        import module.unet as ref_unet  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference modules: {e}")
    return ref_unet
