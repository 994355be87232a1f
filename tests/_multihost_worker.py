"""Worker process for the 2-process multi-host (DCN) training test.

Launched by tests/test_multihost.py with CALIPSYNC_COORDINATOR /
CALIPSYNC_NUM_PROCESSES / CALIPSYNC_PROCESS_ID set: each process owns 4
virtual CPU devices; the hybrid (host=2, data=4) mesh spans both
processes, so the gradient/sync-BN pmean's host-axis hop crosses the
process boundary — exactly what DCN is on a real multi-host slice.

Prints one "RESULT {...json...}" line with per-step losses and a param
checksum, and saves an Orbax checkpoint (all processes participate).
"""

import json
import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from calipsync_tpu.core.mesh import (batch_axes, make_hybrid_mesh,
                                     maybe_initialize_distributed)

assert maybe_initialize_distributed(), "env-driven init must trigger"
assert jax.process_count() == 2

from calipsync_tpu.core.cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from calipsync_tpu.config import ModelConfig, TrainConfig
from calipsync_tpu.core.checkpoint import save_checkpoint
from calipsync_tpu.train.trainer import (adam, build_model,
                                         create_train_state,
                                         make_train_step)


def main():
    ckpt_dir = sys.argv[1]
    pid = jax.process_index()

    mesh = make_hybrid_mesh()
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"host": 2, "data": 4}
    axes = batch_axes(mesh)
    assert axes == ("host", "data")

    model = build_model(ModelConfig(), axis_name=axes)
    tx = adam(TrainConfig(lr=1e-3))
    state = create_train_state(model, tx, jax.random.key(0))

    # replicate the (deterministic, identical-across-processes) state
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), rep), state)

    step_fn = make_train_step(model, tx, mesh, TrainConfig(),
                              use_perceptual=False, axis_name=axes)

    rng = np.random.default_rng(0)
    global_batch = 8
    batch_np = {
        "ref": rng.integers(0, 256, (global_batch, 160, 160, 3),
                            dtype=np.uint8),
        "masked": rng.integers(0, 256, (global_batch, 160, 160, 3),
                               dtype=np.uint8),
        "target": rng.integers(0, 256, (global_batch, 160, 160, 3),
                               dtype=np.uint8),
        "index": np.arange(global_batch, dtype=np.int32),
    }
    feats_np = rng.standard_normal((16, 2, 1024)).astype(np.float32)

    bsh = NamedSharding(mesh, P(axes))
    half = global_batch // 2
    batch = {k: jax.make_array_from_process_local_data(
        bsh, v[pid * half:(pid + 1) * half]) for k, v in batch_np.items()}
    feats = jax.device_put(feats_np, rep)

    # On a 1-core host the two ranks' compiles serialize, so they can
    # reach the FIRST collective execution minutes apart — past Gloo's
    # 30 s context-init timeout. AOT-compile first (no cross-process
    # traffic), then rendezvous at a coordination-service barrier (long
    # timeout, no Gloo) so both ranks start executing together.
    step_fn.lower(state, batch, feats, {}).compile()
    from jax._src.distributed import global_state

    # 40 min: under full-suite CPU contention the two ranks' serialized
    # compiles have been observed to straddle a 20-min barrier.
    global_state.client.wait_at_barrier("worker_compiled",
                                        timeout_in_ms=2_400_000)

    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, batch, feats, {})
        losses.append(float(metrics["loss"]))

    checksum = float(jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)),
        out_shardings=rep)(state.params))

    # Orbax's first sync_global_devices allgathers through a FRESH Gloo
    # context whose KV rendezvous times out at 30 s; re-align the ranks
    # here so checksum-fetch skew (observed >30 s when external processes
    # starve one rank on this 1-core host) can't straddle that window.
    global_state.client.wait_at_barrier("worker_pre_save",
                                        timeout_in_ms=2_400_000)
    save_checkpoint(ckpt_dir, 3, {"params": state.params,
                                  "step": state.step})

    print("RESULT " + json.dumps({"pid": pid, "losses": losses,
                                  "checksum": checksum}), flush=True)

    # Rendezvous again BEFORE interpreter exit so the faster rank's
    # exit-time shutdown barrier can't time out against a lagging peer.
    global_state.client.wait_at_barrier("worker_done",
                                        timeout_in_ms=2_400_000)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
