"""Multi-host (DCN) training: hybrid mesh, 2-process run, ckpt reshard.

SURVEY.md section 5 requires ICI to carry intra-slice collectives and DCN
the inter-host axis. Without multi-host hardware this is proven the JAX
way: (a) the hybrid (host, data) mesh + tuple-axis trainer run
single-process on 8 virtual devices split 2x4, matching the flat 1-D DP
run bit-for-bit in loss; (b) a REAL 2-process run (subprocess launcher,
gloo CPU collectives, gradient pmean crossing the process boundary) trains
identically on both ranks and its multi-process Orbax checkpoint restores
+ reshards into a single-process mesh.
"""

import json
import os
import pathlib
import shutil
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from calipsync_tpu.config import ModelConfig, TrainConfig
from calipsync_tpu.core.mesh import (batch_axes, make_hybrid_mesh, make_mesh)
from calipsync_tpu.train.trainer import (adam, build_model,
                                         create_train_state, make_train_step)

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]


def _mk_batch(rng, n):
    return {
        "ref": rng.integers(0, 256, (n, 160, 160, 3), dtype=np.uint8),
        "masked": rng.integers(0, 256, (n, 160, 160, 3), dtype=np.uint8),
        "target": rng.integers(0, 256, (n, 160, 160, 3), dtype=np.uint8),
        "index": np.arange(n, dtype=np.int32),
    }


def _run_steps(mesh, axis_name, n_steps=2):
    model = build_model(ModelConfig(), axis_name=axis_name)
    tx = adam(TrainConfig(lr=1e-3))
    state = create_train_state(model, tx, jax.random.key(0))
    step_fn = make_train_step(model, tx, mesh, TrainConfig(),
                              use_perceptual=False, axis_name=axis_name)
    rng = np.random.default_rng(0)
    batch = _mk_batch(rng, 8)
    feats = rng.standard_normal((16, 2, 1024)).astype(np.float32)
    losses = []
    for _ in range(n_steps):
        state, metrics = step_fn(state, batch, feats, {})
        losses.append(float(metrics["loss"]))
    return losses, state


def test_hybrid_mesh_matches_flat_dp():
    """(host=2, data=4) hybrid mesh == flat 8-device DP: same global batch,
    same losses (pmean over both axes is the same global mean)."""
    losses_flat, _ = _run_steps(make_mesh(), "data")
    hybrid = make_hybrid_mesh(dcn=2, data=4)
    assert batch_axes(hybrid) == ("host", "data")
    losses_hybrid, _ = _run_steps(hybrid, ("host", "data"))
    np.testing.assert_allclose(losses_hybrid, losses_flat,
                               rtol=1e-5, atol=1e-7)


def test_two_process_dcn_training_and_checkpoint_reshard(tmp_path):
    """Launch 2 real processes (4 virtual devices each) via the env-driven
    jax.distributed init; both ranks must see identical pmean'd losses and
    the multi-process checkpoint must restore into this (single-process,
    8-device) session with resharding."""
    def launch(ckpt_dir):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.update({
                "CALIPSYNC_COORDINATOR": f"localhost:{port}",
                "CALIPSYNC_NUM_PROCESSES": "2",
                "CALIPSYNC_PROCESS_ID": str(pid),
                # full-suite contention can hold one worker's imports
                # past jax.distributed's default 300 s join window
                "CALIPSYNC_DIST_TIMEOUT_S": "1800",
            })
            procs.append(subprocess.Popen(
                [sys.executable,
                 str(REPO_ROOT / "tests" / "_multihost_worker.py"),
                 str(ckpt_dir)],
                env=env, cwd=str(REPO_ROOT), stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        results = {}
        logs = {}
        for pid, p in enumerate(procs):
            out, _ = p.communicate(timeout=2700)
            logs[pid] = out
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    results[pid] = json.loads(line[len("RESULT "):])
        ok = (all(p.returncode == 0 for p in procs)
              and set(results) == {0, 1})
        return ok, results, logs

    # One retry: on this 1-core host the jax.distributed coordinator
    # barrier can time a worker out when the first attempt lands behind
    # a cold compile (observed once in a full-suite run; passes alone).
    ckpt_dir = tmp_path / "ckpt"
    ok, results, logs = launch(ckpt_dir)
    if not ok:
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        ok, results, logs = launch(ckpt_dir)
    assert ok, (f"workers failed twice:\n{logs.get(0, '')[-6000:]}\n---\n"
                f"{logs.get(1, '')[-6000:]}")

    # pmean crosses the process boundary: both ranks see the global loss
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(results[0]["checksum"],
                               results[1]["checksum"], rtol=1e-6)
    assert results[0]["losses"][-1] < results[0]["losses"][0]

    # restore the 2-process checkpoint into THIS single process, resharded
    # onto a flat 8-device mesh
    from calipsync_tpu.core.checkpoint import restore_checkpoint

    model = build_model(ModelConfig(), axis_name="data")
    tx = adam(TrainConfig())
    template_state = create_train_state(model, tx, jax.random.key(0))
    mesh = make_mesh()
    restored = restore_checkpoint(
        ckpt_dir, {"params": template_state.params,
                   "step": template_state.step},
        sharding=NamedSharding(mesh, P()))
    assert int(restored["step"]) == 3
    checksum = float(sum(jnp.sum(jnp.abs(x))
                         for x in jax.tree.leaves(restored["params"])))
    np.testing.assert_allclose(checksum, results[0]["checksum"], rtol=1e-6)


def test_build_mesh_dispatches_on_config():
    """build_mesh: dcn=1 -> 1-D (data,) mesh; dcn>1 -> hybrid (host,
    data) even single-process (8 local devices split into 2x4), so the
    MeshConfig knob actually changes the production mesh."""
    import jax

    from calipsync_tpu.config import MeshConfig
    from calipsync_tpu.core.mesh import batch_axes, build_mesh

    flat = build_mesh(MeshConfig())
    assert flat.axis_names == ("data",)
    assert batch_axes(flat) == "data"

    if len(jax.devices()) >= 8:
        hybrid = build_mesh(MeshConfig(data=4, dcn=2))
        assert hybrid.axis_names == ("host", "data")
        assert dict(zip(hybrid.axis_names, hybrid.devices.shape)) == \
            {"host": 2, "data": 4}
        assert batch_axes(hybrid) == ("host", "data")
