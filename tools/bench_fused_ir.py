"""Fused-IR Pallas kernel vs flax/XLA block, per generator shape, on TPU.

Times every stride-1 inverted residual in the generator (serving shape,
bf16, batch STAGE_BATCH) both ways with the chained-in-jit methodology
(see tools/bench_kernels.py — block_until_ready acks at dispatch on this
remote runtime). Each pallas attempt is guarded: a Mosaic failure is
recorded and the sweep continues.

Run: python tools/bench_fused_ir.py        (writes JSON to stdout)
Env: STAGE_BATCH (128), STAGE_CHAIN (50), STAGE_REPS (3).
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

BATCH = int(os.environ.get("STAGE_BATCH", "128"))
CHAIN = int(os.environ.get("STAGE_CHAIN", "50"))
REPS = int(os.environ.get("STAGE_REPS", "3"))

# (name, H, W, Cin, features, residual) — expand_ratio is 2 everywhere.
SHAPES = [
    ("inc_ir", 160, 160, 6, 32, False),
    ("down1_ir2", 80, 80, 64, 64, True),
    ("down2_ir2", 40, 40, 128, 128, True),
    ("down3_ir2", 20, 20, 256, 256, True),
    ("down4_ir2", 10, 10, 512, 512, True),
    ("audio_ir", 32, 32, 64, 128, False),
    ("fuse1_ir1", 10, 10, 1024, 512, False),
    ("up1_ir1", 20, 20, 512, 128, False),
    ("up1_ir2", 20, 20, 128, 128, True),
    ("up2_ir1", 40, 40, 256, 64, False),
    ("up2_ir2", 40, 40, 64, 64, True),
    ("up3_ir1", 80, 80, 128, 32, False),
    ("up3_ir2", 80, 80, 32, 32, True),
    ("up4_ir1", 160, 160, 64, 32, False),
    ("up4_ir2", 160, 160, 32, 32, True),
]


def _scalar_rtt():
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda s: s + 1.0)
    s = jnp.float32(0)
    for _ in range(3):
        float(tiny(s))
    t0 = time.perf_counter()
    for _ in range(10):
        float(tiny(s))
    return (time.perf_counter() - t0) / 10 * 1e3


def _time_chained(fn, args, rtt):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(*args))
    total = (time.perf_counter() - t0) / REPS * 1e3
    return max((total - rtt) / CHAIN, 0.0)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.kernels.fused_ir import (fold_ir_params,
                                                fused_inverted_residual)
    from calipsync_tpu.nn.blocks import InvertedResidual

    enable_compile_cache()
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    rtt = _scalar_rtt()
    out = {"batch": BATCH, "chain": CHAIN, "rtt_ms": round(rtt, 2),
           "dtype": "bfloat16", "blocks": {}}
    total_xla = total_best = 0.0

    for name, h, w, cin, feat, res in SHAPES:
        x = jnp.asarray(rng.standard_normal((BATCH, h, w, cin)) * 0.1,
                        dtype)
        mod = InvertedResidual(feat, stride=1, use_res_connect=res,
                               expand_ratio=2, dtype=dtype)
        variables = jax.jit(mod.init)(jax.random.key(0),
                                      jnp.zeros((1, h, w, cin)))
        folded = fold_ir_params(variables["params"],
                                variables["batch_stats"])

        def chain(apply_fn):
            @jax.jit
            def f(x, *rest):
                def body(i, acc):
                    out = apply_fn(x + (acc * 1e-20).astype(x.dtype),
                                   *rest)
                    return acc + jnp.sum(out.astype(jnp.float32)) * 1e-10
                return lax.fori_loop(0, CHAIN, body, jnp.float32(0))
            return f

        entry = {}
        t_xla = _time_chained(
            chain(lambda xx: mod.apply(variables, xx, train=False)), (x,),
            rtt)
        entry["xla_ms"] = round(t_xla, 4)
        try:
            t_pal = _time_chained(
                chain(lambda xx, *fp: fused_inverted_residual(
                    xx, *fp, residual=res)), (x,) + tuple(folded), rtt)
            entry["pallas_ms"] = round(t_pal, 4)
            entry["speedup"] = round(t_xla / max(t_pal, 1e-9), 3)
        except Exception as e:  # Mosaic toolchain failures, keep sweeping
            entry["pallas_error"] = f"{type(e).__name__}: {e}"[:160]
            t_pal = t_xla
        out["blocks"][name] = entry
        total_xla += t_xla
        total_best += min(t_xla, t_pal)
        print(f"  {name}: xla {t_xla:.3f} ms, "
              f"{entry.get('pallas_ms', 'ERR')} pallas "
              f"({entry.get('speedup', '-')}x)", flush=True)

    out["sum_xla_ms"] = round(total_xla, 3)
    out["sum_best_ms"] = round(total_best, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
