"""Measure Pallas kernels vs XLA on the real TPU (VERDICT r1 item 2).

Measurement methodology (this matters on the axon tunnel): on this
runtime `block_until_ready` returns at dispatch-ack, NOT at execution
completion, so naive timing measures tunnel latency (~25-30 ms/call) or
nothing at all. Every number here is produced by chaining N dependent
calls inside ONE jitted `lax.fori_loop` whose carried scalar depends on
each iteration's full output, then fetching that scalar to host (a real
d2h dependency). per-call = (total - scalar_rtt) / N.

Numbers produced (JSON to stdout):
  - attention op (B,100,64/512): xla vs pallas, serve (B=128, bf16) and
    train (B=16, fp32) shapes.
  - depthwise3x3 op: xla vs pallas (v1 manual-DMA and, if present, v2
    plain-BlockSpec), generator layer shapes.
  - full generator forward: attn_impl=xla vs pallas, serve + train
    configs.

Run: python tools/bench_kernels.py   (on the axon TPU; uses compile cache)
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

CHAIN = 20          # full-model chain
OP_CHAIN = 200      # op-level chain (ops are ~30us; rtt is ~30ms)
REPS = 3


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


def _loop_ms(fn, args, rtt, chain=CHAIN, reps=REPS):
    """fn is a jitted callable returning a scalar that depends on `chain`
    sequential applications of the op; returns per-call ms."""
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    total = (time.perf_counter() - t0) / reps * 1e3
    return (total - rtt) / chain


def bench_attention(results, rtt):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from calipsync_tpu.kernels.cross_attention import (_attention_reference,
                                                       cross_attention)

    for batch, dtype, tag in ((128, jnp.bfloat16, "serve_b128_bf16"),
                              (16, jnp.float32, "train_b16_fp32")):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((batch, 100, 64)), dtype)
        k = jnp.asarray(rng.standard_normal((batch, 100, 64)), dtype)
        v = jnp.asarray(rng.standard_normal((batch, 100, 512)), dtype)

        def chained(impl):
            @jax.jit
            def f(q, k, v):
                def body(i, acc):
                    out = impl(q, k, v + (acc * 1e-20).astype(v.dtype))
                    return acc + jnp.sum(out.astype(jnp.float32)) * 1e-10
                return lax.fori_loop(0, OP_CHAIN, body, jnp.float32(0))
            return f

        t_xla = _loop_ms(chained(_attention_reference), (q, k, v), rtt,
                         chain=OP_CHAIN)
        t_pal = _loop_ms(chained(cross_attention), (q, k, v), rtt,
                         chain=OP_CHAIN)
        results[f"attention_{tag}"] = {
            "xla_ms_per_call": round(t_xla, 4),
            "pallas_ms_per_call": round(t_pal, 4),
            "pallas_speedup": round(t_xla / t_pal, 3),
        }


def bench_depthwise(results, rtt):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import calipsync_tpu.kernels.depthwise as dw

    impls = [("xla", dw.depthwise3x3_reference), ("pallas", dw.depthwise3x3)]
    if hasattr(dw, "depthwise3x3_blocked"):
        impls.append(("pallas_v2", dw.depthwise3x3_blocked))

    shapes = ((128, 160, 160, 32), (128, 40, 40, 128), (128, 10, 10, 512))
    for b, h, w, c in shapes:
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
        kern = jnp.asarray(rng.standard_normal((3, 3, c)), jnp.bfloat16)
        s = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        def chained(impl):
            @jax.jit
            def f(x, kern, s, bias):
                def body(i, carry):
                    acc, cur = carry
                    cur = impl(cur, kern, s, bias)
                    return acc + jnp.sum(cur.astype(jnp.float32)) * 1e-10, cur
                acc, _ = lax.fori_loop(0, OP_CHAIN, body,
                                       (jnp.float32(0), x))
                return acc
            return f

        key = f"dw_{b}x{h}x{w}x{c}"
        entry = {}
        for name, impl in impls:
            try:
                t = _loop_ms(chained(impl), (x, kern, s, bias), rtt,
                             chain=OP_CHAIN)
                entry[f"{name}_ms_per_call"] = round(t, 4)
            except Exception as e:
                entry[f"{name}_error"] = f"{type(e).__name__}: {e}"[:160]
        if "xla_ms_per_call" in entry:
            for name, _ in impls[1:]:
                if f"{name}_ms_per_call" in entry:
                    entry[f"{name}_speedup"] = round(
                        entry["xla_ms_per_call"] /
                        entry[f"{name}_ms_per_call"], 3)
        results[key] = entry


def bench_full_model(results, rtt):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from calipsync_tpu.nn.unet import Generator

    rng = np.random.default_rng(2)
    for batch, dtype, tag in ((128, jnp.bfloat16, "serve_b128_bf16"),
                              (16, jnp.float32, "train_b16_fp32")):
        x = jnp.asarray(rng.random((batch, 160, 160, 6)), dtype)
        a = jnp.asarray(rng.standard_normal((batch, 32, 32, 32)), dtype)
        variables = jax.jit(Generator(dtype=dtype).init)(
            jax.random.key(0), jnp.zeros((1, 160, 160, 6)),
            jnp.zeros((1, 32, 32, 32)))
        entry = {}
        for impl in ("xla", "pallas"):
            model = Generator(dtype=dtype, attn_impl=impl)

            @jax.jit
            def f(v, x, a, m=model):
                def body(i, acc):
                    out = m.apply(
                        v, x, a + (acc * 1e-20).astype(a.dtype),
                        train=False)
                    return acc + jnp.sum(out.astype(jnp.float32)) * 1e-10
                return lax.fori_loop(0, CHAIN, body, jnp.float32(0))

            try:
                entry[f"{impl}_ms"] = round(
                    _loop_ms(f, (variables, x, a), rtt), 3)
            except Exception as e:
                entry[f"{impl}_error"] = f"{type(e).__name__}: {e}"[:160]
        if "xla_ms" in entry and "pallas_ms" in entry:
            entry["pallas_speedup"] = round(
                entry["xla_ms"] / entry["pallas_ms"], 3)
            entry["fps_xla"] = round(batch / entry["xla_ms"] * 1e3, 1)
            entry["fps_pallas"] = round(batch / entry["pallas_ms"] * 1e3, 1)
        results[f"model_{tag}"] = entry


def main():
    from calipsync_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    results = {}
    import jax

    results["platform"] = jax.devices()[0].platform
    results["scalar_fetch_rtt_ms"] = round(_scalar_rtt(), 2)
    rtt = results["scalar_fetch_rtt_ms"]
    bench_attention(results, rtt)
    bench_depthwise(results, rtt)
    bench_full_model(results, rtt)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
