"""Per-stage timing bisect of the generator forward on the real TPU.

Answers "where do the ~0.18 ms/frame of compute-only serving time go?"
by timing every architectural stage of the generator (encoder downs,
audio encoder, fusion, attention stack, fuse convs, decoder ups, output
head) as an isolated chained-in-jit region at the serving shape, plus
the resident-store preamble (gather + normalize + mask + concat) and the
yuv420 pack epilogue, plus full-forward batch scaling (64/128/256).

Methodology matches tools/bench_kernels.py: on the axon tunnel,
`block_until_ready` acks at dispatch, so each stage is timed as N
data-dependent applications inside ONE jitted `lax.fori_loop` whose
carried scalar the host then fetches; per-call = (total - rtt) / N.
Isolated stages lose cross-stage fusion, so the sum of stages is
reported next to the measured full forward as a sanity line.

Run: python tools/bench_model_stages.py   (axon TPU; compile cache on)
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


def _time_chained(fn, args, rtt, chain=CHAIN, reps=REPS):
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    total = (time.perf_counter() - t0) / reps * 1e3
    return max((total - rtt) / chain, 0.0)


def _chain_apply(apply_fn, perturb_idx=0):
    """Build a jitted fn(*args) -> scalar running `apply_fn` CHAIN times,
    each iteration data-dependent on the last via a tiny perturbation of
    args[perturb_idx]."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def f(*args):
        def body(i, acc):
            a = list(args)
            x = a[perturb_idx]
            a[perturb_idx] = x + (acc * 1e-20).astype(x.dtype)
            out = apply_fn(*a)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-10
        return lax.fori_loop(0, CHAIN, body, jnp.float32(0))

    return f


def main():
    import flax.linen as fnn
    import jax
    import jax.numpy as jnp

    from calipsync_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from calipsync_tpu.config import CropConfig
    from calipsync_tpu.nn.blocks import (BatchNorm, DoubleConvDW, Down,
                                         InConvDw, OutConv, Up, leaky_relu)
    from calipsync_tpu.nn.unet import (AttentionBlock, AudioConvHubert,
                                       Generator, MLPFusion)

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    rtt = _scalar_rtt()
    out = {"batch": BATCH, "chain": CHAIN, "rtt_ms": round(rtt, 2),
           "dtype": "bfloat16", "stages_ms": {}}

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, dtype)

    def run_module(name, module, args, perturb_idx=0, train_flag=True):
        init_args = [jnp.zeros(a.shape, a.dtype) for a in args]
        variables = jax.jit(module.init)(jax.random.key(0), *init_args)
        if train_flag:
            apply_fn = lambda *a: module.apply(variables, *a, train=False)
        else:
            apply_fn = lambda *a: module.apply(variables, *a)
        f = _chain_apply(apply_fn, perturb_idx)
        ms = _time_chained(f, args, rtt)
        out["stages_ms"][name] = round(ms, 4)
        print(f"  {name}: {ms:.4f} ms", flush=True)

    B = BATCH
    # --- encoder ---
    run_module("inc_160x6->32", InConvDw(32, dtype=dtype),
               [arr(B, 160, 160, 6)])
    run_module("down1_160x32->80x64", Down(64, dtype=dtype),
               [arr(B, 160, 160, 32)])
    run_module("down2_80x64->40x128", Down(128, dtype=dtype),
               [arr(B, 80, 80, 64)])
    run_module("down3_40x128->20x256", Down(256, dtype=dtype),
               [arr(B, 40, 40, 128)])
    run_module("down4_20x256->10x512", Down(512, dtype=dtype),
               [arr(B, 20, 20, 256)])

    # --- audio encoder ---
    run_module("audio_hubert_32x32x32->10x512",
               AudioConvHubert(dtype=dtype), [arr(B, 32, 32, 32)])

    # --- fusion (concat + MLPFusion + residual + BN, as in Generator) ---
    class _Fusion(fnn.Module):
        @fnn.compact
        def __call__(self, x5, af, train=False):
            tx = jnp.concatenate([x5, af], axis=-1)
            fused = MLPFusion(1024, 1024, dtype=dtype,
                              name="mlp_fusion")(x5, af, train)
            tx = tx + fused
            tx = BatchNorm(use_running_average=not train, dtype=dtype,
                           name="bn_tx")(tx)
            return tx

    run_module("fusion_mlp+bn", _Fusion(),
               [arr(B, 10, 10, 512), arr(B, 10, 10, 512)])

    # --- attention stack (4 blocks + dense residual + bn + lrelu) ---
    class _AttnStack(fnn.Module):
        @fnn.compact
        def __call__(self, tx, af, train=False):
            ox = tx
            kx = tx
            for i in range(4):
                ox = AttentionBlock(512, 1024, dtype=dtype,
                                    name=f"attention_blocks_{i}")(
                    ox, af, tx, train)
                kx = ox + kx
            kx = BatchNorm(use_running_average=not train, dtype=dtype,
                           name="bn_kx")(kx)
            return leaky_relu(kx)

    run_module("attn_stack_4x_10x1024",
               _AttnStack(), [arr(B, 10, 10, 1024), arr(B, 10, 10, 512)])

    # --- fuse convs ---
    run_module("fuse_conv1_10x1024->512",
               DoubleConvDW(512, stride=1, dtype=dtype),
               [arr(B, 10, 10, 1024)])
    run_module("fuse_conv2_10x512->256",
               DoubleConvDW(256, stride=1, dtype=dtype),
               [arr(B, 10, 10, 512)])

    # --- decoder ---
    run_module("up1_10x256+20x256->128", Up(128, dtype=dtype),
               [arr(B, 10, 10, 256), arr(B, 20, 20, 256)])
    run_module("up2_20x128+40x128->64", Up(64, dtype=dtype),
               [arr(B, 20, 20, 128), arr(B, 40, 40, 128)])
    run_module("up3_40x64+80x64->32", Up(32, dtype=dtype),
               [arr(B, 40, 40, 64), arr(B, 80, 80, 64)])
    run_module("up4_80x32+160x32->32", Up(32, dtype=dtype),
               [arr(B, 80, 80, 32), arr(B, 160, 160, 32)])

    # --- output head ---
    class _Head(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            o = OutConv(3, dtype=dtype, name="outc")(x)
            o = BatchNorm(use_running_average=not train, dtype=dtype,
                          name="outc_bn")(o)
            return jax.nn.sigmoid(o.astype(jnp.float32))

    run_module("outc+bn+sigmoid", _Head(), [arr(B, 160, 160, 32)])

    # --- resident preamble + pack epilogue (serving wrapper overheads) ---
    crop = CropConfig()
    size = crop.size
    store = jnp.asarray(rng.integers(0, 255, (1000, size * size * 3)),
                        jnp.uint8)
    y0, y1 = crop.mask_y, crop.mask_y + crop.mask_h
    x0, x1 = crop.mask_x, crop.mask_x + crop.mask_w

    def preamble(idx_f, store):
        idx = idx_f.astype(jnp.int32) % 1000
        ref = jnp.take(store, idx, axis=0)
        ref = ref.reshape(-1, size, size, 3).astype(dtype) / 255.0
        masked = ref.at[:, y0:y1, x0:x1, :].set(0.0)
        return jnp.concatenate([ref, masked], axis=-1)

    f = _chain_apply(preamble, 0)
    ms = _time_chained(f, (jnp.arange(B, dtype=jnp.float32), store), rtt)
    out["stages_ms"]["preamble_gather+mask"] = round(ms, 4)
    print(f"  preamble: {ms:.4f} ms", flush=True)

    from calipsync_tpu.infer.synthesizer import _pack_pred

    f = _chain_apply(lambda p: _pack_pred(jax.nn.sigmoid(p), "yuv420"), 0)
    ms = _time_chained(f, (arr(B, size, size, 3).astype(jnp.float32),), rtt)
    out["stages_ms"]["pack_yuv420"] = round(ms, 4)
    print(f"  pack_yuv420: {ms:.4f} ms", flush=True)

    out["sum_stages_ms"] = round(sum(out["stages_ms"].values()), 3)

    # --- full forward at several batches ---
    out["full_ms"] = {}
    for b in (64, 128, 256):
        x = arr(b, 160, 160, 6)
        a = arr(b, 32, 32, 32)
        model = Generator(dtype=dtype)
        variables = jax.jit(model.init)(jax.random.key(0),
                                        jnp.zeros((1, 160, 160, 6)),
                                        jnp.zeros((1, 32, 32, 32)))
        f = _chain_apply(
            lambda v, xx, aa: model.apply(v, xx, aa, train=False), 1)
        ms = _time_chained(f, (variables, x, a), rtt,
                           chain=CHAIN, reps=REPS)
        out["full_ms"][f"b{b}"] = round(ms, 3)
        out["full_ms"][f"b{b}_fps"] = round(b / ms * 1e3, 1)
        print(f"  full b{b}: {ms:.3f} ms ({b / ms * 1e3:.0f} fps)",
              flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
