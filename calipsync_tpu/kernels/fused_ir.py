"""Fused inverted-residual Pallas TPU kernel (serving/eval mode).

The generator's hot stages are its stride-1 inverted-residual blocks at
high resolution (reference /root/reference/module/unet.py:8-40: expand
1x1 -> BN -> LeakyReLU -> depthwise 3x3 -> BN -> LeakyReLU -> project
1x1 -> BN -> LeakyReLU, optional residual). Under XLA each conv/BN/act
round-trips the widest activation through HBM: the measured stage bisect
(STAGES_r03.json) puts up4 at 8.58 ms of the 20.45 ms b128 forward with
its (B,160,160,128) hidden tensor costing ~6 HBM passes of ~840 MB.

This kernel runs the WHOLE block per tile with the hidden activation
resident in VMEM: HBM traffic drops to one read of the input (+ two
1-row halo re-reads per tile) and one write of the output. BN is folded
into the conv weights outside the kernel (eval mode: BN is a per-channel
affine), so the kernel computes

    hid = leaky(x_ext @ w1 + b1)          # MXU, fp32 accumulate
    y   = leaky(dw3x3(hid, kd) + bd)      # VPU, 9 shifted FMAs, fp32
    out = leaky(y @ w2 + b2) [+ x]        # MXU, fp32 accumulate

with a cast to the compute dtype at each stage boundary (matching where
the XLA path quantizes between ops). The depthwise halo comes from two
extra single-row BlockSpecs of the same input (rows h0-1 and h0+bh),
zero-masked at the array edges — no manual DMA (the round-2 manual-DMA
depthwise kernel crashed the remote Mosaic toolchain; this one uses
plain BlockSpec pipelining only).

MEASURED VERDICT (KERNELS_r03.json, real v5e chip, serving shapes): the
kernel is numerically exact vs its jnp mirror on TPU and parity-clean vs
the flax block, but LOSES to XLA on 13 of 14 compiling shapes
(0.2-0.8x; one 1.7x win at up1_ir2). An in-kernel bisect shows why: a
passthrough variant with the same BlockSpecs already costs 6.3 of the
7.6 ms at the up4_ir1 shape — the grid pipeline is DMA-latency-bound
(~10 us/program across 640 programs x 4 DMA streams), while XLA's conv
emitter+fusion sits near the op-mix floor (its 4.2 ms vs a 0.77 ms pure
HBM roofline is VPU depthwise + small-channel MXU work, not waste).
``ir_impl`` therefore defaults to ``"xla"`` everywhere; this kernel
stays available and parity-tested for future toolchains/hardware.

Train mode keeps the flax/XLA path (batch stats + autodiff); this kernel
is eval-only by construction and is selected via Generator(ir_impl=...)
only when train=False.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from calipsync_tpu.nn.blocks import BN_EPS, LEAKY_SLOPE

_VMEM_BUDGET = 4 * 1024 * 1024  # soft cap per-tile working set (bytes)


def _leaky(x: jax.Array) -> jax.Array:
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def pick_block_h(h: int, w: int, cin: int, ch: int, cout: int,
                 itemsize: int) -> int:
    """Largest divisor of ``h`` whose tile working set fits the budget."""
    per_row = w * (cin + 2 * ch + cout) * itemsize
    best = 1
    for bh in range(1, h + 1):
        if h % bh:
            continue
        if (bh + 2) * per_row <= _VMEM_BUDGET:
            best = bh
    return best


def _ir_kernel(xp_ref, xc_ref, xn_ref, w1_ref, b1_ref, kd_ref, bd_ref,
               w2_ref, b2_ref, out_ref, *, bh: int, residual: bool):
    h = pl.program_id(1)
    n_h = pl.num_programs(1)
    dtype = xc_ref.dtype

    xc = xc_ref[0]                                   # (bh, W, Cin)
    xe = jnp.concatenate([xp_ref[0], xc, xn_ref[0]], axis=0)  # (bh+2,W,Cin)

    m, w, cin = xe.shape
    ch = w1_ref.shape[1]

    hid = jnp.dot(xe.reshape(m * w, cin), w1_ref[:],
                  preferred_element_type=jnp.float32)
    hid = _leaky(hid + b1_ref[0]).astype(dtype).reshape(m, w, ch)

    # The depthwise conv zero-pads its INPUT (the post-BN hidden): at the
    # array's top/bottom edge the halo row must be exactly zero, not
    # leaky(b1). Interior tiles keep the real neighbor-row hidden values.
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
    mask = jnp.where(rows == 0, (h > 0).astype(jnp.float32), 1.0)
    mask = jnp.where(rows == m - 1, (h < n_h - 1).astype(jnp.float32), mask)
    hid = hid * mask.astype(dtype)

    # Depthwise 3x3 as 3 sublane shifts (one per column offset; W is the
    # sublane dim, so each offset slice is a relayout — do it once per dc
    # and reuse across the 3 row offsets, which slice the untiled leading
    # dim for free).
    hidp = jnp.pad(hid, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((bh, w, ch), jnp.float32)
    for dc in range(3):
        col = hidp[:, dc:dc + w, :].astype(jnp.float32)  # (bh+2, W, Ch)
        for dr in range(3):
            acc = acc + col[dr:dr + bh] * kd_ref[
                dr * 3 + dc].astype(jnp.float32)
    y = _leaky(acc + bd_ref[0]).astype(dtype)

    out = jnp.dot(y.reshape(bh * w, ch), w2_ref[:],
                  preferred_element_type=jnp.float32)
    out = _leaky(out + b2_ref[0]).astype(dtype)
    out = out.reshape(bh, w, -1)
    if residual:
        out = out + xc
    out_ref[0] = out


def fused_inverted_residual(x: jax.Array, w1: jax.Array, b1: jax.Array,
                            kd: jax.Array, bd: jax.Array, w2: jax.Array,
                            b2: jax.Array, *, residual: bool = False,
                            block_h: int | None = None,
                            interpret: bool = False) -> jax.Array:
    """Stride-1 inverted residual with BN folded (eval mode).

    x (B,H,W,Cin); w1 (Cin,Ch) bf16/f32; b1 (Ch,) f32; kd (9,Ch) [3x3
    taps row-major]; bd (Ch,) f32; w2 (Ch,Cout); b2 (Cout,) f32.
    Returns (B,H,W,Cout) in x.dtype. ``residual`` adds x (Cin==Cout).
    """
    b, h, w, cin = x.shape
    ch = w1.shape[1]
    cout = w2.shape[1]
    if residual and cin != cout:
        raise ValueError("residual needs cin == cout")
    bh = block_h or pick_block_h(h, w, cin, ch, cout, x.dtype.itemsize)
    if h % bh:
        raise ValueError(f"block_h {bh} must divide H {h}")
    n_h = h // bh

    b1_ = b1.reshape(1, -1).astype(jnp.float32)
    bd_ = bd.reshape(1, -1).astype(jnp.float32)
    b2_ = b2.reshape(1, -1).astype(jnp.float32)
    kd_ = kd.reshape(9, -1).astype(x.dtype)
    w1_ = w1.astype(x.dtype)
    w2_ = w2.astype(x.dtype)

    kernel = functools.partial(_ir_kernel, bh=bh, residual=residual)
    rep = lambda i, j: (0, 0)  # noqa: E731 — replicated weight blocks
    return pl.pallas_call(
        kernel,
        grid=(b, n_h),
        in_specs=[
            pl.BlockSpec((1, 1, w, cin),
                         lambda i, j: (i, jnp.maximum(j * bh - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, w, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, cin),
                         lambda i, j: (i, jnp.minimum((j + 1) * bh, h - 1),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, ch), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ch), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, cout), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        interpret=interpret,
    )(x, x, x, w1_, b1_, kd_, bd_, w2_, b2_)


def fused_inverted_residual_reference(x, w1, b1, kd, bd, w2, b2, *,
                                      residual: bool = False) -> jax.Array:
    """jnp mirror of the kernel (same fold + cast points), for parity."""
    dtype = x.dtype
    hid = jnp.einsum("bhwc,cd->bhwd", x, w1.astype(dtype),
                     preferred_element_type=jnp.float32)
    hid = _leaky(hid + b1.astype(jnp.float32)).astype(dtype)
    hidp = jnp.pad(hid, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bsz, h, w, ch = hid.shape
    acc = jnp.zeros((bsz, h, w, ch), jnp.float32)
    kd9 = kd.reshape(9, ch)
    for dr in range(3):
        for dc in range(3):
            tap = hidp[:, dr:dr + h, dc:dc + w, :].astype(jnp.float32)
            acc = acc + tap * kd9[dr * 3 + dc].astype(dtype).astype(
                jnp.float32)
    y = _leaky(acc + bd.astype(jnp.float32)).astype(dtype)
    out = jnp.einsum("bhwc,cd->bhwd", y, w2.astype(dtype),
                     preferred_element_type=jnp.float32)
    out = _leaky(out + b2.astype(jnp.float32)).astype(dtype)
    if residual:
        out = out + x
    return out


def fold_ir_params(params, batch_stats):
    """Fold an InvertedResidual's BN stats into conv weights (eval mode).

    params/batch_stats: the flax subtrees of one
    :class:`calipsync_tpu.nn.blocks.InvertedResidual` (children
    ``expand``/``depthwise``/``project``, each ``{conv: {kernel}, bn:
    {scale, bias | mean, var}}``). Returns (w1, b1, kd, bd, w2, b2) in
    fp32 with kd as (9, Ch); cast happens inside the kernel wrapper.

    BN(conv(x, W)) == conv(x, W * s) + (beta - mean * s) with
    s = gamma / sqrt(var + eps) — exact in eval mode.
    """

    def fold(name):
        k = params[name]["conv"]["kernel"]
        s = params[name]["bn"]["scale"] * jax.lax.rsqrt(
            batch_stats[name]["bn"]["var"] + BN_EPS)
        t = params[name]["bn"]["bias"] - batch_stats[name]["bn"]["mean"] * s
        return k * s, t

    k1, b1 = fold("expand")      # (1,1,Cin,Ch)
    kd, bd = fold("depthwise")   # (3,3,1,Ch)
    k2, b2 = fold("project")     # (1,1,Ch,Cout)
    cin, ch = k1.shape[2], k1.shape[3]
    return (k1.reshape(cin, ch), b1, kd.reshape(9, ch), bd,
            k2.reshape(ch, k2.shape[3]), b2)
