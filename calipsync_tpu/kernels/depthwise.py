"""Fused depthwise 3x3 conv (+ scale/bias + LeakyReLU) Pallas TPU kernel.

STATUS: numerically verified in Pallas interpreter mode (tests/test_kernels
.py) across the generator's layer shapes; on this environment's axon
remote-AOT Mosaic toolchain the manual-DMA halo variant crashes the
compile helper / TPU worker without diagnostics, so the production path
keeps XLA's depthwise lowering (which at these sizes runs at the dispatch-
latency floor anyway — measured 1.8-2.6 ms for 32x160x160 batches,
indistinguishable from launch overhead over the tunnel). Re-evaluate on a
standard libtpu Mosaic stack.

Every InvertedResidual in the generator runs a depthwise 3x3 between its
1x1 matmuls (/root/reference/module/unet.py:21-27; SURVEY.md section 3.3
lists it as a Pallas target). Depthwise convs don't use the MXU — they are
VPU/HBM work — so the win is fusion: this kernel computes the 9-tap
stencil AND the folded BatchNorm affine AND the LeakyReLU in one VMEM
pass, where the unfused lowering round-trips HBM between conv and
normalization.

Layout: NHWC with C on lanes. The kernel tiles H (grid dims batch x
h-tiles x c-tiles); W and C pad to VPU tile boundaries inside. Supports
stride 1 and 2 with padding 1 (the only configs the models use).

``depthwise3x3`` is the public op; ``fold_bn`` turns BatchNorm params
into the (scale, bias) it consumes for inference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _dw_kernel(stride: int, th_out: int, w_out: int, negative_slope: float,
               apply_act: bool, c_tile: int,
               x_hbm, k_ref, s_ref, b_ref, out_ref, x_vmem, sem):
    """Halo pattern: the padded input stays in HBM (Pallas block indices
    are block-granular, so overlapping tiles can't be expressed with
    BlockSpec); each program DMAs its haloed (th_in, W_in, Ct) slab into
    VMEM scratch, then runs the 9-tap stencil + affine + LeakyReLU on the
    VPU and writes its non-overlapping output block."""
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)
    th_in = th_out * stride + 2

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(bi, 1), pl.ds(hi * th_out * stride, th_in),
                 slice(None), pl.ds(ci * c_tile, c_tile)],
        x_vmem, sem)
    dma.start()
    dma.wait()

    x = x_vmem[0].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)       # (3, 3, Ct)
    scale = s_ref[...].astype(jnp.float32)   # (Ct,)
    bias = b_ref[...].astype(jnp.float32)

    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    c_dim = x.shape[-1]
    for dy in range(3):
        for dx in range(3):
            if stride == 1:
                rows = x[dy:dy + th_out, dx:dx + w_out, :]
            else:  # stride 2: contiguous slice + reshape decimation
                # (strided slices lower to unsupported gathers in Mosaic)
                rows = x[dy:dy + th_out * 2, dx:dx + w_out * 2, :]
                rows = rows.reshape(th_out, 2, w_out, 2, c_dim)[:, 0, :, 0]
            acc = acc + rows * k[dy, dx, :]
    acc = acc * scale + bias
    if apply_act:
        acc = jnp.where(acc >= 0, acc, acc * negative_slope)
    out_ref[0] = acc.astype(out_ref.dtype)


def depthwise3x3(x: jax.Array, kernel: jax.Array,
                 scale: Optional[jax.Array] = None,
                 bias: Optional[jax.Array] = None,
                 stride: int = 1, negative_slope: float = 0.01,
                 apply_act: bool = True, h_tile: int = 8) -> jax.Array:
    """Fused depthwise conv: y = act((dwconv3x3(x, kernel)) * scale + bias).

    Args:
      x: (B, H, W, C) NHWC.
      kernel: (3, 3, C) per-channel taps (flax depthwise kernel
        (3,3,1,C) squeezed).
      scale/bias: per-channel affine (folded BN); default identity.
      stride: 1 or 2 (padding fixed at 1, the model's only configs).
    """
    if kernel.ndim == 4:  # flax (3, 3, 1, C)
        kernel = kernel[:, :, 0, :]
    b, h, w, c = x.shape
    if scale is None:
        scale = jnp.ones((c,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    h_out = (h + 2 - 3) // stride + 1
    w_out = (w + 2 - 3) // stride + 1

    th = min(h_tile, h_out)
    n_h = -(-h_out // th)
    th_in = th * stride + 2

    w_pad_out = _round_up(w_out, SUBLANE)
    # contiguous reads span tap_offset(<=2) + extent*stride rows/cols
    h_in_needed = (n_h * th) * stride + 2
    w_in_needed = w_pad_out * stride + 2
    x_p = jnp.pad(x, ((0, 0), (1, h_in_needed - h - 1),
                      (1, w_in_needed - w - 1), (0, 0)))

    c_tile = min(LANE, _round_up(c, SUBLANE))
    if c % c_tile:
        pad_c = _round_up(c, c_tile) - c
        x_p = jnp.pad(x_p, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad_c)))
        scale = jnp.pad(scale, (0, pad_c))
        bias = jnp.pad(bias, (0, pad_c))
    n_c = x_p.shape[-1] // c_tile
    w_in = x_p.shape[2]

    out = pl.pallas_call(
        functools.partial(_dw_kernel, stride, th, w_pad_out,
                          negative_slope, apply_act, c_tile),
        grid=(b, n_h, n_c),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM
            pl.BlockSpec((3, 3, c_tile), lambda bi, hi, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile,), lambda bi, hi, ci: (ci,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile,), lambda bi, hi, ci: (ci,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w_pad_out, c_tile),
                               lambda bi, hi, ci: (bi, hi, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_h * th, w_pad_out,
                                        x_p.shape[-1]), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, th_in, w_in, c_tile), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * h_out * w_out * c * 9 * 2,
            bytes_accessed=(x_p.size + b * h_out * w_out * c) * 4,
            transcendentals=0,
        ),
    )(x_p, kernel, scale, bias)
    return out[:, :h_out, :w_out, :c]


def _dw_blocked_kernel(stride: int, h_out: int, w_out: int,
                       negative_slope: float, apply_act: bool,
                       x_ref, k_ref, s_ref, b_ref, out_ref):
    """Halo-free variant: each program owns one (batch, channel-tile) and
    the WHOLE padded H x W plane arrives as a plain VMEM block — no manual
    DMA (the v1 halo DMA crashes this environment's remote Mosaic AOT
    toolchain). Feasible because the generator's planes are small: the
    largest (162, 168, 128) bf16 block is ~7 MB."""
    x = x_ref[0].astype(jnp.float32)          # (H_in, W_in, Ct)
    k = k_ref[...].astype(jnp.float32)        # (3, 3, Ct)
    scale = s_ref[...].astype(jnp.float32)
    bias = b_ref[...].astype(jnp.float32)

    c_dim = x.shape[-1]
    acc = jnp.zeros((h_out, w_out, c_dim), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            if stride == 1:
                rows = x[dy:dy + h_out, dx:dx + w_out, :]
            else:  # stride 2: contiguous slice + reshape decimation
                rows = x[dy:dy + h_out * 2, dx:dx + w_out * 2, :]
                rows = rows.reshape(h_out, 2, w_out, 2, c_dim)[:, 0, :, 0]
            acc = acc + rows * k[dy, dx, :]
    acc = acc * scale + bias
    if apply_act:
        acc = jnp.where(acc >= 0, acc, acc * negative_slope)
    out_ref[0] = acc.astype(out_ref.dtype)


def depthwise3x3_blocked(x: jax.Array, kernel: jax.Array,
                         scale: Optional[jax.Array] = None,
                         bias: Optional[jax.Array] = None,
                         stride: int = 1, negative_slope: float = 0.01,
                         apply_act: bool = True) -> jax.Array:
    """Fused depthwise conv, halo-free blocking (grid = batch x channel
    tiles, full spatial plane per program). Same contract as
    :func:`depthwise3x3`."""
    if kernel.ndim == 4:
        kernel = kernel[:, :, 0, :]
    b, h, w, c = x.shape
    if scale is None:
        scale = jnp.ones((c,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    h_out = (h + 2 - 3) // stride + 1
    w_out = (w + 2 - 3) // stride + 1
    w_pad_out = _round_up(w_out, SUBLANE)

    h_in = h_out * stride + 2
    w_in = w_pad_out * stride + 2
    x_p = jnp.pad(x, ((0, 0), (1, h_in - h - 1), (1, w_in - w - 1), (0, 0)))

    c_tile = min(LANE, _round_up(c, SUBLANE))
    if c % c_tile:
        pad_c = _round_up(c, c_tile) - c
        x_p = jnp.pad(x_p, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad_c)))
        scale = jnp.pad(scale, (0, pad_c))
        bias = jnp.pad(bias, (0, pad_c))
    n_c = x_p.shape[-1] // c_tile

    out = pl.pallas_call(
        functools.partial(_dw_blocked_kernel, stride, h_out, w_pad_out,
                          negative_slope, apply_act),
        grid=(b, n_c),
        in_specs=[
            pl.BlockSpec((1, h_in, w_in, c_tile),
                         lambda bi, ci: (bi, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c_tile), lambda bi, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile,), lambda bi, ci: (ci,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile,), lambda bi, ci: (ci,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_pad_out, c_tile),
                               lambda bi, ci: (bi, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_pad_out,
                                        x_p.shape[-1]), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * h_out * w_out * c * 9 * 2,
            bytes_accessed=(x_p.size + b * h_out * w_out * c) * 4,
            transcendentals=0,
        ),
    )(x_p, kernel, scale, bias)
    return out[:, :h_out, :w_out, :c]


def depthwise3x3_reference(x, kernel, scale=None, bias=None, stride=1,
                           negative_slope=0.01, apply_act=True):
    """XLA reference implementation (same math, lax conv)."""
    if kernel.ndim == 3:
        kernel = kernel[:, :, None, :]
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32),
        window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    if apply_act:
        y = jnp.where(y >= 0, y, y * negative_slope)
    return y.astype(x.dtype)


def fold_bn(bn_params: dict, bn_stats: dict, eps: float = 1e-5):
    """BatchNorm {scale,bias} + {mean,var} -> fused (scale, bias)."""
    std = jnp.sqrt(jnp.asarray(bn_stats["var"]) + eps)
    s = jnp.asarray(bn_params["scale"]) / std
    b = jnp.asarray(bn_params["bias"]) - jnp.asarray(bn_stats["mean"]) * s
    return s, b
