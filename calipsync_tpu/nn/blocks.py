"""Core conv building blocks for the CALipSync-TPU generator.

TPU-native re-design of the reference blocks (see
/root/reference/module/unet.py:8-107): NHWC layout (XLA's preferred conv
layout on TPU), flax.linen modules, BatchNorm running stats as flax
`batch_stats` collections, optional cross-replica sync-BN via ``axis_name``.

Numerics match the PyTorch reference exactly in fp32 eval mode:
  - LeakyReLU negative_slope = 0.01 (torch default)
  - BatchNorm eps = 1e-5, running-stat decay 0.9 (torch momentum=0.1)
  - bilinear 2x upsample with align_corners=True (torch nn.Upsample),
    implemented as two small interp-matrix matmuls so it rides the MXU
    instead of a gather.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default
BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax decay == 1 - torch momentum (0.1)


def leaky_relu(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


class BatchNorm(nn.BatchNorm):
    """flax BatchNorm pinned to the reference's hyperparameters.

    Stats are always carried in fp32 regardless of compute dtype so that
    bf16 training does not corrupt running statistics.
    """

    use_running_average: Optional[bool] = None
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32


class ConvBNAct(nn.Module):
    """Conv2d (no bias) -> BatchNorm -> LeakyReLU, NHWC.

    ``groups`` maps to XLA ``feature_group_count`` (depthwise when
    groups == in_channels).
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    groups: int = 1
    act: bool = True
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = BatchNorm(
            use_running_average=not train,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act:
            x = leaky_relu(x)
        return x


# Fused-kernel gate: spatial area below which the per-tile pallas_call
# overhead loses to XLA's fused convs (measured in tools/bench_fused_ir.py
# — the kernel pays where the hidden activation round-trips HBM).
PALLAS_IR_MIN_HW = 40 * 40


class InvertedResidual(nn.Module):
    """MobileNetV2-style inverted residual, reference variant.

    Mirrors /root/reference/module/unet.py:8-40: expand 1x1 -> depthwise 3x3
    (stride 1 or 2, pad 1) -> project 1x1, with BN+LeakyReLU after *every*
    stage including the projection (the reference keeps the projection
    nonlinear, unlike stock MobileNet).

    ``ir_impl='pallas'`` routes eval-mode stride-1 calls at large spatial
    sizes through the fused Pallas block
    (calipsync_tpu/kernels/fused_ir.py): BN folded into the convs, the
    hidden activation VMEM-resident instead of ~6 HBM passes. Training,
    init, stride-2 and small shapes keep the flax/XLA path (autodiff +
    batch-stat updates live there).
    """

    features: int
    stride: int = 1
    use_res_connect: bool = False
    expand_ratio: int = 6
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    ir_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inp = x.shape[-1]
        hidden = inp * self.expand_ratio
        if (self.ir_impl == "pallas" and not train and self.stride == 1
                and not self.is_initializing()
                and x.shape[1] * x.shape[2] >= PALLAS_IR_MIN_HW):
            from calipsync_tpu.kernels.fused_ir import (
                fold_ir_params, fused_inverted_residual)

            names = ("expand", "depthwise", "project")
            params = {n: self.get_variable("params", n) for n in names}
            stats = {n: self.get_variable("batch_stats", n) for n in names}
            folded = fold_ir_params(params, stats)
            return fused_inverted_residual(
                x.astype(self.dtype or x.dtype), *folded,
                residual=self.use_res_connect)
        y = ConvBNAct(hidden, (1, 1), padding="VALID", dtype=self.dtype,
                      axis_name=self.axis_name, name="expand")(x, train)
        y = ConvBNAct(hidden, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), groups=hidden,
                      dtype=self.dtype, axis_name=self.axis_name,
                      name="depthwise")(y, train)
        y = ConvBNAct(self.features, (1, 1), padding="VALID",
                      dtype=self.dtype, axis_name=self.axis_name,
                      name="project")(y, train)
        if self.use_res_connect:
            y = x + y
        return y


class DoubleConvDW(nn.Module):
    """Two stacked inverted residuals (ref module/unet.py:43-55)."""

    features: int
    stride: int = 2
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    ir_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = InvertedResidual(self.features, stride=self.stride,
                             use_res_connect=False, expand_ratio=2,
                             dtype=self.dtype, axis_name=self.axis_name,
                             ir_impl=self.ir_impl, name="ir1")(x, train)
        x = InvertedResidual(self.features, stride=1, use_res_connect=True,
                             expand_ratio=2, dtype=self.dtype,
                             axis_name=self.axis_name,
                             ir_impl=self.ir_impl, name="ir2")(x, train)
        return x


class InConvDw(nn.Module):
    """Input stem (ref module/unet.py:58-67)."""

    features: int
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    ir_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return InvertedResidual(self.features, stride=1,
                                use_res_connect=False, expand_ratio=2,
                                dtype=self.dtype, axis_name=self.axis_name,
                                ir_impl=self.ir_impl, name="ir")(x, train)


class Down(nn.Module):
    """Stride-2 double conv (ref module/unet.py:70-79)."""

    features: int
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    ir_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return DoubleConvDW(self.features, stride=2, dtype=self.dtype,
                            axis_name=self.axis_name, ir_impl=self.ir_impl,
                            name="conv")(x, train)


@functools.lru_cache(maxsize=None)
def _interp_matrix_align_corners(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear interpolation matrix with align_corners=True.

    Row i holds the two weights for output sample i at source coordinate
    i*(src-1)/(dst-1). Built once per (src, dst) at trace time; applying it
    is a matmul, which XLA tiles onto the MXU (vs. a VPU gather).
    """
    m = np.zeros((dst, src), dtype=np.float32)
    if dst == 1 or src == 1:
        m[:, 0] = 1.0
        return m
    coords = np.arange(dst, dtype=np.float64) * (src - 1) / (dst - 1)
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, src - 2)
    w = (coords - lo).astype(np.float32)
    m[np.arange(dst), lo] = 1.0 - w
    m[np.arange(dst), lo + 1] = w
    return m


def upsample2x_bilinear_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample, align_corners=True, NHWC.

    Matches torch nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True) used at /root/reference/module/unet.py:86-87.
    """
    _, h, w, _ = x.shape
    mh = jnp.asarray(_interp_matrix_align_corners(h, 2 * h), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix_align_corners(w, 2 * w), dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    x = jnp.einsum("pw,bowc->bopc", mw, x)
    return x


class Up(nn.Module):
    """Upsample skip-connection merge (ref module/unet.py:82-97).

    Upsamples x1 2x (align_corners bilinear), pads to x2's spatial dims
    (no-op for this model's power-of-two sizes), channel-concats [x1, x2],
    then DoubleConvDW at stride 1.
    """

    features: int
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    ir_impl: str = "xla"

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array,
                 train: bool = False) -> jax.Array:
        x1 = upsample2x_bilinear_align_corners(x1)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                              (dw // 2, dw - dw // 2), (0, 0)))
        x = jnp.concatenate([x1, x2], axis=-1)
        return DoubleConvDW(self.features, stride=1, dtype=self.dtype,
                            axis_name=self.axis_name, ir_impl=self.ir_impl,
                            name="conv")(x, train)


class OutConv(nn.Module):
    """1x1 output projection with bias (ref module/unet.py:100-106)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.features, (1, 1), padding="VALID", use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")(x)
