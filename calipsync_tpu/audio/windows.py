"""HuBERT feature windowing: per-frame +-8 context -> (32,32,32) NHWC.

The reference slices a 16-row window of (2,1024) HuBERT features around each
video frame, zero-padding at clip edges, and reshapes it to a (32,32,32)
NCHW tensor (/root/reference/dataset/dataset.py:39-56,172-176 and
/root/reference/image_infer_v1/tools/frame_synthesizer/infer_api.py:99-145).

We produce the NHWC-equivalent tensor (h, w, c) = nchw (c, h, w).transpose so
the generator sees identical values per (channel, y, x) coordinate.

Two implementations:
  - :func:`window_nhwc_np` — host-side numpy, for the data loader.
  - :func:`batched_windows` — jittable, gathers a whole batch of windows on
    device from the full feature array (static shapes; out-of-range rows are
    masked to zero, matching the reference's edge padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

WINDOW = 16  # rows of (2, 1024) => +-8 frames of context


def window_rows_np(features: np.ndarray, index: int) -> np.ndarray:
    """(T, 2, 1024) -> (16, 2, 1024) rows [index-8, index+8), zero-padded."""
    t = features.shape[0]
    left, right = index - 8, index + 8
    pad_left = max(0, -left)
    pad_right = max(0, right - t)
    rows = features[max(0, left):min(t, right)]
    if pad_left or pad_right:
        rows = np.pad(rows, ((pad_left, pad_right), (0, 0), (0, 0)))
    return rows


def pack_nhwc_np(rows: np.ndarray) -> np.ndarray:
    """(16, 2, 1024) -> (32, 32, 32) NHWC (channels last)."""
    nchw = rows.reshape(32, 32, 32)  # (C, H, W) in reference layout
    return np.ascontiguousarray(nchw.transpose(1, 2, 0))


def window_nhwc_np(features: np.ndarray, index: int) -> np.ndarray:
    """Host-side: one frame's audio window as (32, 32, 32) NHWC fp32."""
    return pack_nhwc_np(window_rows_np(features, index).astype(np.float32))


def batched_windows(features: jax.Array, indices: jax.Array,
                    mode: str = "hubert") -> jax.Array:
    """Device-side batch windowing (jittable).

    Args:
      features: (T, ...) fp32 features (whole clip on device) — HuBERT
        (T, 2, 1024) or WeNet rows with 8192 values each.
      indices:  (B,) int32 frame indices.
      mode: 'hubert' -> (B, 32, 32, 32) NHWC; 'wenet' -> (B, 16, 32, 256)
        NHWC (the reference's (256,16,32) NCHW reshape,
        dataset/dataset.py:173-176, channels-last).
    Returns:
      Audio windows, zero-padded at clip edges.
    """
    t = features.shape[0]
    flat = features.reshape(t, -1)
    offs = jnp.arange(WINDOW, dtype=jnp.int32) - 8
    rows = indices[:, None].astype(jnp.int32) + offs[None, :]  # (B, 16)
    valid = (rows >= 0) & (rows < t)
    gathered = jnp.take(flat, jnp.clip(rows, 0, t - 1), axis=0)  # (B,16,F)
    gathered = jnp.where(valid[..., None], gathered, 0.0)
    if mode == "hubert":
        nchw = gathered.reshape(-1, 32, 32, 32)  # (B, C, H, W)
    elif mode == "wenet":
        nchw = gathered.reshape(-1, 256, 16, 32)
    else:
        raise ValueError(f"unknown mode: {mode}")
    return jnp.transpose(nchw, (0, 2, 3, 1))
