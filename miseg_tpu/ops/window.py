"""Shifted-window utilities for Swin attention (3D and 2D, channel-last).

Reference semantics covered (MI-Seg `networks/utils/swin_utils.py`):
  * `window_partition` / `window_reverse` (:15-77) — view+permute shuffles;
  * `get_window_size` (:80-104) — shrink window / zero shift for dims
    smaller than the window;
  * `compute_mask` (:107-143) — shifted-window attention mask built by
    region-id labeling.

TPU-first differences: the attention mask is precomputed with numpy at
TRACE time (shapes are static — the training ROI is fixed), so no device
compute or Python-loop-on-device is spent building it, and it constant-folds
into the compiled program.  Partition/reverse are pure reshape/transposes
that XLA fuses away.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ATTN_MASK_VALUE = -100.0  # matches MONAI/reference masked_fill value


def get_window_size(x_size, window_size, shift_size=None):
    """Per-dim: if the input dim <= window, clamp window to it and zero the shift."""
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_window[i] = x_size[i]
            if use_shift is not None:
                use_shift[i] = 0
    if shift_size is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


def window_partition(x: jax.Array, window_size) -> jax.Array:
    """[B, *spatial, C] → [B*nW, prod(window), C] for 2D or 3D spatial dims."""
    if x.ndim == 5:
        b, d, h, w, c = x.shape
        wd, wh, ww = window_size
        x = x.reshape(b, d // wd, wd, h // wh, wh, w // ww, ww, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        return x.reshape(-1, wd * wh * ww, c)
    b, h, w, c = x.shape
    wh, ww = window_size
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, c)


def window_reverse(windows: jax.Array, window_size, dims) -> jax.Array:
    """Inverse of `window_partition`."""
    if len(dims) == 4:
        b, d, h, w = dims
        wd, wh, ww = window_size
        x = windows.reshape(b, d // wd, h // wh, w // ww, wd, wh, ww, -1)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return x.reshape(b, d, h, w, -1)
    b, h, w = dims
    wh, ww = window_size
    x = windows.reshape(b, h // wh, w // ww, wh, ww, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


@functools.lru_cache(maxsize=64)
def compute_mask(dims: tuple, window_size: tuple, shift_size: tuple) -> np.ndarray | None:
    """Shifted-window attention mask, `[nW, N, N]` of {0, -100}, or None.

    Returns NUMPY (constant-folded at trace time); caching a jnp array
    would leak tracers across jit scopes.

    Static precompute: positions are labeled with a region id by the same
    3-segment slicing as the reference (swin_utils.py:107-143); windows
    whose tokens span regions get -100 on cross-region pairs.
    """
    if not any(shift_size):
        return None
    img = np.zeros((1, *dims, 1), dtype=np.int32)
    cnt = 0

    def _segments(dim, ws, ss):
        # ss == 0 → the reference's 3-slice loop degenerates to one region
        # (the final full-axis overwrite); ws >= dim keeps the reference's
        # exact segmenting (swin_utils.py:124-127) even though the model
        # never hits it (get_window_size zeroes the shift first).
        if ss == 0:
            return [slice(None)]
        return [slice(0, -ws), slice(-ws, -ss), slice(-ss, None)]

    import itertools
    for idx in itertools.product(*[_segments(d, w, s)
                                   for d, w, s in zip(dims, window_size, shift_size)]):
        img[(slice(None), *idx, slice(None))] = cnt
        cnt += 1
    # partition into windows with numpy (mirrors window_partition)
    x = img
    if len(dims) == 3:
        d, h, w = dims
        wd, wh, ww = window_size
        x = x.reshape(1, d // wd, wd, h // wh, wh, w // ww, ww, 1)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww)
    else:
        h, w = dims
        wh, ww = window_size
        x = x.reshape(1, h // wh, wh, w // ww, ww, 1)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww)
    diff = x[:, None, :] - x[:, :, None]
    return np.where(diff != 0, ATTN_MASK_VALUE, 0.0).astype(np.float32)


def _region_ids_1d(dim: int, ws: int, ss: int) -> jax.Array:
    """Per-position region id along one axis (0/1/2 segments)."""
    if ss == 0:
        return jnp.zeros((dim,), jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (dim, 1), 0)[:, 0]
    return ((pos >= dim - ws).astype(jnp.int32)
            + (pos >= dim - ss).astype(jnp.int32))


def window_region_ids(dims, window_size, shift_size) -> jax.Array | None:
    """Per-window region ids `i32 [nW, N]` for the shifted-window mask.

    The additive `[nW, N, N]` mask is `-100` wherever two tokens' region
    ids differ — at stage 1 of the flagship that tensor is 343³ f32
    (~161MB), so downstream consumers keep only the ids (470KB) and fuse
    the pairwise comparison into the attention computation (XLA fuses the
    broadcast compare; the Pallas kernel compares in VMEM).
    """
    if not any(shift_size):
        return None
    axes = [_region_ids_1d(d, w, s)
            for d, w, s in zip(dims, window_size, shift_size)]
    nd = len(dims)
    region = axes[0].reshape(-1, *([1] * (nd - 1)))
    for i, a in enumerate(axes[1:], start=1):
        shape = [1] * nd
        shape[i] = -1
        region = region * 3 + a.reshape(shape)
    region = region[None, ..., None].astype(jnp.float32)  # [1, *dims, 1]
    return window_partition(region, window_size)[..., 0].astype(jnp.int32)


def mask_from_region_ids(ids: jax.Array) -> jax.Array:
    """`[nW, N]` region ids → additive `[nW, N, N]` {0, -100} mask."""
    neq = ids[:, None, :] != ids[:, :, None]
    return jnp.where(neq, ATTN_MASK_VALUE, 0.0).astype(jnp.float32)


def compute_mask_jnp(dims, window_size, shift_size) -> jax.Array | None:
    """On-device shifted-window mask `[nW, N, N]` (≡ `compute_mask`).

    Built from iota comparisons instead of a host numpy table so the big
    stage-1 mask is computed at runtime rather than embedded as an HLO
    constant — large baked constants made full-model compiles
    pathologically slow on the remote-compile path.  Prefer
    `window_region_ids` where the consumer can fuse the comparison.
    """
    ids = window_region_ids(dims, window_size, shift_size)
    return None if ids is None else mask_from_region_ids(ids)
