"""Relative-position-bias lookup with a scatter-free backward.

Forward semantics match the reference's windowed-attention bias path
(`networks/blocks/window_attention.py:96-107`): a `(2w-1)^nd`-entry
table indexed by the static relative-position index, heads kept MAJOR
(`[H, N, N]`) per the round-3 layout finding (a `[N², H]` gather
lane-pads H to the 128-wide tile).

The backward of a plain `jnp.take` is a scatter-add over N² indices,
which XLA:TPU lowers to a serial loop — measured ~2.0 MB at ~1 GB/s,
≈2 ms per bias table per train step on v5e (`scripts/gap_accounting.py
--train`, round 4: `fusion.2117/.2115/.2109`).  But the rel-pos index is
SEPARABLE: ``index(p, q) = Σ_i stride_i · (p_i − q_i + w_i − 1)``, so
the table cotangent factors into one tiny one-hot contraction per
spatial dim, ``E_i[a, p, q] = [p − q + w_i − 1 == a]`` (shape
`[2w_i−1, w_i, w_i]`, e.g. `[13, 7, 7]`): three small dots that read the
1.4 MB cotangent once instead of running a 117k-step serial scatter.

Only valid when the runtime token count covers the full window — the
reference's clipped-window quirk slices `rel_pos_index[:n, :n]`, and a
flat prefix of the window grid is not a sub-grid — callers fall back to
the plain take (whose cotangent is then ≤0.6 MB) in that case.
"""

from __future__ import annotations

from functools import lru_cache, partial, reduce
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def rel_pos_index(window_size: Sequence[int]) -> np.ndarray:
    """Static [N, N] index into the relative-position-bias table.

    Reference: networks/blocks/window_attention.py:60-77 (buffer built
    at module init); row-major over the window grid, per-dim strides
    accumulated innermost-last.
    """
    grids = np.meshgrid(*[np.arange(w) for w in window_size], indexing="ij")
    coords = np.stack([g.reshape(-1) for g in grids])  # [nd, N]
    rel = coords[:, :, None] - coords[:, None, :]      # [nd, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    strides = []
    acc = 1
    for w in reversed(window_size):
        strides.append(acc)
        acc *= 2 * w - 1
    strides = strides[::-1]
    for i, w in enumerate(window_size):
        rel[:, :, i] += w - 1
        rel[:, :, i] *= strides[i]
    return rel.sum(-1)


@lru_cache(maxsize=None)
def _dim_onehot(w: int) -> np.ndarray:
    """E[a, p, q] = [p - q + w - 1 == a], shape [2w-1, w, w] (numpy —
    lru_cache must never hold jnp arrays, CLAUDE.md tracer-leak note)."""
    p = np.arange(w)
    rel = p[:, None] - p[None, :] + w - 1
    return (np.arange(2 * w - 1)[:, None, None] == rel[None]).astype(np.float32)


def _gather_impl(table_t: jax.Array, window_size: tuple[int, ...]) -> jax.Array:
    n = int(np.prod(window_size))
    idx = jnp.asarray(rel_pos_index(window_size).reshape(-1))
    return jnp.take(table_t, idx, axis=1).reshape(-1, n, n)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def rel_bias_gather(table_t: jax.Array,
                    window_size: tuple[int, ...]) -> jax.Array:
    """[H, T] table -> [H, N, N] full-window bias; separable (scatter-free)
    VJP.  `window_size` must be a hashable tuple; N = prod(window_size)."""
    return _gather_impl(table_t, window_size)


def _gather_fwd(table_t, window_size):
    return _gather_impl(table_t, window_size), None


def _gather_bwd(window_size, _res, g):
    ws = tuple(window_size)
    nd = len(ws)
    h = g.shape[0]
    out = g.reshape((h, *ws, *ws)).astype(jnp.float32)
    # axes: [h, p_0..p_{nd-1}, q_0..q_{nd-1}]; contract one (p_i, q_i)
    # pair per step with E_i, appending the new table axis a_i at the end
    for i in range(nd):
        e = jnp.asarray(_dim_onehot(ws[i]))
        # at step i, p_i sits at axis 1 and q_i at axis 1 + (nd - i)
        out = jnp.tensordot(e, out, axes=[[1, 2], [1, 1 + (nd - i)]])
        out = jnp.moveaxis(out, 0, -1)
    # axes now [h, a_0, ..., a_{nd-1}]; the table flattens row-major over
    # the a's (stride_{nd-1} = 1) — matches rel_pos_index's strides
    return (out.reshape(h, -1).astype(g.dtype),)


rel_bias_gather.defvjp(_gather_fwd, _gather_bwd)
