"""Window partition/reverse round-trip and shifted-window mask tests."""

import itertools

import jax.numpy as jnp
import numpy as np

from miseg_tpu.ops import window as W


def test_partition_reverse_roundtrip_3d(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 5)).astype(np.float32))
    win = (4, 4, 4)
    parts = W.window_partition(x, win)
    assert parts.shape == (2 * 8, 64, 5)
    back = W.window_reverse(parts, win, (2, 8, 8, 8))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_partition_reverse_roundtrip_2d(rng):
    x = jnp.asarray(rng.standard_normal((3, 6, 9, 4)).astype(np.float32))
    win = (3, 3)
    back = W.window_reverse(W.window_partition(x, win), win, (3, 6, 9))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_get_window_size_shrinks():
    win, shift = W.get_window_size((4, 16, 16), (7, 7, 7), (3, 3, 3))
    assert win == (4, 7, 7)
    assert shift == (0, 3, 3)
    assert W.get_window_size((4, 4), (7, 7)) == (4, 4)


def _reference_mask(dims, window_size, shift_size):
    """Loop-built region-id mask mirroring swin_utils.py:107-143 semantics."""
    img = np.zeros(dims, np.int32)
    cnt = 0
    segs = []
    for d, w, s in zip(dims, window_size, shift_size):
        if s == 0 or w >= d:
            segs.append([slice(None)])
        else:
            segs.append([slice(0, -w), slice(-w, -s), slice(-s, None)])
    for idx in itertools.product(*segs):
        img[idx] = cnt
        cnt += 1
    # naive window flatten
    d, h, w = dims
    wd, wh, ww = window_size
    wins = []
    for i in range(0, d, wd):
        for j in range(0, h, wh):
            for k in range(0, w, ww):
                wins.append(img[i:i + wd, j:j + wh, k:k + ww].reshape(-1))
    wins = np.stack(wins)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def test_compute_mask_matches_loop_reference():
    dims, win, shift = (8, 8, 8), (4, 4, 4), (2, 2, 2)
    got = np.asarray(W.compute_mask(dims, win, shift))
    want = _reference_mask(dims, win, shift)
    np.testing.assert_array_equal(got, want)


def test_compute_mask_none_when_unshifted():
    assert W.compute_mask((8, 8, 8), (4, 4, 4), (0, 0, 0)) is None


def test_compute_mask_jnp_matches_numpy():
    import numpy as np
    from miseg_tpu.ops.window import compute_mask, compute_mask_jnp
    for dims, ws, ss in [((14, 14, 14), (7, 7, 7), (3, 3, 3)),
                         ((8, 12), (4, 4), (2, 2)),
                         ((10, 10, 10), (5, 5, 5), (0, 0, 0))]:
        a = compute_mask(dims, ws, ss)
        b = compute_mask_jnp(dims, ws, ss)
        if a is None:
            assert b is None
        else:
            assert np.allclose(np.asarray(b), a)
