"""Window partition/reverse round-trip and shifted-window mask tests."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

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


def test_rel_bias_gather_value_and_grad_match_take(rng):
    """ops/rel_bias.py: the separable (scatter-free) VJP must equal the
    plain take's value AND gradient for full windows, 2D and 3D."""
    import jax

    from miseg_tpu.ops.rel_bias import rel_bias_gather, rel_pos_index

    for ws in [(7, 7, 7), (4, 5), (3, 4, 5)]:
        n = int(np.prod(ws))
        t_len = int(np.prod([2 * w - 1 for w in ws]))
        h = 3
        table_t = jnp.asarray(
            rng.standard_normal((h, t_len)).astype(np.float32))
        idx = jnp.asarray(rel_pos_index(ws).reshape(-1))

        def ref(t):
            return jnp.take(t, idx, axis=1).reshape(h, n, n)

        out = rel_bias_gather(table_t, ws)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref(table_t)))

        ct = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
        _, vjp_fast = jax.vjp(lambda t: rel_bias_gather(t, ws), table_t)
        _, vjp_ref = jax.vjp(ref, table_t)
        (g_fast,), (g_ref,) = vjp_fast(ct), vjp_ref(ct)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n", [27, 8])
def test_window_attention_bias_grad_env_paths_agree(rng, monkeypatch, n):
    """WindowAttention trains identically with the scatter-free bias VJP
    (default) and the plain scatter path (MISEG_SCATTER_BIAS_GRAD=1).
    n=27 is the full 3³ window; n=8 the clipped-window prefix quirk,
    routed through the full-window gather + slice since round 5."""
    import jax

    from miseg_tpu.nn.swin import WindowAttention

    x = jnp.asarray(rng.standard_normal((4, n, 6)).astype(np.float32))
    mod = WindowAttention(num_heads=3, window_size=(3, 3, 3))
    params = mod.init({"params": jax.random.key(0)}, x)

    def loss(p):
        return jnp.sum(mod.apply(p, x) ** 2)

    monkeypatch.delenv("MISEG_SCATTER_BIAS_GRAD", raising=False)
    g_fast = jax.grad(loss)(params)
    monkeypatch.setenv("MISEG_SCATTER_BIAS_GRAD", "1")
    g_scatter = jax.grad(loss)(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g_fast, g_scatter)


@pytest.mark.parametrize("form", ["ids", "additive", "clipped"])
def test_bf16_scores_flag(rng, monkeypatch, form):
    """MISEG_BF16_SCORES=1 is a no-op at f32 and stays within bf16
    rounding of the default path at bf16 (scores rounded once between the
    f32 MXU accumulation and the f32 softmax internals) — on the ids-mask
    path, the legacy additive [nW,N,N] mask path, and the clipped-window
    (n < prod(window_size)) plain-gather path."""
    import jax

    from miseg_tpu.nn.swin import WindowAttention
    from miseg_tpu.ops import dispatch
    from miseg_tpu.ops.window import mask_from_region_ids, window_region_ids

    if form == "clipped":
        # 8 tokens vs a 27-position window: reference's [:n,:n] prefix quirk
        x32 = jnp.asarray(rng.standard_normal((4, 8, 6)).astype(np.float32))
        mask = None
    else:
        x32 = jnp.asarray(rng.standard_normal((8, 27, 6)).astype(np.float32))
        ids = window_region_ids((6, 6, 6), (3, 3, 3), (1, 1, 1))  # [nW=8, 27]
        mask = ids if form == "ids" else mask_from_region_ids(ids)
    mod = WindowAttention(num_heads=3, window_size=(3, 3, 3))
    params = mod.init({"params": jax.random.key(0)}, x32)

    def run(x, p):
        return np.asarray(mod.apply(p, x, mask).astype(jnp.float32))

    monkeypatch.setenv("MISEG_BF16_SCORES", "1")
    dispatch.clear_cache()
    try:
        out32_on = run(x32, params)
        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        out16_on = run(x32.astype(jnp.bfloat16), p16)
        monkeypatch.setenv("MISEG_BF16_SCORES", "0")
        dispatch.clear_cache()
        out32_off = run(x32, params)
        out16_off = run(x32.astype(jnp.bfloat16), p16)
    finally:
        monkeypatch.delenv("MISEG_BF16_SCORES", raising=False)
        dispatch.clear_cache()

    np.testing.assert_array_equal(out32_on, out32_off)  # f32: exact no-op
    scale = np.abs(out16_off).max()
    np.testing.assert_allclose(out16_on, out16_off, atol=0.05 * scale)
