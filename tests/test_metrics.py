"""Dice / surface distance / reductions / per-modality aggregation."""

import jax.numpy as jnp
import numpy as np
import pytest

from miseg_tpu import metrics


def test_dice_perfect_and_empty():
    t = np.zeros((1, 8, 8, 8, 3), np.float32)
    t[..., 0] = 1
    t[0, 2:4, 2:4, 2:4, 0] = 0
    t[0, 2:4, 2:4, 2:4, 1] = 1
    d = metrics.dice_score(jnp.asarray(t), jnp.asarray(t))
    assert np.allclose(np.asarray(d)[0, :2], 1.0)
    assert np.isnan(np.asarray(d)[0, 2])  # class 2 absent in GT → NaN


def test_dice_known_overlap():
    p = np.zeros((1, 4, 4, 1, 2), np.float32)
    t = np.zeros((1, 4, 4, 1, 2), np.float32)
    p[0, :2, :, 0, 1] = 1   # 8 voxels
    t[0, 1:3, :, 0, 1] = 1  # 8 voxels, 4 overlap
    d = np.asarray(metrics.dice_score(jnp.asarray(p), jnp.asarray(t)))
    assert d[0, 1] == pytest.approx(2 * 4 / 16)


def test_reduce_mean_batch_nan_aware():
    vals = np.array([[1.0, np.nan], [0.5, 0.8]])
    out, not_nans = metrics.reduce_mean_batch(vals)
    assert out[0] == pytest.approx(0.75)
    assert out[1] == pytest.approx(0.8)
    assert not_nans.tolist() == [2, 1]


def test_reduce_mean_channel_then_batch():
    vals = np.array([[1.0, np.nan], [0.5, 0.7]])
    mean, n = metrics.reduce_mean(vals)
    assert mean == pytest.approx((1.0 + 0.6) / 2)
    assert n == 2


def test_surface_distance_shifted_cube():
    """Cube shifted by 2 → symmetric euclidean asd ≈ 2 on facing faces."""
    a = np.zeros((1, 16, 16, 16, 2), bool)
    b = np.zeros((1, 16, 16, 16, 2), bool)
    a[0, 4:8, 4:8, 4:8, 1] = True
    b[0, 4:8, 4:8, 4:8, 1] = True
    d0 = metrics.surface_distance(a, b)
    assert d0[0, 1] == pytest.approx(0.0)
    b2 = np.zeros_like(b)
    b2[0, 6:10, 4:8, 4:8, 1] = True
    d2 = metrics.surface_distance(a, b2)
    assert 0.5 < d2[0, 1] < 2.5
    # empty prediction → nan
    e = np.zeros_like(a)
    dn = metrics.surface_distance(e, b)
    assert np.isnan(dn[0, 1]) or np.isinf(dn[0, 1])


def test_metric_by_modality_namespace():
    vals = np.array([[1.0, 0.5], [0.0, 0.5], [0.8, np.nan]])
    mods = np.array([0, 1, 0])
    out = metrics.metric_by_modality(vals, mods, "dice")
    assert out["val_modality0_dice/class0"] == pytest.approx(0.9)
    assert out["val_modality0_dice/class1"] == pytest.approx(0.5)
    assert out["val_modality1_dice/avg"] == pytest.approx(0.25)


def test_generalized_dice_score_perfect():
    t = np.zeros((2, 8, 8, 8, 3), np.float32)
    t[..., 0] = 1
    t[0, 2:4, 2:4, 2:4, 0] = 0
    t[0, 2:4, 2:4, 2:4, 1] = 1
    g = metrics.generalized_dice_score(jnp.asarray(t), jnp.asarray(t))
    assert np.allclose(np.asarray(g), 1.0)


def test_loss_metric_accumulates():
    lm = metrics.LossMetric(lambda a, b: jnp.mean((a - b) ** 2))
    lm(jnp.ones(4), jnp.zeros(4))
    lm(3 * jnp.ones(4), jnp.zeros(4))
    assert lm.aggregate() == pytest.approx((1 + 9) / 2)
    lm.reset()
    assert np.isnan(lm.aggregate())


def test_cumulative_buffer():
    c = metrics.Cumulative()
    c.extend(np.ones((2, 3)), np.array([0, 1]))
    c.extend(np.zeros((1, 3)), np.array([0]))
    vals, mods = c.get_buffer()
    assert vals.shape == (3, 3)
    assert mods.tolist() == [0, 1, 0]


def test_as_discrete_argmax_onehot(rng):
    x = rng.standard_normal((2, 4, 4, 4, 3)).astype(np.float32)
    out = metrics.as_discrete(jnp.asarray(x), argmax=True, to_onehot=3)
    assert out.shape == (2, 4, 4, 4, 3)
    assert np.allclose(np.asarray(out).sum(-1), 1.0)


@pytest.mark.parametrize("include_background", [True, False])
@pytest.mark.parametrize("ignore_empty", [True, False])
def test_dice_score_labels_matches_onehot(include_background, ignore_empty):
    """The label-map dice (no one-hot materialization) must be NaN-for-NaN
    identical to dice_score(one_hot, one_hot) on random label maps."""
    import jax
    rng = np.random.default_rng(3)
    c = 4
    pred = rng.integers(0, c, (2, 6, 5, 4)).astype(np.int32)
    targ = rng.integers(0, c, (2, 6, 5, 4)).astype(np.int32)
    targ[1][targ[1] == 3] = 0  # sample 1: class 3 absent in GT
    pred[1][pred[1] == 3] = 1  # ...and in pred (denom==0 case)
    kw = dict(include_background=include_background, ignore_empty=ignore_empty)
    want = np.asarray(metrics.dice_score(
        jax.nn.one_hot(pred, c), jax.nn.one_hot(targ, c), **kw))
    got = np.asarray(metrics.dice_score_labels(
        jnp.asarray(pred), jnp.asarray(targ), c, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True)
