"""C++ native ops vs scipy references (skipped when toolchain missing)."""

import numpy as np
import pytest
from scipy import ndimage

from miseg_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


@pytest.fixture
def vol(rng):
    return rng.random((20, 24, 18)).astype(np.float32)


def test_resample_trilinear_matches_scipy(vol):
    matrix = np.array([[0.8, 0.05, 0.0], [0.0, 1.2, 0.0], [0.0, 0.0, 0.5]])
    offset = np.array([1.0, -0.5, 2.0])
    out_shape = (16, 20, 30)
    ours = native.resample_affine(vol, matrix, offset, out_shape, 1)
    want = ndimage.affine_transform(vol, matrix, offset=offset,
                                    output_shape=out_shape, order=1,
                                    mode="constant", cval=0.0, prefilter=False)
    assert np.allclose(ours, want, atol=1e-4)


def test_resample_nearest_matches_scipy(vol):
    matrix = np.diag([2.0, 0.5, 1.0])
    offset = np.zeros(3)
    out_shape = (10, 48, 18)
    ours = native.resample_affine(vol, matrix, offset, out_shape, 0)
    want = ndimage.affine_transform(vol, matrix, offset=offset,
                                    output_shape=out_shape, order=0,
                                    mode="constant", cval=0.0, prefilter=False)
    # nearest ties at exact .5 can legally differ; demand near-total match
    assert (ours == want.astype(np.float32)).mean() > 0.99


def test_edt_matches_scipy(rng):
    target = rng.random((24, 20, 22)) > 0.95
    ours = native.edt(target)
    want = ndimage.distance_transform_edt(~target)
    assert np.allclose(ours, want, atol=1e-3)


def test_erosion_matches_scipy(rng):
    mask = ndimage.binary_dilation(rng.random((16, 16, 16)) > 0.97,
                                   iterations=2)
    ours = native.binary_erosion(mask)
    want = ndimage.binary_erosion(mask, iterations=1, border_value=1)
    assert (ours == want).all()
