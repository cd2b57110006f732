"""Fused kNN+normals sweep: exact equivalence to the separate ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from buildingsegment_tpu.core.morton import morton_argsort
from buildingsegment_tpu.ops.fused import knn_normals_window_sorted
from buildingsegment_tpu.ops.knn import knn_window_sorted
from buildingsegment_tpu.ops.normals import estimate_normals_window
from buildingsegment_tpu.utils.synthetic import make_building_cloud


@pytest.fixture(scope="module")
def sorted_cloud():
    pts, _ = make_building_cloud(seed=2, spacing_mm=200.0, noise_mm=8.0)
    n = len(pts)
    cap = ((n + 2047) // 2048) * 2048
    pos = np.full((cap, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(cap, bool)
    mask[:n] = True
    order = morton_argsort(jnp.asarray(pos), jnp.asarray(mask))
    return (
        jnp.asarray(pos)[order].astype(jnp.float32),
        jnp.asarray(mask)[order],
    )


def test_matches_separate_ops(sorted_cloud):
    spos, smask = sorted_cloud
    fi, fd, fn, fc = knn_normals_window_sorted(
        spos, smask, 16, window=64, radius=500.0
    )
    si, sd = knn_window_sorted(spos, smask, 16, window=64)
    sn, sc = estimate_normals_window(spos, smask, radius=500.0, window=64)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(si))
    np.testing.assert_allclose(np.asarray(fd), np.asarray(sd))
    np.testing.assert_allclose(np.asarray(fn), np.asarray(sn), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(sc), atol=1e-6)


def test_window_too_small_raises(sorted_cloud):
    spos, smask = sorted_cloud
    with pytest.raises(ValueError):
        knn_normals_window_sorted(spos, smask, 40, window=16)
