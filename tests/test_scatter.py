"""Bilinear splat raster tests vs numpy oracle."""

import jax.numpy as jnp
import numpy as np

from buildingsegment_tpu.ops.scatter import bilinear_splat


def _oracle(pts, th, width, height, bin_size):
    density = np.zeros((height, width))
    hsum = np.zeros((height, width))
    for p in pts:
        if p[2] < th:
            continue
        x, y = p[0] // bin_size, p[1] // bin_size
        w = p[0] / bin_size - x
        h = p[1] / bin_size - y
        for xi in (0, 1):
            for yi in (0, 1):
                s = (w if xi else 1 - w) * (h if yi else 1 - h)
                density[y + yi, x + xi] += s
                hsum[y + yi, x + xi] += s * p[2]
    return density, hsum


def test_matches_reference_loop(rng):
    pts = rng.integers(0, 1000, size=(300, 3)).astype(np.int32)
    width = 1000 // 100 + 2
    height = 1000 // 100 + 2
    d, h = bilinear_splat(
        jnp.asarray(pts), jnp.ones(300, dtype=bool), jnp.int32(0),
        width=width, height=height, bin_size=100,
    )
    od, oh = _oracle(pts, 0, width, height, 100)
    np.testing.assert_allclose(np.asarray(d), od, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(h), oh, rtol=1e-4, atol=1.0)


def test_threshold_skips_low_points(rng):
    pts = np.array([[50, 50, 10], [50, 50, 500]], np.int32)
    d, h = bilinear_splat(
        jnp.asarray(pts), jnp.ones(2, dtype=bool), jnp.int32(100),
        width=4, height=4, bin_size=100,
    )
    # only the z=500 point splats
    assert np.isclose(np.asarray(d).sum(), 1.0)
    assert np.isclose(np.asarray(h).sum(), 500.0)


def test_mask_skips_padding():
    pts = np.array([[50, 50, 500], [50, 50, 500]], np.int32)
    mask = jnp.asarray([True, False])
    d, _ = bilinear_splat(
        jnp.asarray(pts), mask, jnp.int32(0), width=4, height=4, bin_size=100
    )
    assert np.isclose(np.asarray(d).sum(), 1.0)


def test_total_mass_conserved(rng):
    pts = rng.integers(0, 5000, size=(1000, 3)).astype(np.int32)
    d, _ = bilinear_splat(
        jnp.asarray(pts), jnp.ones(1000, dtype=bool), jnp.int32(0),
        width=52, height=52, bin_size=100,
    )
    np.testing.assert_allclose(np.asarray(d).sum(), 1000.0, rtol=1e-5)
