"""Pallas kNN kernel tests (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from buildingsegment_tpu.ops.pallas_knn import knn_pallas


def _pad(pts, capacity):
    n = pts.shape[0]
    pos = np.full((capacity, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return jnp.asarray(pos), jnp.asarray(mask), n


class TestPallasKnn:
    def test_matches_kdtree(self, rng):
        pts = rng.integers(0, 5000, size=(500, 3)).astype(np.int32)
        pos, mask, n = _pad(pts, 512)
        idx, d = knn_pallas(
            pos, mask, k=15, query_tile=128, cand_tile=128, interpret=True
        )
        idx, d = np.asarray(idx), np.asarray(d)
        od, oi = cKDTree(pts.astype(np.float64)).query(pts, k=15)
        np.testing.assert_array_equal(idx[:n, 0], np.arange(n))
        np.testing.assert_allclose(d[:n], od**2, rtol=1e-6, atol=0.01)

    @pytest.mark.parametrize("seed_window", [32, 64])
    def test_resident_subblocks_match_kdtree(
        self, rng, seed_window, monkeypatch
    ):
        """The VMEM-resident kernel WITH sub-block gating active
        (n % (qt*8) == 0, ct/cb = 4 blocks) stays oracle-exact, at
        either seed window.  Morton-sorted input makes the window
        seeds realistic (high-recall, like production).  The resident
        path is opt-in since r5 (slower than v2 at production shapes)."""
        monkeypatch.setenv("BST_KNN_RESIDENT", "1")
        from buildingsegment_tpu.core.morton import morton_argsort

        pts = rng.integers(0, 20_000, size=(8000, 3)).astype(np.int32)
        pos, mask, n = _pad(pts, 8192)
        order = np.asarray(morton_argsort(pos, mask))
        pos, mask = pos[order], mask[order]
        spts = np.asarray(pos[:n])
        idx, d = knn_pallas(
            pos, mask, k=15, query_tile=128, cand_tile=1024,
            interpret=True, seed_window=seed_window,
        )
        idx, d = np.asarray(idx), np.asarray(d)
        od, _ = cKDTree(spts.astype(np.float64)).query(spts, k=15)
        np.testing.assert_array_equal(idx[:n, 0], np.arange(n))
        np.testing.assert_allclose(d[:n], od**2, rtol=1e-6, atol=0.01)

    def test_static_rounds_matches_kdtree(self, rng):
        pts = rng.integers(0, 5000, size=(500, 3)).astype(np.int32)
        pos, mask, n = _pad(pts, 512)
        idx, d = knn_pallas(
            pos, mask, k=15, query_tile=128, cand_tile=128,
            interpret=True, static_rounds=True,
        )
        d = np.asarray(d)
        od, _ = cKDTree(pts.astype(np.float64)).query(pts, k=15)
        np.testing.assert_allclose(d[:n], od**2, rtol=1e-6, atol=0.01)

    def test_sorted_ascending(self, rng):
        pts = rng.integers(0, 2000, size=(256, 3)).astype(np.int32)
        pos, mask, n = _pad(pts, 256)
        _, d = knn_pallas(
            pos, mask, k=8, query_tile=128, cand_tile=128, interpret=True
        )
        d = np.asarray(d)[:n]
        assert (np.diff(d, axis=1) >= -1e-6).all()

    def test_padding_and_small_clouds(self):
        pts = np.array([[0, 0, 0], [5, 0, 0], [0, 5, 0]], np.int32)
        pos, mask, n = _pad(pts, 128)
        idx, d = knn_pallas(
            pos, mask, k=6, query_tile=128, cand_tile=128, interpret=True
        )
        idx = np.asarray(idx)
        assert idx[0, 0] == 0
        assert set(idx[0, 1:3]) == {1, 2}
        assert (idx[0, 3:] == 0).all()  # empty slots → self
        assert (idx[3:] == np.arange(3, 128)[:, None]).all()

    def test_tile_divisibility_enforced(self):
        pos = jnp.zeros((100, 3), jnp.int32)
        mask = jnp.ones(100, bool)
        with pytest.raises(ValueError):
            knn_pallas(pos, mask, k=4, query_tile=128, cand_tile=128,
                       interpret=True)

    def test_multi_tile_grid(self, rng):
        # exercise the banded candidate ordering across several tiles
        pts = rng.integers(0, 20_000, size=(1000, 3)).astype(np.int32)
        pos, mask, n = _pad(pts, 1024)
        idx, d = knn_pallas(
            pos, mask, k=10, query_tile=128, cand_tile=256, interpret=True
        )
        d = np.asarray(d)[:n]
        od, _ = cKDTree(pts.astype(np.float64)).query(pts, k=10)
        np.testing.assert_allclose(d, od**2, rtol=1e-6, atol=0.01)
