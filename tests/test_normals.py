"""Normal/curvature estimation tests vs numpy.linalg.eigh oracle."""

import jax.numpy as jnp
import numpy as np

from buildingsegment_tpu.ops.knn import knn
from buildingsegment_tpu.ops.normals import eigh3x3_smallest, estimate_normals


class TestEigh3x3:
    def test_matches_numpy_eigh(self, rng):
        a = rng.normal(size=(1000, 3, 3)).astype(np.float32)
        cov = a @ a.transpose(0, 2, 1)  # SPD
        v, lam = eigh3x3_smallest(jnp.asarray(cov))
        v, lam = np.asarray(v), np.asarray(lam)
        w_np, v_np = np.linalg.eigh(cov.astype(np.float64))
        np.testing.assert_allclose(lam, w_np, rtol=2e-4, atol=2e-4)
        # eigenvector up to sign
        dots = np.abs(np.sum(v * v_np[:, :, 0], axis=-1))
        assert (dots > 0.999).mean() > 0.99

    def test_degenerate_isotropic(self):
        cov = jnp.stack([jnp.eye(3), jnp.zeros((3, 3))])
        v, lam = eigh3x3_smallest(cov)
        np.testing.assert_allclose(np.asarray(v), [[0, 0, 1], [0, 0, 1]])

    def test_rank_one_plane(self):
        # points spread in xy-plane → smallest eigenvector = z
        cov = jnp.asarray(np.diag([4.0, 2.0, 0.0])[None], jnp.float32)
        v, lam = eigh3x3_smallest(cov)
        np.testing.assert_allclose(np.abs(np.asarray(v)[0]), [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(lam)[0], [0, 2, 4], atol=1e-5)


def _plane_cloud(rng, n, normal, extent=2000.0, noise=1.0):
    normal = np.asarray(normal, np.float64)
    normal /= np.linalg.norm(normal)
    u = np.cross(normal, [0.57, 0.62, 0.53])
    u /= np.linalg.norm(u)
    w = np.cross(normal, u)
    coef = rng.uniform(-extent, extent, size=(n, 2))
    pts = coef[:, :1] * u + coef[:, 1:] * w
    pts += rng.normal(0, noise, (n, 1)) * normal
    return pts


class TestEstimateNormals:
    def test_planar_cloud_normal(self, rng):
        target = np.array([1.0, 2.0, 3.0])
        target /= np.linalg.norm(target)
        pts = _plane_cloud(rng, 512, target) + 5000
        pos = jnp.asarray(np.round(pts).astype(np.int32))
        mask = jnp.ones(512, bool)
        idx, d = knn(pos, mask, k=16, query_tile=128, cand_tile=128)
        normals, curv = estimate_normals(
            pos, mask, idx, d, radius=1e9, max_nn=16
        )
        normals = np.asarray(normals)
        dots = np.abs(normals @ target)
        assert dots.mean() > 0.99
        # oriented to +Z
        assert (normals[:, 2] >= 0).all()
        assert np.asarray(curv).mean() < 0.01

    def test_radius_mask_excludes_far(self, rng):
        # two parallel plates 10000 apart; small radius must not mix them
        a = _plane_cloud(rng, 256, [0, 0, 1], extent=500.0)
        b = a + [0, 0, 10_000]
        pts = np.concatenate([a, b]) + 20_000
        pos = jnp.asarray(np.round(pts).astype(np.int32))
        mask = jnp.ones(512, bool)
        idx, d = knn(pos, mask, k=16, query_tile=128, cand_tile=128)
        normals, _ = estimate_normals(pos, mask, idx, d, radius=2000.0, max_nn=16)
        assert (np.abs(np.asarray(normals)[:, 2]) > 0.99).mean() > 0.95

    def test_isolated_point_gets_z(self):
        pos = jnp.asarray(
            np.array([[0, 0, 0], [100000, 0, 0], [0, 100000, 0]], np.int32)
        )
        pos = jnp.pad(pos, ((0, 125), (0, 0)), constant_values=2**24)
        mask = jnp.zeros(128, bool).at[:3].set(True)
        idx, d = knn(pos, mask, k=4, query_tile=128, cand_tile=128)
        normals, curv = estimate_normals(pos, mask, idx, d, radius=10.0, max_nn=4)
        np.testing.assert_allclose(np.asarray(normals)[:3], [[0, 0, 1]] * 3)
        np.testing.assert_allclose(np.asarray(curv)[:3], 0.0)

    def test_curvature_high_on_corner(self, rng):
        # corner of two perpendicular walls → mixed neighborhood → curvature up
        wall1 = _plane_cloud(rng, 256, [1, 0, 0], extent=300.0)
        wall2 = _plane_cloud(rng, 256, [0, 1, 0], extent=300.0)
        pts = np.concatenate([wall1, wall2]) + 1000
        pos = jnp.asarray(np.round(pts).astype(np.int32))
        mask = jnp.ones(512, bool)
        idx, d = knn(pos, mask, k=16, query_tile=128, cand_tile=128)
        _, curv = estimate_normals(pos, mask, idx, d, radius=1e9, max_nn=16)
        assert np.asarray(curv).max() > 0.05
