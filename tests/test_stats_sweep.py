"""Stats sweep (ops/stats_sweep.py) vs the XLA fused op.

The kernel's contract: kth_sq_dist equals the sorted fused op's
``neigh_sq_dist[:, k-1]`` BIT-EXACTLY (order statistics are values, not
orders), and the moment sums match the fused op's accumulation, so
normals/curvature agree to FP-fusion noise (on CPU, exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buildingsegment_tpu.core.morton import morton_sort
from buildingsegment_tpu.ops.fused import (
    finish_normals,
    knn_normals_window_sorted,
)
from buildingsegment_tpu.ops.stats_sweep import (
    fused_stats_sweep,
    knn_normals_window_stats,
)
from buildingsegment_tpu.ops.window_sweep import make_slab
from buildingsegment_tpu.utils.synthetic import make_building_cloud

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def sorted_cloud():
    pts, _ = make_building_cloud(
        seed=5, spacing_mm=120.0, width_mm=5000.0, depth_mm=4000.0,
        wall_h_mm=3000.0, ridge_h_mm=4000.0,
    )
    cap = 16384
    pos = np.full((cap, 3), 2 ** 24, np.int32)
    pos[: len(pts)] = pts
    mask = np.zeros(cap, bool)
    mask[: len(pts)] = True
    spos, smask, _ = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
    return spos.astype(jnp.float32), smask


def _pad1(a, w, fill):
    f = jnp.full((w,), fill, a.dtype)
    return jnp.concatenate([f, a, f])


@pytest.mark.parametrize(
    "k,w,radius,max_nn",
    [
        (15, 64, 100.0, 50),     # reference defaults
        (16, 32, 1e6, 16),       # entry()/test config
        (15, 32, 300.0, None),   # no hybrid cap
    ],
)
def test_kernel_matches_sorted_fused(sorted_cloud, k, w, radius, max_nn):
    sposf, smask = sorted_cloud
    _, nb_d, nrm, curv = knn_normals_window_sorted(
        sposf, smask, max(k, 16), window=w, radius=radius, max_nn=max_nn
    )
    slab = make_slab(
        [sposf[:, 0], sposf[:, 1], sposf[:, 2],
         smask.astype(jnp.float32)],
        [-3e7, -3e7, -3e7, 0.0], w, 1024, rows_out=8,
    )
    dk, s0, s1, s2 = fused_stats_sweep(
        slab, sposf.shape[0], k=k, w=w, tile=1024, radius=radius,
        max_nn=max_nn, interpret=True,
    )
    dk = jnp.where(smask, dk, 0.0)
    # the k-th-NN squared distance is an order statistic: bit-exact
    np.testing.assert_array_equal(np.asarray(dk), np.asarray(nb_d[:, k - 1]))
    nrm2, curv2 = finish_normals(s0, s1, s2)
    # moments are the same sums; tiny FP-fusion differences allowed
    ang = np.degrees(
        np.arccos(
            np.clip(np.abs(np.sum(np.asarray(nrm * nrm2), -1)), 0, 1)
        )
    )
    assert np.percentile(ang[np.asarray(smask)], 99) < 0.2
    np.testing.assert_allclose(
        np.asarray(curv2), np.asarray(curv), atol=1e-4
    )


@pytest.mark.parametrize(
    "k,w,max_nn",
    [(15, 32, 50), (15, 24, None), (1, 32, 50)],  # w=24 → 48 rows ≠ 2^j
)
def test_bitonic_rank_variant_identical(sorted_cloud, k, w, max_nn):
    """The bitonic sort returns the same order statistics (values) as
    the bit-pattern bisection — bit-exact, including inf/degenerate
    rows and non-power-of-two candidate counts (padded with +inf)."""
    sposf, smask = sorted_cloud
    slab = make_slab(
        [sposf[:, 0], sposf[:, 1], sposf[:, 2],
         smask.astype(jnp.float32)],
        [-3e7, -3e7, -3e7, 0.0], w, 1024, rows_out=8,
    )
    base = fused_stats_sweep(
        slab, sposf.shape[0], k=k, w=w, tile=1024, radius=100.0,
        max_nn=max_nn, interpret=True,
    )
    var = fused_stats_sweep(
        slab, sposf.shape[0], k=k, w=w, tile=1024, radius=100.0,
        max_nn=max_nn, interpret=True, rank_mode="bitonic",
    )
    for a, b in zip(base, var):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_store_offsets_variant_identical(sorted_cloud):
    """The aligned-phase-3 variant is a pure scheduling change."""
    sposf, smask = sorted_cloud
    slab = make_slab(
        [sposf[:, 0], sposf[:, 1], sposf[:, 2],
         smask.astype(jnp.float32)],
        [-3e7, -3e7, -3e7, 0.0], 32, 1024, rows_out=8,
    )
    base = fused_stats_sweep(
        slab, sposf.shape[0], k=15, w=32, tile=1024, radius=100.0,
        max_nn=50, interpret=True,
    )
    var = fused_stats_sweep(
        slab, sposf.shape[0], k=15, w=32, tile=1024, radius=100.0,
        max_nn=50, interpret=True, store_offsets=True,
    )
    for a, b in zip(base, var):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("store_offsets", [False, True])
def test_sym_variant_identical(sorted_cloud, store_offsets):
    """The symmetry-halved phase 1 (each pair's distance computed once,
    both offset rows filled by lane-shifted slices) is bit-identical:
    d² and pair validity are direction-symmetric, and the mirrored
    offset is an exact IEEE negation."""
    sposf, smask = sorted_cloud
    slab = make_slab(
        [sposf[:, 0], sposf[:, 1], sposf[:, 2],
         smask.astype(jnp.float32)],
        [-3e7, -3e7, -3e7, 0.0], 32, 1024, rows_out=8,
    )
    base = fused_stats_sweep(
        slab, sposf.shape[0], k=15, w=32, tile=1024, radius=100.0,
        max_nn=50, interpret=True, store_offsets=store_offsets,
    )
    var = fused_stats_sweep(
        slab, sposf.shape[0], k=15, w=32, tile=1024, radius=100.0,
        max_nn=50, interpret=True, store_offsets=store_offsets,
        sym=True,
    )
    for a, b in zip(base, var):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wrapper_cpu_contract(sorted_cloud):
    """On CPU the wrapper derives stats from the sorted op — identical."""
    sposf, smask = sorted_cloud
    k, w, radius, max_nn = 15, 64, 100.0, 50
    _, nb_d, nrm, curv = knn_normals_window_sorted(
        sposf, smask, k, window=w, radius=radius, max_nn=max_nn
    )
    dk, nrm2, curv2 = knn_normals_window_stats(
        sposf, smask, k=k, window=w, radius=radius, max_nn=max_nn
    )
    np.testing.assert_array_equal(np.asarray(dk), np.asarray(nb_d[:, k - 1]))
    np.testing.assert_array_equal(np.asarray(nrm2), np.asarray(nrm))
    np.testing.assert_array_equal(np.asarray(curv2), np.asarray(curv))


def test_radius_only_mode_matches_window_normals(sorted_cloud):
    """k=1/no-cap skips the bisection; moments must still equal the
    XLA radius-window normals path (estimate_normals_window on CPU)."""
    from buildingsegment_tpu.ops.fused import finish_normals
    from buildingsegment_tpu.ops.normals import estimate_normals_window

    sposf, smask = sorted_cloud
    w, radius = 64, 300.0
    slab = make_slab(
        [sposf[:, 0], sposf[:, 1], sposf[:, 2],
         smask.astype(jnp.float32)],
        [-3e7, -3e7, -3e7, 0.0], w, 1024, rows_out=8,
    )
    dk, s0, s1, s2 = fused_stats_sweep(
        slab, sposf.shape[0], k=1, w=w, tile=1024, radius=radius,
        max_nn=None, interpret=True,
    )
    assert float(jnp.max(jnp.abs(dk))) == 0.0
    nrm2, curv2 = finish_normals(s0, s1, s2)
    nrm, curv = estimate_normals_window(
        sposf, smask, radius=radius, window=w
    )
    sel = np.asarray(smask)
    ang = np.degrees(
        np.arccos(
            np.clip(np.abs(np.sum(np.asarray(nrm * nrm2), -1)), 0, 1)
        )
    )
    assert np.percentile(ang[sel], 99) < 0.2
    np.testing.assert_allclose(
        np.asarray(curv2), np.asarray(curv), atol=1e-4
    )


def test_sparse_cloud_degenerate_balls():
    """Fewer than k-1 candidates → dk = 0.0 (the XLA kNN convention)."""
    n = 2048
    rng = np.random.default_rng(7)
    # 3 points far apart + padding
    pos = np.full((n, 3), 2 ** 24, np.int32)
    pos[0] = [0, 0, 0]
    pos[1] = [100000, 0, 0]
    pos[2] = [0, 100000, 0]
    mask = np.zeros(n, bool)
    mask[:3] = True
    spos, smask, _ = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
    sposf = spos.astype(jnp.float32)
    k, w = 15, 32
    slab = make_slab(
        [sposf[:, 0], sposf[:, 1], sposf[:, 2],
         smask.astype(jnp.float32)],
        [-3e7, -3e7, -3e7, 0.0], w, 1024, rows_out=8,
    )
    dk, s0, s1, s2 = fused_stats_sweep(
        slab, sposf.shape[0], k=k, w=w, tile=1024, radius=100.0,
        max_nn=50, interpret=True,
    )
    dk = jnp.where(smask, dk, 0.0)
    _, nb_d, _, _ = knn_normals_window_sorted(
        sposf, smask, k, window=w, radius=100.0, max_nn=50
    )
    np.testing.assert_array_equal(np.asarray(dk), np.asarray(nb_d[:, k - 1]))
    assert float(jnp.max(jnp.where(smask, dk, 0.0))) == 0.0
