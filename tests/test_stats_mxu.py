"""MXU block-form stats kernel (ops/stats_mxu.py) vs the references.

Two regimes (see the module's exactness note):
  * small coordinate span (< 256 units): every intermediate of the
    matmul form is an exact f32 integer → BIT-IDENTICAL to the shift
    kernel / the XLA fused op;
  * production span: the |c|²−2c·q+|q|² evaluation rounds differently
    from Σ(c−q)² → tolerance comparison (order statistics within a few
    integer units², normals within a sliver of a degree), with the
    bench quality gate arbitrating end-to-end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from buildingsegment_tpu.core.morton import morton_sort
from buildingsegment_tpu.ops.fused import (
    finish_normals,
    knn_normals_window_sorted,
)
from buildingsegment_tpu.ops.stats_mxu import fused_stats_mxu
from buildingsegment_tpu.ops.stats_sweep import fused_stats_sweep
from buildingsegment_tpu.ops.window_sweep import make_slab

pytestmark = pytest.mark.slow


def _prep(pts, cap):
    pos = np.full((cap, 3), 2 ** 24, np.int32)
    pos[: len(pts)] = pts
    mask = np.zeros(cap, bool)
    mask[: len(pts)] = True
    spos, smask, _ = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
    return spos.astype(jnp.float32), smask


def _slab(sposf, smask, w, tile):
    return make_slab(
        [sposf[:, 0], sposf[:, 1], sposf[:, 2],
         smask.astype(jnp.float32)],
        [-3e7, -3e7, -3e7, 0.0], w, tile, rows_out=8,
    )


@pytest.mark.parametrize(
    "k,w,radius,max_nn",
    [
        (15, 64, 100.0, 50),   # reference defaults
        (15, 64, 40.0, 50),    # tight radius
        (16, 32, 1e6, 16),     # entry()/test config
        (15, 32, 60.0, None),  # no hybrid cap
        (15, 48, 80.0, 20),    # non-pow2 candidate count (C=224)
    ],
)
def test_small_span_bit_exact(k, w, radius, max_nn):
    """Coords < 256 ⇒ all intermediates exact ⇒ bit-identical."""
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 250, (3000, 3)).astype(np.int32)
    sposf, smask = _prep(pts, 4096)
    slab = _slab(sposf, smask, w, 1024)
    ref = fused_stats_sweep(
        slab, 4096, k=k, w=w, tile=1024, radius=radius, max_nn=max_nn,
        interpret=True,
    )
    got = fused_stats_mxu(
        slab, 4096, k=k, w=w, tile=1024, radius=radius, max_nn=max_nn,
        interpret=True,
    )
    for r, g, name in zip(ref, got, ("dk", "s0", "s1", "s2")):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(r), err_msg=name
        )


def test_small_span_sparse_masks():
    """Mostly-masked rows + degenerate balls stay bit-identical."""
    rng = np.random.default_rng(1)
    pts = rng.integers(0, 200, (500, 3)).astype(np.int32)
    cap = 2048
    pos = np.full((cap, 3), 2 ** 24, np.int32)
    mask = np.zeros(cap, bool)
    sel = rng.choice(cap, len(pts), replace=False)
    pos[sel] = pts
    mask[sel] = True
    spos, smask, _ = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
    sposf = spos.astype(jnp.float32)
    slab = _slab(sposf, smask, 64, 512)
    ref = fused_stats_sweep(
        slab, cap, k=15, w=64, tile=512, radius=100.0, max_nn=50,
        interpret=True,
    )
    got = fused_stats_mxu(
        slab, cap, k=15, w=64, tile=512, radius=100.0, max_nn=50,
        interpret=True,
    )
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_production_span_tolerance():
    """Building-scene span: order statistics within integer-rounding
    noise, normals within a sliver of a degree, counts off on at most
    a sliver of threshold-straddling points."""
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    pts, _ = make_building_cloud(
        seed=5, spacing_mm=120.0, width_mm=5000.0, depth_mm=4000.0,
        wall_h_mm=3000.0, ridge_h_mm=4000.0,
    )
    sposf, smask = _prep(pts, 16384)
    n = 16384
    slab = _slab(sposf, smask, 64, 1024)
    kw = dict(k=15, w=64, tile=1024, radius=100.0, max_nn=50,
              interpret=True)
    dk_r, s0_r, s1_r, s2_r = fused_stats_sweep(slab, n, **kw)
    dk_g, s0_g, s1_g, s2_g = fused_stats_mxu(slab, n, **kw)
    m = np.asarray(smask)
    dk_r, dk_g = np.asarray(dk_r)[m], np.asarray(dk_g)[m]
    # d² values are integers (mm²); the two evaluation orders round
    # them within a few ULP at this span (measured: ≤14 on ~9e4 — a
    # far 15th neighbor in a sparse region, 1.5e-4 relative)
    assert np.all(
        np.abs(dk_r - dk_g) <= np.maximum(8.0, 3e-4 * dk_r)
    )
    s0_r, s0_g = np.asarray(s0_r)[m], np.asarray(s0_g)[m]
    frac_count_diff = np.mean(s0_r != s0_g)
    assert frac_count_diff < 0.02, frac_count_diff
    nrm_r, curv_r = finish_normals(
        jnp.asarray(s0_r), jnp.asarray(np.asarray(s1_r)[m]),
        jnp.asarray(np.asarray(s2_r)[m]),
    )
    nrm_g, curv_g = finish_normals(
        jnp.asarray(s0_g), jnp.asarray(np.asarray(s1_g)[m]),
        jnp.asarray(np.asarray(s2_g)[m]),
    )
    same_ct = s0_r == s0_g
    dot = np.abs(np.sum(np.asarray(nrm_r) * np.asarray(nrm_g), -1))
    ang = np.degrees(np.arccos(np.clip(dot, 0, 1)))
    # where the accepted neighbor set is identical the moments differ
    # only by rounding → normals essentially identical
    assert np.percentile(ang[same_ct], 99.9) < 0.1, (
        np.percentile(ang[same_ct], 99.9)
    )
    assert np.max(
        np.abs(np.asarray(curv_r) - np.asarray(curv_g))[same_ct]
    ) < 1e-3


# --- seed sweep in block-MXU form ------------------------------------

def _spine_dyn(sposf, smask, nrm, dk, w, tile):
    from buildingsegment_tpu.ops.window_sweep import (
        make_dyn_row, make_spine,
    )

    spine = make_spine(
        (sposf[:, 0], sposf[:, 1], sposf[:, 2]),
        (nrm[:, 0], nrm[:, 1], nrm[:, 2]),
        smask.astype(jnp.float32), w, tile,
    )
    dyn = make_dyn_row(dk.astype(jnp.float32), 0.0, w, tile)
    return spine, dyn


@pytest.mark.parametrize("w,signed", [(16, False), (16, True), (32, False)])
def test_seed_mxu_small_span_bit_exact(w, signed):
    from buildingsegment_tpu.ops.stats_mxu import seed_sweep_mxu
    from buildingsegment_tpu.ops.window_sweep import seed_sweep_pair

    rng = np.random.default_rng(3)
    pts = rng.integers(0, 250, (2000, 3)).astype(np.int32)
    sposf, smask = _prep(pts, 4096)
    nrm = rng.normal(size=(4096, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    # seed balls around typical kNN radii at this density
    dk = jnp.asarray(
        rng.uniform(100.0, 4000.0, 4096).astype(np.float32)
    )
    spine, dyn = _spine_dyn(sposf, smask, jnp.asarray(nrm), dk, w, 1024)
    kw = dict(w=w, tile=1024, th_thickness=30.0, th_normal_cos=0.88,
              signed=signed, interpret=True)
    ref = seed_sweep_pair(spine, dyn, 4096, **kw)
    got = seed_sweep_mxu(spine, dyn, 4096, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_seed_mxu_production_span():
    """Building scene, reference thresholds: seed flags match the pair
    kernel except possibly on ball-boundary rounding (none observed on
    this scene — assert a tight mismatch budget, not zero, to keep the
    test robust to future span growth)."""
    from buildingsegment_tpu.ops.stats_mxu import seed_sweep_mxu
    from buildingsegment_tpu.ops.window_sweep import seed_sweep_pair
    from buildingsegment_tpu.utils.synthetic import make_building_cloud
    from buildingsegment_tpu.ops.fused import knn_normals_window_sorted

    pts, _ = make_building_cloud(
        seed=5, spacing_mm=120.0, width_mm=5000.0, depth_mm=4000.0,
        wall_h_mm=3000.0, ridge_h_mm=4000.0,
    )
    sposf, smask = _prep(pts, 16384)
    _, nb_d, nrm, _ = knn_normals_window_sorted(
        sposf, smask, 16, window=32, radius=100.0, max_nn=50
    )
    dk = nb_d[:, 14]
    spine, dyn = _spine_dyn(sposf, smask, nrm, dk, 16, 1024)
    kw = dict(w=16, tile=1024, th_thickness=300.0, th_normal_cos=0.88,
              signed=False, interpret=True)
    ref = np.asarray(seed_sweep_pair(spine, dyn, 16384, **kw))
    got = np.asarray(seed_sweep_mxu(spine, dyn, 16384, **kw))
    mism = np.mean(ref != got)
    assert mism < 0.001, mism


def test_window_seeds_mxu_route():
    """window_seeds(seed_mode='mxu') equals the default route on CPU
    (both fall through to the XLA path there) and the kwarg is accepted
    end-to-end through the multigrid wrapper."""
    from buildingsegment_tpu.seg.region_grow import window_seeds
    from buildingsegment_tpu.ops.fused import knn_normals_window_sorted

    rng = np.random.default_rng(4)
    pts = rng.integers(0, 250, (1500, 3)).astype(np.int32)
    sposf, smask = _prep(pts, 2048)
    _, nb_d, nrm, _ = knn_normals_window_sorted(
        sposf, smask, 16, window=16, radius=100.0, max_nn=50
    )
    a = window_seeds(sposf, nrm, smask, nb_d[:, 14], window=16)
    b = window_seeds(
        sposf, nrm, smask, nb_d[:, 14], window=16, seed_mode="mxu"
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
