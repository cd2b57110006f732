"""Compact-space solver (ops/compact_sweep.py) ≡ the XLA window solver.

The compact path re-expresses every sweep as one kernel on a slot
table; slots are rank-ordered so min-slot union ≡ min-label union.
Whenever the live-label count stays within the XLA path's own per-sweep
pair cap (1024), the two fixed points must be IDENTICAL — these tests
pin that, plus the multigrid integration and degenerate cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buildingsegment_tpu.core.morton import morton_sort
from buildingsegment_tpu.ops.fused import knn_normals_window_sorted
from buildingsegment_tpu.seg.region_grow import (
    segment_planes,
    window_seeds,
)
from buildingsegment_tpu.utils.synthetic import make_building_cloud

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene():
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
    sposf = spos.astype(jnp.float32)
    _, nb_d, normals, _ = knn_normals_window_sorted(
        sposf, smask, 16, window=32, radius=100.0, max_nn=50
    )
    seeds = window_seeds(sposf, normals, smask, nb_d[:, 14], window=16)
    rows = jnp.arange(cap, dtype=jnp.int32)[:, None]
    gidx = jnp.concatenate([rows, rows], 1)
    return spos, normals, gidx, smask, seeds


@pytest.mark.parametrize(
    "anchor,signed,tol",
    [
        (0.95, False, 0.0),     # production: anchor on, unsigned, exact
        (0.0, False, 0.0),      # anchor gate off (8-col stats)
        (0.95, True, 0.0),      # strict reference orientation semantics
        (0.95, False, 5e-5),    # production convergence tolerance
    ],
)
def test_compact_equals_window_solver(scene, anchor, signed, tol):
    spos, normals, gidx, smask, seeds = scene
    kw = dict(
        seed_override=seeds, max_edge_dist=600.0, th_point_count=50,
        max_planes=1024, propagation="window", window=16,
        convergence_tol=tol, max_sweeps=64, th_anchor_cos=anchor,
        signed_normals=signed,
    )
    a = segment_planes(spos, normals, gidx, smask, compact=False, **kw)
    b = segment_planes(spos, normals, gidx, smask, compact=True, **kw)
    assert int(a.num_planes) == int(b.num_planes)
    assert int(a.num_sweeps) == int(b.num_sweeps)
    np.testing.assert_array_equal(
        np.asarray(a.plane_idx), np.asarray(b.plane_idx)
    )
    np.testing.assert_allclose(
        np.asarray(a.plane_normal), np.asarray(b.plane_normal),
        atol=1e-5,
    )


def test_compact_multigrid_integration(scene):
    """The multigrid coarse solve takes the compact path end-to-end.

    group=8 keeps the coarse live-label count below the XLA path's
    per-sweep 1024 global-merge cap, where the two paths are exactly
    equal.  (Above the cap the compact path merges a strict SUPERSET of
    pairs per sweep — same fixed-point family, small label-trajectory
    diffs; test_compact_over_cap pins that case separately.)
    """
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid

    spos, normals, gidx, smask, seeds = scene
    _, nb_d, _, _ = knn_normals_window_sorted(
        spos.astype(jnp.float32), smask, 16, window=32, radius=100.0,
        max_nn=50,
    )
    kw = dict(
        neigh_sq_dist=nb_d[:, :16], max_edge_dist=600.0,
        th_point_count=50, max_planes=1024, window=16, group=8,
        levels=1, refine_sweeps=2,
    )
    a = segment_planes_multigrid(
        spos, normals, gidx, smask, compact=False, **kw
    )
    b = segment_planes_multigrid(
        spos, normals, gidx, smask, compact=True, **kw
    )
    assert int(a.num_planes) == int(b.num_planes)
    # below the merge cap the label trajectories are identical
    assert int(a.diagnostics[1]) == 0
    np.testing.assert_array_equal(
        np.asarray(a.plane_idx), np.asarray(b.plane_idx)
    )


def test_compact_over_cap(scene):
    """Above the XLA path's 1024-label merge cap, the compact path
    merges a superset of pairs per sweep: same plane decomposition,
    near-identical labels (small trajectory differences allowed)."""
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid

    spos, normals, gidx, smask, seeds = scene
    _, nb_d, _, _ = knn_normals_window_sorted(
        spos.astype(jnp.float32), smask, 16, window=32, radius=100.0,
        max_nn=50,
    )
    kw = dict(
        neigh_sq_dist=nb_d[:, :16], max_edge_dist=600.0,
        th_point_count=50, max_planes=1024, window=16, group=4,
        levels=1, refine_sweeps=2,
    )
    a = segment_planes_multigrid(
        spos, normals, gidx, smask, compact=False, **kw
    )
    b = segment_planes_multigrid(
        spos, normals, gidx, smask, compact=True, **kw
    )
    assert int(a.diagnostics[1]) > 0  # the cap actually binds here
    assert int(a.num_planes) == int(b.num_planes)
    pa, pb = np.asarray(a.plane_idx), np.asarray(b.plane_idx)
    assert (pa == pb).mean() > 0.99


def test_compact_empty_and_tiny():
    """No seeds → no planes; solver must not crash in compact mode."""
    n = 2048
    pos = np.full((n, 3), 2 ** 24, np.int32)
    pos[:8] = np.array(
        [[0, 0, 0], [50, 0, 0], [0, 50, 0], [50, 50, 0],
         [10000, 0, 0], [10050, 0, 0], [10000, 50, 0], [10050, 50, 0]],
        np.int32,
    )
    mask = np.zeros(n, bool)
    mask[:8] = True
    spos, smask, _ = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
    normals = jnp.tile(
        jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1)
    )
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    gidx = jnp.concatenate([rows, rows], 1)
    seeds = smask
    res = segment_planes(
        spos, normals, gidx, smask, seed_override=seeds,
        max_edge_dist=600.0, th_point_count=2, max_planes=64,
        propagation="window", window=4, compact=True,
    )
    # two 4-point clusters, both > th_point_count=2 strict
    assert int(res.num_planes) == 2
    lab = np.asarray(res.plane_idx)
    assert (lab[np.asarray(smask)] > 0).all()


def test_compact_tile_smaller_than_block():
    """tile < the kernel's _CB block: the 0-trip block fori must not
    trace a full-width store into the smaller out_lab (regression:
    lax.fori_loop traces its body even for 0 trips)."""
    n = 896  # < ops.compact_sweep._CB (1024)
    rng = np.random.default_rng(11)
    pos = np.full((n, 3), 2 ** 24, np.int32)
    m = 700
    pts = np.zeros((m, 3), np.int32)
    pts[:, 0] = rng.integers(0, 8000, m)
    pts[:, 1] = rng.integers(0, 8000, m)
    pts[:, 2] = np.where(pts[:, 0] < 4000, 0, 2500)
    pos[:m] = pts
    mask = np.zeros(n, bool)
    mask[:m] = True
    spos, smask, _ = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
    normals = jnp.tile(
        jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1)
    )
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    gidx = jnp.concatenate([rows, rows], 1)
    kw = dict(
        seed_override=smask, max_edge_dist=600.0, th_point_count=4,
        max_planes=256, propagation="window", window=8,
    )
    a = segment_planes(spos, normals, gidx, smask, compact=False, **kw)
    b = segment_planes(spos, normals, gidx, smask, compact=True, **kw)
    np.testing.assert_array_equal(
        np.asarray(a.plane_idx), np.asarray(b.plane_idx)
    )
