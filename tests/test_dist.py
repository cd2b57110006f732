"""Distributed tests on the fake 8-device CPU mesh (SURVEY.md §4).

The distributed correctness criterion: numerical identity between the
single-device and 8-shard runs of the same pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buildingsegment_tpu.config import PipelineConfig
from buildingsegment_tpu.dist.mesh import make_mesh, point_sharding
from buildingsegment_tpu.dist.sharded import sharded_pipeline
from buildingsegment_tpu.utils.synthetic import make_building_cloud

CFG = PipelineConfig(normal_radius=1e6, pad_to_multiple=1024)


@pytest.fixture(scope="module")
def cloud():
    pts, truth = make_building_cloud(seed=11, spacing_mm=250.0, noise_mm=10.0)
    n = len(pts)
    cap = CFG.padded_count(n)
    pos = np.full((cap, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return pos, mask, n


def test_eight_fake_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(cloud):
    pos, mask, n = cloud
    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)

    fn8 = sharded_pipeline(mesh8, CFG)
    fn1 = sharded_pipeline(mesh1, CFG)

    s8, lo8, seg8 = fn8(jnp.asarray(pos), jnp.asarray(mask))
    s1, lo1, seg1 = fn1(jnp.asarray(pos), jnp.asarray(mask))

    np.testing.assert_array_equal(np.asarray(lo8), np.asarray(lo1))
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(s1))
    np.testing.assert_array_equal(
        np.asarray(seg8.plane_idx), np.asarray(seg1.plane_idx)
    )
    assert int(seg8.num_planes) == int(seg1.num_planes)
    np.testing.assert_array_equal(
        np.asarray(seg8.plane_count), np.asarray(seg1.plane_count)
    )


def test_sharded_output_sharding(cloud):
    pos, mask, n = cloud
    mesh = make_mesh(8)
    fn = sharded_pipeline(mesh, CFG)
    shifted, lo, seg = fn(jnp.asarray(pos), jnp.asarray(mask))
    # result is addressable and correct-shaped
    assert shifted.shape == pos.shape
    assert seg.plane_idx.shape == (pos.shape[0],)


def test_window_mode_sharded_identity(cloud):
    # the Morton-window fast path (the production large-scan path) must
    # also be numerically identical across mesh sizes under GSPMD
    pos, mask, n = cloud
    cfg = PipelineConfig(
        normal_radius=1e6, pad_to_multiple=1024, knn_method="window"
    )
    f8 = sharded_pipeline(make_mesh(8), cfg, capacity_hint=pos.shape[0])
    f1 = sharded_pipeline(make_mesh(1), cfg, capacity_hint=pos.shape[0])
    _, _, seg8 = f8(jnp.asarray(pos), jnp.asarray(mask))
    _, _, seg1 = f1(jnp.asarray(pos), jnp.asarray(mask))
    np.testing.assert_array_equal(
        np.asarray(seg8.plane_idx), np.asarray(seg1.plane_idx)
    )
    assert int(seg8.num_planes) == int(seg1.num_planes)


def test_finds_planes_sharded(cloud):
    pos, mask, n = cloud
    mesh = make_mesh(8)
    fn = sharded_pipeline(mesh, CFG)
    _, _, seg = fn(jnp.asarray(pos), jnp.asarray(mask))
    assert int(seg.num_planes) >= 5
