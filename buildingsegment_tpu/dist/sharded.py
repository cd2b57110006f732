"""Sharded end-to-end pipeline over a device mesh.

Point-shard data parallelism (SURVEY.md §2.5): the padded point tensor
is sharded over the 1-D ``points`` mesh axis and the whole fused
pipeline (shift → tiled kNN → covariance-PCA normals → label-propagation
segmentation) is jitted under those shardings.  XLA's SPMD partitioner
splits the O(N²) kNN distance work across devices along the query
dimension and inserts the collectives that a hand-rolled backend would
need explicitly:

  * all-gathers where neighbor gathers cross shard boundaries (the
    halo exchange — neighbor indices are global);
  * reductions (psum-like) for bounding boxes, segment counts and the
    scatter-min label resolution.

O(N) per-point arrays (positions, labels) are cheap enough to
replicate/exchange (a 1M-point cloud is 12 MB of coordinates); the
O(N²/D) distance ranking is where devices earn their keep.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from buildingsegment_tpu.config import DEFAULT_CONFIG, PipelineConfig
from buildingsegment_tpu.dist.mesh import make_mesh, point_sharding, replicated
from buildingsegment_tpu.pipeline import resolve_knn_method, run_device_pipeline

__all__ = ["sharded_pipeline"]


def sharded_pipeline(
    mesh: Mesh,
    config: PipelineConfig = DEFAULT_CONFIG,
    *,
    signed_normals: bool = False,
    capacity_hint: Optional[int] = None,
):
    """Build a jitted sharded pipeline function for ``mesh``.

    Returns ``fn(positions int32[N,3], mask bool[N])`` →
    ``(shifted_positions, bbox_min, SegmentationResult)`` with inputs
    sharded over the points axis.  N must be divisible by the mesh size
    (pad capacity accordingly).
    """
    in_shardings = (point_sharding(mesh, 2), point_sharding(mesh, 1))
    k_search = max(config.knn_k_pad, config.normal_max_nn)

    fn = functools.partial(
        run_device_pipeline,
        k_search=k_search,
        knn_k=config.knn_k,
        normal_radius=config.normal_radius,
        normal_max_nn=config.normal_max_nn,
        th_thickness=config.th_thickness,
        th_normal_cos=config.th_normal_cos,
        th_point_count=config.th_point_count,
        max_planes=config.max_planes,
        max_sweeps=config.max_sweeps,
        convergence_tol=config.seg_convergence_tol,
        seg_group=config.seg_group,
        seg_levels=config.seg_levels,
        seg_refine_sweeps=config.seg_refine_sweeps,
        th_seed_curvature=config.th_seed_curvature,
        signed_normals=signed_normals,
        knn_method=resolve_knn_method(config, capacity_hint or 0)
        if capacity_hint is not None
        else config.knn_method if config.knn_method != "auto" else "brute",
        knn_window_size=config.knn_window,
    )
    return jax.jit(fn, in_shardings=in_shardings)
