"""Sharded end-to-end pipeline over a device mesh — explicit shard_map.

Point-shard data parallelism per SURVEY.md §2.5, written as explicit
SPMD rather than GSPMD pass-through (the auto-partitioner resolves the
windowized pipeline's global data dependencies by all-gathering, i.e.
8 chips ≈ 1× speedup):

  * the cloud is Morton-sorted globally, then split into contiguous
    ranges over the 1-D ``points`` mesh axis — shards are spatially
    coherent boxes of the scan;
  * every windowized op (fused kNN+normals sweep, seed rule, label
    propagation, refinement) runs shard-locally, reading ±W halo rows
    exchanged with ``lax.ppermute`` ring steps over ICI
    (:mod:`buildingsegment_tpu.dist.halo`);
  * label resolution is collective: per-label statistics are psum'd
    compact tables, the merge parent table is pmin'd, and the plane
    table / renumbering work on replicated tables
    (:func:`buildingsegment_tpu.seg.region_grow.segment_planes` with
    ``axis_name``).

Per-sweep communication is O(N_labels) table reductions + O(W) halo
rows — never a full-[N] all-gather (tests/test_dist.py asserts this on
the compiled HLO).  The global Morton sort at the top is the one
remaining all-gather-shaped step; it runs once per scan, outside the
iteration, and is O(N log N) on bytes (not the bottleneck — the sweep
loop is).

The reference has no parallelism of any kind (single-thread CPU binary,
tmc3/TMC3.cpp:202-229); this layer is the TPU-native scaling story.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from buildingsegment_tpu.config import DEFAULT_CONFIG, PipelineConfig
from buildingsegment_tpu.core.morton import morton_sort, unsort_by
from buildingsegment_tpu.core.quantize import shift_to_origin
from buildingsegment_tpu.dist.mesh import POINTS_AXIS, point_sharding
from buildingsegment_tpu.ops.fused import knn_normals_window_sorted
from buildingsegment_tpu.seg.coarse import segment_planes_multigrid
from buildingsegment_tpu.seg.region_grow import (
    SegmentationResult,
    segment_planes,
    window_seeds,
)

__all__ = ["sharded_pipeline", "sharded_seg_body"]


def sharded_seg_body(mesh: Mesh, config: PipelineConfig, *,
                     signed_normals: bool = False):
    """The shard_map'd core: Morton-sorted positions → labels.

    Returns ``body(spos f32[N,3], smask bool[N]) -> SegmentationResult``
    where inputs are globally Morton-sorted and plane_idx is returned in
    the sorted frame.  Exposed separately so tests can compile it alone
    and assert the HLO contains no all-gather.
    """
    ax = POINTS_AXIS
    knn_k = config.knn_k
    k_q = max(knn_k, 16)

    def local_body(spos, smask):
        seg_kwargs = dict(
            max_edge_dist=2.0 * config.th_thickness,
            th_seed_curvature=config.th_seed_curvature,
            th_thickness=config.th_thickness,
            th_normal_cos=config.th_normal_cos,
            th_point_count=config.th_point_count,
            max_planes=config.max_planes,
            max_sweeps=config.max_sweeps,
            convergence_tol=config.seg_convergence_tol,
            signed_normals=signed_normals,
        )
        s = spos.shape[0]  # local rows per shard
        if config.seg_group > 1 and s % (
            config.seg_group ** config.seg_levels
        ) == 0:
            # production: only the k-th-NN distance is consumed — the
            # stats sweep skips the top_k sort (see pipeline.py)
            from buildingsegment_tpu.ops.stats_sweep import (
                knn_normals_window_stats,
            )

            dk, normals, curv = knn_normals_window_stats(
                spos, smask, k=knn_k, window=config.knn_window,
                radius=config.normal_radius,
                max_nn=config.normal_max_nn, axis_name=ax,
            )
            rows_i = jnp.arange(s, dtype=jnp.int32)
            g_idx = jnp.stack([rows_i, rows_i], axis=1)
            return segment_planes_multigrid(
                spos, normals, g_idx, smask,
                kth_sq_dist=dk, curvature=curv,
                group=config.seg_group, levels=config.seg_levels,
                refine_sweeps=config.seg_refine_sweeps,
                axis_name=ax, **seg_kwargs,
            )
        neigh_idx, neigh_d, normals, curv = knn_normals_window_sorted(
            spos, smask, k=k_q, window=config.knn_window,
            radius=config.normal_radius, max_nn=config.normal_max_nn,
            axis_name=ax,
        )
        seeds = window_seeds(
            spos, normals, smask, neigh_d[:, knn_k - 1],
            window=config.knn_window,
            th_thickness=config.th_thickness,
            th_normal_cos=config.th_normal_cos,
            signed_normals=signed_normals,
            axis_name=ax,
        )
        return segment_planes(
            spos, normals, neigh_idx[:, :knn_k], smask,
            neigh_sq_dist=neigh_d[:, :knn_k], curvature=curv,
            seed_override=seeds, propagation="window",
            axis_name=ax, **seg_kwargs,
        )

    out_specs = SegmentationResult(
        plane_idx=P(ax),
        num_planes=P(),
        plane_normal=P(),
        plane_center=P(),
        plane_count=P(),
        num_sweeps=P(),
    )
    # check_vma=False: the varying-manual-axes checker rejects loop
    # carries initialized from constants (jnp.full inits meeting
    # shard-varying updates) all over the sweep loops.  Replication of
    # the P() outputs holds by construction — every replicated output
    # derives from a psum/pmin'd table.
    return jax.shard_map(
        local_body,
        mesh=mesh,
        in_specs=(P(ax, None), P(ax)),
        out_specs=out_specs,
        check_vma=False,
    )


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
    (pad capacity accordingly).  Always runs the production window +
    multigrid path — the only one whose work scales with shards.
    """
    del capacity_hint  # kept for API compatibility
    in_shardings = (point_sharding(mesh, 2), point_sharding(mesh, 1))
    body = sharded_seg_body(mesh, config, signed_normals=signed_normals)

    @functools.partial(jax.jit, in_shardings=in_shardings)
    def fn(positions, mask):
        shifted, lo, _hi = shift_to_origin(positions, mask)
        # global Morton sort (once per scan, outside the sweep loop);
        # multi-operand sort carries the coordinates — no gather
        sorted_pos, smask, order = morton_sort(shifted, mask)
        spos = sorted_pos.astype(jnp.float32)
        seg = body(spos, smask)
        plane_idx = unsort_by(order, seg.plane_idx)
        return shifted, lo, dataclasses.replace(seg, plane_idx=plane_idx)

    return fn
