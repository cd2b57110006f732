"""Break down the config-5 multiscan pipeline cost per stage.

bench.py's ``multiscan_e2e_mpts`` times segment_files() as a black box;
this tool opens it up: per scan, how much wall time goes to PLY read,
host→device upload, device pipeline, device→host fetches (plane_idx,
shifted positions), colorize, labeled-PLY write, ortho render + PNG
encode.  Device fetches are suspect #1 — np.asarray through the axon
tunnel pays a ~30-110 ms sync plus low transfer bandwidth, and
segment_cloud fetches ~16 MB per 1M-pt scan.

Run (TPU):  python tools/perf_multiscan.py
"""

import json
import os
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.core.pointset import PointBatch
    from buildingsegment_tpu.io.ply import HostPointCloud, read_ply, write_ply
    from buildingsegment_tpu.pipeline import (
        _bucket_capacity,
        resolve_knn_method,
        run_device_pipeline,
        segment_files,
    )
    from buildingsegment_tpu.seg.colorize import colorize_planes
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    cfg = PipelineConfig()
    tmp = tempfile.mkdtemp(prefix="bst_msprof_")
    pts, _ = make_building_cloud(
        seed=0, spacing_mm=25.0, width_mm=12_000.0, depth_mm=9_000.0,
        wall_h_mm=6_000.0, ridge_h_mm=8_000.0, noise_mm=8.0,
    )
    in_path = os.path.join(tmp, "scan.ply")
    write_ply(HostPointCloud(positions=pts), in_path, position_scale=1e-3)
    n = len(pts)

    t = {}

    def mark(name, t0):
        t[name] = round(time.perf_counter() - t0, 4)
        return time.perf_counter()

    # warm all jit buckets once
    t0 = time.perf_counter()
    cloud = read_ply(in_path, position_scale=cfg.position_scale)
    t0 = mark("read_ply", t0)

    bucket = _bucket_capacity(cloud.count, cfg)
    import dataclasses

    ccfg = dataclasses.replace(cfg, pad_to_multiple=bucket)
    capacity = ccfg.padded_count(n)

    def device_part(batch):
        return run_device_pipeline(
            batch.positions, batch.mask,
            k_search=max(ccfg.knn_k_pad, ccfg.normal_max_nn),
            knn_k=ccfg.knn_k, normal_radius=ccfg.normal_radius,
            normal_max_nn=ccfg.normal_max_nn,
            th_thickness=ccfg.th_thickness,
            th_normal_cos=ccfg.th_normal_cos,
            th_point_count=ccfg.th_point_count,
            max_planes=ccfg.max_planes, max_sweeps=ccfg.max_sweeps,
            knn_method=resolve_knn_method(ccfg, capacity),
            knn_window_size=ccfg.knn_window,
            th_seed_curvature=ccfg.th_seed_curvature,
            convergence_tol=ccfg.seg_convergence_tol,
            seg_group=ccfg.seg_group, seg_levels=ccfg.seg_levels,
            seg_refine_sweeps=ccfg.seg_refine_sweeps,
        )

    batch = PointBatch.from_numpy(cloud.positions, capacity=capacity)
    shifted, lo, seg = device_part(batch)          # compile + run
    np.asarray(seg.plane_idx[0])                   # real sync
    t0 = time.perf_counter()

    # --- steady state, staged ---
    batch = PointBatch.from_numpy(cloud.positions, capacity=capacity)
    t0 = mark("h2d_upload", t0)

    shifted, lo, seg = device_part(batch)
    np.asarray(seg.num_planes)                     # sync on a scalar
    t0 = mark("device_pipeline", t0)

    plane_idx = np.asarray(seg.plane_idx)
    t0 = mark("fetch_plane_idx", t0)

    shifted_h = np.asarray(shifted)
    t0 = mark("fetch_shifted", t0)

    colors = colorize_planes(plane_idx[:n], int(seg.num_planes))
    t0 = mark("colorize", t0)

    out_cloud = HostPointCloud(positions=shifted_h[:n], colors=colors)
    out_path = os.path.join(tmp, "out.ply")
    write_ply(out_cloud, out_path, position_scale=cfg.output_scale)
    t0 = mark("write_ply", t0)

    # host-side shift alternative: positions - lo on host
    lo_h = np.asarray(lo)
    shifted_alt = cloud.positions - lo_h[None, :]
    t0 = mark("host_shift_alt", t0)
    assert np.array_equal(shifted_alt, shifted_h[:n]), "host shift differs"

    from buildingsegment_tpu.pipeline import PipelineOutput
    from buildingsegment_tpu.raster.ortho import render_ortho_views

    out = PipelineOutput(
        cloud=out_cloud, plane_idx=plane_idx[:n],
        num_planes=int(seg.num_planes),
        plane_normals=np.asarray(seg.plane_normal),
        plane_centers=np.asarray(seg.plane_center),
        plane_counts=np.asarray(seg.plane_count),
        bbox_min=lo_h, timings={}, diagnostics={},
    )
    t0 = time.perf_counter()
    render_ortho_views(out, os.path.join(tmp, "r"), cfg)
    t0 = mark("render_ortho_views", t0)

    t["points"] = n
    t["sum_steady"] = round(sum(
        v for k, v in t.items()
        if k not in ("read_ply", "points", "host_shift_alt")
    ), 4)
    print(json.dumps(t))


if __name__ == "__main__":
    main()
