"""th_anchor_cos sweep through the PRODUCTION pipeline (CPU).

The anchor-pure model gate has a measured conflict:
  * OFF, shallow-dihedral scenes (ridge pitch pairs ~39 deg apart)
    MERGE — the region mean drifts through the ridge blend strip to a
    near-horizontal normal that accepts both pitches;
  * ON at 0.95, house40/block over-fragment (14 planes vs 7).

This sweeps intermediate values through run_device_pipeline (window
method — exactly the production path) on four scenes to find a value
that separates shallow ridges without fragmenting.

Run:  JAX_PLATFORMS=cpu python tools/anchor_sweep.py
"""

import json

import numpy as np


def _truth_agreement(truth, labels):
    pairs = {}
    for a, b in zip(truth.tolist(), labels.tolist()):
        pairs[(a, b)] = pairs.get((a, b), 0) + 1
    ua, ub, good = set(), set(), 0
    for (a, b), c in sorted(pairs.items(), key=lambda kv: -kv[1]):
        if a in ua or b in ub:
            continue
        ua.add(a)
        ub.add(b)
        good += c
    return good / len(truth)


def main():
    import jax.numpy as jnp

    from buildingsegment_tpu.config import DEFAULT_CONFIG as cfg
    from buildingsegment_tpu.pipeline import run_device_pipeline
    from buildingsegment_tpu.utils.synthetic import (
        make_block_cloud,
        make_building_cloud,
    )

    scenes = {
        # the parity scene that regressed with anchor off (3 planes)
        "shallow6": (make_building_cloud(
            seed=6, spacing_mm=50.0, width_mm=4000.0, depth_mm=3000.0,
            wall_h_mm=2500.0, ridge_h_mm=3200.0, noise_mm=5.0,
            walls=False), 3),
        # full gabled house, moderate density
        "house80": (make_building_cloud(
            seed=0, spacing_mm=80.0, width_mm=12000.0, depth_mm=9000.0,
            wall_h_mm=6000.0, ridge_h_mm=8000.0, noise_mm=8.0), 7),
        # the scene where anchor 0.95 over-fragmented
        "house40s": (make_building_cloud(
            seed=1, spacing_mm=60.0, width_mm=9000.0, depth_mm=7000.0,
            wall_h_mm=5000.0, ridge_h_mm=6500.0, noise_mm=8.0), 7),
        "block": (make_block_cloud(seed=2), None),
    }

    anchors = [None, 0.7, 0.8, 0.88, 0.95]
    for name, ((pts, truth), nplanes) in scenes.items():
        n = len(pts)
        capacity = ((n + 2047) // 2048) * 2048
        pos = np.full((capacity, 3), 2**24, np.int32)
        pos[:n] = pts
        mask = np.zeros(capacity, bool)
        mask[:n] = True
        pj, mj = jnp.asarray(pos), jnp.asarray(mask)
        row = {"scene": name, "points": n, "expect_planes": nplanes}
        for a in anchors:
            _, _, seg = run_device_pipeline(
                pj, mj,
                k_search=max(cfg.knn_k_pad, cfg.normal_max_nn),
                knn_k=cfg.knn_k, normal_radius=cfg.normal_radius,
                normal_max_nn=cfg.normal_max_nn,
                th_thickness=cfg.th_thickness,
                th_normal_cos=cfg.th_normal_cos,
                th_point_count=cfg.th_point_count,
                max_planes=cfg.max_planes, max_sweeps=cfg.max_sweeps,
                knn_method="window", knn_window_size=cfg.knn_window,
                convergence_tol=cfg.seg_convergence_tol,
                seg_group=cfg.seg_group, seg_levels=cfg.seg_levels,
                seg_refine_sweeps=cfg.seg_refine_sweeps,
                seg_anchor_cos=a,
            )
            key = "default" if a is None else f"a{a}"
            row[f"{key}_agree"] = round(
                _truth_agreement(truth, np.asarray(seg.plane_idx)[:n]), 4
            )
            row[f"{key}_planes"] = int(seg.num_planes)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
