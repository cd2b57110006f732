"""Compare multigrid configurations on the quality scenes (CPU).

Measures ground-truth agreement (greedy label matching) per scene per
(group, levels, refine_sweeps) config so speed/quality trades are
data-driven.  Run: JAX_PLATFORMS=cpu python tools/quality_sweep.py
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

    from buildingsegment_tpu.core.morton import morton_argsort
    from buildingsegment_tpu.ops.knn import knn_window_sorted
    from buildingsegment_tpu.ops.normals import estimate_normals_window
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid
    from buildingsegment_tpu.utils.synthetic import (
        make_block_cloud,
        make_building_cloud,
        make_terrain_cloud,
    )

    scenes = {
        "house80": make_building_cloud(
            seed=0, spacing_mm=80.0, width_mm=12000.0, depth_mm=9000.0,
            wall_h_mm=6000.0, ridge_h_mm=8000.0, noise_mm=8.0,
        ),
        "house40": make_building_cloud(
            seed=1, spacing_mm=40.0, width_mm=9000.0, depth_mm=7000.0,
            wall_h_mm=5000.0, ridge_h_mm=6500.0, noise_mm=8.0,
        ),
        "block": make_block_cloud(seed=2),
        "terrain": make_terrain_cloud(seed=3),
    }
    configs = [
        dict(group=4, levels=2, refine_sweeps=3),
        dict(group=8, levels=2, refine_sweeps=3),
        dict(group=8, levels=2, refine_sweeps=4),
        dict(group=4, levels=3, refine_sweeps=3),
        # anchor gate off in the coarse solve (the coherence filter
        # already excludes normal-blend groups there — is it redundant?)
        dict(group=4, levels=2, refine_sweeps=3, th_anchor_cos=0.0),
        dict(group=8, levels=2, refine_sweeps=3, th_anchor_cos=0.0),
        # one-shot ×16 coarsen: same bottom scale as g4_l2 without the
        # mid-level coarsen/refine/finalize passes
        dict(group=16, levels=1, refine_sweeps=3),
        dict(group=16, levels=1, refine_sweeps=4),
    ]

    for name, (pts, truth) in scenes.items():
        n = len(pts)
        cap = ((n + 4095) // 4096) * 4096
        pos = np.full((cap, 3), 2**24, np.int32)
        pos[:n] = pts
        mask = np.zeros(cap, bool)
        mask[:n] = True
        order = morton_argsort(jnp.asarray(pos), jnp.asarray(mask))
        spos = jnp.asarray(pos)[order]
        smask = jnp.asarray(mask)[order]
        sposf = spos.astype(jnp.float32)
        idx, d = knn_window_sorted(sposf, smask, 16, window=32)
        normals, _ = estimate_normals_window(
            sposf, smask, radius=300.0, window=64
        )
        struth = truth[np.asarray(order)[np.asarray(smask)]]
        sel = np.asarray(smask)
        row = {"scene": name, "points": n}
        for cfg in configs:
            res = segment_planes_multigrid(
                spos, normals, idx, smask,
                neigh_sq_dist=d, max_edge_dist=600.0,
                th_point_count=400, max_planes=1024, window=16, **cfg,
            )
            key = f"g{cfg['group']}_l{cfg['levels']}_r{cfg['refine_sweeps']}"
            if cfg.get("th_anchor_cos") == 0.0:
                key += "_noanchor"
            row[key] = round(
                _truth_agreement(struth, np.asarray(res.plane_idx)[sel]), 4
            )
            row[key + "_planes"] = int(res.num_planes)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
