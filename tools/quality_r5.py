"""Round-5 quality check of the bench speed candidates (CPU).

Production default (g4 l3 r2, density hint, full heal) vs the autotune
candidates bench.py offers: refine_sweeps 1/0 + coarse seeds, and the
one-shot g16 l1 shape (cheapest possible multigrid machinery: one
coarsen, one coarse solve, one refine, one finalize).  bij agreement
per scene so a fast-but-brittle candidate is visible before chip time.

JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/quality_r5.py
"""

import json

import numpy as np


def main():
    import jax.numpy as jnp

    from buildingsegment_tpu.core.morton import morton_argsort
    from buildingsegment_tpu.core.quantize import (
        estimate_spacing_mm,
        spacing_bucket_mm,
    )
    from buildingsegment_tpu.ops.knn import knn_window_sorted
    from buildingsegment_tpu.ops.normals import estimate_normals_window
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid
    from buildingsegment_tpu.utils.quality import bij_agreement
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
        "house150": make_building_cloud(
            seed=4, spacing_mm=150.0, width_mm=12000.0,
            depth_mm=9000.0, wall_h_mm=6000.0, ridge_h_mm=8000.0,
            noise_mm=8.0,
        ),
        "block": make_block_cloud(seed=2),
        "terrain": make_terrain_cloud(seed=3),
    }
    configs = [
        ("prod_g4l3r2", dict(group=4, levels=3, refine_sweeps=2)),
        ("l2", dict(group=4, levels=2, refine_sweeps=2)),
        ("l2r3", dict(group=4, levels=2, refine_sweeps=3)),
        ("r1", dict(group=4, levels=3, refine_sweeps=1)),
        ("r1_coarseseed", dict(group=4, levels=3, refine_sweeps=1,
                               seed_source="coarse")),
        ("r0_coarseseed", dict(group=4, levels=3, refine_sweeps=0,
                               seed_source="coarse")),
        ("g16l1r2", dict(group=16, levels=1, refine_sweeps=2)),
        ("g16l1r3", dict(group=16, levels=1, refine_sweeps=3)),
        ("g16l1r2_coarseseed", dict(group=16, levels=1,
                                    refine_sweeps=2,
                                    seed_source="coarse")),
    ]

    for name, (pts, truth) in scenes.items():
        n = len(pts)
        cap = ((n + 4095) // 4096) * 4096
        pos = np.full((cap, 3), 2**24, np.int32)
        pos[:n] = pts
        mask = np.zeros(cap, bool)
        mask[:n] = True
        hint = spacing_bucket_mm(estimate_spacing_mm(pts))
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
        row = {"scene": name, "points": n, "hint_mm": hint}
        for key, cfg in configs:
            res = segment_planes_multigrid(
                spos, normals, idx, smask,
                neigh_sq_dist=d, max_edge_dist=600.0,
                th_point_count=400, max_planes=1024, window=16,
                spacing_hint_mm=hint, **cfg,
            )
            row[key] = round(
                bij_agreement(struth, np.asarray(res.plane_idx)[sel]), 4
            )
            row[key + "_p"] = int(res.num_planes)
            print(json.dumps(row), flush=True)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
