"""Benchmark: end-to-end segmentation throughput on the available device.

Prints one JSON line:
    {"metric": "...", "value": N, "unit": "Mpoints/sec", "vs_baseline": N}

The baseline is the BASELINE.json north star: ≥ 50 Mpoints/sec
end-to-end segmentation on a TPU v5e-8 (the reference binary publishes
no numbers).  This harness runs on however many chips are visible and
reports the measured device-pipeline throughput (compile excluded,
synthetic ~1M-point building scene, reference-default thresholds).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.dist.mesh import make_mesh
    from buildingsegment_tpu.dist.sharded import sharded_pipeline
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    n_dev = len(jax.devices())

    # ~1M-point dense building scene (config 1/4 shape): 25 mm spacing
    pts, _ = make_building_cloud(
        seed=0,
        spacing_mm=25.0,
        width_mm=12_000.0,
        depth_mm=9_000.0,
        wall_h_mm=6_000.0,
        ridge_h_mm=8_000.0,
        noise_mm=8.0,
    )
    n = len(pts)

    cfg = PipelineConfig(pad_to_multiple=2048 * max(n_dev, 1))
    capacity = cfg.padded_count(n)
    pos = np.full((capacity, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(capacity, bool)
    mask[:n] = True

    mesh = make_mesh(n_dev)
    fn = sharded_pipeline(mesh, cfg, capacity_hint=capacity)
    pos_j, mask_j = jnp.asarray(pos), jnp.asarray(mask)

    # compile + warm up
    _, _, seg = fn(pos_j, mask_j)
    jax.block_until_ready(seg.plane_idx)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _, _, seg = fn(pos_j, mask_j)
        jax.block_until_ready(seg.plane_idx)
    dt = (time.perf_counter() - t0) / reps

    mpts = n / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "end_to_end_segmentation_throughput",
                "value": round(mpts, 3),
                "unit": "Mpoints/sec",
                "vs_baseline": round(mpts / 50.0, 4),
                "points": n,
                "devices": n_dev,
                "seconds_per_scan": round(dt, 4),
                "planes_found": int(seg.num_planes),
            }
        )
    )


if __name__ == "__main__":
    main()
