"""knn_window width trade: e2e speed vs bench-scene agreement.

The stats sweep is ~26 ms at w=64 and ~23 ms at w=48 (perf_stats_lab);
adopting w=48 in production must not trade away the bench quality gate
(bij agreement ≥ 0.97 on the 25 mm scene).  This tool measures both
sides on the real chip.

Run:  python tools/perf_window_quality.py
"""

import dataclasses
import json
import time

import numpy as np


def _sync(out):
    import jax

    # last leaf: multi-program outputs complete in dispatch order —
    # syncing the first leaf misses the final program (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, reps=8):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.dist.mesh import make_mesh
    from buildingsegment_tpu.dist.sharded import sharded_pipeline
    from buildingsegment_tpu.utils.quality import bij_agreement
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    pts, truth = make_building_cloud(
        seed=0, spacing_mm=25.0, width_mm=12_000.0, depth_mm=9_000.0,
        wall_h_mm=6_000.0, ridge_h_mm=8_000.0, noise_mm=8.0,
    )
    n = len(pts)
    n_dev = len(jax.devices())
    base = PipelineConfig(pad_to_multiple=2048 * max(n_dev, 1))
    capacity = base.padded_count(n)
    pos = np.full((capacity, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    pos_j, mask_j = jnp.asarray(pos), jnp.asarray(mask)
    mesh = make_mesh(n_dev)

    out = {"points": n}
    for w in (64, 48):
        cfg = dataclasses.replace(base, knn_window=w)
        fn = sharded_pipeline(mesh, cfg, capacity_hint=capacity)
        dt, (_, _, seg) = timed(lambda: fn(pos_j, mask_j))
        agree = bij_agreement(truth, np.asarray(seg.plane_idx)[:n])
        out[f"w{w}_mpts"] = round(n / dt / 1e6, 2)
        out[f"w{w}_agreement"] = round(agree, 4)
        out[f"w{w}_planes"] = int(seg.num_planes)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
