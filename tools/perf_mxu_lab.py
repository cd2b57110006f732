"""Chip timing: block-MXU stats + seed kernels vs production defaults.

Run on the real chip:  python tools/perf_mxu_lab.py
"""

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
    for a in range(8):
        try:
            out = fn()
            break
        except Exception as e:
            if "remote_compile" not in str(e) or a == 7:
                raise
            time.sleep(min(10 + 5 * a, 40))
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.core.morton import morton_sort
    from buildingsegment_tpu.ops.fused import knn_normals_window_sorted
    from buildingsegment_tpu.ops.stats_mxu import (
        fused_stats_mxu, seed_sweep_mxu,
    )
    from buildingsegment_tpu.ops.stats_sweep import fused_stats_sweep
    from buildingsegment_tpu.ops.window_sweep import (
        make_dyn_row, make_slab, make_spine, seed_sweep_pair,
    )
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    pts, _ = make_building_cloud(
        seed=0, spacing_mm=25.0, width_mm=12_000.0, depth_mm=9_000.0,
        wall_h_mm=6_000.0, ridge_h_mm=8_000.0, noise_mm=8.0,
    )
    n = len(pts)
    cap = -(-n // 2048) * 2048
    pos = np.full((cap, 3), 2 ** 24, np.int32)
    pos[:n] = pts
    mask = np.zeros(cap, bool)
    mask[:n] = True
    spos, smask, _ = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
    sposf = spos.astype(jnp.float32)
    out = {"points": n}

    # --- stats: production (stored+bitonic) vs MXU at several tiles ---
    for w in (64, 48):
        slab = make_slab(
            [sposf[:, 0], sposf[:, 1], sposf[:, 2],
             smask.astype(jnp.float32)],
            [-3e7, -3e7, -3e7, 0.0], w, 8192, rows_out=8,
        )
        try:
            dt = timed(lambda: fused_stats_sweep(
                slab, cap, k=15, w=w, tile=8192, radius=100.0,
                max_nn=50, rank_mode="bitonic", store_offsets=True,
            ))
            out[f"stats_w{w}_stored_bitonic_ms"] = round(dt * 1e3, 2)
        except Exception as e:
            out[f"stats_w{w}_stored_bitonic_ms"] = (
                f"error:{type(e).__name__}:{str(e)[:160]}"
            )
        for tile in (8192, 16384):
            slab_t = slab if tile == 8192 else make_slab(
                [sposf[:, 0], sposf[:, 1], sposf[:, 2],
                 smask.astype(jnp.float32)],
                [-3e7, -3e7, -3e7, 0.0], w, tile, rows_out=8,
            )
            try:
                dt = timed(lambda: fused_stats_mxu(
                    slab_t, cap, k=15, w=w, tile=tile, radius=100.0,
                    max_nn=50,
                ))
                out[f"stats_mxu_w{w}_t{tile}_ms"] = round(dt * 1e3, 2)
            except Exception as e:
                out[f"stats_mxu_w{w}_t{tile}_ms"] = (
                    f"error:{type(e).__name__}:{str(e)[:200]}"
                )

    # --- seeds: pair vs MXU on the production w16 spine ---
    _, nb_d, nrm, _ = knn_normals_window_sorted(
        sposf, smask, 16, window=64, radius=100.0, max_nn=50
    )
    dk = nb_d[:, 14]
    for tile in (32768, 8192):
        spine = make_spine(
            (sposf[:, 0], sposf[:, 1], sposf[:, 2]),
            (nrm[:, 0], nrm[:, 1], nrm[:, 2]),
            smask.astype(jnp.float32), 16, tile,
        )
        dyn = make_dyn_row(dk, 0.0, 16, tile)
        kw = dict(w=16, tile=tile, th_thickness=300.0,
                  th_normal_cos=0.88, signed=False)
        try:
            dt = timed(lambda: seed_sweep_pair(spine, dyn, cap, **kw))
            out[f"seed_pair_t{tile}_ms"] = round(dt * 1e3, 2)
        except Exception as e:
            out[f"seed_pair_t{tile}_ms"] = f"error:{type(e).__name__}"
        try:
            dt = timed(lambda: seed_sweep_mxu(spine, dyn, cap, **kw))
            out[f"seed_mxu_t{tile}_ms"] = round(dt * 1e3, 2)
        except Exception as e:
            out[f"seed_mxu_t{tile}_ms"] = f"error:{type(e).__name__}:{str(e)[:200]}"

    # chip-level agreement spot check (quality gate runs in bench)
    try:
        a = np.asarray(seed_sweep_pair(
            spine, dyn, cap, w=16, tile=8192, th_thickness=300.0,
            th_normal_cos=0.88, signed=False))
        b = np.asarray(seed_sweep_mxu(
            spine, dyn, cap, w=16, tile=8192, th_thickness=300.0,
            th_normal_cos=0.88, signed=False))
        out["seed_mismatch_frac"] = round(float(np.mean(a != b)), 6)
    except Exception as e:
        out["seed_mismatch_frac"] = f"error:{type(e).__name__}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
