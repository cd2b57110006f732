"""Stage breakdown at the WINNING bench config (w48, levels=3,
refine_sweeps=2, compact, stats bitonic+offsets+sym).

perf_breakdown times the base config; the bench headline now ships the
autotuned winner, so optimization targets must be ranked against the
winner's own stage splits.  Run on the real chip:
    python tools/tpu_run.py perf_winner
"""

import json

import numpy as np


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, reps=8):
    import time

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
    import functools

    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.core.morton import morton_sort, unsort_by
    from buildingsegment_tpu.ops.stats_sweep import knn_normals_window_stats
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid
    from buildingsegment_tpu.seg.region_grow import window_seeds
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    pts, _ = make_building_cloud(
        seed=0, spacing_mm=25.0, width_mm=12_000.0, depth_mm=9_000.0,
        wall_h_mm=6_000.0, ridge_h_mm=8_000.0, noise_mm=8.0,
    )
    n = len(pts)
    cfg = PipelineConfig(pad_to_multiple=2048)
    capacity = cfg.padded_count(n)
    pos = np.full((capacity, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    pos_j, mask_j = jnp.asarray(pos), jnp.asarray(mask)
    out = {"points": n, "capacity": capacity}

    sort = jax.jit(morton_sort)
    out["morton_sort_ms"] = timed(lambda: sort(pos_j, mask_j)) * 1e3
    spos, smask, order = sort(pos_j, mask_j)
    sposf = spos.astype(jnp.float32)

    # winning stats variant at w48 (vs the w64 default)
    for w in (48, 64):
        out[f"stats_w{w}_sym_ms"] = timed(
            lambda w=w: knn_normals_window_stats(
                sposf, smask, k=15, window=w, radius=100.0, max_nn=50,
                rank_mode="bitonic", store_offsets=True, sym=True,
            )
        ) * 1e3
    dk, normals, curv = knn_normals_window_stats(
        sposf, smask, k=15, window=48, radius=100.0, max_nn=50,
        rank_mode="bitonic", store_offsets=True, sym=True,
    )
    for mode in ("pair", "sym"):
        out[f"seeds_{mode}_ms"] = timed(
            lambda mode=mode: window_seeds(
                sposf, normals, smask, dk, window=16,
                seed_mode=mode,
            )
        ) * 1e3

    rows_i = jnp.arange(spos.shape[0], dtype=jnp.int32)
    g_idx = jnp.stack([rows_i, rows_i], axis=1)

    def mg(compact):
        return segment_planes_multigrid(
            spos, normals, g_idx, smask,
            kth_sq_dist=dk, curvature=curv, max_edge_dist=600.0,
            th_point_count=400, max_planes=1024, window=16,
            group=4, levels=3, refine_sweeps=2, compact=compact,
        )

    out["multigrid_l3_r2_compact_ms"] = timed(lambda: mg(True)) * 1e3
    out["multigrid_l3_r2_xla_ms"] = timed(lambda: mg(False)) * 1e3
    res = mg(True)
    out["mg_sweeps"] = int(res.num_sweeps)
    out["mg_planes"] = int(res.num_planes)

    unsort = jax.jit(lambda lab: unsort_by(order, lab))
    out["unsort_ms"] = timed(lambda: unsort(res.plane_idx)) * 1e3

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
