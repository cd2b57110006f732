"""Stage breakdown at the WINNING bench config (w48, levels=3,
refine_sweeps=2, compact, stats bitonic+offsets+sym).

perf_breakdown times the base config; the bench headline now ships the
autotuned winner, so optimization targets must be ranked against the
winner's own stage splits.  Every measurement is guarded and the JSON
prints even on a mid-lab failure (a remote-compile SIGKILL at the
multigrid stage once cost a whole 24-minute run its output).

Run on the real chip:  python tools/tpu_run.py perf_winner
"""

import json

import numpy as np


def _sync(out):
    import jax

    # last leaf: multi-program outputs complete in dispatch order —
    # syncing the first leaf misses the final program (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[-1]
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
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.core.morton import (
        morton_sort,
        unsort_by,
        unsort_labels,
    )
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

    def stage(key, fn):
        """Guard each measurement: a compile flake that survives
        timed()'s retries costs one entry, not the whole lab."""
        try:
            out[key] = round(timed(fn) * 1e3, 2)
        except Exception as e:  # pragma: no cover
            out[key] = f"error:{type(e).__name__}"
        # print incrementally: a SIGTERM mid-compile must not cost the
        # stages already measured (the finally-block JSON never runs
        # when timeout(1) kills the process)
        print(f"[stage] {key}: {out[key]}", flush=True)

    try:
        sort = jax.jit(morton_sort, static_argnums=(2,))
        stage("morton_sort_ms", lambda: sort(pos_j, mask_j, False))
        stage("morton_sort_small_ms", lambda: sort(pos_j, mask_j, True))
        spos, smask, order = sort(pos_j, mask_j, False)
        sposf = spos.astype(jnp.float32)

        # winning stats variant at w48 (vs the w64 default)
        for w in (48, 64):
            stage(f"stats_w{w}_sym_ms", lambda w=w: knn_normals_window_stats(
                sposf, smask, k=15, window=w, radius=100.0, max_nn=50,
                rank_mode="bitonic", store_offsets=True, sym=True,
            ))
        dk, normals, curv = knn_normals_window_stats(
            sposf, smask, k=15, window=48, radius=100.0, max_nn=50,
            rank_mode="bitonic", store_offsets=True, sym=True,
        )
        for mode in ("pair", "sym"):
            stage(f"seeds_{mode}_ms", lambda mode=mode: window_seeds(
                sposf, normals, smask, dk, window=16, seed_mode=mode,
            ))

        rows_i = jnp.arange(spos.shape[0], dtype=jnp.int32)
        g_idx = jnp.stack([rows_i, rows_i], axis=1)

        def mg(compact):
            return segment_planes_multigrid(
                spos, normals, g_idx, smask,
                kth_sq_dist=dk, curvature=curv, max_edge_dist=600.0,
                th_point_count=400, max_planes=1024, window=16,
                group=4, levels=3, refine_sweeps=2, compact=compact,
            )

        stage("multigrid_l3_r2_compact_ms", lambda: mg(True))
        stage("multigrid_l3_r2_xla_ms", lambda: mg(False))

        # decompose the winner's multigrid: refine cost (r0 vs r2),
        # level scaling (l2/l4), and the coarsen+seed floor (r0 at l4
        # bottoms out in a trivial solve)
        def mgv(**kw):
            a = dict(levels=3, refine_sweeps=2, compact=True)
            a.update(kw)
            return segment_planes_multigrid(
                spos, normals, g_idx, smask,
                kth_sq_dist=dk, curvature=curv, max_edge_dist=600.0,
                th_point_count=400, max_planes=1024, window=16,
                group=4, **a,
            )

        stage("multigrid_l3_r0_ms", lambda: mgv(refine_sweeps=0))
        stage("multigrid_l3_r1_ms", lambda: mgv(refine_sweeps=1))
        stage("multigrid_l2_r2_ms", lambda: mgv(levels=2))
        stage("multigrid_l4_r2_ms", lambda: mgv(levels=4))
        stage("multigrid_l3_r2_seedsym_ms",
              lambda: mgv(seed_mode="sym"))
        try:
            res = mg(True)
            out["mg_sweeps"] = int(res.num_sweeps)
            out["mg_planes"] = int(res.num_planes)
            labels = res.plane_idx
        except Exception:  # pragma: no cover
            labels = jnp.zeros((capacity,), jnp.int32)

        u0 = jax.jit(lambda o, l: unsort_by(o, l))
        u1 = jax.jit(lambda o, l: unsort_labels(o, l, 1024))
        u2 = jax.jit(lambda o, l: unsort_labels(o, l, 4096))
        stage("unsort_ms", lambda: u0(order, labels))
        stage("unsort_packed_ms", lambda: u1(order, labels))
        stage("unsort_i16_ms", lambda: u2(order, labels))
    finally:
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
