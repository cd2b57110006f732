"""Per-stage TPU timing breakdown for the production pipeline.

Times each piece of the window+multigrid path separately (steady-state,
compile excluded) so optimization effort goes where the milliseconds
are.  Run on the real chip:  python tools/perf_breakdown.py
"""

import functools
import json
import time

import numpy as np



def _sync(out):
    """Force completion: the axon tunnel's block_until_ready is a
    no-op, so synchronize by fetching one element to the host."""
    import jax
    import numpy as np

    # last leaf: multi-program outputs complete in dispatch order —
    # syncing the first leaf misses the final program (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, reps=8):
    """Pipelined steady-state timing: dispatch ``reps`` calls, one
    host sync at the end (sync overhead amortizes as 1/reps).  The
    first (compiling) call retries through remote-compile SIGKILL
    flakes — compile progress is cached per program, so each retry
    resumes where the last died."""
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
    from buildingsegment_tpu.core.morton import morton_argsort
    from buildingsegment_tpu.ops.fused import knn_normals_window_sorted
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid
    from buildingsegment_tpu.seg.region_grow import (
        segment_planes,
        window_seeds,
    )
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

    def put(key, thunk):
        # incremental emission (lab lesson, commit 8600347): a timeout
        # kill keeps every completed stage
        try:
            out[key] = round(thunk() * 1e3, 2)
        except Exception as e:  # pragma: no cover
            out[key] = f"error:{type(e).__name__}"
        print(f"[stage] {key}: {out[key]}", flush=True)

    sort = jax.jit(morton_argsort)
    put("morton_argsort_ms", lambda: timed(lambda: sort(pos_j, mask_j)))
    order = sort(pos_j, mask_j)

    gather = jax.jit(lambda o: (pos_j[o].astype(jnp.float32), mask_j[o]))
    put("sort_gather_ms", lambda: timed(lambda: gather(order)))
    sposf, smask = gather(order)
    spos = pos_j[order]

    put("fused_knn_normals_w64_ms", lambda: timed(
        lambda: knn_normals_window_sorted(
            sposf, smask, k=16, window=64, radius=100.0
        )
    ))
    nb_i, nb_d, normals, curv = knn_normals_window_sorted(
        sposf, smask, k=16, window=64, radius=100.0
    )
    put("fused_knn_normals_w32_ms", lambda: timed(
        lambda: knn_normals_window_sorted(
            sposf, smask, k=16, window=32, radius=100.0
        )
    ))

    put("window_seeds_w16_ms", lambda: timed(
        lambda: window_seeds(
            sposf, normals, smask, nb_d[:, 15], window=16
        )
    ))

    from buildingsegment_tpu.ops.stats_sweep import (
        knn_normals_window_stats,
    )

    put("stats_sweep_w64_ms", lambda: timed(
        lambda: knn_normals_window_stats(
            sposf, smask, k=15, window=64, radius=100.0, max_nn=50
        )
    ))

    # full multigrid (production: group=4, levels=2, refine=3)
    def mg(**kw):
        a = dict(
            neigh_sq_dist=nb_d[:, :15], max_edge_dist=600.0,
            th_point_count=400, max_planes=1024, window=16,
            group=4, levels=2, refine_sweeps=3,
        )
        a.update(kw)
        return segment_planes_multigrid(spos, normals, nb_i[:, :15], smask, **a)

    put("multigrid_g4_l2_r3_ms", lambda: timed(lambda: mg()))
    res = mg()
    out["mg_sweeps"] = int(res.num_sweeps)
    out["mg_planes"] = int(res.num_planes)
    put("multigrid_r0_ms", lambda: timed(lambda: mg(refine_sweeps=0)))
    put("multigrid_r1_ms", lambda: timed(lambda: mg(refine_sweeps=1)))
    put("multigrid_l1_ms", lambda: timed(lambda: mg(levels=1)))
    put("multigrid_g16_l1_ms", lambda: timed(lambda: mg(group=16, levels=1)))
    put("multigrid_noanchor_ms", lambda: timed(
        lambda: mg(th_anchor_cos=0.0)
    ))

    # the coarse solver alone at N/16 (what the recursion bottoms out in)
    g = 16
    ngc = capacity // g
    gpos = (
        jnp.where(smask[:, None], sposf, 0.0)
        .reshape(ngc, g, 3)
        .mean(axis=1)
        .astype(jnp.int32)
    )
    gnrm = normals.reshape(ngc, g, 3).mean(axis=1)
    gmask = smask.reshape(ngc, g).any(axis=1)
    rows = jnp.arange(ngc, dtype=jnp.int32)[:, None]
    gidx = jnp.concatenate([rows, rows], axis=1)
    gseed = gmask

    def coarse_solve():
        return segment_planes(
            gpos, gnrm, gidx, gmask, seed_override=gseed,
            max_edge_dist=600.0, th_point_count=6, max_planes=1024,
            propagation="window", window=16,
        )

    put("coarse_solve_n16_ms", lambda: timed(coarse_solve))
    out["coarse_solve_sweeps"] = int(coarse_solve().num_sweeps)

    # unsort (sorting-network inversion vs scatter)
    from buildingsegment_tpu.core.morton import unsort_by

    unsort = jax.jit(lambda lab: unsort_by(order, lab))
    put("unsort_sortnet_ms", lambda: timed(lambda: unsort(res.plane_idx)))

    # end-to-end pipelines (the bench headline path + the non-sharded
    # single-device path) — composition check against the stage sums
    from buildingsegment_tpu.dist.mesh import make_mesh
    from buildingsegment_tpu.dist.sharded import sharded_pipeline

    mesh = make_mesh(len(jax.devices()))
    sfn = sharded_pipeline(mesh, cfg, capacity_hint=capacity)
    put("e2e_sharded_ms", lambda: timed(lambda: sfn(pos_j, mask_j)))

    from buildingsegment_tpu.pipeline import run_device_pipeline

    dfn = functools.partial(
        run_device_pipeline,
        k_search=16, knn_k=15, normal_radius=cfg.normal_radius,
        normal_max_nn=cfg.normal_max_nn, th_thickness=cfg.th_thickness,
        th_normal_cos=cfg.th_normal_cos,
        th_point_count=cfg.th_point_count, max_planes=1024,
        max_sweeps=cfg.max_sweeps, knn_method="window",
        knn_window_size=cfg.knn_window, seg_group=cfg.seg_group,
        seg_levels=cfg.seg_levels,
        seg_refine_sweeps=cfg.seg_refine_sweeps,
        convergence_tol=cfg.seg_convergence_tol,
    )
    put("e2e_device_ms", lambda: timed(lambda: dfn(pos_j, mask_j)))

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
