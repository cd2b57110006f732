"""Multigrid round 2: coarse-seed gate, seedsym/l4 retries, honest e2e.

Follow-up to tools/perf_winner.py's decomposition (2026-08-19):
l3 r2 compact = 33.8 ms of which refine sweeps ~3.8 ms each; the 26 ms
r0 floor contains the fine window_seeds sweep (~4-5.5 ms).  This lab
measures the new seed_source="coarse" gate (seg/coarse.py — derives the
seed mask from the coarsen pass's own coherence statistics, deleting
the fine sweep), retries the two variants the remote-compile flake ate
(l4, in-mg seedsym), and times the HONEST end-to-end headline (post
sync-last-leaf fix) at the winning config and at winner+coarse-seed.

Run on the real chip:  python tools/tpu_run.py perf_mg2
"""

import json

import numpy as np


def _sync(out):
    import jax

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
    return (time.perf_counter() - t0) / reps, out


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.core.morton import morton_sort
    from buildingsegment_tpu.dist.mesh import make_mesh
    from buildingsegment_tpu.dist.sharded import sharded_pipeline
    from buildingsegment_tpu.ops.stats_sweep import knn_normals_window_stats
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid
    from buildingsegment_tpu.utils.quality import bij_agreement
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    pts, truth = make_building_cloud(
        seed=0, spacing_mm=25.0, width_mm=12_000.0, depth_mm=9_000.0,
        wall_h_mm=6_000.0, ridge_h_mm=8_000.0, noise_mm=8.0,
    )
    n = len(pts)
    cfg = PipelineConfig(
        pad_to_multiple=2048,
        knn_window=48, seg_levels=3, seg_refine_sweeps=2,
        seg_compact=True, stats_rank_mode="bitonic",
        stats_store_offsets=True, stats_sym=True,
        morton_small=bool(pts.max() - pts.min() < (1 << 20)),
    )
    capacity = cfg.padded_count(n)
    pos = np.full((capacity, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    pos_j, mask_j = jnp.asarray(pos), jnp.asarray(mask)
    out = {"points": n, "capacity": capacity}

    def stage(key, fn, reps=8):
        try:
            dt, o = timed(fn, reps=reps)
            out[key] = round(dt * 1e3, 2)
        except Exception as e:  # pragma: no cover
            out[key] = f"error:{type(e).__name__}"
            o = None
        # incremental print: survive a mid-lab SIGTERM (no finally)
        print(f"[stage] {key}: {out[key]}", flush=True)
        return o

    try:
        sort = jax.jit(morton_sort, static_argnums=(2,))
        spos, smask, order = sort(pos_j, mask_j, True)
        sposf = spos.astype(jnp.float32)
        dk, normals, curv = knn_normals_window_stats(
            sposf, smask, k=15, window=48, radius=100.0, max_nn=50,
            rank_mode="bitonic", store_offsets=True, sym=True,
        )

        def mgv(**kw):
            a = dict(levels=3, refine_sweeps=2, compact=True)
            a.update(kw)
            return segment_planes_multigrid(
                spos, normals,
                jnp.stack([jnp.arange(spos.shape[0], dtype=jnp.int32)] * 2,
                          axis=1),
                smask,
                kth_sq_dist=dk, curvature=curv, max_edge_dist=600.0,
                th_point_count=400, max_planes=1024, window=16,
                group=4, **a,
            )

        # label agreement sanity for each mg variant (vs truth)
        sel = np.asarray(smask)
        struth = truth[np.asarray(order)[sel]]

        def ag(res):
            if res is None:
                return None
            return round(
                bij_agreement(struth, np.asarray(res.plane_idx)[sel]), 4
            )

        r = stage("mg_l3_r2_coarseseed_ms",
                  lambda: mgv(seed_source="coarse"))
        out["mg_coarseseed_agreement"] = ag(r)
        r = stage("mg_l3_r2_seedsym_ms", lambda: mgv(seed_mode="sym"))
        out["mg_seedsym_agreement"] = ag(r)
        r = stage("mg_l3_r2_coarse_sym_ms",
                  lambda: mgv(seed_source="coarse", seed_mode="sym"))
        r = stage("mg_l4_r2_ms", lambda: mgv(levels=4))
        out["mg_l4_agreement"] = ag(r)
        r = stage("mg_l4_r2_coarseseed_ms",
                  lambda: mgv(levels=4, seed_source="coarse"))

        # honest e2e at the winning config (post sync-fix), then with
        # the coarse-seed gate
        mesh = make_mesh(1)

        def e2e(c):
            fn = sharded_pipeline(mesh, c, capacity_hint=capacity)
            dt, (_, _, seg) = timed(lambda: fn(pos_j, mask_j))
            return dt, seg

        for tag, reps_d in (
            ("winner", {}),
            ("winner_coarseseed", {"seg_seed_source": "coarse"}),
        ):
            try:
                dt, seg = e2e(dataclasses.replace(cfg, **reps_d))
                out[f"e2e_{tag}_ms"] = round(dt * 1e3, 2)
                out[f"e2e_{tag}_mpts"] = round(n / dt / 1e6, 2)
                lab = np.asarray(seg.plane_idx)[:n]
                out[f"e2e_{tag}_agreement"] = round(
                    bij_agreement(truth, lab), 4
                )
            except Exception as e:
                out[f"e2e_{tag}_ms"] = f"error:{type(e).__name__}"
            print(f"[stage] e2e_{tag}: {out.get(f'e2e_{tag}_ms')} "
                  f"{out.get(f'e2e_{tag}_agreement')}", flush=True)
    finally:
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
