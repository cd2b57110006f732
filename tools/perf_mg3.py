"""Multigrid fine-level floor attribution: coarsen | finalize | seeds.

perf_winner (2026-08-19) pinned the winner's multigrid at 33.8 ms with
refine ~3.8 ms/sweep and a 26 ms r0 floor that includes the ~4-5.5 ms
fine window_seeds sweep.  The remaining ~21 ms floor is coarsen +
finalize at each level + the 17k-row coarse solve.  This lab times the
fine-level (1.08M-row) pieces in isolation so the next kernel
consolidation targets the real cost:

- ``coarsen_ms``: the group-stats block (means, coherence) exactly as
  seg/coarse.py computes it (~25 XLA ops — dispatch-floor suspect).
- ``finalize_ms``: the plane_sums one-hot segsum + renumber block on a
  synthetic label field at 1.08M rows.
- ``seeds_w16_ms``: the fine window_seeds sweep (known, for scale).
- ``refine1_ms``: one refine_table_sweep_pair sweep (known ~3.8).
- ``mg_l{2,3}_r0_noseed_ms``: the recursion floor with BOTH seeds and
  refine off (seed_override supplied) — what remains is coarsen +
  coarse solve + finalize per level.

Run on the real chip:  python tools/tpu_run.py perf_mg3
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
    return (time.perf_counter() - t0) / reps


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.core.morton import morton_sort
    from buildingsegment_tpu.ops.normals import canonicalize_normals
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
        try:
            out[key] = round(timed(fn) * 1e3, 2)
        except Exception as e:  # pragma: no cover
            out[key] = f"error:{type(e).__name__}"
        # incremental print: survive a mid-lab SIGTERM (no finally)
        print(f"[stage] {key}: {out[key]}", flush=True)

    try:
        sort = jax.jit(morton_sort, static_argnums=(2,))
        spos, smask, order = sort(pos_j, mask_j, True)
        sposf = spos.astype(jnp.float32)
        dk, normals, curv = knn_normals_window_stats(
            sposf, smask, k=15, window=48, radius=100.0, max_nn=50,
            rank_mode="bitonic", store_offsets=True, sym=True,
        )

        # --- coarsen block, verbatim math from seg/coarse.py ---------
        group = 4
        th_thickness, th_normal_cos, edge_gate = 300.0, 0.88, 600.0

        @functools.partial(jax.jit, static_argnums=(3,))
        def coarsen(pos, nrm, mask, group):
            nn = pos.shape[0]
            ng = nn // group
            posf = pos.astype(jnp.float32)
            cn = canonicalize_normals(nrm)
            gpos_all = posf.reshape(ng, group, 3)
            gnrm_all = cn.reshape(ng, group, 3)
            gmask_all = mask.reshape(ng, group)
            w = gmask_all.astype(jnp.float32)
            cnt = jnp.sum(w, axis=1)
            safe = jnp.maximum(cnt, 1.0)[:, None]
            gpos = jnp.sum(gpos_all * w[:, :, None], axis=1) / safe
            gsum_n = jnp.sum(gnrm_all * w[:, :, None], axis=1)
            glen = jnp.sqrt(jnp.maximum(jnp.sum(gsum_n * gsum_n, -1),
                                        1e-20))
            gnrm = gsum_n / glen[:, None]
            align = glen / jnp.maximum(cnt, 1.0)
            dvec = gpos_all - gpos[:, None, :]
            plane_d = jnp.abs(jnp.einsum(
                "gkd,gd->gk", dvec, gnrm,
                precision=lax.Precision.HIGHEST))
            spread2 = jnp.max(
                jnp.where(gmask_all, jnp.sum(dvec * dvec, -1), 0.0),
                axis=1)
            coherent = (
                (cnt >= jnp.float32(max(2, group // 2)))
                & (align >= th_normal_cos)
                & (jnp.max(jnp.where(gmask_all, plane_d, 0.0), 1)
                   <= th_thickness)
                & (spread2 <= edge_gate * edge_gate)
            )
            return gpos, gnrm, (cnt > 0) & coherent

        stage("coarsen_ms", lambda: coarsen(spos, normals, smask, group))

        # --- finalize block: segsum + renumber at 1.08M rows ---------
        from buildingsegment_tpu.ops.prefix import prefix_sum_i32
        from buildingsegment_tpu.ops.segsum import plane_sums, table_lookup

        max_planes = 1024
        pid_syn = jnp.where(
            smask, (jnp.arange(capacity, dtype=jnp.int32) >> 10) % 40 + 1,
            0)

        @jax.jit
        def finalize(pid, pos, nrm, mask):
            posf = pos.astype(jnp.float32)
            cn = canonicalize_normals(nrm)
            payload = jnp.concatenate(
                [jnp.ones((capacity, 1), jnp.float32), cn, posf,
                 jnp.zeros((capacity, 1), jnp.float32)], axis=1)
            member = mask & (pid > 0)
            cap128 = -(-max_planes // 128) * 128
            old_row = jnp.where(member, pid - 1, cap128)
            acc = plane_sums(old_row, payload, jnp.int32(40),
                             table_cap=max_planes)[:max_planes]
            counts_old = acc[:, 0].astype(jnp.int32)
            keep = counts_old > 400
            rank = prefix_sum_i32(keep.astype(jnp.int32))
            lut = jnp.concatenate(
                [jnp.zeros((1,), jnp.float32),
                 jnp.where(keep, rank, 0).astype(jnp.float32)])
            new_id = table_lookup(
                jnp.where(member, pid, 0), lut, jnp.int32(41)
            ).astype(jnp.int32)
            return new_id, acc

        stage("finalize_ms",
              lambda: finalize(pid_syn, spos, normals, smask))

        stage("seeds_w16_sym_ms", lambda: window_seeds(
            sposf, normals, smask, dk, window=16, seed_mode="sym"))

        # --- recursion floor with seeds AND refine off ----------------
        rows_i = jnp.arange(capacity, dtype=jnp.int32)
        g_idx = jnp.stack([rows_i, rows_i], axis=1)
        seed_ov = smask & (curv <= 0.03)

        def mgv(**kw):
            a = dict(levels=3, refine_sweeps=0, compact=True,
                     seed_override=seed_ov)
            a.update(kw)
            return segment_planes_multigrid(
                spos, normals, g_idx, smask,
                kth_sq_dist=dk, curvature=curv, max_edge_dist=600.0,
                th_point_count=400, max_planes=1024, window=16,
                group=4, **a,
            )

        stage("mg_l3_r0_noseed_ms", lambda: mgv())
        stage("mg_l2_r0_noseed_ms", lambda: mgv(levels=2))
        stage("mg_l3_r1_noseed_ms", lambda: mgv(refine_sweeps=1))
    finally:
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
