"""Compact-solver lab: Mosaic lowering check + speed at the coarse scale.

Builds the PRODUCTION coarse problem (the 1.08M bench scene coarsened
4×4) and times segment_planes with compact=False (the XLA window_body
loop) vs compact=True (warm sweeps + ops/compact_sweep.py kernel),
asserting identical outputs.  Also times the full multigrid + the e2e
sharded pipeline so the net effect lands in one number.

Run on the real chip:  python tools/perf_compact_lab.py
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

    out = fn()
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

    from buildingsegment_tpu.core.morton import morton_sort
    from buildingsegment_tpu.ops.stats_sweep import (
        knn_normals_window_stats,
    )
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
    capacity = -(-n // 2048) * 2048
    pos = np.full((capacity, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    spos, smask, _ = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
    sposf = spos.astype(jnp.float32)
    out = {"points": n}

    dk, normals, curv = knn_normals_window_stats(
        sposf, smask, k=15, window=64, radius=100.0, max_nn=50,
    )
    seed = window_seeds(sposf, normals, smask, dk, window=16)

    # production coarsening 4x4 → the coarse problem the solver sees
    from buildingsegment_tpu.ops.normals import canonicalize_normals

    def coarsen(p, nr, m, group):
        ng = p.shape[0] // group
        cn = canonicalize_normals(nr)
        gp = p.reshape(ng, group, 3)
        gn = cn.reshape(ng, group, 3)
        gm = m.reshape(ng, group)
        w = gm.astype(jnp.float32)
        cnt = w.sum(1)
        safe = jnp.maximum(cnt, 1.0)[:, None]
        gpos = (gp * w[:, :, None]).sum(1) / safe
        gsum = (gn * w[:, :, None]).sum(1)
        glen = jnp.sqrt(jnp.maximum((gsum * gsum).sum(-1), 1e-20))
        gnrm = gsum / glen[:, None]
        align = glen / jnp.maximum(cnt, 1.0)
        dvec = gp - gpos[:, None, :]
        pd = jnp.abs(jnp.einsum("gkd,gd->gk", dvec, gnrm))
        sp2 = jnp.max(jnp.where(gm, (dvec * dvec).sum(-1), 0.0), 1)
        coher = (
            (cnt >= 2) & (align >= 0.88)
            & (jnp.max(jnp.where(gm, pd, 0.0), 1) <= 300.0)
            & (sp2 <= 360000.0)
        )
        return gpos, gnrm, (cnt > 0) & coher

    g1p, g1n, g1m = coarsen(sposf, normals, smask, 4)
    gs1 = jnp.any(seed.reshape(-1, 4), 1) & g1m
    g2p, g2n, g2m = coarsen(g1p, g1n, g1m, 4)
    gs2 = jnp.any(gs1.reshape(-1, 4), 1) & g2m
    ng = g2p.shape[0]
    rows = jnp.arange(ng, dtype=jnp.int32)[:, None]
    gidx = jnp.concatenate([rows, rows], 1)
    out["ng"] = ng

    kw = dict(
        seed_override=gs2, max_edge_dist=600.0, th_point_count=6,
        max_planes=1024, propagation="window", window=16,
        convergence_tol=5e-5 * 16, max_sweeps=64,
    )

    def solve(compact):
        return segment_planes(
            g2p.astype(jnp.int32), g2n, gidx, g2m, compact=compact, **kw
        )

    try:
        b = solve(True)
        out["compact_sweeps"] = int(b.num_sweeps)
        out["compact_planes"] = int(b.num_planes)
        out["coarse_compact_ms"] = round(timed(lambda: solve(True)) * 1e3, 2)
    except Exception as e:
        out["compact_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    a = solve(False)
    out["coarse_xla_ms"] = round(timed(lambda: solve(False)) * 1e3, 2)
    out["xla_sweeps"] = int(a.num_sweeps)
    out["xla_planes"] = int(a.num_planes)
    if "compact_error" not in out:
        same = np.array_equal(
            np.asarray(a.plane_idx), np.asarray(b.plane_idx)
        )
        out["labels_identical"] = bool(same)

    # net effect: e2e with the default (XLA-loop) config vs the tuned
    # one (compact solver + bitonic stats) — the same pair bench.py's
    # autotune arbitrates
    import dataclasses

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.dist.mesh import make_mesh
    from buildingsegment_tpu.dist.sharded import sharded_pipeline

    cfg = PipelineConfig(pad_to_multiple=2048)
    mesh = make_mesh(len(jax.devices()))
    pos_j = jnp.asarray(pos)
    mask_j = jnp.asarray(mask)
    for tag, c in (
        ("e2e", cfg),
        ("e2e_tuned", dataclasses.replace(
            cfg, seg_compact=True, stats_rank_mode="bitonic")),
    ):
        fn = sharded_pipeline(mesh, c, capacity_hint=capacity)
        try:
            dt = timed(lambda: fn(pos_j, mask_j))
            out[f"{tag}_ms"] = round(dt * 1e3, 2)
            out[f"{tag}_mpts"] = round(n / dt / 1e6, 2)
        except Exception as e:
            out[f"{tag}_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
