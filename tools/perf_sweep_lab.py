"""Coarse-solve sweep lab: per-sweep cost + ablations at ng ≈ 67k.

The multigrid coarse solve is the e2e bottleneck (VERDICT r2 item 1).
This tool measures the PER-SWEEP cost of the windowized solver at the
production coarse scale by differencing max_sweeps levels (the slope is
clean because every sweep is the identical program), plus ablations:

  * anchor gate on/off (16- vs 8-col stats scatter + purity gather)
  * window 16 vs 32 (fewer sweeps per solve?)
  * BST_JUMP_ROUNDS (env, needs separate process runs)

Run on the real chip:  python tools/perf_sweep_lab.py
"""

import json
import os

import numpy as np


def _sync(out):
    import jax

    # last leaf: multi-program outputs complete in dispatch order —
    # syncing the first leaf misses the final program (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, reps=12):
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

    from buildingsegment_tpu.core.morton import morton_argsort
    from buildingsegment_tpu.seg.region_grow import segment_planes
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
    pos_j, mask_j = jnp.asarray(pos), jnp.asarray(mask)
    order = morton_argsort(pos_j, mask_j)
    spos = pos_j[order]
    smask = mask_j[order]

    # coarsen ×16 exactly like perf_breakdown (mean position/normal,
    # every group masked-any) — the shape the production bottom solve
    # sees with g=4, levels=2
    g = 16
    ngc = capacity // g
    sposf = spos.astype(jnp.float32)
    gpos = (
        jnp.where(smask[:, None], sposf, 0.0).reshape(ngc, g, 3).mean(1)
    ).astype(jnp.int32)
    # synthetic coarse normals: unit Z-ish with noise (models don't
    # need physical truth for a timing lab, only live-label dynamics)
    rng = np.random.default_rng(0)
    nr = rng.normal(size=(ngc, 3)).astype(np.float32) * 0.05
    nr[:, 2] += 1.0
    nr /= np.linalg.norm(nr, axis=1, keepdims=True)
    gnrm = jnp.asarray(nr)
    gmask = smask.reshape(ngc, g).any(1)
    rows = jnp.arange(ngc, dtype=jnp.int32)[:, None]
    gidx = jnp.concatenate([rows, rows], axis=1)

    out = {"ng": int(ngc), "jump_rounds": os.environ.get("BST_JUMP_ROUNDS", "6")}

    def solve(sweeps, anchor=0.95, window=16):
        return segment_planes(
            gpos, gnrm, gidx, gmask, seed_override=gmask,
            max_edge_dist=600.0, th_point_count=6, max_planes=1024,
            propagation="window", window=window, max_sweeps=sweeps,
            th_anchor_cos=anchor, convergence_tol=0.0,
        )

    for s in (1, 3, 5):
        out[f"solve_s{s}_ms"] = timed(lambda s=s: solve(s)) * 1e3
    out["per_sweep_ms"] = (out["solve_s5_ms"] - out["solve_s1_ms"]) / 4
    for s in (1, 3, 5):
        out[f"noanchor_s{s}_ms"] = timed(lambda s=s: solve(s, anchor=0.0)) * 1e3
    out["noanchor_per_sweep_ms"] = (
        out["noanchor_s5_ms"] - out["noanchor_s1_ms"]
    ) / 4
    for s in (1, 3):
        out[f"w32_s{s}_ms"] = timed(lambda s=s: solve(s, window=32)) * 1e3
    out["w32_per_sweep_ms"] = (out["w32_s3_ms"] - out["w32_s1_ms"]) / 2

    # full solves to convergence: wall time + sweeps used
    for w in (16, 32):
        r = solve(64, window=w)
        out[f"full_w{w}_sweeps"] = int(r.num_sweeps)
        out[f"full_w{w}_ms"] = timed(lambda w=w: solve(64, window=w)) * 1e3

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
