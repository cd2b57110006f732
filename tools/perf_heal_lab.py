"""Attribute the finalize-heal cost in the multigrid stage (r4).

The r4 finalize grew three pieces: the centered-moments pass (3 table
lookups + one 6-col segsum per level), the [P,P] pair RMS gate, and
the fine-level [N,128] hole-fill.  The bench headline regressed 45.5
-> 62.5 ms when they landed at every level; this lab quantifies each
mode on the chip.  NOTE: the production default is full heal at EVERY
level (seg/coarse.py pins the inner recursion to heal=True — the
quality-measured choice, see the knob doc at coarse.py:106-115); the
`heal` knob here varies only the OUTERMOST level, so the modes below
bound the outer-level cost, not the inner-level cost.

Run on the real chip:  python tools/tpu_run.py perf_heal_lab
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
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.core.morton import morton_sort
    from buildingsegment_tpu.ops.stats_sweep import knn_normals_window_stats
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid
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
    out = {"points": n}

    def stage(key, fn):
        try:
            out[key] = round(timed(fn) * 1e3, 2)
        except Exception as e:  # pragma: no cover
            out[key] = f"error:{type(e).__name__}"
            print(f"[stage-err] {key}: {str(e)[:500]}", flush=True)
        print(f"[stage] {key}: {out[key]}", flush=True)

    try:
        sort = jax.jit(morton_sort, static_argnums=(2,))
        spos, smask, order = sort(pos_j, mask_j, False)
        sposf = spos.astype(jnp.float32)
        dk, normals, curv = knn_normals_window_stats(
            sposf, smask, k=15, window=48, radius=100.0, max_nn=50,
            rank_mode="bitonic", store_offsets=True, sym=True,
        )
        rows_i = jnp.arange(spos.shape[0], dtype=jnp.int32)
        g_idx = jnp.stack([rows_i, rows_i], axis=1)

        def mgv(**kw):
            a = dict(levels=3, refine_sweeps=2, compact=True,
                     spacing_hint_mm=32.0)
            a.update(kw)
            return segment_planes_multigrid(
                spos, normals, g_idx, smask,
                kth_sq_dist=dk, curvature=curv, max_edge_dist=600.0,
                th_point_count=400, max_planes=1024, window=16,
                group=4, **a,
            )

        # production default first (full heal at every level)
        stage("mg_heal_default_ms", lambda: mgv())
        stage("mg_heal_none_ms", lambda: mgv(heal=False))
        stage("mg_heal_merge_only_ms", lambda: mgv(heal="merge"))
        # inner levels are pinned to heal=True regardless of the knob
        # (coarse.py:327), so these modes vary the OUTERMOST level
        # only: default-vs-merge_only isolates the outer fine-level
        # flatness + [N,128] hole-fill, merge_only-vs-none the outer
        # moments+pair cost.  Inner-level modes are not measurable
        # without threading a per-level override.
        try:
            res = mgv()
            out["mg_planes"] = int(res.num_planes)
        except Exception:  # pragma: no cover
            pass
        # seed-source=coarse variant (the bench winner knob)
        stage("mg_heal_default_seedcoarse_ms",
              lambda: mgv(seed_source="coarse"))
    finally:
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
