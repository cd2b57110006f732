"""Brute-force kNN kernel lab: tile-shape sweep at 1M points.

Config 2 (exact kNN) sits at ~1.16 Mpts/s; the kernel visits ~9 sorted
candidate tiles per 128-query tile.  This lab sweeps (query_tile,
cand_tile) to find where the fixed per-tile costs (grid step, DMA
latency chain, merge rounds) stop dominating.

Run on the real chip:  python tools/perf_knn_lab.py [--quick]
"""

import json
import sys

import numpy as np


def _sync(out):
    import jax

    # last leaf: multi-program outputs complete in dispatch order —
    # syncing the first leaf misses the final program (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, reps=2):
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
    from buildingsegment_tpu.ops.pallas_knn import knn_pallas
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    quick = "--quick" in sys.argv
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

    out = {"points": n}

    # --- prologue vs kernel attribution (resident path, qt128/ct1024)
    import functools

    from buildingsegment_tpu.ops.pallas_knn import _prepare

    prep = jax.jit(functools.partial(
        _prepare, k=16, query_tile=128, cand_tile=1024
    ))
    try:
        dt = timed(lambda: prep(spos, smask))
        out["prologue_ms"] = round(dt * 1e3, 2)
        counts = np.asarray(prep(spos, smask)[4])
        out["mean_visits"] = round(float(counts.mean()), 2)
        out["max_visits"] = int(counts.max())
        print(f"[stage] prologue: {out}", flush=True)
    except Exception as e:  # pragma: no cover
        out["prologue_error"] = type(e).__name__
    # marginal visit cost: clamp the visit loop (result inexact, time
    # only) — fixed costs = mv1; slope = (full - mv1) / (mean_visits-1)
    for mv in ((1, 4) if "--mv" in sys.argv else (1,)):
        try:
            dt = timed(lambda mv=mv: knn_pallas(
                spos, smask, k=16, query_tile=128, cand_tile=1024,
                max_visits=mv,
            ))
            out[f"maxvisits{mv}_mpts"] = round(n / dt / 1e6, 3)
        except Exception as e:  # pragma: no cover
            out[f"maxvisits{mv}_error"] = type(e).__name__
        print(f"[stage] maxvisits{mv}: {out.get(f'maxvisits{mv}_mpts')}",
              flush=True)

    # seed-window sweep: larger windows cost more in the prologue but
    # cut kernel insertions (the measured whale) and tighten τ̂
    # (r5: dual-τ made this a wash at 25 mm — skip by default)
    for sw in ([] if quick or "--seedw" not in sys.argv else [64, 96]):
        try:
            dt = timed(lambda sw=sw: knn_pallas(
                spos, smask, k=16, query_tile=128, cand_tile=1024,
                seed_window=sw,
            ))
            out[f"seedw{sw}_mpts"] = round(n / dt / 1e6, 3)
        except Exception as e:  # pragma: no cover
            out[f"seedw{sw}_error"] = type(e).__name__
        print(f"[stage] seedw{sw}: {out.get(f'seedw{sw}_mpts')}",
              flush=True)

    # r5 session 2: n = 2048·529 (529 odd) caps ct at 2048; CPU visit-
    # body counts 74.3k/36.0k/22.5k for these three — the grid-step +
    # visit-body overheads are the measured whale, so fewer/bigger
    # tiles should win until the per-body compute crosses over
    shapes = [(128, 1024), (256, 2048), (512, 2048)]
    if quick:
        shapes = [(128, 1024), (256, 512)]
    for qt, ct in shapes:
        try:
            dt = timed(
                lambda qt=qt, ct=ct: knn_pallas(
                    spos, smask, k=16, query_tile=qt, cand_tile=ct
                )
            )
            out[f"qt{qt}_ct{ct}_mpts"] = round(n / dt / 1e6, 3)
        except Exception as e:  # pragma: no cover
            out[f"qt{qt}_ct{ct}_error"] = type(e).__name__
        print(f"[stage] qt{qt}_ct{ct}: {out.get(f'qt{qt}_ct{ct}_mpts')}",
              flush=True)
    # static merge-round trip count (Mosaic unroll/pipeline probe)
    for qt, ct in ([(128, 1024)] if quick
                   else ([] if "--static" not in sys.argv
                         else [(128, 1024), (256, 1024)])):
        try:
            dt = timed(
                lambda qt=qt, ct=ct: knn_pallas(
                    spos, smask, k=16, query_tile=qt, cand_tile=ct,
                    static_rounds=True,
                )
            )
            out[f"qt{qt}_ct{ct}_static_mpts"] = round(n / dt / 1e6, 3)
        except Exception as e:  # pragma: no cover
            out[f"qt{qt}_ct{ct}_static_error"] = type(e).__name__
        print(f"[stage] qt{qt}_ct{ct}_static: "
              f"{out.get(f'qt{qt}_ct{ct}_static_mpts')}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
