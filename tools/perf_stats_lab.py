"""Stats-sweep lab: where do the 22 ms at 1M points go?

Times fused_stats_sweep variants — tile size (grid-step floor), window
width (row count in phase 1/3 and the bisection), cap on/off (second
bisection rank), bisection on/off (radius-only mode) — so the next
kernel change targets the measured dominant term.

Run on the real chip:  python tools/perf_stats_lab.py
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

    from buildingsegment_tpu.core.morton import morton_argsort
    from buildingsegment_tpu.ops.stats_sweep import fused_stats_sweep
    from buildingsegment_tpu.ops.window_sweep import make_slab
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
    sposf = pos_j[order].astype(jnp.float32)
    smaskf = mask_j[order].astype(jnp.float32)

    out = {"points": n}

    def run(w, tile, k=15, max_nn=50, store_offsets=False,
            rank_mode="bisect", sym=False):
        slab = make_slab(
            [sposf[:, 0], sposf[:, 1], sposf[:, 2], smaskf],
            [-3e7, -3e7, -3e7, 0.0], w, tile, rows_out=8,
        )
        return fused_stats_sweep(
            slab, capacity, k=k, w=w, tile=tile, radius=100.0,
            max_nn=max_nn, store_offsets=store_offsets,
            rank_mode=rank_mode, sym=sym,
        )

    for w, tile in [(64, 8192), (64, 16384), (64, 4096), (48, 8192),
                    (32, 8192), (64, 32768)]:
        try:
            dt = timed(lambda w=w, tile=tile: run(w, tile))
            out[f"w{w}_t{tile}_ms"] = round(dt * 1e3, 2)
        except Exception as e:
            out[f"w{w}_t{tile}_error"] = type(e).__name__
    # aligned phase 3: offsets staged in VMEM during phase 1
    for w, tile in [(64, 8192), (48, 8192)]:
        try:
            dt = timed(lambda w=w, tile=tile: run(w, tile,
                                                  store_offsets=True))
            out[f"w{w}_t{tile}_stored_ms"] = round(dt * 1e3, 2)
        except Exception as e:
            out[f"w{w}_t{tile}_stored_error"] = type(e).__name__
    # bitonic ranking: full column sort of the distance block instead
    # of the 31-step bit bisection (~4x fewer vector ops)
    for w, tile, store in [(64, 8192, False), (64, 8192, True),
                           (48, 8192, False), (64, 16384, False),
                           (64, 4096, False), (32, 8192, False)]:
        tag = f"w{w}_t{tile}{'_stored' if store else ''}_bitonic"
        try:
            dt = timed(lambda w=w, tile=tile, store=store: run(
                w, tile, store_offsets=store, rank_mode="bitonic"))
            out[tag + "_ms"] = round(dt * 1e3, 2)
        except Exception as e:
            out[tag + "_error"] = f"{type(e).__name__}: {str(e)[:80]}"
    # symmetry-halved phase 1: each unordered pair's d² computed once
    for w, tile, store, rank in [
        (64, 8192, True, "bitonic"), (64, 8192, False, "bitonic"),
        (48, 8192, True, "bitonic"), (64, 8192, True, "bisect"),
        (64, 16384, True, "bitonic"),
    ]:
        tag = (f"w{w}_t{tile}{'_stored' if store else ''}_{rank}_sym")
        try:
            dt = timed(lambda w=w, tile=tile, store=store, rank=rank: run(
                w, tile, store_offsets=store, rank_mode=rank, sym=True))
            out[tag + "_ms"] = round(dt * 1e3, 2)
        except Exception as e:
            out[tag + "_error"] = f"{type(e).__name__}: {str(e)[:80]}"
    # cap off: single-rank bisection
    dt = timed(lambda: run(64, 8192, max_nn=None))
    out["w64_t8192_nocap_ms"] = round(dt * 1e3, 2)
    # radius-only: no bisection at all (normals path)
    slab = make_slab(
        [sposf[:, 0], sposf[:, 1], sposf[:, 2], smaskf],
        [-3e7, -3e7, -3e7, 0.0], 64, 8192, rows_out=8,
    )
    dt = timed(
        lambda: fused_stats_sweep(
            slab, capacity, k=1, w=64, tile=8192, radius=100.0,
            max_nn=None,
        )
    )
    out["w64_t8192_radiusonly_ms"] = round(dt * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
