"""Slab-build cost: is make_slab the hidden tax on every window kernel?

Every Pallas window sweep consumes a [rows, n+2w+pad] f32 slab built by
ops/window_sweep.make_slab (stack + concat + pad).  The refine path
rebuilds it per sweep at full N; seeds/stats build it once.  If the
build costs ~3 ms at 1M rows (round-2 note), a padded-component-plane
redesign (build once per scan, DMA rows directly) is worth it.

Run on the real chip:  python tools/perf_slab_lab.py
"""

import json

import numpy as np


def _sync(out):
    import jax

    # last leaf: multi-program outputs complete in dispatch order —
    # syncing the first leaf misses the final program (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, reps=16):
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

    import functools

    from buildingsegment_tpu.ops.window_sweep import (
        make_slab, pick_tile, seed_sweep,
    )

    rng = np.random.default_rng(0)
    out = {}
    for n, rows, w in [(1_083_392, 8, 16), (1_083_392, 8, 64),
                       (1_083_392, 14, 16), (67_712, 14, 16)]:
        cols = [jnp.asarray(rng.normal(size=n).astype(np.float32))
                for _ in range(rows)]
        fills = [0.0] * rows
        fn = jax.jit(functools.partial(
            make_slab, w=w, tile=pick_tile(n, 16384), rows_out=16
        ))
        dt = timed(lambda: fn(cols, fills))
        out[f"slab_n{n}_r{rows}_w{w}_ms"] = round(dt * 1e3, 2)

    # seed_sweep alone on a prebuilt slab at 1M (vs the 8.2 ms
    # window_seeds total: the difference is slab + dispatch)
    n = 1_083_392
    w = 16
    tile = pick_tile(n, 16384)
    cols = [jnp.asarray(rng.uniform(0, 3e4, n).astype(np.float32))
            for _ in range(3)]
    nr = [jnp.asarray(rng.normal(size=n).astype(np.float32))
          for _ in range(3)]
    dk = jnp.full((n,), 3e4, jnp.float32)
    mk = jnp.ones((n,), jnp.float32)
    slab = make_slab(cols + nr + [dk, mk],
                     [-3e7, -3e7, -3e7, 0, 0, 0, 0, 0], w, tile,
                     rows_out=8)
    slab = jax.device_put(slab)
    dt = timed(lambda: seed_sweep(
        slab, n, w=w, tile=tile, th_thickness=300.0,
        th_normal_cos=0.88,
    ))
    out["seed_sweep_only_1M_ms"] = round(dt * 1e3, 2)
    for t2 in (8192, 32768):
        try:
            tile2 = t2
            slab2 = make_slab(cols + nr + [dk, mk],
                              [-3e7, -3e7, -3e7, 0, 0, 0, 0, 0], w,
                              tile2, rows_out=8)
            dt = timed(lambda: seed_sweep(
                slab2, n, w=w, tile=tile2, th_thickness=300.0,
                th_normal_cos=0.88,
            ))
            out[f"seed_sweep_only_1M_t{t2}_ms"] = round(dt * 1e3, 2)
        except Exception as e:
            out[f"seed_sweep_t{t2}_error"] = type(e).__name__
    print(json.dumps(out))


if __name__ == "__main__":
    main()
