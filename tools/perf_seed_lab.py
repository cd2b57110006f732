"""Seed-sweep lab: symmetry-halved kernel vs the 2w-shift kernel.

The seed stage costs ~8.2 ms at 1M points (w=16) and its runtime is
dominated by misaligned shifted VMEM reads (7 rows per shift, 2w
shifts).  The sym kernel tests each unordered pair once (w shifts, 8
misaligned reads + 2 accumulator RMWs per shift) — bit-identical
output (tests/test_window_sweep.py::test_seed_sym_matches_pair).

Run on the real chip:  python tools/perf_seed_lab.py
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

    from buildingsegment_tpu.ops.window_sweep import (
        make_dyn_row,
        make_spine,
        pick_tile,
        seed_sweep_pair,
    )

    rng = np.random.default_rng(0)
    n = 1_083_392
    out = {"points": n}
    pos = [jnp.asarray(rng.uniform(0, 3e4, n).astype(np.float32))
           for _ in range(3)]
    nr_np = rng.normal(size=(3, n)).astype(np.float32)
    nr_np /= np.linalg.norm(nr_np, axis=0, keepdims=True)
    nrm = [jnp.asarray(r) for r in nr_np]
    dk = jnp.asarray(rng.uniform(1e3, 9e4, n).astype(np.float32))
    mk = jnp.ones((n,), jnp.float32)

    for w, t in [(16, 32768), (16, 16384), (16, 65536)]:
        tile = pick_tile(n, t)
        spine = make_spine(pos, nrm, mk, w, tile)
        dyn = make_dyn_row(dk, 0.0, w, tile)
        spine = jax.device_put(spine)
        dyn = jax.device_put(dyn)
        for sym in (False, True):
            tag = f"w{w}_t{t}{'_sym' if sym else ''}"
            try:
                dt = timed(lambda sym=sym: seed_sweep_pair(
                    spine, dyn, n, w=w, tile=tile, th_thickness=300.0,
                    th_normal_cos=0.88, sym=sym,
                ))
                out[tag + "_ms"] = round(dt * 1e3, 2)
            except Exception as e:
                out[tag + "_error"] = f"{type(e).__name__}: {str(e)[:80]}"
    # agreement spot check on the chip (compiled-TPU numerics)
    tile = pick_tile(n, 32768)
    spine = make_spine(pos, nrm, mk, 16, tile)
    dyn = make_dyn_row(dk, 0.0, 16, tile)
    try:
        a = np.asarray(seed_sweep_pair(
            spine, dyn, n, w=16, tile=tile, th_thickness=300.0,
            th_normal_cos=0.88, sym=False))
        b = np.asarray(seed_sweep_pair(
            spine, dyn, n, w=16, tile=tile, th_thickness=300.0,
            th_normal_cos=0.88, sym=True))
        out["sym_identical_on_tpu"] = bool(np.array_equal(a, b))
    except Exception as e:
        out["sym_check_error"] = f"{type(e).__name__}: {str(e)[:80]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
