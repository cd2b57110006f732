"""Attribute the one-hot segsum/adopt kernel costs at 1M rows (r5).

probe_kernels_r5 measured plane_sums 5.9 ms / paymom 8.6 / adopt 13.4
per pass at 1.08M — far above the HBM/FLOP floors (~0.3 ms).  This lab
bisects: tile size (grid-step overhead), transposed accumulator
(output lane width), clustered vs random holes (the adopt skip gate).

Run: python tools/tpu_run.py perf_segsum_lab
"""

import json
import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[-1].ravel()[0])


def timed(fn, reps=8):
    for a in range(6):
        try:
            out = fn()
            break
        except Exception as e:
            if "remote_compile" not in str(e) or a == 5:
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

    from buildingsegment_tpu.ops.adopt import (
        pack_adopt_tables, plane_adopt,
    )
    from buildingsegment_tpu.ops.segsum import (
        plane_payload_moment_sums,
        plane_sums,
        plane_sums_t,
        table_lookup,
    )

    n = 8192 * 132
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 3e4, (n, 3)).astype(np.float32)
    cn = rng.normal(size=(n, 3)).astype(np.float32)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    pay = jnp.asarray(np.concatenate(
        [np.ones((n, 1), np.float32), cn, pos,
         (pos * pos).sum(1)[:, None]], 1))
    payT = jnp.asarray(np.ascontiguousarray(np.asarray(pay).T))
    ids = jnp.asarray(rng.integers(0, 40, n).astype(np.int32))
    q = jnp.asarray(rng.uniform(0, 3e4, (1024, 3)).astype(np.float32))
    out = {}

    def stage(key, fn, reps=8):
        try:
            out[key] = round(timed(fn, reps) * 1e3, 3)
        except Exception as e:
            out[key] = f"error:{type(e).__name__}"
            print(f"[stage-err] {key}: {str(e)[:300]}", flush=True)
        print(f"[stage] {key}: {out[key]}", flush=True)

    for tile in (8192, 16384, 32768):
        stage(f"plane_sums_t{tile}_ms", lambda t=tile: plane_sums(
            ids, pay, jnp.int32(40), table_cap=1024, tile=t))
    stage("plane_sums_T_t8192_ms", lambda: plane_sums_t(
        ids, payT, jnp.int32(40), table_cap=1024, tile=8192))
    stage("plane_sums_T_t32768_ms", lambda: plane_sums_t(
        ids, payT, jnp.int32(40), table_cap=1024, tile=32768))
    for tile in (8192,):
        stage(f"paymom_t{tile}_ms", lambda t=tile:
              plane_payload_moment_sums(
                  ids, pay, q, jnp.int32(40), table_cap=1024, tile=t))
    stage("table_lookup_ms", lambda: table_lookup(
        ids, jnp.ones((1024,), jnp.float32), jnp.int32(40)))

    nk = rng.normal(size=(128, 3)).astype(np.float32)
    nk /= np.linalg.norm(nk, axis=1, keepdims=True)
    ck = rng.uniform(0, 3e4, (128, 3)).astype(np.float32)
    B, tab = pack_adopt_tables(
        jnp.asarray(nk), jnp.asarray(ck),
        jnp.asarray(np.sum(nk * ck, 1)),
        jnp.asarray(np.sum(ck * ck, 1)),
        jnp.asarray(np.full(128, 1e6, np.float32)),
        jnp.ones((128,), jnp.float32),
        jnp.asarray(np.arange(128, dtype=np.float32)))
    rand5 = jnp.asarray(rng.uniform(size=n) < 0.05)
    clus = np.zeros(n, bool)
    clus[: n // 20] = True  # 5% clustered: 95% of tiles skip
    for tile, tag in ((2048, "t2048"), (4096, "t4096")):
        stage(f"adopt_rand5_{tag}_ms", lambda t=tile: plane_adopt(
            pay, rand5, B, tab, th_thickness=300.0, th_cos=0.88,
            tile=t))
        stage(f"adopt_clus5_{tag}_ms", lambda t=tile: plane_adopt(
            pay, jnp.asarray(clus), B, tab, th_thickness=300.0,
            th_cos=0.88, tile=t))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
