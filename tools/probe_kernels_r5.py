"""Standalone chip probe of the round-5 finalize kernels.

Runs plane_adopt and plane_payload_moment_sums at the production
shape (1.08M rows) directly on the device and prints timing or the
FULL error — the heal lab's stage wrapper only shows the exception
type.  Run: python tools/tpu_run.py probe_kernels_r5
"""

import json
import time
import traceback

import numpy as np


def _sync(x):
    np.asarray(x.ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    n = 8192 * 132  # 1.081M
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 3e4, (n, 3)).astype(np.float32)
    cn = rng.normal(size=(n, 3)).astype(np.float32)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    pay = jnp.asarray(np.concatenate(
        [np.ones((n, 1), np.float32), cn, pos,
         (pos * pos).sum(1)[:, None]], 1))
    holes = jnp.asarray(rng.uniform(size=n) < 0.05)
    ids = jnp.asarray(rng.integers(0, 40, n).astype(np.int32))
    q = jnp.asarray(rng.uniform(0, 3e4, (1024, 3)).astype(np.float32))
    out = {}

    def stage(key, fn, reps=8):
        try:
            r = fn()
            _sync(jax.tree_util.tree_leaves(r)[-1])
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn()
            _sync(jax.tree_util.tree_leaves(r)[-1])
            out[key] = round((time.perf_counter() - t0) / reps * 1e3, 3)
        except Exception:
            out[key] = "ERROR"
            print(f"[probe-err] {key}:\n{traceback.format_exc()[-1500:]}",
                  flush=True)
        print(f"[probe] {key}: {out[key]}", flush=True)

    from buildingsegment_tpu.ops.adopt import (
        pack_adopt_tables, plane_adopt,
    )
    from buildingsegment_tpu.ops.segsum import (
        plane_payload_moment_sums, plane_sums,
    )

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

    stage("plane_adopt_5pct_ms", lambda: plane_adopt(
        pay, holes, B, tab, th_thickness=300.0, th_cos=0.88))
    dense = jnp.asarray(rng.uniform(size=n) < 0.9)
    stage("plane_adopt_90pct_ms", lambda: plane_adopt(
        pay, dense, B, tab, th_thickness=300.0, th_cos=0.88))
    # transposed-layout variant (r5 session 2): payload as [8, N],
    # decisions as [128, T] — kills the [T, 8] -> [T, 128] lane pad
    stage("plane_adopt_T_5pct_ms", lambda: plane_adopt(
        pay, holes, B, tab, th_thickness=300.0, th_cos=0.88,
        transposed=True))
    stage("plane_adopt_T_90pct_ms", lambda: plane_adopt(
        pay, dense, B, tab, th_thickness=300.0, th_cos=0.88,
        transposed=True))
    stage("paymom_ms", lambda: plane_payload_moment_sums(
        ids, pay, q, jnp.int32(40), table_cap=1024))
    stage("plane_sums_ms", lambda: plane_sums(
        ids, pay, jnp.int32(40), table_cap=1024))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
