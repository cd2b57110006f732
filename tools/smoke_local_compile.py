"""Smoke-test LOCAL-compile mode (PALLAS_AXON_REMOTE_COMPILE=0).

The axon plugin supports two compile paths: remote (terminal-side
helper, OOM-flaky — kills benches with 'subprocess exit signal
SIGKILL') and local AOT via this host's libtpu (the harness default,
killable, 128 GB RAM).  This smoke answers: does local-compile mode
execute correctly on the real chip, for both plain XLA and Mosaic
(Pallas) programs?

Run:
    PALLAS_AXON_POOL_IPS= PALLAS_AXON_REMOTE_COMPILE=0 \
    PYTHONPATH=/root/repo:$PYTHONPATH \
        timeout 1200 python tools/tpu_run.py smoke_local_compile
"""

import time

import numpy as np


def _sync(x):
    return np.asarray(x.ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    print(f"devices: {devs}", flush=True)

    # 1. plain XLA matmul, f32 HIGHEST (the geometry precision path)
    a = jnp.ones((1024, 1024), jnp.float32)
    t0 = time.perf_counter()
    f = jax.jit(lambda x: (x @ x).sum())
    out = f(a)
    v = float(np.asarray(out))
    print(f"xla matmul compile+run {time.perf_counter()-t0:.1f}s "
          f"value={v} (want {1024**3})", flush=True)
    assert v == 1024**3, v

    # 2. a real Mosaic kernel from the package: the fused stats sweep
    #    at small size (same kernel family as the production hot path)
    from buildingsegment_tpu.ops.stats_sweep import knn_normals_window_stats

    n = 16384
    rng = np.random.default_rng(0)
    pts = (rng.uniform(0, 4000, (n, 3))).astype(np.float32)
    posf = jnp.asarray(np.sort(pts, axis=0))  # crude coherence
    mask = jnp.ones(n, bool)
    t0 = time.perf_counter()
    res = knn_normals_window_stats(
        posf, mask, k=16, window=16, radius=100.0, max_nn=50,
        rank_mode="bitonic", store_offsets=True,
    )
    _sync(jax.tree_util.tree_leaves(res)[0])
    print(f"mosaic stats compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)

    # 3. sanity on the (kth_sq_dist, normals, curvature) outputs
    kth = np.asarray(res[0])
    nrm = np.asarray(res[1])
    print(f"kth_sq_dist med={np.median(kth):.1f} "
          f"|n| med={np.median(np.linalg.norm(nrm, axis=1)):.3f}",
          flush=True)
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
