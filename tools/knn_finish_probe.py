"""Attribution probe: is _finish (top_k + take_along_axis gather) the
brute-kNN fixed-cost whale?  Times the current epilogue vs a 2-operand
lax.sort variant (the CLAUDE.md scatter/gather-avoidance pattern) on
kernel-shaped dummy data, plus the bare pallas dispatch at clamp=1.

Run:  PALLAS_AXON_POOL_IPS= python tools/tpu_run.py knn_finish_probe
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from perf_knn_lab import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from buildingsegment_tpu.cli import _enable_compile_cache
    from buildingsegment_tpu.ops import pallas_knn as pk

    _enable_compile_cache()
    n, kk = 1083392, 15
    rng = np.random.default_rng(0)
    best_d = jnp.asarray(rng.random((n, kk), np.float32))
    best_i = jnp.asarray(rng.integers(0, n, (n, kk)).astype(np.int32))
    mask = jnp.ones((n,), bool)

    fin = jax.jit(lambda d, i: pk._finish(d, i, mask, n, kk))

    def finish_sorted(d, i):
        sd, si = lax.sort((d, i), dimension=1, num_keys=1)
        self_idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        empty = (sd >= pk._SENTINEL_D) | jnp.isinf(sd)
        si = jnp.where(empty, self_idx, si)
        sd = jnp.where(empty, 0.0, sd)
        si = jnp.concatenate([self_idx, si], axis=1)
        sd = jnp.concatenate([jnp.zeros((n, 1), jnp.float32), sd], axis=1)
        return si, sd

    fin2 = jax.jit(finish_sorted)

    out = {}
    out["finish_ms"] = round(timed(lambda: fin(best_d, best_i)) * 1e3, 1)
    print(f"[stage] finish: {out}", flush=True)
    out["finish_sort_ms"] = round(
        timed(lambda: fin2(best_d, best_i)) * 1e3, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
