"""Print the FULL remote-compile error for one small stats-mxu case."""

import json

import numpy as np


def main():
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.ops.stats_mxu import (
        fused_stats_mxu, seed_sweep_mxu,
    )
    from buildingsegment_tpu.ops.window_sweep import (
        make_dyn_row, make_slab, make_spine,
    )

    rng = np.random.default_rng(0)
    n = 4096
    pos = jnp.asarray(rng.integers(0, 4000, (n, 3)).astype(np.float32))
    maskf = jnp.ones((n,), jnp.float32)
    out = {}

    slab = make_slab(
        [pos[:, 0], pos[:, 1], pos[:, 2], maskf],
        [-3e7, -3e7, -3e7, 0.0], 64, 1024, rows_out=8,
    )
    try:
        r = fused_stats_mxu(
            slab, n, k=15, w=64, tile=1024, radius=100.0, max_nn=50
        )
        np.asarray(r[0][0])
        out["stats_mxu_t1024"] = "OK"
    except Exception as e:
        out["stats_mxu_t1024"] = str(e)[-2500:]

    spine = make_spine(
        (pos[:, 0], pos[:, 1], pos[:, 2]),
        (maskf, maskf, maskf), maskf, 16, 1024,
    )
    dyn = make_dyn_row(maskf * 100.0, 0.0, 16, 1024)
    try:
        r = seed_sweep_mxu(
            spine, dyn, n, w=16, tile=1024, th_thickness=300.0,
            th_normal_cos=0.88, signed=False,
        )
        np.asarray(r[0])
        out["seed_mxu_t1024"] = "OK"
    except Exception as e:
        out["seed_mxu_t1024"] = str(e)[-2500:]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
