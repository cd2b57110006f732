"""Pre-warm the finalize kernel compiles at every multigrid level shape.

The full multigrid program embeds plane_adopt + plane_payload_moment_
sums at up to three level sizes; compiling all of them INSIDE the big
program repeatedly OOM-kills the remote-compile helper (SIGKILL loop,
2026-08-21).  Compile progress is cached per Mosaic kernel, so
compiling each instance STANDALONE first (small programs the helper
survives) lets the big program's compile hit cache.

Run (chip): python tools/tpu_run.py warm_finalize
"""

import json
import time

import numpy as np

LEVELS = (8192 * 132, 8192 * 33, 67584)  # outer, /4, /16 level rows


def main():
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.ops.adopt import (
        pack_adopt_tables, plane_adopt,
    )
    from buildingsegment_tpu.ops.segsum import (
        plane_payload_moment_sums, plane_sums, table_lookup,
    )

    zk = jnp.zeros((128,), jnp.float32)
    B, tab = pack_adopt_tables(
        jnp.zeros((128, 3), jnp.float32), jnp.zeros((128, 3),
                                                    jnp.float32),
        zk, zk, zk, zk, zk)
    q = jnp.zeros((1024, 3), jnp.float32)
    out = {}
    for n in LEVELS:
        pay = jnp.zeros((n, 8), jnp.float32)
        ids = jnp.zeros((n,), jnp.int32)
        holes = jnp.zeros((n,), bool)
        t0 = time.time()
        for name, fn in (
            ("adopt", lambda: plane_adopt(
                pay, holes, B, tab, th_thickness=300.0, th_cos=0.88)),
            ("paymom", lambda: plane_payload_moment_sums(
                ids, pay, q, jnp.int32(1), table_cap=1024)),
            ("plane_sums", lambda: plane_sums(
                ids, pay, jnp.int32(1), table_cap=1024)),
            ("lookup", lambda: table_lookup(
                ids, jnp.zeros((1025,), jnp.float32), jnp.int32(1))),
        ):
            for a in range(6):
                try:
                    r = fn()
                    np.asarray(jax.tree_util.tree_leaves(r)[-1].ravel()[0])
                    break
                except Exception as e:
                    if "remote_compile" not in str(e) or a == 5:
                        out[f"{name}_{n}"] = f"error:{type(e).__name__}"
                        print(f"[warm-err] {name}_{n}: {str(e)[:200]}",
                              flush=True)
                        break
                    time.sleep(10 + 5 * a)
            else:
                continue
        out[f"level_{n}_s"] = round(time.time() - t0, 1)
        print(f"[warm] level {n}: {out[f'level_{n}_s']}s", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
