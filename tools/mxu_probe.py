"""Bisect which block-MXU kernel construct the REMOTE Mosaic rejects.

The local AOT harness (libtpu 0.0.34) compiles ops/stats_mxu.py fine;
the axon remote-compile pool hosts raise MosaicError.  This probe
compiles one tiny Pallas kernel per suspicious construct on the live
backend and prints OK / the error per feature:

  a. lane-offset value slice (lax.slice(v, (64,), (192,)) of a [256])
  b. dot_general contracting dim 0 × dim 0 ([8,256] @ [8,128])
  c. 2-D iota masks + where-add
  d. in-kernel bitonic over [256, 1024] (reshape ladder)
  e. fori_loop with 128-aligned dynamic ref offsets + static in-value
     slices (the full stats-mxu read pattern, minimal)

Run on the real chip:  python tools/mxu_probe.py
"""

import functools
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    out = {}

    def run(tag, kernel, in_shapes, out_shape, scratch=()):
        try:
            args = [jnp.zeros(s, jnp.float32) for s in in_shapes]
            r = pl.pallas_call(
                kernel,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM)
                    for _ in in_shapes
                ],
                scratch_shapes=list(scratch),
            )(*args)
            np.asarray(r.ravel()[0])
            out[tag] = "OK"
        except Exception as e:
            out[tag] = f"{type(e).__name__}: {str(e)[:180]}"

    def k_slice(x_ref, o_ref):
        v = x_ref[0, :]  # [256]
        o_ref[0, :] = lax.slice(v, (64,), (192,))

    run("a_lane_offset_value_slice", k_slice, [(8, 256)], (8, 128))

    def k_dot0(a_ref, b_ref, o_ref):
        d = lax.dot_general(
            a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = d

    run("b_dot_general_dim0", k_dot0, [(8, 256), (8, 128)], (256, 128))

    def k_iota(x_ref, o_ref):
        ci = lax.broadcasted_iota(jnp.int32, (256, 128), 0)
        qi = lax.broadcasted_iota(jnp.int32, (256, 128), 1)
        off = ci - 64 - qi
        add = jnp.where((off >= -64) & (off <= 64), 0.0, 1e30)
        o_ref[...] = x_ref[...] + add

    run("c_iota_masks", k_iota, [(256, 128)], (256, 128))

    def k_bitonic(x_ref, o_ref):
        from buildingsegment_tpu.ops.stats_sweep import _bitonic_rows

        b = lax.bitcast_convert_type(x_ref[...], jnp.int32)
        srt = _bitonic_rows(b, 256)
        o_ref[0, :] = lax.bitcast_convert_type(srt[13, :], jnp.float32)

    run("d_bitonic_256x1024", k_bitonic, [(256, 1024)], (8, 1024))

    def k_fori(x_ref, o_ref, buf, *, tile=1024):
        def blk(b, _):
            cs = b * 128
            v = x_ref[0, pl.ds(cs, 256)]
            q = lax.slice(v, (64,), (192,))
            o_ref[0, pl.ds(cs, 128)] = q * 2.0
            return 0

        lax.fori_loop(0, tile // 128, blk, 0)

    run(
        "e_fori_aligned_reads", k_fori, [(8, 1024 + 256)], (8, 1024),
        scratch=[pltpu.VMEM((8, 128), jnp.float32)],
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
