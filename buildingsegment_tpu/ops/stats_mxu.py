"""MXU block-form stats sweep: distance matrix + moments as matmuls.

The production stats kernel (ops/stats_sweep.py) builds its [2W, tile]
distance block with 2W lane-SHIFTED reads per tile and accumulates the
ten covariance moments with ~2W·16 vector ops per point — ~12 ms of
the 13.5 ms sweep at 1M points (the bitonic ranking is only ~1.3 ms).
This variant reshapes the same computation onto the MXU:

  * queries are processed in 128-lane blocks; each block's candidate
    set (the ±W Morton window of all 128 queries) is the 128+2W
    consecutive slab rows starting at the block's left edge — a
    128-ALIGNED slice, because blocks start at multiples of 128 and
    the slab carries a W-column halo;
  * the squared-distance matrix of one block is ONE matmul
        D[c, q] = |c−o|² − 2(c−o)·(q−o) + |q−o|²
                = dot_general(Cgeo[8, C], Qgeo[8, 128], contract dim 0)
    with the candidate/query validity masks FOLDED INTO the matmul as
    two +BIG payload rows (an invalid row/column pushes the whole
    lane past every radius/rank gate — no [C, 128] mask broadcasts);
  * the ±W window/self masks are a STATIC [C, 128] addend (computed
    once per kernel from 2-D iotas);
  * ranking batches 8 blocks into a [C, 1024] buffer and runs the
    bitonic network along the candidate (sublane) axis — full-width
    lane utilization, same exactness contract as the production
    kernel's ranking (bit patterns of non-negative f32 order like
    int32);
  * the ten moments of one block are ONE [16, C] × [C, 128] matmul
    against the 0/1 acceptance gate matrix, in RAW block-local form,
    then converted to query-centred offset moments with ~30 lane ops
    per query:  Σ(c−q)ᵃ(c−q)ᵇ = S_ab − q'ᵃS_b − q'ᵇS_a + n·q'ᵃq'ᵇ.

Exactness: NOT bit-identical to ops/stats_sweep.py in general — the
matmul evaluates |c|²−2c·q+|q|² where the shift kernel evaluates
Σ(c−q)²; both round identically only while every intermediate stays
an integer < 2²⁴ (origin-relative coordinates keep intermediates
span-bounded, so this holds for blocks spanning ≲ 2 m; the bit-exact
regime is covered by tests, production scale by tolerance tests and
the bench quality gate).  Reference semantics unchanged: hybrid
radius/max_nn caps per Open3D (tmc3/my_function.h:63), k-th-NN ball
per the depth-0 seed rule (tmc3/my_function.cpp:238).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from buildingsegment_tpu.ops.stats_sweep import _bitonic_rows
from buildingsegment_tpu.ops.window_sweep import _lane_pad

__all__ = ["fused_stats_mxu", "seed_sweep_mxu"]

_BIG = 1e30  # mask payload: far beyond any real d² (python float —
#              a module-level jnp constant would be captured by the
#              kernel and rejected by pallas_call).  Finite on purpose:
#              +inf through the HIGHEST-precision matmul decomposition
#              can breed NaNs (inf − inf in the bf16 splitting).
#: rank values ≥ this bit pattern (f32 1e29) are mask payloads, not
#: distances — real d² tops out near (2·3e7)² ≈ 4e15
_BIG_CUT_BITS = 0x6FA18F08


def _np2(x: int) -> int:
    m = 1
    while m < x:
        m *= 2
    return m


def _stats_mxu_kernel(
    slab_hbm, out_ref, slab, dbuf, sbuf, qbuf, sem, *, tile, w, r_k,
    r_cap, r2,
):
    ti = pl.program_id(0)
    width = tile + 2 * w + _lane_pad(tile, w)
    dma = pltpu.make_async_copy(
        slab_hbm.at[:, pl.ds(ti * tile, width)], slab, sem,
    )
    dma.start()
    dma.wait()

    C = 128 + 2 * w  # candidate rows per 128-query block
    CL = -(-C // 128) * 128  # aligned load width (fits: the slab's
    #                          lane pad rounds 2w up to a 128 multiple)
    gsz = min(8, tile // 128)  # blocks per ranking group
    gl = 128 * gsz

    # static window masks: candidate row c holds the point at offset
    # c − w − q from query lane q; in-window ⇔ |c − w − q| ≤ w.
    # rank additionally EXCLUDES self (offset 0) — the reference skips
    # neighbor slot 0 (tmc3/my_function.h:76-78); moments INCLUDE it
    # (the shift kernel adds self as weight 1 / offset 0, and in raw
    # form self is just the candidate c = q whose converted offset
    # vanishes).
    ci = lax.broadcasted_iota(jnp.int32, (C, 128), 0)
    qi = lax.broadcasted_iota(jnp.int32, (C, 128), 1)
    off = ci - w - qi
    in_win = (off >= -w) & (off <= w)
    rank_add = jnp.where(in_win & (off != 0), 0.0, _BIG)
    mom_add = jnp.where(in_win, 0.0, _BIG)

    def group(bg, _):
        base = bg * gl  # 128-aligned slab offset of the group

        def block(j):
            # Mosaic requires dynamic ref offsets to be provably
            # 128-aligned — load one aligned CL-wide slice per row and
            # take candidates/queries as STATIC in-value slices
            cs = base + j * 128
            lx = slab[0, pl.ds(cs, CL)]
            ly = slab[1, pl.ds(cs, CL)]
            lz = slab[2, pl.ds(cs, CL)]
            lm = slab[3, pl.ds(cs, CL)]

            def cpart(v):
                return lax.slice(v, (0,), (C,))

            def qpart(v):
                return lax.slice(v, (w,), (w + 128,))

            cx, cy, cz, cm = cpart(lx), cpart(ly), cpart(lz), cpart(lm)
            # queries: normalize the offset-w slices to lane offset 0
            # through a scratch round trip — the pool hosts' Mosaic
            # cannot concatenate rows with MIXED lane offsets
            # ("result/input offset mismatch on non-concat dimension"
            # from the jnp.stack below when data rows carry offset w
            # and constant rows offset 0); the store+load costs ~µs
            qbuf[0, :] = qpart(lx)
            qbuf[1, :] = qpart(ly)
            qbuf[2, :] = qpart(lz)
            qbuf[3, :] = qpart(lm)
            qv = qbuf[...]
            qx, qy, qz, qm = qv[0, :], qv[1, :], qv[2, :], qv[3, :]
            # block-local origin: min over VALID candidates (sentinel
            # fills sit at -3e7 and would wreck the span bound)
            ox = jnp.min(jnp.where(cm > 0.5, cx, jnp.float32(3e7)))
            oy = jnp.min(jnp.where(cm > 0.5, cy, jnp.float32(3e7)))
            oz = jnp.min(jnp.where(cm > 0.5, cz, jnp.float32(3e7)))
            any_valid = jnp.max(cm) > 0.5
            ox = jnp.where(any_valid, ox, 0.0)
            oy = jnp.where(any_valid, oy, 0.0)
            oz = jnp.where(any_valid, oz, 0.0)
            cxo, cyo, czo = cx - ox, cy - oy, cz - oz
            qxo, qyo, qzo = qx - ox, qy - oy, qz - oz
            c2 = cxo * cxo + cyo * cyo + czo * czo
            q2 = qxo * qxo + qyo * qyo + qzo * qzo
            ones_c = jnp.ones((C,), jnp.float32)
            ones_q = jnp.ones((128,), jnp.float32)
            # rows 5/6 fold the validity masks into the distance matrix
            cgeo = jnp.stack(
                [cxo, cyo, czo, c2, ones_c,
                 jnp.where(cm > 0.5, 0.0, _BIG), ones_c,
                 jnp.zeros((C,), jnp.float32)],
                axis=0,
            )
            qgeo = jnp.stack(
                [-2.0 * qxo, -2.0 * qyo, -2.0 * qzo, ones_q, q2,
                 ones_q, jnp.where(qm > 0.5, 0.0, _BIG),
                 jnp.zeros((128,), jnp.float32)],
                axis=0,
            )
            d = lax.dot_general(
                cgeo, qgeo, (((0,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            # subtraction cancellation can dip epsilon-negative where
            # the exact d² is 0; clamp so bit-pattern ordering holds
            d = jnp.maximum(d, 0.0)
            dbuf[:, pl.ds(j * 128, 128)] = d
            sbuf[:, pl.ds(j * 128, 128)] = lax.bitcast_convert_type(
                d + rank_add, jnp.int32
            )
            return qxo, qyo, qzo, qm, (ox, oy, oz)

        qlocal = [block(j) for j in range(gsz)]

        # ---- ranking: one bitonic over the whole group ----
        srt = _bitonic_rows(sbuf[:, pl.ds(0, gl)], _np2(C))
        dk_bits = (
            srt[r_k - 1, :] if r_k else jnp.zeros((gl,), jnp.int32)
        )
        dk_f = lax.bitcast_convert_type(dk_bits, jnp.float32)
        out_ref[0, pl.ds(base, gl)] = jnp.where(
            dk_bits >= _BIG_CUT_BITS, 0.0, dk_f
        )
        if r_cap:
            cap_f = lax.bitcast_convert_type(
                srt[r_cap - 1, :], jnp.float32
            )
            r_eff2 = jnp.minimum(jnp.float32(r2), cap_f)
        else:
            r_eff2 = jnp.full((gl,), jnp.float32(r2), jnp.float32)

        # ---- moments: one gate matmul per block, then conversion ----
        for j in range(gsz):
            cs = base + j * 128
            cxo = lax.slice(
                slab[0, pl.ds(cs, CL)], (0,), (C,)
            ) - qlocal[j][4][0]
            cyo = lax.slice(
                slab[1, pl.ds(cs, CL)], (0,), (C,)
            ) - qlocal[j][4][1]
            czo = lax.slice(
                slab[2, pl.ds(cs, CL)], (0,), (C,)
            ) - qlocal[j][4][2]
            pt = jnp.stack(
                [jnp.ones((C,), jnp.float32), cxo, cyo, czo,
                 cxo * cxo, cyo * cyo, czo * czo,
                 cxo * cyo, cxo * czo, cyo * czo,
                 jnp.zeros((C,), jnp.float32),
                 jnp.zeros((C,), jnp.float32),
                 jnp.zeros((C,), jnp.float32),
                 jnp.zeros((C,), jnp.float32),
                 jnp.zeros((C,), jnp.float32),
                 jnp.zeros((C,), jnp.float32)],
                axis=0,
            )
            re = lax.slice(r_eff2, (j * 128,), ((j + 1) * 128,))
            g = jnp.where(
                dbuf[:, pl.ds(j * 128, 128)] + mom_add <= re[None, :],
                1.0, 0.0,
            )
            m = lax.dot_general(
                pt, g, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            qxo, qyo, qzo, qm, _ = qlocal[j]
            n_ = m[0]
            sx, sy, sz = m[1], m[2], m[3]
            sxx = m[4] - 2.0 * qxo * sx + n_ * qxo * qxo
            syy = m[5] - 2.0 * qyo * sy + n_ * qyo * qyo
            szz = m[6] - 2.0 * qzo * sz + n_ * qzo * qzo
            sxy = m[7] - qxo * sy - qyo * sx + n_ * qxo * qyo
            sxz = m[8] - qxo * sz - qzo * sx + n_ * qxo * qzo
            syz = m[9] - qyo * sz - qzo * sy + n_ * qyo * qzo
            col = pl.ds(cs, 128)
            out_ref[1, col] = n_
            out_ref[2, col] = sx - n_ * qxo
            out_ref[3, col] = sy - n_ * qyo
            out_ref[4, col] = sz - n_ * qzo
            out_ref[5, col] = sxx
            out_ref[6, col] = syy
            out_ref[7, col] = szz
            out_ref[8, col] = sxy
            out_ref[9, col] = sxz
            out_ref[10, col] = syz
        return 0

    lax.fori_loop(0, tile // gl, group, 0)
    zeros = jnp.zeros((tile,), jnp.float32)
    for r in range(11, 16):
        out_ref[r, :] = zeros


def _seed_mxu_kernel(
    spine_hbm, dyn_hbm, out_ref, spine, dyn, qbuf, sem, sem2, *, tile,
    w, th_thickness, th_normal_cos, signed,
):
    """Seed sweep in block-MXU form.

    Same depth-0 strictness rule as ``window_sweep._seed_kernel_pair``
    (every in-ball ±W candidate must pass the plane test,
    tmc3/my_function.cpp:238): per 128-query block the three pair
    quantities are matmuls —

        D[c, q]  = |c−q|²          (distance matmul, masks folded in)
        CN[c, q] = n_c · n_q        (normal-agreement matmul)
        CP[c, q] = (c−o) · n_q      (projection matmul; minus the lane
                                     vector (q−o)·n_q gives the plane
                                     band distance)

    and ``bad[q] = max_c(in_ball & ~ok)`` is a sublane reduction.
    Same exactness regime as the stats kernel above (D rounds
    differently from the shift form near ball boundaries).
    """
    ti = pl.program_id(0)
    width = tile + 2 * w + _lane_pad(tile, w)
    dma = pltpu.make_async_copy(
        spine_hbm.at[:, pl.ds(ti * tile, width)], spine, sem,
    )
    dma2 = pltpu.make_async_copy(
        dyn_hbm.at[:, pl.ds(ti * tile, width)], dyn, sem2,
    )
    dma.start()
    dma2.start()
    dma.wait()
    dma2.wait()

    C = 128 + 2 * w
    CL = -(-C // 128) * 128

    ci = lax.broadcasted_iota(jnp.int32, (C, 128), 0)
    qi = lax.broadcasted_iota(jnp.int32, (C, 128), 1)
    off = ci - w - qi
    # candidates: in-window, self EXCLUDED (slot 0 skipped,
    # my_function.cpp:224)
    win_add = jnp.where(
        (off >= -w) & (off <= w) & (off != 0), 0.0, _BIG
    )

    def block(b, _):
        cs = b * 128
        lx = spine[0, pl.ds(cs, CL)]
        ly = spine[1, pl.ds(cs, CL)]
        lz = spine[2, pl.ds(cs, CL)]
        lnx = spine[3, pl.ds(cs, CL)]
        lny = spine[4, pl.ds(cs, CL)]
        lnz = spine[5, pl.ds(cs, CL)]
        lm = spine[6, pl.ds(cs, CL)]
        ldk = dyn[0, pl.ds(cs, CL)]

        def cpart(v):
            return lax.slice(v, (0,), (C,))

        def qpart(v):
            return lax.slice(v, (w,), (w + 128,))

        cx, cy, cz, cm = cpart(lx), cpart(ly), cpart(lz), cpart(lm)
        cnx, cny, cnz = cpart(lnx), cpart(lny), cpart(lnz)
        # normalize query rows to lane offset 0 via a scratch round
        # trip (pool-host Mosaic cannot concatenate mixed-offset rows)
        qbuf[0, :] = qpart(lx)
        qbuf[1, :] = qpart(ly)
        qbuf[2, :] = qpart(lz)
        qbuf[3, :] = qpart(lm)
        qbuf[4, :] = qpart(lnx)
        qbuf[5, :] = qpart(lny)
        qbuf[6, :] = qpart(lnz)
        qbuf[7, :] = qpart(ldk)
        qv = qbuf[...]
        qx, qy, qz, qm = qv[0, :], qv[1, :], qv[2, :], qv[3, :]
        qnx, qny, qnz, qdk = qv[4, :], qv[5, :], qv[6, :], qv[7, :]

        ox = jnp.min(jnp.where(cm > 0.5, cx, jnp.float32(3e7)))
        oy = jnp.min(jnp.where(cm > 0.5, cy, jnp.float32(3e7)))
        oz = jnp.min(jnp.where(cm > 0.5, cz, jnp.float32(3e7)))
        any_valid = jnp.max(cm) > 0.5
        ox = jnp.where(any_valid, ox, 0.0)
        oy = jnp.where(any_valid, oy, 0.0)
        oz = jnp.where(any_valid, oz, 0.0)
        cxo, cyo, czo = cx - ox, cy - oy, cz - oz
        qxo, qyo, qzo = qx - ox, qy - oy, qz - oz
        c2 = cxo * cxo + cyo * cyo + czo * czo
        q2 = qxo * qxo + qyo * qyo + qzo * qzo
        ones_c = jnp.ones((C,), jnp.float32)
        ones_q = jnp.ones((128,), jnp.float32)
        zer_c = jnp.zeros((C,), jnp.float32)
        zer_q = jnp.zeros((128,), jnp.float32)

        dd = lax.dot_general(
            jnp.stack([cxo, cyo, czo, c2, ones_c,
                       jnp.where(cm > 0.5, 0.0, _BIG), ones_c,
                       zer_c], 0),
            jnp.stack([-2.0 * qxo, -2.0 * qyo, -2.0 * qzo, ones_q, q2,
                       ones_q, jnp.where(qm > 0.5, 0.0, _BIG),
                       zer_q], 0),
            (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        # normal cos + projection share one matmul pair structure
        cn = lax.dot_general(
            jnp.stack([cnx, cny, cnz, zer_c, zer_c, zer_c, zer_c,
                       zer_c], 0),
            jnp.stack([qnx, qny, qnz, zer_q, zer_q, zer_q, zer_q,
                       zer_q], 0),
            (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        cp = lax.dot_general(
            jnp.stack([cxo, cyo, czo, zer_c, zer_c, zer_c, zer_c,
                       zer_c], 0),
            jnp.stack([qnx, qny, qnz, zer_q, zer_q, zer_q, zer_q,
                       zer_q], 0),
            (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        qdotn = qxo * qnx + qyo * qny + qzo * qnz
        pd = jnp.abs(cp - qdotn[None, :])
        pc = cn if signed else jnp.abs(cn)
        in_ball = (dd + win_add) <= qdk[None, :]
        fails = in_ball & ~(
            (pd <= th_thickness) & (pc >= th_normal_cos)
        )
        # 2-D output row 0: dimension-1 dynamic stores need only
        # 128-alignment (1-D stores would need 1024, and 1-D
        # concatenates past the first lane tile do not lower)
        out_ref[0, pl.ds(cs, 128)] = jnp.max(
            jnp.where(fails, 1.0, 0.0), axis=0
        )
        return 0

    lax.fori_loop(0, tile // 128, block, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n", "w", "tile", "th_thickness", "th_normal_cos",
                     "signed", "interpret"),
)
def seed_sweep_mxu(
    spine, dyn, n, *, w, tile, th_thickness, th_normal_cos,
    signed=False, interpret=False,
):
    """Block-MXU seed sweep — same contract as
    :func:`ops.window_sweep.seed_sweep_pair` (spine rows 0-2 position,
    3-5 normal, 6 mask; dyn row 0 the squared k-th-NN ball; returns
    f32[n] bad-flags), with the matmul exactness caveat."""
    n_pad = -(-n // tile) * tile
    width = tile + 2 * w + _lane_pad(tile, w)
    kernel = functools.partial(
        _seed_mxu_kernel, tile=tile, w=w,
        th_thickness=th_thickness, th_normal_cos=th_normal_cos,
        signed=signed,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda ti: (0, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, width), jnp.float32),
            pltpu.VMEM((4, width), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),  # query-row relayout
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(spine, dyn)
    return lax.slice(out, (0, 0), (1, n)).reshape(n)


@functools.partial(
    jax.jit,
    static_argnames=("n", "k", "w", "tile", "max_nn", "radius",
                     "interpret"),
)
def fused_stats_mxu(slab, n, *, k, w, tile, radius, max_nn=None,
                    interpret=False):
    """MXU-form stats sweep over a pre-built slab.

    Same contract as :func:`ops.stats_sweep.fused_stats_sweep`
    (slab rows 0-2 position, 3 mask; returns (kth_sq_dist f32[n],
    s0 f32[n], s1 f32[n,3], s2 f32[n,6])) with the exactness caveat in
    the module docstring.
    """
    n_pad = -(-n // tile) * tile
    w2 = 2 * w
    cap_active = max_nn is not None and (max_nn - 1) < w2
    C = 128 + w2
    gl = 128 * min(8, tile // 128)
    kernel = functools.partial(
        _stats_mxu_kernel, tile=tile, w=w, r_k=k - 1,
        r_cap=(max_nn - 1) if cap_active else 0,
        r2=float(radius) * float(radius),
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((16, tile), lambda ti: (0, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, tile + w2 + _lane_pad(tile, w)), jnp.float32),
            pltpu.VMEM((C, gl), jnp.float32),
            pltpu.VMEM((C, gl), jnp.int32),
            pltpu.VMEM((8, 128), jnp.float32),  # query-row relayout
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(slab)
    if n_pad != n:
        out = lax.slice(out, (0, 0), (16, n))
    dk, s0 = out[0], out[1]
    s1 = jnp.transpose(out[2:5])
    s2 = jnp.transpose(out[5:11])
    return dk, s0, s1, s2
