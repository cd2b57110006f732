"""Pallas compact-space sweep: one kernel per region-growing iteration.

The windowized fixed-point solver (``seg.region_grow.window_body``)
issues ~60 XLA kernels per sweep — two scatter-adds (each hiding a full
sort of its update rows), a packed [ng, 6] model gather (~2 GB/s), the
slab build, the Pallas slice sweep, [L, L] pair tests, two more
scatter-mins and a chain of jump-doubling gathers.  At the multigrid
coarse scale (ng ≈ 67k) every one of those ops is tiny, so the sweep
cost is almost pure per-kernel dispatch + hidden-sort overhead
(~5 ms/sweep measured at ng = 67k).

Live labels collapse geometrically (66k → 7.7k → 1.0k → 119 on the 1M
bench scene), so after a couple of warm sweeps the label space fits a
small COMPACT slot table.  This kernel runs one full sweep — per-label
stats, model refresh, the ±w hop/merge window pass, global coplanar
pair tests, merge-hook resolution and jump-doubling — as ONE Pallas
program on the VMEM-resident problem:

  * labels live in a compact slot space [0, Lc) assigned once in
    ascending label-rank order (slot order ≡ label order, so min-slot
    union is exactly min-label union);
  * every scatter/gather becomes a one-hot matmul over live 128-slot
    chunks (``ops/segsum.py``'s trick, exact under HIGHEST precision),
    bounded by the live-slot count, or a static-slice row operation;
  * the [Lc, Lc] pair tests and the [Lc] parent table are computed
    in-register (Lc ≤ 2048).

Semantics match ``window_body`` exactly (same tests, same hook rules,
same jump rounds) whenever the live-label count stays ≤ the pair-table
coverage; the only deliberate difference is pair coverage — this kernel
tests ALL Lc slots every sweep, while the XLA path compacts the lowest
``L`` (1024) live labels per sweep, so above 1024 live labels the
compact path merges strictly MORE pairs per sweep (same fixed-point
family, faster convergence).  ``seg.region_grow`` only switches to this
kernel once live ≤ Lc (see its warm loop).

Replaces the reference's O(n²) recursive growth
(tmc3/my_function.cpp:220-258) together with region_grow.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["compact_sweep", "COMPACT_L"]

#: compact slot capacity — must hold every live label at switch time
COMPACT_L = 2048
_CHUNK = 128
_CB = 4096  # column block for one-hot passes (bounds eq to [128, _CB])


def _lane_pad(tile, w):
    return (-(tile + 2 * w)) % 128


def _blocks(width):
    return [(s, min(_CB, width - s)) for s in range(0, width, _CB)]


def _compact_kernel(
    live_ref, spine_hbm, dyn_hbm, anchor_ref, out_lab, out_cnt,
    spine, dyn, acc_ref, mp_ref, par_ref, sem, sem2, *,
    tile, w, lc, th_thickness, th_normal_cos, edge_gate2,
    th_anchor_cos, anchor_gate, signed, jump_rounds, pair_block,
):
    width = tile + 2 * w + _lane_pad(tile, w)
    dma = pltpu.make_async_copy(spine_hbm, spine, sem)
    dma2 = pltpu.make_async_copy(dyn_hbm, dyn, sem2)
    dma.start()
    dma2.start()
    dma.wait()
    dma2.wait()

    inf_slot = jnp.float32(lc)
    nc = (live_ref[0] + _CHUNK - 1) // _CHUNK  # live 128-slot chunks

    def cmag(x):
        return x if signed else jnp.abs(x)

    clab = dyn[0, :]  # [width] f32 slot ids (lc = none)
    prx, pry, prz = spine[0, :], spine[1, :], spine[2, :]
    nrx, nry, nrz = spine[3, :], spine[4, :], spine[5, :]
    cnx, cny, cnz = spine[6, :], spine[7, :], spine[8, :]
    mrow = spine[9, :]

    def eq_of(ids_b, c):
        """One-hot [128, cb] selector for slot chunk c over ids_b."""
        cb = ids_b.shape[0]
        base = (c * _CHUNK).astype(jnp.float32)
        tgt = base + lax.broadcasted_iota(
            jnp.int32, (_CHUNK, cb), 0
        ).astype(jnp.float32)
        return jnp.where(tgt == ids_b[None, :], 1.0, 0.0)

    # ---- A. anchor lookup per point (purity gate) --------------------
    if anchor_gate:
        anc_rows = []
        for s, cb in _blocks(width):
            ids_b = lax.slice(clab, (s,), (s + cb,))

            def chunk_a(c, acc):
                eq = eq_of(ids_b, c)
                tabc = anchor_ref[:, pl.ds(c * _CHUNK, _CHUNK)]  # [8,128]
                return acc + lax.dot_general(
                    tabc, eq, (((1,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )

            anc_rows.append(lax.fori_loop(
                0, nc, chunk_a, jnp.zeros((8, cb), jnp.float32)
            ))
        anc = jnp.concatenate(anc_rows, axis=1)  # [8, width], rows 0-2
        agree = cmag(cnx * anc[0] + cny * anc[1] + cnz * anc[2])
        pure = (clab < inf_slot) & (agree >= th_anchor_cos)

    # ---- B. payload rows + C. per-slot stats table -------------------
    valid = clab < inf_slot
    vf = jnp.where(valid, 1.0, 0.0)
    sq = prx * prx + pry * pry + prz * prz
    pay = [vf, cnx * vf, cny * vf, cnz * vf,
           prx * vf, pry * vf, prz * vf, sq * vf]
    if anchor_gate:
        pf = jnp.where(pure, 1.0, 0.0)
        pay += [pf, cnx * pf, cny * pf, cnz * pf,
                prx * pf, pry * pf, prz * pf, sq * pf]
    else:
        # fixed 16-col layout keeps the acc stores full-row
        pay += [jnp.zeros((width,), jnp.float32)] * 8

    acc_ref[...] = jnp.zeros((lc, 16), jnp.float32)
    for s, cb in _blocks(width):
        ids_b = lax.slice(clab, (s,), (s + cb,))
        # row-stack (sublane concat) — minor-axis stacking lowers badly
        pay_b = jnp.stack(
            [lax.slice(p, (s,), (s + cb,)) for p in pay], axis=0
        )  # [16, cb]

        def chunk_c(c, _):
            eq = eq_of(ids_b, c)
            contrib = lax.dot_general(
                eq, pay_b, (((1,), (1,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [128, 16]
            r0 = c * _CHUNK
            acc_ref[pl.ds(r0, _CHUNK), :] = (
                acc_ref[pl.ds(r0, _CHUNK), :] + contrib
            )
            return 0

        lax.fori_loop(0, nc, chunk_c, 0)

    # ---- D. models from the stats table (acc_models semantics) -------
    acc = acc_ref[...]  # [lc, 16]
    cnt_a = acc[:, 0]
    if anchor_gate:
        cnt_p = acc[:, 8]
        usep = cnt_p > 0
        sc = jnp.where(usep, cnt_p, jnp.maximum(cnt_a, 1.0))[:, None]
        sn = jnp.where(usep[:, None], acc[:, 9:12], acc[:, 1:4]) / sc
        ctr = jnp.where(usep[:, None], acc[:, 12:15], acc[:, 4:7]) / sc
        sqm = jnp.where(usep, acc[:, 15], acc[:, 7]) / sc[:, 0]
    else:
        sc = jnp.maximum(cnt_a, 1.0)[:, None]
        sn = acc[:, 1:4] / sc
        ctr = acc[:, 4:7] / sc
        sqm = acc[:, 7] / sc[:, 0]
    ln = jnp.sqrt(jnp.maximum(jnp.sum(sn * sn, -1, keepdims=True), 1e-20))
    mn_tab = sn / ln  # [lc, 3] unit model normal
    r_tab = jnp.sqrt(jnp.maximum(sqm - jnp.sum(ctr * ctr, -1), 0.0))
    live_tab = cnt_a > 0

    # mtab rows for the per-point lookup: [8, lc] (n, c, 0, 0)
    mtab = jnp.concatenate(
        [jnp.transpose(mn_tab), jnp.transpose(ctr),
         jnp.zeros((2, lc), jnp.float32)], axis=0
    )

    # ---- E. per-point model rows via one-hot lookup ------------------
    # the chunked reads need mtab in a ref: Mosaic lowers dynamic
    # slices of refs but NOT lax.dynamic_slice of a loaded array — so
    # stage it in par_ref, which is free until section G overwrites it
    par_ref[...] = mtab
    for s, cb in _blocks(width):
        ids_b = lax.slice(clab, (s,), (s + cb,))

        def chunk_e(c, accv):
            eq = eq_of(ids_b, c)
            tabc = par_ref[:, pl.ds(c * _CHUNK, _CHUNK)]  # [8, 128]
            return accv + lax.dot_general(
                tabc, eq, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        mp_ref[:, pl.ds(s, cb)] = lax.fori_loop(
            0, nc, chunk_e, jnp.zeros((8, cb), jnp.float32)
        )

    # ---- F. ±w hop/merge offset sweep (label_sweep semantics) --------
    def vrow(v, st):
        return lax.slice(v, (st,), (st + tile,))

    mnx_f, mny_f, mnz_f = mp_ref[0, :], mp_ref[1, :], mp_ref[2, :]
    mcx_f, mcy_f, mcz_f = mp_ref[3, :], mp_ref[4, :], mp_ref[5, :]
    px, py, pz = vrow(prx, w), vrow(pry, w), vrow(prz, w)
    nx, ny, nz = vrow(nrx, w), vrow(nry, w), vrow(nrz, w)
    mask0 = vrow(mrow, w)
    lab0 = vrow(clab, w)
    mnx, mny, mnz = vrow(mnx_f, w), vrow(mny_f, w), vrow(mnz_f, w)
    mcx, mcy, mcz = vrow(mcx_f, w), vrow(mcy_f, w), vrow(mcz_f, w)
    has = lab0 < inf_slot
    new = lab0
    best = jnp.full((tile,), inf_slot, jnp.float32)
    for slot in range(2 * w):
        start = slot if slot < w else slot + 1
        dx = px - vrow(prx, start)
        dy = py - vrow(pry, start)
        dz = pz - vrow(prz, start)
        near = (
            (dx * dx + dy * dy + dz * dz <= edge_gate2)
            & (vrow(mrow, start) > 0.5)
            & (mask0 > 0.5)
        )
        cl = vrow(clab, start)
        cmnx = vrow(mnx_f, start)
        cmny = vrow(mny_f, start)
        cmnz = vrow(mnz_f, start)
        cmcx = vrow(mcx_f, start)
        cmcy = vrow(mcy_f, start)
        cmcz = vrow(mcz_f, start)
        d = jnp.abs(
            (px - cmcx) * cmnx + (py - cmcy) * cmny + (pz - cmcz) * cmnz
        )
        c = cmag(nx * cmnx + ny * cmny + nz * cmnz)
        hop_ok = (
            (cl < inf_slot) & near
            & (d <= th_thickness) & (c >= th_normal_cos)
        )
        new = jnp.minimum(new, jnp.where(hop_ok, cl, inf_slot))
        dcx = cmcx - mcx
        dcy = cmcy - mcy
        dcz = cmcz - mcz
        mutual = (
            (jnp.abs(dcx * mnx + dcy * mny + dcz * mnz) <= th_thickness)
            & (jnp.abs(dcx * cmnx + dcy * cmny + dcz * cmnz)
               <= th_thickness)
            & (cmag(mnx * cmnx + mny * cmny + mnz * cmnz)
               >= th_normal_cos)
        )
        mrg_ok = has & (cl < lab0) & near & mutual
        best = jnp.minimum(best, jnp.where(mrg_ok, cl, inf_slot))

    # ---- G. merge-hook parent table: segment-min of best by slot -----
    # (2-D iota + reshape — Mosaic does not lower 1-D iota)
    par_ref[0, :] = lax.broadcasted_iota(
        jnp.int32, (1, lc), 1
    ).astype(jnp.float32).reshape((lc,))
    for s, cb in _blocks(tile):
        ids_b = lax.slice(lab0, (s,), (s + cb,))
        best_b = lax.slice(best, (s,), (s + cb,))

        def chunk_g(c, _):
            eq = eq_of(ids_b, c) > 0.5
            vals = jnp.where(
                eq & (best_b < inf_slot)[None, :], best_b[None, :],
                inf_slot,
            )
            m = jnp.min(vals, axis=1)  # [128]
            r0 = c * _CHUNK
            par_ref[0, pl.ds(r0, _CHUNK)] = jnp.minimum(
                par_ref[0, pl.ds(r0, _CHUNK)], m
            )
            return 0

        lax.fori_loop(0, nc, chunk_g, 0)

    # ---- H. global coplanar-overlap pairs over ALL lc slots ----------
    # (window_body step 4b on the slot table; row chunks bound VMEM)
    nc_dot = jnp.sum(mn_tab * ctr, -1)  # [lc]
    ccd = jnp.sum(ctr * ctr, -1)
    reach_half = 2.0 * r_tab
    root_gate = jnp.float32(math.sqrt(edge_gate2))
    ctrT = jnp.transpose(ctr)  # [3, lc]
    mnT = jnp.transpose(mn_tab)
    slot_ids = lax.broadcasted_iota(jnp.int32, (1, lc), 1).astype(
        jnp.float32
    ).reshape((lc,))
    for r0 in range(0, lc, pair_block):
        rb = min(pair_block, lc - r0)
        mn_r = lax.slice(mn_tab, (r0, 0), (r0 + rb, 3))
        ctr_r = lax.slice(ctr, (r0, 0), (r0 + rb, 3))
        nc_r = lax.slice(nc_dot, (r0,), (r0 + rb,))
        ccd_r = lax.slice(ccd, (r0,), (r0 + rb,))
        live_r = lax.slice(live_tab, (r0,), (r0 + rb,))
        reach_r = lax.slice(reach_half, (r0,), (r0 + rb,))
        ids_r = lax.slice(slot_ids, (r0,), (r0 + rb,))
        ncT = lax.dot_general(
            mn_r, ctrT, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [rb, lc] = n_a · c_b
        cnT = lax.dot_general(
            ctr_r, mnT, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [rb, lc] = c_a · n_b
        nrm_sep = ncT - nc_r[:, None]          # (c_b − c_a)·n_a
        nrm_sep_b = nc_dot[None, :] - cnT      # (c_b − c_a)·n_b
        cosab = cmag(lax.dot_general(
            mn_r, mnT, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ))
        d2 = ccd_r[:, None] + ccd[None, :] - 2.0 * lax.dot_general(
            ctr_r, ctrT, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        inplane2 = jnp.maximum(d2 - nrm_sep * nrm_sep, 0.0)
        reach = reach_r[:, None] + reach_half[None, :] + root_gate
        ok = (
            (jnp.abs(nrm_sep) <= th_thickness)
            & (jnp.abs(nrm_sep_b) <= th_thickness)
            & (cosab >= th_normal_cos)
            & (inplane2 <= reach * reach)
            & live_r[:, None]
            & live_tab[None, :]
        )
        la = ids_r[:, None]
        lb = slot_ids[None, :]
        pair_lo = jnp.where(
            ok & (la != lb), jnp.minimum(la, lb), inf_slot
        )
        row_min = jnp.min(pair_lo, axis=1)  # [rb]
        par_ref[0, pl.ds(r0, rb)] = jnp.minimum(
            par_ref[0, pl.ds(r0, rb)], row_min
        )

    # ---- I. jump-doubling on the [lc] parent table -------------------
    for _ in range(jump_rounds):
        parent = par_ref[0, :]

        def chunk_i(c, accv):
            eq = eq_of(parent, c)  # [128, lc] one-hot of parent values
            pvals = par_ref[0, pl.ds(c * _CHUNK, _CHUNK)]  # [128]
            return accv + lax.dot_general(
                pvals[None, :], eq, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )[0]

        # live-row parents only ever point at live slots (< nc·128), so
        # the chunk-bounded one-hot covers every row a live chain can
        # read; dead rows ≥ live0 keep their identity via the guard
        pofp = lax.fori_loop(0, nc, chunk_i, jnp.zeros((lc,), jnp.float32))
        covered = parent < (nc * _CHUNK).astype(jnp.float32)
        par_ref[0, :] = jnp.minimum(
            parent, jnp.where(covered, pofp, parent)
        )

    # ---- J. apply the collapsed parents to the hop result ------------
    changed = jnp.float32(0.0)
    for s, cb in _blocks(tile):
        new_b = lax.slice(new, (s,), (s + cb,))

        def chunk_j(c, accv):
            eq = eq_of(new_b, c)
            pvals = par_ref[0, pl.ds(c * _CHUNK, _CHUNK)]
            return accv + lax.dot_general(
                pvals[None, :], eq, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )[0]

        mapped = lax.fori_loop(
            0, nc, chunk_j, jnp.zeros((cb,), jnp.float32)
        )
        final_b = jnp.where(new_b < inf_slot, mapped, new_b)
        out_lab[pl.ds(s, cb)] = final_b
        lab0_b = lax.slice(lab0, (s,), (s + cb,))
        changed = changed + jnp.sum(
            jnp.where(final_b != lab0_b, 1.0, 0.0)
        )

    out_cnt[...] = jnp.full((8, 128), changed, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "w", "tile", "lc", "th_thickness", "th_normal_cos",
        "edge_gate2", "th_anchor_cos", "anchor_gate", "signed",
        "jump_rounds", "interpret",
    ),
)
def compact_sweep(
    spine, dyn, anchor_tab, live0, n, *, w, tile, lc,
    th_thickness, th_normal_cos, edge_gate2, th_anchor_cos,
    anchor_gate, signed=False, jump_rounds=2, interpret=None,
):
    """One full compact-space region-growing sweep as one kernel.

    Args:
        spine: f32[16, width] from ``window_sweep.make_slab`` — rows
            0-2 position, 3-5 normal, 6-8 canonicalized normal (model/
            stats source), 9 mask; built once per solve.
        dyn: f32[4, width] from ``make_dyn_row`` — row 0 = slot label
            (lc = none), rebuilt per sweep.
        anchor_tab: f32[8, lc] — rows 0-2 anchor normal per slot
            (zeros when ``anchor_gate`` is False).
        live0: int32 scalar — slot count bound (slots ≥ live0 unused).
        n: real row count (tile covers it; one grid step).

    Returns (new_label f32[n] slot ids, n_changed f32 scalar).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    width = tile + 2 * w + _lane_pad(tile, w)
    kernel = functools.partial(
        _compact_kernel, tile=tile, w=w, lc=lc,
        th_thickness=th_thickness, th_normal_cos=th_normal_cos,
        edge_gate2=edge_gate2, th_anchor_cos=th_anchor_cos,
        anchor_gate=anchor_gate, signed=signed,
        jump_rounds=jump_rounds, pair_block=256,
    )
    nl = jnp.asarray(live0, jnp.int32).reshape((1,))
    out_lab, out_cnt = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, lc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tile,), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, width), jnp.float32),
            pltpu.VMEM((4, width), jnp.float32),
            pltpu.VMEM((lc, 16), jnp.float32),
            pltpu.VMEM((8, width), jnp.float32),
            pltpu.VMEM((8, lc), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nl, spine, dyn, anchor_tab)
    if tile != n:
        out_lab = lax.slice(out_lab, (0,), (n,))
    return out_lab, out_cnt[0, 0]
