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
    in 128-row × ``pair_block``-column tiles (Lc ≤ 2048).

MOSAIC LAYOUT + VMEM RULES (the round-3 compile tarpit, root-caused
via local AOT compiles — tools/aot_tpu.py):

  * 1-D values live on LANES.  Any ``vec[:, None]`` lane→sublane
    broadcast, ``acc[:, k]`` column extraction, or ``min(axis=1)``
    lane-reduce-to-1-D forces a sublane relayout that v5e either
    cannot lower ("Sublane gather not supported") or compiles
    pathologically (hours).  Per-slot tables therefore stay [lc, 1]
    sublane COLUMNS (keepdims slices), row-forms are made by explicit
    ``jnp.transpose``, and pair reductions run along axis 0
    (sublanes) straight into the [1, ·] parent row.
  * Spilled values are LANE-PADDED to 128: a [lc, k≤3] sublane-major
    value costs a full [lc, 128] ≈ 1 MB spill slot (section D held
    ~10 of them = a measured ~9 MB arena), so per-slot table math
    runs in lane-major [k, lc] row form (8 KB/row) and the pair
    table is staged in a [8, lc] scratch (``ptab_ref``).
  * Unrolled loops over full-width values do not share spill slots —
    the original 2w-slot hop sweep on [tile] values cost ~60 MB of
    spill slots at ng=67k.  Every block loop is a rolled
    ``lax.fori_loop`` whose body reads its inputs through refs with
    dynamic offsets; dynamic lane offsets must be PROVABLY 128-
    aligned, so blocks read the aligned enclosing window and take
    static in-value slices for the ±w offsets.
  * Narrow column-slice STORES into a [lc, 16] ref
    (``acc_ref[:, 8:11] = …``) cost ~16 MB in Mosaic's lowering;
    store full rows (or whole refs) instead.

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

#: compact slot capacity — must hold every live label at switch time.
#: 8192 (enter right after the peeled singleton sweep, live 66k → 7.7k)
#: was MEASURED SLOWER on the chip (62.8 ms coarse solve vs 25.5 at
#: 2048, labs 2026-08-19): the first compact sweeps then run at a
#: ~7.7k live bound, 4×ing the one-hot chunk loops that dominate the
#: kernel, and the above-cap superset-merge semantics diverge from the
#: XLA loop.  2048 keeps the warm XLA sweeps until live fits, where the
#: kernel is bit-identical and ~1.4× faster than the XLA sweeps.
COMPACT_L = 2048
_CHUNK = 128
_CB = 1024  # column block for one-hot passes: sets the per-body live
#             set ([128, _CB] one-hots ⇒ ~0.5 MB each) and hence the
#             kernel's VMEM spill arena


def _lane_pad(tile, w):
    return (-(tile + 2 * w)) % 128


def _compact_kernel(
    live_ref, spine_hbm, dyn_hbm, anchor_ref, out_lab, out_cnt,
    spine, dyn, acc_ref, mp_ref, par_ref, ptab_ref, sem, sem2, *,
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

    def eq_of(ids_b, c):
        """One-hot [128, cb] selector for slot chunk c over ids_b."""
        cb = ids_b.shape[0]
        base = (c * _CHUNK).astype(jnp.float32)
        tgt = base + lax.broadcasted_iota(
            jnp.int32, (_CHUNK, cb), 0
        ).astype(jnp.float32)
        return jnp.where(tgt == ids_b[None, :], 1.0, 0.0)

    def for_blocks(total, body):
        """body(s, cb) over _CB blocks of [0, total): rolled fori over
        the full blocks (dynamic s, side effects through refs only) +
        one static tail block."""
        nb = total // _CB
        tail = total - nb * _CB

        def outer(i, _):
            body(i * _CB, _CB)
            return 0

        if nb:
            lax.fori_loop(0, nb, outer, 0)
        if tail:
            body(nb * _CB, tail)  # static tail offset

    # ---- A/B/C. anchor purity + per-slot stats table, per block ------
    # (full-width anc [8, width] / 16 payload rows were a VMEM spill
    # peak — every row is built per _CB-column block instead)
    acc_ref[...] = jnp.zeros((lc, 16), jnp.float32)

    def stats_block(s, cb):
        ids_b = dyn[0, pl.ds(s, cb)]
        prx_b = spine[0, pl.ds(s, cb)]
        pry_b = spine[1, pl.ds(s, cb)]
        prz_b = spine[2, pl.ds(s, cb)]
        cnx_b = spine[6, pl.ds(s, cb)]
        cny_b = spine[7, pl.ds(s, cb)]
        cnz_b = spine[8, pl.ds(s, cb)]
        valid_b = ids_b < inf_slot
        vf = jnp.where(valid_b, 1.0, 0.0)
        sq_b = prx_b * prx_b + pry_b * pry_b + prz_b * prz_b
        pay_rows = [vf, cnx_b * vf, cny_b * vf, cnz_b * vf,
                    prx_b * vf, pry_b * vf, prz_b * vf, sq_b * vf]
        if anchor_gate:
            def chunk_a(c, accv):
                eq = eq_of(ids_b, c)
                tabc = anchor_ref[:, pl.ds(c * _CHUNK, _CHUNK)]  # [8,128]
                return accv + lax.dot_general(
                    tabc, eq, (((1,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )

            anc_b = lax.fori_loop(
                0, nc, chunk_a, jnp.zeros((8, cb), jnp.float32)
            )  # rows 0-2 = anchor normal per point
            agree_b = cmag(
                cnx_b * anc_b[0] + cny_b * anc_b[1] + cnz_b * anc_b[2]
            )
            pf = jnp.where(valid_b & (agree_b >= th_anchor_cos), 1.0, 0.0)
            pay_rows.extend(
                [pf, cnx_b * pf, cny_b * pf, cnz_b * pf,
                 prx_b * pf, pry_b * pf, prz_b * pf, sq_b * pf]
            )
        else:
            # fixed 16-col layout keeps the acc stores full-row
            pay_rows.extend([jnp.zeros((cb,), jnp.float32)] * 8)
        # row-stack (sublane concat) — minor-axis stacking lowers badly
        pay_b = jnp.stack(pay_rows, axis=0)  # [16, cb]

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

    for_blocks(width, stats_block)

    # ---- D. models from the stats table (acc_models semantics) -------
    # Everything per-slot stays a [lc, 1] sublane COLUMN (keepdims
    # slices of acc would each pad to 128 lanes when spilled: a
    # [lc, k≤3] value costs a full [lc, 128] ≈ 1 MB spill slot, and D
    # holds ~10 of them (the measured ~9 MB arena).  So the whole
    # section runs in LANE-MAJOR row form ([k, lc], 8 KB per row):
    # transpose the stats table once and reduce along sublanes.
    acc_t = jnp.transpose(acc_ref[...])  # [16, lc]
    cnt_r = acc_t[0:1]  # [1, lc] count (all points)
    if anchor_gate:
        cnt_p = acc_t[8:9]
        usep_r = cnt_p > 0
        sc = jnp.where(usep_r, cnt_p, jnp.maximum(cnt_r, 1.0))
        sn = jnp.where(usep_r, acc_t[9:12], acc_t[1:4]) / sc
        ctr_r = jnp.where(usep_r, acc_t[12:15], acc_t[4:7]) / sc
        sqm_r = jnp.where(usep_r, acc_t[15:16], acc_t[7:8]) / sc
    else:
        sc = jnp.maximum(cnt_r, 1.0)
        sn = acc_t[1:4] / sc
        ctr_r = acc_t[4:7] / sc
        sqm_r = acc_t[7:8] / sc
    ln = jnp.sqrt(jnp.maximum(jnp.sum(sn * sn, 0, keepdims=True), 1e-20))
    mn_r = sn / ln  # [3, lc] unit model normal
    reach_r = 2.0 * jnp.sqrt(jnp.maximum(
        sqm_r - jnp.sum(ctr_r * ctr_r, 0, keepdims=True), 0.0
    ))  # [1, lc]

    # stage the pair-test table for section H's rolled loops:
    # rows 0-2 model normal, 3-5 center, 6 reach (2r), 7 count
    ptab_ref[...] = jnp.concatenate(
        [mn_r, ctr_r, reach_r, cnt_r], axis=0)

    # mtab rows for the per-point lookup: [8, lc] (n, c, 0, 0)
    mtab = jnp.concatenate(
        [mn_r, ctr_r, jnp.zeros((2, lc), jnp.float32)], axis=0
    )

    # ---- E. per-point model rows via one-hot lookup ------------------
    # the chunked reads need mtab in a ref: Mosaic lowers dynamic
    # slices of refs but NOT lax.dynamic_slice of a loaded array — so
    # stage it in par_ref, which is free until section G overwrites it
    par_ref[...] = mtab

    def model_block(s, cb):
        ids_b = dyn[0, pl.ds(s, cb)]

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

    for_blocks(width, model_block)

    # ---- F. ±w hop/merge offset sweep (label_sweep semantics) --------
    # Blocked like everything else: full-width [tile] values for the
    # 2w-slot loop cost ~60 MB of unshared spill slots at ng=67k.
    # Each rolled block reads [s, s + cb + pad2w) of every row (s is
    # _CB-aligned, so provably 128-aligned; the slab's own w-padding
    # guarantees width = tile + pad2w, so the read stays in bounds),
    # then takes STATIC value slices per offset slot.  Results land in
    # mp rows 6-7 (zero filler until here; rows 0-5 hold the models
    # that all blocks still read).
    pad2w = -(-2 * w // 128) * 128  # == 2*w + lane_pad(tile, w)

    def hop_block(s, cb):
        rl = cb + pad2w

        def sblk(r):
            return spine[r, pl.ds(s, rl)]

        def mblk(r):
            return mp_ref[r, pl.ds(s, rl)]

        bpx, bpy, bpz = sblk(0), sblk(1), sblk(2)
        bnx, bny, bnz = sblk(3), sblk(4), sblk(5)
        bmask = sblk(9)
        bdyn = dyn[0, pl.ds(s, rl)]
        bmn = [mblk(0), mblk(1), mblk(2)]
        bmc = [mblk(3), mblk(4), mblk(5)]

        def ctr(v):
            return lax.slice(v, (w,), (w + cb,))

        px, py, pz = ctr(bpx), ctr(bpy), ctr(bpz)
        nx, ny, nz = ctr(bnx), ctr(bny), ctr(bnz)
        mask0 = ctr(bmask)
        lab0 = ctr(bdyn)
        mnx, mny, mnz = ctr(bmn[0]), ctr(bmn[1]), ctr(bmn[2])
        mcx, mcy, mcz = ctr(bmc[0]), ctr(bmc[1]), ctr(bmc[2])
        has = lab0 < inf_slot
        new = lab0
        best = jnp.full((cb,), inf_slot, jnp.float32)
        for slot in range(2 * w):
            start = slot if slot < w else slot + 1

            def par(v):
                return lax.slice(v, (start,), (start + cb,))

            dx = px - par(bpx)
            dy = py - par(bpy)
            dz = pz - par(bpz)
            near = (
                (dx * dx + dy * dy + dz * dz <= edge_gate2)
                & (par(bmask) > 0.5)
                & (mask0 > 0.5)
            )
            cl = par(bdyn)
            cmnx, cmny, cmnz = par(bmn[0]), par(bmn[1]), par(bmn[2])
            cmcx, cmcy, cmcz = par(bmc[0]), par(bmc[1]), par(bmc[2])
            d = jnp.abs(
                (px - cmcx) * cmnx + (py - cmcy) * cmny
                + (pz - cmcz) * cmnz
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
                (jnp.abs(dcx * mnx + dcy * mny + dcz * mnz)
                 <= th_thickness)
                & (jnp.abs(dcx * cmnx + dcy * cmny + dcz * cmnz)
                   <= th_thickness)
                & (cmag(mnx * cmnx + mny * cmny + mnz * cmnz)
                   >= th_normal_cos)
            )
            mrg_ok = has & (cl < lab0) & near & mutual
            best = jnp.minimum(best, jnp.where(mrg_ok, cl, inf_slot))

        mp_ref[6, pl.ds(s, cb)] = best
        mp_ref[7, pl.ds(s, cb)] = new

    for_blocks(tile, hop_block)

    # ---- G. merge-hook parent table: segment-min of best by slot -----
    # (2-D iota + reshape — Mosaic does not lower 1-D iota)
    par_ref[0, :] = lax.broadcasted_iota(
        jnp.int32, (1, lc), 1
    ).astype(jnp.float32).reshape((lc,))

    def hook_block(s, cb):
        # lab0 = slot labels of the output block: the +w-offset (hence
        # unaligned) region of dyn — read the aligned enclosing block
        # and take a static slice, as in hop_block
        ids_b = lax.slice(dyn[0, pl.ds(s, cb + pad2w)], (w,), (w + cb,))
        best_b = mp_ref[6, pl.ds(s, cb)]

        def chunk_g(c, _):
            eq = eq_of(ids_b, c) > 0.5
            vals = jnp.where(
                eq & (best_b < inf_slot)[None, :], best_b[None, :],
                inf_slot,
            )
            # keepdims + explicit transpose: a bare min(axis=1) leaves
            # the [128] result on sublanes and the lane-row store below
            # then needs the unsupported sublane-gather relayout
            m = jnp.min(vals, axis=1, keepdims=True)  # [128, 1]
            mr = jnp.transpose(m)  # [1, 128]
            r0 = c * _CHUNK
            par_ref[0, pl.ds(r0, _CHUNK)] = jnp.minimum(
                par_ref[0, pl.ds(r0, _CHUNK)], mr[0]
            )
            return 0

        lax.fori_loop(0, nc, chunk_g, 0)

    for_blocks(tile, hook_block)

    # ---- H. global coplanar-overlap pairs over ALL lc slots ----------
    # (window_body step 4b on the slot table.)  Column blocks take the
    # original row role (a = column j, partner b = row i), so the
    # accepted pair set is identical; both loop levels are rolled foris
    # reading the staged table in acc_ref[:, 8:16], and the pair
    # reduction runs along sublanes (axis 0) straight into the [1, ·]
    # parent row.  Rows beyond the live-chunk count have count 0 and
    # cannot pass the gates, so bounding the row loop by nc is exact.
    root_gate = jnp.float32(math.sqrt(edge_gate2))

    def pair_block_body(jb, _):
        j0 = jb * pair_block
        tabc = ptab_ref[:, pl.ds(j0, pair_block)]    # [8, pb]
        mnT_b = tabc[0:3]
        ctrT_b = tabc[3:6]
        reach_rb = tabc[6:7]
        cnt_rb = tabc[7:8]
        ncd_rb = jnp.sum(mnT_b * ctrT_b, 0, keepdims=True)  # n_j·c_j
        ccd_rb = jnp.sum(ctrT_b * ctrT_b, 0, keepdims=True)
        ids_rb = j0.astype(jnp.float32) + lax.broadcasted_iota(
            jnp.int32, (1, pair_block), 1
        ).astype(jnp.float32)

        def chunk_h(c, carry):
            # row chunk in lane-major form [8, 128]; per-row scalars
            # become [128, 1] via small explicit transposes (a [x, 1]
            # spill pads to [x, 128], so keep these to a handful)
            tc = ptab_ref[:, pl.ds(c * _CHUNK, _CHUNK)]  # [8, 128]
            mnT_c = tc[0:3]
            ctrT_c = tc[3:6]
            reach_rc = jnp.transpose(tc[6:7])            # [128, 1]
            cnt_rc = jnp.transpose(tc[7:8])
            ncd_rc = jnp.transpose(
                jnp.sum(mnT_c * ctrT_c, 0, keepdims=True))
            ccd_rc = jnp.transpose(
                jnp.sum(ctrT_c * ctrT_c, 0, keepdims=True))
            ids_rc = (c * _CHUNK).astype(jnp.float32) + (
                lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)
                .astype(jnp.float32)
            )
            # contract the 3-dim of both lane-major operands directly
            dot00 = lambda a, b: lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            nc_ij = dot00(ctrT_c, mnT_b)   # [128, pb] = c_i · n_j
            cn_ij = dot00(mnT_c, ctrT_b)   # [128, pb] = n_i · c_j
            nrm_sep = nc_ij - ncd_rb               # (c_i − c_j)·n_j
            nrm_sep_b = ncd_rc - cn_ij             # (c_i − c_j)·n_i
            cosab = cmag(dot00(mnT_c, mnT_b))
            d2 = ccd_rc + ccd_rb - 2.0 * dot00(ctrT_c, ctrT_b)
            inplane2 = jnp.maximum(d2 - nrm_sep * nrm_sep, 0.0)
            reach = reach_rc + reach_rb + root_gate
            ok = (
                (jnp.abs(nrm_sep) <= th_thickness)
                & (jnp.abs(nrm_sep_b) <= th_thickness)
                & (cosab >= th_normal_cos)
                & (inplane2 <= reach * reach)
                & (cnt_rc > 0.0)
                & (cnt_rb > 0.0)
            )
            pair_lo = jnp.where(
                ok & (ids_rc != ids_rb), jnp.minimum(ids_rc, ids_rb),
                inf_slot,
            )
            return jnp.minimum(
                carry, jnp.min(pair_lo, axis=0, keepdims=True)
            )

        col_min = lax.fori_loop(
            0, nc, chunk_h,
            jnp.full((1, pair_block), inf_slot, jnp.float32),
        )
        par_ref[0, pl.ds(j0, pair_block)] = jnp.minimum(
            par_ref[0, pl.ds(j0, pair_block)], col_min[0]
        )
        return 0

    # column blocks beyond the live-slot bound hold only count-0 rows
    # (they cannot pass the gates), so bounding the outer loop by the
    # live bound is exact — and essential at COMPACT_L=8192, where the
    # static block count would 4× the pair cost of late small sweeps
    nbp = (live_ref[0] + pair_block - 1) // pair_block
    lax.fori_loop(0, nbp, pair_block_body, 0)

    # ---- I. jump-doubling on the [lc] parent table -------------------
    def jump_round(_, __):
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
        return 0

    lax.fori_loop(0, jump_rounds, jump_round, 0)

    # ---- J. apply the collapsed parents to the hop result ------------
    def apply_block(s, cb, changed):
        new_b = mp_ref[7, pl.ds(s, cb)]

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
        lab0_b = lax.slice(
            dyn[0, pl.ds(s, cb + pad2w)], (w,), (w + cb,)
        )
        return changed + jnp.sum(
            jnp.where(final_b != lab0_b, 1.0, 0.0)
        )

    nbj = tile // _CB
    tailj = tile - nbj * _CB
    changed = jnp.float32(0.0)
    if nbj:  # a 0-trip fori still TRACES its body (a _CB-wide store
        #      would fail shape checks when tile < _CB)
        changed = lax.fori_loop(
            0, nbj, lambda i, ch: apply_block(i * _CB, _CB, ch),
            changed,
        )
    if tailj:
        changed = apply_block(nbj * _CB, tailj, changed)

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
            stats source), 9 mask; built once per solve.  Only rows
            0-9 are used (DMA'd); extra rows are dropped here.
        dyn: f32[4, width] from ``make_dyn_row`` — row 0 = slot label
            (lc = none), rebuilt per sweep.  Only row 0 is used.
        anchor_tab: f32[8, lc] — rows 0-2 anchor normal per slot
            (zeros when ``anchor_gate`` is False).
        live0: int32 scalar — slot-id bound: every live slot id must be
            < live0 (slots ≥ live0 unused).  Dense at entry (= live
            count); callers should re-tighten it each sweep to the max
            surviving slot id + 1 — min-slot merging skews survivors
            low, so the one-hot chunk loops (the kernel's dominant
            cost) shrink with the problem.
        n: real row count (tile covers it; one grid step).

    Returns (new_label f32[n] slot ids, n_changed f32 scalar).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    width = tile + 2 * w + _lane_pad(tile, w)
    spine = lax.slice(spine, (0, 0), (10, width))
    dyn = lax.slice(dyn, (0, 0), (1, width))
    kernel = functools.partial(
        _compact_kernel, tile=tile, w=w, lc=lc,
        th_thickness=th_thickness, th_normal_cos=th_normal_cos,
        edge_gate2=edge_gate2, th_anchor_cos=th_anchor_cos,
        anchor_gate=anchor_gate, signed=signed,
        jump_rounds=jump_rounds, pair_block=512,
    )
    nl = jnp.asarray(live0, jnp.int32).reshape((1,))
    out_lab, out_cnt = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.VMEM((10, width), jnp.float32),
            pltpu.VMEM((1, width), jnp.float32),
            pltpu.VMEM((lc, 16), jnp.float32),
            pltpu.VMEM((8, width), jnp.float32),
            pltpu.VMEM((8, lc), jnp.float32),
            pltpu.VMEM((8, lc), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nl, spine, dyn, anchor_tab)
    if tile != n:
        out_lab = lax.slice(out_lab, (0,), (n,))
    return out_lab, out_cnt[0, 0]
