"""Pallas brute-force kNN kernel — exact, bbox-pruned, VMEM-resident.

The scored brute-force configuration (BASELINE config 2: exact kNN,
k=16, ~1M points) is hopeless as a composition of XLA ops (N×N distance
blocks through HBM).  Kernel design:

  * 1-D grid over query tiles; candidate tiles are an INNER loop with a
    manual HBM→VMEM DMA — so a skipped candidate tile costs a handful
    of scalar ops, not a block DMA + distance block.  (The previous
    2-D-grid version paid ~1 µs of grid/pipeline overhead for every one
    of the N²/(qt·ct) blocks — 8.4 M blocks ≈ the entire 10 s runtime.)
  * **bbox pruning, exact**: per-candidate-tile bounding boxes are
    precomputed host-side ([num_c, 8] table); a tile is visited only
    when the box-to-box distance lower bound beats τ = the worst
    current k-th distance over the query tile.  Morton order makes
    tiles spatially coherent, so τ is tight after the home tile and
    almost every far tile prunes — effectively O(N·k) like a KD-tree,
    but data-parallel and exact (the bound is conservative).
  * **banded candidate ordering**: home tile first, then ±1, ±2, …
    (tmc3 reference layout: slot 0 = self, my_function.h:71-78).
  * positions are laid out transposed [3, N]; validity is encoded as
    the −3e7 sentinel coordinate (no separate mask array or DMA).

Exactness: distances are computed in the diff form (no catastrophic
|q|²−2q·c cancellation) over every unpruned candidate, so results match
the oracle bit-for-bit up to ties; pruning never drops a true neighbor
because the box bound is a true lower bound on every pair distance.

Mosaic gotchas honored (learned round 1): `%` on possibly-negative ints
biased non-negative first; no argmin/argmax on tied values (equality +
first-occurrence instead); refs initialized unconditionally before the
read-modify-write loop.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn_pallas"]

# plain Python floats — jnp scalars at module level would be captured
# as constants by the Pallas kernel trace, which is disallowed
_INF = float("inf")
#: resident fast path applies below this posT byte size; shared by
#: _prepare (sub-box table construction) and _dispatch (path choice)
_RESIDENT_BYTES = 40 * 1024 * 1024
#: query sub-tiles per resident grid step (super-tile = sq * query_tile)
_SQ = 8


def _resident_shape(n: int, query_tile: int) -> bool:
    """Whether the VMEM-resident kernel applies: positions fit VMEM,
    the grid divides evenly, and the super-tile is 1024-aligned (its
    dynamic 1-D position reads require 1024-aligned offsets).

    OPT-IN (BST_KNN_RESIDENT=1): measured r5 on the chip, the resident
    kernel is ~3.7x SLOWER than the per-query double-buffered kernel at
    the 1M production shapes (0.315 vs 1.16 Mpts/s) — the shared
    super-tile visit list visits the union of 8 sub-tiles' candidate
    sets, and that extra visit volume swamps the saved per-body
    overhead (perf_knn_lab: visits-clamp=1 reaches 1.8).  Env read at
    trace time; same-shape recompiles are keyed by the jit cache, so
    set it before the first call in a process."""
    if os.environ.get("BST_KNN_RESIDENT", "0") != "1":
        return False
    st = query_tile * _SQ
    return n * 16 <= _RESIDENT_BYTES and n % st == 0 and st % 1024 == 0
# sentinel coordinate for invalid rows (far outside any real scan)
_SENTINEL = -3e7
# validity test threshold (real centered coords are mm-scale)
_VALID_GT = -1e7
# sentinel distance for the empty-slot fixup after the kernel
_SENTINEL_D = 1e14


def _banded(ci: jax.Array, home: jax.Array, num_c: int) -> jax.Array:
    """Visit order home, home+1, home-1, home+2, … (mod num_c).

    The modulo operand is biased non-negative first: lowered index
    arithmetic uses C-style srem where (-1) % 4 == -1, unlike jnp's 3.
    """
    step = (ci + 1) // 2
    sign = jnp.where(ci % 2 == 1, 1, -1)
    return (home + sign * step + num_c) % num_c


def _kernel(count_ref, meta_ref, q_ref, seed_d_ref, seed_i_ref,
            pos_hbm, best_d_ref, best_i_ref, cbuf, sem, tau_ref, *,
            kk: int, qt: int, ct: int, n: int, w_excl: int,
            static_rounds: bool = False):
    qi = pl.program_id(0)
    q_start = qi * qt

    qx = q_ref[0, :]
    qy = q_ref[1, :]
    qz = q_ref[2, :]
    qvalid = qx > _VALID_GT

    # seed the best lists with the window-kNN result: those rows are
    # already the true top-k for almost every query, so a visited tile
    # usually improves nothing and the serial extract-min merge (the
    # measured per-iteration latency whale) never runs.  Window
    # candidates are excluded from the scan by Morton-rank distance
    # (|c − q| ≤ w_excl) so a seeded candidate can never re-insert.
    bd_init = seed_d_ref[...]
    best_d_ref[...] = bd_init
    best_i_ref[...] = seed_i_ref[...]
    tau_ref[0, 0] = jnp.max(
        jnp.where(qvalid, jnp.max(bd_init, axis=1), 0.0)
    )

    count = count_ref[qi]

    def tile_dma(ci, slot):
        row = meta_ref[0, ci, :]
        t = row[0].astype(jnp.int32)
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(t * ct, ct)], cbuf.at[slot], sem.at[slot]
        )

    # warm up the double buffer: tile 0 in flight before the loop
    tile_dma(0, 0).start()

    iota_c = lax.broadcasted_iota(jnp.int32, (qt, ct), 1)
    iota_q = lax.broadcasted_iota(jnp.int32, (qt, ct), 0)
    iota_k = lax.broadcasted_iota(jnp.int32, (qt, kk), 1)

    def body(ci, _):
        # visit list is sorted ascending by precomputed box distance,
        # so the count-bounded loop runs ~#needed-tiles times (mean ~9
        # at 1M); each iteration reads ONE meta row: (tile index,
        # box-distance lower bound).  τ (the worst current k-th
        # distance over the tile) lives in an SMEM scalar updated only
        # when a merge runs — once τ beats the sorted box distance,
        # every later iteration prunes on the one compare.  Tile DMAs
        # are double-buffered: the next tile is prefetched while this
        # one computes (the over-fetch when the next tile prunes is a
        # 32 KB no-op).
        row = meta_ref[0, ci, :]
        actual = row[0].astype(jnp.int32)
        box_d2 = row[1]
        slot = ci % 2

        @pl.when(ci + 1 < count)
        def _prefetch():
            tile_dma(ci + 1, 1 - slot).start()

        do_visit = (ci == 0) | (box_d2 <= tau_ref[0, 0])

        @pl.when(do_visit)
        def _visit():
            # read-modify-write state while the DMA flies
            bd0 = best_d_ref[...]
            bi0 = best_i_ref[...]
            worst_rows = jnp.max(bd0, axis=1)  # [qt]
            tile_dma(ci, slot).wait()
            cx = cbuf[slot, 0, :]
            cy = cbuf[slot, 1, :]
            cz = cbuf[slot, 2, :]

            dx = qx[:, None] - cx[None, :]
            dy = qy[:, None] - cy[None, :]
            dz = qz[:, None] - cz[None, :]
            d = dx * dx + dy * dy + dz * dz
            c_idx = actual * ct + iota_c
            q_idx = q_start + iota_q
            # validity compared in 2-D on the f32 coords: a minor-dim
            # insert of an i1 vector does not lower in Mosaic
            # window-rank exclusion subsumes the self test (|0| <= w)
            invalid = (
                (jnp.abs(c_idx - q_idx) <= w_excl)
                | (cx[None, :] <= _VALID_GT)
                | (qx[:, None] <= _VALID_GT)
            )
            d = jnp.where(invalid, _INF, d)

            improves = jnp.any(d < worst_rows[:, None])

            @pl.when(improves)
            def _merge():
                # Extract-min / replace-max rounds.  The round count is
                # DYNAMIC: no row can take more candidates than it has
                # below its current worst (worst only shrinks), so
                # max-over-rows of that count bounds the work — later
                # tiles improve 1-2 slots, not kk (home tiles pay the
                # full kk to fill).  No argmin/argmax: arg extraction
                # over tied values is where compiled Mosaic and the
                # interpreter disagree, so min/max slots are located by
                # equality plus a first-occurrence mask instead.
                if static_rounds:
                    # fixed kk-round trip count: wasted rounds no-op,
                    # but Mosaic can fully unroll/pipeline the loop
                    # (lab knob — the dynamic bound may be what keeps
                    # the measured rate ~8x below the op-count model)
                    rounds = jnp.int32(kk)
                else:
                    cnt_below = jnp.sum(
                        jnp.where(d < worst_rows[:, None], 1.0, 0.0),
                        axis=1,
                    )
                    rounds = jnp.minimum(
                        jnp.max(cnt_below), float(kk)
                    ).astype(jnp.int32)

                def mround(_, carry):
                    dd, bd, bi = carry
                    dmin = jnp.min(dd, axis=1)
                    worst = jnp.max(bd, axis=1)
                    # "take" as a 2-D f32 compare (i1 minor-dim inserts
                    # don't lower in Mosaic)
                    take_k = dmin[:, None] < worst[:, None]
                    c_hit = jnp.min(
                        jnp.where(dd == dmin[:, None], iota_c, ct), axis=1
                    )
                    first_c = iota_c == c_hit[:, None]
                    gidx = actual * ct + c_hit
                    k_hit = jnp.min(
                        jnp.where(bd == worst[:, None], iota_k, kk), axis=1
                    )
                    first_k = (iota_k == k_hit[:, None]) & take_k
                    bd = jnp.where(first_k, dmin[:, None], bd)
                    bi = jnp.where(first_k, gidx[:, None], bi)
                    take_c = dmin[:, None] < worst[:, None]
                    dd = jnp.where(first_c & take_c, _INF, dd)
                    return dd, bd, bi

                _, bd, bi = lax.fori_loop(
                    0, rounds, mround, (d, bd0, bi0)
                )
                best_d_ref[...] = bd
                best_i_ref[...] = bi
                tau_ref[0, 0] = jnp.max(
                    jnp.where(qvalid, jnp.max(bd, axis=1), 0.0)
                )

        @pl.when(~do_visit)
        def _drain():
            # the DMA for this (pruned) tile was prefetched by the
            # previous iteration; it must complete before slot reuse
            # (do_visit was evaluated ONCE above — _visit shrinks τ, so
            # re-reading it here would double-wait the semaphore)
            tile_dma(ci, slot).wait()

        return 0

    # exactly `count` sorted tiles suffice (precomputed from the
    # window-kNN upper bound on every query's k-th distance — see
    # knn_pallas)
    lax.fori_loop(0, count, body, 0)


def _kernel_resident(meta_ref, seed_d_ref, seed_i_ref, subbox_ref,
                     px_hbm, py_hbm, pz_hbm, best_d_ref, best_i_ref,
                     tau_ref, px_ref, py_ref, pz_ref, dma_sem, *,
                     kk: int, qt: int, ct: int, cb: int, n: int,
                     w_excl: int, sq: int):
    """VMEM-resident variant of :func:`_kernel`.

    At ≤ ~2.5M points the whole transposed position array ([4, N] f32,
    16 MB at 1M) fits in VMEM, so candidate tiles are plain dynamic
    VMEM slices — no per-visit HBM DMA, no double buffer, no
    semaphores.  ``sq`` query sub-tiles share one grid step, cutting
    the ~35 µs/step grid overhead sq-fold (the old per-128-query grid
    was ~0.3 s of pure overhead at 1M points).

    Each ``ct``-wide visit is further split into ``ct // cb`` gated
    sub-blocks: ``subbox_ref`` carries the (query-tile × cand-sub-
    block) box distances in a TRANSPOSED [num_c4, num_q] layout (lanes
    windowed to this grid step's ``sq`` query tiles), so a sub-block
    whose box bound exceeds the live τ skips both its distance matrix
    and its merge — the [qt, cb] merge rounds are ct/cb× cheaper per
    pass than whole-visit merges, and τ keeps shrinking BETWEEN
    sub-blocks.  Pruning soundness is the parent argument unchanged
    (the sub-box bound is a true lower bound on every pair distance in
    the block); exactness contract identical to :func:`_kernel`.
    """
    qi = pl.program_id(0)

    # fill the persistent position scratches ONCE (grid steps run
    # sequentially under "arbitrary" semantics; scratch survives
    # across steps).  VMEM allocations are capped at 16 MB EACH — a
    # [4, N] f32 buffer exceeds that at 1M points, three per-axis
    # [N] rows stay under it to ~4M points.  The axes arrive as three
    # separate [N] HBM operands: a 1-row memref_slice of a [4, N]
    # operand is rejected by the Mosaic backend (sublane tiling 4).
    @pl.when(qi == 0)
    def _fill():
        for src, ref in ((px_hbm, px_ref), (py_hbm, py_ref),
                         (pz_hbm, pz_ref)):
            cp = pltpu.make_async_copy(src, ref, dma_sem)
            cp.start()
            cp.wait()

    nb = ct // cb
    st = sq * qt  # the whole super-tile is ONE query block
    iota_c = lax.broadcasted_iota(jnp.int32, (st, cb), 1)
    iota_q = lax.broadcasted_iota(jnp.int32, (st, cb), 0)
    iota_k = lax.broadcasted_iota(jnp.int32, (st, kk), 1)

    # the whole grid step's queries in one 1024-ALIGNED read (1-D
    # dynamic vector reads need 1024-aligned offsets — the dispatch
    # requires st % 1024 == 0)
    q_start = qi * st
    qx = px_ref[pl.ds(q_start, st)]
    qy = py_ref[pl.ds(q_start, st)]
    qz = pz_ref[pl.ds(q_start, st)]

    bd_init = seed_d_ref[:, :]
    best_d_ref[:, :] = bd_init
    best_i_ref[:, :] = seed_i_ref[:, :]
    # plain max: masked-out queries are seeded 0.0 by the wrapper
    tau_ref[0, 0] = jnp.max(bd_init)
    # per-super-tile visit count rides in meta column 2 of row 0
    # (exact as f32 below 2^24): the flat [num_super] scalar-prefetch
    # array exceeds the 16 KB SMEM budget at 1M points
    count = meta_ref[0, 0, :][2].astype(jnp.int32)

    def body(ci, _):
        row = meta_ref[0, ci, :]
        actual = row[0].astype(jnp.int32)
        box_d2 = row[1]
        do_visit = (ci == 0) | (box_d2 <= tau_ref[0, 0])

        @pl.when(do_visit)
        def _visit():
            cs = actual * ct
            cx = px_ref[pl.ds(cs, ct)]
            cy = py_ref[pl.ds(cs, ct)]
            cz = pz_ref[pl.ds(cs, ct)]
            # all nb sub-block box bounds in ONE row read, indexed by
            # raw tile id (dynamic sublane, static lanes — the
            # supported access pattern; no visit-order shuffle)
            sb_row = subbox_ref[0, actual, :]
            # best lists + τ carried as VALUES across the block
            # unroll (a ref read after a @pl.when write in the same
            # trace is the known Mosaic hazard; the refs are read
            # once here — the previous write happened in the prior
            # fori iteration — and written once at visit end)
            bd = best_d_ref[:, :]
            bi = best_i_ref[:, :]
            tau = tau_ref[0, 0]

            def block(b, carry):
                bd, bi, tau = carry
                cxb = lax.slice(cx, (b * cb,), ((b + 1) * cb,))
                cyb = lax.slice(cy, (b * cb,), ((b + 1) * cb,))
                czb = lax.slice(cz, (b * cb,), ((b + 1) * cb,))
                dx = qx[:, None] - cxb[None, :]
                dy = qy[:, None] - cyb[None, :]
                dz = qz[:, None] - czb[None, :]
                d = dx * dx + dy * dy + dz * dz
                csb = cs + b * cb
                c_idx = csb + iota_c
                q_idx = q_start + iota_q
                invalid = (
                    (jnp.abs(c_idx - q_idx) <= w_excl)
                    | (cxb[None, :] <= _VALID_GT)
                    | (qx[:, None] <= _VALID_GT)
                )
                d = jnp.where(invalid, _INF, d)
                worst_rows = jnp.max(bd, axis=1)
                cnt_below = jnp.sum(
                    jnp.where(d < worst_rows[:, None], 1.0, 0.0),
                    axis=1,
                )
                rounds = jnp.minimum(
                    jnp.max(cnt_below), float(kk)
                ).astype(jnp.int32)

                def mround(_, carry):
                    dd, bd, bi = carry
                    dmin = jnp.min(dd, axis=1)
                    worst = jnp.max(bd, axis=1)
                    take_k = dmin[:, None] < worst[:, None]
                    c_hit = jnp.min(
                        jnp.where(dd == dmin[:, None], iota_c, cb),
                        axis=1,
                    )
                    first_c = iota_c == c_hit[:, None]
                    gidx = csb + c_hit
                    k_hit = jnp.min(
                        jnp.where(bd == worst[:, None], iota_k, kk),
                        axis=1,
                    )
                    first_k = (iota_k == k_hit[:, None]) & take_k
                    bd = jnp.where(first_k, dmin[:, None], bd)
                    bi = jnp.where(first_k, gidx[:, None], bi)
                    take_c = dmin[:, None] < worst[:, None]
                    dd = jnp.where(first_c & take_c, _INF, dd)
                    return dd, bd, bi

                _, bd, bi = lax.fori_loop(
                    0, rounds, mround, (d, bd, bi)
                )
                return bd, bi, jnp.max(bd)

            carry = (bd, bi, tau)
            for b in range(nb):
                if nb > 1:
                    # the bound is a true lower bound on every pair
                    # distance in the block, so a pruned block cannot
                    # hold a top-k member
                    carry = lax.cond(
                        (ci == 0) | (sb_row[b] <= carry[2]),
                        lambda c, b=b: block(b, c),
                        lambda c: c,
                        carry,
                    )
                else:
                    carry = block(b, carry)
            bd, bi, tau = carry
            best_d_ref[:, :] = bd
            best_i_ref[:, :] = bi
            tau_ref[0, 0] = tau

        return 0

    lax.fori_loop(0, count, body, 0)


@functools.partial(
    jax.jit, static_argnames=("k", "query_tile", "cand_tile", "interpret",
                              "static_rounds", "max_visits",
                              "seed_window")
)
def knn_pallas(
    positions: jax.Array,
    mask: jax.Array,
    k: int,
    *,
    query_tile: int = 128,
    cand_tile: int = 1024,
    interpret: bool = False,
    static_rounds: bool = False,
    max_visits: int = 0,
    seed_window: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Exact brute-force kNN via the bbox-pruned Pallas kernel.

    Args:
        positions: int32/float [N, 3]; N must be a multiple of both
            tile sizes (pad the batch).
        mask: bool[N].
        k: neighbors INCLUDING self at slot 0.
        interpret: run in interpreter mode (CPU tests).
        seed_window: half-window of the Morton-window pass that seeds
            the best lists and the τ̂ bounds (exactness holds for any
            value; larger = fewer kernel insertions, costlier seed).

    Returns:
        (indices int32[N, k], sq_dists float32[N, k]), slot 0 = self,
        ascending by distance; empty slots fall back to self.
    """
    (posT, seed_d, seed_i, meta, counts, subbox, kk, query_tile,
     cand_tile, cb) = _prepare(
        positions, mask, k, query_tile, cand_tile, seed_window
    )
    n = positions.shape[0]
    num_q = n // query_tile
    num_c = n // cand_tile
    if max_visits > 0:  # perf diagnostic: bound the visit loop
        counts = jnp.minimum(counts, max_visits)  # (INEXACT result)
    return _dispatch(
        posT, seed_d, seed_i, meta, counts, subbox, mask,
        n=n, kk=kk, query_tile=query_tile, cand_tile=cand_tile, cb=cb,
        num_q=num_q, num_c=num_c, interpret=interpret,
        static_rounds=static_rounds, w_excl=max(seed_window, k),
    )


def _prepare(positions, mask, k, query_tile, cand_tile, seed_window=32):
    """Wrapper prologue: centered f32 positions, window-kNN seeds, the
    τ̂-pruned per-query-tile visit lists, and the sub-block box-distance
    table.  Split out so the perf labs can time the XLA prologue
    separately from the Pallas kernel."""
    n = positions.shape[0]
    while query_tile > 8 and n % query_tile:
        query_tile //= 2
    while cand_tile > 8 and n % cand_tile:
        cand_tile //= 2
    if n % query_tile or n % cand_tile:
        raise ValueError(
            f"N={n} must be a multiple of query_tile={query_tile} and "
            f"cand_tile={cand_tile}"
        )
    kk = k - 1
    num_q = n // query_tile
    num_c = n // cand_tile

    center = jnp.sum(
        jnp.where(mask[:, None], positions, 0).astype(jnp.float32), axis=0
    ) / jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    pos = positions.astype(jnp.float32) - center
    pos = jnp.where(mask[:, None], pos, jnp.float32(_SENTINEL))
    # transposed layout, padded to 4 rows: DMA slices must be aligned
    # to the sublane tiling along dim 0 (Mosaic rejects a 3-row slice)
    posT = jnp.concatenate(
        [pos.T, jnp.zeros((1, n), jnp.float32)], axis=0
    )  # [4, N] — lanes along points

    # --- exact visit counts from a provable τ upper bound -------------
    # The window kNN's k-th distance is the k-th best over a SUBSET of
    # candidates, hence an upper bound on the true k-th distance.  A
    # candidate tile whose box-to-box lower bound exceeds the max such
    # bound over a query tile can never contribute — so the kernel only
    # needs the banded prefix up to the last tile under the bound.
    from buildingsegment_tpu.ops.knn import _DUAL_SHIFT, knn_window_sorted

    w_excl = max(seed_window, k)
    wk_i, wk_d = knn_window_sorted(pos, mask, k, window=w_excl)
    self_idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    # rows with fewer than k-1 real candidates pad with self → the
    # window bound is invalid there; fall back to +inf (visit all)
    kth_ub = jnp.where(wk_i[:, k - 1] == self_idx[:, 0], jnp.inf, wk_d[:, k - 1])
    # --- dual-order bound tightening (τ̂ only, NOT the seeds) ---------
    # A second window pass over a TRANSLATED Morton order (the
    # knn_window dual trick: recall 0.84 → 0.99) yields a much tighter
    # k-th-distance upper bound — its candidates are genuine, so
    # min(single, dual) k-th distances still bounds the true k-th from
    # above and exactness is unaffected.  Seeds stay single-order: the
    # kernel's rank-window exclusion (|c − q| ≤ w_excl) only covers the
    # primary order, so dual candidates must remain insertable.  Cost
    # ~3% of the kernel runtime at 1M; the visit list it prunes was the
    # measured whale (r5 perf_knn_lab: visits-clamp=1 ran 5.7× faster).
    from buildingsegment_tpu.core.morton import morton_argsort

    shift = jnp.asarray(_DUAL_SHIFT, positions.dtype)
    order2 = morton_argsort(positions + shift, mask)
    i2, d2 = knn_window_sorted(pos[order2], mask[order2], k, window=w_excl)
    kth2_s = jnp.where(i2[:, k - 1] == self_idx[:, 0], jnp.inf, d2[:, k - 1])
    # permutation-inverse via 2-operand sort (a .at[order2].set scatter
    # at [N] costs ~10× this on TPU)
    _, kth2 = lax.sort((order2, kth2_s), num_keys=1, is_stable=False)
    kth_ub = jnp.minimum(kth_ub, kth2)
    kth_ub = jnp.where(mask, kth_ub, 0.0)  # invalid rows never bind
    # kernel seeds: window slots 1..k-1; self-padded slots (window ran
    # dry) become +inf so the kernel rebuilds those rows from scratch
    seed_pad = wk_i[:, 1:] == self_idx
    seed_d = jnp.where(seed_pad, jnp.inf, wk_d[:, 1:])  # [n, kk]
    seed_i = jnp.where(seed_pad, 0, wk_i[:, 1:])
    # masked-out queries seed at 0.0: they contribute nothing to τ, so
    # the kernels take a PLAIN max — the qvalid select inside the τ
    # reduction lowered to an unsupported sublane gather in the
    # resident kernel (the final mask fixup in _finish re-selfs them)
    seed_d = jnp.where(mask[:, None], seed_d, 0.0)
    seed_i = jnp.where(mask[:, None], seed_i, 0)

    # per-tile bounding boxes over VALID rows
    big = jnp.float32(3e37)

    def tile_bbox(t):
        pt = pos.reshape(-1, t, 3)
        mt = mask.reshape(-1, t, 1)
        return (
            jnp.min(jnp.where(mt, pt, big), axis=1),
            jnp.max(jnp.where(mt, pt, -big), axis=1),
        )

    # the resident kernel treats the whole sq-sub-tile super-tile as
    # ONE query block (one shared visit list amortizes the measured
    # ~10 µs/visit-body overhead sq-fold), so its visit metadata is
    # computed at super-tile granularity; the DMA kernel keeps the
    # per-query_tile granularity
    resident = _resident_shape(n, query_tile)
    meta_tile = query_tile * _SQ if resident else query_tile
    num_mq = n // meta_tile

    qmin, qmax = tile_bbox(meta_tile)  # [num_mq, 3]
    cmin, cmax = tile_bbox(cand_tile)  # [num_c, 3]
    dd = jnp.maximum(
        jnp.maximum(cmin[None, :, :] - qmax[:, None, :],
                    qmin[:, None, :] - cmax[None, :, :]),
        0.0,
    )
    boxd2 = jnp.sum(dd * dd, axis=-1)  # [num_mq, num_c]

    # visit candidate tiles in increasing box-distance order: the
    # needed tiles (box ≤ τ̂) then form an exact prefix, so the kernel
    # loop length equals the needed count.  ONE 2-operand sort carries
    # the tile index along — an argsort + take_along_axis costs an
    # extra 36 MB XLA gather (~2 GB/s)
    iota_row = lax.broadcasted_iota(jnp.int32, (num_mq, num_c), 1)
    sorted_d2, order_c = lax.sort(
        (boxd2, iota_row), num_keys=1, is_stable=True
    )
    tau_hat = jnp.max(
        jnp.where(mask, kth_ub, 0.0).reshape(num_mq, meta_tile), axis=1
    )
    # <= so a neighbor sitting exactly on a tile-bbox corner at the
    # final k-th distance can never be skipped (ties stay exact)
    counts = jnp.maximum(
        jnp.sum((sorted_d2 <= tau_hat[:, None]).astype(jnp.int32), axis=1),
        1,
    )
    # per-query-tile visit metadata rows: (tile index as f32 — exact
    # below 2^24 — and its box-distance bound), lane-padded to 8
    meta = jnp.concatenate(
        [
            order_c.astype(jnp.float32)[..., None],
            sorted_d2[..., None],
            jnp.zeros((num_mq, num_c, 6), jnp.float32),
        ],
        axis=-1,
    )  # [num_mq, num_c, 8]
    # PERF PROBE (INEXACT when any count exceeds the cap): truncate the
    # visit table to BST_KNN_VCAP rows — isolates the per-grid-step
    # meta block DMA cost (num_c strided 32 B rows/step)
    vcap = int(os.environ.get("BST_KNN_VCAP", "0"))
    if vcap and not resident and vcap < num_c:
        meta = meta[:, :vcap, :]
        counts = jnp.minimum(counts, vcap)

    # sub-block box distances for the resident kernel's in-visit
    # gating: all ct/cb bounds of one candidate tile ride as LANES of
    # one [num_mq, num_c, lane_w] row, indexed by raw tile id — one
    # dynamic-sublane read per visit, no visit-order shuffle
    cb = min(256, cand_tile)
    subbox = None
    if resident:
        nb = cand_tile // cb
        lane_w = max(8, nb)
        cmin4, cmax4 = tile_bbox(cb)  # [num_c4, 3]
        dd4 = jnp.maximum(
            jnp.maximum(
                cmin4[None, :, :] - qmax[:, None, :],
                qmin[:, None, :] - cmax4[None, :, :],
            ),
            0.0,
        )
        sub4 = jnp.sum(dd4 * dd4, axis=-1)  # [num_mq, num_c4]
        subbox = jnp.pad(
            sub4.reshape(num_mq, num_c, nb),
            ((0, 0), (0, 0), (0, lane_w - nb)),
            constant_values=3e37,
        )

    return (posT, seed_d, seed_i, meta, counts, subbox, kk, query_tile,
            cand_tile, cb)


def _dispatch(posT, seed_d, seed_i, meta, counts, subbox, mask, *, n,
              kk, query_tile, cand_tile, cb, num_q, num_c, interpret,
              static_rounds, w_excl):
    # VMEM-resident fast path: [4, N] f32 positions fit comfortably in
    # v5e VMEM (128 MB) up to ~2.5M points — no per-visit HBM DMA, and
    # 8 query sub-tiles share one grid step (the per-step overhead was
    # ~0.3 s of the 0.87 s runtime at 1M points)
    sq = _SQ
    if _resident_shape(n, query_tile):
        num_super = num_q // sq
        lane_w = subbox.shape[-1]
        kernel_r = functools.partial(
            _kernel_resident, kk=kk, qt=query_tile, ct=cand_tile,
            cb=cb, n=n, w_excl=w_excl, sq=sq,
        )
        # counts ride in meta col 2 (see the kernel) — broadcast them
        # into row 0 of every super-tile's metadata
        meta_r = meta.at[:, 0, 2].set(counts.astype(jnp.float32))
        grid_spec_r = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(num_super,),
            in_specs=[
                pl.BlockSpec(
                    (1, num_c, 8), lambda qi, *_: (qi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),  # this super-tile's sorted visit metadata
                pl.BlockSpec(
                    (query_tile * sq, kk), lambda qi, *_: (qi, 0),
                    memory_space=pltpu.VMEM,
                ),  # window-kNN seed distances
                pl.BlockSpec(
                    (query_tile * sq, kk), lambda qi, *_: (qi, 0),
                    memory_space=pltpu.VMEM,
                ),  # window-kNN seed indices
                pl.BlockSpec(
                    (1, num_c, lane_w), lambda qi, *_: (qi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),  # sub-block box distances, nb bounds per tile row
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                # per-axis positions stay in HBM; the kernel copies
                # them into persistent VMEM scratches on grid step 0
            ],
            out_specs=(
                pl.BlockSpec(
                    (query_tile * sq, kk), lambda qi, *_: (qi, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (query_tile * sq, kk), lambda qi, *_: (qi, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.SMEM((1, 1), jnp.float32),
                pltpu.VMEM((n,), jnp.float32),
                pltpu.VMEM((n,), jnp.float32),
                pltpu.VMEM((n,), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        best_d, best_i = pl.pallas_call(
            kernel_r,
            grid_spec=grid_spec_r,
            out_shape=(
                jax.ShapeDtypeStruct((n, kk), jnp.float32),
                jax.ShapeDtypeStruct((n, kk), jnp.int32),
            ),
            # vmem_limit_bytes bounds the kernel's TOTAL VMEM: window
            # allocations + scratch operands + internal values (~28 MB
            # here — the [sq, num_c, 8] meta window lane-pads 8 -> 128
            # = 8.3 MB double-buffered, three [N] position scratches =
            # 12.4 MB).  The default budget is 16 MB; 110 MB over-asks
            # and the backend OOMs the co-resident allocations instead.
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
            debug=bool(__import__("os").environ.get("BST_KNN_DEBUG")),
        )(meta_r, seed_d, seed_i, subbox, posT[0], posT[1], posT[2])
        return _finish(best_d, best_i, mask, n, kk)

    kernel = functools.partial(
        _kernel, kk=kk, qt=query_tile, ct=cand_tile, n=n,
        w_excl=w_excl, static_rounds=static_rounds,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_q,),
        in_specs=[
            pl.BlockSpec(
                (1, meta.shape[1], 8), lambda qi, *_: (qi, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # this query tile's sorted visit metadata
            pl.BlockSpec(
                (4, query_tile), lambda qi, *_: (0, qi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (query_tile, kk), lambda qi, *_: (qi, 0),
                memory_space=pltpu.VMEM,
            ),  # window-kNN seed distances
            pl.BlockSpec(
                (query_tile, kk), lambda qi, *_: (qi, 0),
                memory_space=pltpu.VMEM,
            ),  # window-kNN seed indices
            pl.BlockSpec(memory_space=pl.ANY),  # positions stay in HBM
        ],
        out_specs=(
            pl.BlockSpec(
                (query_tile, kk), lambda qi, *_: (qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (query_tile, kk), lambda qi, *_: (qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 4, cand_tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
    )

    best_d, best_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, kk), jnp.float32),
            jax.ShapeDtypeStruct((n, kk), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # default scoped-vmem stack limit is 16 MB/kernel even on
            # v5e's 128 MB physical; qt=512 needs ~21 MB (AOT-measured)
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(counts, meta, posT, seed_d, seed_i, posT)
    return _finish(best_d, best_i, mask, n, kk)


def _finish(best_d, best_i, mask, n, kk):
    # sort ascending, fix empty slots, prepend self.  2-operand
    # lax.sort, NOT top_k + take_along_axis: the take_along_axis
    # gather ran 211.6 ms at 1M on chip vs 17.1 for the sort
    # (tools/knn_finish_probe.py) — the standard XLA-gather trap.
    nb_d, nb_i = lax.sort((best_d, best_i), dimension=1, num_keys=1)
    self_idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    empty = (nb_d >= _SENTINEL_D) | jnp.isinf(nb_d)
    nb_i = jnp.where(empty, self_idx, nb_i)
    nb_d = jnp.where(empty, 0.0, nb_d)
    nb_i = jnp.concatenate([self_idx, nb_i], axis=1)
    nb_d = jnp.concatenate([jnp.zeros((n, 1), jnp.float32), nb_d], axis=1)
    nb_i = jnp.where(mask[:, None], nb_i, self_idx)
    nb_d = jnp.where(mask[:, None], nb_d, 0.0)
    return nb_i, nb_d
