"""Pallas mega-kernels for the windowized ±W sweeps.

The XLA formulation of a window sweep re-reads every operand array from
HBM once per offset (the compiler cannot pin a row tile in VMEM across
offsets), so a 2W-offset sweep over C operand arrays moves ~2W·C·4
bytes per point — ~1.4 KB/point for the refinement sweep.  These
kernels DMA one packed [16, T+2W] slab per row tile into VMEM and run
the whole offset loop on it: HBM traffic drops to 64 B/point
(read-once) and the arithmetic runs at VPU speed on VMEM operands.

All kernels take PRE-PADDED component rows (constant sentinels on a
single device, ppermute halo rows under shard_map — the caller decides)
packed into one float32 slab:

    rows 0-2: px py pz      (positions)
    rows 3-5: nx ny nz      (unit normals)
    rows 6-11: per-variant model rows
    row 12:   per-variant integer channel as float (plane id / label —
              exact below 2^24)
    row 13:   mask (1.0 / 0.0)
    row 14:   per-variant extra (e.g. the seed-ball radius)
    row 15:   zero padding (DMA slices need 8-row alignment on dim 0)

Everything is exact float32 — results are bit-identical to the XLA
sweeps (same operations, same order per offset; accumulation is a
pure min/or chain, which is order-insensitive for these reductions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["refine_sweep", "seed_sweep", "label_sweep", "pick_tile"]

_ROWS = 16


def pick_tile(n: int, target: int = 8192) -> int:
    """Row-tile size for an n-point sweep: ``target`` capped to the
    next power of two ≥ n.  Wrappers pad n up to a tile multiple
    internally, so divisibility is not required (tests with tiny n
    still exercise multi-tile grids by passing a smaller target)."""
    t = 128
    while t < min(n, target):
        t *= 2
    return t


def _lane_pad(tile, w):
    """Extra zero columns so the per-tile DMA width (tile + 2w + pad)
    is lane-aligned — Mosaic requires DMA slice shapes to be multiples
    of the 128-lane tiling on the minor dimension."""
    return (-(tile + 2 * w)) % 128


def _pack(rows, width):
    """Stack component rows into the [16, width] slab (zero tail)."""
    slab = jnp.zeros((_ROWS, width), jnp.float32)
    for i, r in enumerate(rows):
        slab = lax.dynamic_update_slice(
            slab, r.astype(jnp.float32)[None, :], (i, 0)
        )
    return slab


def _sweep_call(kernel, rows, n, w, tile, interpret, n_out=1):
    """Pack rows (each [n + 2w]) and run ``kernel`` over row tiles.

    n is padded up to a tile multiple so every tile's DMA window and
    the 1-D output block stay aligned for any caller n; the pad tail
    is masked out (zero mask rows) and sliced off the result.  The
    output block (a power-of-two ≥ 1024 for production sizes) is a
    multiple of any 1-D tiling XLA assigns to the [n_pad] result.
    """
    n_pad = -(-n // tile) * tile
    width = n_pad + 2 * w + _lane_pad(tile, w)
    slab = _pack(rows, width)
    grid = (n_pad // tile,)
    out_shape = tuple(
        jax.ShapeDtypeStruct((n_pad,), jnp.float32) for _ in range(n_out)
    )
    out_specs = tuple(
        pl.BlockSpec((tile,), lambda ti: (ti,), memory_space=pltpu.VMEM)
        for _ in range(n_out)
    )
    if n_out == 1:
        out_shape = out_shape[0]
        out_specs = out_specs[0]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((_ROWS, tile + 2 * w + _lane_pad(tile, w)),
                       jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(slab)
    if n_pad == n:
        return out
    if n_out == 1:
        return lax.slice(out, (0,), (n,))
    return tuple(lax.slice(o, (0,), (n,)) for o in out)


def _interpret_default() -> bool:
    return jax.devices()[0].platform == "cpu"


# ----------------------------------------------------------------------
# refinement sweep (seg/coarse.py): adopt the min accepting plane id of
# nearby rows — slab rows 6-8 = model center, 9-11 = model normal,
# 12 = plane id (0 = none)
# ----------------------------------------------------------------------


def _refine_kernel(slab_hbm, out_ref, slab, sem, *, tile, w,
                   th_thickness, th_normal_cos, edge_gate2, big_pid,
                   signed):
    ti = pl.program_id(0)
    dma = pltpu.make_async_copy(
        slab_hbm.at[:, pl.ds(ti * tile, tile + 2 * w + _lane_pad(tile, w))],
        slab, sem,
    )
    dma.start()
    dma.wait()

    def row(i, s):
        return slab[i, pl.ds(s, tile)]

    px, py, pz = row(0, w), row(1, w), row(2, w)
    nx, ny, nz = row(3, w), row(4, w), row(5, w)
    cmask0 = row(13, w)
    best = jnp.full((tile,), big_pid, jnp.float32)
    for slot in range(2 * w):
        start = slot if slot < w else slot + 1
        dx = px - row(0, start)
        dy = py - row(1, start)
        dz = pz - row(2, start)
        near = dx * dx + dy * dy + dz * dz <= edge_gate2
        cmnx, cmny, cmnz = row(9, start), row(10, start), row(11, start)
        d = jnp.abs(
            (px - row(6, start)) * cmnx
            + (py - row(7, start)) * cmny
            + (pz - row(8, start)) * cmnz
        )
        c = nx * cmnx + ny * cmny + nz * cmnz
        if not signed:
            c = jnp.abs(c)
        cpid = row(12, start)
        ok = (
            (cpid > 0.5)
            & near
            & (row(13, start) > 0.5)
            & (cmask0 > 0.5)
            & (d <= th_thickness)
            & (c >= th_normal_cos)
        )
        best = jnp.minimum(best, jnp.where(ok, cpid, big_pid))
    out_ref[...] = best


@functools.partial(
    jax.jit,
    static_argnames=(
        "w", "tile", "th_thickness", "th_normal_cos", "edge_gate2",
        "big_pid", "signed", "interpret",
    ),
)
def refine_sweep(
    ppx, ppy, ppz, pnx, pny, pnz, pmcx, pmcy, pmcz, pmnx, pmny, pmnz,
    ppid, pmask, *, w, tile, th_thickness, th_normal_cos, edge_gate2,
    big_pid, signed=False, interpret=None,
):
    """One refinement sweep over pre-padded [n+2w] component rows.

    Returns float32[n] best plane id (big_pid where none accepted).
    """
    n = ppx.shape[0] - 2 * w
    rows = [ppx, ppy, ppz, pnx, pny, pnz, pmcx, pmcy, pmcz, pmnx, pmny,
            pmnz, ppid, pmask]
    kernel = functools.partial(
        _refine_kernel, tile=tile, w=w, th_thickness=th_thickness,
        th_normal_cos=th_normal_cos, edge_gate2=edge_gate2,
        big_pid=big_pid, signed=signed,
    )
    if interpret is None:
        interpret = _interpret_default()
    return _sweep_call(kernel, rows, n, w, tile, interpret)


# ----------------------------------------------------------------------
# seed sweep (seg/region_grow.py window_seeds): a point is bad iff any
# window candidate within its seed ball fails the plane test —
# slab row 14 = squared k-th-NN distance (the ball), rows 6-11 unused
# ----------------------------------------------------------------------


def _seed_kernel(slab_hbm, out_ref, slab, sem, *, tile, w,
                 th_thickness, th_normal_cos, signed):
    ti = pl.program_id(0)
    dma = pltpu.make_async_copy(
        slab_hbm.at[:, pl.ds(ti * tile, tile + 2 * w + _lane_pad(tile, w))],
        slab, sem,
    )
    dma.start()
    dma.wait()

    def row(i, s):
        return slab[i, pl.ds(s, tile)]

    px, py, pz = row(0, w), row(1, w), row(2, w)
    nx, ny, nz = row(3, w), row(4, w), row(5, w)
    mask0 = row(13, w)
    dk = row(14, w)
    bad = jnp.zeros((tile,), jnp.float32)
    for slot in range(2 * w):
        start = slot if slot < w else slot + 1
        dx = row(0, start) - px
        dy = row(1, start) - py
        dz = row(2, start) - pz
        d2 = dx * dx + dy * dy + dz * dz
        in_ball = (d2 <= dk) & (row(13, start) > 0.5) & (mask0 > 0.5)
        pd = jnp.abs(dx * nx + dy * ny + dz * nz)
        pc = (
            row(3, start) * nx + row(4, start) * ny + row(5, start) * nz
        )
        if not signed:
            pc = jnp.abs(pc)
        fails = in_ball & ~(
            (pd <= th_thickness) & (pc >= th_normal_cos)
        )
        bad = jnp.maximum(bad, jnp.where(fails, 1.0, 0.0))
    out_ref[...] = bad


@functools.partial(
    jax.jit,
    static_argnames=(
        "w", "tile", "th_thickness", "th_normal_cos", "signed",
        "interpret",
    ),
)
def seed_sweep(
    ppx, ppy, ppz, pnx, pny, pnz, pdk, pmask, *, w, tile,
    th_thickness, th_normal_cos, signed=False, interpret=None,
):
    """Window seed-failure sweep; returns float32[n] (1.0 = bad)."""
    n = ppx.shape[0] - 2 * w
    z = jnp.zeros_like(ppx)
    rows = [ppx, ppy, ppz, pnx, pny, pnz, z, z, z, z, z, z, z, pmask, pdk]
    kernel = functools.partial(
        _seed_kernel, tile=tile, w=w, th_thickness=th_thickness,
        th_normal_cos=th_normal_cos, signed=signed,
    )
    if interpret is None:
        interpret = _interpret_default()
    return _sweep_call(kernel, rows, n, w, tile, interpret)


# ----------------------------------------------------------------------
# label-propagation sweep (seg/region_grow.py window_body step 3):
# per offset, the hop-min (neighbor's region model accepts me) and the
# merge hook (mutual model acceptance, smaller label) — slab rows
# 6-8 model normal, 9-11 model center, 12 label (inf encoded as a
# large float), rows as in the XLA version
# ----------------------------------------------------------------------


def _label_kernel(slab_hbm, new_ref, best_ref, slab, sem, *, tile, w,
                  th_thickness, th_normal_cos, edge_gate2, inf_label,
                  signed):
    ti = pl.program_id(0)
    dma = pltpu.make_async_copy(
        slab_hbm.at[:, pl.ds(ti * tile, tile + 2 * w + _lane_pad(tile, w))],
        slab, sem,
    )
    dma.start()
    dma.wait()

    def row(i, s):
        return slab[i, pl.ds(s, tile)]

    px, py, pz = row(0, w), row(1, w), row(2, w)
    nx, ny, nz = row(3, w), row(4, w), row(5, w)
    mnx, mny, mnz = row(6, w), row(7, w), row(8, w)
    mcx, mcy, mcz = row(9, w), row(10, w), row(11, w)
    lab0 = row(12, w)
    mask0 = row(13, w)
    has = lab0 < inf_label
    new = lab0
    best = jnp.full((tile,), inf_label, jnp.float32)
    for slot in range(2 * w):
        start = slot if slot < w else slot + 1
        dx = px - row(0, start)
        dy = py - row(1, start)
        dz = pz - row(2, start)
        near = (
            (dx * dx + dy * dy + dz * dz <= edge_gate2)
            & (row(13, start) > 0.5)
            & (mask0 > 0.5)
        )
        clab = row(12, start)
        cmnx, cmny, cmnz = row(6, start), row(7, start), row(8, start)
        cmcx, cmcy, cmcz = row(9, start), row(10, start), row(11, start)
        d = jnp.abs(
            (px - cmcx) * cmnx + (py - cmcy) * cmny + (pz - cmcz) * cmnz
        )
        c = nx * cmnx + ny * cmny + nz * cmnz
        if not signed:
            c = jnp.abs(c)
        hop_ok = (
            (clab < inf_label)
            & near
            & (d <= th_thickness)
            & (c >= th_normal_cos)
        )
        new = jnp.minimum(new, jnp.where(hop_ok, clab, inf_label))
        dcx = cmcx - mcx
        dcy = cmcy - mcy
        dcz = cmcz - mcz
        mm = mnx * cmnx + mny * cmny + mnz * cmnz
        if not signed:
            mm = jnp.abs(mm)
        mutual = (
            (jnp.abs(dcx * mnx + dcy * mny + dcz * mnz) <= th_thickness)
            & (jnp.abs(dcx * cmnx + dcy * cmny + dcz * cmnz) <= th_thickness)
            & (mm >= th_normal_cos)
        )
        mrg_ok = has & (clab < lab0) & near & mutual
        best = jnp.minimum(best, jnp.where(mrg_ok, clab, inf_label))
    new_ref[...] = new
    best_ref[...] = best


@functools.partial(
    jax.jit,
    static_argnames=(
        "w", "tile", "th_thickness", "th_normal_cos", "edge_gate2",
        "inf_label", "signed", "interpret",
    ),
)
def label_sweep(
    ppx, ppy, ppz, pnx, pny, pnz, pmnx, pmny, pmnz, pmcx, pmcy, pmcz,
    plab, pmask, *, w, tile, th_thickness, th_normal_cos, edge_gate2,
    inf_label, signed=False, interpret=None,
):
    """One label-propagation sweep; returns (new f32[n], best f32[n])."""
    n = ppx.shape[0] - 2 * w
    rows = [ppx, ppy, ppz, pnx, pny, pnz, pmnx, pmny, pmnz, pmcx, pmcy,
            pmcz, plab, pmask]
    kernel = functools.partial(
        _label_kernel, tile=tile, w=w, th_thickness=th_thickness,
        th_normal_cos=th_normal_cos, edge_gate2=edge_gate2,
        inf_label=inf_label, signed=signed,
    )
    if interpret is None:
        interpret = _interpret_default()
    return _sweep_call(kernel, rows, n, w, tile, interpret, n_out=2)
