"""Pallas segment reductions over a SMALL id table — sort-free.

XLA lowers every ``zeros.at[idx].add(payload)`` scatter on TPU to a
hidden full sort of the N updates (~10-15 ms per scatter at 1M rows).
When the target table is small (the ≤1024-row plane table), the sum can
instead be computed as a one-hot matmul per row tile, accumulated in
VMEM across the sequential Pallas grid:

    acc[t, c] += Σ_i (id_i == t) · payload[i, c]

The one-hot selector has at most one nonzero per column, so each
accumulated term is a plain f32 add of an exactly-represented product —
``precision=HIGHEST`` makes the bf16-split MXU passes reconstruct the
f32 payload bit-exactly, and the result equals the XLA scatter-add up
to f32 addition order (bit-exact for the integer-valued count column).

Only id chunks below the caller-supplied live bound are touched, so the
cost scales with the number of LIVE planes (typically one 128-id
chunk), not the table capacity.

The same one-hot trick in the other direction (``lut[id_i]``, a gather
from a small table) is ``table_lookup`` — XLA's general gather runs
~2 GB/s on TPU regardless of table size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["plane_sums", "table_lookup", "table_lookup_cols"]

_CHUNK = 128  # id chunk = one lane row of the one-hot selector


def _segsum_kernel(nchunk_ref, ids_ref, payload_ref, out_ref, acc, *,
                   tile, n_chunk_cap, cols):
    ti = pl.program_id(0)
    nt = pl.num_programs(0)
    # zero-init the persistent accumulator on the first tile (select on
    # a read, NOT a @pl.when write — reading the uninitialized scratch
    # is fine because the select discards it)
    acc[...] = jnp.where(ti == 0, 0.0, acc[...])

    ids = ids_ref[...]  # f32[tile], integer-valued
    payload = payload_ref[...]  # f32[tile, cols]

    def chunk(c, _):
        # one-hot selector for ids in [c·128, (c+1)·128): eqT[t, i]
        # (Mosaic iota must be integer-typed; convert after)
        base = (c * _CHUNK).astype(jnp.float32)
        tgt = base + lax.broadcasted_iota(
            jnp.int32, (_CHUNK, tile), 0
        ).astype(jnp.float32)
        eqT = jnp.where(tgt == ids[None, :], 1.0, 0.0)
        contrib = lax.dot_general(
            eqT, payload, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [128, cols]
        r0 = c * _CHUNK
        acc[pl.ds(r0, _CHUNK), :] = acc[pl.ds(r0, _CHUNK), :] + contrib
        return 0

    lax.fori_loop(0, nchunk_ref[0], chunk, 0)
    # flush every step (same constant-index output block persists; the
    # final step's write is the result)
    del nt
    out_ref[...] = acc[...]


@functools.partial(
    jax.jit, static_argnames=("table_cap", "cols", "tile", "interpret")
)
def plane_sums(ids, payload, n_live, *, table_cap, cols=8, tile=8192,
               interpret=None):
    """Segment-sum ``payload`` rows by integer id into a small table.

    Args:
        ids: int32[n] ids in [0, table_cap); rows the caller wants
            excluded should carry an id ≥ the live bound.
        payload: f32[n, cols] per-row payload (cols ≤ 128).
        n_live: scalar int32 — ids ≥ n_live are never accumulated
            (their table rows stay zero).  May be traced.
        table_cap: static table capacity (rounded up to 128).

    Returns f32[cap128, cols] with ``cap128 = ceil(table_cap/128)·128``;
    row t = Σ over rows with ids == t of payload.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n = ids.shape[0]
    n_chunk_cap = -(-table_cap // _CHUNK)
    cap128 = n_chunk_cap * _CHUNK
    tile = min(tile, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tile) * tile
    idsf = ids.astype(jnp.float32)
    if n_pad != n:
        # pad with an out-of-range id so padding never accumulates
        idsf = jnp.concatenate(
            [idsf, jnp.full((n_pad - n,), float(cap128), jnp.float32)]
        )
        payload = jnp.concatenate(
            [payload, jnp.zeros((n_pad - n, cols), payload.dtype)]
        )
    n_chunks = jnp.minimum(
        (n_live.astype(jnp.int32) + _CHUNK - 1) // _CHUNK, n_chunk_cap
    ).reshape((1,))
    kernel = functools.partial(
        _segsum_kernel, tile=tile, n_chunk_cap=n_chunk_cap, cols=cols
    )
    return pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile,), lambda ti: (ti,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cols), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cap128, cols), lambda ti: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cap128, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cap128, cols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(n_chunks, idsf, payload.astype(jnp.float32))


def _lookup_kernel(nchunk_ref, ids_ref, lut_ref, out_ref, *, tile):
    ids = ids_ref[...]  # f32[tile]

    def chunk(c, acc):
        base = (c * _CHUNK).astype(jnp.float32)
        tgt = base + lax.broadcasted_iota(
            jnp.int32, (_CHUNK, tile), 0
        ).astype(jnp.float32)
        eqT = jnp.where(tgt == ids[None, :], 1.0, 0.0)
        vals = lut_ref[pl.ds(c, 1), :]  # [1, 128]
        contrib = lax.dot_general(
            vals, eqT, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [1, tile]
        return acc + contrib[0, :]

    out_ref[...] = lax.fori_loop(
        0, nchunk_ref[0], chunk, jnp.zeros((tile,), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def table_lookup(ids, lut, n_live, *, tile=8192, interpret=None):
    """``lut[ids]`` through a one-hot matmul (sort- and gather-free).

    Args:
        ids: int32[n] in [0, len(lut)); ids ≥ n_live return 0.0.
        lut: f32[cap] small table (cap rounded up to 128 internally).
        n_live: scalar int32 live-id bound (may be traced).

    Returns f32[n].
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n = ids.shape[0]
    cap = lut.shape[0]
    n_chunk_cap = -(-cap // _CHUNK)
    cap128 = n_chunk_cap * _CHUNK
    if cap128 != cap:
        lut = jnp.concatenate(
            [lut.astype(jnp.float32),
             jnp.zeros((cap128 - cap,), jnp.float32)]
        )
    lut2 = lut.astype(jnp.float32).reshape(n_chunk_cap, _CHUNK)
    tile = min(tile, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tile) * tile
    idsf = ids.astype(jnp.float32)
    if n_pad != n:
        idsf = jnp.concatenate(
            [idsf, jnp.full((n_pad - n,), float(cap128), jnp.float32)]
        )
    n_chunks = jnp.minimum(
        (n_live.astype(jnp.int32) + _CHUNK - 1) // _CHUNK, n_chunk_cap
    ).reshape((1,))
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, tile=tile),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile,), lambda ti: (ti,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunk_cap, _CHUNK), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda ti: (ti,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(n_chunks, idsf, lut2)
    if n_pad != n:
        out = lax.slice(out, (0,), (n,))
    return out


def _lookup_cols_kernel(nchunk_ref, ids_ref, lut_ref, out_ref, *,
                        tile, cpad):
    ids = ids_ref[...]  # f32[tile]

    def chunk(c, acc):
        base = (c * _CHUNK).astype(jnp.float32)
        tgt = base + lax.broadcasted_iota(
            jnp.int32, (_CHUNK, tile), 0
        ).astype(jnp.float32)
        eqT = jnp.where(tgt == ids[None, :], 1.0, 0.0)
        # [cpad, 128] chunk of the column-major table; the dynamic
        # sublane offset stays 8-aligned because cpad is padded to 8
        vals = lut_ref[pl.ds(c * cpad, cpad), :]
        contrib = lax.dot_general(
            vals, eqT, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [cpad, tile]
        return acc + contrib

    out_ref[...] = lax.fori_loop(
        0, nchunk_ref[0], chunk,
        jnp.zeros((cpad, tile), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def table_lookup_cols(ids, lut, n_live, *, tile=8192, interpret=None):
    """``lut[ids, :]`` for a small multi-column table, one fused pass.

    The one-hot selector is built ONCE per id chunk and shared by all
    columns (three separate :func:`table_lookup` calls pay the
    [128, tile] compare three times — the selector build dominates).

    Args:
        ids: int32[n] in [0, cap); ids ≥ n_live return 0.0.
        lut: f32[cap, cols] small table (cols ≤ 8).
        n_live: scalar int32 live-id bound (may be traced).

    Returns f32[cols, n] — COLUMN-major so consumers peel per-axis
    rows without a transpose.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n = ids.shape[0]
    cap, cols = lut.shape
    assert cols <= 8, cols
    cpad = 8
    n_chunk_cap = -(-cap // _CHUNK)
    cap128 = n_chunk_cap * _CHUNK
    # chunk-major [n_chunk_cap * cpad, 128]: chunk c's rows are
    # [c·cpad, c·cpad + cols)
    lutp = jnp.zeros((cap128, cpad), jnp.float32)
    lutp = lutp.at[:cap, :cols].set(lut.astype(jnp.float32))
    lut3 = (
        lutp.reshape(n_chunk_cap, _CHUNK, cpad)
        .transpose(0, 2, 1)
        .reshape(n_chunk_cap * cpad, _CHUNK)
    )
    tile = min(tile, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tile) * tile
    idsf = ids.astype(jnp.float32)
    if n_pad != n:
        idsf = jnp.concatenate(
            [idsf, jnp.full((n_pad - n,), float(cap128), jnp.float32)]
        )
    n_chunks = jnp.minimum(
        (n_live.astype(jnp.int32) + _CHUNK - 1) // _CHUNK, n_chunk_cap
    ).reshape((1,))
    out = pl.pallas_call(
        functools.partial(_lookup_cols_kernel, tile=tile, cpad=cpad),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile,), lambda ti: (ti,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunk_cap * cpad, _CHUNK),
                         lambda ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cpad, tile), lambda ti: (0, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cpad, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(n_chunks, idsf, lut3)
    return out[:cols, :n]
