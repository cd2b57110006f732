"""Pallas brute-force kNN kernel — fused distances + running top-k.

The scored brute-force configuration (BASELINE config 2: exact kNN,
k=16, ~1M points) is hopeless as a composition of XLA ops: materializing
N×N distance blocks to HBM and merging with ``lax.top_k`` is
bandwidth- and sort-bound (the pure-JAX tiled version runs minutes at
1M).  This kernel keeps everything in VMEM:

  * grid (query_tile × candidate_tile), candidate dimension innermost
    and sequential, so the per-query running top-k lives in VMEM
    scratch across the whole candidate sweep;
  * positions are laid out transposed [3, N] so distance blocks are
    outer differences over lanes — pure VPU, no awkward [*, 3] tiles;
  * **banded candidate ordering**: each query tile visits candidate
    tiles nearest-first in Morton order (home tile, then ±1, ±2, …).
    After the first few tiles the running k-th best distance τ is
    tight, and
  * **threshold skip**: a tile that cannot improve τ costs only the
    distance block and one compare (`@pl.when` guards the expensive
    K-round selection merge), so the common case streams at VPU speed.

Exactness: distances are computed in the diff form (no catastrophic
|q|²−2q·c cancellation) over every candidate, so results match the
oracle bit-for-bit up to ties.
"""

from __future__ import annotations

import functools
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
# sentinel distance: padded rows sit at coord -3e7; any distance to one
# exceeds this, while real mm-scale distances stay far below
_SENTINEL_D = 1e14


def _banded(ci: jax.Array, home: jax.Array, num_c: int) -> jax.Array:
    """Visit order home, home+1, home-1, home+2, … (mod num_c).

    The modulo operand is biased non-negative first: lowered index
    arithmetic uses C-style srem where (-1) % 4 == -1, unlike jnp's
    3 — a negative block index silently clamps and half the candidate
    tiles are never visited (observed compiled-vs-interpret divergence).
    """
    step = (ci + 1) // 2
    sign = jnp.where(ci % 2 == 1, 1, -1)
    return (home + sign * step + num_c) % num_c


def _kernel(q_ref, c_ref, qv_ref, cv_ref, best_d_ref, best_i_ref, k: int,
            qt: int, ct: int, n: int):
    qi = pl.program_id(0)
    ci = pl.program_id(1)
    num_c = pl.num_programs(1)

    home = (qi * qt) // ct
    actual_ci = _banded(ci, home, num_c)

    q_start = qi * qt
    c_start = actual_ci * ct

    # [3, qt] query / [3, ct] candidate blocks (streamed to VMEM by the
    # BlockSpec pipeline; the candidate index_map applies the banded
    # visit order).  Rows read individually — integer indexing into a
    # loaded array lowers to an unsupported gather in Mosaic.
    qx = q_ref[0, :]
    qy = q_ref[1, :]
    qz = q_ref[2, :]
    cx = c_ref[0, :]
    cy = c_ref[1, :]
    cz = c_ref[2, :]
    qv = qv_ref[0, :]
    cv = cv_ref[0, :]

    # distance block [qt, ct] via outer differences (diff form — exact)
    dx = qx[:, None] - cx[None, :]
    dy = qy[:, None] - cy[None, :]
    dz = qz[:, None] - cz[None, :]
    d = dx * dx + dy * dy + dz * dz

    q_idx = q_start + lax.broadcasted_iota(jnp.int32, (qt, ct), 0)
    c_idx = c_start + lax.broadcasted_iota(jnp.int32, (qt, ct), 1)
    invalid = (
        (c_idx == q_idx)
        | (cv[None, :] == 0)
        | (qv[:, None] == 0)
        | (c_idx >= n)
    )
    d = jnp.where(invalid, _INF, d)

    # Initialization by read+select instead of a conditional first-step
    # write: reading a ref after a `@pl.when` write is an ordering
    # hazard the Mosaic compiler is free to break (observed: compiled
    # results diverged from interpret mode until this was restructured).
    first = ci == 0
    bd0 = jnp.where(first, _INF, best_d_ref[...])
    bi0 = jnp.where(first, 0, best_i_ref[...])

    tau = jnp.max(bd0, axis=1)  # current worst of the best
    improves = jnp.any(d < tau[:, None]) | first

    @pl.when(improves)
    def _merge():
        # K rounds of extract-min / replace-max.  No argmin/argmax:
        # arg extraction over tied values (the all-inf initial rows)
        # is exactly where compiled Mosaic and the interpreter can
        # disagree, so min/max slots are located by equality plus a
        # cumsum first-occurrence mask instead.
        dd = d
        bd = bd0
        bi = bi0
        iota_c = lax.broadcasted_iota(jnp.int32, (qt, ct), 1)
        iota_k = lax.broadcasted_iota(jnp.int32, (qt, k), 1)
        for _ in range(k):
            dmin = jnp.min(dd, axis=1)
            worst = jnp.max(bd, axis=1)
            take = dmin < worst
            # first occurrence = min column index among equal entries
            # (cumsum is not lowered by Mosaic)
            c_hit = jnp.min(
                jnp.where(dd == dmin[:, None], iota_c, ct), axis=1
            )
            first_c = iota_c == c_hit[:, None]
            gidx = c_start + c_hit
            k_hit = jnp.min(
                jnp.where(bd == worst[:, None], iota_k, k), axis=1
            )
            first_k = (iota_k == k_hit[:, None]) & take[:, None]
            bd = jnp.where(first_k, dmin[:, None], bd)
            bi = jnp.where(first_k, gidx[:, None], bi)
            dd = jnp.where(first_c & take[:, None], _INF, dd)
        best_d_ref[...] = bd
        best_i_ref[...] = bi


@functools.partial(
    jax.jit, static_argnames=("k", "query_tile", "cand_tile", "interpret")
)
def knn_pallas(
    positions: jax.Array,
    mask: jax.Array,
    k: int,
    *,
    query_tile: int = 256,
    cand_tile: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact brute-force kNN via the fused Pallas kernel.

    Args:
        positions: int32/float [N, 3]; N must be a multiple of both
            tile sizes (pad the batch).
        mask: bool[N].
        k: neighbors INCLUDING self at slot 0.
        interpret: run in interpreter mode (CPU tests).

    Returns:
        (indices int32[N, k], sq_dists float32[N, k]), slot 0 = self,
        ascending by distance; empty slots fall back to self.
    """
    n = positions.shape[0]
    if n % query_tile or n % cand_tile:
        raise ValueError(
            f"N={n} must be a multiple of query_tile={query_tile} and "
            f"cand_tile={cand_tile}"
        )
    kk = k - 1

    center = jnp.sum(
        jnp.where(mask[:, None], positions, 0).astype(jnp.float32), axis=0
    ) / jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    pos = positions.astype(jnp.float32) - center
    pos = jnp.where(mask[:, None], pos, jnp.float32(-3e7))
    posT = pos.T  # [3, N] — lanes along points
    valid = mask.astype(jnp.int32)[None, :]  # [1, N]

    num_q = n // query_tile
    num_c = n // cand_tile

    kernel = functools.partial(
        _kernel, k=kk, qt=query_tile, ct=cand_tile, n=n
    )

    def cand_map(qi, ci):
        home = (qi * query_tile) // cand_tile
        return (0, _banded(ci, home, num_c))

    best_d, best_i = pl.pallas_call(
        kernel,
        grid=(num_q, num_c),
        in_specs=[
            pl.BlockSpec(
                (3, query_tile), lambda qi, ci: (0, qi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, cand_tile), cand_map, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, query_tile), lambda qi, ci: (0, qi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cand_tile), cand_map, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (query_tile, kk), lambda qi, ci: (qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (query_tile, kk), lambda qi, ci: (qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, kk), jnp.float32),
            jax.ShapeDtypeStruct((n, kk), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(posT, posT, valid, valid)

    # sort ascending, fix empty slots, prepend self
    neg, arg = lax.top_k(-best_d, kk)
    nb_d = -neg
    nb_i = jnp.take_along_axis(best_i, arg, axis=1)
    self_idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    empty = (nb_d >= _SENTINEL_D) | jnp.isinf(nb_d)
    nb_i = jnp.where(empty, self_idx, nb_i)
    nb_d = jnp.where(empty, 0.0, nb_d)
    nb_i = jnp.concatenate([self_idx, nb_i], axis=1)
    nb_d = jnp.concatenate([jnp.zeros((n, 1), jnp.float32), nb_d], axis=1)
    nb_i = jnp.where(mask[:, None], nb_i, self_idx)
    nb_d = jnp.where(mask[:, None], nb_d, 0.0)
    return nb_i, nb_d
