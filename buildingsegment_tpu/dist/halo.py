"""Halo exchange for Morton-range point shards (SURVEY.md §2.5).

The cloud is Morton-sorted globally and sharded into contiguous ranges
over the 1-D ``points`` mesh axis, so every windowized op (±W slice
sweeps for kNN, normal moments, label propagation) only ever needs the
last/first W rows of the ring neighbors — exchanged here with
``lax.ppermute`` over ICI.  This is the point-cloud analog of context-
parallel halo exchange; the reference has no equivalent (it is a
single-thread CPU binary, tmc3/TMC3.cpp:202-229).

All helpers run INSIDE ``jax.shard_map`` (they issue collectives over
``axis_name``).  Outermost shards receive zero-filled halos; callers
gate halo rows with the exchanged mask, exactly like the single-device
code gates its constant sentinel padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["halo_pad"]


def halo_pad(x: jax.Array, w: int, axis_name: str) -> jax.Array:
    """Pad local rows with ``w`` halo rows from the ring neighbors.

    Args:
        x: local shard array [S, ...] (leading axis = Morton-contiguous
            point rows).
        w: halo width (rows).
        axis_name: shard_map mesh axis.

    Returns:
        [S + 2w, ...]: previous shard's last w rows, then x, then next
        shard's first w rows.  Global-edge shards get zeros (gate with
        the halo-padded mask).
    """
    d = lax.axis_size(axis_name)
    # shard i's tail → shard i+1 (left halo); head → shard i-1 (right)
    fwd = [(i, i + 1) for i in range(d - 1)]
    bwd = [(i + 1, i) for i in range(d - 1)]
    left = lax.ppermute(x[-w:], axis_name, perm=fwd)
    right = lax.ppermute(x[:w], axis_name, perm=bwd)
    return jnp.concatenate([left, x, right], axis=0)
