"""On-device Morton (Z-order) encoding and sorting — int32-native.

The reference carries a dead LUT-based Morton encoder from TMC13
(tmc3/PCCMath.h:621-642 — its lookup tables were never shipped, so it
cannot even link).  Spatial locality matters much more for the TPU
rebuild: Morton-sorting the cloud makes neighbor candidates contiguous
in memory, which is what lets windowed kNN and range sharding work.

TPUs have no fast int64 path (and JAX defaults to x64-disabled), so
instead of one 63-bit code we interleave 10 bits per axis into 30-bit
int32 words and sort LSD-radix style: a stable argsort by the low word
followed by a stable argsort by the high word yields the exact order of
the full 60-bit (20 bits/axis, ~1 km at mm resolution) code.  Encoding
is vectorized magic-number bit spreading — no tables, pure VPU ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: bits per axis captured by one 30-bit int32 word
WORD_BITS = 10
#: total bits per axis across the two-word code
TOTAL_BITS = 2 * WORD_BITS


def _spread_bits_10(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of ``x`` so bit i moves to bit 3*i (int32)."""
    x = x.astype(jnp.int32) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_encode(positions: jax.Array, shift: int = 0) -> jax.Array:
    """30-bit Morton code int32[N] of bits [shift, shift+10) of each axis.

    Axis interleave: bit k of x lands at 3k, y at 3k+1, z at 3k+2.
    Positions must be non-negative (the pipeline shifts the bbox to the
    origin first).
    """
    p = positions >> shift if shift else positions
    x = _spread_bits_10(p[..., 0])
    y = _spread_bits_10(p[..., 1])
    z = _spread_bits_10(p[..., 2])
    return x | (y << 1) | (z << 2)


def morton_argsort(positions: jax.Array, mask: jax.Array) -> jax.Array:
    """Stable argsort by the 60-bit Morton code; padded rows sort last.

    Two-pass LSD radix: stable sort by the low 30-bit word, then by the
    high word.  Coordinates are clamped to 20 bits per axis (~1048 m at
    mm scale) — beyond that, points still sort into coarse cells.
    """
    pos = jnp.clip(positions, 0, (1 << TOTAL_BITS) - 1)
    lo = morton_encode(pos, shift=0)
    hi = morton_encode(pos, shift=WORD_BITS)
    big = jnp.int32(0x7FFFFFFF)
    hi = jnp.where(mask, hi, big)  # padding → after every real point
    order = jnp.argsort(lo, stable=True)
    order = order[jnp.argsort(hi[order], stable=True)]
    return order
