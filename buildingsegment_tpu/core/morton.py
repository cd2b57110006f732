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
from jax import lax

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
    return _two_word_argsort(lo, hi, mask)


def _two_word_argsort(lo: jax.Array, hi: jax.Array, mask: jax.Array) -> jax.Array:
    big = jnp.int32(0x7FFFFFFF)
    hi = jnp.where(mask, hi, big)  # padding → after every real point
    order = jnp.argsort(lo, stable=True)
    order = order[jnp.argsort(hi[order], stable=True)]
    return order


def morton_sort(positions: jax.Array, mask: jax.Array):
    """Sort positions+mask by the 60-bit Morton code, carrying payloads
    through ONE multi-operand ``lax.sort`` instead of argsort+gather.

    The sorting network moves the payload columns along with the keys,
    so there is no random-access gather afterwards — measured 6 ms vs
    40 ms for argsort-then-gather at 1M points on a v5e chip.

    Returns (sorted_positions int32[N,3], sorted_mask bool[N],
    order int32[N]) where ``order`` maps sorted row → original row
    (for the final unsort scatter).
    """
    n = positions.shape[0]
    pos = jnp.clip(positions, 0, (1 << TOTAL_BITS) - 1)
    lo = morton_encode(pos, shift=0)
    hi = morton_encode(pos, shift=WORD_BITS)
    big = jnp.int32(0x7FFFFFFF)
    hi = jnp.where(mask, hi, big)  # padding → after every real point
    lo = jnp.where(mask, lo, big)
    iota = jnp.arange(n, dtype=jnp.int32)
    _, _, x, y, z, m, order = lax.sort(
        (hi, lo, positions[:, 0], positions[:, 1], positions[:, 2],
         mask, iota),
        num_keys=2,
        is_stable=True,
    )
    return jnp.stack([x, y, z], axis=-1), m, order


def unsort_by(order: jax.Array, *payloads: jax.Array):
    """Invert the sort permutation gather/scatter-free.

    ``order`` (as returned by :func:`morton_sort`) maps sorted row →
    original row; sorting the payload columns by it restores the
    original frame through the same multi-operand sorting network.  An
    XLA ``zeros.at[order].set(v)`` scatter costs ~11 ms at 1M rows on
    TPU (it hides a full sort AND random-access writes); this runs at
    plain sort speed (~4 ms).

    Returns the unsorted payload (or tuple of payloads).
    """
    out = lax.sort((order,) + payloads, num_keys=1, is_stable=False)
    return out[1:] if len(payloads) > 1 else out[1]


def hilbert_transpose(positions: jax.Array, bits: int = TOTAL_BITS) -> jax.Array:
    """Skilling's axes→transpose transform, vectorized (int32 per axis).

    Returns X int32[..., 3] such that interleaving the bits of
    X[...,0] (most significant), X[...,1], X[...,2] yields the Hilbert
    index.  The Hilbert curve visits every cell through face-adjacent
    steps — unlike the Z-order curve it has no long jumps, which is
    exactly what window-based neighbor search wants.
    """
    x = jnp.clip(positions[..., 0], 0, (1 << bits) - 1)
    y = jnp.clip(positions[..., 1], 0, (1 << bits) - 1)
    z = jnp.clip(positions[..., 2], 0, (1 << bits) - 1)
    X = [x, y, z]

    # inverse undo (static loop over bit planes, vectorized over points)
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(3):
            has = (X[i] & q) != 0
            # invert X[0] low bits where has; else swap low bits X[0]<->X[i]
            t = (X[0] ^ X[i]) & p
            X0_inv = X[0] ^ p
            X0_swp = X[0] ^ t
            Xi_swp = X[i] ^ t
            X0_new = jnp.where(has, X0_inv, X0_swp)
            Xi_new = jnp.where(has | (i == 0), X[i], Xi_swp)
            if i == 0:
                X[0] = jnp.where(has, X0_inv, X[0])
            else:
                X[0] = X0_new
                X[i] = Xi_new
        q >>= 1

    # Gray encode
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[0])
    q = 1 << (bits - 1)
    while q > 1:
        cond = (X[2] & q) != 0
        t = jnp.where(cond, t ^ (q - 1), t)
        q >>= 1
    return jnp.stack([X[0] ^ t, X[1] ^ t, X[2] ^ t], axis=-1)


def hilbert_argsort(positions: jax.Array, mask: jax.Array) -> jax.Array:
    """Stable argsort by the 60-bit Hilbert index; padded rows sort last.

    Same two-word LSD-radix scheme as :func:`morton_argsort`, with the
    transpose-form axes interleaved so X[...,0] is the most significant
    axis per bit triple (our interleave puts the ``z`` slot at bit
    3k+2, so the transpose axes map to (z,y,x) slots reversed).
    """
    pos = jnp.clip(positions, 0, (1 << TOTAL_BITS) - 1)
    xt = hilbert_transpose(pos)
    # slot order: morton_encode puts axis 2 (z) most significant —
    # feed X0 there, X2 least significant
    perm = jnp.stack([xt[..., 2], xt[..., 1], xt[..., 0]], axis=-1)
    lo = morton_encode(perm, shift=0)
    hi = morton_encode(perm, shift=WORD_BITS)
    return _two_word_argsort(lo, hi, mask)
