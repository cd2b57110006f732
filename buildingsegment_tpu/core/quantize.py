"""Quantization and bounding-box normalization.

Reproduces the reference's two coordinate transforms:

1. PLY read scales raw float positions by ``positionScale`` (1000 → mm)
   and truncates toward zero into int32 (tmc3/ply.cpp:407-409 ascii,
   437-465 binary; assignment of a double into ``Vec3<int32_t>`` is a C++
   truncating conversion).
2. The ``buildingSeg`` constructor computes the integer bounding box and
   translates the cloud so the minimum corner is the origin
   (tmc3/TMC3.cpp:58-72, comment "shift to positive").

Both are masked reductions / elementwise ops here, fully fused by XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_positions(raw: jax.Array, scale: float) -> jax.Array:
    """float[N,3] × scale, truncated toward zero → int32[N,3].

    Matches C++ double→int32 conversion semantics (truncation toward
    zero, tmc3/ply.cpp:407-409): ``jnp.trunc`` then cast.
    """
    scaled = raw.astype(jnp.float64 if raw.dtype == jnp.float64 else jnp.float32) * scale
    return jnp.trunc(scaled).astype(jnp.int32)


def compute_bbox(positions: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Masked integer bounding box (min, max), each int32[3].

    Mirrors the scan at tmc3/TMC3.cpp:58-68 (init max=int32 max,
    min=int32 lowest).
    """
    imax = jnp.int32(np.iinfo(np.int32).max)
    imin = jnp.int32(np.iinfo(np.int32).min)
    m = mask[:, None]
    lo = jnp.min(jnp.where(m, positions, imax), axis=0)
    hi = jnp.max(jnp.where(m, positions, imin), axis=0)
    return lo, hi


def shift_to_origin(
    positions: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Translate so bbox min is the origin (tmc3/TMC3.cpp:70-72).

    Returns (shifted_positions, bbox_min, bbox_max) — the bbox of the
    ORIGINAL cloud, as the reference keeps it for raster sizing
    (tmc3/TMC3.cpp:75-77).  Padded rows are left untouched.
    """
    lo, hi = compute_bbox(positions, mask)
    shifted = jnp.where(mask[:, None], positions - lo[None, :], positions)
    return shifted, lo, hi
