"""Fused window sweep: kNN distances + normal moments in one pass.

The window kNN and the window-moment normal estimation sweep the same
±W contiguous slices of the Morton-sorted cloud; running them
separately reads every slice twice.  This op accumulates both in one
loop: per offset it computes the candidate distance row (for the top-k
ranking) AND the radius-masked first/second moments (for the
covariance normals), then finishes with one ``top_k`` and the
closed-form eigensolve.

Numerically identical to running :func:`knn_window_sorted` and
:func:`estimate_normals_window` separately with the same window.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from buildingsegment_tpu.ops.normals import eigh3x3_smallest

__all__ = ["knn_normals_window_sorted"]

_INF = jnp.float32(jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("k", "window", "axis_name", "max_nn")
)
def knn_normals_window_sorted(
    spos: jax.Array,
    smask: jax.Array,
    k: int,
    *,
    window: int = 64,
    radius: float = 100.0,
    orient_z: bool = True,
    axis_name: str = None,
    max_nn: int = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One fused sweep → (neigh_idx, neigh_sq_dist, normals, curvature).

    Args:
        spos: float32[N, 3] Morton-sorted positions.
        smask: bool[N].
        k: neighbors INCLUDING self at slot 0 (2·window ≥ k−1).
        window: half-width of the candidate window.
        radius: normal-estimation neighborhood radius.
        axis_name: when running inside ``shard_map`` over Morton-range
            shards, the mesh axis — window padding comes from a
            ppermute halo exchange instead of constant sentinels, and
            neighbor indices are returned in the GLOBAL sorted frame.
        max_nn: Open3D-hybrid cap — normal moments use the ``max_nn``
            nearest candidates (incl. self) within ``radius``, not all
            in-radius candidates (tmc3/my_function.h:63:
            KDTreeSearchParamHybrid(radius=100, max_nn=50)).  None (or a
            cap wider than the window) keeps the all-in-radius behavior.

    Returns sorted-frame neighbor indices/distances (slot 0 = self) and
    unit normals (+Z oriented) with curvature.
    """
    n = spos.shape[0]
    if 2 * window < k - 1:
        raise ValueError(f"window {window} too small for k={k}")
    w2 = 2 * window

    if axis_name is not None:
        from buildingsegment_tpu.dist.halo import halo_pad

        ppos = halo_pad(spos.astype(jnp.float32), window, axis_name)
        pmask = halo_pad(smask, window, axis_name)
        row_base = lax.axis_index(axis_name).astype(jnp.int32) * n
    else:
        pad_val = jnp.float32(-3e7)
        ppos = jnp.concatenate(
            [
                jnp.full((window, 3), pad_val, jnp.float32),
                spos.astype(jnp.float32),
                jnp.full((window, 3), pad_val, jnp.float32),
            ]
        )
        pmask = jnp.concatenate(
            [jnp.zeros(window, bool), smask, jnp.zeros(window, bool)]
        )
        row_base = jnp.int32(0)
    base = spos.astype(jnp.float32)
    r2 = jnp.float32(radius) * jnp.float32(radius)
    # the Open3D-hybrid cap binds only when it is tighter than the
    # window itself (max_nn includes self; the window candidates don't)
    cap_active = max_nn is not None and (max_nn - 1) < w2
    unroll = 8 if w2 % 8 == 0 else 1

    def one_offset(slot, carry, with_moments, r_eff2):
        d_all, s0, s1, s2 = carry
        off = jnp.where(slot < window, slot - window, slot - window + 1)
        start = off + window
        cand = lax.dynamic_slice(ppos, (start, 0), (n, 3))
        cmask = lax.dynamic_slice(pmask, (start,), (n,))
        diff = cand - base
        d = jnp.sum(diff * diff, axis=-1)
        valid = cmask & smask
        if d_all is not None:
            d_all = lax.dynamic_update_slice(
                d_all, jnp.where(valid, d, _INF)[None, :], (slot, 0)
            )
        if with_moments:
            use = valid & (d <= r_eff2)
            uw = use.astype(jnp.float32)
            s0 = s0 + uw
            s1 = s1 + diff * uw[:, None]
            s2 = s2 + jnp.stack(
                [
                    diff[:, 0] * diff[:, 0],
                    diff[:, 1] * diff[:, 1],
                    diff[:, 2] * diff[:, 2],
                    diff[:, 0] * diff[:, 1],
                    diff[:, 0] * diff[:, 2],
                    diff[:, 1] * diff[:, 2],
                ],
                axis=-1,
            ) * uw[:, None]
        return d_all, s0, s1, s2

    def sweep(with_d_all, with_moments, r_eff2):
        def chunk(ci, carry):
            for u in range(unroll):
                carry = one_offset(
                    ci * unroll + u, carry, with_moments, r_eff2
                )
            return carry

        init = (
            jnp.full((w2, n), _INF, jnp.float32) if with_d_all else None,
            # the self offset contributes weight 1 at distance 0
            smask.astype(jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n, 6), jnp.float32),
        )
        return lax.fori_loop(0, w2 // unroll, chunk, init)

    if cap_active:
        # pass 1: distances only; one top_k serves both the kNN slots
        # and the hybrid cap radius (the (max_nn-1)-th nearest other)
        d_all, _, _, _ = sweep(True, False, r2)
        kk = max(k - 1, max_nn - 1)
        neg_all, arg_all = lax.top_k(-d_all.T, kk)
        neg_top, arg = neg_all[:, : k - 1], arg_all[:, : k - 1]
        r_cap = -neg_all[:, max_nn - 2]  # inf when fewer candidates
        r_eff2 = jnp.minimum(r2, r_cap)
        # pass 2: moments gated by the per-point hybrid radius
        _, s0, s1, s2 = sweep(False, True, r_eff2)
    else:
        d_all, s0, s1, s2 = sweep(True, True, r2)
        neg_top, arg = lax.top_k(-d_all.T, k - 1)

    # ---- kNN finish (identical to knn_window_sorted) ----
    nb_d = -neg_top
    off = jnp.where(arg < window, arg - window, arg - window + 1)
    rows = lax.broadcasted_iota(jnp.int32, (n, 1), 0) + row_base
    nb_i = rows + off
    invalid = jnp.isinf(nb_d)
    nb_i = jnp.where(invalid, rows, nb_i)
    nb_d = jnp.where(invalid, 0.0, nb_d)
    nb_i = jnp.concatenate([rows, nb_i], axis=1)
    nb_d = jnp.concatenate([jnp.zeros((n, 1), jnp.float32), nb_d], axis=1)
    nb_i = jnp.where(smask[:, None], nb_i, rows)
    nb_d = jnp.where(smask[:, None], nb_d, 0.0)

    # ---- normals finish (identical to estimate_normals_window) ----
    safe = jnp.maximum(s0, 1.0)
    mean = s1 / safe[:, None]
    m = s2 / safe[:, None]
    c00 = m[:, 0] - mean[:, 0] * mean[:, 0]
    c11 = m[:, 1] - mean[:, 1] * mean[:, 1]
    c22 = m[:, 2] - mean[:, 2] * mean[:, 2]
    c01 = m[:, 3] - mean[:, 0] * mean[:, 1]
    c02 = m[:, 4] - mean[:, 0] * mean[:, 2]
    c12 = m[:, 5] - mean[:, 1] * mean[:, 2]
    cov = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c01, c11, c12], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        axis=-2,
    )
    v, eigvals = eigh3x3_smallest(cov)
    z = jnp.zeros_like(v).at[..., 2].set(1.0)
    v = jnp.where((s0 < 3.0)[:, None], z, v)
    if orient_z:
        v = jnp.where((v[..., 2] < 0.0)[..., None], -v, v)
    total = jnp.sum(eigvals, axis=-1)
    curvature = jnp.where(
        total > 0, eigvals[..., 0] / jnp.where(total > 0, total, 1.0), 0.0
    )
    curvature = jnp.where(s0 < 3.0, 0.0, curvature)
    return nb_i, nb_d, v, curvature
