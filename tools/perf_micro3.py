"""Micro-costs of one coarse-solve sweep's pieces at ng = N/16 (67k).

Isolates the hidden-sort scatters, jump-doubling gathers, pair block and
Pallas sweep so the next optimization target is measured, not guessed.
Run on the real chip: python tools/perf_micro3.py
"""

import json

import numpy as np


def _sync(out):
    import jax

    # last leaf: multi-program outputs complete in dispatch order —
    # syncing the first leaf misses the final program (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, reps=16):
    import time

    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    ng = 67_712  # ≈ 1.08M / 16
    L = 1024
    rng = np.random.default_rng(0)
    label = jnp.asarray(
        rng.integers(0, 3000, size=ng).astype(np.int32)
    )  # ~3k live labels (mid-solve regime)
    payload = jnp.asarray(rng.normal(size=(ng, 8)).astype(np.float32))
    parent0 = jnp.asarray(
        np.minimum(
            rng.integers(0, ng, size=ng), np.arange(ng)
        ).astype(np.int32)
    )
    best = jnp.asarray(rng.integers(0, ng + 1, size=ng).astype(np.int32))
    out = {"ng": ng}

    @jax.jit
    def stats_scatter(label, payload):
        tgt = jnp.minimum(label, ng)
        return (
            jnp.zeros((ng + 1, 8), jnp.float32).at[tgt].add(payload)
        )[:ng]

    out["stats_scatter_ms"] = timed(lambda: stats_scatter(label, payload)) * 1e3

    @jax.jit
    def compaction(cnt):
        flag = cnt > 0
        rank = jnp.cumsum(flag.astype(jnp.int32))
        slot = jnp.where(flag & (rank <= L), rank - 1, L)
        idx = jnp.arange(ng, dtype=jnp.int32)
        top_lab = (
            jnp.full((L + 1,), 0, jnp.int32).at[slot].set(idx)
        )[:L]
        live = (jnp.zeros((L + 1,), jnp.bool_).at[slot].set(flag))[:L]
        return top_lab, live

    cnt = stats_scatter(label, payload)[:, 0]
    out["compaction_ms"] = timed(lambda: compaction(cnt)) * 1e3

    @jax.jit
    def parent_scatter_min(label, best):
        idx = jnp.arange(ng, dtype=jnp.int32)
        return (
            jnp.concatenate([idx, jnp.array([ng], jnp.int32)])
            .at[jnp.where(best < ng, label, ng)]
            .min(best)
        )[:ng]

    out["parent_scatter_min_ms"] = timed(
        lambda: parent_scatter_min(label, best)
    ) * 1e3

    @jax.jit
    def jump6(parent):
        for _ in range(6):
            parent = jnp.minimum(parent, parent[jnp.clip(parent, 0, ng - 1)])
        return parent

    out["jump6_ms"] = timed(lambda: jump6(parent0)) * 1e3

    @jax.jit
    def model_gather(label, payload):
        safe = jnp.clip(label, 0, ng - 1)
        return payload[safe]

    out["model_gather8_ms"] = timed(lambda: model_gather(label, payload)) * 1e3

    @jax.jit
    def pair_block(c, mn, r):
        nc = jnp.sum(mn * c, -1)
        ncT = jnp.dot(mn, c.T, preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)
        nrm_sep = ncT - nc[:, None]
        cosab = jnp.abs(
            jnp.dot(mn, mn.T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
        )
        cc = jnp.sum(c * c, -1)
        d2 = cc[:, None] + cc[None, :] - 2.0 * jnp.dot(
            c, c.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)
        inplane2 = jnp.maximum(d2 - nrm_sep * nrm_sep, 0.0)
        reach = 2.0 * (r[:, None] + r[None, :]) + 600.0
        ok = (
            (jnp.abs(nrm_sep) <= 300.0)
            & (cosab >= 0.88)
            & (inplane2 <= reach * reach)
        )
        lo = jnp.minimum(
            jnp.arange(L)[:, None], jnp.arange(L)[None, :]
        )
        return jnp.min(jnp.where(ok, lo, ng), axis=1)

    c_tab = jnp.asarray(rng.uniform(0, 3e4, (L, 3)).astype(np.float32))
    mn_tab = jnp.asarray(rng.normal(size=(L, 3)).astype(np.float32))
    r_tab = jnp.asarray(rng.uniform(0, 3e3, (L,)).astype(np.float32))
    out["pair_block_ms"] = timed(lambda: pair_block(c_tab, mn_tab, r_tab)) * 1e3

    # the Pallas label sweep at this scale
    from buildingsegment_tpu.ops.window_sweep import label_sweep, pick_tile

    w = 16
    pad = lambda a, f: jnp.concatenate(
        [jnp.full((w,), f, a.dtype), a, jnp.full((w,), f, a.dtype)]
    )
    pos = jnp.asarray(rng.uniform(0, 3e4, (ng, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.normal(size=(ng, 3)).astype(np.float32))
    rows = [
        pad(pos[:, 0], -3e7), pad(pos[:, 1], -3e7), pad(pos[:, 2], -3e7),
        pad(nrm[:, 0], 0.0), pad(nrm[:, 1], 0.0), pad(nrm[:, 2], 0.0),
        pad(nrm[:, 0], 0.0), pad(nrm[:, 1], 0.0), pad(nrm[:, 2], 0.0),
        pad(pos[:, 0], 0.0), pad(pos[:, 1], 0.0), pad(pos[:, 2], 0.0),
        pad(label.astype(jnp.float32), float(ng)),
        pad(jnp.ones((ng,), jnp.float32), 0.0),
    ]
    out["label_sweep_ms"] = timed(
        lambda: label_sweep(
            *rows, w=w, tile=pick_tile(ng),
            th_thickness=300.0, th_normal_cos=0.88,
            edge_gate2=600.0**2, inf_label=float(ng),
        )
    ) * 1e3

    # ONE lax.sort of the same operands (the sort-once alternative)
    @jax.jit
    def sort9(label, payload):
        ops = (label,) + tuple(payload[:, i] for i in range(8))
        return lax.sort(ops, num_keys=1, is_stable=True)[0]

    out["sort9_ms"] = timed(lambda: sort9(label, payload)) * 1e3

    # sync-overhead floor: a trivial op at the same rep count
    @jax.jit
    def tiny(x):
        return x + 1

    xs = jnp.zeros((8,), jnp.float32)
    out["tiny_op_ms"] = timed(lambda: tiny(xs)) * 1e3

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
