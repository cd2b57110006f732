"""Micro-benchmarks isolating the suspected TPU cost centers.

Findings drive kernel work: is the fused window sweep bound by the
offset loop, the [2W,N] materialization/transpose, or lax.top_k?  Is
the coarse solver bound by the slice sweep, the scatter stats, the
[L,L] pair tables, or the jump-doubling gathers?
"""

import json
import time

import numpy as np



def _sync(out):
    """Force completion: the axon tunnel's block_until_ready is a
    no-op, so synchronize by fetching one element to the host."""
    import jax
    import numpy as np

    # last leaf: multi-program outputs complete in dispatch order —
    # syncing the first leaf misses the final program (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, reps=5):
    """Pipelined steady-state timing: dispatch ``reps`` calls, one
    host sync at the end (sync overhead amortizes as 1/reps)."""
    import time

    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    out = {}
    n = 1 << 20
    w = 64
    w2 = 2 * w
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), jnp.float32, 0, 12000.0)
    mask = jnp.ones((n,), bool)

    # ---- fused sweep pieces ----
    @jax.jit
    def offsets_only(spos, smask):
        ppos = jnp.concatenate(
            [jnp.full((w, 3), -3e7, jnp.float32), spos,
             jnp.full((w, 3), -3e7, jnp.float32)]
        )
        pmask = jnp.concatenate(
            [jnp.zeros(w, bool), smask, jnp.zeros(w, bool)]
        )
        inf = jnp.float32(jnp.inf)

        def one(slot, carry):
            d_all, s0 = carry
            start = jnp.where(slot < w, slot, slot + 1)
            cand = lax.dynamic_slice(ppos, (start, 0), (n, 3))
            cmask = lax.dynamic_slice(pmask, (start,), (n,))
            diff = cand - spos
            d = jnp.sum(diff * diff, -1)
            valid = cmask & smask
            d_all = lax.dynamic_update_slice(
                d_all, jnp.where(valid, d, inf)[None, :], (slot, 0)
            )
            return d_all, s0 + jnp.where(valid & (d < 1e4), 1.0, 0.0)

        def chunk(ci, carry):
            for u in range(8):
                carry = one(ci * 8 + u, carry)
            return carry

        d_all, s0 = lax.fori_loop(
            0, w2 // 8, chunk,
            (jnp.full((w2, n), inf, jnp.float32), jnp.zeros((n,), jnp.float32)),
        )
        return d_all, s0

    out["offsets_only_w128_ms"] = timed(lambda: offsets_only(pos, mask)) * 1e3
    d_all, _ = offsets_only(pos, mask)

    out["topk15_of_dallT_ms"] = timed(
        jax.jit(lambda d: lax.top_k(-d.T, 15))
        .lower(d_all).compile()
    ) * 1e3 if False else timed(
        functools.partial(jax.jit(lambda d: lax.top_k(-d.T, 15)), d_all)
    ) * 1e3
    out["transpose_ms"] = timed(
        functools.partial(jax.jit(lambda d: d.T + 0.0), d_all)
    ) * 1e3
    dT = jnp.asarray(np.asarray(d_all).T)
    out["topk15_pretransposed_ms"] = timed(
        functools.partial(jax.jit(lambda d: lax.top_k(-d, 15)), dT)
    ) * 1e3

    # offsets loop fully unrolled at trace time (no fori)
    @jax.jit
    def offsets_unrolled(spos, smask):
        ppos = jnp.concatenate(
            [jnp.full((w, 3), -3e7, jnp.float32), spos,
             jnp.full((w, 3), -3e7, jnp.float32)]
        )
        pmask = jnp.concatenate(
            [jnp.zeros(w, bool), smask, jnp.zeros(w, bool)]
        )
        inf = jnp.float32(jnp.inf)
        rows = []
        s0 = jnp.zeros((n,), jnp.float32)
        for slot in range(w2):
            start = slot if slot < w else slot + 1
            cand = lax.slice(ppos, (start, 0), (start + n, 3))
            cmask = lax.slice(pmask, (start,), (start + n,))
            diff = cand - spos
            d = jnp.sum(diff * diff, -1)
            valid = cmask & smask
            rows.append(jnp.where(valid, d, inf))
            s0 = s0 + jnp.where(valid & (d < 1e4), 1.0, 0.0)
        return jnp.stack(rows), s0

    out["offsets_unrolled_w128_ms"] = timed(
        lambda: offsets_unrolled(pos, mask)
    ) * 1e3

    # ---- sort variants ----
    from buildingsegment_tpu.core.morton import morton_encode

    posi = (pos).astype(jnp.int32)

    @jax.jit
    def argsort_gather(p, m):
        lo = morton_encode(jnp.clip(p, 0, (1 << 20) - 1), shift=0)
        hi = morton_encode(jnp.clip(p, 0, (1 << 20) - 1), shift=10)
        lo = jnp.where(m, lo, jnp.int32(2**31 - 1))
        hi = jnp.where(m, hi, jnp.int32(2**31 - 1))
        o1 = jnp.argsort(lo, stable=True)
        o = o1[jnp.argsort(hi[o1], stable=True)]
        return p[o], m[o], o

    out["argsort_then_gather_ms"] = timed(
        lambda: argsort_gather(posi, mask)
    ) * 1e3

    @jax.jit
    def multisort(p, m):
        lo = morton_encode(jnp.clip(p, 0, (1 << 20) - 1), shift=0)
        hi = morton_encode(jnp.clip(p, 0, (1 << 20) - 1), shift=10)
        lo = jnp.where(m, lo, jnp.int32(2**31 - 1))
        hi = jnp.where(m, hi, jnp.int32(2**31 - 1))
        iota = jnp.arange(n, dtype=jnp.int32)
        hi2, lo2, x, y, z, m2, o = lax.sort(
            (hi, lo, p[:, 0], p[:, 1], p[:, 2], m, iota),
            num_keys=2, is_stable=True,
        )
        return jnp.stack([x, y, z], -1), m2, o

    out["multioperand_sort_ms"] = timed(lambda: multisort(posi, mask)) * 1e3

    # ---- coarse solver pieces at n/16 ----
    nc = n // 16
    L = 1024
    lab = jax.random.randint(jax.random.PRNGKey(1), (nc,), 0, nc).astype(jnp.int32)
    cpos = jax.random.uniform(key, (nc, 3), jnp.float32, 0, 12000.0)
    cn = jax.random.normal(key, (nc, 3), jnp.float32)

    @jax.jit
    def stats_scatter(label, p, nrm):
        valid = label < nc
        tgt = jnp.where(valid, label, nc)
        payload = jnp.concatenate(
            [jnp.ones((nc, 1), jnp.float32), nrm, p,
             jnp.sum(p * p, -1, keepdims=True)], axis=1)
        return (jnp.zeros((nc + 1, 8), jnp.float32).at[tgt].add(payload))[:nc]

    out["stats_scatter_n65k_ms"] = timed(
        lambda: stats_scatter(lab, cpos, cn)
    ) * 1e3

    @jax.jit
    def pair_tables(acc):
        cnt = acc[:, 0]
        flag = cnt > 0
        rank = jnp.cumsum(flag.astype(jnp.int32))
        slot = jnp.where(flag & (rank <= L), rank - 1, L)
        idx = jnp.arange(nc, dtype=jnp.int32)
        top_lab = (jnp.full((L + 1,), 0, jnp.int32).at[slot].set(idx))[:L]
        live = (jnp.zeros((L + 1,), jnp.bool_).at[slot].set(flag))[:L]
        sc = jnp.maximum(cnt[top_lab], 1.0)[:, None]
        c_tab = acc[:, 4:7][top_lab] / sc
        n_tab = acc[:, 1:4][top_lab] / sc
        ncv = jnp.sum(n_tab * c_tab, -1)
        ncT = jnp.dot(n_tab, c_tab.T, preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)
        sep = ncT - ncv[:, None]
        cosab = jnp.abs(jnp.dot(n_tab, n_tab.T,
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST))
        ccd = jnp.sum(c_tab * c_tab, -1)
        d2 = ccd[:, None] + ccd[None, :] - 2.0 * jnp.dot(
            c_tab, c_tab.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)
        ok = (jnp.abs(sep) <= 300.) & (cosab >= .88) & (d2 <= 1e8) & live[:, None] & live[None, :]
        la = jnp.broadcast_to(top_lab[:, None], (L, L))
        lb = jnp.broadcast_to(top_lab[None, :], (L, L))
        pl_ = jnp.where(ok & (la != lb), jnp.minimum(la, lb), nc)
        return jnp.min(pl_, axis=1), top_lab

    acc = stats_scatter(lab, cpos, cn)
    out["pair_tables_L1024_ms"] = timed(lambda: pair_tables(acc)) * 1e3

    @jax.jit
    def jump8(parent):
        def j(_, p):
            return jnp.minimum(p, p[jnp.clip(p, 0, nc - 1)])
        return lax.fori_loop(0, 8, j, parent)

    parent = jnp.arange(nc, dtype=jnp.int32)
    out["jump8_n65k_ms"] = timed(lambda: jump8(parent)) * 1e3

    # slice sweep at nc with window 16 (32 offsets), fori+unroll8
    ws = 16

    @jax.jit
    def slice_sweep(p, nrm, label):
        pad3 = jnp.zeros((ws, 3), jnp.float32)
        pp = jnp.concatenate([pad3, p, pad3])
        pn = jnp.concatenate([pad3, nrm, pad3])
        plab = jnp.concatenate(
            [jnp.full(ws, nc, jnp.int32), label, jnp.full(ws, nc, jnp.int32)])

        def one(slot, best):
            start = jnp.where(slot < ws, slot, slot + 1)
            cp = lax.dynamic_slice(pp, (start, 0), (nc, 3))
            cn_ = lax.dynamic_slice(pn, (start, 0), (nc, 3))
            cl = lax.dynamic_slice(plab, (start,), (nc,))
            diff = p - cp
            near = jnp.sum(diff * diff, -1) <= 3.6e5
            d = jnp.abs(jnp.sum(diff * cn_, -1))
            ok = near & (d <= 300.0) & (cl < nc)
            return jnp.minimum(best, jnp.where(ok, cl, nc))

        def chunk(ci, best):
            for u in range(8):
                best = one(ci * 8 + u, best)
            return best

        return lax.fori_loop(0, (2 * ws) // 8, chunk, label)

    out["slice_sweep_w16_n65k_ms"] = timed(
        lambda: slice_sweep(cpos, cn, lab)
    ) * 1e3

    # same sweep at full n for refine-cost reference
    lab_n = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, n).astype(jnp.int32)

    @jax.jit
    def slice_sweep_n(p, nrm, label):
        pad3 = jnp.zeros((ws, 3), jnp.float32)
        pp = jnp.concatenate([pad3, p, pad3])
        pn = jnp.concatenate([pad3, nrm, pad3])
        plab = jnp.concatenate(
            [jnp.full(ws, n, jnp.int32), label, jnp.full(ws, n, jnp.int32)])

        def one(slot, best):
            start = jnp.where(slot < ws, slot, slot + 1)
            cp = lax.dynamic_slice(pp, (start, 0), (n, 3))
            cn_ = lax.dynamic_slice(pn, (start, 0), (n, 3))
            cl = lax.dynamic_slice(plab, (start,), (n,))
            diff = p - cp
            near = jnp.sum(diff * diff, -1) <= 3.6e5
            d = jnp.abs(jnp.sum(diff * cn_, -1))
            ok = near & (d <= 300.0) & (cl < n)
            return jnp.minimum(best, jnp.where(ok, cl, n))

        def chunk(ci, best):
            for u in range(8):
                best = one(ci * 8 + u, best)
            return best

        return lax.fori_loop(0, (2 * ws) // 8, chunk, label)

    nrm_n = jax.random.normal(key, (n, 3), jnp.float32)
    out["slice_sweep_w16_n1M_ms"] = timed(
        lambda: slice_sweep_n(pos, nrm_n, lab_n)
    ) * 1e3

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
