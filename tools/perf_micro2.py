"""Micro-benchmarks v2 — proper tunnel sync (see bench.py _sync)."""

import json

import numpy as np


def _sync(out):
    import jax

    # last leaf: multi-program outputs complete in dispatch order —
    # syncing the first leaf misses the final program (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, reps=10):
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
    key = jax.random.PRNGKey(0)
    dT = jax.random.uniform(key, (n, 128), jnp.float32)

    out["topk15_1Mx128_ms"] = timed(
        functools.partial(jax.jit(lambda d: lax.top_k(-d, 15)), dT)
    ) * 1e3
    out["topk49_1Mx128_ms"] = timed(
        functools.partial(jax.jit(lambda d: lax.top_k(-d, 49)), dT)
    ) * 1e3
    out["sort128_lastaxis_ms"] = timed(
        functools.partial(jax.jit(lambda d: jnp.sort(d, axis=-1)), dT)
    ) * 1e3
    d64 = dT[:, :64]
    out["topk15_1Mx64_ms"] = timed(
        functools.partial(jax.jit(lambda d: lax.top_k(-d, 15)), d64)
    ) * 1e3

    # sort variants with payload
    from buildingsegment_tpu.core.morton import morton_encode

    posi = jax.random.randint(key, (n, 3), 0, 1 << 20, jnp.int32)
    mask = jnp.ones((n,), bool)

    @jax.jit
    def argsort_gather(p, m):
        pc = jnp.clip(p, 0, (1 << 20) - 1)
        lo = morton_encode(pc, shift=0)
        hi = morton_encode(pc, shift=10)
        big = jnp.int32(2**31 - 1)
        hi = jnp.where(m, hi, big)
        o1 = jnp.argsort(lo, stable=True)
        o = o1[jnp.argsort(hi[o1], stable=True)]
        return p[o], m[o], o

    out["argsort_then_gather_ms"] = timed(
        lambda: argsort_gather(posi, mask)
    ) * 1e3

    @jax.jit
    def multisort(p, m):
        pc = jnp.clip(p, 0, (1 << 20) - 1)
        lo = morton_encode(pc, shift=0)
        hi = morton_encode(pc, shift=10)
        big = jnp.int32(2**31 - 1)
        hi = jnp.where(m, hi, big)
        iota = jnp.arange(n, dtype=jnp.int32)
        _, _, x, y, z, m2, o = lax.sort(
            (hi, lo, p[:, 0], p[:, 1], p[:, 2], m, iota),
            num_keys=2, is_stable=True,
        )
        return jnp.stack([x, y, z], -1), m2, o

    out["multioperand_sort_ms"] = timed(lambda: multisort(posi, mask)) * 1e3

    # scatter / jump / pair tables at coarse sizes
    for nc, tag in ((n // 4, "270k"), (n // 16, "65k")):
        lab = jax.random.randint(jax.random.PRNGKey(1), (nc,), 0, nc, jnp.int32)
        cpos = jax.random.uniform(key, (nc, 3), jnp.float32, 0, 12000.0)
        cn = jax.random.normal(key, (nc, 3), jnp.float32)

        @jax.jit
        def stats_scatter(label, p, nrm, nc=nc):
            valid = label < nc
            tgt = jnp.where(valid, label, nc)
            payload = jnp.concatenate(
                [jnp.ones((nc, 1), jnp.float32), nrm, p,
                 jnp.sum(p * p, -1, keepdims=True)], axis=1)
            return (
                jnp.zeros((nc + 1, 8), jnp.float32).at[tgt].add(payload)
            )[:nc]

        out[f"stats_scatter_{tag}_ms"] = timed(
            lambda: stats_scatter(lab, cpos, cn)
        ) * 1e3

        @jax.jit
        def jump8(parent, nc=nc):
            def j(_, p):
                return jnp.minimum(p, p[jnp.clip(p, 0, nc - 1)])
            return lax.fori_loop(0, 8, j, parent)

        parent = jnp.arange(nc, dtype=jnp.int32)
        out[f"jump8_{tag}_ms"] = timed(lambda: jump8(parent)) * 1e3

    # [L, L] pair tables at production L
    for L in (1024, 4096):
        nt = jax.random.normal(key, (L, 3), jnp.float32)
        ct_ = jax.random.uniform(key, (L, 3), jnp.float32, 0, 12000.0)

        @jax.jit
        def pairs(n_tab, c_tab, L=L):
            ncv = jnp.sum(n_tab * c_tab, -1)
            ncT = jnp.dot(n_tab, c_tab.T, preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)
            sep = ncT - ncv[:, None]
            sep_b = ncv[None, :] - ncT.T
            cosab = jnp.abs(jnp.dot(n_tab, n_tab.T,
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.HIGHEST))
            ccd = jnp.sum(c_tab * c_tab, -1)
            d2 = ccd[:, None] + ccd[None, :] - 2.0 * jnp.dot(
                c_tab, c_tab.T, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)
            ok = (jnp.abs(sep) <= 300.) & (jnp.abs(sep_b) <= 300.) & (
                cosab >= .88) & (d2 <= 1e8)
            la = lax.broadcasted_iota(jnp.int32, (L, L), 0)
            lb = lax.broadcasted_iota(jnp.int32, (L, L), 1)
            pl_ = jnp.where(ok & (la != lb), jnp.minimum(la, lb), L)
            return jnp.min(pl_, axis=1)

        out[f"pair_tables_L{L}_ms"] = timed(lambda: pairs(nt, ct_)) * 1e3

    # one refine-style sweep at 1M, component arrays, unrolled
    ws = 16
    px = jax.random.uniform(key, (n,), jnp.float32, 0, 12000.0)
    py = jax.random.uniform(key, (n,), jnp.float32, 0, 12000.0)
    pz = jax.random.uniform(key, (n,), jnp.float32, 0, 9000.0)
    pid = jax.random.randint(key, (n,), 0, 100, jnp.int32)

    @jax.jit
    def sweep(px, py, pz, pid):
        pad = lambda a, f: jnp.concatenate(
            [jnp.full((ws,), f, a.dtype), a, jnp.full((ws,), f, a.dtype)]
        )
        ppx, ppy, ppz, ppid = pad(px, -3e7), pad(py, -3e7), pad(pz, -3e7), pad(pid, 0)
        best = jnp.full((n,), 9999, jnp.int32)
        for slot in range(2 * ws):
            start = slot if slot < ws else slot + 1
            sl = lambda a: lax.slice(a, (start,), (start + n,))
            dx = px - sl(ppx)
            dy = py - sl(ppy)
            dz = pz - sl(ppz)
            near = dx * dx + dy * dy + dz * dz <= 3.6e5
            cpid = sl(ppid)
            best = jnp.minimum(best, jnp.where(near & (cpid > 0), cpid, 9999))
        return best

    out["sweep_w16_components_1M_ms"] = timed(
        lambda: sweep(px, py, pz, pid)
    ) * 1e3

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
