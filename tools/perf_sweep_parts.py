"""Per-COMPONENT timing of the coarse-solve sweep at ng ≈ 67k.

perf_sweep_lab measures the whole-sweep slope (~5 ms); this tool times
each piece of ``region_grow.window_body`` as an isolated jit so the
5 ms can be attributed: the [ng,16] stats scatter-add, the cumsum-rank
compaction, model gathers, make_slab + label_sweep kernel, the [L,L]
pair tests, the parent scatter-mins, jump-doubling gathers, and the
final apply gather.  Isolated jits lose cross-op fusion, so treat the
numbers as upper bounds per piece and trust their RATIOS.

Run on the real chip:  python tools/perf_sweep_parts.py
"""

import json
import time

import numpy as np


def _sync(out):
    leaf = out[0] if isinstance(out, tuple) else out
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, *a, reps=20):
    out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.ops.prefix import prefix_sum_i32
    from buildingsegment_tpu.ops.window_sweep import (
        label_sweep, make_slab, pick_tile,
    )

    ng = 67 * 1024
    L = 1024
    inf_label = ng
    rng = np.random.default_rng(0)

    # mid-solve label distribution: ~200 big regions + 30% singletons
    big = rng.integers(0, 200, ng).astype(np.int32) * 331 % ng
    single = np.arange(ng, dtype=np.int32)
    is_single = rng.random(ng) < 0.3
    label = jnp.asarray(np.where(is_single, single, big))
    pos = jnp.asarray(rng.uniform(0, 15000, (ng, 3)).astype(np.float32))
    nrm_np = rng.normal(size=(ng, 3)).astype(np.float32)
    nrm_np /= np.linalg.norm(nrm_np, axis=1, keepdims=True)
    nrm = jnp.asarray(nrm_np)
    mask = jnp.ones((ng,), bool)
    out = {}

    # 1. stats scatter-add [ng+1, C]
    @jax.jit
    def stats8(label):
        valid = label < inf_label
        tgt = jnp.where(valid, label, ng)
        payload = jnp.concatenate(
            [jnp.ones((ng, 1), jnp.float32), nrm, pos,
             jnp.sum(pos * pos, -1, keepdims=True)], axis=1)
        return (jnp.zeros((ng + 1, 8), jnp.float32).at[tgt].add(
            jnp.where(valid[:, None], payload, 0.0)))[:ng]

    acc = stats8(label)
    out["stats_scatter8"] = timed(stats8, label)

    # 1b. sort-based segment sum: multi-operand sort by label + boundary
    @jax.jit
    def stats_sorted(label):
        valid = label < inf_label
        tgt = jnp.where(valid, label, ng)
        payload = [jnp.ones((ng,), jnp.float32), nrm[:, 0], nrm[:, 1],
                   nrm[:, 2], pos[:, 0], pos[:, 1], pos[:, 2],
                   jnp.sum(pos * pos, -1)]
        srt = lax.sort([tgt] + payload, num_keys=1)
        slab = srt[0]
        csums = [jnp.cumsum(p) for p in srt[1:]]
        # segment end = last row of each label run
        is_end = jnp.concatenate(
            [slab[1:] != slab[:-1], jnp.ones((1,), bool)])
        # per-label sums at run ends: cum[end] - cum[start-1]
        # → scatter run-end cumsums by label
        accs = []
        for cs in csums:
            tab = jnp.zeros((ng + 1,), jnp.float32).at[
                jnp.where(is_end, slab, ng)].set(cs)
            accs.append(tab[:ng])
        # subtract previous-run cumsum: prefix over labels present…
        # (timing proxy only — the subtraction needs one more gather)
        return jnp.stack(accs, 1)

    out["stats_sorted8"] = timed(stats_sorted, label)

    # 2. compaction: prefix rank + slot scatter
    @jax.jit
    def compact(acc):
        cnt = acc[:, 0]
        flag = cnt > 0
        rank = prefix_sum_i32(flag.astype(jnp.int32))
        slot_of = jnp.where(flag & (rank <= L), rank - 1, L)
        top_lab = (jnp.full((L + 1,), -1, jnp.int32).at[slot_of]
                   .set(jnp.arange(ng, dtype=jnp.int32)))[:L]
        return top_lab, rank

    top_lab, rank = compact(acc)
    out["compaction"] = timed(lambda a: compact(a)[0], acc)

    # 3. model gathers [ng,3] ×2 + slab + kernel
    @jax.jit
    def models(acc, label):
        sc = jnp.maximum(acc[:, 0], 1.0)[:, None]
        model_n = acc[:, 1:4] / sc
        model_c = acc[:, 4:7] / sc
        safe = jnp.clip(label, 0, ng - 1)
        has = label < inf_label
        mpn = jnp.where(has[:, None], model_n[safe], 0.0)
        mpc = jnp.where(has[:, None], model_c[safe], 0.0)
        return mpn, mpc

    mpn, mpc = models(acc, label)
    out["model_gathers"] = timed(lambda: models(acc, label))

    ws, tile = 16, pick_tile(ng)
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    nx_, ny_, nz_ = nrm[:, 0], nrm[:, 1], nrm[:, 2]

    @jax.jit
    def sweep(label, mpn, mpc):
        slab = make_slab(
            [px, py, pz, nx_, ny_, nz_, mpn[:, 0], mpn[:, 1], mpn[:, 2],
             mpc[:, 0], mpc[:, 1], mpc[:, 2],
             label.astype(jnp.float32), mask.astype(jnp.float32)],
            [-3e7, -3e7, -3e7] + [0.0] * 9 + [float(ng), 0.0],
            ws, tile)
        return label_sweep(
            slab, ng, w=ws, tile=tile, th_thickness=300.0,
            th_normal_cos=0.88, edge_gate2=360000.0,
            inf_label=float(ng), signed=False)

    new_f, best_f = sweep(label, mpn, mpc)
    out["slab_plus_label_sweep"] = timed(lambda: sweep(label, mpn, mpc))

    # 4b. [L,L] pair tests
    @jax.jit
    def pairs(acc, top_lab):
        rows = acc[top_lab]
        sc = jnp.maximum(rows[:, 0], 1.0)[:, None]
        n_tab = rows[:, 1:4] / sc
        c_tab = rows[:, 4:7] / sc
        nc = jnp.sum(n_tab * c_tab, -1)
        ncT = jnp.dot(n_tab, c_tab.T,
                      precision=lax.Precision.HIGHEST)
        nrm_sep = ncT - nc[:, None]
        cosab = jnp.abs(jnp.dot(n_tab, n_tab.T,
                                precision=lax.Precision.HIGHEST))
        ccd = jnp.sum(c_tab * c_tab, -1)
        d2 = ccd[:, None] + ccd[None, :] - 2.0 * jnp.dot(
            c_tab, c_tab.T, precision=lax.Precision.HIGHEST)
        ok = (jnp.abs(nrm_sep) <= 300.0) & (cosab >= 0.88) & (d2 < 1e12)
        la = jnp.broadcast_to(top_lab[:, None], (L, L))
        lb = jnp.broadcast_to(top_lab[None, :], (L, L))
        pair_lo = jnp.where(ok & (la != lb), jnp.minimum(la, lb),
                            inf_label)
        return jnp.min(pair_lo, axis=1)

    row_min = pairs(acc, top_lab)
    out["pair_tests"] = timed(lambda: pairs(acc, top_lab))

    # 4a+4b'. parent scatter-mins ×2
    idx_arange = jnp.arange(ng, dtype=jnp.int32)
    best = best_f.astype(jnp.int32)

    @jax.jit
    def hooks(label, best, row_min, top_lab):
        parent = (jnp.concatenate([idx_arange, jnp.array([inf_label])])
                  .at[jnp.where(best < inf_label, label, ng)]
                  .min(best))[:ng]
        parent = (jnp.concatenate([parent, jnp.array([inf_label])])
                  .at[jnp.where(row_min < inf_label, top_lab, ng)]
                  .min(row_min))[:ng]
        return parent

    parent = hooks(label, best, row_min, top_lab)
    out["parent_scatters_x2"] = timed(
        lambda: hooks(label, best, row_min, top_lab))

    # 4c. jump-doubling gathers ×2 + apply gather
    @jax.jit
    def jumps(parent, new):
        pf = parent
        for _ in range(2):
            pf = jnp.minimum(pf, pf[jnp.clip(pf, 0, ng - 1)])
        return jnp.where(new < inf_label,
                         pf[jnp.clip(new, 0, ng - 1)], new)

    new = new_f.astype(jnp.int32)
    _ = jumps(parent, new)
    out["jump2_plus_apply"] = timed(lambda: jumps(parent, new))

    out = {k: round(v * 1e3, 3) for k, v in out.items()}
    out["sum_ms"] = round(sum(
        v for k, v in out.items()
        if k not in ("stats_sorted8",)
    ), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
