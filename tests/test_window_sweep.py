"""Pallas window-sweep kernels vs the XLA sweeps — exact equality.

The kernels only run on TPU in production (CPU keeps the XLA path);
these tests pin kernel↔XLA equality in interpreter mode so a kernel
regression cannot silently diverge the TPU pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buildingsegment_tpu.core.morton import morton_sort
from buildingsegment_tpu.ops.window_sweep import (
    build_plane_table,
    label_sweep,
    make_slab,
    pick_tile,
    refine_table_sweep,
    seed_sweep,
)
from buildingsegment_tpu.utils.synthetic import make_building_cloud


@pytest.fixture(scope="module")
def scene():
    pts, _ = make_building_cloud(seed=9, spacing_mm=140.0, noise_mm=10.0)
    n = len(pts)
    cap = ((n + 1023) // 1024) * 1024
    pos = np.full((cap, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(cap, bool)
    mask[:n] = True
    spos, smask, _ = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
    posf = spos.astype(jnp.float32)
    # quick unit normals via a crude local estimate (exact values are
    # irrelevant — the sweeps must agree on WHATEVER inputs)
    rng = np.random.default_rng(0)
    nrm = rng.normal(size=(cap, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm[:, 2] = np.abs(nrm[:, 2]) + 1.0
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return posf, jnp.asarray(nrm.astype(np.float32)), smask, cap


def _pad1(a, fill, w):
    f = jnp.full((w,), fill, a.dtype)
    return jnp.concatenate([f, a, f])


class TestRefineTableSweep:
    def _xla_ref(self, pos, nrm, mask, pid0, pn, pc, *, w, th, cth, eg2,
                 max_planes, clean, adopt, n_live):
        """XLA formulation matching seg/coarse.py's CPU path."""
        from jax import lax

        n = pos.shape[0]
        px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
        nx, ny, nz = nrm[:, 0], nrm[:, 1], nrm[:, 2]
        b_tab = jnp.sum(pn * pc, axis=-1)
        # ids beyond the live bound never match in the kernel
        alive = (pid0 >= 1) & (pid0 <= n_live)

        def model_of(pid, ok_extra):
            t = jnp.clip(pid - 1, 0, max_planes - 1)
            has = (pid > 0) & mask & ok_extra
            mnp = jnp.where(has[:, None], pn[t], 0.0)
            mb = jnp.where(has, b_tab[t], 0.0)
            return mnp, mb, has

        mnp0, mb0, has0 = model_of(pid0, alive)
        self_ok = (
            has0
            & (jnp.abs(px * mnp0[:, 0] + py * mnp0[:, 1]
                       + pz * mnp0[:, 2] - mb0) <= th)
            & (jnp.abs(nx * mnp0[:, 0] + ny * mnp0[:, 1]
                       + nz * mnp0[:, 2]) >= cth)
        )
        pid = jnp.where(self_ok if clean else has0, pid0, 0)
        if not adopt:
            return pid

        mnp_, mb_, _ = model_of(pid, jnp.ones_like(mask))
        big = jnp.int32(max_planes + 1)
        ppid = _pad1(pid, 0, w)
        pmnx = _pad1(mnp_[:, 0], 0.0, w)
        pmny = _pad1(mnp_[:, 1], 0.0, w)
        pmnz = _pad1(mnp_[:, 2], 0.0, w)
        pmb = _pad1(mb_, 0.0, w)
        ppx = _pad1(px, -3e7, w)
        ppy = _pad1(py, -3e7, w)
        ppz = _pad1(pz, -3e7, w)
        best = jnp.full((n,), big, jnp.int32)
        for slot in range(2 * w):
            start = slot if slot < w else slot + 1
            sl = lambda a: lax.slice(a, (start,), (start + n,))
            dx = px - sl(ppx)
            dy = py - sl(ppy)
            dz = pz - sl(ppz)
            near = dx * dx + dy * dy + dz * dz <= eg2
            cmnx, cmny, cmnz = sl(pmnx), sl(pmny), sl(pmnz)
            d = jnp.abs(px * cmnx + py * cmny + pz * cmnz - sl(pmb))
            c = jnp.abs(nx * cmnx + ny * cmny + nz * cmnz)
            cpid = sl(ppid)
            ok = (
                (cpid > 0) & near & mask
                & (d <= th) & (c >= cth)
            )
            best = jnp.minimum(best, jnp.where(ok, cpid, big))
        return jnp.where(pid > 0, pid, jnp.where(best < big, best, 0))

    @pytest.mark.parametrize("clean,adopt", [
        (True, True), (False, True), (True, False),
    ])
    def test_matches_xla(self, scene, clean, adopt):
        pos, nrm, mask, n = scene
        w = 16
        rng = np.random.default_rng(1)
        max_planes = 256
        n_live = 140  # exercises the two-chunk live bound
        pid = jnp.asarray(
            rng.integers(0, n_live + 1, size=(n,)).astype(np.int32)
        )
        pn = rng.normal(size=(max_planes, 3)).astype(np.float32)
        pn /= np.linalg.norm(pn, axis=1, keepdims=True)
        pc = rng.uniform(0, 10000, size=(max_planes, 3)).astype(np.float32)
        pn, pc = jnp.asarray(pn), jnp.asarray(pc)
        th, cth, eg2 = 300.0, 0.88, 600.0**2

        want = self._xla_ref(
            pos, nrm, mask, pid, pn, pc, w=w, th=th, cth=cth, eg2=eg2,
            max_planes=max_planes, clean=clean, adopt=adopt,
            n_live=n_live,
        )
        tile = pick_tile(n, 1024)
        slab = make_slab(
            [pos[:, 0], pos[:, 1], pos[:, 2],
             nrm[:, 0], nrm[:, 1], nrm[:, 2],
             pid.astype(jnp.float32), mask.astype(jnp.float32)],
            [-3e7, -3e7, -3e7, 0.0, 0.0, 0.0, 0.0, 0.0],
            w, tile, rows_out=8,
        )
        got = refine_table_sweep(
            slab, n, build_plane_table(pn, pc), jnp.int32(n_live),
            w=w, tile=tile, th_thickness=th,
            th_normal_cos=cth, edge_gate2=eg2,
            big_pid=float(max_planes + 1),
            clean=clean, adopt=adopt, interpret=True,
        ).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestPairSlabVariants:
    """spine+dyn pair kernels must equal their single-slab originals."""

    def test_refine_pair_matches_single(self, scene):
        from buildingsegment_tpu.ops.window_sweep import (
            make_dyn_row,
            make_spine,
            refine_table_sweep_pair,
        )

        pos, nrm, mask, n = scene
        w = 16
        rng = np.random.default_rng(2)
        max_planes = 256
        n_live = 140
        pid = jnp.asarray(
            rng.integers(0, n_live + 1, size=(n,)).astype(np.int32)
        )
        pn = rng.normal(size=(max_planes, 3)).astype(np.float32)
        pn /= np.linalg.norm(pn, axis=1, keepdims=True)
        pc = rng.uniform(0, 10000, size=(max_planes, 3)).astype(np.float32)
        pn, pc = jnp.asarray(pn), jnp.asarray(pc)
        tile = pick_tile(n, 1024)
        table = build_plane_table(pn, pc)
        kw = dict(
            w=w, tile=tile, th_thickness=300.0, th_normal_cos=0.88,
            edge_gate2=600.0**2, big_pid=float(max_planes + 1),
            clean=True, adopt=True, interpret=True,
        )
        slab = make_slab(
            [pos[:, 0], pos[:, 1], pos[:, 2],
             nrm[:, 0], nrm[:, 1], nrm[:, 2],
             pid.astype(jnp.float32), mask.astype(jnp.float32)],
            [-3e7, -3e7, -3e7, 0.0, 0.0, 0.0, 0.0, 0.0],
            w, tile, rows_out=8,
        )
        want = refine_table_sweep(
            slab, n, table, jnp.int32(n_live), **kw
        )
        spine = make_spine(
            (pos[:, 0], pos[:, 1], pos[:, 2]),
            (nrm[:, 0], nrm[:, 1], nrm[:, 2]),
            mask.astype(jnp.float32), w, tile,
        )
        dyn = make_dyn_row(pid.astype(jnp.float32), 0.0, w, tile)
        got = refine_table_sweep_pair(
            spine, dyn, n, table, jnp.int32(n_live), **kw
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_seed_pair_matches_single(self, scene):
        from buildingsegment_tpu.ops.window_sweep import (
            make_dyn_row,
            make_spine,
            seed_sweep_pair,
        )

        pos, nrm, mask, n = scene
        w = 16
        tile = pick_tile(n, 1024)
        dk = jnp.full((n,), 500.0**2, jnp.float32)
        slab = make_slab(
            [pos[:, 0], pos[:, 1], pos[:, 2],
             nrm[:, 0], nrm[:, 1], nrm[:, 2],
             dk, mask.astype(jnp.float32)],
            [-3e7, -3e7, -3e7, 0.0, 0.0, 0.0, 0.0, 0.0],
            w, tile, rows_out=8,
        )
        kw = dict(w=w, tile=tile, th_thickness=300.0,
                  th_normal_cos=0.88, interpret=True)
        want = seed_sweep(slab, n, **kw)
        spine = make_spine(
            (pos[:, 0], pos[:, 1], pos[:, 2]),
            (nrm[:, 0], nrm[:, 1], nrm[:, 2]),
            mask.astype(jnp.float32), w, tile,
        )
        dyn = make_dyn_row(dk, 0.0, w, tile)
        got = seed_sweep_pair(spine, dyn, n, **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # signed=True repeats the whole interpret-mode sweep for the rarely
    # used signed gate — slow-suite only (default run keeps [False])
    @pytest.mark.parametrize(
        "signed", [False, pytest.param(True, marks=pytest.mark.slow)]
    )
    def test_seed_sym_matches_pair(self, scene, signed):
        """Symmetry-halved kernel ≡ the 2w-shift kernel, including
        per-point (non-constant) balls — the B direction reads the
        candidate's ball at a shifted offset — and multi-tile grids
        (pairs crossing tile boundaries exercise the halo hand-off)."""
        from buildingsegment_tpu.ops.window_sweep import (
            make_dyn_row,
            make_spine,
            seed_sweep_pair,
        )

        pos, nrm, mask, n = scene
        rng = np.random.default_rng(3)
        dk = jnp.asarray(
            rng.uniform(100.0, 900.0, size=n).astype(np.float32) ** 2
        )
        for w, tile_target in [(16, 1024), (16, 512), (8, 256)]:
            tile = pick_tile(n, tile_target)
            spine = make_spine(
                (pos[:, 0], pos[:, 1], pos[:, 2]),
                (nrm[:, 0], nrm[:, 1], nrm[:, 2]),
                mask.astype(jnp.float32), w, tile,
            )
            dyn = make_dyn_row(dk, 0.0, w, tile)
            kw = dict(w=w, tile=tile, th_thickness=300.0,
                      th_normal_cos=0.88, signed=signed, interpret=True)
            want = seed_sweep_pair(spine, dyn, n, sym=False, **kw)
            got = seed_sweep_pair(spine, dyn, n, sym=True, **kw)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestSeedSweep:
    def test_matches_window_seeds(self, scene):
        pos, nrm, mask, n = scene
        from buildingsegment_tpu.seg.region_grow import window_seeds

        dk = jnp.full((n,), 500.0**2, jnp.float32)
        ref = window_seeds(pos, nrm, mask, dk, window=16)

        w = 16
        tile = pick_tile(n, 1024)
        slab = make_slab(
            [pos[:, 0], pos[:, 1], pos[:, 2],
             nrm[:, 0], nrm[:, 1], nrm[:, 2],
             dk, mask.astype(jnp.float32)],
            [-3e7, -3e7, -3e7, 0.0, 0.0, 0.0, 0.0, 0.0],
            w, tile, rows_out=8,
        )
        got_bad = seed_sweep(
            slab, n,
            w=w, tile=tile, th_thickness=300.0,
            th_normal_cos=0.88, interpret=True,
        )
        got = mask & (got_bad < 0.5)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestLabelSweep:
    def test_matches_xla_window_body_sweep(self, scene):
        pos, nrm, mask, n = scene
        w = 16
        rng = np.random.default_rng(2)
        inf_label = n
        lab = jnp.asarray(
            np.where(
                rng.random(n) < 0.3,
                rng.integers(0, n, size=n),
                inf_label,
            ).astype(np.int32)
        )
        mpn = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        mpc = jnp.asarray(
            rng.uniform(0, 10000, size=(n, 3)).astype(np.float32)
        )
        th, cth, eg2 = 300.0, 0.88, 600.0**2
        from jax import lax

        px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
        nx, ny, nz = nrm[:, 0], nrm[:, 1], nrm[:, 2]
        mnx, mny, mnz = mpn[:, 0], mpn[:, 1], mpn[:, 2]
        mcx, mcy, mcz = mpc[:, 0], mpc[:, 1], mpc[:, 2]
        P = {
            "px": _pad1(px, -3e7, w), "py": _pad1(py, -3e7, w),
            "pz": _pad1(pz, -3e7, w),
            "nx": _pad1(nx, 0.0, w), "ny": _pad1(ny, 0.0, w),
            "nz": _pad1(nz, 0.0, w),
            "mnx": _pad1(mnx, 0.0, w), "mny": _pad1(mny, 0.0, w),
            "mnz": _pad1(mnz, 0.0, w),
            "mcx": _pad1(mcx, 0.0, w), "mcy": _pad1(mcy, 0.0, w),
            "mcz": _pad1(mcz, 0.0, w),
            "lab": _pad1(lab, inf_label, w),
            "mask": _pad1(mask, False, w),
        }
        has = lab < inf_label
        new = lab
        best = jnp.full((n,), inf_label, jnp.int32)
        for slot in range(2 * w):
            start = slot if slot < w else slot + 1
            sl = lambda a: lax.slice(a, (start,), (start + n,))
            dx = px - sl(P["px"])
            dy = py - sl(P["py"])
            dz = pz - sl(P["pz"])
            near = (dx * dx + dy * dy + dz * dz <= eg2) & sl(P["mask"]) & mask
            clab = sl(P["lab"])
            cmnx, cmny, cmnz = sl(P["mnx"]), sl(P["mny"]), sl(P["mnz"])
            cmcx, cmcy, cmcz = sl(P["mcx"]), sl(P["mcy"]), sl(P["mcz"])
            d = jnp.abs(
                (px - cmcx) * cmnx + (py - cmcy) * cmny + (pz - cmcz) * cmnz
            )
            c = jnp.abs(nx * cmnx + ny * cmny + nz * cmnz)
            hop_ok = (clab < inf_label) & near & (d <= th) & (c >= cth)
            new = jnp.minimum(new, jnp.where(hop_ok, clab, inf_label))
            dcx, dcy, dcz = cmcx - mcx, cmcy - mcy, cmcz - mcz
            mutual = (
                (jnp.abs(dcx * mnx + dcy * mny + dcz * mnz) <= th)
                & (jnp.abs(dcx * cmnx + dcy * cmny + dcz * cmnz) <= th)
                & (jnp.abs(mnx * cmnx + mny * cmny + mnz * cmnz) >= cth)
            )
            mrg_ok = has & (clab < lab) & near & mutual
            best = jnp.minimum(best, jnp.where(mrg_ok, clab, inf_label))

        tile = pick_tile(n, 1024)
        slab = make_slab(
            [px, py, pz, nx, ny, nz, mnx, mny, mnz, mcx, mcy, mcz,
             lab.astype(jnp.float32), mask.astype(jnp.float32)],
            [-3e7, -3e7, -3e7] + [0.0] * 9 + [float(inf_label), 0.0],
            w, tile,
        )
        got_new, got_best = label_sweep(
            slab, n,
            w=w, tile=tile, th_thickness=th,
            th_normal_cos=cth, edge_gate2=eg2,
            inf_label=float(inf_label), interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got_new).astype(np.int32), np.asarray(new)
        )
        np.testing.assert_array_equal(
            np.asarray(got_best).astype(np.int32), np.asarray(best)
        )
