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
    label_sweep,
    pick_tile,
    refine_sweep,
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


class TestRefineSweep:
    def test_matches_xla(self, scene):
        pos, nrm, mask, n = scene
        w = 16
        rng = np.random.default_rng(1)
        max_planes = 64
        pid = jnp.asarray(
            rng.integers(0, 5, size=(n,)).astype(np.int32)
        )
        pn = rng.normal(size=(max_planes, 3)).astype(np.float32)
        pn /= np.linalg.norm(pn, axis=1, keepdims=True)
        pc = rng.uniform(0, 10000, size=(max_planes, 3)).astype(np.float32)
        pn, pc = jnp.asarray(pn), jnp.asarray(pc)
        t = jnp.clip(pid - 1, 0, max_planes - 1)
        has = pid > 0
        mcp = jnp.where(has[:, None], pc[t], 0.0)
        mnp = jnp.where(has[:, None], pn[t], 0.0)

        px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
        nx, ny, nz = nrm[:, 0], nrm[:, 1], nrm[:, 2]
        th, cth, eg = 300.0, 0.88, 600.0
        big = max_planes + 1

        # XLA reference
        best = jnp.full((n,), big, jnp.int32)
        ppid = _pad1(pid, 0, w)
        arrs = {
            "px": _pad1(px, -3e7, w), "py": _pad1(py, -3e7, w),
            "pz": _pad1(pz, -3e7, w),
            "nx": _pad1(nx, 0.0, w), "ny": _pad1(ny, 0.0, w),
            "nz": _pad1(nz, 0.0, w),
            "mcx": _pad1(mcp[:, 0], 0.0, w), "mcy": _pad1(mcp[:, 1], 0.0, w),
            "mcz": _pad1(mcp[:, 2], 0.0, w),
            "mnx": _pad1(mnp[:, 0], 0.0, w), "mny": _pad1(mnp[:, 1], 0.0, w),
            "mnz": _pad1(mnp[:, 2], 0.0, w),
            "mask": _pad1(mask, False, w),
        }
        from jax import lax

        for slot in range(2 * w):
            start = slot if slot < w else slot + 1
            sl = lambda a: lax.slice(a, (start,), (start + n,))
            dx = px - sl(arrs["px"])
            dy = py - sl(arrs["py"])
            dz = pz - sl(arrs["pz"])
            near = dx * dx + dy * dy + dz * dz <= eg * eg
            cmnx, cmny, cmnz = sl(arrs["mnx"]), sl(arrs["mny"]), sl(arrs["mnz"])
            d = jnp.abs(
                (px - sl(arrs["mcx"])) * cmnx
                + (py - sl(arrs["mcy"])) * cmny
                + (pz - sl(arrs["mcz"])) * cmnz
            )
            c = jnp.abs(nx * cmnx + ny * cmny + nz * cmnz)
            cpid = sl(ppid)
            ok = (
                (cpid > 0) & near & sl(arrs["mask"]) & mask
                & (d <= th) & (c >= cth)
            )
            best = jnp.minimum(best, jnp.where(ok, cpid, big))

        got = refine_sweep(
            arrs["px"], arrs["py"], arrs["pz"], arrs["nx"], arrs["ny"],
            arrs["nz"], arrs["mcx"], arrs["mcy"], arrs["mcz"],
            arrs["mnx"], arrs["mny"], arrs["mnz"],
            ppid.astype(jnp.float32), arrs["mask"].astype(jnp.float32),
            w=w, tile=pick_tile(n, 1024), th_thickness=th,
            th_normal_cos=cth, edge_gate2=eg * eg, big_pid=float(big),
            interpret=True,
        ).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(best))


class TestSeedSweep:
    def test_matches_window_seeds(self, scene):
        pos, nrm, mask, n = scene
        from buildingsegment_tpu.seg.region_grow import window_seeds

        dk = jnp.full((n,), 500.0**2, jnp.float32)
        ref = window_seeds(pos, nrm, mask, dk, window=16)

        w = 16
        got_bad = seed_sweep(
            _pad1(pos[:, 0], -3e7, w), _pad1(pos[:, 1], -3e7, w),
            _pad1(pos[:, 2], -3e7, w),
            _pad1(nrm[:, 0], 0.0, w), _pad1(nrm[:, 1], 0.0, w),
            _pad1(nrm[:, 2], 0.0, w),
            _pad1(dk, 0.0, w),
            _pad1(mask, False, w).astype(jnp.float32),
            w=w, tile=pick_tile(n, 1024), th_thickness=300.0,
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

        got_new, got_best = label_sweep(
            P["px"], P["py"], P["pz"], P["nx"], P["ny"], P["nz"],
            P["mnx"], P["mny"], P["mnz"], P["mcx"], P["mcy"], P["mcz"],
            P["lab"].astype(jnp.float32),
            P["mask"].astype(jnp.float32),
            w=w, tile=pick_tile(n, 1024), th_thickness=th,
            th_normal_cos=cth, edge_gate2=eg2,
            inf_label=float(inf_label), interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got_new).astype(np.int32), np.asarray(new)
        )
        np.testing.assert_array_equal(
            np.asarray(got_best).astype(np.int32), np.asarray(best)
        )
