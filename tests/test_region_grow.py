"""Region-growing tests: invariants, golden-oracle agreement, colors."""

import jax.numpy as jnp
import numpy as np
import pytest

from buildingsegment_tpu.ops.knn import knn
from buildingsegment_tpu.ops.normals import estimate_normals
from buildingsegment_tpu.seg.colorize import MsvcRand, colorize_planes, msvc_rand_colors
from buildingsegment_tpu.seg.golden import golden_segment
from buildingsegment_tpu.seg.region_grow import segment_planes
from buildingsegment_tpu.utils.synthetic import make_building_cloud


def _pad(pts, capacity):
    n = pts.shape[0]
    pos = np.full((capacity, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return jnp.asarray(pos), jnp.asarray(mask), n


def _prep(pts, capacity, k=15):
    pos, mask, n = _pad(pts, capacity)
    idx, d = knn(pos, mask, k=k, query_tile=512, cand_tile=512)
    normals, _ = estimate_normals(pos, mask, idx, d, radius=1e9, max_nn=k)
    return pos, mask, idx, normals, n


def _agreement(a, b):
    """Fraction of points where the best label bijection agrees."""
    la, lb = np.asarray(a), np.asarray(b)
    n = len(la)
    pairs = {}
    for x, y in zip(la, lb):
        pairs[(x, y)] = pairs.get((x, y), 0) + 1
    used_a, used_b, good = set(), set(), 0
    for (x, y), c in sorted(pairs.items(), key=lambda kv: -kv[1]):
        if x in used_a or y in used_b:
            continue
        used_a.add(x)
        used_b.add(y)
        good += c
    return good / n


@pytest.fixture(scope="module")
def building():
    pts, truth = make_building_cloud(seed=3, spacing_mm=150.0, noise_mm=10.0)
    cap = ((len(pts) + 511) // 512) * 512
    return pts, truth, cap


@pytest.fixture(scope="module")
def building_solved(building):
    """One shared default-config solve (the CPU solve is ~20 s; three
    tests assert different properties of the same result)."""
    pts, truth, cap = building
    pos, mask, idx, normals, n = _prep(pts, cap)
    res = segment_planes(pos, normals, idx, mask, th_point_count=400)
    return res, n


class TestSegmentPlanes:
    @pytest.mark.slow
    def test_recovers_synthetic_planes(self, building, building_solved):
        pts, truth, cap = building
        res, n = building_solved
        plane_idx = np.asarray(res.plane_idx)[:n]
        num = int(res.num_planes)
        # the house has 7 planes (4 walls, 2 roof pitches, ground)
        assert 5 <= num <= 9
        agree = _agreement(truth, plane_idx)
        # measured 0.983 with anchor-pure models (th_anchor_cos=0.95);
        # pinned at measured-minus-margin so estimator regressions show
        assert agree > 0.95, f"truth agreement {agree}"

    def test_invariants(self, building_solved):
        res, n = building_solved
        plane_idx = np.asarray(res.plane_idx)
        num = int(res.num_planes)
        counts = np.asarray(res.plane_count)
        # ids dense 1..P or -1
        labels = set(np.unique(plane_idx[:n])) - {-1}
        assert labels == set(range(1, num + 1))
        # every accepted plane strictly exceeds the size threshold
        assert (counts[:num] > 400).all()
        assert (counts[num:] == 0).all()
        # padded points unlabeled
        assert (plane_idx[n:] == -1).all()
        # plane normals unit length
        nrm = np.asarray(res.plane_normal)[:num]
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-4)

    def test_members_near_plane_model(self, building, building_solved):
        pts, truth, cap = building
        res, n = building_solved
        plane_idx = np.asarray(res.plane_idx)[:n]
        centers = np.asarray(res.plane_center)
        nrms = np.asarray(res.plane_normal)
        p = pts.astype(np.float64)
        for pid in range(1, int(res.num_planes) + 1):
            sel = plane_idx == pid
            d = np.abs((p[sel] - centers[pid - 1]) @ nrms[pid - 1])
            # members should hug the final plane model (th=300, noise=10)
            assert np.quantile(d, 0.95) < 350

    def test_agreement_with_golden_oracle_stable_domain(self):
        # apples-to-apples on the reference's stable domain (roof +
        # ground planes; vertical walls excluded because the signed ±Z
        # orientation there is ill-posed and the oracle's drifting mean
        # produces order-dependent merges — SURVEY.md §7 hard part 1)
        pts, truth = make_building_cloud(
            seed=5, spacing_mm=150.0, noise_mm=10.0, walls=False
        )
        cap = ((len(pts) + 511) // 512) * 512
        pos, mask, idx, normals, n = _prep(pts, cap)
        g_idx, g_planes = golden_segment(
            pts, np.asarray(normals)[:n].astype(np.float64),
            np.asarray(idx)[:n],
        )
        res = segment_planes(
            pos, normals, idx, mask, th_point_count=400, signed_normals=True
        )
        d_idx = np.asarray(res.plane_idx)[:n]
        # identical structure
        assert int(res.num_planes) == len(g_planes)
        # on points the oracle labels, the bijection must agree almost
        # everywhere.  (The oracle leaves ~5-10% of plane points
        # unlabeled through the reference's failed-seed label leak —
        # quirk 2, SURVEY.md §2.1.1 — which a parallel algorithm
        # deliberately does not reproduce, so whole-cloud agreement is
        # bounded by that leak rate.)
        labeled = g_idx > 0
        agree = _agreement(g_idx[labeled], d_idx[labeled])
        assert agree > 0.97, f"golden agreement on labeled points {agree}"
        # the device labels a superset: few oracle-labeled points missed
        assert (d_idx[labeled] == -1).mean() < 0.02

    def test_agreement_with_golden_oracle_full_house(self, building):
        # Full house incl. walls, decomposed per surface kind.
        #
        # Measured (anchor-pure models, th_anchor_cos=0.95): overall
        # 0.897; roof pitches 0.998/0.995, ground 0.998; walls 0.91 /
        # 0.71 / 0.43 / 0.82.  The wall spread is the ORACLE's doing,
        # not ours: with signed (reference) semantics the ±Z normal
        # orientation on vertical walls is noise-random, and the
        # oracle's drifting running mean then chains ACROSS
        # perpendicular walls — on this scene its plane 8 spans three
        # different walls (1099 + 1500 + 724 points on truth surfaces
        # 2/3/4), so a per-wall bijection against it is capped well
        # below 1.0 by construction (SURVEY.md §2.1.1, quirk 1).  The
        # device result keeps walls separate (gated by
        # test_unsigned_beats_golden_on_walls + test_truth at 0.95);
        # here walls are covered only by the overall bound.
        pts, truth, cap = building
        pos, mask, idx, normals, n = _prep(pts, cap)
        g_idx, g_planes = golden_segment(
            pts, np.asarray(normals)[:n].astype(np.float64),
            np.asarray(idx)[:n],
        )
        res = segment_planes(
            pos, normals, idx, mask, th_point_count=400, signed_normals=True
        )
        d_idx = np.asarray(res.plane_idx)[:n]
        agree = _agreement(g_idx, d_idx)
        assert agree > 0.85, f"golden agreement {agree}"
        # stable-orientation surfaces: roof pitches (5, 6) + ground (7)
        for sid in (5, 6, 7):
            sel = truth == sid
            a = _agreement(g_idx[sel], d_idx[sel])
            assert a > 0.97, f"surface {sid} golden agreement {a}"

    def test_unsigned_beats_golden_on_walls(self, building):
        # the unsigned default must recover walls the signed reference
        # semantics cannot (ground-truth agreement strictly better)
        pts, truth, cap = building
        pos, mask, idx, normals, n = _prep(pts, cap)
        res_u = segment_planes(pos, normals, idx, mask, th_point_count=400)
        res_s = segment_planes(
            pos, normals, idx, mask, th_point_count=400, signed_normals=True
        )
        au = _agreement(truth, np.asarray(res_u.plane_idx)[:n])
        as_ = _agreement(truth, np.asarray(res_s.plane_idx)[:n])
        assert au >= as_

    def test_capacity_diagnostics(self, building):
        # the A2 sanitizers: silently-deferred work must show up in
        # SegmentationResult.diagnostics instead of vanishing
        pts, truth, cap = building
        pos, mask, idx, normals, n = _prep(pts, cap)
        res = segment_planes(pos, normals, idx, mask, th_point_count=400)
        d = np.asarray(res.diagnostics)
        assert d[0] > 0  # live labels were tracked
        assert d[2] == 0 and d[3] == 0  # healthy run: counters quiet
        # plane-table overflow: max_planes=2 cannot hold the ~7 planes
        res2 = segment_planes(
            pos, normals, idx, mask, th_point_count=400, max_planes=2
        )
        d2 = np.asarray(res2.diagnostics)
        assert int(res2.num_planes) > 2
        assert d2[2] == int(res2.num_planes) - 2
        assert d2[1] > 0  # merge-table cap L=2 exceeded mid-solve
        # forced non-convergence at max_sweeps=1
        res3 = segment_planes(
            pos, normals, idx, mask, th_point_count=400, max_sweeps=1
        )
        assert np.asarray(res3.diagnostics)[3] == 1

    def test_empty_cloud(self):
        pos = jnp.full((512, 3), 2**24, jnp.int32)
        mask = jnp.zeros(512, bool)
        normals = jnp.zeros((512, 3), jnp.float32)
        idx = jnp.tile(jnp.arange(512, dtype=jnp.int32)[:, None], (1, 15))
        res = segment_planes(pos, normals, idx, mask)
        assert int(res.num_planes) == 0
        assert (np.asarray(res.plane_idx) == -1).all()

    @pytest.mark.slow
    def test_curvature_gate_prunes_seeds(self, building):
        pts, truth, cap = building
        pos, mask, idx, normals, n = _prep(pts, cap)
        from buildingsegment_tpu.ops.normals import estimate_normals
        from buildingsegment_tpu.ops.knn import knn

        i2, d2 = knn(pos, mask, k=16, query_tile=512, cand_tile=512)
        _, curv = estimate_normals(pos, mask, i2, d2, radius=1e9, max_nn=16)
        # an impossible cap kills every seed → no planes
        res = segment_planes(
            pos, normals, idx, mask, th_point_count=400,
            curvature=curv, th_seed_curvature=-1.0,
        )
        assert int(res.num_planes) == 0
        # a generous cap changes nothing vs ungated
        res2 = segment_planes(
            pos, normals, idx, mask, th_point_count=400,
            curvature=curv, th_seed_curvature=1.0,
        )
        res3 = segment_planes(pos, normals, idx, mask, th_point_count=400)
        assert int(res2.num_planes) == int(res3.num_planes)

    def test_noise_cloud_no_planes(self, rng):
        pts = rng.integers(0, 30_000, size=(2000, 3)).astype(np.int32)
        pos, mask, idx, normals, n = _prep(pts, 2048)
        res = segment_planes(pos, normals, idx, mask, th_point_count=400)
        assert int(res.num_planes) == 0


class TestGoldenOracle:
    def test_small_plane_rejected(self, rng):
        # a tiny flat patch (< 400 pts) must be reset to -1
        pts, _ = make_building_cloud(
            seed=1, spacing_mm=400.0, width_mm=3000.0, depth_mm=3000.0,
            wall_h_mm=2000.0, ridge_h_mm=2500.0, ground=False,
        )
        n = len(pts)
        assert n < 400
        pos, mask, idx, normals, _ = _prep(pts, 512)
        g_idx, g_planes = golden_segment(
            pts, np.asarray(normals)[:n].astype(np.float64), np.asarray(idx)[:n]
        )
        assert len(g_planes) == 0
        # quirk 2 (SURVEY.md §2.1.1): neighbors stamped during failed
        # seed attempts leak label 1 (the never-incremented id); no
        # other id can appear
        assert set(np.unique(g_idx)) <= {-1, 1}

    def test_accepted_plane_ids_dense(self, building):
        pts, truth, cap = building
        pos, mask, idx, normals, n = _prep(pts, cap)
        g_idx, g_planes = golden_segment(
            pts, np.asarray(normals)[:n].astype(np.float64), np.asarray(idx)[:n]
        )
        ids = [p.id for p in g_planes]
        assert ids == list(range(1, len(ids) + 1))
        for p in g_planes:
            assert len(p.point_idx) > 400


class TestColorize:
    def test_msvc_rand_known_sequence(self):
        # first values of the MSVC CRT rand() from seed 1 (well-known)
        r = MsvcRand(1)
        assert [r() for _ in range(5)] == [41, 18467, 6334, 26500, 19169]

    def test_color_table_values(self):
        t = msvc_rand_colors(2)
        # 55 + [41,18467,6334,26500,19169,15724] % 200
        np.testing.assert_array_equal(
            t, [[96, 122, 189], [155, 224, 179]]
        )

    def test_unlabeled_black(self):
        plane_idx = np.array([-1, 1, 2, -1])
        c = colorize_planes(plane_idx, 2)
        np.testing.assert_array_equal(c[0], [0, 0, 0])
        np.testing.assert_array_equal(c[3], [0, 0, 0])
        assert (c[1] >= 55).all() and (c[2] >= 55).all()
