"""End-to-end pipeline + CLI tests (golden end-to-end of SURVEY.md §4)."""

import os

import numpy as np
import pytest

from buildingsegment_tpu.cli import main as cli_main
from buildingsegment_tpu.config import PipelineConfig
from buildingsegment_tpu.io.ply import HostPointCloud, read_ply, write_ply
from buildingsegment_tpu.pipeline import segment_cloud, segment_file
from buildingsegment_tpu.utils.synthetic import make_building_cloud


@pytest.fixture(scope="module")
def scan_file(tmp_path_factory):
    """A synthetic house scan written as an ascii PLY in METERS."""
    pts_mm, truth = make_building_cloud(seed=7, spacing_mm=200.0, noise_mm=10.0)
    path = tmp_path_factory.mktemp("scans") / "house.ply"
    cloud = HostPointCloud(positions=pts_mm)
    # write at 0.001 scale → meters in the file; reading at 1000 recovers mm
    write_ply(cloud, str(path), position_scale=0.001, ascii=True)
    return str(path), pts_mm, truth


# synthetic spacing is 200 mm — reference's 100 mm normal radius has no
# neighbors at that spacing, so widen it for the tests
_CFG = PipelineConfig(normal_radius=1e6, pad_to_multiple=512)


@pytest.mark.slow
class TestSegmentCloud:
    def test_finds_planes(self, scan_file):
        _, pts_mm, truth = scan_file
        out = segment_cloud(HostPointCloud(positions=pts_mm), _CFG)
        assert 5 <= out.num_planes <= 9
        assert out.plane_idx.shape == (len(pts_mm),)
        assert (out.plane_counts > 400).all()
        # colors: labeled points get the plane color, unlabeled black
        labeled = out.plane_idx > 0
        assert (out.cloud.colors[labeled] >= 55).all()
        assert (out.cloud.colors[~labeled] == 0).all()

    def test_window_fast_path_on_dense_scan(self):
        # the Morton-window fast path is the large/dense-scan
        # production path; on its design regime it must recover the
        # true plane decomposition (sparse scans fall back to the
        # exact brute path via knn_method="auto")
        pts_mm, truth = make_building_cloud(
            seed=7, spacing_mm=80.0, noise_mm=8.0
        )
        cfg = PipelineConfig(pad_to_multiple=2048, knn_method="window")
        out = segment_cloud(HostPointCloud(positions=pts_mm), cfg)
        assert 6 <= out.num_planes <= 9
        lw = out.plane_idx
        assert (lw > 0).mean() > 0.9
        pairs = {}
        for a, b in zip(truth, lw):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
        ua, ub, good = set(), set(), 0
        for (a, b), c in sorted(pairs.items(), key=lambda kv: -kv[1]):
            if a in ua or b in ub:
                continue
            ua.add(a)
            ub.add(b)
            good += c
        assert good / len(lw) > 0.9

    def test_output_positions_are_shifted(self, scan_file):
        _, pts_mm, _ = scan_file
        shifted_input = pts_mm - pts_mm.min(axis=0)
        out = segment_cloud(HostPointCloud(positions=pts_mm), _CFG)
        np.testing.assert_array_equal(out.cloud.positions.min(axis=0), [0, 0, 0])
        np.testing.assert_array_equal(out.cloud.positions, shifted_input)


class TestSegmentFile:
    @pytest.mark.slow
    def test_file_to_file(self, scan_file, tmp_path):
        in_path, pts_mm, _ = scan_file
        out_path = str(tmp_path / "labeled.ply")
        out = segment_file(in_path, out_path, _CFG)
        assert os.path.exists(out_path)
        rt = read_ply(out_path)
        assert rt.count == len(pts_mm)
        # binary float64 + gbr colors header
        head = open(out_path, "rb").read(300)
        assert b"binary_little_endian" in head
        assert b"property float64 x" in head
        assert head.index(b"uchar green") < head.index(b"uchar blue") < head.index(b"uchar red")
        # some plane colors present
        assert (rt.colors.max(axis=0) >= 55).any()

    def test_missing_input_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            segment_file(str(tmp_path / "nope.ply"), str(tmp_path / "o.ply"), _CFG)

    @pytest.mark.slow
    def test_dedup_bits_through_segment_file(self, scan_file, tmp_path):
        """--dedup-bits path: duplicated input collapses back to the
        unique points (reference capability PCCPointSet.h:457-472,
        VERDICT r3 item 9)."""
        import dataclasses

        in_path, pts_mm, _ = scan_file
        dup_path = str(tmp_path / "dup.ply")
        # duplicate every point once (identical quantized coordinates)
        write_ply(
            HostPointCloud(positions=np.concatenate([pts_mm, pts_mm])),
            dup_path, position_scale=0.001, ascii=True,
        )
        out_path = str(tmp_path / "labeled.ply")
        cfg = dataclasses.replace(_CFG, dedup_bits=0)
        out = segment_file(dup_path, out_path, cfg)
        assert out.cloud.count == len(pts_mm)
        rt = read_ply(out_path)
        assert rt.count == len(pts_mm)


class TestCli:
    @pytest.mark.slow
    def test_reference_argv_contract(self, scan_file, tmp_path, capsys):
        in_path, pts_mm, _ = scan_file
        out_path = str(tmp_path / "out.ply")
        rc = cli_main(
            [f"-a={in_path}", f"-s={out_path}", "--normal-radius", "1e6"]
        )
        assert rc == 0
        assert os.path.exists(out_path)
        captured = capsys.readouterr()
        assert "planes" in captured.out

    def test_missing_args(self, capsys):
        assert cli_main([]) == 2

    def test_missing_file(self, tmp_path, capsys):
        rc = cli_main([f"-a={tmp_path}/x.ply", f"-s={tmp_path}/y.ply"])
        assert rc == 1

    @pytest.mark.slow
    def test_render_dir(self, scan_file, tmp_path):
        in_path, _, _ = scan_file
        out_path = str(tmp_path / "out.ply")
        render = str(tmp_path / "renders")
        rc = cli_main(
            [
                f"-a={in_path}",
                f"-s={out_path}",
                "--normal-radius",
                "1e6",
                "--render-dir",
                render,
            ]
        )
        assert rc == 0
        files = os.listdir(render)
        assert "平均高度.png" in files
        assert "像素数量.png" in files
        assert "像素数量+高度.png" in files


@pytest.mark.slow
class TestReferenceDefaultParity:
    """VERDICT round-1 item 6: the configuration that defines parity —
    UNMODIFIED DEFAULT_CONFIG (radius=100, max_nn=50, K=15, th=300/0.88/
    400, tmc3/my_function.h:63,117-118, TMC3.cpp:215) on a ~50 mm-
    spacing scan — through both the golden oracle and the production
    device pipeline."""

    def test_golden_agreement_at_reference_defaults(self):
        import jax.numpy as jnp

        from buildingsegment_tpu.config import DEFAULT_CONFIG
        from buildingsegment_tpu.ops.knn import knn
        from buildingsegment_tpu.ops.normals import estimate_normals
        from buildingsegment_tpu.pipeline import run_device_pipeline
        from buildingsegment_tpu.seg.golden import golden_segment
        from buildingsegment_tpu.utils.synthetic import make_building_cloud

        # roofs+ground: the reference's well-posed domain (vertical
        # walls hit its documented +-Z orientation pathology where the
        # binary itself is order-dependent, SURVEY.md §2.1.1)
        pts, truth = make_building_cloud(
            seed=6, spacing_mm=50.0, width_mm=4000.0, depth_mm=3000.0,
            wall_h_mm=2500.0, ridge_h_mm=3200.0, noise_mm=5.0, walls=False,
        )
        n = len(pts)
        cap = ((n + 1023) // 1024) * 1024
        pos = np.full((cap, 3), 2**24, np.int32)
        pos[:n] = pts
        mask = np.zeros(cap, bool)
        mask[:n] = True
        pj, mj = jnp.asarray(pos), jnp.asarray(mask)

        # golden side: exact kNN graph + reference-faithful hybrid
        # normals (the Open3D stand-in)
        idx, d = knn(pj, mj, k=51)
        normals, _ = estimate_normals(pj, mj, idx, d, radius=100.0, max_nn=50)
        g_idx, g_planes = golden_segment(
            np.asarray(pts),
            np.asarray(normals)[:n].astype(np.float64),
            np.asarray(idx)[:n, :15],
        )

        cfg = DEFAULT_CONFIG  # UNMODIFIED — this is the point
        _, _, seg = run_device_pipeline(
            pj, mj,
            k_search=max(cfg.knn_k_pad, cfg.normal_max_nn),
            knn_k=cfg.knn_k, normal_radius=cfg.normal_radius,
            normal_max_nn=cfg.normal_max_nn,
            th_thickness=cfg.th_thickness, th_normal_cos=cfg.th_normal_cos,
            th_point_count=cfg.th_point_count, max_planes=cfg.max_planes,
            max_sweeps=cfg.max_sweeps, knn_method="window",
            knn_window_size=cfg.knn_window,
            convergence_tol=cfg.seg_convergence_tol,
            seg_group=cfg.seg_group, seg_levels=cfg.seg_levels,
            seg_refine_sweeps=cfg.seg_refine_sweeps,
        )
        d_idx = np.asarray(seg.plane_idx)[:n]

        def bij(a, b):
            pairs = {}
            for x, y in zip(a.tolist(), b.tolist()):
                pairs[(x, y)] = pairs.get((x, y), 0) + 1
            ua, ub, good = set(), set(), 0
            for (x, y), c in sorted(pairs.items(), key=lambda kv: -kv[1]):
                if x in ua or y in ub:
                    continue
                ua.add(x)
                ub.add(y)
                good += c
            return good / len(a)

        assert len(g_planes) == 3
        assert int(seg.num_planes) == 3
        agreement = bij(g_idx, d_idx)
        assert agreement >= 0.9, agreement  # BASELINE correctness gate
        assert bij(truth, d_idx) >= 0.95
