"""Multi-scan batch pipeline + stage-dump + profiling tests."""

import json
import os

import numpy as np
import pytest

from buildingsegment_tpu.cli import main as cli_main
from buildingsegment_tpu.config import PipelineConfig
from buildingsegment_tpu.io.ply import HostPointCloud, read_ply, write_ply
from buildingsegment_tpu.pipeline import (
    _bucket_capacity,
    dump_stages,
    segment_cloud,
    segment_files,
)
from buildingsegment_tpu.profiling import StageTimer, summarize
from buildingsegment_tpu.utils.synthetic import make_building_cloud

pytestmark = pytest.mark.slow

_CFG = PipelineConfig(normal_radius=1e6, pad_to_multiple=512)


@pytest.fixture(scope="module")
def scan_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scans")
    for i, seed in enumerate((1, 2)):
        pts, _ = make_building_cloud(
            seed=seed, spacing_mm=250.0, noise_mm=10.0
        )
        write_ply(
            HostPointCloud(positions=pts),
            str(d / f"scan{i}.ply"),
            position_scale=0.001,
            ascii=True,
        )
    return str(d)


def test_bucket_capacity_eighth_octave():
    cfg = PipelineConfig(pad_to_multiple=512)
    assert _bucket_capacity(1000, cfg) == 1024
    assert _bucket_capacity(1025, cfg) == 1536  # padded_count rounds up
    assert _bucket_capacity(100, cfg) == 512
    cfg2 = PipelineConfig(pad_to_multiple=1024)
    # just past a power of two: ≤ 12.5% padding, not 2×
    b = _bucket_capacity(1_082_304, cfg2)
    assert b == 1_179_648 and b % 1024 == 0  # 9/8 × 2^20
    for n in (1, 777, 4097, 300_000, 2**21):
        b = _bucket_capacity(n, cfg2)
        assert b >= n and b % cfg2.pad_to_multiple == 0
        # small n: the pad_to_multiple rounding inside padded_count
        # dominates (≤ ~25%); at scale the eighth-octave grid holds
        assert b <= max(1.26 * n, cfg2.pad_to_multiple)
        if n >= 100 * cfg2.pad_to_multiple:
            assert b <= 1.14 * n


def test_pack_finish_roundtrip():
    """_pack_finish/_unpack_finish: labels + f32 epilogue survive the
    one-fetch int16 packing bit-exactly."""
    import jax.numpy as jnp

    from buildingsegment_tpu.pipeline import (
        _pack_finish, _unpack_finish,
    )
    from buildingsegment_tpu.seg.region_grow import SegmentationResult

    rng = np.random.default_rng(0)
    cap, p = 2048, 64
    seg = SegmentationResult(
        plane_idx=jnp.asarray(
            rng.integers(-1, 30000, cap).astype(np.int32)
        ),
        num_planes=jnp.int32(17),
        plane_normal=jnp.asarray(
            rng.normal(size=(p, 3)).astype(np.float32)
        ),
        plane_center=jnp.asarray(
            (rng.uniform(0, 2**24, (p, 3))).astype(np.float32)
        ),
        plane_count=jnp.asarray(rng.integers(0, 1 << 23, p), jnp.int32),
        num_sweeps=jnp.int32(9),
        diagnostics=jnp.asarray([5, 0, 2, 1], jnp.int32),
    )
    labels, (num_planes, diag, cnt, nrm, ctr) = _unpack_finish(
        np.asarray(_pack_finish(seg)), cap, p
    )
    np.testing.assert_array_equal(
        labels, np.asarray(seg.plane_idx, np.int16)
    )
    assert num_planes == 17
    np.testing.assert_array_equal(diag, [5, 0, 2, 1])
    np.testing.assert_array_equal(cnt, np.asarray(seg.plane_count))
    np.testing.assert_array_equal(nrm, np.asarray(seg.plane_normal))
    np.testing.assert_array_equal(ctr, np.asarray(seg.plane_center))


def test_segment_files(scan_dir, tmp_path):
    inputs = sorted(
        os.path.join(scan_dir, f) for f in os.listdir(scan_dir)
    )
    outs = [str(tmp_path / os.path.basename(p)) for p in inputs]
    results = segment_files(inputs, outs, _CFG)
    assert len(results) == 2
    for out_path, r in zip(outs, results):
        assert os.path.exists(out_path)
        assert r.num_planes >= 5
        rt = read_ply(out_path)
        assert rt.count == r.cloud.count


def test_cli_batch(scan_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    rc = cli_main(
        ["--batch", scan_dir, out_dir, "--normal-radius", "1e6",
         "--json-summary"]
    )
    assert rc == 0
    files = os.listdir(out_dir)
    assert len([f for f in files if f.endswith(".ply")]) == 2
    captured = capsys.readouterr().out
    summary = json.loads(captured.strip().splitlines()[-1])
    assert summary["scans"] == 2
    assert all(p >= 5 for p in summary["planes"])


def test_cli_batch_empty_dir(tmp_path, capsys):
    rc = cli_main(["--batch", str(tmp_path), str(tmp_path / "o")])
    assert rc == 1


def test_dump_stages(tmp_path):
    pts, _ = make_building_cloud(seed=3, spacing_mm=300.0, noise_mm=10.0)
    out = segment_cloud(HostPointCloud(positions=pts), _CFG)
    p = str(tmp_path / "stages.npz")
    dump_stages(out, p)
    data = np.load(p)
    np.testing.assert_array_equal(data["plane_idx"], out.plane_idx)
    assert data["num_planes"] == out.num_planes
    assert data["plane_normals"].shape == (out.num_planes, 3)


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert set(t.times) == {"a", "b"}
    assert t.mpoints_per_sec(1_000_000) > 0
    s = json.loads(summarize(t.times, 500))
    assert s["points"] == 500
