"""Multi-building scenes: coplanar-but-separate structures must not merge.

The global coplanar-overlap merge (seg/region_grow.py, seg/coarse.py)
unions fragments of one physical plane but must keep coplanar planes of
DIFFERENT buildings apart via the in-plane separation bound — the
reference's true-kNN growth would never connect them either.
"""

import numpy as np
import pytest

from buildingsegment_tpu.config import PipelineConfig
from buildingsegment_tpu.io.ply import HostPointCloud
from buildingsegment_tpu.pipeline import segment_cloud
from buildingsegment_tpu.utils.synthetic import make_building_cloud

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def two_houses():
    a, ta = make_building_cloud(seed=1, spacing_mm=150.0, noise_mm=8.0)
    b, tb = make_building_cloud(seed=2, spacing_mm=150.0, noise_mm=8.0)
    b = b + np.array([40_000, 0, 0], np.int32)  # 40 m apart
    pts = np.concatenate([a, b])
    truth = np.concatenate([ta, tb + ta.max()])
    return pts, truth


def test_no_cross_building_planes(two_houses):
    pts, truth = two_houses
    cfg = PipelineConfig(
        normal_radius=500.0, pad_to_multiple=2048, knn_method="window"
    )
    out = segment_cloud(HostPointCloud(positions=pts), cfg)
    # ~7 planes per house
    assert 12 <= out.num_planes <= 18
    for pid in range(1, out.num_planes + 1):
        x = pts[out.plane_idx == pid][:, 0]
        assert not (x.min() < 20_000 and x.max() > 35_000), (
            f"plane {pid} spans both buildings"
        )
    # best-bijection ground-truth agreement
    pairs = {}
    for t, l in zip(truth.tolist(), out.plane_idx.tolist()):
        pairs[(t, l)] = pairs.get((t, l), 0) + 1
    ua, ub, good = set(), set(), 0
    for (t, l), c in sorted(pairs.items(), key=lambda kv: -kv[1]):
        if t in ua or l in ub:
            continue
        ua.add(t)
        ub.add(l)
        good += c
    assert good / len(truth) > 0.9
