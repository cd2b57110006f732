"""Full TPU-code-path equivalence on CPU (BST_FORCE_TPU_PATH).

``use_device_kernels()`` normally routes CPU runs to the XLA fallback
branches; with ``BST_FORCE_TPU_PATH=1`` the REAL TPU branches run
instead, with every Pallas kernel in interpreter mode.  This pins the
kernel WIRING of the production path — table packing, finalize
merge/adopt fold-back, refine sweeps — against the XLA fallback,
which no kernel-level oracle test can do.

jax.clear_caches() between the two runs: the branch is chosen at
trace time, and the jit key does not include the env var.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buildingsegment_tpu.core.morton import morton_argsort
from buildingsegment_tpu.ops.knn import knn_window_sorted
from buildingsegment_tpu.ops.normals import estimate_normals_window
from buildingsegment_tpu.utils.quality import bij_agreement
from buildingsegment_tpu.utils.synthetic import make_building_cloud

pytestmark = pytest.mark.slow  # interpreter-mode sweeps are slow


@pytest.fixture(scope="module")
def problem():
    pts, truth = make_building_cloud(
        seed=1, spacing_mm=300.0, width_mm=10_000.0, depth_mm=8_000.0,
        wall_h_mm=5_000.0, ridge_h_mm=6_500.0, noise_mm=8.0,
    )
    n = len(pts)
    cap = ((n + 2047) // 2048) * 2048
    pos = np.full((cap, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(cap, bool)
    mask[:n] = True
    order = morton_argsort(jnp.asarray(pos), jnp.asarray(mask))
    spos = jnp.asarray(pos)[order]
    smask = jnp.asarray(mask)[order]
    sposf = spos.astype(jnp.float32)
    nb_i, nb_d = knn_window_sorted(sposf, smask, 16, window=32)
    normals, _ = estimate_normals_window(sposf, smask, radius=600.0,
                                         window=32)
    struth = np.full(cap, -1)
    struth[:n] = truth
    return (spos, smask, nb_i, nb_d, normals,
            struth[np.asarray(order)], n)


def _solve(problem):
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid

    spos, smask, nb_i, nb_d, normals, struth, _ = problem
    res = segment_planes_multigrid(
        spos, normals, nb_i, smask,
        neigh_sq_dist=nb_d, max_edge_dist=900.0,
        th_point_count=120, max_planes=1024, window=16,
        group=4, levels=2, refine_sweeps=2,
        spacing_hint_mm=256.0,
    )
    return (np.asarray(res.plane_idx), int(res.num_planes))


def test_forced_kernel_path_matches_xla(problem, monkeypatch):
    labels_xla, np_xla = _solve(problem)
    jax.clear_caches()
    monkeypatch.setenv("BST_FORCE_TPU_PATH", "1")
    try:
        labels_k, np_k = _solve(problem)
    finally:
        jax.clear_caches()  # don't leak kernel-path traces to others
    struth = problem[5]
    valid = np.asarray(problem[1])
    assert np_k == np_xla
    # the two paths round differently (matmul vs scatter addition
    # order) so membership at gate boundaries may flip; demand
    # near-perfect cross-agreement plus equal truth agreement
    cross = bij_agreement(labels_xla[valid], labels_k[valid])
    assert cross >= 0.99, cross
    ag_x = bij_agreement(struth[valid], labels_xla[valid])
    ag_k = bij_agreement(struth[valid], labels_k[valid])
    assert abs(ag_x - ag_k) < 0.01, (ag_x, ag_k)
    assert ag_k >= 0.9, ag_k
