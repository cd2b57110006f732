"""One-number chip probe: knn_pallas with BST_KNN_VCAP set (visit
table truncated to V rows/step).  INEXACT if any tile's count exceeds
V (max at 25 mm bench scene: 218 < 256) — perf attribution only:
isolates the per-grid-step meta block DMA (num_c strided 32 B rows).

Run:  BST_KNN_VCAP=256 PALLAS_AXON_POOL_IPS= \
          python tools/tpu_run.py knn_vcap_probe
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from perf_knn_lab import _sync, timed  # noqa: E402


def main():
    import jax.numpy as jnp

    from buildingsegment_tpu.cli import _enable_compile_cache
    from buildingsegment_tpu.core.morton import morton_argsort
    from buildingsegment_tpu.ops.pallas_knn import knn_pallas
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    _enable_compile_cache()
    pts, _ = make_building_cloud(
        seed=0, spacing_mm=25.0, width_mm=12_000.0, depth_mm=9_000.0,
        wall_h_mm=6_000.0, ridge_h_mm=8_000.0, noise_mm=8.0,
    )
    n = -(-len(pts) // 2048) * 2048
    pos = np.full((n, 3), 2**24, np.int32)
    pos[: len(pts)] = pts
    mask = np.zeros(n, bool)
    mask[: len(pts)] = True
    pos_j, mask_j = jnp.asarray(pos), jnp.asarray(mask)
    order = morton_argsort(pos_j, mask_j)
    spos, smask = pos_j[order], mask_j[order]

    vcap = os.environ.get("BST_KNN_VCAP", "0")
    dt = timed(lambda: knn_pallas(spos, smask, k=16))
    print(json.dumps({
        "points": n, "vcap": vcap,
        "mpts": round(n / dt / 1e6, 3), "ms": round(dt * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
