"""Behavioral-parity report: device pipeline vs the golden oracle.

The BASELINE north-star correctness criterion is per-point label parity
vs the reference CPU binary on building scans; the golden oracle
(buildingsegment_tpu/seg/golden.py) is the bit-faithful stand-in for
that binary (SURVEY.md §4).  This tool runs both the oracle and the
device pipeline (signed-normal strict mode AND the default
orientation-robust mode) over a suite of synthetic scenes and prints a
JSON report of agreement metrics.

Usage: python tools/parity_report.py [--quick]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _best_bijection_agreement(a, b):
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
    return good / max(len(a), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer/smaller scenes")
    args = ap.parse_args()

    import jax.numpy as jnp

    from buildingsegment_tpu.ops.knn import knn
    from buildingsegment_tpu.ops.normals import estimate_normals
    from buildingsegment_tpu.seg.golden import golden_segment
    from buildingsegment_tpu.seg.region_grow import segment_planes
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    scenes = [
        # (name, kwargs) — roofs+ground are the reference's stable
        # domain; the full house includes the vertical-wall orientation
        # pathology where the reference itself is order-dependent
        ("roofs_ground", dict(seed=5, spacing_mm=150.0, noise_mm=10.0, walls=False)),
        ("full_house", dict(seed=3, spacing_mm=150.0, noise_mm=10.0)),
    ]
    if not args.quick:
        scenes += [
            ("dense_roofs", dict(seed=8, spacing_mm=100.0, noise_mm=8.0, walls=False)),
            ("noisy_house", dict(seed=9, spacing_mm=150.0, noise_mm=20.0)),
        ]

    report = []
    for name, kw in scenes:
        pts, truth = make_building_cloud(**kw)
        n = len(pts)
        cap = ((n + 511) // 512) * 512
        pos = np.full((cap, 3), 2**24, np.int32)
        pos[:n] = pts
        mask = np.zeros(cap, bool)
        mask[:n] = True
        pj, mj = jnp.asarray(pos), jnp.asarray(mask)
        idx, d = knn(pj, mj, k=16)
        normals, _ = estimate_normals(pj, mj, idx, d, radius=1e9, max_nn=16)

        g_idx, g_planes = golden_segment(
            pts, np.asarray(normals)[:n].astype(np.float64),
            np.asarray(idx)[:n, :15],
        )
        entry = {"scene": name, "points": n, "golden_planes": len(g_planes)}
        for mode, signed in (("signed", True), ("unsigned", False)):
            res = segment_planes(
                pj, normals, idx[:, :15], mj,
                th_point_count=400, signed_normals=signed,
            )
            d_idx = np.asarray(res.plane_idx)[:n]
            labeled = g_idx > 0
            entry[f"{mode}_planes"] = int(res.num_planes)
            entry[f"{mode}_agreement_all"] = round(
                _best_bijection_agreement(g_idx, d_idx), 4
            )
            if labeled.any():
                entry[f"{mode}_agreement_on_golden_labeled"] = round(
                    _best_bijection_agreement(g_idx[labeled], d_idx[labeled]), 4
                )
            entry[f"{mode}_truth_agreement"] = round(
                _best_bijection_agreement(truth, d_idx), 4
            )
        report.append(entry)
        print(json.dumps(entry), flush=True)

    # --- the BASELINE correctness scene: UNMODIFIED DEFAULT_CONFIG at
    # reference-like density (~50 mm spacing; reference constants
    # radius=100/max_nn=50/K=15/th=300/0.88/400) through the PRODUCTION
    # window+multigrid pipeline vs the golden oracle ---
    from buildingsegment_tpu.config import DEFAULT_CONFIG
    from buildingsegment_tpu.pipeline import run_device_pipeline

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
    idx, d = knn(pj, mj, k=51)
    normals, _ = estimate_normals(pj, mj, idx, d, radius=100.0, max_nn=50)
    g_idx, g_planes = golden_segment(
        np.asarray(pts), np.asarray(normals)[:n].astype(np.float64),
        np.asarray(idx)[:n, :15],
    )
    cfg = DEFAULT_CONFIG
    _, _, seg = run_device_pipeline(
        pj, mj, k_search=max(cfg.knn_k_pad, cfg.normal_max_nn),
        knn_k=cfg.knn_k, normal_radius=cfg.normal_radius,
        normal_max_nn=cfg.normal_max_nn, th_thickness=cfg.th_thickness,
        th_normal_cos=cfg.th_normal_cos, th_point_count=cfg.th_point_count,
        max_planes=cfg.max_planes, max_sweeps=cfg.max_sweeps,
        knn_method="window", knn_window_size=cfg.knn_window,
        convergence_tol=cfg.seg_convergence_tol, seg_group=cfg.seg_group,
        seg_levels=cfg.seg_levels, seg_refine_sweeps=cfg.seg_refine_sweeps,
    )
    d_idx = np.asarray(seg.plane_idx)[:n]
    ref_entry = {
        "scene": "reference_default_50mm",
        "points": n,
        "golden_planes": len(g_planes),
        "device_planes": int(seg.num_planes),
        "production_agreement": round(_best_bijection_agreement(g_idx, d_idx), 4),
        "production_truth_agreement": round(
            _best_bijection_agreement(truth, d_idx), 4
        ),
    }
    report.append(ref_entry)
    print(json.dumps(ref_entry), flush=True)

    ok = all(
        e.get("signed_agreement_on_golden_labeled", 0) > 0.9
        for e in report
        if e["scene"].endswith("ground") or e["scene"].startswith("dense")
    ) and ref_entry["production_agreement"] >= 0.9
    print(json.dumps({"summary": "PASS" if ok else "CHECK", "scenes": len(report)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
