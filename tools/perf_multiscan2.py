"""Time segment_files() steady-state — the bench's multiscan metric.

Run (TPU):  python tools/perf_multiscan2.py
"""

import faulthandler
import json
import os
import tempfile
import time


def main():
    # hang forensics: dump every thread's stack to stderr every 2 min
    faulthandler.dump_traceback_later(120, repeat=True)
    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.io.ply import HostPointCloud, write_ply
    from buildingsegment_tpu.pipeline import segment_files
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    cfg = PipelineConfig()
    tmp = tempfile.mkdtemp(prefix="bst_ms2_")
    scan_paths, total_pts = [], 0
    for s in range(4):
        spts, _ = make_building_cloud(
            seed=s, spacing_mm=25.0, width_mm=12_000.0, depth_mm=9_000.0,
            wall_h_mm=6_000.0, ridge_h_mm=8_000.0, noise_mm=8.0,
        )
        total_pts += len(spts)
        p = os.path.join(tmp, f"scan{s}.ply")
        write_ply(HostPointCloud(positions=spts), p, position_scale=1e-3)
        scan_paths.append(p)
    out_paths = [os.path.join(tmp, f"out{s}.ply") for s in range(4)]
    render_dir = os.path.join(tmp, "render")

    t0 = time.perf_counter()
    # the remote-compile helper SIGKILLs on big programs a few % of
    # the time — retry the warm pass, compile progress is cached
    for a in range(8):
        try:
            segment_files(scan_paths, out_paths, cfg,
                          render_dir=render_dir)
            break
        except Exception as e:
            if "remote_compile" not in str(e) or a == 7:
                raise
            time.sleep(min(10 + 5 * a, 40))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = segment_files(scan_paths, out_paths, cfg, render_dir=render_dir)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "scans": 4,
        "points": total_pts,
        "warm_s": round(warm, 2),
        "steady_s": round(dt, 3),
        "multiscan_e2e_mpts": round(total_pts / dt / 1e6, 2),
        "scan0_timings": {k: round(v, 4)
                          for k, v in outs[0].timings.items()},
    }))


if __name__ == "__main__":
    main()
