"""Fine-grained stage attribution for ONE multiscan iteration.

perf_multiscan2 times segment_files() whole; its per-scan ``timings``
lump everything after dispatch into ``colorize_host`` (which starts
with the blocking label fetch, i.e. it includes the device wait).
This tool executes one scan's stages by hand with a timer around each:

  read_ply → host shift → upload(+sync) → dispatch → device wait
  (1-elem fetch) → full label fetch → epilogue fetch → colorize →
  write_ply → render (dispatch+fetch+encode)

Run on the real chip:  python tools/perf_ms_parts.py
"""

import dataclasses
import json
import os
import tempfile
import time

import numpy as np


def main():
    import jax

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.core.pointset import PointBatch
    from buildingsegment_tpu.io.ply import (
        HostPointCloud, read_ply, write_ply,
    )
    from buildingsegment_tpu.pipeline import (
        _bucket_capacity, _dispatch_device,
        _prepare_upload,
    )
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    config = PipelineConfig()
    tmp = tempfile.mkdtemp(prefix="bst_msparts_")
    pts, _ = make_building_cloud(
        seed=0, spacing_mm=25.0, width_mm=12_000.0, depth_mm=9_000.0,
        wall_h_mm=6_000.0, ridge_h_mm=8_000.0, noise_mm=8.0,
    )
    scan = os.path.join(tmp, "scan.ply")
    write_ply(HostPointCloud(positions=pts), scan, position_scale=1e-3)

    out = {"points": len(pts)}

    def once(record):
        t = {}

        def clk(name, fn):
            t0 = time.perf_counter()
            r = fn()
            t[name] = round(time.perf_counter() - t0, 4)
            return r

        cloud = clk("read_ply", lambda: read_ply(
            scan, position_scale=config.position_scale))
        cfg = dataclasses.replace(
            config, pad_to_multiple=_bucket_capacity(cloud.count, config)
        )
        out["capacity"] = cfg.padded_count(cloud.count)

        lo_h = cloud.positions.min(axis=0).astype(np.int32)
        shifted_h = clk("host_shift", lambda: (
            cloud.positions - lo_h[None, :]).astype(np.int32))

        def _upload():
            b = PointBatch.upload(
                shifted_h, capacity=cfg.padded_count(cloud.count))
            np.asarray(b.positions[0, 0])  # true sync (tunnel ignores BUR)
            return b

        batch = clk("upload_sync", _upload)
        shifted, lo, seg = clk("dispatch", lambda: _dispatch_device(
            batch, cfg, False))
        from buildingsegment_tpu.pipeline import (
            _pack_finish, _unpack_finish,
        )

        packed16 = _pack_finish(seg)
        clk("device_wait_1elem", lambda: np.asarray(packed16[0]))
        # raster dispatched BEFORE the big fetch (production order) so
        # its compute can overlap the host epilogue
        from buildingsegment_tpu.raster.ortho import (
            dispatch_ortho, finish_ortho,
        )

        rast, true_ext = clk("render_dispatch", lambda: dispatch_ortho(
            shifted_h, shifted, batch.mask, config))
        packed_h = clk("fetch_packed", lambda: np.asarray(packed16))
        capacity = seg.plane_idx.shape[0]
        labels_h, epi = _unpack_finish(
            packed_h, capacity, seg.plane_count.shape[0])

        from buildingsegment_tpu.seg.colorize import colorize_planes
        n = cloud.count
        plane_idx = labels_h[:n].astype(np.int32)
        colors = clk("colorize", lambda: colorize_planes(
            plane_idx, epi[0], low=config.color_low,
            rng_range=config.color_range))

        out_cloud = HostPointCloud(positions=shifted_h, colors=colors)
        clk("write_ply", lambda: write_ply(
            out_cloud, os.path.join(tmp, "out.ply"),
            position_scale=config.output_scale, ascii=False))

        clk("render_finish", lambda: finish_ortho(
            rast, true_ext, os.path.join(tmp, "render"), config))

        if record:
            out["stages_s"] = t
            out["sum_s"] = round(sum(t.values()), 3)

    # warm every jit bucket; the remote-compile helper SIGKILLs on big
    # programs a few % of the time — retry, compile progress is cached
    for a in range(8):
        try:
            once(record=False)
            break
        except Exception as e:
            if "remote_compile" not in str(e) or a == 7:
                raise
            time.sleep(min(10 + 5 * a, 40))
    once(record=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
