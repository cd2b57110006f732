"""Benchmark: the five BASELINE configs on the available device(s).

Prints ONE JSON line (driver contract):
    {"metric": ..., "value": N, "unit": "Mpoints/sec", "vs_baseline": N, ...}

The headline metric is end-to-end segmentation throughput (BASELINE
north star: ≥ 50 Mpoints/sec on a v5e-8; the reference binary publishes
no numbers).  Sub-metrics for the other scored configs ride along as
extra fields:
  - knn_bruteforce_mpts: config 2 (exact brute force, Pallas kernel)
  - knn_window_mpts: the production approximate graph build
  - normals_mpts: config 3 (covariance-PCA normals + curvature)
  - segmentation_mpts: config 4 (region growing alone)
All numbers are steady-state (compile excluded), synthetic ~1M-point
building scene, reference-default thresholds.
"""

import dataclasses
import json
import time

import numpy as np


def _sync(out):
    """Force completion.  jax.block_until_ready is a NO-OP through the
    axon TPU tunnel (verified: a 512 MB transpose 'completes' in
    0.04 ms under it), so synchronize by fetching one element."""
    import jax

    # sync the LAST leaf: with multi-program dispatch (the staged
    # pipeline) the first leaf is a stage-1 output and completes
    # before the final program — syncing it under-counts the last
    # rep's stage 2 (~stage2/reps optimistic bias)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def _warm(fn, *args, attempts=12, **kw):
    """First (compiling) call with retries: the axon remote-compile
    helper is OOM-flaky and dies with 'subprocess exit signal SIGKILL'
    on big programs a few percent of the time — and in bad stretches
    (observed 2026-08-19: two full bench runs lost) several times in a
    row on the SAME program.  Compilation progress is cached
    per-program and per-Mosaic-kernel, so each retry resumes where the
    last died instead of starting over; persistence means a retry is
    cheap and a completed compile never re-pays.  Hence the generous
    attempt budget."""
    for a in range(attempts):
        try:
            return fn(*args, **kw)
        except Exception as e:  # jax.errors.JaxRuntimeError
            if "remote_compile" not in str(e) or a == attempts - 1:
                raise
            time.sleep(min(10 + 5 * a, 45))


def _timed(fn, *args, reps=8, **kw):
    """Pipelined steady-state timing: dispatch ``reps`` calls back to
    back, one host sync at the end (the ~30-100 ms tunnel-sync
    overhead amortizes as 1/reps)."""
    out = _warm(fn, *args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    import os

    import jax
    import jax.numpy as jnp

    # BST_BENCH_QUICK=1: tiny scene, 2 scans, no quality gate — a CPU
    # smoke test of the whole bench flow (autotune wiring, fallback
    # paths, JSON contract), NOT a performance measurement.
    quick = os.environ.get("BST_BENCH_QUICK", "") == "1"
    spacing = 300.0 if quick else 25.0
    n_scans = 2 if quick else 4

    from buildingsegment_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    # A dead TPU client can wedge the terminal's session lock; each
    # backend-init attempt blocks ~25 min then raises UNAVAILABLE.
    # Retry a couple of times so a transient wedge doesn't void the
    # whole run; if the chip stays gone, still emit the contract's one
    # JSON line (value 0) so the outage is recorded, not a crash.
    for attempt in range(3):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if attempt == 2:
                print(json.dumps({
                    "metric": "end_to_end_segmentation_throughput",
                    "value": 0.0,
                    "unit": "Mpoints/sec",
                    "vs_baseline": 0.0,
                    "error": "tpu_backend_unavailable",
                    "detail": str(e)[:200],
                }))
                return
            time.sleep(60)

    from buildingsegment_tpu.config import PipelineConfig
    from buildingsegment_tpu.core.morton import morton_argsort
    from buildingsegment_tpu.dist.mesh import make_mesh
    from buildingsegment_tpu.dist.sharded import sharded_pipeline
    from buildingsegment_tpu.ops.knn import knn_window_sorted
    from buildingsegment_tpu.ops.normals import estimate_normals_window
    from buildingsegment_tpu.ops.pallas_knn import knn_pallas
    from buildingsegment_tpu.seg.region_grow import segment_planes
    from buildingsegment_tpu.utils.synthetic import make_building_cloud

    n_dev = len(jax.devices())

    # ~1M-point dense building scene: 25 mm spacing.  Ground-truth
    # plane ids ride along so the bench reports a correctness number
    # next to the throughput (speed-for-quality trades must be visible
    # in the driver-recorded JSON, not only in the CPU test suite).
    pts, truth = make_building_cloud(
        seed=0,
        spacing_mm=spacing,
        width_mm=12_000.0,
        depth_mm=9_000.0,
        wall_h_mm=6_000.0,
        ridge_h_mm=8_000.0,
        noise_mm=8.0,
    )
    n = len(pts)

    cfg = PipelineConfig(
        pad_to_multiple=2048 * max(n_dev, 1),
        # proven from the host data exactly as the pipeline drivers do
        # (pipeline._prove_morton_small): the 3-operand Morton sort
        morton_small=bool(pts.max() - pts.min() < (1 << 20)),
    )
    capacity = cfg.padded_count(n)
    pos = np.full((capacity, 3), 2**24, np.int32)
    pos[:n] = pts
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    pos_j, mask_j = jnp.asarray(pos), jnp.asarray(mask)

    extras = {}

    # --- sorted frame (shared by autotune + stage benches) ---
    order = morton_argsort(pos_j, mask_j)
    spos = pos_j[order]
    smask = mask_j[order]
    sposf = spos.astype(jnp.float32)

    # --- autotune 1: stats-kernel variants.  Bit-exact re-expressions
    # of the same order statistics (tests/test_stats_sweep.py), so the
    # decision is time-only; a variant that fails to compile on this
    # chip is skipped, never fatal.
    from buildingsegment_tpu.ops.stats_sweep import knn_normals_window_stats

    tune = {}
    stats_best, stats_best_dt = ("bisect", False, False), None
    stats_cands = [
        ("bisect", False, False),
        ("bitonic", True, False),
        # symmetry-halved phase 1 on the measured-best combo
        ("bitonic", True, True),
        # block-MXU form (ops/stats_mxu.py): distances + moments as
        # matmuls — near-exact, so the headline quality gate below
        # arbitrates whatever wins here
        ("mxu", False, False),
    ]
    for rank_mode, so, sym in stats_cands:
        tag = (
            f"stats_{rank_mode}"
            + ("_offsets" if so else "")
            + ("_sym" if sym else "")
        )
        try:
            dt, _ = _timed(
                lambda: knn_normals_window_stats(
                    sposf, smask, k=cfg.knn_k_pad,
                    window=cfg.knn_window, radius=cfg.normal_radius,
                    max_nn=cfg.normal_max_nn, rank_mode=rank_mode,
                    store_offsets=so, sym=sym,
                ),
                reps=4,
            )
        except Exception as e:  # compile/lowering failure → skip
            tune[tag] = f"error:{type(e).__name__}"
            continue
        tune[tag] = round(dt * 1e3, 2)
        if stats_best_dt is None or dt < stats_best_dt:
            stats_best, stats_best_dt = (rank_mode, so, sym), dt

    # --- stage benches on the sorted frame ---
    dt, (nb_i, nb_d) = _timed(
        lambda: knn_window_sorted(sposf, smask, 16, window=32)
    )
    extras["knn_window_mpts"] = round(n / dt / 1e6, 2)

    dt, (normals, curv) = _timed(
        lambda: estimate_normals_window(sposf, smask, radius=100.0, window=64)
    )
    extras["normals_mpts"] = round(n / dt / 1e6, 2)

    # diagnostic: the non-multigrid single-level solver on a 128k slice
    # (at 1M it is pathological by design — every sweep touches [N]
    # tables; the production segmentation number is
    # segmentation_multigrid_mpts below)
    n1 = min(131072, spos.shape[0])
    dt, res = _timed(
        lambda: segment_planes(
            spos[:n1], normals[:n1], nb_i[:n1, :15], smask[:n1],
            neigh_sq_dist=nb_d[:n1, :15], max_edge_dist=600.0,
            th_point_count=400, max_planes=1024,
            propagation="window", window=16,
            convergence_tol=cfg.seg_convergence_tol,
        )
    )
    extras["segmentation_single_level_mpts"] = round(n1 / dt / 1e6, 2)

    # --- autotune 2: compact-space coarse solver on/off.  The compact
    # kernel merges a superset of pairs per sweep above the XLA loop's
    # 1024-live cap (documented in ops/compact_sweep.py), so the two
    # solutions may differ slightly: require near-identical agreement
    # at the stage level before trusting the timing, and the headline
    # quality gate below re-checks whatever wins end to end.
    from buildingsegment_tpu.seg.coarse import segment_planes_multigrid

    def _mg(compact):
        return segment_planes_multigrid(
            spos, normals, nb_i[:, :16], smask,
            neigh_sq_dist=nb_d[:, :16], max_edge_dist=600.0,
            th_point_count=400, max_planes=1024,
            window=16, group=cfg.seg_group, levels=cfg.seg_levels,
            refine_sweeps=cfg.seg_refine_sweeps,
            convergence_tol=cfg.seg_convergence_tol,
            compact=compact,
        )

    # The compact solver is the hardware-validated production default
    # (labels bit-identical to the XLA loop on a v5e chip, coarse solve
    # 25.45 vs 34.76 ms at ng=67k — tools/perf_compact_lab.py), so the
    # stage race only times the compact path; the XLA loop costs a
    # ~30-minute remote compile on a cold cache for a comparison number
    # (BST_BENCH_MG_XLA=1 opts it back in).  Quality stays protected by
    # the end-to-end truth-agreement gate below, whose safe-config
    # fallback runs seg_compact=False.
    seg_compact, dt_mg = False, None
    if os.environ.get("BST_BENCH_MG_XLA", "0") == "1":
        try:
            dt_off, _res = _timed(lambda: _mg(False), reps=4)
            tune["multigrid_xla"] = round(dt_off * 1e3, 2)
            dt_mg = dt_off
        except Exception as e:  # helper flake must not void the bench
            tune["multigrid_xla"] = f"error:{type(e).__name__}"
    if os.environ.get("BST_BENCH_COMPACT", "1") != "0":
        try:
            dt_on, _res = _timed(lambda: _mg(True), reps=4)
            tune["multigrid_compact"] = round(dt_on * 1e3, 2)
            if dt_mg is None or dt_on < dt_mg:
                seg_compact, dt_mg = True, dt_on
        except Exception as e:
            tune["multigrid_compact"] = f"error:{type(e).__name__}"
    else:
        tune["multigrid_compact"] = "skipped:BST_BENCH_COMPACT=0"
    if dt_mg is not None:
        extras["segmentation_multigrid_mpts"] = round(n / dt_mg / 1e6, 2)

    cfg = dataclasses.replace(
        cfg,
        stats_rank_mode=stats_best[0],
        stats_store_offsets=stats_best[1],
        stats_sym=stats_best[2],
        seg_compact=seg_compact,
    )
    tune["chosen"] = {
        "stats_rank_mode": stats_best[0],
        "stats_store_offsets": stats_best[1],
        "stats_sym": stats_best[2],
        "seg_compact": seg_compact,
    }
    extras["autotune"] = tune

    # --- headline: end-to-end sharded pipeline (config 1/4) with the
    # tuned variants; quality-gated with a safe-config fallback so a
    # variant that is fast but wrong can never ship as the number.
    from buildingsegment_tpu.utils.quality import bij_agreement

    QUALITY_FLOOR = 0.0 if quick else 0.97
    mesh = make_mesh(n_dev)
    safe_cfg = dataclasses.replace(
        cfg, stats_rank_mode="bisect", stats_store_offsets=False,
        stats_sym=False, seg_compact=False,
    )

    def _headline(c):
        fn = sharded_pipeline(mesh, c, capacity_hint=capacity)
        e2e_dt, (_, _, seg) = _timed(lambda: fn(pos_j, mask_j))
        agreement = bij_agreement(truth, np.asarray(seg.plane_idx)[:n])
        return fn, e2e_dt, seg, agreement

    # autotune 3: headline-config candidates, each a small replacement
    # set over the tuned base config; the winner is the fastest one
    # that clears the quality floor.  w48 was measured ~8% faster than
    # w64 at the same truth agreement (perf_window_quality,
    # 2026-08-18); refine_sweeps=2 drops one full-resolution Pallas
    # sweep (~4 ms) and the gate arbitrates whether the third sweep
    # ever earned its keep on this scene.
    cand_reps = [{}]
    if not quick:
        if cfg.knn_window != 48:
            cand_reps.append({"knn_window": 48})
        if cfg.seg_refine_sweeps > 2:
            cand_reps.append({"knn_window": 48, "seg_refine_sweeps": 2})
    best = None
    best_reps = {}

    def _try(reps_d):
        nonlocal best, best_reps
        c = dataclasses.replace(cfg, **reps_d)
        tag = "base" if not reps_d else "_".join(
            f"{k.split('_')[-1]}{v}" for k, v in sorted(reps_d.items())
        )
        try:
            fn_c, dt_c, seg_c, ag_c = _headline(c)
        except Exception as e:
            tune[f"cand_{tag}"] = f"error:{type(e).__name__}"
            return
        tune[f"cand_{tag}"] = {
            "ms": round(dt_c * 1e3, 2), "agreement": round(ag_c, 4)
        }
        if ag_c >= QUALITY_FLOOR and (best is None or dt_c < best[2]):
            best = (c, fn_c, dt_c, seg_c, ag_c)
            best_reps = reps_d

    for reps_d in cand_reps:
        _try(reps_d)
    # adaptive follow-up on whatever won so far: three-level
    # coarsening (coarse rows N/64 — the coarse solve scales with row
    # count; measured -2.2% agreement at 80 mm spacing but the bench
    # scene's 25 mm density shrinks the coarse cells 3x, see
    # tests/test_multigrid.py::test_quality_levels3 — the quality gate
    # arbitrates).  The block-MXU seed sweep is NOT offered: measured
    # 2.5x slower than the pair kernel (2026-08-19 perf_mxu_lab —
    # per-128-query-block matmul issue latency dominates).
    if not quick:
        if cfg.seg_levels < 3 and best_reps.get("seg_levels") != 3:
            _try({**best_reps, "seg_levels": 3})
        # (the symmetry-halved seed sweep is now the resolved default —
        # bit-identical to "pair", measured faster; no candidate needed)
        # group-coherence seed gate: skips the fine window_seeds sweep
        # (~4-5 ms at 1M) — a different seed criterion, so the quality
        # gate arbitrates (tests/test_multigrid.py pins the CPU floor)
        if best_reps.get("seg_seed_source") != "coarse":
            _try({**best_reps, "seg_seed_source": "coarse"})
    if best is None:
        extras["autotune_fallback"] = "all_candidates_failed_gate"
        cfg = safe_cfg
        try:
            fn, e2e_dt, seg, agreement = _headline(cfg)
        except Exception as e:
            # even the safe config could not compile/run — emit the
            # contract line with the failure recorded, never crash
            print(json.dumps({
                "metric": "end_to_end_segmentation_throughput",
                "value": 0.0,
                "unit": "Mpoints/sec",
                "vs_baseline": 0.0,
                "error": "headline_failed",
                "detail": f"{type(e).__name__}: {str(e)[:200]}",
                **extras,
            }))
            return
    else:
        cfg, fn, e2e_dt, seg, agreement = best
        tune["chosen"]["knn_window"] = cfg.knn_window
        tune["chosen"]["seg_refine_sweeps"] = cfg.seg_refine_sweeps
        tune["chosen"]["seg_seed_mode"] = cfg.seg_seed_mode
        tune["chosen"]["seg_seed_source"] = cfg.seg_seed_source
        tune["chosen"]["seg_levels"] = cfg.seg_levels

    # re-measure the multigrid stage at the WINNING config so the
    # published stage rate matches what the headline actually runs
    # (the autotune-2 numbers above use the base levels/windows)
    if best is not None and (
        cfg.seg_levels != safe_cfg.seg_levels
        or cfg.seg_refine_sweeps != safe_cfg.seg_refine_sweeps
        or cfg.seg_compact != safe_cfg.seg_compact
        or cfg.seg_seed_mode != safe_cfg.seg_seed_mode
        or cfg.seg_seed_source != safe_cfg.seg_seed_source
    ):
        try:
            dt_w, _ = _timed(
                lambda: segment_planes_multigrid(
                    spos, normals, nb_i[:, :16], smask,
                    neigh_sq_dist=nb_d[:, :16], max_edge_dist=600.0,
                    th_point_count=400, max_planes=1024,
                    window=16, group=cfg.seg_group, levels=cfg.seg_levels,
                    refine_sweeps=cfg.seg_refine_sweeps,
                    convergence_tol=cfg.seg_convergence_tol,
                    compact=cfg.seg_compact,
                    seed_mode=cfg.seg_seed_mode,
                    seed_source=cfg.seg_seed_source,
                ),
                reps=4,
            )
            extras["segmentation_multigrid_mpts"] = round(n / dt_w / 1e6, 2)
            tune["multigrid_chosen_cfg"] = round(dt_w * 1e3, 2)
        except Exception as e:
            tune["multigrid_chosen_cfg"] = f"error:{type(e).__name__}"

    mpts = n / e2e_dt / 1e6
    extras["planes_found"] = int(seg.num_planes)
    extras["seg_sweeps"] = int(seg.num_sweeps)
    extras["quality_agreement"] = round(agreement, 4)
    extras["quality_floor"] = QUALITY_FLOOR
    quality_ok = agreement >= QUALITY_FLOOR
    if not quality_ok:
        extras["quality_gate"] = "FAIL"

    # --- config 5: ortho render (device raster part of the multi-scan
    # pipeline; PNG encode is a host cold path) ---
    from buildingsegment_tpu.raster.ortho import compute_ortho_images

    shifted, lo, seg = fn(pos_j, mask_j)
    ext = tuple(
        int(v)
        for v in np.asarray(
            jnp.max(jnp.where(mask_j[:, None], shifted, 0), axis=0)
        )
    )
    render = jax.jit(
        lambda p, m: compute_ortho_images(p, m, ext, cfg)
    )
    dt, _ = _timed(lambda: render(shifted, mask_j))
    extras["render_mpts"] = round(n / dt / 1e6, 2)
    e2e_render = e2e_dt + dt
    extras["pipeline_with_render_mpts"] = round(n / e2e_render / 1e6, 2)

    # --- config 5 scored as what it is: the MULTI-SCAN pipeline
    # end-to-end — PLY read (native codec), segment, labeled-PLY write,
    # ortho PNG render — over 4 distinct ~1M-point scans.  First batch
    # warms every jit bucket; the second batch is the steady state.
    import os
    import tempfile

    from buildingsegment_tpu.io.ply import HostPointCloud, write_ply
    from buildingsegment_tpu.pipeline import segment_files

    tmp = tempfile.mkdtemp(prefix="bst_bench_scans_")
    scan_paths, total_pts = [], 0
    for s in range(n_scans):
        spts, _ = make_building_cloud(
            seed=s, spacing_mm=spacing, width_mm=12_000.0,
            depth_mm=9_000.0, wall_h_mm=6_000.0, ridge_h_mm=8_000.0,
            noise_mm=8.0,
        )
        total_pts += len(spts)
        p = os.path.join(tmp, f"scan{s}.ply")
        # file in meters; read_ply(scale=1000) recovers integer mm
        write_ply(HostPointCloud(positions=spts), p, position_scale=1e-3)
        scan_paths.append(p)
    out_paths = [os.path.join(tmp, f"out{s}.ply") for s in range(n_scans)]
    render_dir = os.path.join(tmp, "render")
    # the multiscan stage program is big enough to OOM the remote
    # compile helper (SIGKILL) on bad days — never let that kill the
    # driver's round-end bench; fall back to the safe (smaller) config
    try:
        ms_cfg = cfg
        try:
            _warm(segment_files, scan_paths, out_paths, ms_cfg,
                  render_dir=render_dir, attempts=6)
        except Exception:
            ms_cfg = safe_cfg
            extras["multiscan_fallback"] = "safe_cfg"
            _warm(segment_files, scan_paths, out_paths, ms_cfg,
                  render_dir=render_dir, attempts=6)
        t0 = time.perf_counter()
        segment_files(scan_paths, out_paths, ms_cfg, render_dir=render_dir)
        ms_dt = time.perf_counter() - t0
        extras["multiscan_e2e_mpts"] = round(total_pts / ms_dt / 1e6, 2)
        extras["multiscan_scans"] = len(scan_paths)
    except Exception as e:
        extras["multiscan_error"] = f"{type(e).__name__}: {str(e)[:160]}"

    # --- config 2: exact brute force (Pallas kernel), 1 rep (O(N²)) ---
    try:
        dt, _ = _timed(lambda: knn_pallas(spos, smask, k=16), reps=1)
        extras["knn_bruteforce_mpts"] = round(n / dt / 1e6, 3)
    except Exception as e:  # pragma: no cover — kernel may not lower
        extras["knn_bruteforce_error"] = type(e).__name__

    print(
        json.dumps(
            {
                "metric": "end_to_end_segmentation_throughput",
                "value": round(mpts, 3),
                "unit": "Mpoints/sec",
                "vs_baseline": round(mpts / 50.0, 4) if quality_ok else 0.0,
                "points": n,
                "devices": n_dev,
                # the 50 Mpts/s north star is a v5e-8 (8-chip) target;
                # this run uses the chips listed above.  The per-chip
                # share of that target is 50/8 = 6.25 Mpts/s; the dist
                # layer's 8-shard solves are bit-exact vs 1-shard
                # (tests/test_dist.py) but ICI scaling efficiency is
                # unmeasured on this 1-chip rig, so the headline
                # vs_baseline conservatively divides by the full 50.
                "north_star_hardware": "v5e-8",
                "per_chip_share_of_north_star": (
                    round(mpts / (50.0 / 8.0), 4) if quality_ok else 0.0
                ),
                "seconds_per_scan": round(e2e_dt, 4),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
