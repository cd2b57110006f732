"""Cross-platform Mosaic lowering validation (no TPU needed).

``jax.export`` with ``platforms=["tpu"]`` runs the full Pallas →
Mosaic (TPU dialect) lowering *and MLIR verification* on a CPU host —
exactly the stage where every "Mosaic does not lower X" failure we have
hit on hardware surfaces (1-D iota, f32 tpu.iota, unsupported gathers).
Exporting each production kernel at production shapes therefore
de-risks new kernels before the chip is available, and guards the
already-validated ones against lowering regressions.

What this cannot catch: the later Mosaic→LLO backend compile (layout /
register pressure) still happens on-device; export success is
necessary, not sufficient.  Every kernel that exports here must still
be timed on hardware before its flag flips to default-on.

Reference parity note: these kernels replace the reference's hot loops
(plane sweeps of tmc3/my_function.cpp:151-258, Open3D kNN/normals) —
the reference has no analog of a cross-compile check because its CUDA
path compiles on the build host; on TPU the equivalent is this export.
"""

import functools

import jax
import jax.numpy as jnp
import pytest
from jax import export

from buildingsegment_tpu.ops.compact_sweep import COMPACT_L, compact_sweep
from buildingsegment_tpu.ops.pallas_knn import knn_pallas
from buildingsegment_tpu.ops.segsum import plane_sums, table_lookup
from buildingsegment_tpu.ops.stats_sweep import fused_stats_sweep
from buildingsegment_tpu.ops.window_sweep import (
    label_sweep,
    refine_table_sweep_pair,
    seed_sweep,
    seed_sweep_pair,
    slab_width,
)


def _lower_tpu(fn, *specs, **kw):
    """Export ``fn(*specs, **kw)`` for the TPU platform; assert the
    Pallas body actually lowered (a ``tpu_custom_call`` is present —
    a kernel silently routed to an XLA fallback would "pass")."""
    exp = export.export(
        jax.jit(functools.partial(fn, **kw)), platforms=["tpu"]
    )(*specs)
    mlir = exp.mlir_module()
    assert "tpu_custom_call" in mlir
    return mlir


def _f32(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def _i32(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.int32)


# --- compact-space coarse solver (the round-3 unvalidated kernel) ----

# production coarse problem: ng ≈ 67k cells, window 16, one grid step
_NG = 66560
_WS = 16
_CWIDTH = _NG + 2 * _WS + (-(_NG + 2 * _WS)) % 128


@pytest.mark.parametrize("anchor_gate", [False, True])
def test_compact_sweep_lowers(anchor_gate):
    _lower_tpu(
        compact_sweep,
        _f32(16, _CWIDTH),           # spine
        _f32(4, _CWIDTH),            # dyn (slot-label row)
        _f32(8, COMPACT_L),          # anchor table
        _i32(),                      # live0
        n=_NG, w=_WS, tile=_NG, lc=COMPACT_L,
        th_thickness=60.0, th_normal_cos=0.88,
        edge_gate2=600.0 ** 2, th_anchor_cos=0.95,
        anchor_gate=anchor_gate, signed=False, jump_rounds=2,
        interpret=False,
    )


# --- fused stats sweep: all rank/offset variants at production shape --

_N1M = 8192 * 128
_SW64 = slab_width(_N1M, 64, 8192)


@pytest.mark.parametrize("rank_mode", ["bisect", "bitonic"])
@pytest.mark.parametrize("store_offsets", [False, True])
@pytest.mark.parametrize("sym", [False, True])
def test_stats_sweep_lowers(rank_mode, store_offsets, sym):
    _lower_tpu(
        fused_stats_sweep,
        _f32(8, _SW64),
        n=_N1M, k=16, w=64, tile=8192, radius=100.0, max_nn=50,
        rank_mode=rank_mode, store_offsets=store_offsets, sym=sym,
        interpret=False,
    )


def test_stats_mxu_lowers():
    """Block-MXU stats kernel: dot_general with a dim-0 contraction
    (lhs-transposed matmul) + in-kernel bitonic at production shape."""
    from buildingsegment_tpu.ops.stats_mxu import fused_stats_mxu

    _lower_tpu(
        fused_stats_mxu,
        _f32(8, _SW64),
        n=_N1M, k=16, w=64, tile=8192, radius=100.0, max_nn=50,
        interpret=False,
    )


def test_seed_mxu_lowers():
    from buildingsegment_tpu.ops.stats_mxu import seed_sweep_mxu
    from buildingsegment_tpu.ops.window_sweep import slab_width

    sw = slab_width(_N1M, 16, 32768)
    _lower_tpu(
        seed_sweep_mxu,
        _f32(8, sw), _f32(4, sw),
        n=_N1M, w=16, tile=32768, th_thickness=300.0,
        th_normal_cos=0.88, signed=False, interpret=False,
    )


# --- hardware-validated sweeps: lowering regression guards -----------

_SW16 = slab_width(_N1M, 16, 32768)


def test_seed_sweeps_lower():
    _lower_tpu(
        seed_sweep,
        _f32(8, _SW16),
        n=_N1M, w=16, tile=32768,
        th_thickness=60.0, th_normal_cos=0.88, interpret=False,
    )
    for sym in (False, True):
        _lower_tpu(
            seed_sweep_pair,
            _f32(8, _SW16), _f32(4, _SW16),
            n=_N1M, w=16, tile=32768, sym=sym,
            th_thickness=60.0, th_normal_cos=0.88, interpret=False,
        )


def test_label_sweep_lowers():
    _lower_tpu(
        label_sweep,
        _f32(16, _SW16),
        n=_N1M, w=16, tile=32768,
        th_thickness=60.0, th_normal_cos=0.88,
        edge_gate2=600.0 ** 2, inf_label=2 ** 30, interpret=False,
    )


def test_refine_sweep_lowers():
    _lower_tpu(
        lambda spine, dyn, table, n_live: refine_table_sweep_pair(
            spine, dyn, _N1M, table, n_live, w=16, tile=32768,
            th_thickness=60.0, th_normal_cos=0.88,
            edge_gate2=600.0 ** 2, big_pid=1 << 20, interpret=False,
        ),
        _f32(8, _SW16), _f32(4, _SW16),
        _f32(8, 8, 128),  # plane table [chunks, 8, 128]
        _i32(),
    )


def test_segsum_kernels_lower():
    _lower_tpu(
        plane_sums,
        _i32(_N1M), _f32(_N1M, 8), _i32(),
        table_cap=1024, interpret=False,
    )
    _lower_tpu(
        table_lookup,
        _i32(_N1M), _f32(1024), _i32(),
        interpret=False,
    )


@pytest.mark.slow
@pytest.mark.parametrize("static_rounds", [False, True])
def test_knn_pallas_lowers(static_rounds):
    # 131072 pts → the VMEM-resident kernel (positions ≤ 40 MB)
    _lower_tpu(
        knn_pallas,
        _i32(131072, 3),
        jax.ShapeDtypeStruct((131072,), jnp.bool_),
        k=16, static_rounds=static_rounds, interpret=False,
    )


def test_knn_pallas_hbm_path_lowers():
    # 4M pts exceed the VMEM-resident bound → the double-buffered
    # HBM-DMA kernel must keep lowering
    _lower_tpu(
        knn_pallas,
        _i32(1 << 22, 3),
        jax.ShapeDtypeStruct((1 << 22,), jnp.bool_),
        k=16, interpret=False,
    )


def test_plane_adopt_lowers():
    """Fused hole-adoption kernel (ops/adopt.py) at production shape:
    [T,8]x[8,384] dot + lane selection + grid-accumulated [128,8]."""
    from buildingsegment_tpu.ops.adopt import plane_adopt

    _lower_tpu(
        plane_adopt,
        _f32(_N1M, 8),                       # payload
        jax.ShapeDtypeStruct((_N1M,), jnp.bool_),  # holes
        _f32(8, 384),                        # B
        _f32(8, 128),                        # tab
        th_thickness=300.0, th_cos=0.88, signed=False,
        interpret=False,
    )


def test_table_lookup_cols_lowers():
    from buildingsegment_tpu.ops.segsum import table_lookup_cols

    _lower_tpu(
        table_lookup_cols,
        _i32(_N1M),
        _f32(1025, 3),
        _i32(),
        interpret=False,
    )


def test_plane_payload_moment_sums_lowers():
    from buildingsegment_tpu.ops.segsum import plane_payload_moment_sums

    _lower_tpu(
        plane_payload_moment_sums,
        _i32(_N1M),
        _f32(_N1M, 8),
        _f32(1024, 3),
        _i32(),
        table_cap=1024,
        interpret=False,
    )
