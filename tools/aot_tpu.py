"""Deviceless LOCAL TPU compilation harness.

libtpu.so is installed in the venv, so XLA:TPU (including Mosaic) can
compile v5e executables on this host without the chip and without the
axon remote-compile service — which makes compile-time pathologies
(like the compact-sweep tarpit) reproducible, time-boxable and
killable.  Usage:

    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    TPU_ACCELERATOR_TYPE=v5litepod-1 TPU_WORKER_HOSTNAMES=localhost \
        python tools/aot_tpu.py compact --ng 8192

The env vars matter: empty POOL_IPS keeps sitecustomize from
registering the axon plugin; the TPU_* vars let libtpu build a
compile-only v5e topology (topologies.get_topology_desc("", "tpu")).
"""

import argparse
import time


def tpu_sharding():
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    # get_topology_desc("") silently yields a TPU v2 topology (16 MB
    # VMEM) — compiles then fail with bogus vmem OOMs that a real v5e
    # (128 MB) accepts.  Name the generation explicitly; the smallest
    # v5e layout the default 2x2 chips_per_host_bounds admits is 2x2x1,
    # and single-device programs just use devices[:1].
    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    assert "v5" in topo.devices[0].device_kind, topo.devices[0].device_kind
    mesh = Mesh(topo.devices[:1], ("x",))
    return NamedSharding(mesh, PartitionSpec())


def compile_compact(ng, w=16, lc=2048, anchor_gate=True, jump_rounds=2,
                    verbose=True):
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.ops.compact_sweep import compact_sweep

    s = tpu_sharding()
    tile = -(-ng // 128) * 128
    width = tile + 2 * w + ((-(tile + 2 * w)) % 128)

    def sds(shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32, sharding=s)

    args = (
        sds((16, width)), sds((4, width)), sds((8, lc)),
        jax.ShapeDtypeStruct((), jnp.int32, sharding=s),
    )
    t0 = time.time()
    lowered = compact_sweep.lower(
        *args, n=ng, w=w, tile=tile, lc=lc,
        th_thickness=300.0, th_normal_cos=0.88, edge_gate2=360000.0,
        th_anchor_cos=0.95, anchor_gate=anchor_gate, signed=False,
        jump_rounds=jump_rounds, interpret=False,
    )
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_comp = time.time() - t0
    if verbose:
        print(
            f"ng={ng} tile={tile} w={w} lc={lc}: "
            f"lower {t_lower:.1f}s compile {t_comp:.1f}s",
            flush=True,
        )
    return t_comp


def compile_stats(ng, w=64, tile=8192, rank_mode="bisect",
                  store_offsets=False, verbose=True):
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.ops.stats_sweep import fused_stats_sweep

    s = tpu_sharding()
    width = tile + 2 * w + ((-(tile + 2 * w)) % 128)
    n_pad = -(-ng // tile) * tile
    slab = jax.ShapeDtypeStruct(
        (8, n_pad + 2 * w + ((-(n_pad + 2 * w)) % 128)), jnp.float32,
        sharding=s,
    )
    t0 = time.time()
    lowered = fused_stats_sweep.lower(
        slab, ng, k=15, w=w, tile=tile, radius=100.0, max_nn=50,
        interpret=False, store_offsets=store_offsets,
        rank_mode=rank_mode,
    )
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_comp = time.time() - t0
    if verbose:
        print(f"stats ng={ng} tile={tile} w={w}: lower {t_lower:.1f}s "
              f"compile {t_comp:.1f}s", flush=True)
    return t_comp


def compile_mxu(ng, w=64, tile=8192, verbose=True):
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.ops.stats_mxu import fused_stats_mxu

    s = tpu_sharding()
    n_pad = -(-ng // tile) * tile
    slab = jax.ShapeDtypeStruct(
        (8, n_pad + 2 * w + ((-(n_pad + 2 * w)) % 128)), jnp.float32,
        sharding=s,
    )
    t0 = time.time()
    lowered = fused_stats_mxu.lower(
        slab, ng, k=15, w=w, tile=tile, radius=100.0, max_nn=50,
        interpret=False,
    )
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_comp = time.time() - t0
    if verbose:
        print(f"mxu ng={ng} tile={tile} w={w}: lower {t_lower:.1f}s "
              f"compile {t_comp:.1f}s", flush=True)
    return t_comp


def compile_knn(n, qt=128, ct=1024, verbose=True):
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.ops.pallas_knn import knn_pallas

    s = tpu_sharding()
    args = (
        jax.ShapeDtypeStruct((n, 3), jnp.int32, sharding=s),
        jax.ShapeDtypeStruct((n,), jnp.bool_, sharding=s),
    )
    t0 = time.time()
    lowered = knn_pallas.lower(*args, k=16, query_tile=qt, cand_tile=ct)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_comp = time.time() - t0
    if verbose:
        print(f"knn n={n} qt={qt} ct={ct}: lower {t_lower:.1f}s "
              f"compile {t_comp:.1f}s", flush=True)
    return t_comp


def compile_finalize(n, verbose=True):
    """AOT-compile the round-5 finalize kernels (plane_adopt +
    plane_payload_moment_sums) at shape n.  REQUIRED pre-chip check
    for any finalize-kernel change: the jax.export lowering test stops
    before the backend, and the backend is where scoped-vmem stack
    OOMs surface (caught here first: paymom 24.8 MB vs the 16 MB
    default limit, 2026-08-21)."""
    import jax
    import jax.numpy as jnp

    from buildingsegment_tpu.ops.adopt import plane_adopt
    from buildingsegment_tpu.ops.segsum import plane_payload_moment_sums

    s = tpu_sharding()

    def sds(shape, dt=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dt, sharding=s)

    t0 = time.time()
    jax.jit(lambda pay, holes, B, tab: plane_adopt(
        pay, holes, B, tab, th_thickness=300.0, th_cos=0.88,
        interpret=False)).lower(
        sds((n, 8)), sds((n,), jnp.bool_), sds((8, 384)),
        sds((8, 128))).compile()
    t1 = time.time()
    jax.jit(lambda ids, pay, q: plane_payload_moment_sums(
        ids, pay, q, jnp.int32(40), table_cap=1024,
        interpret=False)).lower(
        sds((n,), jnp.int32), sds((n, 8)), sds((1024, 3))).compile()
    t2 = time.time()
    if verbose:
        print(f"finalize n={n}: adopt {t1 - t0:.1f}s "
              f"paymom {t2 - t1:.1f}s", flush=True)
    return t2 - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["compact", "stats", "mxu", "knn", "finalize"])
    ap.add_argument("--ng", type=int, nargs="+", default=[8192])
    ap.add_argument("--w", type=int, default=16)
    ap.add_argument("--lc", type=int, default=2048)
    ap.add_argument("--tile", type=int, default=8192)
    ap.add_argument("--jump-rounds", type=int, default=2)
    ap.add_argument("--no-anchor", action="store_true")
    a = ap.parse_args()
    if a.what == "mxu":
        for ng in a.ng:
            compile_mxu(ng, w=a.w if a.w != 16 else 64, tile=a.tile)
        return
    if a.what == "knn":
        qt = a.w if a.w != 16 else 128
        for ng in a.ng:
            compile_knn(ng, qt=qt, ct=a.tile if a.tile != 8192 else 1024)
        return
    if a.what == "finalize":
        for ng in a.ng:
            compile_finalize(ng)
        return
    if a.what == "stats":
        for ng in a.ng:
            compile_stats(ng, w=a.w if a.w != 16 else 64)
        return
    for ng in a.ng:
        compile_compact(
            ng, w=a.w, lc=a.lc, anchor_gate=not a.no_anchor,
            jump_rounds=a.jump_rounds,
        )


if __name__ == "__main__":
    main()
