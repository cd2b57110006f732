"""Core container / quantize / Morton tests."""

import jax.numpy as jnp
import numpy as np

from buildingsegment_tpu.core.morton import (
    hilbert_argsort,
    hilbert_transpose,
    morton_argsort,
    morton_encode,
)
from buildingsegment_tpu.core.pointset import PointBatch
from buildingsegment_tpu.core.quantize import (
    compute_bbox,
    dedup_quantized,
    quantize_positions,
    shift_to_origin,
)


class TestPointBatch:
    def test_padding_and_mask(self):
        pos = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
        b = PointBatch.from_numpy(pos, capacity=8)
        assert b.capacity == 8
        assert int(b.count) == 2
        np.testing.assert_array_equal(np.asarray(b.positions)[:2], pos)
        assert np.asarray(b.mask).sum() == 2

    def test_roundtrip_numpy(self):
        pos = np.arange(12, dtype=np.int32).reshape(4, 3)
        col = np.arange(12, dtype=np.uint16).reshape(4, 3)
        b = PointBatch.from_numpy(pos, col, capacity=16)
        out = b.to_numpy()
        np.testing.assert_array_equal(out["positions"], pos)
        np.testing.assert_array_equal(out["colors"], col)
        np.testing.assert_array_equal(out["plane_idx"], [-1] * 4)

    def test_upload_matches_from_numpy(self):
        # compact uint16 path (non-negative, small extent)
        pos = np.array([[0, 7, 3], [65000, 5, 6], [1, 2, 3]], np.int32)
        a = PointBatch.from_numpy(pos, capacity=8)
        b = PointBatch.upload(pos, capacity=8)
        np.testing.assert_array_equal(
            np.asarray(a.positions), np.asarray(b.positions)
        )
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))

    def test_upload_int32_fallback(self):
        # negative / large coords fall back to an int32 transfer
        for pos in (
            np.array([[-5, 2, 3], [4, 5, 6]], np.int32),
            np.array([[70000, 2, 3], [4, 5, 6]], np.int32),
        ):
            a = PointBatch.from_numpy(pos, capacity=4)
            b = PointBatch.upload(pos, capacity=4)
            np.testing.assert_array_equal(
                np.asarray(a.positions), np.asarray(b.positions)
            )
            np.testing.assert_array_equal(
                np.asarray(a.mask), np.asarray(b.mask)
            )

    def test_upload_empty(self):
        b = PointBatch.upload(np.zeros((0, 3), np.int32), capacity=4)
        assert not np.asarray(b.mask).any()

    def test_gather_reorders_all_fields(self):
        pos = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], np.int32)
        b = PointBatch.from_numpy(pos, capacity=4)
        order = jnp.array([2, 1, 0, 3])
        g = b.gather(order)
        np.testing.assert_array_equal(
            np.asarray(g.positions)[:3], pos[::-1]
        )
        np.testing.assert_array_equal(np.asarray(g.mask), [True, True, True, False])


class TestQuantize:
    def test_truncation_toward_zero(self):
        raw = jnp.array([[1.9, -1.9, 0.4]])
        q = quantize_positions(raw, 1.0)
        np.testing.assert_array_equal(np.asarray(q), [[1, -1, 0]])

    def test_scale(self):
        raw = jnp.array([[1.2345, 0.0015, -0.5]])
        q = quantize_positions(raw, 1000.0)
        # float32 1.2345*1000 = 1234.5 → 1234
        np.testing.assert_array_equal(np.asarray(q), [[1234, 1, -500]])

    def test_bbox_masked(self):
        pos = jnp.array([[1, 2, 3], [7, -4, 5], [100, 100, 100]], jnp.int32)
        mask = jnp.array([True, True, False])
        lo, hi = compute_bbox(pos, mask)
        np.testing.assert_array_equal(np.asarray(lo), [1, -4, 3])
        np.testing.assert_array_equal(np.asarray(hi), [7, 2, 5])

    def test_shift_to_origin(self):
        pos = jnp.array([[10, 20, 30], [13, 25, 31]], jnp.int32)
        mask = jnp.array([True, True])
        shifted, lo, hi = shift_to_origin(pos, mask)
        np.testing.assert_array_equal(np.asarray(shifted), [[0, 0, 0], [3, 5, 1]])
        np.testing.assert_array_equal(np.asarray(lo), [10, 20, 30])
        np.testing.assert_array_equal(np.asarray(hi), [13, 25, 31])


class TestHilbert:
    def test_matches_skilling_oracle(self, rng):
        def skilling(X, b):
            X = list(X)
            q = 1 << (b - 1)
            while q > 1:
                p = q - 1
                for i in range(3):
                    if X[i] & q:
                        X[0] ^= p
                    else:
                        t = (X[0] ^ X[i]) & p
                        X[0] ^= t
                        X[i] ^= t
                q >>= 1
            for i in range(1, 3):
                X[i] ^= X[i - 1]
            t, q = 0, 1 << (b - 1)
            while q > 1:
                if X[2] & q:
                    t ^= q - 1
                q >>= 1
            return [x ^ t for x in X]

        pts = rng.integers(0, 1 << 20, (100, 3)).astype(np.int32)
        ours = np.asarray(hilbert_transpose(jnp.asarray(pts)))
        for p, o in zip(pts, ours):
            assert skilling(list(map(int, p)), 20) == list(map(int, o))

    def test_unit_step_traversal(self):
        # consecutive Hilbert-sorted lattice cells are face-adjacent
        g = 8
        xs, ys, zs = np.meshgrid(*([np.arange(g)] * 3), indexing="ij")
        cells = (
            np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.int32) << 17
        )
        mask = jnp.ones(len(cells), bool)
        o = np.asarray(hilbert_argsort(jnp.asarray(cells), mask))
        steps = np.abs(np.diff(cells[o] >> 17, axis=0)).sum(1)
        assert (steps == 1).all()

    def test_padding_sorts_last(self):
        pos = jnp.asarray(
            np.array([[5, 5, 5], [0, 0, 0], [1, 1, 1]], np.int32)
        )
        mask = jnp.array([True, False, True])
        order = np.asarray(hilbert_argsort(pos, mask))
        assert order[-1] == 1


class TestDedup:
    def test_exact_duplicates_dropped_first_kept(self):
        pos = jnp.asarray(
            np.array(
                [[1, 2, 3], [4, 5, 6], [1, 2, 3], [1, 2, 3], [7, 8, 9]],
                np.int32,
            )
        )
        mask = jnp.ones(5, bool)
        keep = np.asarray(dedup_quantized(pos, mask))
        np.testing.assert_array_equal(keep, [True, True, False, False, True])

    def test_low_bit_masking(self):
        # points equal after dropping 2 low bits collapse
        pos = jnp.asarray(np.array([[4, 4, 4], [5, 6, 7], [8, 8, 8]], np.int32))
        mask = jnp.ones(3, bool)
        keep = np.asarray(dedup_quantized(pos, mask, drop_bits=2))
        np.testing.assert_array_equal(keep, [True, False, True])

    def test_padding_stays_invalid(self, rng):
        pos = jnp.asarray(rng.integers(0, 100, (16, 3)).astype(np.int32))
        mask = jnp.zeros(16, bool).at[:4].set(True)
        keep = np.asarray(dedup_quantized(pos, mask))
        assert not keep[4:].any()


class TestPointBatchDedup:
    def test_container_dedup_syncs_attributes(self, rng):
        import jax.numpy as jnp

        pos = np.array(
            [[4, 4, 4], [1, 2, 3], [5, 6, 7], [4, 4, 4]], np.int32
        )
        col = np.arange(12, dtype=np.uint16).reshape(4, 3)
        b = PointBatch.from_numpy(pos, colors=col, capacity=8)
        d = b.dedup_quantized()
        keep = np.asarray(d.mask)
        # global dedup: the later [4,4,4] goes, first kept (the C++
        # std::unique quirk only collapses adjacent rows; see docstring)
        np.testing.assert_array_equal(
            keep[:4], [True, True, True, False]
        )
        assert not keep[4:].any()
        out = d.to_numpy()
        np.testing.assert_array_equal(out["colors"], col[:3])
        assert int(d.count) == 3

    def test_low_bit_mask_applied_to_positions(self):
        pos = np.array([[4, 4, 5], [6, 7, 6]], np.int32)
        b = PointBatch.from_numpy(pos, capacity=4)
        d = b.dedup_quantized(min_geom_node_size_log2=2)
        # both quantize to [4,4,4] -> one survives, positions masked
        np.testing.assert_array_equal(
            np.asarray(d.positions)[:2], [[4, 4, 4], [4, 4, 4]]
        )
        np.testing.assert_array_equal(np.asarray(d.mask)[:2], [True, False])


class TestMorton:
    def test_known_codes(self):
        pos = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], jnp.int32)
        codes = np.asarray(morton_encode(pos))
        np.testing.assert_array_equal(codes, [0, 1, 2, 4, 7])

    def test_word_shift(self):
        pos = jnp.array([[1 << 10, 0, 0]], jnp.int32)
        assert int(morton_encode(pos, shift=10)[0]) == 1
        assert int(morton_encode(pos, shift=0)[0]) == 0

    def test_sort_matches_int64_oracle(self, rng):
        pts = rng.integers(0, 2**20, size=(512, 3)).astype(np.int32)
        mask = np.ones(512, bool)
        order = np.asarray(morton_argsort(jnp.asarray(pts), jnp.asarray(mask)))

        def spread64(v):
            v = v.astype(np.int64) & 0xFFFFF
            out = np.zeros_like(v)
            for b in range(20):
                out |= ((v >> b) & 1) << (3 * b)
            return out

        codes = (
            spread64(pts[:, 0])
            | (spread64(pts[:, 1]) << 1)
            | (spread64(pts[:, 2]) << 2)
        )
        assert (np.diff(codes[order]) >= 0).all()

    def test_padding_sorts_last(self):
        pos = jnp.array([[5, 5, 5], [0, 0, 0], [1, 1, 1]], jnp.int32)
        mask = jnp.array([True, False, True])
        order = np.asarray(morton_argsort(pos, mask))
        assert order[-1] == 1


class TestPointBatchAttributes:
    """Attributes must ride every device reorder (VERDICT round-1 #7)."""

    def test_attributes_survive_morton_roundtrip(self, rng):
        import jax.numpy as jnp

        from buildingsegment_tpu.core.morton import morton_argsort
        from buildingsegment_tpu.core.pointset import PointBatch

        n, cap = 1000, 1024
        pos = rng.integers(0, 100_000, size=(n, 3)).astype(np.int32)
        refl = rng.integers(0, 65536, size=(n,)).astype(np.uint16)
        fi = rng.integers(0, 256, size=(n,)).astype(np.uint8)
        la = rng.integers(-90, 90, size=(n,)).astype(np.int32)
        b = PointBatch.from_numpy(
            pos, capacity=cap, reflectances=refl, frame_idx=fi,
            laser_angles=la,
        )
        order = morton_argsort(b.positions, b.mask)
        sorted_b = b.gather(order)
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(cap))
        back = sorted_b.gather(inv)
        out = back.to_numpy()
        np.testing.assert_array_equal(out["positions"], pos)
        np.testing.assert_array_equal(out["reflectances"], refl)
        np.testing.assert_array_equal(out["frame_idx"], fi)
        np.testing.assert_array_equal(out["laser_angles"], la)

    def test_from_host_cloud_carries_attributes(self, rng):
        from buildingsegment_tpu.core.pointset import PointBatch
        from buildingsegment_tpu.io.ply import HostPointCloud

        n = 100
        cloud = HostPointCloud(
            positions=rng.integers(0, 1000, size=(n, 3)).astype(np.int32),
            reflectances=rng.integers(0, 100, size=(n,)).astype(np.uint16),
            laser_angles=rng.integers(-5, 5, size=(n,)).astype(np.int32),
        )
        b = PointBatch.from_host_cloud(cloud, capacity=128)
        out = b.to_numpy()
        np.testing.assert_array_equal(out["reflectances"], cloud.reflectances)
        np.testing.assert_array_equal(out["laser_angles"], cloud.laser_angles)
        assert b.frame_idx is None and b.colors is None


class TestMortonSortPayload:
    def test_matches_argsort_gather(self, rng):
        import jax.numpy as jnp

        from buildingsegment_tpu.core.morton import (
            morton_argsort,
            morton_sort,
        )

        n, cap = 3000, 3072
        pos = np.full((cap, 3), 2**24, np.int32)
        pos[:n] = rng.integers(0, 500_000, size=(n, 3))
        mask = np.zeros(cap, bool)
        mask[:n] = True
        pj, mj = jnp.asarray(pos), jnp.asarray(mask)
        order = morton_argsort(pj, mj)
        spos, smask, order2 = morton_sort(pj, mj)
        # valid prefix must be identical (padded-row tie order may vary)
        np.testing.assert_array_equal(
            np.asarray(spos)[:n], np.asarray(pj[order])[:n]
        )
        np.testing.assert_array_equal(np.asarray(smask), np.asarray(mj[order]))
        np.testing.assert_array_equal(
            np.asarray(order2)[:n], np.asarray(order)[:n]
        )

    def test_small_extent_matches_general(self, rng):
        """small_extent=True is bit-identical to the general path on
        in-range clouds — positions, mask AND order (incl. tie order:
        both paths stable-sort, so duplicate coordinates keep their
        original relative order)."""
        import jax.numpy as jnp

        from buildingsegment_tpu.core.morton import morton_sort

        n, cap = 3000, 3072
        pos = np.full((cap, 3), 2**24, np.int32)
        # low range forces many duplicate codes → exercises tie order
        pos[:n] = rng.integers(0, 64, size=(n, 3))
        pos[1000:2000] = rng.integers(0, (1 << 20) - 1, size=(1000, 3))
        mask = np.zeros(cap, bool)
        mask[:n] = True
        pj, mj = jnp.asarray(pos), jnp.asarray(mask)
        a = morton_sort(pj, mj, False)
        b = morton_sort(pj, mj, True)
        for xa, xb in zip(a, b):
            xa, xb = np.asarray(xa), np.asarray(xb)
            np.testing.assert_array_equal(xa[:n], xb[:n])

    def test_unsort_labels_matches_unsort_by(self, rng):
        """Packed (max_label fits the spare bits) and i16-payload
        regimes both invert the permutation exactly, incl. -1."""
        import jax.numpy as jnp

        from buildingsegment_tpu.core.morton import (
            morton_sort,
            unsort_by,
            unsort_labels,
        )

        n, cap = 3000, 3072
        pos = np.full((cap, 3), 2**24, np.int32)
        pos[:n] = rng.integers(0, 500_000, size=(n, 3))
        mask = np.zeros(cap, bool)
        mask[:n] = True
        _, _, order = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
        for max_label in (1024, 4096, 100_000):
            labels = jnp.asarray(
                rng.integers(-1, max_label, size=cap).astype(np.int32)
            )
            np.testing.assert_array_equal(
                np.asarray(unsort_labels(order, labels, max_label)),
                np.asarray(unsort_by(order, labels)),
            )

    def test_unsort_labels_i16_and_fallback_regimes(self, rng):
        """At 2^21 rows the order bits leave no room for the label
        pack: max_label=4096 must take the i16-payload branch and
        max_label>32766 the unsort_by fallback — both exact."""
        import jax.numpy as jnp

        from buildingsegment_tpu.core.morton import unsort_by, unsort_labels

        n = 1 << 21
        order = jnp.asarray(rng.permutation(n).astype(np.int32))
        for max_label in (4096, 40_000):
            labels = jnp.asarray(
                rng.integers(-1, max_label, size=n).astype(np.int32)
            )
            np.testing.assert_array_equal(
                np.asarray(unsort_labels(order, labels, max_label)),
                np.asarray(unsort_by(order, labels)),
            )

    def test_residual_bits_exact(self, rng):
        """Coordinates beyond 20 bits/axis survive the sort exactly
        (they ride the packed residual word, not the sort keys)."""
        import jax.numpy as jnp

        from buildingsegment_tpu.core.morton import morton_sort

        n, cap = 2000, 2048
        pos = np.full((cap, 3), 2**24, np.int32)
        # up to 2^29 ≈ 537 km at mm scale — far past the 20-bit keys
        pos[:n] = rng.integers(0, 1 << 29, size=(n, 3))
        mask = np.zeros(cap, bool)
        mask[:n] = True
        spos, smask, order = morton_sort(jnp.asarray(pos), jnp.asarray(mask))
        got = np.asarray(spos)[np.asarray(smask)]
        want = pos[np.asarray(order)[np.asarray(smask)]]
        np.testing.assert_array_equal(got, want)


class TestPrefixSum:
    def test_matches_cumsum(self):
        from buildingsegment_tpu.ops.prefix import prefix_sum_i32
        import numpy as np
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        for n in (1, 5, 128, 129, 1000, 67_712, 130_000):
            x = rng.integers(0, 3, size=n).astype(np.int32)
            got = np.asarray(prefix_sum_i32(jnp.asarray(x)))
            np.testing.assert_array_equal(got, np.cumsum(x).astype(np.int32))

    def test_large_totals_exact(self):
        # totals near 2^20 stay integer-exact in the f32 matmuls
        from buildingsegment_tpu.ops.prefix import prefix_sum_i32
        import numpy as np
        import jax.numpy as jnp

        x = np.ones(1 << 20, np.int32)
        got = np.asarray(prefix_sum_i32(jnp.asarray(x)))
        assert got[-1] == 1 << 20
        np.testing.assert_array_equal(got[:5], np.arange(1, 6))
