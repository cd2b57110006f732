"""One-hot segment-sum / table-lookup kernels vs XLA scatter/gather.

These kernels replace the finalize scatters of seg/coarse.py on TPU
(each XLA scatter-add hides a full N-row sort); interpreter-mode
equality here pins the TPU path to the XLA semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from buildingsegment_tpu.ops.segsum import (
    plane_sums,
    table_lookup,
    table_lookup_cols,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    n = 20_000
    ids = rng.integers(0, 700, size=n).astype(np.int32)
    payload = rng.normal(size=(n, 8)).astype(np.float32)
    payload[:, 0] = 1.0  # count column
    return ids, payload


class TestPlaneSums:
    def test_matches_scatter_add(self, data):
        ids, payload = data
        ref = np.zeros((1024, 8), np.float64)
        np.add.at(ref, ids, payload.astype(np.float64))
        got = np.asarray(
            plane_sums(
                jnp.asarray(ids), jnp.asarray(payload), jnp.int32(700),
                table_cap=1024, interpret=True,
            )
        )
        # count column is an exact integer sum
        np.testing.assert_array_equal(got[:, 0], ref[:, 0])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)

    def test_live_bound_excludes(self, data):
        ids, payload = data
        got = np.asarray(
            plane_sums(
                jnp.asarray(ids), jnp.asarray(payload), jnp.int32(256),
                table_cap=1024, interpret=True,
            )
        )
        assert np.all(got[256:] == 0.0)

    def test_non_multiple_tile(self):
        ids = jnp.asarray(np.arange(777, dtype=np.int32) % 5)
        payload = jnp.ones((777, 8), jnp.float32)
        got = np.asarray(
            plane_sums(ids, payload, jnp.int32(5), table_cap=128,
                       tile=256, interpret=True)
        )
        ref = np.zeros(128)
        np.add.at(ref, np.asarray(ids), 1.0)
        np.testing.assert_array_equal(got[:, 0], ref)


class TestTableLookup:
    def test_matches_gather(self, data):
        ids, _ = data
        rng = np.random.default_rng(4)
        lut = rng.normal(size=(1025,)).astype(np.float32)
        got = np.asarray(
            table_lookup(
                jnp.asarray(ids), jnp.asarray(lut), jnp.int32(701),
                interpret=True,
            )
        )
        np.testing.assert_array_equal(got, lut[ids])

    def test_dead_ids_zero(self):
        ids = jnp.asarray(np.array([0, 5, 200, 900], np.int32))
        lut = jnp.asarray(np.ones(1024, np.float32))
        got = np.asarray(
            table_lookup(ids, lut, jnp.int32(128), interpret=True)
        )
        # ids at/above the live bound return 0 (their chunk is skipped)
        np.testing.assert_array_equal(got, [1.0, 1.0, 0.0, 0.0])


class TestTableLookupCols:
    def test_matches_gather(self, data):
        ids, _ = data
        rng = np.random.default_rng(9)
        lut = rng.normal(size=(1025, 3)).astype(np.float32)
        got = np.asarray(
            table_lookup_cols(
                jnp.asarray(ids), jnp.asarray(lut), jnp.int32(701),
                interpret=True,
            )
        )
        assert got.shape == (3, len(ids))
        np.testing.assert_array_equal(got.T, lut[ids])

    def test_dead_ids_zero_and_non_multiple(self):
        ids = jnp.asarray(np.array([0, 5, 200, 900, 3], np.int32))
        lut = jnp.asarray(np.ones((1024, 2), np.float32))
        got = np.asarray(
            table_lookup_cols(ids, lut, jnp.int32(128), tile=256,
                              interpret=True)
        )
        np.testing.assert_array_equal(
            got, [[1, 1, 0, 0, 1], [1, 1, 0, 0, 1]]
        )

    def test_matches_single_col_lookup(self, data):
        ids, _ = data
        rng = np.random.default_rng(11)
        lut = rng.normal(size=(512, 3)).astype(np.float32)
        multi = np.asarray(
            table_lookup_cols(
                jnp.asarray(ids % 512), jnp.asarray(lut),
                jnp.int32(512), interpret=True)
        )
        for c in range(3):
            single = np.asarray(
                table_lookup(jnp.asarray(ids % 512),
                             jnp.asarray(lut[:, c]), jnp.int32(512),
                             interpret=True)
            )
            np.testing.assert_array_equal(multi[c], single)


class TestPlanePayloadMomentSums:
    def test_matches_two_pass_reference(self):
        from buildingsegment_tpu.ops.segsum import (
            plane_payload_moment_sums,
        )

        rng = np.random.default_rng(21)
        n, P = 5000, 300
        ids = rng.integers(0, P, n).astype(np.int32)
        ids[::7] = 1024  # excluded rows (≥ live bound)
        pos = rng.uniform(0, 3e4, (n, 3)).astype(np.float32)
        cn = rng.normal(size=(n, 3)).astype(np.float32)
        pay = np.concatenate(
            [np.ones((n, 1)), cn, pos, (pos * pos).sum(1)[:, None]], 1
        ).astype(np.float32)
        q = rng.uniform(0, 3e4, (1024, 3)).astype(np.float32)
        A, M = plane_payload_moment_sums(
            jnp.asarray(ids), jnp.asarray(pay), jnp.asarray(q),
            jnp.int32(P), table_cap=1024, tile=1024, interpret=True)
        A, M = np.asarray(A), np.asarray(M)
        refA = np.zeros((1024, 8))
        refM = np.zeros((1024, 6))
        d = (pos - q[np.minimum(ids, 1023)]).astype(np.float64)
        for i in range(n):
            if ids[i] >= P:
                continue
            refA[ids[i]] += pay[i]
            refM[ids[i]] += [d[i, 0] * d[i, 0], d[i, 1] * d[i, 1],
                             d[i, 2] * d[i, 2], d[i, 0] * d[i, 1],
                             d[i, 0] * d[i, 2], d[i, 1] * d[i, 2]]
        assert np.abs(A - refA).max() / np.abs(refA).max() < 1e-5
        assert np.abs(M - refM).max() / np.abs(refM).max() < 1e-4
        # excluded rows contributed nothing
        assert A[:, 0].sum() == (ids < P).sum()
