"""Oracle tests for the fused hole-adoption kernel (ops/adopt.py).

The XLA reference below mirrors the finalize hole-fill block in
seg/coarse.py (heal=True) term by term; the kernel must agree on
decisions, chosen rows (first-occurrence argmin ties included), and
the adoption payload sums.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from buildingsegment_tpu.ops.adopt import pack_adopt_tables, plane_adopt


def _xla_reference(pos, cn, holes, nk, ck, bk, ccdk, reach2, lane_ok,
                   rowlut, th, th_cos, signed):
    hi = jax.lax.Precision.HIGHEST
    cmag = (lambda x: x) if signed else jnp.abs
    sq = jnp.sum(pos * pos, axis=1, keepdims=True)
    offk = jnp.dot(pos, nk.T, precision=hi,
                   preferred_element_type=jnp.float32) - bk[None, :]
    cosk = cmag(jnp.dot(cn, nk.T, precision=hi,
                        preferred_element_type=jnp.float32))
    d2k = sq + ccdk[None, :] - 2.0 * jnp.dot(
        pos, ck.T, precision=hi, preferred_element_type=jnp.float32)
    inpl2 = jnp.maximum(d2k - offk * offk, 0.0)
    okk = (
        (jnp.abs(offk) <= th)
        & (cosk >= th_cos)
        & (inpl2 <= reach2[None, :])
        & (lane_ok > 0)[None, :]
        & holes[:, None]
    )
    off_sel = jnp.where(okk, jnp.abs(offk), jnp.inf)
    arg = jnp.argmin(off_sel, axis=1)
    adopted = jnp.any(okk, axis=1)
    row = jnp.where(adopted, rowlut[arg].astype(jnp.int32), 0)
    return adopted, row


def _payload(pos, cn):
    n = pos.shape[0]
    sq = jnp.sum(pos * pos, axis=1, keepdims=True)
    return jnp.concatenate(
        [jnp.ones((n, 1), jnp.float32), cn, pos, sq], axis=1)


def _rand_problem(seed, n=700, k=96, coincide=False):
    rng = np.random.default_rng(seed)
    nk = rng.normal(size=(k, 3)).astype(np.float32)
    nk /= np.linalg.norm(nk, axis=1, keepdims=True)
    ck = (rng.uniform(0, 30_000, size=(k, 3))).astype(np.float32)
    if coincide:
        # force shared centers/normals so |off| ties are exact
        nk = np.repeat(nk[: k // 2], 2, axis=0)[:k]
        ck = np.repeat(ck[: k // 2], 2, axis=0)[:k]
    bk = np.sum(nk * ck, axis=1)
    ccdk = np.sum(ck * ck, axis=1)
    reach2 = (rng.uniform(500, 4000, size=k).astype(np.float32)) ** 2
    lane_ok = (rng.uniform(size=k) < 0.8).astype(np.float32)
    rowlut = rng.integers(0, 1024, size=k).astype(np.float32)
    # points scattered near the planes so every gate has both outcomes
    t = rng.integers(0, k, size=n)
    along = rng.normal(size=(n, 3)).astype(np.float32) * 800
    off = rng.normal(size=n).astype(np.float32) * 250
    pos = ck[t] + along - np.sum(along * nk[t], 1, keepdims=True) * nk[t]
    pos = (pos + off[:, None] * nk[t]).astype(np.float32)
    cn = nk[t] + rng.normal(size=(n, 3)).astype(np.float32) * 0.2
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    cn *= rng.choice([-1.0, 1.0], size=(n, 1))
    holes = rng.uniform(size=n) < 0.6
    return (jnp.asarray(pos), jnp.asarray(cn), jnp.asarray(holes),
            jnp.asarray(nk), jnp.asarray(ck), jnp.asarray(bk),
            jnp.asarray(ccdk), jnp.asarray(reach2),
            jnp.asarray(lane_ok), jnp.asarray(rowlut))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("signed", [False, True])
@pytest.mark.parametrize("transposed", [False, True])
def test_adopt_matches_xla_reference(seed, signed, transposed):
    (pos, cn, holes, nk, ck, bk, ccdk, reach2, lane_ok,
     rowlut) = _rand_problem(seed)
    th, th_cos = 300.0, 0.88
    ref_ad, ref_row = _xla_reference(
        pos, cn, holes, nk, ck, bk, ccdk, reach2, lane_ok, rowlut,
        th, th_cos, signed)
    B, tab = pack_adopt_tables(nk, ck, bk, ccdk, reach2, lane_ok,
                               rowlut)
    ad, row, acc = plane_adopt(
        _payload(pos, cn), holes, B, tab, th_thickness=th,
        th_cos=th_cos, signed=signed, tile=256, interpret=True,
        transposed=transposed)
    np.testing.assert_array_equal(np.asarray(ad), np.asarray(ref_ad))
    np.testing.assert_array_equal(
        np.asarray(row)[np.asarray(ad)],
        np.asarray(ref_row)[np.asarray(ref_ad)])
    assert int(np.asarray(ad).sum()) > 20  # the scene exercises adoption


@pytest.mark.parametrize("transposed", [False, True])
def test_adopt_tie_breaks_first_lane(transposed):
    (pos, cn, holes, nk, ck, bk, ccdk, reach2, lane_ok,
     rowlut) = _rand_problem(7, coincide=True)
    lane_ok = jnp.ones_like(lane_ok)  # ties must survive the gates
    th, th_cos = 400.0, 0.5
    ref_ad, ref_row = _xla_reference(
        pos, cn, holes, nk, ck, bk, ccdk, reach2, lane_ok, rowlut,
        th, th_cos, False)
    B, tab = pack_adopt_tables(nk, ck, bk, ccdk, reach2, lane_ok,
                               rowlut)
    ad, row, _ = plane_adopt(
        _payload(pos, cn), holes, B, tab, th_thickness=th,
        th_cos=th_cos, tile=256, interpret=True,
        transposed=transposed)
    np.testing.assert_array_equal(np.asarray(ad), np.asarray(ref_ad))
    np.testing.assert_array_equal(
        np.asarray(row)[np.asarray(ad)],
        np.asarray(ref_row)[np.asarray(ref_ad)])


@pytest.mark.parametrize("transposed", [False, True])
def test_adopt_accumulates_payload_sums(transposed):
    (pos, cn, holes, nk, ck, bk, ccdk, reach2, lane_ok,
     rowlut) = _rand_problem(3, n=1000)
    th, th_cos = 300.0, 0.88
    B, tab = pack_adopt_tables(nk, ck, bk, ccdk, reach2, lane_ok,
                               rowlut)
    pay = _payload(pos, cn)
    ad, row, acc = plane_adopt(
        pay, holes, B, tab, th_thickness=th, th_cos=th_cos,
        tile=256, interpret=True, transposed=transposed)
    # reference: scatter payload by chosen LANE (acc is lane-ordered)
    ref_ad, _ = _xla_reference(
        pos, cn, holes, nk, ck, bk, ccdk, reach2, lane_ok, rowlut,
        th, th_cos, False)
    offk = jnp.dot(pos, nk.T,
                   precision=jax.lax.Precision.HIGHEST) - bk[None, :]
    okk_sel = jnp.where(
        jnp.asarray(ref_ad)[:, None], jnp.abs(offk), jnp.inf)
    # recompute the reference's masked selection to get lanes
    cmag = jnp.abs
    sq = jnp.sum(pos * pos, axis=1, keepdims=True)
    cosk = cmag(jnp.dot(cn, nk.T, precision=jax.lax.Precision.HIGHEST))
    d2k = sq + ccdk[None, :] - 2.0 * jnp.dot(
        pos, ck.T, precision=jax.lax.Precision.HIGHEST)
    inpl2 = jnp.maximum(d2k - offk * offk, 0.0)
    okk = ((jnp.abs(offk) <= th) & (cosk >= th_cos)
           & (inpl2 <= reach2[None, :]) & (lane_ok > 0)[None, :]
           & holes[:, None])
    lane = jnp.argmin(jnp.where(okk, jnp.abs(offk), jnp.inf), axis=1)
    ref_acc = np.zeros((128, 8), np.float32)
    pay_np = np.asarray(pay)
    lane_np, ad_np = np.asarray(lane), np.asarray(ref_ad)
    for i in np.nonzero(ad_np)[0]:
        ref_acc[lane_np[i]] += pay_np[i]
    np.testing.assert_allclose(np.asarray(acc), ref_acc, rtol=1e-6,
                               atol=1e-2)


def test_adopt_padding_rows_never_adopt():
    (pos, cn, holes, nk, ck, bk, ccdk, reach2, lane_ok,
     rowlut) = _rand_problem(5, n=333)  # non-multiple of tile
    B, tab = pack_adopt_tables(nk, ck, bk, ccdk, reach2, lane_ok,
                               rowlut)
    ad, row, acc = plane_adopt(
        _payload(pos, cn), holes, B, tab, th_thickness=300.0,
        th_cos=0.88, tile=256, interpret=True)
    assert ad.shape == (333,) and row.shape == (333,)
    # total adoption count in acc equals the adopted mask popcount
    assert int(np.asarray(acc)[:, 0].sum()) == int(np.asarray(ad).sum())


def test_adopt_tile_skip_branch():
    """Holes concentrated in one tile: the other tiles take the skip
    branch and must still produce zeros + a correct accumulator."""
    (pos, cn, holes, nk, ck, bk, ccdk, reach2, lane_ok,
     rowlut) = _rand_problem(13, n=1024)
    holes = jnp.asarray(
        np.arange(1024) < 100)  # only tile 0 (tile=256) has holes
    th, th_cos = 300.0, 0.88
    ref_ad, ref_row = _xla_reference(
        pos, cn, holes, nk, ck, bk, ccdk, reach2, lane_ok, rowlut,
        th, th_cos, False)
    B, tab = pack_adopt_tables(nk, ck, bk, ccdk, reach2, lane_ok,
                               rowlut)
    ad, row, acc = plane_adopt(
        _payload(pos, cn), holes, B, tab, th_thickness=th,
        th_cos=th_cos, tile=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(ad), np.asarray(ref_ad))
    np.testing.assert_array_equal(
        np.asarray(row)[np.asarray(ad)],
        np.asarray(ref_row)[np.asarray(ref_ad)])
    assert not np.asarray(ad)[100:].any()
    assert int(np.asarray(acc)[:, 0].sum()) == int(np.asarray(ad).sum())
