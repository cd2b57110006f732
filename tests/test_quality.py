"""bij_agreement metric (utils/quality.py) — the bench's quality gate."""

import numpy as np

from buildingsegment_tpu.utils.quality import bij_agreement


def test_perfect_agreement_any_relabeling():
    t = np.array([1, 1, 2, 2, 3, 3, 0])
    p = np.array([9, 9, 4, 4, 1, 1, -1])
    assert bij_agreement(t, p) == 1.0


def test_greedy_matching_counts_majority_pairs():
    t = np.array([1, 1, 1, 2, 2, 3, 0, 0])
    p = np.array([5, 5, 5, 7, 7, 7, -1, -1])
    # (1,5)x3 + (2,7)x2 + (0,-1)x2 matched; (3,7) blocked → 7/8
    assert abs(bij_agreement(t, p) - 7 / 8) < 1e-12


def test_split_and_merge_penalized():
    t = np.array([1] * 8)
    p = np.array([1, 1, 1, 1, 2, 2, 2, 2])  # split in half
    assert abs(bij_agreement(t, p) - 0.5) < 1e-12
    assert abs(bij_agreement(p, t) - 0.5) < 1e-12  # merge, symmetric


def test_negative_labels_round_trip():
    t = np.array([0, 0, 1])
    p = np.array([-1, -1, 4])
    assert bij_agreement(t, p) == 1.0


def test_empty():
    z = np.array([], np.int32)
    assert bij_agreement(z, z) == 1.0


def test_large_vectorized_path():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 50, 200_000)
    perm = rng.permutation(100)
    p = perm[t]  # pure relabeling
    assert bij_agreement(t, p) == 1.0
    p2 = p.copy()
    p2[:20_000] = 99  # 10% corrupted into one bogus label
    a = bij_agreement(t, p2)
    assert 0.88 <= a < 0.95
