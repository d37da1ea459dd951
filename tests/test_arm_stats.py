"""Statistical helpers behind the cross-framework Chamfer evidence
(tools/arm_stats.py): the exact unpaired permutation test, the exact
paired sign-flip test, and the t-interval on the paired mean
difference. These numbers gate the accuracy story (BASELINE.md 5%
Chamfer bar), so their math gets pinned here.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.arm_stats import paired_ci, perm_test, sign_flip_test


def test_perm_test_identity_split_counts_toward_p():
    # Identical groups: every split ties the observed diff -> p == 1.
    obs, p, total = perm_test([1.0, 2.0], [1.0, 2.0])
    assert obs == 0.0 and p == 1.0 and total == 6


def test_perm_test_extreme_separation_hits_floor():
    # Disjoint groups: only the identity and the full swap reach the
    # observed |mean diff|, so p = 2 / C(6,3).
    obs, p, total = perm_test([0.0, 0.1, 0.2], [10.0, 10.1, 10.2])
    assert total == 20
    assert p == pytest.approx(2 / 20)


def test_perm_test_matches_brute_force_reference():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 4).tolist()
    b = rng.normal(0.5, 1, 4).tolist()
    obs, p, total = perm_test(a, b)
    # brute-force recount with an independent implementation
    import itertools
    pooled = np.array(a + b)
    count = 0
    for comb in itertools.combinations(range(8), 4):
        m = np.zeros(8, bool)
        m[list(comb)] = True
        count += abs(pooled[~m].mean() - pooled[m].mean()) >= obs - 1e-12
    assert total == 70 and p == pytest.approx(count / 70)


def test_perm_test_size_guard():
    with pytest.raises(AssertionError, match="Monte Carlo"):
        perm_test(list(range(15)), list(range(15)), max_splits=1000)


def test_sign_flip_floor_same_side_pairs():
    # All diffs on one side: only the all-+ and all-- sign vectors
    # reach |mean|, so p = 2/2^n (the design's documented floor).
    for n in (2, 3, 4):
        d = [0.1 + 0.01 * i for i in range(n)]
        obs, p, total = sign_flip_test(d)
        assert total == 2 ** n
        assert p == pytest.approx(2 / 2 ** n)


def test_sign_flip_mixed_signs_is_inconclusive():
    obs, p, _ = sign_flip_test([0.1, -0.1])
    assert p == 1.0  # every sign vector ties |mean| = 0 .. symmetric


def test_paired_ci_matches_hand_t_interval():
    d = [0.10, 0.14, 0.08, 0.12]
    lo, hi = paired_ci(d)
    se = np.std(d, ddof=1) / np.sqrt(4)
    # n=4 pairs -> df=3 -> t_{0.975,3} = 3.182
    assert lo == pytest.approx(np.mean(d) - 3.182 * se, rel=1e-9)
    assert hi == pytest.approx(np.mean(d) + 3.182 * se, rel=1e-9)
    assert lo < np.mean(d) < hi


def test_paired_ci_covers_zero_for_noise():
    # Zero-mean pairs: the interval must straddle 0.
    lo, hi = paired_ci([0.05, -0.05, 0.03, -0.03])
    assert lo < 0 < hi
