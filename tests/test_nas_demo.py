"""Unit tests for the prediction-based NAS demo's pure logic
(tools/nas_demo.py; reference search-split use-case, eval_ghn.py:20)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools'))

from nas_demo import spearman


def test_spearman_perfect_and_inverse():
    a = [1.0, 2.0, 3.0, 4.0]
    assert spearman(a, [10, 20, 30, 40]) == 1.0
    assert spearman(a, [40, 30, 20, 10]) == -1.0


def test_spearman_ties_and_constant():
    # ties get averaged ranks; monotone-with-ties stays strongly positive
    rho = spearman([1, 2, 2, 3], [10, 20, 20, 30])
    assert 0.99 < rho <= 1.0
    assert spearman([1, 1, 1], [1, 2, 3]) == 0.0  # zero variance -> 0, not nan


def test_spearman_is_rank_based():
    # monotone nonlinear transform must not change the coefficient
    rng = np.random.default_rng(0)
    a = rng.normal(size=20)
    b = a + 0.1 * rng.normal(size=20)
    assert abs(spearman(a, b) - spearman(a, np.exp(b))) < 1e-12
