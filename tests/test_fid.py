"""Frechet distance math tests (the feature-agnostic FID core)."""

import numpy as np
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from evaluate_fid import frechet_distance, stats  # noqa: E402


def test_identical_distributions_zero():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2000, 8))
    mu, cov = stats(x)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_mean_shift():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5000, 4))
    y = x + np.array([2.0, 0, 0, 0])
    fa, fb = stats(x), stats(y)
    d = frechet_distance(*fa, *fb)
    np.testing.assert_allclose(d, 4.0, atol=0.05)  # ||shift||^2


def test_scale_difference():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((200_00, 2))
    y = 2.0 * rng.standard_normal((200_00, 2))
    d = frechet_distance(*stats(x), *stats(y))
    # per-dim (sigma1 - sigma2)^2 = 1; two dims -> ~2
    np.testing.assert_allclose(d, 2.0, atol=0.1)
