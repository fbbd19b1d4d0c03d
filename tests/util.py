"""Test utilities (mirrors the role of the reference ``tests/util.py``)."""

import numpy as np
from numpy.testing import assert_allclose

__all__ = ["approx", "all_different"]


def approx(a, b, rtol=1e-7, atol=1e-12):
    """Assert approximate equality; tuples are compared elementwise."""
    if isinstance(a, tuple) or isinstance(b, tuple):
        assert isinstance(a, tuple) and isinstance(b, tuple)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            approx(x, y, rtol=rtol, atol=atol)
        return
    assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


def all_different(x, y):
    """Assert that two results differ by more than 1e-2 — the randomness
    oracle of the reference suite (pairwise column distances > 1e-2)."""
    x = np.atleast_2d(np.asarray(x, dtype=float))
    y = np.atleast_2d(np.asarray(y, dtype=float))
    # Pairwise distances between all columns of x and all columns of y.
    xc = x.reshape(x.shape[0], -1) if x.ndim == 2 else x
    yc = y.reshape(y.shape[0], -1) if y.ndim == 2 else y
    dists = np.sqrt(
        ((xc.T[:, None, :] - yc.T[None, :, :]) ** 2).sum(-1)
    )
    assert (dists > 1e-2).all(), f"columns not all different: min dist {dists.min()}"
