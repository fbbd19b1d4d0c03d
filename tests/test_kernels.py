"""Kernel-algebra unit tests against naive NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_tpu.ops import (
    EQ,
    RQ,
    Const,
    Linear,
    ZeroKernel,
    gram,
    kdiag,
    sq_dists,
)

from .util import approx

rng = np.random.default_rng(0)


@pytest.fixture(params=[1, 3])
def xy(request):
    d = request.param
    return rng.normal(size=(7, d)), rng.normal(size=(5, d))


def naive_sq_dists(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


def test_sq_dists(xy):
    x, y = xy
    approx(sq_dists(jnp.asarray(x), jnp.asarray(y)), naive_sq_dists(x, y), atol=1e-10)


def test_eq(xy):
    x, y = xy
    approx(EQ()(x, y), np.exp(-0.5 * naive_sq_dists(x, y)), atol=1e-12)


def test_rq(xy):
    x, y = xy
    alpha = 0.7
    expected = (1 + naive_sq_dists(x, y) / (2 * alpha)) ** (-alpha)
    approx(RQ(jnp.asarray(alpha))(x, y), expected, atol=1e-12)


def test_linear(xy):
    x, y = xy
    approx(Linear()(x, y), x @ y.T, atol=1e-12)


def test_const_zero(xy):
    x, y = xy
    approx(Const(jnp.asarray(2.5))(x, y), np.full((7, 5), 2.5))
    approx(ZeroKernel()(x, y), np.zeros((7, 5)))


def test_sum_product_scale(xy):
    x, y = xy
    k = 2.0 * EQ() + Linear() * Linear()
    expected = 2.0 * np.exp(-0.5 * naive_sq_dists(x, y)) + (x @ y.T) ** 2
    approx(k(x, y), expected, atol=1e-10)


def test_zero_identity():
    # ZeroKernel is the additive identity and the multiplicative annihilator
    # (``gpar/regression.py:94-95``).
    k = ZeroKernel() + EQ()
    assert isinstance(k, EQ)
    k = EQ() + ZeroKernel()
    assert isinstance(k, EQ)
    assert isinstance(ZeroKernel() * EQ(), ZeroKernel)


def test_stretch(xy):
    x, y = xy
    scales = rng.uniform(0.5, 2.0, size=x.shape[1])
    expected = np.exp(-0.5 * naive_sq_dists(x / scales, y / scales))
    approx(EQ().stretch(jnp.asarray(scales))(x, y), expected, atol=1e-10)


def test_periodic(xy):
    x, y = xy
    d = x.shape[1]
    period = rng.uniform(0.5, 2.0, size=d)

    # Naive: embed each dim to (cos, sin), then EQ in the embedded space.
    def embed(z):
        theta = 2 * np.pi * z / period
        return np.stack([np.cos(theta), np.sin(theta)], axis=-1).reshape(
            z.shape[0], 2 * d
        )

    expected = np.exp(-0.5 * naive_sq_dists(embed(x), embed(y)))
    approx(EQ().periodic(jnp.asarray(period))(x, y), expected, atol=1e-10)

    # Periodicity: shifting an input by its period leaves the kernel fixed.
    approx(
        EQ().periodic(jnp.asarray(period))(x + period, y),
        expected,
        atol=1e-8,
    )


def test_periodic_stretch_composition(xy):
    # The regressor builds EQ().stretch(scales_2m).periodic(periods): stretch
    # applies in the embedded (2m-dim) space (``gpar/regression.py:115-128``).
    x, y = xy
    d = x.shape[1]
    period = rng.uniform(0.5, 2.0, size=d)
    scales = rng.uniform(0.5, 2.0, size=2 * d)

    def embed(z):
        theta = 2 * np.pi * z / period
        return np.stack([np.cos(theta), np.sin(theta)], axis=-1).reshape(
            z.shape[0], 2 * d
        )

    expected = np.exp(-0.5 * naive_sq_dists(embed(x) / scales, embed(y) / scales))
    k = EQ().stretch(jnp.asarray(scales)).periodic(jnp.asarray(period))
    approx(k(x, y), expected, atol=1e-10)


def test_select():
    x = rng.normal(size=(6, 4))
    y = rng.normal(size=(3, 4))
    k = EQ().select([0, 2])
    approx(k(x, y), np.exp(-0.5 * naive_sq_dists(x[:, [0, 2]], y[:, [0, 2]])))


def test_kdiag_matches_gram_diagonal(xy):
    x, _ = xy
    scales = jnp.asarray(rng.uniform(0.5, 2.0, size=x.shape[1]))
    for k in [
        EQ(),
        RQ(jnp.asarray(0.5)),
        Linear(),
        Const(jnp.asarray(1.5)),
        ZeroKernel(),
        2.0 * EQ().stretch(scales) + Linear(),
        EQ().periodic(jnp.asarray(np.full(x.shape[1], 1.3))),
    ]:
        approx(kdiag(k, jnp.asarray(x)), np.diag(np.asarray(k(x, x))), atol=1e-12)


def test_kernel_is_pytree():
    # Hyperparameters must be traceable leaves: jit + grad through a kernel.
    k = 2.0 * EQ().stretch(jnp.asarray([1.0, 2.0])) + Linear()
    leaves, treedef = jax.tree_util.tree_flatten(k)
    k2 = jax.tree_util.tree_unflatten(treedef, leaves)
    x = jnp.asarray(rng.normal(size=(4, 2)))
    approx(k(x, x), k2(x, x))

    def loss(scale):
        return jnp.sum((scale * EQ())(x, x))

    g = jax.grad(loss)(jnp.asarray(1.0))
    assert np.isfinite(np.asarray(g))


def test_vector_inputs_upranked():
    x = rng.normal(size=7)
    approx(EQ()(x), np.exp(-0.5 * naive_sq_dists(x[:, None], x[:, None])))
