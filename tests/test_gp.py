"""GP-core tests: FDDs, observations, dense and sparse posteriors."""

import jax
import jax.numpy as jnp
import numpy as np

from gpar_tpu.gp import (
    GP,
    DenseObs,
    Obs,
    PosteriorGP,
    PseudoObs,
    SparsePosteriorGP,
    TitsiasObs,
)
from gpar_tpu.ops import EQ

from .util import approx, all_different

rng = np.random.default_rng(2)


def _key(i=0):
    return jax.random.PRNGKey(i)


def test_fdd_logpdf_vs_manual():
    x = rng.normal(size=(8, 2))
    f = GP(EQ())
    noise = 0.3
    y = rng.normal(size=8)
    K = np.exp(-0.5 * ((x[:, None] - x[None, :]) ** 2).sum(-1)) + noise * np.eye(8)
    sign, logdet = np.linalg.slogdet(K)
    expected = -0.5 * (8 * np.log(2 * np.pi) + logdet + y @ np.linalg.solve(K, y))
    approx(f(x, noise).logpdf(y), expected, atol=1e-8)


def test_fdd_sample_shapes_and_randomness():
    x = rng.normal(size=(6, 1))
    f = GP(EQ())
    s1 = f(x, 0.1).sample(_key(0))
    assert s1.shape == (6, 1)
    s_batch = f(x, 0.1).sample(_key(1), num_samples=4)
    assert s_batch.shape == (4, 6, 1)
    all_different(s1, f(x, 0.1).sample(_key(2)))


def test_obs_logpdf_and_types():
    x = rng.normal(size=(10, 1))
    f = GP(EQ())
    y = np.asarray(f(x, 0.1).sample(_key(3)))
    obs = Obs(f(x, 0.1), y)
    assert isinstance(obs, DenseObs)
    approx(obs.logpdf, f(x, 0.1).logpdf(y), atol=1e-10)


def test_posterior_recovers_data_at_tiny_noise():
    x = rng.normal(size=(10, 1))
    f = GP(EQ())
    y = np.asarray(f(x, 1e-10).sample(_key(4)))[:, 0]
    post = f | Obs(f(x, 1e-10), y)
    assert isinstance(post, PosteriorGP)
    approx(post.mean(x)[:, 0], y, atol=1e-3)
    # Posterior variance collapses at the data.
    assert np.asarray(post.cov_diag(x)).max() < 1e-4


def test_posterior_cov_diag_matches_cov():
    x = rng.normal(size=(8, 2))
    x2 = rng.normal(size=(5, 2))
    f = GP(EQ())
    y = np.asarray(f(x, 0.1).sample(_key(5)))
    post = f | Obs(f(x, 0.1), y)
    approx(post.cov_diag(x2), np.diag(np.asarray(post.cov(x2))), atol=1e-10)


def test_sparse_equals_dense_at_inducing_eq_data():
    # Mirrors the reference parity fixture (``tests/test_model.py:141-149``)
    # including heterogeneous noise noise/w.
    x = rng.normal(size=(10, 2))
    w = rng.uniform(size=10) + 1e-2
    f = GP(EQ())
    noise = 0.1
    y = np.asarray(f(x, 0.1).sample(_key(6)))

    dense = Obs(f(x, noise / w), y)
    sparse = PseudoObs(f(x), f(x, noise / w), y)
    assert isinstance(sparse, TitsiasObs)
    approx(sparse.logpdf, dense.logpdf, atol=1e-6)

    post_d = f | dense
    post_s = f | sparse
    assert isinstance(post_s, SparsePosteriorGP)
    x_test = rng.normal(size=(6, 2))
    approx(post_s.mean(x_test), post_d.mean(x_test), atol=1e-6)
    approx(post_s.cov(x_test), post_d.cov(x_test), atol=1e-6)
    approx(post_s.cov_diag(x_test), post_d.cov_diag(x_test), atol=1e-6)


def test_posterior_of_posterior_equals_joint_conditioning():
    x1 = rng.normal(size=(6, 1))
    x2 = rng.normal(size=(5, 1))
    f = GP(EQ())
    y1 = rng.normal(size=6)
    y2 = rng.normal(size=5)

    post1 = f | Obs(f(x1, 0.1), y1)
    post12 = post1 | Obs(post1(x2, 0.2), y2)

    x_all = np.concatenate([x1, x2])
    y_all = np.concatenate([y1, y2])
    noise_all = np.concatenate([np.full(6, 0.1), np.full(5, 0.2)])
    joint = f | Obs(
        GP(EQ())(x_all, jnp.asarray(noise_all)), y_all
    )

    x_test = rng.normal(size=(4, 1))
    approx(post12.mean(x_test), joint.mean(x_test), atol=1e-8)
    approx(post12.cov(x_test), joint.cov(x_test), atol=1e-8)


def test_posterior_fdd_logpdf():
    # logpdf of new data under a posterior FDD (needed by
    # ``GPARRegressor.logpdf(posterior=True)``).
    x = rng.normal(size=(7, 1))
    f = GP(EQ())
    y = np.asarray(f(x, 0.1).sample(_key(7)))[:, 0]
    post = f | Obs(f(x, 0.1), y)

    K = np.asarray(post.cov(x)) + 0.1 * np.eye(7)
    m = np.asarray(post.mean(x))[:, 0]
    sign, logdet = np.linalg.slogdet(K)
    r = y - m
    expected = -0.5 * (7 * np.log(2 * np.pi) + logdet + r @ np.linalg.solve(K, r))
    approx(post(x, 0.1).logpdf(y), expected, atol=1e-8)


def test_empty_observations():
    x = np.zeros((0, 1))
    f = GP(EQ())
    obs = Obs(f(x, 0.1), np.zeros((0, 1)))
    assert float(obs.logpdf) == 0.0
    post = f | obs
    x_test = rng.normal(size=(3, 1))
    # Posterior with no data falls back to the prior.
    approx(post.mean(x_test), np.zeros((3, 1)), atol=1e-12)
    approx(post.cov(x_test), np.asarray(f.cov(x_test)), atol=1e-12)


def test_pseudo_obs_on_posterior_base_matches_exact():
    # Titsias on a POSTERIOR base GP with inducing == data equals the
    # exact posterior logpdf (the posterior-base analogue of the
    # dense==sparse fixture, reference tests/test_model.py:141-149).
    from gpar_tpu.gp.core import GP, Obs, PseudoObs, condition

    n = 14
    x1 = jnp.asarray(np.sort(rng.uniform(0, 4, n))[:, None])
    y1 = jnp.asarray(np.sin(np.asarray(x1)[:, 0]))
    x2 = jnp.asarray(np.sort(rng.uniform(0, 4, n))[:, None])
    y2 = jnp.asarray(np.cos(np.asarray(x2)[:, 0]))
    noise = jnp.asarray(0.1 + 0.02 * rng.random(n))

    f = GP(EQ())
    f_post = condition(f, Obs(f(x1, 0.05 * jnp.ones(n)), y1))

    exact = f_post(x2, noise).logpdf(y2)
    pobs = PseudoObs(f_post(x2), f_post(x2, noise), y2)
    approx(pobs.logpdf, exact, atol=1e-6)

    # And the resulting sparse posterior's mean at the data matches the
    # exact doubly-conditioned posterior mean.
    f2_exact = condition(f_post, Obs(f_post(x2, noise), y2))
    f2_sparse = condition(f_post, pobs)
    approx(f2_sparse.mean(x2), f2_exact.mean(x2), atol=1e-5)


def test_condition_rejects_structurally_different_process():
    # Conditioning a process on observations built from a structurally
    # different one would attach mismatched factors and produce finite but
    # wrong posteriors — it must raise. Structurally identical copies
    # (same-measure conditioning, as in the joint-conditioning test) pass.
    import pytest

    from gpar_tpu.ops.kernels import Linear

    x = rng.normal(size=(6, 1))
    y = rng.normal(size=6)
    f = GP(EQ())
    obs = Obs(f(x, 0.1), y)
    g = GP(EQ() + Linear())  # different kernel structure
    with pytest.raises(ValueError, match="different process"):
        g | obs
