"""GPARRegressor behaviour tests, mirroring the reference estimator suite
(``/root/reference/tests/test_regression.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_tpu import GPARRegressor, log_transform, squishing_transform
from gpar_tpu.gp import Obs
from gpar_tpu.models.regressor import (
    _construct_gpar,
    _determine_indices,
    _uprank,
    _vector_from_init,
)

from .util import approx, all_different

rng = np.random.default_rng(4)


# The reference parametrises x-rank x weights as a 3 x 2 grid
# (reference tests/test_regression.py:16-28).  Compiles cost ~0.4 s per op
# signature on this host, so we cover the same surface with three
# representative combinations: bare vector + no weights, (10, 1) + weights,
# (10, 2) + weights.
@pytest.fixture(
    params=[((10,), False), ((10, 1), True), ((10, 2), True)],
    ids=["vec-now", "col-w", "mat-w"],
)
def xw(request):
    shape, use_w = request.param
    x = rng.normal(size=shape)
    w = rng.uniform(size=(10, 2)) + 1 if use_w else None
    return x, w


def test_log_transform():
    x = rng.uniform(size=5)
    f, f_inv = log_transform
    approx(f(f_inv(x)), x, atol=1e-12)


def test_squishing_transform():
    x = rng.normal(size=5)
    f, f_inv = squishing_transform
    approx(f(f_inv(x)), x, atol=1e-12)


def test_vector_from_init():
    approx(_vector_from_init(2, 2), np.array([2, 2]))
    approx(_vector_from_init(np.array([1, 2, 3]), 2), np.array([1, 2]))
    with pytest.raises(ValueError):
        _vector_from_init(rng.normal(size=(2, 2)), 1)
    with pytest.raises(ValueError):
        _vector_from_init(np.array([1, 2]), 3)


def test_determine_indices():
    # No Markov structure.
    assert _determine_indices(1, 0, None) == ([0], [], 0)
    assert _determine_indices(1, 1, None) == ([0], [1], 1)
    assert _determine_indices(1, 2, None) == ([0], [1, 2], 2)
    assert _determine_indices(2, 0, None) == ([0, 1], [], 0)
    assert _determine_indices(2, 1, None) == ([0, 1], [2], 1)
    assert _determine_indices(2, 2, None) == ([0, 1], [2, 3], 2)

    # Markov order 0.
    assert _determine_indices(1, 0, 0) == ([0], [], 0)
    assert _determine_indices(1, 1, 0) == ([0], [], 0)
    assert _determine_indices(1, 2, 0) == ([0], [], 0)
    assert _determine_indices(2, 0, 0) == ([0, 1], [], 0)
    assert _determine_indices(2, 1, 0) == ([0, 1], [], 0)
    assert _determine_indices(2, 2, 0) == ([0, 1], [], 0)

    # Markov order 1.
    assert _determine_indices(1, 0, 1) == ([0], [], 0)
    assert _determine_indices(1, 1, 1) == ([0], [1], 1)
    assert _determine_indices(1, 2, 1) == ([0], [2], 1)
    assert _determine_indices(2, 0, 1) == ([0, 1], [], 0)
    assert _determine_indices(2, 1, 1) == ([0, 1], [2], 1)
    assert _determine_indices(2, 2, 1) == ([0, 1], [3], 1)

    # Markov order 2.
    assert _determine_indices(1, 0, 2) == ([0], [], 0)
    assert _determine_indices(1, 1, 2) == ([0], [1], 1)
    assert _determine_indices(1, 2, 2) == ([0], [1, 2], 2)
    assert _determine_indices(2, 0, 2) == ([0, 1], [], 0)
    assert _determine_indices(2, 1, 2) == ([0, 1], [2], 1)
    assert _determine_indices(2, 2, 2) == ([0, 1], [2, 3], 2)


def test_get_variables():
    gpar = GPARRegressor()
    gpar.vs.get(init=1.0, name="variable")
    variables = gpar.get_variables()
    assert list(variables.keys()) == ["variable"]
    approx(variables["variable"], 1.0)


def test_logpdf(xw):
    x, w = xw
    # A "sensitive" GPAR whose layers we can also compose manually.
    reg = GPARRegressor(
        replace=False,
        impute=False,
        nonlinear=True,
        nonlinear_scale=0.1,
        linear=True,
        linear_scale=10.0,
        noise=1e-2,
        normalise_y=False,
    )
    key = jax.random.PRNGKey(10)
    y = reg.sample(x, w, p=2, latent=True, key=key)

    # Extract the layer models.
    gpar = _construct_gpar(reg, reg.vs, _uprank(jnp.asarray(x)).shape[1], 2)
    f1, noise1 = gpar.layers[0]()
    f2, noise2 = gpar.layers[1]()

    if w is not None:
        noise1_ = noise1 / jnp.asarray(w)[:, 0]
        noise2_ = noise2 / jnp.asarray(w)[:, 1]
    else:
        noise1_, noise2_ = noise1, noise2

    # Under the prior.
    x1 = _uprank(jnp.asarray(x))
    x2 = jnp.concatenate([x1, jnp.asarray(y)[:, 0:1]], axis=1)
    logpdf1 = f1(x1, noise1_).logpdf(y[:, 0])
    logpdf2 = f2(x2, noise2_).logpdf(y[:, 1])
    approx(reg.logpdf(x, y, w), float(logpdf1 + logpdf2), atol=1e-6)

    # Under the posterior.
    f1_post = f1 | Obs(f1(x1, noise1_), y[:, 0])
    f2_post = f2 | Obs(f2(x2, noise2_), y[:, 1])
    logpdf1 = f1_post(x1, noise1_).logpdf(y[:, 0])
    logpdf2 = f2_post(x2, noise2_).logpdf(y[:, 1])
    with pytest.raises(RuntimeError):
        reg.logpdf(x, y, w, posterior=True)
    reg.condition(x, y, w)
    approx(reg.logpdf(x, y, w, posterior=True), float(logpdf1 + logpdf2), atol=1e-6)

    # Sampling missing gives a stochastic estimate.  Explicit keys: with
    # the implicit global stream the two draws can land within the 1e-2
    # all_different threshold depending on how many keys earlier tests
    # consumed (observed once under a different suite ordering).
    y = np.asarray(y).copy()
    y[::2, 0] = np.nan
    all_different(
        reg.logpdf(x, y, w, sample_missing=True, key=jax.random.PRNGKey(101)),
        reg.logpdf(x, y, w, sample_missing=True, key=jax.random.PRNGKey(202)),
    )


def test_logpdf_differentiable(xw):
    x, w = xw
    reg = GPARRegressor(
        replace=False,
        impute=False,
        linear=True,
        linear_scale=1.0,
        nonlinear=False,
        noise=1e-8,
        normalise_y=False,
    )
    y = reg.sample(x, w, p=2, key=jax.random.PRNGKey(11), latent=True)

    # Gradient w.r.t. every variable's latent must exist and be finite
    # (the JAX analogue of the reference's .backward() check,
    # reference tests/test_regression.py:140-157).
    names = reg.vs.names
    assert len(names) > 0
    z0 = reg.vs.latent_vector(names)

    def objective(z):
        view = reg.vs.with_latent_vector(names, z)
        from gpar_tpu.models.regressor import _construct_gpar

        gpar = _construct_gpar(reg, view, _uprank(jnp.asarray(x)).shape[1], 2)
        yj = jnp.asarray(y)
        wj = jnp.ones_like(yj) if w is None else jnp.asarray(w)
        return gpar.logpdf(_uprank(jnp.asarray(x)), yj, wj)

    grad = jax.grad(objective)(z0)
    assert grad.shape == z0.shape
    assert np.isfinite(np.asarray(grad)).all()
    assert (np.asarray(grad) != 0).any()


def test_sample_and_predict(xw):
    x, w = xw
    # Output transform exercises the undo path.
    reg = GPARRegressor(
        replace=False,
        impute=False,
        linear=True,
        linear_scale=1.0,
        nonlinear=False,
        noise=1e-8,
        normalise_y=False,
        transform_y=squishing_transform,
    )

    # Argument checks.
    with pytest.raises(ValueError):
        reg.sample(x, w)
    with pytest.raises(RuntimeError):
        reg.sample(x, w, posterior=True)

    # Output simplification.
    assert isinstance(reg.sample(x, w, p=2), np.ndarray)
    out = reg.sample(x, w, p=2, num_samples=2)
    assert isinstance(out, list) and len(out) == 2

    # Randomness.
    all_different(reg.sample(x, w, p=2), reg.sample(x, w, p=2))
    all_different(
        reg.sample(x, w, p=2, latent=True), reg.sample(x, w, p=2, latent=True)
    )

    # Mean of posterior samples is around the conditioning data.
    y = reg.sample(x, w, p=2, key=jax.random.PRNGKey(12))
    reg.condition(x, y, w)
    approx(
        y,
        np.mean(reg.sample(x, w, posterior=True, num_samples=100), axis=0),
        atol=5e-2,
    )
    approx(
        y,
        np.mean(
            reg.sample(x, w, latent=True, posterior=True, num_samples=100), axis=0
        ),
        atol=5e-2,
    )

    # Prediction is around the data.
    approx(y, reg.predict(x, w, num_samples=100), atol=5e-2)
    approx(y, reg.predict(x, w, latent=True, num_samples=100), atol=5e-2)

    # Prediction is confident.
    _, lowers, uppers = reg.predict(x, w, num_samples=100, credible_bounds=True)
    approx(uppers, lowers, atol=5e-2)


def test_condition_and_fit(xw):
    x, w = xw
    reg = GPARRegressor(
        replace=False, impute=False, normalise_y=True, transform_y=squishing_transform
    )
    y = reg.sample(x, w, p=2, key=jax.random.PRNGKey(13))

    # Data is correctly normalised.
    reg.condition(x, y, w)
    approx(np.mean(np.asarray(reg.y), axis=0), np.zeros(reg.p), atol=1e-10)
    approx(np.std(np.asarray(reg.y), axis=0, ddof=1), np.ones(reg.p), atol=1e-10)

    # Zero-variance outputs are handled.
    y_pathological = y.copy()
    y_pathological[:, 0] = 1
    reg.condition(x, y_pathological, w)
    assert not np.isnan(np.asarray(reg.y)).any()

    # Transforms and normalisers round-trip.
    z = np.linspace(-1, 1, 10)
    z = jnp.stack([jnp.asarray(z), 2 * jnp.asarray(z)], axis=1)
    approx(reg._untransform_y(reg._transform_y(z)), z, atol=1e-10)
    approx(reg._unnormalise_y(reg._normalise_y(z)), z, atol=1e-10)

    # Fitting runs without issues for both paths.
    vs = reg.vs.copy(detach=True)
    reg.fit(x, y, w, fix=False, iters=3)
    reg.vs = vs
    reg.fit(x, y, w, fix=True, iters=3)

    # Greedy raises (parity with the reference, gpar/regression.py:410).
    with pytest.raises(NotImplementedError):
        reg.fit(x, y, w, greedy=True)


def test_features():
    # Optimisation runs for a full-featured GPAR (every kernel option + RQ).
    reg = GPARRegressor(
        replace=True,
        scale=1.0,
        per=True,
        per_period=1.0,
        per_decay=10.0,
        input_linear=True,
        input_linear_scale=0.1,
        linear=True,
        linear_scale=1.0,
        nonlinear=True,
        nonlinear_scale=1.0,
        rq=True,
        noise=0.1,
    )
    x = np.stack([np.linspace(0, 10, 20), np.linspace(10, 20, 20)], axis=1)
    y = reg.sample(x, p=2, key=jax.random.PRNGKey(14))
    reg.fit(x, y, iters=10)


def test_scale_tying():
    x = rng.normal(size=(10, 2))
    w = rng.uniform(size=(10, 2)) + 1
    reg = GPARRegressor(scale_tie=True)
    reg.sample(x, w, p=2, key=jax.random.PRNGKey(15))  # Instantiate variables.
    vs = reg.get_variables()
    assert "0/input/scales" in vs
    assert "1/input/scales" not in vs


def test_inducing_points_uprank():
    reg = GPARRegressor(x_ind=np.linspace(0, 10, 20))
    assert reg.x_ind is not None
    assert reg.x_ind.ndim == 2


def test_markov_zero_is_independent_gps(xw):
    x, w = xw
    # markov=0 removes all output dependencies, so the GPAR logpdf is the
    # sum of independent single-GP logpdfs (the IGP baseline of the paper's
    # synthetic example, reference examples/paper/synthetic.py:42-51).
    reg = GPARRegressor(markov=0, linear=True, nonlinear=True, noise=1e-2,
                        impute=False, normalise_y=False)
    y = reg.sample(x, w, p=2, key=jax.random.PRNGKey(16))

    gpar = _construct_gpar(reg, reg.vs, _uprank(jnp.asarray(x)).shape[1], 2)
    f1, noise1 = gpar.layers[0]()
    f2, noise2 = gpar.layers[1]()
    x1 = _uprank(jnp.asarray(x))
    wj = jnp.ones((10, 2)) if w is None else jnp.asarray(w)
    lp1 = f1(x1, noise1 / wj[:, 0]).logpdf(y[:, 0])
    # Layer 2 sees [x, y1] as inputs but markov=0 selects only x's columns.
    x2 = jnp.concatenate([x1, jnp.asarray(y)[:, 0:1]], axis=1)
    lp2 = f2(x2, noise2 / wj[:, 1]).logpdf(y[:, 1])
    approx(reg.logpdf(x, y, w), float(lp1 + lp2), atol=1e-6)


def test_compat_logpdf_quirk():
    # The reference applies `_unnormalise_y` to the incoming y in logpdf
    # (gpar/regression.py:483) where normalisation is intended.  compat=True
    # (default) reproduces it literally; compat=False applies the fix.
    rng = np.random.default_rng(3)
    x = np.linspace(0, 5, 12)
    y = 3.0 + 2.0 * rng.standard_normal((12, 2))

    reg_c = GPARRegressor(normalise_y=True, impute=False, compat=True)
    reg_f = GPARRegressor(normalise_y=True, impute=False, compat=False)
    reg_c.condition(x, y)
    reg_f.condition(x, y)
    # Same hyperparameters in both stores.
    reg_f.vs._latents = dict(reg_c.vs._latents)
    reg_f.vs._transforms = dict(reg_c.vs._transforms)

    lp_compat = reg_c.logpdf(x, y)
    lp_fixed = reg_f.logpdf(x, y)
    # The two renormalisations genuinely differ on non-standardised data.
    assert abs(lp_compat - lp_fixed) > 1e-3

    # compat=False on the conditioning data evaluates the density of the
    # *normalised* data — identical to normalise_y=False on pre-standardised
    # data with the same hyperparameters.
    y_std = (y - y.mean(axis=0)) / y.std(axis=0, ddof=1)
    reg_n = GPARRegressor(normalise_y=False, impute=False)
    reg_n.condition(x, y_std)
    reg_n.vs._latents = dict(reg_c.vs._latents)
    reg_n.vs._transforms = dict(reg_c.vs._transforms)
    approx(lp_fixed, reg_n.logpdf(x, y_std), atol=1e-6)

    # Without conditioning both modes are the identity: equal values.
    reg_a = GPARRegressor(normalise_y=True, compat=True)
    reg_b = GPARRegressor(normalise_y=True, compat=False)
    ya = reg_a.sample(x, p=2, key=jax.random.PRNGKey(0))
    reg_b.vs._latents = dict(reg_a.vs._latents)
    reg_b.vs._transforms = dict(reg_a.vs._transforms)
    approx(reg_a.logpdf(x, ya), reg_b.logpdf(x, ya), atol=1e-9)


def test_last_fit_report_both_paths(xw):
    x, w = xw
    rng2 = np.random.default_rng(7)
    y = rng2.standard_normal((10, 2))

    reg = GPARRegressor(noise=0.1, normalise_y=False)
    assert reg.last_fit_report is None
    reg.fit(x, y, w, iters=5)  # fused fix=True path
    rep = reg.last_fit_report
    assert rep["fused"] and rep["layer_nll"].shape == (2,)
    assert rep["layer_iters"].shape == (2,) and rep["wall_clock_s"] > 0

    reg2 = GPARRegressor(noise=0.1, normalise_y=False)
    reg2.fit(x, y, w, iters=5, fused=False)  # per-layer driver
    rep2 = reg2.last_fit_report
    assert not rep2["fused"] and rep2["layer_nll"].shape == (2,)


def test_fit_trace_kwarg():
    # Regression: fit(trace=True) crashed with 'multiple values for trace'.
    x = np.linspace(0, 3, 10)
    y = rng.standard_normal((10, 2))
    reg = GPARRegressor(noise=0.1, normalise_y=False)
    reg.fit(x, y, iters=3, trace=True)
    assert reg.last_fit_report is not None


def test_sparse_posterior_logpdf_and_sample_missing():
    # Regression: posterior logpdf on a sparse (inducing-point) model
    # raised NotImplementedError; the reference supports it
    # (gpar/regression.py:461-506 with x_ind set).
    x = np.linspace(0, 6, 24)
    y = np.stack([np.sin(x), np.cos(x)], axis=1)
    x_ind = np.linspace(0, 6, 8)
    reg = GPARRegressor(noise=0.05, x_ind=x_ind, normalise_y=False,
                        impute=False)
    reg.condition(x, y)
    lp_post = reg.logpdf(x, y, posterior=True)
    lp_prior = reg.logpdf(x, y)
    assert np.isfinite(lp_post) and np.isfinite(lp_prior)
    # Conditioning on the data must raise its (approximate) likelihood.
    assert lp_post > lp_prior

    # sample_missing on the conditioned sparse model exercises the same
    # posterior-base PseudoObs path.
    y_miss = y.copy()
    y_miss[::3, 0] = np.nan
    v = reg.logpdf(x, y_miss, sample_missing=True, posterior=True,
                   key=jax.random.PRNGKey(0))
    assert np.isfinite(v)


def test_fit_restarts_fused_and_per_layer():
    # restarts= on both fit paths: report records it, NLL never worse than
    # the single-start fit from the same inits.
    import jax

    rng = np.random.default_rng(3)
    x = np.linspace(0, 8, 30)
    y = np.stack([np.sin(x), np.cos(x)], axis=1) + 0.05 * rng.standard_normal((30, 2))

    r1 = GPARRegressor(noise=0.1, normalise_y=False)
    r1.fit(x, y, iters=30)
    nll1 = r1.last_fit_report["layer_nll"].sum()

    r2 = GPARRegressor(noise=0.1, normalise_y=False)
    r2.fit(x, y, iters=30, restarts=4, key=jax.random.PRNGKey(0))
    assert r2.last_fit_report["restarts"] == 4
    nll2 = r2.last_fit_report["layer_nll"].sum()
    assert nll2 <= nll1 + 1e-6

    r3 = GPARRegressor(noise=0.1, normalise_y=False)
    r3.fit(x, y, iters=30, fused=False, restarts=4, key=jax.random.PRNGKey(0))
    assert np.isfinite(r3.last_fit_report["layer_nll"]).all()


def test_jit_cache_respects_config_changes():
    # Trace-time config knobs (jitter, Cholesky dispatch) are baked into
    # compiled programs as constants; changing one between calls must
    # retrace, not silently reuse a stale executable.
    from gpar_tpu.config import config

    rng = np.random.default_rng(5)
    x = np.linspace(0, 5, 20)
    y = np.stack([np.sin(x), np.cos(x)], axis=1) + 0.05 * rng.standard_normal((20, 2))
    r = GPARRegressor(noise=0.1, normalise_y=False)
    r.condition(x, y)
    # The bucketed logpdf programs live in the cross-instance shared
    # cache; both caches key on mesh_descriptor(), which carries the
    # numeric-config knobs.
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    old_eps = config.epsilon
    try:
        lp1 = r.logpdf(x, y, posterior=True)
        n_jit = len(r._jit_cache)
        keys_before = set(_SHARED_JIT_CACHE)
        config.epsilon = 1e-4  # very different jitter
        lp2 = r.logpdf(x, y, posterior=True)
        # Retraced, not reused: genuinely NEW program entries for the new
        # jitter (key-set membership, not counts — the shared cache is a
        # bounded LRU and may be at capacity mid-suite).
        assert (
            set(_SHARED_JIT_CACHE) - keys_before
            or len(r._jit_cache) > n_jit
        )
        assert lp1 != lp2  # the new jitter actually took effect
    finally:
        config.epsilon = old_eps


def test_fit_predict_matches_fit_then_predict():
    # fit_predict composes the fused fit and the prediction into one XLA
    # program; with aligned keys it must reproduce fit() + predict()
    # exactly (same deterministic fit, same sampling chain, same
    # percentile convention).
    import jax

    rng = np.random.default_rng(11)
    x = np.linspace(0, 8, 40)
    y = np.stack([np.sin(x), np.cos(x) ** 2], axis=1)
    y = y + 0.05 * rng.standard_normal((40, 2))
    x_test = np.linspace(0, 8, 17)
    K = jax.random.PRNGKey(3)

    r1 = GPARRegressor(noise=0.1, x_ind=np.linspace(0, 8, 8))
    r1.fit(x, y, iters=25)
    m1, lo1, up1 = r1.predict(
        x_test,
        num_samples=30,
        credible_bounds=True,
        key=jax.random.split(K)[1],
    )

    r2 = GPARRegressor(noise=0.1, x_ind=np.linspace(0, 8, 8))
    m2, lo2, up2 = r2.fit_predict(
        x, y, x_test, num_samples=30, credible_bounds=True, iters=25, key=K
    )
    assert r2.last_fit_report["fused"] is True
    np.testing.assert_allclose(m2, m1, atol=1e-8)
    np.testing.assert_allclose(lo2, lo1, atol=1e-8)
    np.testing.assert_allclose(up2, up1, atol=1e-8)
    # The store ends up in the same fitted state.
    for name, v in r1.get_variables().items():
        np.testing.assert_allclose(r2.get_variables()[name], v, atol=1e-10)


def test_fit_predict_defaults_and_mean_only():
    rng = np.random.default_rng(12)
    x = np.linspace(0, 5, 30)
    y = np.stack([np.sin(x), np.cos(x)], axis=1) + 0.05 * rng.standard_normal((30, 2))
    r = GPARRegressor(noise=0.1, normalise_y=False)
    mean = r.fit_predict(x, y, iters=20, num_samples=40)
    assert mean.shape == y.shape
    assert np.sqrt(np.mean((mean - y) ** 2)) < 0.2
    with pytest.raises(TypeError, match="Unsupported"):
        r.fit_predict(x, y, itres=5)
