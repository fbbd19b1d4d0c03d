"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gpar_tpu.gp import GP
from gpar_tpu.ops import EQ, gram, kdiag, titsias_elbo
from gpar_tpu.parallel.sharded import (
    make_mesh,
    pad_rows,
    sharded_sample_batch,
    sharded_titsias_elbo,
)

from .util import approx

rng = np.random.default_rng(7)


def _cpu_mesh(n=8):
    return make_mesh(n, devices=jax.devices("cpu"))


def test_mesh_has_8_devices():
    mesh = _cpu_mesh()
    assert mesh.devices.size == 8


def test_sharded_titsias_matches_single_device():
    n, m, d = 48, 6, 2
    x = jnp.asarray(rng.normal(size=(n, d)))
    z = jnp.asarray(rng.normal(size=(m, d)))
    y = jnp.asarray(rng.normal(size=n))
    noise = jnp.asarray(rng.uniform(0.05, 0.2, size=n))
    kern = 1.3 * EQ().stretch(jnp.asarray([0.9, 1.4]))

    expected = titsias_elbo(
        gram(kern, z, z), gram(kern, z, x), kdiag(kern, x), y, jnp.zeros(n), noise
    )

    mesh = _cpu_mesh()
    got = sharded_titsias_elbo(kern, z, x, y, noise, jnp.ones(n), mesh)
    approx(got, expected, atol=1e-8)


def test_sharded_titsias_with_padding():
    n, m, d = 43, 5, 1  # 43 is not divisible by 8
    x = jnp.asarray(rng.normal(size=(n, d)))
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    y = jnp.asarray(rng.normal(size=n))
    noise = jnp.asarray(rng.uniform(0.05, 0.2, size=n))
    kern = EQ()

    expected = titsias_elbo(
        gram(kern, z, z), gram(kern, z, x), kdiag(kern, x), y, jnp.zeros(n), noise
    )

    mesh = _cpu_mesh()
    xp, mask = pad_rows(x, 8)
    yp, _ = pad_rows(y, 8)
    noisep, _ = pad_rows(noise, 8, value=1.0)  # avoid log(0) on padding
    got = sharded_titsias_elbo(kern, z, xp, yp, noisep, mask, mesh)
    approx(got, expected, atol=1e-8)


def test_sharded_titsias_grad():
    # Hyperparameter gradients must flow through the sharded ELBO (this is
    # the distributed training objective).
    n, m = 32, 4
    x = jnp.asarray(rng.normal(size=(n, 1)))
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    y = jnp.asarray(rng.normal(size=n))
    mesh = _cpu_mesh()

    def obj(log_scale):
        kern = EQ().stretch(jnp.exp(log_scale))
        return -sharded_titsias_elbo(
            kern, z, x, y, jnp.full(n, 0.1), jnp.ones(n), mesh
        )

    g = jax.grad(obj)(jnp.asarray(0.0))
    assert np.isfinite(float(g))

    def obj_ref(log_scale):
        kern = EQ().stretch(jnp.exp(log_scale))
        return -titsias_elbo(
            gram(kern, z, z),
            gram(kern, z, x),
            kdiag(kern, x),
            y,
            jnp.zeros(n),
            jnp.full(n, 0.1),
        )

    approx(g, jax.grad(obj_ref)(jnp.asarray(0.0)), atol=1e-8)


def test_sharded_sample_batch():
    x = jnp.asarray(rng.normal(size=(6, 1)))
    f = GP(EQ())

    def one(key):
        return f(x, 0.1).sample(key)

    mesh = _cpu_mesh()
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    out = sharded_sample_batch(one, keys, mesh)
    assert out.shape == (16, 6, 1)
    # Must equal the unsharded vmap with the same keys.
    expected = jax.vmap(one)(keys)
    approx(out, expected, atol=1e-10)


def test_sharded_titsias_factors_match_pseudo_obs():
    # ELBO + posterior factors from the sharded pass equal the
    # single-device PseudoObs factorisation (gp/core.py).
    from gpar_tpu.gp.core import PseudoObs
    from gpar_tpu.parallel.sharded import sharded_titsias_factors

    mesh = _cpu_mesh()
    n, m = 48, 6
    kern = 1.3 * EQ().stretch(jnp.asarray([0.7]))
    x = jnp.asarray(np.sort(rng.uniform(0, 5, n))[:, None])
    z = jnp.asarray(np.linspace(0, 5, m)[:, None])
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) + 0.05 * rng.standard_normal(n))
    noise = jnp.asarray(0.05 + 0.01 * rng.random(n))

    f = GP(kern)
    obs = PseudoObs(f(z), f(x, noise), y)

    elbo, Lm, LB, beta = sharded_titsias_factors(
        kern, z, x, y, noise, jnp.ones(n), mesh
    )
    approx(elbo, obs.elbo, atol=1e-9)
    approx(Lm, obs.Lm, atol=1e-9)
    approx(LB, obs.LB, atol=1e-9)
    approx(beta, obs.beta, atol=1e-9)


def test_use_mesh_estimator_end_to_end():
    # The public API path: fit + logpdf + predict under use_mesh must match
    # the single-device run (same data, same keys, f64).
    import gpar_tpu
    from gpar_tpu import GPARRegressor

    n, p = 64, 3
    x = np.linspace(0, 8, n)
    rng2 = np.random.default_rng(11)
    y = np.stack(
        [np.sin(x), np.cos(x), np.sin(2 * x)], axis=1
    ) + 0.05 * rng2.standard_normal((n, p))
    x_ind = np.linspace(0, 8, 12)

    def run(mesh):
        reg = GPARRegressor(noise=0.1, x_ind=x_ind, normalise_y=False)
        kw = {"mesh": mesh} if mesh is not None else {}
        reg.fit(x, y, iters=15, **kw)
        lp = reg.logpdf(x, y, **kw)
        pred = reg.predict(
            x, num_samples=8, key=jax.random.PRNGKey(3), **kw
        )
        return reg, lp, pred

    mesh = _cpu_mesh()
    with gpar_tpu.use_mesh(mesh, min_rows=8):
        reg_s, lp_s, pred_s = run(None)  # active via context
    reg_d, lp_d, pred_d = run(None)

    # The sharded moments sum in a different order; the tiny f64 difference
    # compounds through the L-BFGS trajectory, so tolerances are loose-ish.
    for name in reg_d.vs.names:
        approx(reg_s.vs[name], reg_d.vs[name], atol=5e-2)
    approx(lp_s, lp_d, atol=1e-2)
    approx(pred_s, pred_d, atol=5e-2)


def test_mesh_kwarg_sample_sharding_pads_num_samples():
    # num_samples not divisible by the mesh size still returns exactly
    # num_samples samples.
    import gpar_tpu
    from gpar_tpu import GPARRegressor

    n, p = 32, 2
    x = np.linspace(0, 4, n)
    y = np.stack([np.sin(x), np.cos(x)], axis=1)
    reg = GPARRegressor(noise=0.1, normalise_y=False)
    reg.condition(x, y)
    mesh = _cpu_mesh()
    with gpar_tpu.use_mesh(mesh, min_rows=8):
        samples = reg.sample(
            x, posterior=True, num_samples=5, key=jax.random.PRNGKey(0)
        )
    assert isinstance(samples, list) and len(samples) == 5
    assert samples[0].shape == (n, p)


def test_mesh_fit_with_restarts():
    # restarts>1 vmaps each layer's L-BFGS; under an active mesh the
    # objective contains a shard_map (sharded Titsias) — lock in that the
    # vmap-of-shard_map composition works end to end.
    import gpar_tpu
    from gpar_tpu import GPARRegressor

    rng = np.random.default_rng(0)
    n = 64
    x = np.sort(rng.uniform(0, 10, n))
    y = np.stack([np.sin(x), np.cos(np.sin(x)) ** 2], 1)
    y = y + 0.05 * rng.standard_normal((n, 2))
    reg = GPARRegressor(
        noise=0.1, x_ind=np.linspace(0, 10, 8), normalise_y=False
    )
    with gpar_tpu.use_mesh(make_mesh(8, devices=jax.devices("cpu")), min_rows=8):
        reg.fit(x, y, iters=10, restarts=4, key=jax.random.PRNGKey(0))
        mean = reg.predict(x, num_samples=8, key=jax.random.PRNGKey(1))
    assert reg.last_fit_report["restarts"] == 4
    assert np.isfinite(reg.last_fit_report["layer_nll"]).all()
    assert np.isfinite(mean).all()


def test_mesh_fit_predict_single_program():
    # fit_predict composes fit + conditioning + sampling into one program;
    # under an active mesh the Titsias statistics inside it shard_map over
    # the devices. Must match the single-device fit_predict closely.
    import gpar_tpu
    from gpar_tpu import GPARRegressor

    rng = np.random.default_rng(2)
    n = 64
    x = np.sort(rng.uniform(0, 10, n))
    y = np.stack([np.sin(x), np.cos(np.sin(x)) ** 2], 1)
    y = y + 0.05 * rng.standard_normal((n, 2))
    kw = dict(num_samples=16, iters=10, credible_bounds=True)
    K = jax.random.PRNGKey(0)

    r1 = GPARRegressor(noise=0.1, x_ind=np.linspace(0, 10, 8), normalise_y=False)
    m1, lo1, up1 = r1.fit_predict(x, y, key=K, **kw)

    r2 = GPARRegressor(noise=0.1, x_ind=np.linspace(0, 10, 8), normalise_y=False)
    with gpar_tpu.use_mesh(make_mesh(8, devices=jax.devices("cpu")), min_rows=8):
        m2, lo2, up2 = r2.fit_predict(x, y, key=K, **kw)
    # Same keys, same data; only the summation order differs through the
    # sharded moment reduction inside L-BFGS -> small drift.
    np.testing.assert_allclose(m2, m1, atol=1e-2)
    assert np.isfinite(lo2).all() and np.isfinite(up2).all()


# ---------------------------------------------------------------------------
# Row-sharded DENSE path (parallel/dense.py): distributed blocked Cholesky,
# solves and the exact marginal likelihood (VERDICT r1 task 1).
# ---------------------------------------------------------------------------


def test_sharded_dense_factors_match_single_device():
    from gpar_tpu.ops import Linear
    from gpar_tpu.ops.linalg import mvn_logpdf, safe_cholesky, solve_chol
    from gpar_tpu.parallel.dense import sharded_dense_factors

    mesh = _cpu_mesh()
    for n in (96, 130):  # 130 exercises the padding path (not 8*16-aligned)
        d = 2
        x = jnp.asarray(rng.normal(size=(n, d)))
        y = jnp.asarray(rng.normal(size=(n,)))
        noise = jnp.asarray(rng.uniform(0.05, 0.2, size=(n,)))
        kern = EQ().stretch(jnp.asarray([1.0, 0.7])) + Linear().stretch(
            jnp.asarray([2.0, 2.0])
        )

        K = gram(kern, x, x) + jnp.diag(noise)
        L_ref = safe_cholesky(K)
        lp, L, alpha = sharded_dense_factors(kern, x, y, noise, mesh)
        approx(lp, mvn_logpdf(y, jnp.zeros_like(y), K), atol=1e-8)
        approx(L, L_ref, atol=1e-10)
        approx(alpha, solve_chol(L_ref, y), atol=1e-8)


def test_sharded_dense_grad_matches_single_device():
    # The distributed custom VJP (rows of Sigma^{-1} via distributed
    # triangular inversion) must reproduce the single-device gradients —
    # this is the dense multi-chip training objective.
    from gpar_tpu.ops.linalg import mvn_logpdf
    from gpar_tpu.parallel.dense import sharded_dense_logpdf

    mesh = _cpu_mesh()
    n = 72
    x = jnp.asarray(rng.normal(size=(n, 1)))
    y = jnp.asarray(rng.normal(size=(n,)))
    noise = jnp.full((n,), 0.1)

    def f_sh(log_scale, yv):
        kern = EQ().stretch(jnp.exp(log_scale))
        return sharded_dense_logpdf(kern, x, yv, noise, mesh)

    def f_ref(log_scale, yv):
        kern = EQ().stretch(jnp.exp(log_scale))
        K = gram(kern, x, x) + jnp.diag(noise)
        return mvn_logpdf(yv, jnp.zeros_like(yv), K)

    s0 = jnp.asarray(0.3)
    g_sh = jax.grad(f_sh, argnums=(0, 1))(s0, y)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(s0, y)
    approx(g_sh[0], g_ref[0], atol=1e-8)
    approx(g_sh[1], g_ref[1], atol=1e-8)


def test_dense_obs_under_mesh_matches_single_device():
    # The GP-core dispatch: Obs() under an active mesh must produce the
    # same logpdf and the same posterior as the single-device branch.
    import gpar_tpu
    from gpar_tpu.gp import Obs, condition

    n = 64
    x = jnp.asarray(np.sort(rng.uniform(0, 5, n))[:, None])
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) + 0.05 * rng.standard_normal(n))
    noise = jnp.full((n,), 0.1)
    f = GP(1.3 * EQ().stretch(jnp.asarray([0.8])))
    x_star = jnp.asarray(np.linspace(0, 5, 17)[:, None])

    obs_ref = Obs(f(x, noise), y)
    post_ref = condition(f, obs_ref)

    with gpar_tpu.use_mesh(_cpu_mesh(), min_rows=8):
        obs_sh = Obs(f(x, noise), y)
        assert obs_sh.logpdf_val is not None  # really took the sharded path
        post_sh = condition(f, obs_sh)
        mean_sh = post_sh.mean_vec(x_star)
        cov_sh = post_sh.cov(x_star)

    approx(obs_sh.logpdf, obs_ref.logpdf, atol=1e-8)
    approx(mean_sh, post_ref.mean_vec(x_star), atol=1e-8)
    approx(cov_sh, post_ref.cov(x_star), atol=1e-8)


def test_dense_estimator_under_mesh_end_to_end():
    # Public-API dense (no inducing points) fit + logpdf under use_mesh vs
    # single-device: the per-layer objectives now factorise the n x n
    # covariance cooperatively across the 8 devices.
    import gpar_tpu
    from gpar_tpu import GPARRegressor

    n, p = 96, 2
    x = np.linspace(0, 8, n)
    rng2 = np.random.default_rng(5)
    y = np.stack([np.sin(x), np.cos(x)], axis=1)
    y = y + 0.05 * rng2.standard_normal((n, p))

    def run(active):
        reg = GPARRegressor(noise=0.1, normalise_y=False)
        if active:
            with gpar_tpu.use_mesh(_cpu_mesh(), min_rows=8):
                reg.fit(x, y, iters=10, key=jax.random.PRNGKey(0))
                lp = reg.logpdf(x, y)
        else:
            reg.fit(x, y, iters=10, key=jax.random.PRNGKey(0))
            lp = reg.logpdf(x, y)
        return reg, lp

    reg_s, lp_s = run(True)
    reg_d, lp_d = run(False)
    for name in reg_d.vs.names:
        approx(reg_s.vs[name], reg_d.vs[name], atol=1e-4)
    approx(lp_s, lp_d, atol=1e-4)


def test_tpu_x64_mesh_restarts_guard():
    # PERF.md finding 24: a fresh x64 compile of the mesh fit with
    # restarts>1 hard-aborts inside libtpu (memory-space assignment
    # check).  The estimator must refuse that combination with a clear
    # Python error instead of letting the runtime kill the process.  A
    # stub TPU mesh stands in for real hardware: the guard fires before
    # any computation touches the mesh.  The supported alternative — the
    # identical x64 fit with restarts>1 on a CPU mesh — is pinned green
    # by test_mesh_fit_with_restarts above.
    import types

    import pytest

    import gpar_tpu
    from gpar_tpu import GPARRegressor

    fake_dev = types.SimpleNamespace(platform="tpu")
    fake_mesh = types.SimpleNamespace(
        axis_names=("dp",), devices=np.array([fake_dev] * 8, dtype=object)
    )

    rng = np.random.default_rng(0)
    n = 64
    x = np.sort(rng.uniform(0, 10, n))
    y = np.stack([np.sin(x), np.cos(x)], 1)
    reg = GPARRegressor(noise=0.1, normalise_y=False)
    with gpar_tpu.use_mesh(fake_mesh, min_rows=8):
        with pytest.raises(RuntimeError, match="libtpu.*finding\\s*\\n?\\s*24"):
            reg.fit(x, y, iters=3, restarts=2, key=jax.random.PRNGKey(0))
