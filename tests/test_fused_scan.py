"""Scan-fused fit (models/fused.py) oracle tests: the shape-uniform
``lax.scan`` whole-fit body must reproduce the per-layer driver and the
round-1 unrolled fused body across the full configuration surface
(sparse/dense, impute/replace, missing data, markov, rq, per,
input_linear, scale_tie, restarts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_tpu import GPARRegressor

from .util import approx

rng = np.random.default_rng(21)


def _data(n=40, p=3, missing=False, seed=3):
    r = np.random.default_rng(seed)
    x = np.sort(r.uniform(0, 6, n))
    cols = [np.sin(x)]
    for i in range(1, p):
        cols.append(np.cos(cols[-1]) + 0.3 * np.sin((i + 1) * x))
    y = np.stack(cols, 1) + 0.05 * r.standard_normal((n, p))
    if missing:
        y[r.uniform(size=(n, p)) < 0.15] = np.nan
        y[0, :] = np.nan_to_num(y[0, :], nan=0.1)  # keep every layer non-empty
    return x, y


def _fit_pair(make_reg, x, y, iters=6, **fit_kw):
    """Fit twice from identical inits: scan body vs unrolled body."""
    key = jax.random.PRNGKey(0)
    r_scan = make_reg()
    r_scan.fit(x, y, iters=iters, fused=True, key=key, **fit_kw)
    r_unroll = make_reg()
    r_unroll.fit(x, y, iters=iters, fused="unroll", key=key, **fit_kw)
    return r_scan, r_unroll


CONFIGS = {
    "dense-impute": dict(noise=0.1, impute=True, normalise_y=True),
    "dense-replace": dict(noise=0.1, impute=False, replace=True, normalise_y=False),
    "sparse-impute-replace": dict(
        noise=0.1, impute=True, replace=True, normalise_y=True, x_ind=np.linspace(0, 6, 9)
    ),
    "markov-rq": dict(noise=0.1, markov=1, rq=True, normalise_y=False),
    "per-inlin-scaletie": dict(
        noise=0.1,
        per=True,
        per_period=2.0,
        input_linear=True,
        scale_tie=True,
        normalise_y=True,
    ),
    "nonlinear": dict(noise=0.1, nonlinear=True, linear=False, normalise_y=True),
    # markov=0 + nonlinear: the reference's output term conditions on the
    # LAYER index (``gpar/regression.py:141,149``), so an empty selection
    # degenerates the nonlinear kernel to a CONSTANT variance term — the
    # scan body's nl_gate must keep it (r5 regression: the gate keyed on
    # selection width and silently dropped the constant for every
    # markov=0 fit; caught through the fused logpdf oracle).
    "markov0-nonlinear": dict(
        noise=0.1, markov=0, nonlinear=True, normalise_y=False
    ),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_scan_fit_matches_unrolled(name):
    kw = dict(CONFIGS[name])
    missing = "impute" in name or name == "sparse-impute-replace"
    x, y = _data(missing=missing)

    # Strict oracle at iters=0: no optimiser steps, so every layer's NLL
    # and the input-augmentation threading are compared at the *initial*
    # hyperparameters — same math, different summation shapes only.
    r0_scan, r0_unroll = _fit_pair(lambda: GPARRegressor(**kw), x, y, iters=0)
    approx(
        r0_scan.last_fit_report["layer_nll"],
        r0_unroll.last_fit_report["layer_nll"],
        atol=1e-8,
    )

    # With optimisation: trajectories may drift at rounding level through
    # linesearch accept/reject decisions (each layer's optimum feeds the
    # next layer's inputs), so tolerances are loose-ish; the optima and
    # the learned hyperparameters must still agree.
    r_scan, r_unroll = _fit_pair(lambda: GPARRegressor(**kw), x, y)
    approx(
        r_scan.last_fit_report["layer_nll"],
        r_unroll.last_fit_report["layer_nll"],
        rtol=1e-4,
        atol=1e-4,
    )
    for n_ in r_unroll.vs.names:
        approx(r_scan.vs[n_], r_unroll.vs[n_], rtol=2e-3, atol=2e-3)


def test_scan_fit_matches_per_layer_driver():
    # Independent oracle: the host-driven per-layer loop
    # (fit(fused=False)), which contains none of the uniform-shape
    # machinery.
    x, y = _data(missing=True)
    make = lambda: GPARRegressor(
        noise=0.1, impute=True, normalise_y=True, x_ind=np.linspace(0, 6, 9)
    )
    r_scan = make()
    r_scan.fit(x, y, iters=6, fused=True, key=jax.random.PRNGKey(0))
    r_driver = make()
    r_driver.fit(x, y, iters=6, fused=False, key=jax.random.PRNGKey(0))
    approx(
        np.sum(r_scan.last_fit_report["layer_nll"]),
        np.sum(r_driver.last_fit_report["layer_nll"]),
        rtol=1e-4,
        atol=1e-4,
    )
    for n_ in r_driver.vs.names:
        approx(r_scan.vs[n_], r_driver.vs[n_], rtol=2e-3, atol=2e-3)


def test_scan_fit_predict_matches_unrolled():
    x, y = _data()
    kw = dict(noise=0.1, impute=True, replace=True, normalise_y=True,
              x_ind=np.linspace(0, 6, 9))
    key = jax.random.PRNGKey(7)
    r1 = GPARRegressor(**kw)
    m1, lo1, hi1 = r1.fit_predict(
        x, y, x, iters=6, num_samples=12, credible_bounds=True, key=key,
        fused=True,
    )
    r2 = GPARRegressor(**kw)
    m2, lo2, hi2 = r2.fit_predict(
        x, y, x, iters=6, num_samples=12, credible_bounds=True, key=key,
        fused="unroll",
    )
    approx(m1, m2, atol=1e-4)
    approx(lo1, lo2, atol=1e-3)
    approx(hi1, hi2, atol=1e-3)


def test_scan_fit_restarts():
    x, y = _data()
    reg = GPARRegressor(noise=0.1, normalise_y=True)
    reg.fit(x, y, iters=6, restarts=3, key=jax.random.PRNGKey(1))
    assert reg.last_fit_report["restarts"] == 3
    assert np.isfinite(reg.last_fit_report["layer_nll"]).all()
    # Multi-start can only improve (or match) the single-start optimum.
    reg1 = GPARRegressor(noise=0.1, normalise_y=True)
    reg1.fit(x, y, iters=6, key=jax.random.PRNGKey(1))
    assert (
        np.sum(reg.last_fit_report["layer_nll"])
        <= np.sum(reg1.last_fit_report["layer_nll"]) + 1e-6
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(noise=0.1, normalise_y=True),
        dict(noise=0.1, impute=True, normalise_y=True),
        dict(noise=0.1, x_ind=np.linspace(0, 6, 9), normalise_y=False),
    ],
    ids=["dense", "dense-impute", "sparse"],
)
def test_free_fused_fit_matches_driver(kw):
    # fit(fix=False) fused (one XLA program, full-chain objective per
    # layer, VERDICT r1 task 6) vs the host-driven per-layer loop — the
    # reference semantics (gpar/regression.py:452-456, the Jura workload).
    missing = "impute" in kw
    x, y = _data(missing=missing)
    key = jax.random.PRNGKey(0)

    # Strict at iters=0: the reported layer_nll is the full-chain NLL at
    # the initial hyperparameters on both paths.
    rf0 = GPARRegressor(**kw)
    rf0.fit(x, y, iters=0, fix=False, fused=True, key=key)
    rd0 = GPARRegressor(**kw)
    rd0.fit(x, y, iters=0, fix=False, fused=False, key=key)
    approx(
        rf0.last_fit_report["layer_nll"],
        rd0.last_fit_report["layer_nll"],
        atol=1e-8,
    )
    assert rf0.last_fit_report["fused"] and not rd0.last_fit_report["fused"]

    # The unrolled free body (fused="unroll") remains the oracle between
    # the driver and the scan body: strict at iters=0.
    ru0 = GPARRegressor(**kw)
    ru0.fit(x, y, iters=0, fix=False, fused="unroll", key=key)
    approx(
        ru0.last_fit_report["layer_nll"],
        rd0.last_fit_report["layer_nll"],
        atol=1e-8,
    )

    # With optimisation: same math, trajectories may drift at rounding
    # level through linesearch accept/reject decisions.
    rf = GPARRegressor(**kw)
    rf.fit(x, y, iters=6, fix=False, fused=True, key=key)
    rd = GPARRegressor(**kw)
    rd.fit(x, y, iters=6, fix=False, fused=False, key=key)
    approx(
        rf.last_fit_report["layer_nll"],
        rd.last_fit_report["layer_nll"],
        rtol=1e-4,
        atol=1e-4,
    )
    for n_ in rd.vs.names:
        approx(rf.vs[n_], rd.vs[n_], rtol=2e-3, atol=2e-3)


def test_free_scan_fit_compile_size_o1_in_p():
    # VERDICT r3 №3: fit(fix=False) must compile one layer body instead
    # of the unrolled builder's O(p^2/2) — the lowered HLO of the scan
    # free body must not grow with p (only shapes change).
    import jax.numpy as jnp

    from gpar_tpu.models.fused import (
        build_scan_fit_plan,
        make_scan_free_fit_body,
    )

    sizes = {}
    for p in (3, 6):
        x, y = _data(n=24, p=p)
        reg = GPARRegressor(noise=0.1, normalise_y=True)
        reg.condition(x, y)
        reg._ensure_vars(reg.p)
        names = reg.vs.select(None)
        plan = build_scan_fit_plan(reg, names)
        body = make_scan_free_fit_body(plan, None, 5, 1e-9, 10, 1, 1.0)
        z = reg.vs.latent_vector(names)
        keys = jnp.zeros((p, 2), dtype=jnp.uint32)
        txt = jax.jit(body).lower(z, reg.x, keys).as_text()
        sizes[p] = len(txt.splitlines())
    assert sizes[6] < 1.3 * sizes[3], sizes


def test_free_fit_batched_body_rejected():
    # fused="batched" optimises layers independently; fix=False optimises
    # them jointly — the combination must raise, not silently mis-fit.
    x, y = _data()
    reg = GPARRegressor(noise=0.1, normalise_y=True)
    with pytest.raises(ValueError, match="batched"):
        reg.fit(x, y, iters=2, fix=False, fused="batched")


@pytest.mark.parametrize("latent", [False, True], ids=["observed", "latent"])
@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_scan_predict_tail_matches_unrolled(sparse, latent):
    # Posterior sampling via the scan tail (models/fused.py,
    # make_scan_predict_tail) vs the unrolled vmapped ancestral chain.
    # The tail replicates _sample_chain's per-sample key stream exactly,
    # so this is a bit-compatibility oracle, not a statistical one.
    from gpar_tpu import config

    x, y = _data(missing=True)
    kw = dict(noise=0.1, impute=True, replace=True, normalise_y=True)
    if sparse:
        kw["x_ind"] = np.linspace(0, 6, 9)
    reg = GPARRegressor(**kw)
    reg.fit(x, y, iters=4, key=jax.random.PRNGKey(0))
    x_test = np.linspace(-0.5, 6.5, 23)
    key = jax.random.PRNGKey(5)

    assert config.scan_predict  # default on
    s_scan = reg.sample(
        x_test, posterior=True, num_samples=4, latent=latent, key=key
    )
    try:
        config.scan_predict = False
        s_unroll = reg.sample(
            x_test, posterior=True, num_samples=4, latent=latent, key=key
        )
    finally:
        config.scan_predict = True
    # Observed samples bit-match (the per-point noise keeps the covariance
    # well-conditioned, so psd_sample_factor is stable).  Latent posterior
    # covariances are near-singular at in-range test points; the PSD factor
    # of a barely-PD matrix amplifies the ~1e-12 masked-vs-filtered rounding
    # difference to ~1e-5 — both factors F satisfy F F^T == cov to 1e-10,
    # i.e. the same distribution, just not the same factor bits.
    tol = 2e-3 if latent else 1e-9
    for a, b in zip(s_scan, s_unroll):
        approx(a, b, atol=tol)


def test_scan_predict_tail_mean_chain_oracle():
    # The tail's deterministic per-layer posterior means (the replace=True
    # chained inputs) == chaining f.mean through the conditioned unrolled
    # GPAR — an RNG-independent oracle of the conditioning algebra.
    import jax.numpy as jnp

    from gpar_tpu.models.fused import build_scan_fit_plan, make_scan_predict_tail
    from gpar_tpu.models.regressor import _construct_gpar

    x, y = _data(missing=True)
    kw = dict(
        noise=0.1, impute=True, replace=True, normalise_y=True,
        x_ind=np.linspace(0, 6, 9),
    )
    reg = GPARRegressor(**kw)
    reg.fit(x, y, iters=4, key=jax.random.PRNGKey(0))

    names = reg.vs.select(None)
    plan = build_scan_fit_plan(reg, names)
    tail = make_scan_predict_tail(plan, reg.x_ind, latent=False)
    x_test = jnp.asarray(np.linspace(0.2, 5.8, 17))[:, None]
    w_test = jnp.ones((17, reg.p), dtype=x_test.dtype)
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    _, mean_chain = tail(
        reg.vs.latent_vector(names), reg.x, x_test, w_test.T, keys
    )

    gpar = _construct_gpar(reg, reg.vs, reg.m, reg.p)
    gpar = gpar | (reg.x, reg._y_cache, None)
    x_cur = x_test
    for pi, model in enumerate(gpar.layers):
        f, _ = model()
        mu = f.mean(x_cur)
        approx(np.asarray(mean_chain)[:, pi], np.asarray(mu)[:, 0], atol=1e-9)
        x_cur = jnp.concatenate([x_cur, mu], axis=1)


def test_scan_predict_tail_requires_replace():
    from gpar_tpu.models.fused import build_scan_fit_plan, make_scan_predict_tail

    x, y = _data()
    reg = GPARRegressor(noise=0.1, impute=True, replace=False, normalise_y=True)
    reg.fit(x, y, iters=0, key=jax.random.PRNGKey(0))
    plan = build_scan_fit_plan(reg, reg.vs.select(None))
    with pytest.raises(ValueError, match="replace=True"):
        make_scan_predict_tail(plan, None, latent=False)


@pytest.mark.parametrize("sparse", [False, True])
def test_posterior_factor_cache_matches_uncached(sparse):
    # Repeated-serving fast path (regressor._posterior_factors +
    # models/fused.make_scan_posterior_factors/make_scan_cached_tail):
    # sampling from cached per-layer factors must reproduce the
    # re-conditioning single-scan tail exactly, and the second call must
    # reuse the cached slot rather than recomputing.
    from gpar_tpu import config

    x, y = _data(missing=True)
    kw = dict(noise=0.1, impute=True, replace=True, normalise_y=True)
    if sparse:
        kw["x_ind"] = np.linspace(0, 6, 9)
    reg = GPARRegressor(**kw)
    reg.fit(x, y, iters=4, key=jax.random.PRNGKey(0))
    x_test = np.linspace(-0.5, 6.5, 23)
    key = jax.random.PRNGKey(7)

    assert config.posterior_cache  # default on
    assert reg.precompute() is True
    slot = reg._factor_cache
    assert slot is not None
    s_cached = reg.sample(x_test, posterior=True, num_samples=3, key=key)
    assert reg._factor_cache is slot  # predict reused the precomputed slot
    s_cached2 = reg.sample(x_test, posterior=True, num_samples=3, key=key)
    try:
        config.posterior_cache = False
        s_plain = reg.sample(x_test, posterior=True, num_samples=3, key=key)
    finally:
        config.posterior_cache = True
    for a, b in zip(s_cached, s_cached2):
        approx(a, b, atol=0)  # cache hit is deterministic
    for a, b in zip(s_cached, s_plain):
        approx(a, b, atol=1e-9)


def test_posterior_factor_cache_invalidates_on_refit():
    from gpar_tpu import config

    x, y = _data()
    reg = GPARRegressor(
        noise=0.1, replace=True, normalise_y=True, x_ind=np.linspace(0, 6, 9)
    )
    reg.fit(x, y, iters=2, key=jax.random.PRNGKey(0))
    x_test = np.linspace(0, 6, 17)
    key = jax.random.PRNGKey(11)
    reg.sample(x_test, posterior=True, num_samples=2, key=key)
    old_key = reg._factor_cache[0]

    # Refit to a different optimum: the latent vector changes, the slot
    # must be replaced, and the cached prediction must equal a fresh
    # uncached one at the NEW hyperparameters.
    reg.fit(x, y, iters=8, key=jax.random.PRNGKey(1))
    s_cached = reg.sample(x_test, posterior=True, num_samples=2, key=key)
    assert reg._factor_cache[0] != old_key
    try:
        config.posterior_cache = False
        s_plain = reg.sample(x_test, posterior=True, num_samples=2, key=key)
    finally:
        config.posterior_cache = True
    for a, b in zip(s_cached, s_plain):
        approx(a, b, atol=1e-9)

    # Reconditioning on new data releases the slot eagerly.
    reg.condition(x, y + 0.1)
    assert reg._factor_cache is None


def test_fit_predict_seeds_factor_cache():
    # fit_predict's fused program returns the per-layer factors it already
    # computed, seeding the repeated-serving cache: the follow-up sample
    # must reuse the slot (no factor recomputation) and match an uncached
    # re-conditioning run at the fitted hyperparameters.
    from gpar_tpu import config

    x, y = _data()
    reg = GPARRegressor(
        noise=0.1, replace=True, impute=True, normalise_y=True,
        x_ind=np.linspace(0, 6, 9),
    )
    x_test = np.linspace(0, 6, 15)
    reg.fit_predict(x, y, x_test, iters=3, num_samples=4,
                    key=jax.random.PRNGKey(0))
    slot = reg._factor_cache
    assert slot is not None
    key = jax.random.PRNGKey(2)
    s = reg.sample(x_test, posterior=True, num_samples=2, key=key)
    assert reg._factor_cache is slot  # hit, not recomputed
    try:
        config.posterior_cache = False
        s2 = reg.sample(x_test, posterior=True, num_samples=2, key=key)
    finally:
        config.posterior_cache = True
    for a, b in zip(s, s2):
        approx(a, b, atol=1e-9)


def test_precompute_ineligible_paths():
    from gpar_tpu import config

    x, y = _data()
    # replace=False: the ancestral tail consumes cached factors too.
    reg = GPARRegressor(noise=0.1, replace=False, normalise_y=True)
    reg.fit(x, y, iters=0, key=jax.random.PRNGKey(0))
    assert reg.precompute() is True
    assert reg._factor_cache is not None
    # config.scan_predict off: nothing to precompute for.
    try:
        config.scan_predict = False
        reg._factor_cache = None
        assert reg.precompute() is False
    finally:
        config.scan_predict = True
    # Unconditioned: clear error.
    with pytest.raises(RuntimeError, match="condition"):
        GPARRegressor(noise=0.1).precompute()
    # Dense factor stack over the byte budget falls back to
    # re-conditioning (and still samples correctly).
    reg2 = GPARRegressor(noise=0.1, replace=True, normalise_y=True)
    reg2.fit(x, y, iters=0, key=jax.random.PRNGKey(0))
    old = config.posterior_cache_max_bytes
    try:
        config.posterior_cache_max_bytes = 8
        assert reg2.precompute() is False
        s = reg2.sample(
            np.linspace(0, 6, 9), posterior=True, num_samples=2,
            key=jax.random.PRNGKey(3),
        )
        assert reg2._factor_cache is None
        assert all(np.isfinite(si).all() for si in s)
    finally:
        config.posterior_cache_max_bytes = old


def test_gate_kernel_equals_select():
    # The Gate combinator (ops/kernels.py) is the shape-uniform select:
    # gating out columns must equal statically selecting the complement.
    from gpar_tpu.ops import EQ, Linear, gram, kdiag

    x = jnp.asarray(rng.normal(size=(9, 4)))
    y = jnp.asarray(rng.normal(size=(7, 4)))
    scales = jnp.asarray([0.5, 1.5, 0.8, 2.0])
    gates = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    # EQ over gated inputs == EQ over the selected columns.
    kg = EQ().stretch(scales).gate(gates)
    ks = EQ().stretch(scales[np.asarray([0, 2])])
    approx(gram(kg, x, y), gram(ks, x[:, [0, 2]], y[:, [0, 2]]), atol=1e-12)
    approx(kdiag(kg, x), kdiag(ks, x[:, [0, 2]]), atol=1e-12)
    kgl = Linear().stretch(scales).gate(gates)
    ksl = Linear().stretch(scales[np.asarray([0, 2])])
    approx(gram(kgl, x, y), gram(ksl, x[:, [0, 2]], y[:, [0, 2]]), atol=1e-12)
    # Periodic: gated dims embed to the same constant point on both sides
    # -> zero distance contribution, equal to selecting the active dims.
    per = jnp.asarray([1.3, 0.7, 2.0, 1.1])
    s8 = jnp.asarray(rng.uniform(0.5, 2.0, size=8))
    kgp = EQ().stretch(s8).periodic(per).gate(gates)
    ksp = EQ().stretch(s8[np.asarray([0, 1, 4, 5])]).periodic(per[np.asarray([0, 2])])
    approx(gram(kgp, x, y), gram(ksp, x[:, [0, 2]], y[:, [0, 2]]), atol=1e-12)


def test_titsias_factors_mask_equals_filtered():
    from gpar_tpu.ops import EQ, gram, kdiag
    from gpar_tpu.ops.linalg import titsias_factors

    n, m_ind = 30, 5
    x = jnp.asarray(np.sort(rng.uniform(0, 5, n))[:, None])
    z = jnp.asarray(np.linspace(0, 5, m_ind)[:, None])
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]))
    noise = jnp.asarray(rng.uniform(0.05, 0.2, n))
    mask_np = rng.uniform(size=n) < 0.7
    mask_np[:2] = True
    mask = jnp.asarray(mask_np.astype(np.float64))
    kern = EQ().stretch(jnp.asarray([0.8]))

    got = titsias_factors(
        gram(kern, z, z), gram(kern, z, x), kdiag(kern, x),
        y, jnp.zeros_like(y), noise, mask=mask,
    )
    idx = np.nonzero(mask_np)[0]
    xf = x[idx]
    exp = titsias_factors(
        gram(kern, z, z), gram(kern, z, xf), kdiag(kern, xf),
        y[idx], jnp.zeros(len(idx)), noise[idx],
    )
    for g, e in zip(got, exp):
        approx(g, e, atol=1e-10)


def test_scan_fit_sharded_matches_single_device():
    # The mesh mode of the scan-fused fit (models/fused.py
    # make_scan_fit_body(mesh=...)): the whole scan inside one shard_map,
    # rows sharded, ELBO psum-reduced.  n=42 on 8 devices exercises the
    # padding path (42 % 8 != 0) and missing data exercises the row masks
    # composed with the pad masks.
    import gpar_tpu
    from gpar_tpu.parallel import make_mesh

    x, y = _data(n=42, missing=True)
    kw = dict(
        noise=0.1, impute=True, replace=True, normalise_y=True,
        x_ind=np.linspace(0, 6, 9),
    )
    key = jax.random.PRNGKey(0)

    r_single = GPARRegressor(**kw)
    r_single.fit(x, y, iters=0, fused=True, key=key)

    mesh = make_mesh(8, devices=jax.devices("cpu"))
    with gpar_tpu.use_mesh(mesh, min_rows=8):
        r_mesh = GPARRegressor(**kw)
        r_mesh.fit(x, y, iters=0, fused=True, key=key)
    # Strict oracle at iters=0: identical math, different reduction order.
    approx(
        r_mesh.last_fit_report["layer_nll"],
        r_single.last_fit_report["layer_nll"],
        atol=1e-8,
    )

    # With optimisation (and restarts, which vmaps the psum-carrying
    # objective inside the shard_map): trajectories agree loosely, the
    # learned hyperparameters closely.
    r_single.fit(x, y, iters=8, fused=True, key=key, restarts=2)
    with gpar_tpu.use_mesh(mesh, min_rows=8):
        r_mesh.fit(x, y, iters=8, fused=True, key=key, restarts=2)
    approx(
        r_mesh.last_fit_report["layer_nll"],
        r_single.last_fit_report["layer_nll"],
        rtol=1e-4, atol=1e-4,
    )
    for name in r_single.vs.names:
        approx(r_mesh.vs[name], r_single.vs[name], rtol=2e-3, atol=2e-3)


def test_scan_fit_sharded_dense_matches_single_device():
    # DENSE fits under a mesh run the scan body inside one shard_map with
    # the per-layer covariance factorised cooperatively (the distributed
    # blocked Cholesky + custom-VJP backward of parallel/dense.py) —
    # VERDICT r2 №2.  n=42 on 8 devices exercises the panel-geometry
    # padding; missing data exercises the per-layer masks composed with
    # the pad masks.
    import gpar_tpu
    from gpar_tpu.parallel import make_mesh

    x, y = _data(n=42, missing=True)
    kw = dict(noise=0.1, impute=True, normalise_y=True)
    key = jax.random.PRNGKey(1)
    r_single = GPARRegressor(**kw)
    r_single.fit(x, y, iters=0, fused=True, key=key)
    mesh = make_mesh(8, devices=jax.devices("cpu"))
    with gpar_tpu.use_mesh(mesh, min_rows=8):
        r_mesh = GPARRegressor(**kw)
        assert r_mesh.condition(x, y) is None  # populate n for the gate
        assert r_mesh._use_scan_body(True) == "scan"  # dense scans too now
        r_mesh.fit(x, y, iters=0, fused=True, key=key)
    # Strict oracle at iters=0: identical math, different reduction order.
    approx(
        r_mesh.last_fit_report["layer_nll"],
        r_single.last_fit_report["layer_nll"],
        atol=1e-7,
    )

    # With optimisation: gradients flow through the distributed custom
    # VJP; learned hyperparameters must agree with the single-device scan.
    r_single.fit(x, y, iters=8, fused=True, key=key)
    with gpar_tpu.use_mesh(mesh, min_rows=8):
        r_mesh.fit(x, y, iters=8, fused=True, key=key)
    approx(
        r_mesh.last_fit_report["layer_nll"],
        r_single.last_fit_report["layer_nll"],
        rtol=1e-4, atol=1e-4,
    )
    for name in r_single.vs.names:
        approx(r_mesh.vs[name], r_single.vs[name], rtol=2e-3, atol=2e-3)

    # Small-n fits still fall back to the unrolled body under a mesh.
    with gpar_tpu.use_mesh(mesh, min_rows=1024):
        r_small = GPARRegressor(**kw)
        r_small.condition(x, y)
        assert not r_small._use_scan_body(True)


@pytest.mark.parametrize(
    "kw",
    [
        dict(noise=0.1, impute=True, normalise_y=True),
        dict(
            noise=0.1, impute=True, replace=True, normalise_y=True,
            x_ind=np.linspace(0, 6, 9),
        ),
    ],
    ids=["dense", "sparse"],
)
def test_free_fit_sharded_matches_single_device(kw):
    # fit(fix=False) under a mesh now runs the scan-fused free body inside
    # one shard_map (models/fused.py make_scan_free_fit_body(mesh=...)) —
    # O(1)-in-p compile on the mesh path too (VERDICT r3 noted the
    # unrolled O(p^2/2) mesh fallback as a standing weakness).  n=42 on 8
    # devices exercises the row padding composed with the per-layer masks;
    # sparse reduces through titsias_psum_body, dense through the
    # distributed blocked Cholesky.
    import gpar_tpu
    from gpar_tpu.parallel import make_mesh

    x, y = _data(n=42, missing=True)
    key = jax.random.PRNGKey(0)

    r_single = GPARRegressor(**kw)
    r_single.fit(x, y, iters=0, fix=False, fused=True, key=key)

    mesh = make_mesh(8, devices=jax.devices("cpu"))
    with gpar_tpu.use_mesh(mesh, min_rows=8):
        r_mesh = GPARRegressor(**kw)
        r_mesh.condition(x, y)
        assert r_mesh._use_scan_body(True) == "scan"
        r_mesh.fit(x, y, iters=0, fix=False, fused=True, key=key)
    # Strict oracle at iters=0: identical math, different reduction order.
    approx(
        r_mesh.last_fit_report["layer_nll"],
        r_single.last_fit_report["layer_nll"],
        atol=1e-7,
    )

    # With optimisation: gradients flow through the psum/distributed-VJP
    # collectives; the prefix-chain optima must agree with single-device.
    r_single.fit(x, y, iters=8, fix=False, fused=True, key=key)
    with gpar_tpu.use_mesh(mesh, min_rows=8):
        r_mesh.fit(x, y, iters=8, fix=False, fused=True, key=key)
    approx(
        r_mesh.last_fit_report["layer_nll"],
        r_single.last_fit_report["layer_nll"],
        rtol=1e-4, atol=1e-4,
    )
    for name in r_single.vs.names:
        approx(r_mesh.vs[name], r_single.vs[name], rtol=2e-3, atol=2e-3)


def test_batched_fit_matches_scan():
    # fused="batched" (models/fused.py make_batched_fit_body): all layers'
    # L-BFGS in one vmap.  With fully-observed dense data, replace=False
    # and scale_tie=False the layers are provably independent, so the
    # batched fit must equal the sequential scan body — strictly at
    # iters=0, to optimiser-trajectory tolerance beyond.
    x, y = _data(n=36)  # fully observed
    for kw in (
        dict(noise=0.1, normalise_y=True),
        dict(noise=0.1, markov=1, rq=True, nonlinear=True, normalise_y=False),
    ):
        key = jax.random.PRNGKey(0)
        r_scan = GPARRegressor(**kw)
        r_scan.fit(x, y, iters=0, fused=True, key=key)
        r_bat = GPARRegressor(**kw)
        r_bat.fit(x, y, iters=0, fused="batched", key=key)
        approx(
            r_bat.last_fit_report["layer_nll"],
            r_scan.last_fit_report["layer_nll"],
            atol=1e-8,
        )

        r_scan.fit(x, y, iters=8, fused=True, key=key, restarts=2)
        r_bat.fit(x, y, iters=8, fused="batched", key=key, restarts=2)
        approx(
            r_bat.last_fit_report["layer_nll"],
            r_scan.last_fit_report["layer_nll"],
            rtol=1e-6, atol=1e-6,
        )
        for name in r_scan.vs.names:
            approx(r_bat.vs[name], r_scan.vs[name], rtol=1e-4, atol=1e-4)


def test_batched_fit_rejects_dependent_layers():
    # Every independence precondition is validated with a clear error.
    from gpar_tpu.models.fused import build_scan_fit_plan, make_batched_fit_body

    x, y = _data(n=30)

    def plan_for(**kw):
        reg = GPARRegressor(**kw)
        reg.condition(x, y)
        reg._ensure_vars(reg.p)
        return build_scan_fit_plan(reg, reg.vs.select(None))

    with pytest.raises(ValueError, match="dense"):
        make_batched_fit_body(
            plan_for(noise=0.1, x_ind=np.linspace(0, 6, 5)), 5, 1e-9, 10, 1, 1.0
        )
    with pytest.raises(ValueError, match="replace"):
        make_batched_fit_body(
            plan_for(noise=0.1, replace=True), 5, 1e-9, 10, 1, 1.0
        )
    with pytest.raises(ValueError, match="scale_tie"):
        make_batched_fit_body(
            plan_for(noise=0.1, scale_tie=True), 5, 1e-9, 10, 1, 1.0
        )
    x2, y2 = _data(n=30, missing=True)
    reg = GPARRegressor(noise=0.1, impute=True)
    reg.condition(x2, y2)
    reg._ensure_vars(reg.p)
    plan = build_scan_fit_plan(reg, reg.vs.select(None))
    with pytest.raises(ValueError, match="observed"):
        make_batched_fit_body(plan, 5, 1e-9, 10, 1, 1.0)


def test_scan_predict_tail_under_mesh_matches_single_device():
    # sample(posterior=True) with replace=True under a mesh now rides the
    # scan tail with the key batch sharded over devices; per-sample draws
    # are key-deterministic, so mesh == single-device bit-for-bit (f64),
    # including a num_samples not divisible by the mesh (pad-and-drop).
    import gpar_tpu
    from gpar_tpu.parallel import make_mesh

    x, y = _data(missing=True)
    kw = dict(
        noise=0.1, impute=True, replace=True, normalise_y=True,
        x_ind=np.linspace(0, 6, 9),
    )
    reg = GPARRegressor(**kw)
    reg.fit(x, y, iters=4, key=jax.random.PRNGKey(0))
    x_test = np.linspace(-0.5, 6.5, 23)
    key = jax.random.PRNGKey(7)

    s_single = reg.sample(x_test, posterior=True, num_samples=5, key=key)
    mesh = make_mesh(8, devices=jax.devices("cpu"))
    with gpar_tpu.use_mesh(mesh, min_rows=8):
        s_mesh = reg.sample(x_test, posterior=True, num_samples=5, key=key)
    for a, b in zip(s_single, s_mesh):
        approx(a, b, atol=1e-9)


@pytest.mark.parametrize("latent", [False, True])
@pytest.mark.parametrize("sparse", [False, True])
def test_ancestral_tail_matches_unrolled(sparse, latent):
    # replace=False — the reference's DEFAULT predictive configuration
    # (EEG/exchange/jura all serve with it): the per-sample scan tail
    # (models/fused.py, make_scan_ancestral_tail) vs the unrolled vmapped
    # ancestral chain, same keys.  The tail replicates _sample_chain's
    # per-sample key stream exactly, so this is a bit-compatibility
    # oracle, not a statistical one.
    from gpar_tpu import config

    x, y = _data(missing=True)
    kw = dict(noise=0.1, impute=True, replace=False, normalise_y=True)
    if sparse:
        kw["x_ind"] = np.linspace(0, 6, 9)
    reg = GPARRegressor(**kw)
    reg.fit(x, y, iters=4, key=jax.random.PRNGKey(0))
    x_test = np.linspace(-0.5, 6.5, 23)
    key = jax.random.PRNGKey(5)

    assert config.scan_predict  # default on
    s_scan = reg.sample(
        x_test, posterior=True, num_samples=4, latent=latent, key=key
    )
    try:
        config.scan_predict = False
        s_unroll = reg.sample(
            x_test, posterior=True, num_samples=4, latent=latent, key=key
        )
    finally:
        config.scan_predict = True
    # Tolerances as in test_scan_predict_tail_matches_unrolled: observed
    # samples bit-match; latent near-singular posterior factors amplify
    # masked-vs-filtered rounding.
    tol = 2e-3 if latent else 1e-9
    for a, b in zip(s_scan, s_unroll):
        approx(a, b, atol=tol)


def test_ancestral_tail_sample_chunk_matches_vmap():
    # config.predict_sample_chunk bounds peak memory by lax.map-ing the
    # sample axis in chunks (incl. a non-dividing chunk size); draws must
    # equal the full-vmap tail per key.
    from gpar_tpu import config

    x, y = _data()
    reg = GPARRegressor(
        noise=0.1, replace=False, normalise_y=True,
        x_ind=np.linspace(0, 6, 9),
    )
    reg.fit(x, y, iters=3, key=jax.random.PRNGKey(0))
    x_test = np.linspace(0, 6, 13)
    key = jax.random.PRNGKey(11)
    prev = config.predict_sample_chunk
    try:
        config.predict_sample_chunk = None  # unchunked reference
        s_full = reg.sample(x_test, posterior=True, num_samples=5, key=key)
        config.predict_sample_chunk = 2  # 5 samples -> 3 chunks, 1 padded
        s_chunk = reg.sample(x_test, posterior=True, num_samples=5, key=key)
    finally:
        config.predict_sample_chunk = prev
    for a, b in zip(s_full, s_chunk):
        approx(a, b, atol=1e-12)


def test_sample_chunk_auto_sizing_matches_unchunked():
    # predict_sample_chunk="auto" (the default) sizes chunks from
    # predict_memory_budget (VERDICT r3 №5): under a deliberately tiny
    # budget a replace=False predict must run chunked WITHOUT the user
    # touching the chunk knob and bit-match the unchunked tail.
    from gpar_tpu import config
    from gpar_tpu.models.fused import resolve_sample_chunk

    # The sizing rule itself: 4 live (chunk, n_test, n_test) f64 buffers.
    assert resolve_sample_chunk("auto", 200, 64, np.float64, 1 << 20) == 8
    assert resolve_sample_chunk("auto", 8, 64, np.float64, 1 << 30) is None
    assert resolve_sample_chunk(None, 200, 64, np.float64, 1) is None
    assert resolve_sample_chunk(0, 200, 64, np.float64, 1) is None
    assert resolve_sample_chunk(7, 200, 64, np.float64, 1) == 7
    # Even a sub-single-sample budget clamps to chunk=1, never 0.
    assert resolve_sample_chunk("auto", 4, 4096, np.float64, 1) == 1

    x, y = _data()
    reg = GPARRegressor(noise=0.1, replace=False, normalise_y=True)
    reg.fit(x, y, iters=3, key=jax.random.PRNGKey(0))
    x_test = np.linspace(0, 6, 13)
    key = jax.random.PRNGKey(13)
    assert config.predict_sample_chunk == "auto"  # the default
    prev_budget = config.predict_memory_budget
    prev_chunk = config.predict_sample_chunk
    try:
        config.predict_sample_chunk = None
        m_full, lo_full, hi_full = reg.predict(
            x_test, num_samples=6, credible_bounds=True, key=key
        )
        config.predict_sample_chunk = "auto"
        # 13x13 f64 covariances: 4 buffers ~5.4 KB/sample; 12 KB forces
        # chunk=2 over the 6 samples.
        config.predict_memory_budget = 12_000
        assert (
            resolve_sample_chunk("auto", 6, 13, np.float64, 12_000) == 2
        )
        m_auto, lo_auto, hi_auto = reg.predict(
            x_test, num_samples=6, credible_bounds=True, key=key
        )
    finally:
        config.predict_memory_budget = prev_budget
        config.predict_sample_chunk = prev_chunk
    approx(m_full, m_auto, atol=1e-12)
    approx(lo_full, lo_auto, atol=1e-12)
    approx(hi_full, hi_auto, atol=1e-12)


@pytest.mark.parametrize("replace", [False, True])
def test_predict_device_reduction_matches_host(replace):
    # predict() reduces the Monte-Carlo batch on device (VERDICT r2 №6);
    # the mean/percentiles must match a host-side numpy reduction of
    # sample() with the same key to float rounding.
    x, y = _data(missing=True)
    reg = GPARRegressor(
        noise=0.1, impute=True, replace=replace, normalise_y=True
    )
    reg.fit(x, y, iters=3, key=jax.random.PRNGKey(0))
    x_test = np.linspace(0, 6, 17)
    key = jax.random.PRNGKey(9)

    mean, lo, hi = reg.predict(
        x_test, num_samples=8, credible_bounds=True, key=key
    )
    samples = reg.sample(x_test, posterior=True, num_samples=8, key=key)
    batch = np.stack(samples, axis=0)
    approx(mean, np.mean(batch, axis=0), atol=1e-10)
    approx(lo, np.percentile(batch, 2.5, axis=0), atol=1e-10)
    approx(hi, np.percentile(batch, 100 - 2.5, axis=0), atol=1e-10)
    # mean-only variant reduces on device too
    mean2 = reg.predict(x_test, num_samples=8, key=key)
    approx(mean2, mean, atol=0)


def test_fit_predict_replace_false_matches_two_call():
    # fit_predict's fused replace=False serving (fit body + factor scan +
    # ancestral tail in ONE program) == fit() then predict() with the same
    # key split.
    x, y = _data(missing=True)
    kw = dict(
        noise=0.1, impute=True, replace=False, normalise_y=True,
        x_ind=np.linspace(0, 6, 9),
    )
    x_test = np.linspace(-0.5, 6.5, 19)
    key = jax.random.PRNGKey(4)
    fit_key, sample_key = jax.random.split(key)

    r1 = GPARRegressor(**kw)
    m1, lo1, hi1 = r1.fit_predict(
        x, y, x_test=x_test, num_samples=6, credible_bounds=True,
        key=key, iters=4,
    )
    assert r1._factor_cache is not None  # seeded for repeated serving

    r2 = GPARRegressor(**kw)
    r2.fit(x, y, iters=4, key=fit_key)
    m2, lo2, hi2 = r2.predict(
        x_test, num_samples=6, credible_bounds=True, key=sample_key
    )
    approx(m1, m2, atol=1e-9)
    approx(lo1, lo2, atol=1e-9)
    approx(hi1, hi2, atol=1e-9)


@pytest.mark.parametrize("replace", [False, True])
def test_fit_predict_scan_tail_under_mesh(replace):
    # fit_predict under an active mesh keeps the scan serving tail
    # (VERDICT r2 №2): the fit body runs inside one shard_map, the tail
    # runs GSPMD-partitioned with the key batch sharded over devices
    # (num_samples=6 on 8 devices exercises pad-and-drop).  At iters=0 the
    # fitted latents are bit-identical to the single-device run, so the
    # key-deterministic draws must agree to reduction-order rounding.
    import gpar_tpu
    from gpar_tpu.parallel import make_mesh

    x, y = _data(n=42, missing=True)
    kw = dict(
        noise=0.1, impute=True, replace=replace, normalise_y=True,
        x_ind=np.linspace(0, 6, 9),
    )
    key = jax.random.PRNGKey(3)
    x_test = np.linspace(0, 6, 15)

    r1 = GPARRegressor(**kw)
    m1, lo1, hi1 = r1.fit_predict(
        x, y, x_test=x_test, iters=0, num_samples=6,
        credible_bounds=True, key=key,
    )
    mesh = make_mesh(8, devices=jax.devices("cpu"))
    with gpar_tpu.use_mesh(mesh, min_rows=8):
        r2 = GPARRegressor(**kw)
        m2, lo2, hi2 = r2.fit_predict(
            x, y, x_test=x_test, iters=0, num_samples=6,
            credible_bounds=True, key=key,
        )
    approx(m1, m2, atol=1e-6)
    approx(lo1, lo2, atol=1e-6)
    approx(hi1, hi2, atol=1e-6)


@pytest.mark.parametrize("latent", [False, True])
@pytest.mark.parametrize("replace", [False, True])
def test_prior_scan_tail_matches_unrolled(replace, latent):
    # sample(posterior=False) rides the scan-fused prior tail
    # (models/fused.py, make_scan_prior_tail): one lax.scan over
    # zero-mean layers, per-sample chains vmapped in the body — vs the
    # unrolled vmapped _sample_chain with the same keys.  Bit oracle:
    # the tail replicates the per-layer three-way key split and noise
    # placement exactly.
    from gpar_tpu import config

    reg = GPARRegressor(noise=0.1, replace=replace, normalise_y=True)
    x_test = np.linspace(-1.0, 7.0, 19)
    key = jax.random.PRNGKey(3)

    assert config.scan_predict  # default on
    s_scan = reg.sample(x_test, p=3, num_samples=4, latent=latent, key=key)
    try:
        config.scan_predict = False
        s_unroll = reg.sample(x_test, p=3, num_samples=4, latent=latent, key=key)
    finally:
        config.scan_predict = True
    for a, b in zip(s_scan, s_unroll):
        approx(a, b, atol=1e-9)

    # Sparse configs draw identically (prior FDDs ignore inducing points).
    reg_sp = GPARRegressor(
        noise=0.1, replace=replace, x_ind=np.linspace(0, 6, 7)
    )
    s_sp = reg_sp.sample(x_test, p=3, num_samples=2, latent=latent, key=key)
    try:
        config.scan_predict = False
        s_sp_u = reg_sp.sample(x_test, p=3, num_samples=2, latent=latent, key=key)
    finally:
        config.scan_predict = True
    for a, b in zip(s_sp, s_sp_u):
        approx(a, b, atol=1e-9)


def test_prior_scan_tail_degenerate_latent():
    # With latent=True on a DEGENERATE noiseless prior Gram (50 close
    # points, dense EQ kernel, condition >> 1/eps even in f64) the jitter
    # ladder fails and psd_sample_factor's clamped-eigh fallback engages.
    # Eigenvectors of near-equal eigenvalues are not stable across two
    # differently-compiled programs, so scan and unrolled draw through
    # different (equally valid) factors of the same clamped covariance:
    # samples agree only to ~sqrt(eps), NOT bitwise.  Pin that envelope,
    # and pin that latent=False at the *same* points stays bit-exact
    # (proving the Gram + ladder pipeline itself is program-independent —
    # only the eigh fallback diverges).
    from gpar_tpu import config

    x_test = np.linspace(-1.0, 7.0, 50)
    key = jax.random.PRNGKey(11)
    reg = GPARRegressor(noise=0.1, replace=False)

    def both(latent):
        s_scan = reg.sample(x_test, p=4, num_samples=8, latent=latent, key=key)
        try:
            config.scan_predict = False
            s_un = reg.sample(x_test, p=4, num_samples=8, latent=latent, key=key)
        finally:
            config.scan_predict = True
        return max(
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(s_scan, s_un)
        )

    assert both(latent=False) < 1e-9
    assert both(latent=True) < 5e-3
