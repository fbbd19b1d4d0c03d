"""Greedy output ordering (``fit(greedy=True)``).

The reference documents the option but raises NotImplementedError
(``gpar/regression.py:410,448``); ``compat=True`` (default) matches that
literally, ``compat=False`` implements the search (ordering outputs by
optimised per-observation conditional marginal likelihood, the procedure
proposed in the GPAR paper).
"""

import jax
import numpy as np
import pytest

from gpar_tpu import GPARRegressor
from gpar_tpu.utils import checkpoint


def _chain_data(n=40, seed=0):
    """col 1 is a smooth function of x; col 0 is white noise (unpredictable).

    A greedy likelihood search must select the smooth column first: after
    normalisation its optimised per-point density is far higher than the
    white-noise column's (which can do no better than a unit-variance
    noise model)."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 10.0, n)
    smooth = np.sin(x) + 0.05 * rng.standard_normal(n)
    noise = rng.standard_normal(n)
    return x, np.stack([noise, smooth], axis=1)


def test_greedy_compat_raises():
    # Reference parity: ``gpar/regression.py:448-449``.
    x, y = _chain_data()
    reg = GPARRegressor(noise=0.1)
    with pytest.raises(NotImplementedError):
        reg.fit(x, y, greedy=True)


def test_greedy_picks_predictable_output_first():
    x, y = _chain_data()
    reg = GPARRegressor(noise=0.1, compat=False)
    reg.fit(x, y, greedy=True, iters=30)
    assert reg.order is not None
    assert sorted(reg.order.tolist()) == [0, 1]
    assert reg.order[0] == 1  # the smooth column leads the chain


def test_greedy_outputs_in_original_column_order():
    # Distinct per-column offsets expose any column mix-up at the API
    # boundary: predictions must match the data column-for-column.
    x, y = _chain_data()
    y_off = y + np.array([[100.0, -100.0]])
    reg = GPARRegressor(noise=0.1, compat=False)
    reg.fit(x, y_off, greedy=True, iters=30)
    assert reg.order[0] == 1

    mean = reg.predict(x, num_samples=50)
    assert mean.shape == y_off.shape
    # The smooth column must be reproduced closely, in its original slot.
    assert np.sqrt(np.mean((mean[:, 1] - y_off[:, 1]) ** 2)) < 0.3
    assert abs(np.mean(mean[:, 0]) - 100.0) < 2.0
    assert abs(np.mean(mean[:, 1]) + 100.0) < 2.0

    # logpdf permutes the incoming y consistently (finite, and invariant to
    # the caller's column order convention being the original one).
    lp = reg.logpdf(x, y_off, posterior=True)
    assert np.isfinite(lp)

    # Samples come back in the original order too.
    s = reg.sample(x, posterior=True, num_samples=2)
    assert s[0].shape == y_off.shape
    assert abs(np.mean(s[0][:, 0]) - 100.0) < 5.0


def test_greedy_sparse_scorer():
    # The candidate scorer honours the inducing-point (Titsias) scheme.
    x, y = _chain_data()
    x_ind = np.linspace(0.0, 10.0, 10)
    reg = GPARRegressor(noise=0.1, x_ind=x_ind, compat=False)
    reg.fit(x, y, greedy=True, iters=20)
    assert sorted(reg.order.tolist()) == [0, 1]
    mean = reg.predict(x, num_samples=20)
    assert np.isfinite(mean).all()


def test_greedy_order_checkpoint_roundtrip(tmp_path):
    x, y = _chain_data()
    reg = GPARRegressor(noise=0.1, compat=False)
    reg.fit(x, y, greedy=True, iters=30)
    path = tmp_path / "greedy.ckpt"
    checkpoint.save(reg, path)
    reg2 = checkpoint.load(path)
    assert reg2.order is not None
    assert reg2.order.tolist() == reg.order.tolist()
    m1 = reg.predict(x, num_samples=20, key=__import__("jax").random.PRNGKey(0))
    m2 = reg2.predict(x, num_samples=20, key=__import__("jax").random.PRNGKey(0))
    np.testing.assert_allclose(m1, m2, atol=1e-8)


def test_greedy_order_rejects_mismatched_columns():
    # A fitted greedy ordering defines the column<->layer binding only for
    # the full set of outputs; other widths must raise, not silently
    # mis-bind (condition / logpdf / provided-w paths).
    x, y = _chain_data()
    reg = GPARRegressor(noise=0.1, compat=False)
    reg.fit(x, y, greedy=True, iters=20)
    with pytest.raises(ValueError, match="greedy output ordering"):
        reg.logpdf(x, y[:, :1], posterior=True)
    x_before, y_before = reg.x, reg.y
    with pytest.raises(ValueError, match="greedy output ordering"):
        reg.condition(x * 2.0, y[:, :1])
    # The failed condition() must not leave the estimator half-updated.
    assert reg.x is x_before and reg.y is y_before
    post = reg.predict(x, num_samples=5)
    assert np.isfinite(post).all()


def test_greedy_order_prior_sampling_other_p_still_works():
    # Prior sampling with an explicit p different from the fitted chain
    # is a core reference API (gpar/regression.py:508); a fitted greedy
    # ordering must not break it — those samples stay in layer order.
    # normalise_y=False: after conditioning, per-output normalisation
    # stats are width-p_fitted and cannot apply to other widths — that
    # restriction is reference behaviour (gpar/regression.py:553-554),
    # independent of the greedy ordering under test here.
    x, y = _chain_data()
    reg = GPARRegressor(noise=0.1, compat=False, normalise_y=False)
    reg.fit(x, y, greedy=True, iters=20)
    s3 = reg.sample(x, p=3)           # wider prior chain than fitted
    assert s3.shape == (len(x), 3)
    s1 = reg.sample(x, p=1)
    assert s1.shape == (len(x), 1)
    lp = reg.logpdf(x, y)             # prior logpdf, fitted width: permuted
    assert np.isfinite(lp)


def test_greedy_with_missing_data():
    # The candidate scorer must restrict each candidate to rows where it
    # and all selected outputs are observed (the closed-downwards
    # requirement) and normalise per observation, so partially-missing
    # outputs stay comparable.
    x, y = _chain_data(n=50)
    y = y.copy()
    y[::7, 0] = np.nan  # white-noise column loses some rows
    y[1::9, 1] = np.nan  # smooth column too
    reg = GPARRegressor(noise=0.1, compat=False, impute=True)
    reg.fit(x, y, greedy=True, iters=25)
    assert sorted(reg.order.tolist()) == [0, 1]
    assert reg.order[0] == 1  # smooth column still leads
    mean = reg.predict(x, num_samples=20)
    assert np.isfinite(mean).all()
    lp = reg.logpdf(x, y, posterior=True)
    assert np.isfinite(lp)


def test_greedy_under_mesh():
    # The candidate scorer builds PseudoObs, whose mesh branch shard_maps
    # the Titsias statistics — lock in greedy + mesh end to end, and that
    # the scorer's program cache distinguishes mesh contexts.
    import jax

    import gpar_tpu
    from gpar_tpu.parallel.sharded import make_mesh

    x, y = _chain_data(n=64)
    x_ind = np.linspace(0.0, 10.0, 8)
    reg = GPARRegressor(noise=0.1, x_ind=x_ind, compat=False, normalise_y=False)
    with gpar_tpu.use_mesh(make_mesh(8, devices=jax.devices("cpu")), min_rows=8):
        reg.fit(x, y, greedy=True, iters=15, mesh=None)
        mean = reg.predict(x, num_samples=8, key=jax.random.PRNGKey(0))
    assert sorted(reg.order.tolist()) == [0, 1]
    assert np.isfinite(mean).all()
    # The scorer's program cache must distinguish mesh contexts: the same
    # call outside the mesh context creates a new cache entry (a stale
    # mesh-bound program would be reused otherwise).
    n_keys = len([k for k in reg._jit_cache if k[0] == "greedy_nll"])
    y_np = np.asarray(reg.y)
    nll = reg._greedy_layer_nll(
        0, np.asarray(reg.x), y_np[:, 0], np.ones(len(x)), 15, 1e-9, 10
    )
    assert np.isfinite(nll)
    n_keys2 = len([k for k in reg._jit_cache if k[0] == "greedy_nll"])
    assert n_keys2 == n_keys + 1


def test_greedy_batched_scorer_recovers_known_permutation():
    # Known-permutation chain under HETEROGENEOUS missingness (the case
    # where the per-candidate scorer's shape-keyed jits explode to O(p^2)
    # compiles, VERDICT r2 №5): column 2 carries low-noise signal, column
    # 0 is a near-deterministic function of column 2 (but noisy given x
    # alone), column 1 is white noise -> greedy order must be [2, 0, 1].
    rng = np.random.default_rng(5)
    n = 48
    x = np.linspace(0.0, 10.0, n)
    a = np.sin(x) + 0.3 * rng.standard_normal(n)  # noisy signal
    b = 2.0 * a + 0.05 * rng.standard_normal(n)  # predictable given a
    c = rng.standard_normal(n)  # white noise
    y = np.stack([b, c, a], axis=1)
    # Different missingness per column -> different candidate row counts.
    y[rng.permutation(n)[:5], 0] = np.nan
    y[rng.permutation(n)[:9], 1] = np.nan
    y[rng.permutation(n)[:3], 2] = np.nan

    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    before = set(_SHARED_JIT_CACHE)
    reg = GPARRegressor(noise=0.1, compat=False)
    reg.fit(x, y, greedy=True, iters=30)
    assert reg.order.tolist() == [2, 0, 1]
    # O(p) compiles: exactly one batched program per position (in the
    # CROSS-INSTANCE shared cache under bucketing — PERF.md finding 22),
    # and the per-candidate scorer never ran.
    new_keys = [
        k for k in set(_SHARED_JIT_CACHE) - before if k[0] == "greedy_batch"
    ]
    assert len(new_keys) == 3
    assert not any(k[0] == "greedy_batch" for k in reg._jit_cache)
    assert not any(k[0] == "greedy_nll" for k in reg._jit_cache)


def test_greedy_under_mesh_batched_matches_single_device():
    # VERDICT r3 №4: the batched candidate scorer runs under an active
    # mesh too — the candidate axis is sharded over the devices — so
    # greedy under a mesh with HETEROGENEOUS missingness compiles O(p)
    # programs (not the per-candidate scorer's O(p^2)) and recovers the
    # single-device ordering exactly (identical full-row masked math).
    import gpar_tpu
    from gpar_tpu.parallel.sharded import make_mesh

    rng = np.random.default_rng(5)
    n = 48
    x = np.linspace(0.0, 10.0, n)
    a = np.sin(x) + 0.3 * rng.standard_normal(n)
    b = 2.0 * a + 0.05 * rng.standard_normal(n)
    c = rng.standard_normal(n)
    y = np.stack([b, c, a], axis=1)
    y[rng.permutation(n)[:5], 0] = np.nan
    y[rng.permutation(n)[:9], 1] = np.nan
    y[rng.permutation(n)[:3], 2] = np.nan

    reg_single = GPARRegressor(noise=0.1, compat=False)
    reg_single.fit(x, y, greedy=True, iters=30)

    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    before = set(_SHARED_JIT_CACHE)
    reg_mesh = GPARRegressor(noise=0.1, compat=False)
    with gpar_tpu.use_mesh(make_mesh(8, devices=jax.devices("cpu")), min_rows=8):
        reg_mesh.fit(x, y, greedy=True, iters=30)
    assert reg_mesh.order.tolist() == reg_single.order.tolist() == [2, 0, 1]
    # O(p) compiles under the mesh: one batched program per position
    # (shared cache — the mesh descriptor is in the key), and the
    # per-candidate scorer never ran.
    new_keys = [
        k for k in set(_SHARED_JIT_CACHE) - before if k[0] == "greedy_batch"
    ]
    assert len(new_keys) == 3
    assert not any(k[0] == "greedy_batch" for k in reg_mesh._jit_cache)
    assert not any(k[0] == "greedy_nll" for k in reg_mesh._jit_cache)
    mean = reg_mesh.predict(x, num_samples=8)
    assert np.isfinite(mean).all()


def test_greedy_batched_scores_match_per_candidate():
    # The vmapped masked-row scorer must reproduce the filtered-row
    # per-candidate scorer's optimised NLLs (identical inits; masked rows
    # contribute exact zeros, so trajectories agree to rounding) — dense
    # and sparse.
    rng = np.random.default_rng(7)
    n = 40
    x = np.linspace(0.0, 6.0, n)
    y = np.stack(
        [np.sin(x) + 0.1 * rng.standard_normal(n), rng.standard_normal(n)],
        axis=1,
    )
    y[rng.permutation(n)[:6], 0] = np.nan
    y[rng.permutation(n)[:4], 1] = np.nan

    for kw in [{}, {"x_ind": np.linspace(0.0, 6.0, 7)}]:
        reg = GPARRegressor(noise=0.1, compat=False, normalise_y=False, **kw)
        reg.condition(x, y)
        y_np, w_np, x_np = (
            np.asarray(reg.y), np.asarray(reg.w), np.asarray(reg.x),
        )
        masks = np.stack([~np.isnan(y_np[:, o]) for o in range(2)])
        nlls_b = reg._greedy_position_nlls(
            0, x_np, np.nan_to_num(y_np.T), w_np.T, masks, 25, 1e-9, 10
        )
        for o in range(2):
            m = masks[o].astype(bool)
            nll_s = reg._greedy_layer_nll(
                0, x_np[m], y_np[m, o], w_np[m, o], 25, 1e-9, 10
            )
            np.testing.assert_allclose(nlls_b[o], nll_s, rtol=1e-4, atol=1e-4)


def test_greedy_logpdf_bucketed_matches_legacy():
    # A greedy ordering permutes the scored columns AND the bucketed
    # programs' gather maps (the plan fingerprint covers the reorder);
    # the scan-fused bucketed logpdf must agree with the legacy GP-core
    # path under it, prior and posterior.
    from gpar_tpu.config import config

    x, y = _chain_data(n=40)
    reg = GPARRegressor(noise=0.1, compat=False, normalise_y=True)
    reg.fit(x, y, greedy=True, iters=10)
    assert reg.order is not None

    rng = np.random.default_rng(3)
    xs = np.linspace(0.0, 10.0, 25)
    ys = np.stack(
        [rng.standard_normal(25), np.sin(xs) + 0.05 * rng.standard_normal(25)],
        axis=1,
    )
    lp_b = reg.logpdf(xs, ys)
    lpp_b = reg.logpdf(xs, ys, posterior=True)
    prev = config.shape_buckets
    config.shape_buckets = False
    try:
        lp_e = reg.logpdf(xs, ys)
        lpp_e = reg.logpdf(xs, ys, posterior=True)
    finally:
        config.shape_buckets = prev
    np.testing.assert_allclose(lp_b, lp_e, rtol=1e-9, atol=1e-7)
    np.testing.assert_allclose(lpp_b, lpp_e, rtol=1e-9, atol=1e-7)
