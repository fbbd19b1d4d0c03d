"""Shape-bucketed compilation (VERDICT r3 №1): the single-device
scan-fused fit/serve programs pad rows, test rows, and the Monte-Carlo
sample count to geometric buckets with the data riding in as traced
arguments, so ONE compiled executable covers a whole size range.  These
tests pin (a) padded == unpadded results to rounding, and (b) program
reuse: a second dataset with a different row count inside the same bucket
hits the in-process jit cache instead of recompiling.

The reference recompiles nothing because it compiles nothing — this axis
is new TPU systems work with no counterpart in ``gpar/``.
"""

import jax
import numpy as np
import pytest

from gpar_tpu import GPARRegressor
from gpar_tpu.config import bucket_rows, bucket_samples, config

from .util import approx


def _data(n=40, p=3, missing=False, seed=7):
    r = np.random.default_rng(seed)
    x = np.sort(r.uniform(0, 6, n))
    cols = [np.sin(x)]
    for i in range(1, p):
        cols.append(np.cos(cols[-1]) + 0.3 * np.sin((i + 1) * x))
    y = np.stack(cols, 1) + 0.05 * r.standard_normal((n, p))
    if missing:
        y[r.uniform(size=(n, p)) < 0.15] = np.nan
        y[0, :] = np.nan_to_num(y[0, :], nan=0.1)
    return x, y


def _no_buckets():
    """Context values for an exact (unbucketed) reference run."""

    class _Ctx:
        def __enter__(self):
            self.prev = config.shape_buckets
            config.shape_buckets = False

        def __exit__(self, *exc):
            config.shape_buckets = self.prev

    return _Ctx()


def test_bucket_helpers():
    prev = (config.shape_buckets, config.bucket_ratio, config.bucket_floor)
    try:
        config.shape_buckets = True
        config.bucket_ratio = 1.25
        config.bucket_floor = 64
        # Multiples of the floor, monotone, >= n, ratio-bounded waste.
        last = 0
        for n in [1, 63, 64, 65, 100, 500, 1000, 4096, 50_000]:
            b = bucket_rows(n)
            assert b >= n and b % 64 == 0
            assert b >= last  # monotone in n
            last = b if b > last else last
            if n > 64:
                # Waste bounded by ~(ratio - 1) plus floor rounding.
                assert b <= int(n * 1.25) + 64, (n, b)
        assert bucket_rows(64) == 64  # exact bucket is identity
        assert bucket_samples(1) == config.sample_bucket
        assert bucket_samples(17) == 2 * config.sample_bucket
        config.shape_buckets = False
        assert bucket_rows(100) == 100
        assert bucket_samples(17) == 17
    finally:
        (
            config.shape_buckets,
            config.bucket_ratio,
            config.bucket_floor,
        ) = prev


CONFIGS = {
    "dense-impute-missing": dict(noise=0.1, impute=True, normalise_y=True),
    "dense-replace": dict(
        noise=0.1, impute=False, replace=True, normalise_y=False
    ),
    "sparse-impute-replace": dict(
        noise=0.1,
        impute=True,
        replace=True,
        normalise_y=True,
        x_ind=np.linspace(0, 6, 9),
    ),
}


@pytest.mark.parametrize("kw", CONFIGS.values(), ids=CONFIGS.keys())
def test_bucketed_fit_matches_exact(kw):
    # Padded rows are exactly neutral (identity rows in the dense
    # covariance, D^{-1} = 0 in the Titsias ELBO): the bucketed fit's
    # objective and optimised hyperparameters match the exact-shape
    # program to rounding.
    missing = "missing" in [k for k in CONFIGS if CONFIGS[k] is kw][0]
    x, y = _data(n=40, missing=missing)
    assert config.shape_buckets  # the default
    assert bucket_rows(40) > 40  # the test exercises real padding
    key = jax.random.PRNGKey(0)

    rb = GPARRegressor(**kw)
    rb.fit(x, y, iters=0, key=key)
    with _no_buckets():
        re = GPARRegressor(**kw)
        re.fit(x, y, iters=0, key=key)
    approx(
        rb.last_fit_report["layer_nll"],
        re.last_fit_report["layer_nll"],
        atol=1e-9,
    )

    rb2 = GPARRegressor(**kw)
    rb2.fit(x, y, iters=5, key=key)
    with _no_buckets():
        re2 = GPARRegressor(**kw)
        re2.fit(x, y, iters=5, key=key)
    approx(
        rb2.last_fit_report["layer_nll"],
        re2.last_fit_report["layer_nll"],
        rtol=1e-6,
        atol=1e-8,
    )
    for n_ in re2.vs.names:
        approx(rb2.vs[n_], re2.vs[n_], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("replace", [False, True])
def test_bucketed_fit_predict_matches_exact(replace):
    # The fused fit_predict serving program pads n, n_test, AND the
    # sample count; surplus draws are masked out of the nan-reductions
    # and real draws are prefix-stable, so mean/bounds match the exact
    # program to rounding.
    x, y = _data(n=40)
    x_test = np.linspace(-0.5, 6.5, 23)
    key = jax.random.PRNGKey(3)
    kw = dict(noise=0.1, replace=replace, impute=not replace)

    rb = GPARRegressor(**kw)
    mb, lb, ub = rb.fit_predict(
        x, y, x_test, iters=3, num_samples=7, credible_bounds=True, key=key
    )
    with _no_buckets():
        re = GPARRegressor(**kw)
        me, le, ue = re.fit_predict(
            x, y, x_test, iters=3, num_samples=7,
            credible_bounds=True, key=key,
        )
    approx(mb, me, rtol=1e-6, atol=1e-8)
    approx(lb, le, rtol=1e-6, atol=1e-8)
    approx(ub, ue, rtol=1e-6, atol=1e-8)


def test_bucketed_sample_predict_match_exact():
    # Posterior sample + predict through the bucketed cached tail vs the
    # exact program: identical keys, identical draws (prefix-stable
    # padding), so raw samples agree to rounding.
    x, y = _data(n=40)
    x_test = np.linspace(0, 6, 13)
    key_fit = jax.random.PRNGKey(1)
    key_s = jax.random.PRNGKey(11)

    rb = GPARRegressor(noise=0.1, replace=True)
    rb.fit(x, y, iters=3, key=key_fit)
    sb = rb.sample(x_test, posterior=True, num_samples=5, key=key_s)
    pb = rb.predict(x_test, num_samples=6, key=key_s)
    with _no_buckets():
        re = GPARRegressor(noise=0.1, replace=True)
        re.fit(x, y, iters=3, key=key_fit)
        se = re.sample(x_test, posterior=True, num_samples=5, key=key_s)
        pe = re.predict(x_test, num_samples=6, key=key_s)
    for a, b in zip(sb, se):
        approx(a, b, rtol=1e-6, atol=1e-8)
    approx(pb, pe, rtol=1e-6, atol=1e-8)


def test_bucketed_prior_sample_matches_exact():
    x, y = _data(n=40)
    key = jax.random.PRNGKey(5)
    rb = GPARRegressor(noise=0.1)
    rb.condition(x, y)
    sb = rb.sample(np.linspace(0, 6, 13), p=3, num_samples=3, key=key)
    with _no_buckets():
        re = GPARRegressor(noise=0.1)
        re.condition(x, y)
        se = re.sample(np.linspace(0, 6, 13), p=3, num_samples=3, key=key)
    for a, b in zip(sb, se):
        approx(a, b, rtol=1e-6, atol=1e-8)


def test_bucketed_fit_reuses_program_across_datasets():
    # THE point of bucketing: a second dataset with a different row count
    # inside the same bucket reuses the compiled fit executable — the
    # jit-cache key is (bucket, model), not (shape, data).
    x1, y1 = _data(n=40, seed=1)
    x2, y2 = _data(n=50, seed=2)
    assert bucket_rows(40) == bucket_rows(50)

    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    reg = GPARRegressor(noise=0.1, normalise_y=True)
    reg.condition(x1, y1)
    reg._ensure_vars(reg.p)
    z_init = reg.vs.snapshot()
    reg.fit(x1, y1, iters=3, key=jax.random.PRNGKey(0))
    # Bucketed programs live in the CROSS-INSTANCE cache (dataset-
    # independent HLO), not the per-instance _jit_cache.
    assert not any(k[0] == "fit_fused" for k in reg._jit_cache)
    keys_after_first = set(_SHARED_JIT_CACHE)
    reg.vs.restore(z_init)
    reg.fit(x2, y2, iters=3, key=jax.random.PRNGKey(1))
    assert set(_SHARED_JIT_CACHE) == keys_after_first  # hit, no new entry
    # And the reused SERVING programs see the second dataset's
    # normalisation statistics and posterior factors — everything
    # data-derived must ride as traced arguments, not baked constants
    # (stats baked from dataset 1 would silently unnormalise dataset 2's
    # predictions with the wrong mean/std).
    key_s = jax.random.PRNGKey(7)
    mean = reg.predict(x2, num_samples=6, key=key_s)
    with _no_buckets():
        ref = GPARRegressor(noise=0.1, normalise_y=True)
        ref.fit(x2, y2, iters=3, key=jax.random.PRNGKey(1))
        mean_ref = ref.predict(x2, num_samples=6, key=key_s)
    approx(mean, mean_ref, rtol=1e-6, atol=1e-8)


def test_bucketed_fit_predict_reuses_program_across_datasets():
    x1, y1 = _data(n=40, seed=1)
    x2, y2 = _data(n=50, seed=2)
    xt1 = np.linspace(0, 6, 20)
    xt2 = np.linspace(0, 6, 30)
    assert bucket_rows(40) == bucket_rows(50)
    assert bucket_rows(20) == bucket_rows(30)

    reg = GPARRegressor(noise=0.1, replace=True, normalise_y=True)
    reg.condition(x1, y1)
    reg._ensure_vars(reg.p)
    z_init = reg.vs.snapshot()
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    m1 = reg.fit_predict(
        x1, y1, xt1, iters=2, num_samples=5, key=jax.random.PRNGKey(0)
    )
    assert not any(k[0] == "fit_predict" for k in reg._jit_cache)
    fp_keys = set(_SHARED_JIT_CACHE)
    # Different n, n_test, AND num_samples — same buckets, same program
    # (bucketed programs are num_samples-agnostic inside the bucket).
    reg.vs.restore(z_init)
    m2 = reg.fit_predict(
        x2, y2, xt2, iters=2, num_samples=7, key=jax.random.PRNGKey(1)
    )
    assert set(_SHARED_JIT_CACHE) == fp_keys
    assert m1.shape == (20, 3) and m2.shape == (30, 3)
    assert np.isfinite(m1).all() and np.isfinite(m2).all()
    # Oracle on the REUSED serving program: dataset 2's normalisation
    # stats must flow in as traced arguments, so the reused executable
    # matches a fresh exact-shape fit_predict on the second dataset.
    with _no_buckets():
        ref = GPARRegressor(noise=0.1, replace=True, normalise_y=True)
        m2_ref = ref.fit_predict(
            x2, y2, xt2, iters=2, num_samples=7, key=jax.random.PRNGKey(1)
        )
    approx(m2, m2_ref, rtol=1e-6, atol=1e-8)


def test_bucketed_greedy_reuses_scorer_and_matches_exact():
    # The batched greedy scorer pads its row axis to the bucket (masked
    # rows are exactly neutral), so a second dataset with a different row
    # count inside the bucket reuses all O(p) position programs — and the
    # recovered ordering matches the exact-shape scorer.
    x1, y1 = _data(n=40, missing=True, seed=3)
    x2, y2 = _data(n=50, missing=True, seed=8)
    assert bucket_rows(40) == bucket_rows(50)
    reg = GPARRegressor(noise=0.1, impute=True, normalise_y=True,
                        compat=False)
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    before = set(_SHARED_JIT_CACHE)
    reg.fit(x1, y1, greedy=True, iters=2, key=jax.random.PRNGKey(0))
    order1 = np.asarray(reg.order).copy()
    # Scorer programs live in the CROSS-INSTANCE shared cache under
    # bucketing (PERF.md finding 22): one per position.
    greedy_keys = {
        k for k in set(_SHARED_JIT_CACHE) - before if k[0] == "greedy_batch"
    }
    assert len(greedy_keys) == y1.shape[1]  # one per position
    snapshot = set(_SHARED_JIT_CACHE)
    reg.fit(x2, y2, greedy=True, iters=2, key=jax.random.PRNGKey(1))
    assert (
        set(_SHARED_JIT_CACHE) == snapshot
    )  # no new scorer compiles for the second dataset
    with _no_buckets():
        re1 = GPARRegressor(noise=0.1, impute=True, normalise_y=True,
                            compat=False)
        re1.fit(x1, y1, greedy=True, iters=2, key=jax.random.PRNGKey(0))
    assert np.array_equal(order1, np.asarray(re1.order))


def test_bucketed_free_fit_matches_exact():
    # fit(fix=False) dispatches through the same bucketed machinery
    # (make_scan_free_fit_body(rows_traced=True)): the padded rows are
    # neutral inside EVERY prefix-chain objective evaluation, so the
    # jointly-optimised latents match the exact-shape program.
    x, y = _data(n=40)
    key = jax.random.PRNGKey(2)
    rb = GPARRegressor(noise=0.1, impute=True, normalise_y=True)
    rb.fit(x, y, fix=False, iters=4, key=key)
    with _no_buckets():
        re = GPARRegressor(noise=0.1, impute=True, normalise_y=True)
        re.fit(x, y, fix=False, iters=4, key=key)
    approx(
        rb.last_fit_report["layer_nll"],
        re.last_fit_report["layer_nll"],
        rtol=1e-6,
        atol=1e-8,
    )
    for n_ in re.vs.names:
        approx(rb.vs[n_], re.vs[n_], rtol=1e-5, atol=1e-6)


def test_bucketed_markov_fit_predict_matches_exact():
    # markov=1 changes the availability structure (which augmented columns
    # each layer reads) — structure lives in the compiled program, the
    # row data rides in traced; the bucketed serve matches exact-shape.
    x, y = _data(n=40)
    x_test = np.linspace(0, 6, 17)
    key = jax.random.PRNGKey(4)
    kw = dict(noise=0.1, markov=1, replace=True, normalise_y=True)
    rb = GPARRegressor(**kw)
    mb = rb.fit_predict(x, y, x_test, iters=3, num_samples=6, key=key)
    with _no_buckets():
        re = GPARRegressor(**kw)
        me = re.fit_predict(x, y, x_test, iters=3, num_samples=6, key=key)
    approx(mb, me, rtol=1e-6, atol=1e-8)


def test_bucketed_missingness_change_reuses_program():
    # Missingness pattern is DATA, not structure: it rides in through the
    # traced row masks, so a dataset with different NaN placement reuses
    # the same executable.
    x1, y1 = _data(n=40, missing=True, seed=1)
    x2, y2 = _data(n=47, missing=True, seed=9)
    reg = GPARRegressor(noise=0.1, impute=True, normalise_y=True)
    # Snapshot the fresh initial hyperparameters so the second fit (after
    # the program is cached) starts from the same state a fresh instance
    # would — refits otherwise continue from the optimised latents
    # (reference semantics, gpar/regression.py:436-441).
    reg.condition(x1, y1)
    reg._ensure_vars(reg.p)
    z_init = reg.vs.snapshot()
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    reg.fit(x1, y1, iters=2, key=jax.random.PRNGKey(0))
    shared_keys = set(_SHARED_JIT_CACHE)
    reg.vs.restore(z_init)
    reg.fit(x2, y2, iters=2, key=jax.random.PRNGKey(1))
    assert set(_SHARED_JIT_CACHE) == shared_keys
    # Oracle: the reused program matches a fresh exact-shape fit on the
    # SECOND dataset (inits are data-independent, so fresh == restored).
    with _no_buckets():
        ref = GPARRegressor(noise=0.1, impute=True, normalise_y=True)
        ref.fit(x2, y2, iters=2, key=jax.random.PRNGKey(1))
    approx(
        reg.last_fit_report["layer_nll"],
        ref.last_fit_report["layer_nll"],
        rtol=1e-6,
        atol=1e-8,
    )


def test_bucketed_programs_shared_across_instances():
    # The r4 stress bench's second-dataset probe: a NEW estimator instance
    # on a new dataset (production serving pattern) must reuse the first
    # instance's compiled bucketed programs — fit_predict, fit, and the
    # posterior-factor program all key on the plan's structural
    # fingerprint, not the instance (PERF.md finding 22).
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    x1, y1 = _data(n=40, seed=1)
    x2, y2 = _data(n=50, seed=2)
    xt = np.linspace(0, 6, 20)
    assert bucket_rows(40) == bucket_rows(50)
    kw = dict(noise=0.1, replace=True, normalise_y=True)

    r1 = GPARRegressor(**kw)
    m1 = r1.fit_predict(x1, y1, xt, iters=2, num_samples=5,
                        key=jax.random.PRNGKey(0))
    shared = set(_SHARED_JIT_CACHE)
    r2 = GPARRegressor(**kw)
    m2 = r2.fit_predict(x2, y2, xt, iters=2, num_samples=5,
                        key=jax.random.PRNGKey(1))
    assert set(_SHARED_JIT_CACHE) == shared  # no new program for r2
    assert np.isfinite(m1).all() and np.isfinite(m2).all()
    # Oracle: the shared executable computes the SECOND instance's fit
    # exactly (nothing of instance 1 leaked through the closure).
    with _no_buckets():
        ref = GPARRegressor(**kw)
        m2_ref = ref.fit_predict(x2, y2, xt, iters=2, num_samples=5,
                                 key=jax.random.PRNGKey(1))
    approx(m2, m2_ref, rtol=1e-6, atol=1e-8)

    # Structural differences must NOT share: a different compat flag or
    # transform forks the key (a shared program would bake the wrong
    # serving semantics).
    r3 = GPARRegressor(**kw, compat=False)
    r3.fit(x1, y1, iters=2, key=jax.random.PRNGKey(0))
    assert set(_SHARED_JIT_CACHE) != shared

    from gpar_tpu import log_transform

    before = set(_SHARED_JIT_CACHE)
    r4 = GPARRegressor(noise=0.1, replace=True, normalise_y=True,
                       transform_y=log_transform)
    y_pos = np.abs(y1) + 0.5
    r4.fit_predict(x1, y_pos, xt, iters=2, num_samples=5,
                   key=jax.random.PRNGKey(0))
    assert set(_SHARED_JIT_CACHE) != before


def test_bucketed_fit_under_mesh_reuses_and_matches():
    # Shape bucketing composes with an active mesh (r4): the mesh fit
    # body takes the padded per-row plan arrays as TRACED arguments and
    # pads from the bucket to the device geometry inside the trace
    # (models/fused.py make_scan_fit_body mesh+rows_traced branch), so one
    # compiled MESH program serves every dataset in the size range too.
    import gpar_tpu
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE
    from gpar_tpu.parallel import make_mesh

    x1, y1 = _data(n=40, seed=1)
    x2, y2 = _data(n=50, seed=2)
    assert bucket_rows(40) == bucket_rows(50)
    kw = dict(
        noise=0.1, impute=True, replace=True, normalise_y=True,
        x_ind=np.linspace(0, 6, 9),
    )
    mesh = make_mesh(8, devices=jax.devices("cpu"))

    with gpar_tpu.use_mesh(mesh, min_rows=8):
        r1 = GPARRegressor(**kw)
        r1.fit(x1, y1, iters=2, key=jax.random.PRNGKey(0))
        shared = set(_SHARED_JIT_CACHE)
        # New instance, new dataset, same bucket: the MESH program is
        # reused (no new shared-cache entry, no re-trace).
        r2 = GPARRegressor(**kw)
        r2.fit(x2, y2, iters=2, key=jax.random.PRNGKey(1))
        assert set(_SHARED_JIT_CACHE) == shared
    # Oracle: the reused bucketed mesh program computes dataset 2's fit
    # exactly — compare against a fresh single-device bucketed fit (same
    # math, different reduction order only).
    r_ref = GPARRegressor(**kw)
    r_ref.fit(x2, y2, iters=2, key=jax.random.PRNGKey(1))
    approx(
        r2.last_fit_report["layer_nll"],
        r_ref.last_fit_report["layer_nll"],
        rtol=1e-6, atol=1e-6,
    )
    for name in r_ref.vs.names:
        approx(r2.vs[name], r_ref.vs[name], rtol=1e-3, atol=1e-3)


def test_bucketed_free_fit_under_mesh_reuses_and_matches():
    # fit(fix=False) under a mesh dispatches through the bucketed mesh
    # free body (make_scan_free_fit_body mesh+rows_traced branch): the
    # padded rows are neutral inside every prefix-chain objective, the
    # program is shared across datasets in the bucket, and the jointly
    # optimised latents match the single-device bucketed program (same
    # math; reduction order only).
    import gpar_tpu
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE
    from gpar_tpu.parallel import make_mesh

    x1, y1 = _data(n=40, seed=5)
    x2, y2 = _data(n=50, seed=6)
    assert bucket_rows(40) == bucket_rows(50)
    kw = dict(noise=0.1, impute=True, normalise_y=True,
              x_ind=np.linspace(0, 6, 9))
    key = jax.random.PRNGKey(7)
    mesh = make_mesh(8, devices=jax.devices("cpu"))

    with gpar_tpu.use_mesh(mesh, min_rows=8):
        r1 = GPARRegressor(**kw)
        r1.fit(x1, y1, fix=False, iters=4, key=key)
        shared = set(_SHARED_JIT_CACHE)
        r2 = GPARRegressor(**kw)
        r2.fit(x2, y2, fix=False, iters=4, key=key)
        assert set(_SHARED_JIT_CACHE) == shared  # mesh free program reused
    r_ref = GPARRegressor(**kw)
    r_ref.fit(x2, y2, fix=False, iters=4, key=key)
    approx(
        r2.last_fit_report["layer_nll"],
        r_ref.last_fit_report["layer_nll"],
        rtol=1e-6, atol=1e-6,
    )
    for name in r_ref.vs.names:
        approx(r2.vs[name], r_ref.vs[name], rtol=1e-3, atol=1e-3)


def test_bucketed_fit_predict_under_mesh_matches_exact():
    # End-to-end serving under mesh + bucketing: fit_predict pads rows,
    # test rows, AND the key batch (sample bucket, then mesh multiple) —
    # results match the exact-shape mesh program to rounding.
    import gpar_tpu
    from gpar_tpu.parallel import make_mesh

    x1, y1 = _data(n=42, seed=3)
    xt = np.linspace(0, 6, 20)
    kw = dict(
        noise=0.1, impute=True, replace=True, normalise_y=True,
        x_ind=np.linspace(0, 6, 9),
    )
    mesh = make_mesh(8, devices=jax.devices("cpu"))

    with gpar_tpu.use_mesh(mesh, min_rows=8):
        reg = GPARRegressor(**kw)
        m_b = reg.fit_predict(
            x1, y1, xt, iters=2, num_samples=5, key=jax.random.PRNGKey(0)
        )
        with _no_buckets():
            reg_e = GPARRegressor(**kw)
            m_e = reg_e.fit_predict(
                x1, y1, xt, iters=2, num_samples=5, key=jax.random.PRNGKey(0)
            )
    assert np.isfinite(m_b).all()
    # Same seeds, same draws (prefix-stable key splitting); padding only.
    approx(m_b, m_e, rtol=1e-5, atol=1e-6)


def test_greedy_scorer_shared_across_instances():
    # The batched greedy scorer's program is dataset-independent too (data,
    # masks, AND the inducing inputs ride as traced arguments), so a new
    # instance on a new same-bucket dataset reuses all O(p) position
    # programs — and different x_ind VALUES flow through the shared
    # program correctly (nothing of instance 1 baked in).
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    rng = np.random.default_rng(0)

    def mk(n, seed):
        r = np.random.default_rng(seed)
        x = np.linspace(0.0, 10.0, n)
        a = np.sin(x) + 0.3 * r.standard_normal(n)
        b = 2.0 * a + 0.05 * r.standard_normal(n)
        c = r.standard_normal(n)
        y = np.stack([b, c, a], axis=1)
        y[r.permutation(n)[:5], 0] = np.nan
        return x, y

    x1, y1 = mk(40, 1)
    x2, y2 = mk(50, 2)
    assert bucket_rows(40) == bucket_rows(50)

    r1 = GPARRegressor(noise=0.1, compat=False, x_ind=np.linspace(0, 10, 7))
    r1.fit(x1, y1, greedy=True, iters=8)
    shared = set(_SHARED_JIT_CACHE)
    r2 = GPARRegressor(noise=0.1, compat=False, x_ind=np.linspace(0, 10, 7))
    r2.fit(x2, y2, greedy=True, iters=8)
    assert set(_SHARED_JIT_CACHE) == shared  # all position programs reused
    # Oracle: the shared scorer recovers the same ordering a fresh
    # exact-shape run computes on dataset 2.
    with _no_buckets():
        r_ref = GPARRegressor(
            noise=0.1, compat=False, x_ind=np.linspace(0, 10, 7)
        )
        r_ref.fit(x2, y2, greedy=True, iters=8)
    assert list(r2.order) == list(r_ref.order)
    # A different kernel structure must fork the key, not reuse.
    before = set(_SHARED_JIT_CACHE)
    r3 = GPARRegressor(
        noise=0.1, compat=False, x_ind=np.linspace(0, 10, 7), nonlinear=True
    )
    r3.fit(x1, y1, greedy=True, iters=8)
    assert set(_SHARED_JIT_CACHE) != before


def test_warmup_precompiles_for_unseen_data():
    # warmup() pre-populates the shared program cache from a SYNTHETIC
    # fully-observed dataset; real data arriving later — different n,
    # n_test, num_samples inside the same buckets, WITH missing values —
    # must add no new entries (the NaN plan and data ride as traced
    # arguments, so the warmed programs serve it directly).
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    reg = GPARRegressor(noise=0.1, normalise_y=True)
    rep = reg.warmup(40, 3, m=1, n_test=20, num_samples=5, iters=2)
    assert set(rep["seconds"]) == {"fit", "predict", "fit_predict", "logpdf"}
    assert rep["buckets"]["rows"] == bucket_rows(40)
    assert not reg.is_conditioned  # the instance itself is untouched
    keys = set(_SHARED_JIT_CACHE)

    x, y = _data(n=50, missing=True, seed=3)
    xt = np.linspace(0, 6, 30)
    yt = _data(n=30, seed=8)[1]
    assert bucket_rows(50) == bucket_rows(40)
    assert bucket_rows(30) == bucket_rows(20)
    assert bucket_samples(4) == bucket_samples(5)
    reg.fit(x, y, iters=2, key=jax.random.PRNGKey(0))
    m = reg.predict(xt, num_samples=4, key=jax.random.PRNGKey(1))
    lp = reg.logpdf(xt, yt)
    lpp = reg.logpdf(xt, yt, posterior=True)
    m2 = reg.fit_predict(
        x, y, xt, iters=2, num_samples=4, key=jax.random.PRNGKey(2)
    )
    assert set(_SHARED_JIT_CACHE) == keys  # all four paths hit warm
    assert np.isfinite(m).all() and np.isfinite(m2).all()
    assert np.isfinite(lp) and np.isfinite(lpp)


def test_warmup_with_transform_hits():
    # The shared-cache key holds the transform functions BY IDENTITY; the
    # scratch estimator carries the same objects, and the synthetic data
    # rides through the inverse transform, so a log-transformed model
    # warms correctly and positive real data hits.
    from gpar_tpu import log_transform
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    reg = GPARRegressor(noise=0.1, transform_y=log_transform)
    reg.warmup(40, 2, iters=2)
    keys = set(_SHARED_JIT_CACHE)
    x, y = _data(n=50, p=2, seed=4)
    reg.fit(x, np.exp(0.2 * y), iters=2, key=jax.random.PRNGKey(0))
    assert set(_SHARED_JIT_CACHE) == keys


def test_warmup_argument_errors():
    reg = GPARRegressor(noise=0.1)
    with _no_buckets():
        with pytest.raises(RuntimeError, match="shape_buckets"):
            reg.warmup(10, 2)
    with pytest.raises(ValueError, match="greedy"):
        reg.warmup(10, 2, greedy=True)
    with pytest.raises(ValueError, match="n_test"):
        reg.warmup(10, 2, paths=("predict",))
    with pytest.raises(ValueError, match="paths"):
        reg.warmup(10, 2, paths=("serve",))


LOGPDF_CONFIGS = {
    "dense": dict(noise=0.1, impute=False, replace=False, normalise_y=False),
    "dense-impute-norm-missing": dict(
        noise=0.1, impute=True, normalise_y=True
    ),
    "dense-replace": dict(
        noise=0.1, impute=False, replace=True, normalise_y=False
    ),
    "sparse-impute": dict(
        noise=0.1, impute=True, normalise_y=True, x_ind=np.linspace(0, 6, 9)
    ),
    "markov1-compatF": dict(
        noise=0.1, markov=1, normalise_y=True, compat=False
    ),
}


@pytest.mark.parametrize(
    "kw", LOGPDF_CONFIGS.values(), ids=LOGPDF_CONFIGS.keys()
)
def test_bucketed_logpdf_matches_exact(kw):
    # VERDICT r4 №1: logpdf joins the bucketing regime.  The scored
    # data's values/weights/NaN plan ride in as traced arguments; padded
    # rows are exactly neutral, so the bucketed program's prior AND
    # posterior logpdf match the legacy exact-shape GP-core program to
    # rounding — including missing scored values, weights, and every
    # impute/replace augmentation rule (``gpar/regression.py:461-506``).
    cfg_id = [k for k in LOGPDF_CONFIGS if LOGPDF_CONFIGS[k] is kw][0]
    missing = "missing" in cfg_id
    x, y = _data(n=40, missing=missing, seed=7)
    xs, ys = _data(n=35, seed=9)
    r = np.random.default_rng(5)
    if missing:
        ys = ys.copy()
        ys[r.uniform(size=ys.shape) < 0.2] = np.nan
    w = r.uniform(0.5, 2.0, size=ys.shape)
    assert bucket_rows(35) > 35  # real padding exercised

    reg = GPARRegressor(**kw)
    reg.condition(x, y)
    lp_b = reg.logpdf(xs, ys, w)
    lpp_b = reg.logpdf(xs, ys, w, posterior=True)
    with _no_buckets():
        lp_e = reg.logpdf(xs, ys, w)
        lpp_e = reg.logpdf(xs, ys, w, posterior=True)
    approx(lp_b, lp_e, rtol=1e-9, atol=1e-7)
    approx(lpp_b, lpp_e, rtol=1e-9, atol=1e-7)


def test_bucketed_logpdf_reuses_program_across_datasets():
    # THE point (VERDICT r4 №1): a held-out scoring loop over fresh
    # datasets — different row counts inside the bucket, fresh estimator
    # instances — reuses the compiled logpdf executables (prior and
    # posterior) instead of paying a per-dataset cold compile.
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE

    x1, y1 = _data(n=40, seed=1)
    x2, y2 = _data(n=50, seed=2)
    xs1, ys1 = _data(n=20, seed=3)
    xs2, ys2 = _data(n=30, seed=4)
    assert bucket_rows(40) == bucket_rows(50)
    assert bucket_rows(20) == bucket_rows(30)

    r1 = GPARRegressor(noise=0.1, normalise_y=True)
    r1.condition(x1, y1)
    lp1 = r1.logpdf(xs1, ys1)
    lpp1 = r1.logpdf(xs1, ys1, posterior=True)
    # Bucketed programs live in the cross-instance cache, not the
    # per-instance exact-shape cache.
    assert not any(k[0] == "logpdf" for k in r1._jit_cache)
    keys = set(_SHARED_JIT_CACHE)

    r2 = GPARRegressor(noise=0.1, normalise_y=True)
    r2.condition(x2, y2)
    lp2 = r2.logpdf(xs2, ys2)
    lpp2 = r2.logpdf(xs2, ys2, posterior=True)
    assert set(_SHARED_JIT_CACHE) == keys  # hit: no new programs
    assert lp1 != lp2 and lpp1 != lpp2  # genuinely different data

    # Oracle on the REUSED program: the second dataset's values,
    # normalisation stats and NaN plan all rode in as traced arguments.
    with _no_buckets():
        approx(lp2, r2.logpdf(xs2, ys2), rtol=1e-9, atol=1e-7)
        approx(lpp2, r2.logpdf(xs2, ys2, posterior=True),
               rtol=1e-9, atol=1e-7)


def test_bucketed_logpdf_oracle_manual_chain():
    # The existing manual-chain oracle (test_regression.py::test_logpdf)
    # runs at whatever n the fixture gives; pin the bucketed path against
    # a by-hand two-layer composition here too, at a size that pads.
    import jax.numpy as jnp

    from gpar_tpu.gp import Obs
    from gpar_tpu.models.regressor import _construct_gpar, _uprank

    n = 40
    r = np.random.default_rng(11)
    x = np.sort(r.uniform(0, 6, n))
    reg = GPARRegressor(
        replace=False, impute=False, nonlinear=True, nonlinear_scale=0.1,
        linear=True, linear_scale=10.0, noise=1e-2, normalise_y=False,
    )
    y = reg.sample(x, p=2, latent=True, key=jax.random.PRNGKey(10))

    gpar = _construct_gpar(reg, reg.vs, 1, 2)
    f1, noise1 = gpar.layers[0]()
    f2, noise2 = gpar.layers[1]()
    x1 = _uprank(jnp.asarray(x))
    x2 = jnp.concatenate([x1, jnp.asarray(y)[:, 0:1]], axis=1)
    logpdf1 = f1(x1, noise1).logpdf(y[:, 0])
    logpdf2 = f2(x2, noise2).logpdf(y[:, 1])
    assert bucket_rows(n) > n
    approx(reg.logpdf(x, y), float(logpdf1 + logpdf2), atol=1e-6)

    f1_post = f1 | Obs(f1(x1, noise1), y[:, 0])
    f2_post = f2 | Obs(f2(x2, noise2), y[:, 1])
    reg.condition(x, y)
    approx(
        reg.logpdf(x, y, posterior=True),
        float(f1_post(x1, noise1).logpdf(y[:, 0])
              + f2_post(x2, noise2).logpdf(y[:, 1])),
        atol=1e-6,
    )


def test_device_bucket_inputs_match_host():
    # PERF.md finding 27: the bucketed fit inputs are built ON DEVICE
    # from the conditioned data (one dispatch, no per-array host
    # uploads).  Oracle: exactly the host construction
    # (build_scan_data_plan row arrays + pad_plan_rows), every
    # impute/replace routing combination, with missing data.
    from gpar_tpu.models.fused import (
        build_scan_data_plan,
        device_bucket_inputs,
        pad_plan_rows,
    )

    x, y = _data(n=40, missing=True, seed=13)
    for impute in (False, True):
        reg = GPARRegressor(noise=0.1, impute=impute, normalise_y=True)
        reg.condition(x, y)
        reg._ensure_vars(reg.p)
        names = reg.vs.select(None)
        plan = build_scan_data_plan(
            reg, np.asarray(reg.x), np.asarray(reg.y), np.asarray(reg.w),
            names,
        )
        n_b = bucket_rows(plan.n)
        assert n_b > plan.n
        host_rows = pad_plan_rows(plan, n_b)
        x_dev, dev_rows = device_bucket_inputs(
            reg.x, reg.y, reg.w, n_b=n_b, impute=impute
        )
        assert set(dev_rows) == set(host_rows)
        for k in host_rows:
            approx(dev_rows[k], host_rows[k], rtol=0, atol=0)
        approx(
            x_dev,
            np.pad(np.asarray(reg.x), ((0, n_b - plan.n), (0, 0))),
            rtol=0, atol=0,
        )


def test_bucketed_logpdf_under_mesh_matches_single_device():
    # The PRIOR logpdf chain composes with a mesh: the bucketed scan runs
    # inside one shard_map (rows sharded, fit-body geometry) and must
    # match the single-device value to rounding — sparse (psum ELBO) and
    # dense (distributed blocked Cholesky) — while reusing the compiled
    # mesh program across datasets in the bucket.
    import jax as _jax

    import gpar_tpu
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE
    from gpar_tpu.parallel.sharded import make_mesh

    x, y = _data(n=48, seed=1)
    xs1, ys1 = _data(n=40, seed=2)
    xs2, ys2 = _data(n=50, seed=4)
    assert bucket_rows(40) == bucket_rows(50)
    mesh = make_mesh(8, devices=_jax.devices("cpu"))

    for kw in (
        dict(noise=0.1, normalise_y=True),  # dense
        dict(
            noise=0.1, x_ind=np.linspace(0, 6, 9), impute=True,
            normalise_y=False,
        ),  # sparse
    ):
        reg = GPARRegressor(**kw)
        reg.condition(x, y)
        lp_single = reg.logpdf(xs1, ys1)
        with gpar_tpu.use_mesh(mesh, min_rows=8):
            lp_mesh = reg.logpdf(xs1, ys1)
            keys = set(_SHARED_JIT_CACHE)
            lp_mesh2 = reg.logpdf(xs2, ys2)
            assert set(_SHARED_JIT_CACHE) == keys  # bucket reuse
        approx(lp_mesh, lp_single, rtol=1e-9, atol=1e-8)
        with _no_buckets():
            lp2_ref = reg.logpdf(xs2, ys2)
        approx(lp_mesh2, lp2_ref, rtol=1e-9, atol=1e-8)

        if reg.sparse:
            # Sparse POSTERIOR scoring under the mesh: cached factors
            # replicate, scored rows shard, the per-layer posterior-prior
            # Titsias statistics psum-reduce — equal to single-device.
            lpp_single = reg.logpdf(xs1, ys1, posterior=True)
            with gpar_tpu.use_mesh(mesh, min_rows=8):
                lpp_mesh = reg.logpdf(xs1, ys1, posterior=True)
                keys = set(_SHARED_JIT_CACHE)
                lpp_mesh2 = reg.logpdf(xs2, ys2, posterior=True)
                assert set(_SHARED_JIT_CACHE) == keys
            approx(lpp_mesh, lpp_single, rtol=1e-9, atol=1e-8)
            with _no_buckets():
                lpp2_ref = reg.logpdf(xs2, ys2, posterior=True)
            approx(lpp_mesh2, lpp2_ref, rtol=1e-9, atol=1e-8)


def test_bucketed_logpdf_edge_shapes():
    # Degenerate shapes through the scan path: a single-output model, a
    # one-row scored set, and scoring FEWER outputs than the conditioned
    # model (prior scores the prefix chain; posterior falls back to the
    # legacy width-flexible path) — all equal to the legacy program.
    r = np.random.default_rng(0)
    x = np.linspace(0, 5, 30)
    y1 = np.sin(x)[:, None] + 0.05 * r.standard_normal((30, 1))
    reg1 = GPARRegressor(noise=0.1, normalise_y=True)
    reg1.condition(x, y1)
    for xs, ys in [
        (np.linspace(0, 5, 9), np.cos(np.linspace(0, 5, 9))[:, None]),
        (np.array([2.5]), np.array([[0.3]])),
    ]:
        lb, lpb = reg1.logpdf(xs, ys), reg1.logpdf(xs, ys, posterior=True)
        with _no_buckets():
            approx(lb, reg1.logpdf(xs, ys), rtol=1e-9, atol=1e-8)
            approx(
                lpb, reg1.logpdf(xs, ys, posterior=True),
                rtol=1e-9, atol=1e-8,
            )

    y3 = np.stack([np.sin(x), np.cos(x), 0.3 * x], 1)
    reg3 = GPARRegressor(noise=0.1, normalise_y=False)
    reg3.condition(x, y3)
    ys2 = np.stack([np.sin(x), np.cos(x)], 1)
    lb = reg3.logpdf(x, ys2)
    lpb = reg3.logpdf(x, ys2, posterior=True)
    with _no_buckets():
        approx(lb, reg3.logpdf(x, ys2), rtol=1e-9, atol=1e-8)
        approx(
            lpb, reg3.logpdf(x, ys2, posterior=True), rtol=1e-9, atol=1e-8
        )


def test_bucketed_logpdf_after_checkpoint_roundtrip(tmp_path):
    # A checkpoint-restored estimator must score through the SAME shared
    # bucketed executables (the restored store traces byte-identical
    # programs) and match the original to rounding.
    from gpar_tpu.models.regressor import _SHARED_JIT_CACHE
    from gpar_tpu.utils import checkpoint

    x, y = _data(n=40, seed=1)
    xs, ys = _data(n=30, seed=2)
    reg = GPARRegressor(noise=0.1, normalise_y=True)
    reg.fit(x, y, iters=3, key=jax.random.PRNGKey(0))
    lp = reg.logpdf(xs, ys)
    lpp = reg.logpdf(xs, ys, posterior=True)
    keys = set(_SHARED_JIT_CACHE)

    path = tmp_path / "reg.pkl"
    checkpoint.save(reg, path)
    reg2 = checkpoint.load(path)
    approx(reg2.logpdf(xs, ys), lp, rtol=1e-12, atol=1e-12)
    approx(reg2.logpdf(xs, ys, posterior=True), lpp, rtol=1e-12, atol=1e-12)
    assert set(_SHARED_JIT_CACHE) == keys  # restored instance hit warm
