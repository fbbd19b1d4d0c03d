"""Linear-algebra core tests: jittered Cholesky, MVN logpdf, Titsias ELBO."""

import jax
import jax.numpy as jnp
import numpy as np

from gpar_tpu.config import config
from gpar_tpu.ops import (
    EQ,
    add_jitter,
    gram,
    kdiag,
    mvn_logpdf,
    mvn_logpdf_chol,
    safe_cholesky,
    solve_chol,
    solve_lower,
    titsias_elbo,
)

from .util import approx

rng = np.random.default_rng(1)


def _spd(n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_safe_cholesky_spd():
    K = _spd(6)
    L = np.asarray(safe_cholesky(jnp.asarray(K)))
    approx(L @ L.T, K + config.epsilon * np.eye(6), atol=1e-9)


def test_safe_cholesky_retries_on_indefinite():
    # A singular PSD matrix whose plain Cholesky (plus the tiny default
    # jitter) fails in float64 → the escalating ladder must kick in and
    # return a finite factor.
    v = rng.normal(size=(8, 1))
    K = v @ v.T  # rank 1
    K = K - 1e-9 * np.eye(8)  # slightly indefinite
    L = np.asarray(safe_cholesky(jnp.asarray(K)))
    assert np.isfinite(L).all()


def test_safe_cholesky_under_jit_and_grad():
    K = jnp.asarray(_spd(5))

    @jax.jit
    def f(K):
        return jnp.sum(jnp.log(jnp.diagonal(safe_cholesky(K))))

    g = jax.grad(f)(K)
    assert np.isfinite(np.asarray(g)).all()


def test_solves():
    K = _spd(7)
    L = np.linalg.cholesky(K)
    b = rng.normal(size=7)
    approx(solve_lower(jnp.asarray(L), jnp.asarray(b)), np.linalg.solve(L, b), atol=1e-9)
    approx(solve_chol(jnp.asarray(L), jnp.asarray(b)), np.linalg.solve(K, b), atol=1e-9)


def test_mvn_logpdf_matches_slogdet_formula():
    n = 9
    K = _spd(n)
    y = rng.normal(size=n)
    mean = rng.normal(size=n)
    sign, logdet = np.linalg.slogdet(K)
    r = y - mean
    expected = -0.5 * (n * np.log(2 * np.pi) + logdet + r @ np.linalg.solve(K, r))
    got = mvn_logpdf_chol(
        jnp.asarray(y), jnp.asarray(mean), jnp.asarray(np.linalg.cholesky(K))
    )
    approx(got, expected, atol=1e-9)
    got2 = mvn_logpdf(jnp.asarray(y), jnp.asarray(mean), jnp.asarray(K))
    approx(got2, expected, atol=1e-8)


def test_mvn_logpdf_empty():
    z = jnp.zeros((0,))
    L = jnp.zeros((0, 0))
    assert float(mvn_logpdf_chol(z, z, L)) == 0.0


def test_titsias_elbo_equals_exact_at_inducing_eq_data():
    # The key parity fixture of the reference
    # (``tests/test_model.py:141-149``): ELBO == exact logpdf when the
    # inducing points coincide with the data, with heteroscedastic noise.
    n = 10
    x = rng.normal(size=(n, 2))
    k = EQ()
    K = np.asarray(gram(k, jnp.asarray(x), jnp.asarray(x)))
    noise = 0.1 / (rng.uniform(size=n) + 1e-2)
    y = rng.normal(size=n)

    exact = mvn_logpdf(
        jnp.asarray(y), jnp.zeros(n), jnp.asarray(K + np.diag(noise))
    )
    elbo = titsias_elbo(
        jnp.asarray(K),
        jnp.asarray(K),
        kdiag(k, jnp.asarray(x)),
        jnp.asarray(y),
        jnp.zeros(n),
        jnp.asarray(noise),
    )
    approx(elbo, exact, atol=1e-6)


def test_titsias_elbo_lower_bounds_exact():
    n, m = 20, 5
    x = rng.normal(size=(n, 1))
    z = np.linspace(x.min(), x.max(), m)[:, None]
    k = EQ()
    Knn = np.asarray(gram(k, jnp.asarray(x), jnp.asarray(x)))
    Kmm = np.asarray(gram(k, jnp.asarray(z), jnp.asarray(z)))
    Kmn = np.asarray(gram(k, jnp.asarray(z), jnp.asarray(x)))
    noise = np.full(n, 0.1)
    y = rng.normal(size=n)

    exact = float(
        mvn_logpdf(jnp.asarray(y), jnp.zeros(n), jnp.asarray(Knn + np.diag(noise)))
    )
    elbo = float(
        titsias_elbo(
            jnp.asarray(Kmm),
            jnp.asarray(Kmn),
            kdiag(k, jnp.asarray(x)),
            jnp.asarray(y),
            jnp.zeros(n),
            jnp.asarray(noise),
        )
    )
    assert elbo <= exact + 1e-9


def test_titsias_elbo_grad_finite_at_small_noise():
    # Gradient stability at the reference's noise lower bound 1e-8
    # (``gpar/regression.py:172``).
    n, m = 12, 4
    x = jnp.asarray(rng.normal(size=(n, 1)))
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    y = jnp.asarray(rng.normal(size=n))

    def obj(log_noise):
        k = EQ()
        noise = jnp.exp(log_noise) * jnp.ones(n)
        return titsias_elbo(
            gram(k, z, z), gram(k, z, x), kdiag(k, x), y, jnp.zeros(n), noise
        )

    g = jax.grad(obj)(jnp.log(jnp.asarray(1e-8)))
    assert np.isfinite(float(g))


def test_resolve_epsilon_dtype_aware():
    from gpar_tpu.config import config
    from gpar_tpu.ops.linalg import resolve_epsilon

    # f64 keeps the lab.B.epsilon default; f32 gets the floor (the value
    # the reference's ill-conditioned example sets globally,
    # examples/paper/air_temp.py:18).
    assert resolve_epsilon(jnp.float64) == config.epsilon
    assert resolve_epsilon(jnp.float32) == config.epsilon_f32
    # Explicit argument always wins.
    assert resolve_epsilon(jnp.float32, 1e-3) == 1e-3
    # A raised global knob propagates to f32 too.
    old = config.epsilon
    try:
        config.epsilon = 1e-4
        assert resolve_epsilon(jnp.float32) == 1e-4
    finally:
        config.epsilon = old


def test_safe_cholesky_f32_near_singular_stays_finite():
    # An EQ Gram over tightly-spaced points is numerically rank-deficient
    # in float32; the dtype-aware jitter floor must keep the factor finite
    # (regression: with eps=1e-12 this NaNs on f32).
    from gpar_tpu.ops.linalg import safe_cholesky

    x = jnp.asarray(np.linspace(0, 1e-3, 64)[:, None], jnp.float32)
    K = gram(EQ(), x, x)
    L = safe_cholesky(K)
    assert bool(jnp.isfinite(L).all())


def test_psd_sample_factor_indefinite():
    # Posterior covariances of near-interpolating GPs can be indefinite
    # beyond jitter repair; the sampling factor must stay finite and
    # reproduce the clamped matrix (regression: NaN predictive samples).
    from gpar_tpu.ops.linalg import psd_sample_factor, safe_cholesky

    n = 40
    A = np.asarray(rng.normal(size=(n, n)))
    K = (A + A.T) / 2
    w, V = np.linalg.eigh(K)
    w = np.abs(w)
    w[:5] = -1e-4  # indefinite at a level jitter ladders cannot repair
    K = jnp.asarray(V @ np.diag(w) @ V.T)

    assert bool(jnp.isnan(safe_cholesky(K)).any())  # cholesky cannot
    F = psd_sample_factor(K)
    assert bool(jnp.isfinite(F).all())
    K_hat = F @ F.T
    w_hat = np.linalg.eigvalsh(np.asarray(K_hat))
    assert w_hat.min() >= 0
    # Positive part of the spectrum is preserved.
    approx(np.sort(w_hat)[5:], np.sort(w)[5:], atol=1e-8)


def test_blocked_cholesky_matches_builtin():
    from gpar_tpu.ops.linalg import blocked_cholesky

    # Exact-multiple and padded (n % block != 0) paths, both panel
    # schedules (left-looking production default and the triangle-aware
    # right-looking form, ops/linalg._left_blocked_fwd/_right_blocked_fwd).
    for n, b in [(128, 32), (100, 32), (96, 96), (50, 64)]:
        K = jnp.asarray(_spd(n))
        for left in (True, False):
            L = blocked_cholesky(K, block=b, left=left)
            approx(L, jnp.linalg.cholesky(K), atol=1e-8)
            assert not np.any(np.triu(np.asarray(L), 1))


def test_blocked_cholesky_left_grad_matches_builtin():
    from gpar_tpu.ops.linalg import blocked_cholesky

    n, b = 96, 32
    A = rng.normal(size=(n, n))

    def loss(chol):
        def f(a):
            L = chol(a @ a.T + n * jnp.eye(n))
            return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L**2)

        return jax.grad(f)(jnp.asarray(A))

    g1 = loss(lambda K: blocked_cholesky(K, block=b, left=True))
    g2 = loss(jnp.linalg.cholesky)
    approx(g1, g2, atol=1e-8)


def test_blocked_cholesky_subblocked_panels_match_builtin():
    # Sub-blocked diagonal factorisation (ops/linalg._diag_factor,
    # config.blocked_cholesky_subblock): the inner right-looking steps must
    # reproduce the one-shot panel exactly — including the padded tail
    # (n % block != 0), multi-panel chains, and subblock == block (inner
    # loop degenerates to one step).
    from gpar_tpu.ops.linalg import blocked_cholesky

    for n, b, sb in [(128, 32, 8), (128, 32, 16), (100, 32, 8), (96, 32, 32), (160, 64, 16)]:
        K = jnp.asarray(_spd(n))
        L = blocked_cholesky(K, block=b, subblock=sb)
        approx(L, jnp.linalg.cholesky(K), atol=1e-8)
        # No fill-in above the diagonal.
        assert not np.any(np.triu(np.asarray(L), 1))


def test_blocked_cholesky_subblocked_grad_matches_builtin():
    from gpar_tpu.ops.linalg import blocked_cholesky

    n, b, sb = 96, 32, 8
    A = rng.normal(size=(n, n))

    def loss(chol):
        def f(a):
            L = chol(a @ a.T + n * jnp.eye(n))
            return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L**2)

        return jax.grad(f)(jnp.asarray(A))

    g1 = loss(lambda K: blocked_cholesky(K, block=b, subblock=sb))
    g2 = loss(jnp.linalg.cholesky)
    approx(g1, g2, atol=1e-8)


def test_tri_inv_lower():
    from gpar_tpu.ops.linalg import tri_inv_lower

    for n, base in [(16, 8), (96, 32), (128, 16)]:
        L = jnp.asarray(np.tril(rng.normal(size=(n, n))) + 3 * np.eye(n))
        got = tri_inv_lower(L, base=base)
        approx(got @ L, jnp.eye(n), atol=1e-9)
        # Strict upper triangle exactly zero (no fill-in).
        assert not np.any(np.triu(np.asarray(got), 1))


def test_blocked_cholesky_trsm_modes_agree():
    # The TRSM-via-inverse panel solve (config.cholesky_trsm_inverse) and
    # the direct TriangularSolve produce the same factor.
    from gpar_tpu.ops.linalg import blocked_cholesky

    K = jnp.asarray(_spd(160))
    old = config.cholesky_trsm_inverse
    try:
        config.cholesky_trsm_inverse = True
        L_inv = blocked_cholesky(K, block=32)
        config.cholesky_trsm_inverse = False
        L_dir = blocked_cholesky(K, block=32)
    finally:
        config.cholesky_trsm_inverse = old
    approx(L_inv, L_dir, atol=1e-9)
    approx(L_inv, jnp.linalg.cholesky(K), atol=1e-8)


def test_blocked_cholesky_grad_matches_builtin():
    from gpar_tpu.ops.linalg import blocked_cholesky

    n, b = 96, 32
    A = rng.normal(size=(n, n))

    def make_K(a):
        return a @ a.T + n * jnp.eye(n)

    def loss_blocked(a):
        L = blocked_cholesky(make_K(a), block=b)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L**2)

    def loss_builtin(a):
        L = jnp.linalg.cholesky(make_K(a))
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L**2)

    g1 = jax.grad(loss_blocked)(jnp.asarray(A))
    g2 = jax.grad(loss_builtin)(jnp.asarray(A))
    approx(g1, g2, atol=1e-8)


def test_blocked_cholesky_in_safe_cholesky_retry_ladder():
    from gpar_tpu.ops.linalg import blocked_cholesky

    # NaN propagation: an indefinite matrix must yield NaNs (not an
    # exception) so safe_cholesky's lax.cond retry ladder composes.
    n = 64
    K = jnp.asarray(_spd(n) - 3 * n * np.eye(n))  # indefinite
    L = blocked_cholesky(K, block=32)
    assert not bool(jnp.all(jnp.isfinite(L)))

    old = config.use_blocked_cholesky, config.blocked_cholesky_min, config.blocked_cholesky_block
    config.use_blocked_cholesky = True
    config.blocked_cholesky_min = 32
    config.blocked_cholesky_block = 32
    try:
        spd = jnp.asarray(_spd(96))
        approx(safe_cholesky(spd), jnp.linalg.cholesky(add_jitter(spd)), atol=1e-8)
        # Slightly indefinite input (rank-1 minus tiny): the escalating
        # ladder still returns a finite factor through the blocked path.
        v = rng.normal(size=(96, 1))
        bad = jnp.asarray(v @ v.T - 1e-9 * np.eye(96))
        assert bool(jnp.all(jnp.isfinite(safe_cholesky(bad))))
    finally:
        (
            config.use_blocked_cholesky,
            config.blocked_cholesky_min,
            config.blocked_cholesky_block,
        ) = old


def test_safe_cholesky_grad_finite_when_first_rung_fails():
    # A failed retry rung must contribute exactly ZERO gradient, not NaN:
    # the failed attempt's NaN primal would otherwise poison the backward
    # pass even with a zero cotangent (double-where trap).
    v = rng.normal(size=(8, 1))

    def loss(v):
        K = v @ v.T - 1e-8 * jnp.eye(8)  # slightly indefinite at eps=1e-12
        L = safe_cholesky(K)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L**2)

    val = loss(jnp.asarray(v))
    assert np.isfinite(float(val))
    g = jax.grad(loss)(jnp.asarray(v))
    assert np.isfinite(np.asarray(g)).all(), "retry ladder leaked NaN grads"


def test_safe_cholesky_relative_jitter_scales_with_max_diag():
    # A strongly non-uniform diagonal (one huge entry, like a
    # D^{-1}-weighted moment matrix) indefinite at -10: 1e-6*mean(diag)
    # ~ 3.1 would NOT repair it, 1e-6*max(diag) = 100 does.
    K = jnp.asarray(np.diag([-10.0] + [1.0] * 30 + [1e8]))
    L = safe_cholesky(K)
    assert bool(jnp.all(jnp.isfinite(L)))


def test_titsias_f32_small_noise_stays_finite():
    # float32, noise near the 1e-8 bound: B = I + A A^T has entries ~1e8
    # and is numerically indefinite; the finish must repair it instead of
    # NaN-ing the ELBO and the posterior factors (caught on the serving
    # config GPAR_TPU_NO_X64=1).
    from gpar_tpu.ops.kernels import EQ
    from gpar_tpu.ops.linalg import titsias_factors

    n, m = 512, 128
    x = jnp.asarray(rng.uniform(0, 10, (n, 1)), jnp.float32)
    z = jnp.asarray(np.linspace(0, 10, m)[:, None], jnp.float32)
    k = EQ().stretch(jnp.asarray([1.0], jnp.float32))
    y = jnp.asarray(np.sin(np.asarray(x[:, 0])), jnp.float32)
    noise = jnp.full((n,), 1e-6, jnp.float32)
    Kmm = gram(k, z, z)
    Kmn = gram(k, z, x)
    knn = kdiag(k, x)
    elbo, Lm, LB, beta = titsias_factors(
        Kmm, Kmn, knn, y, jnp.zeros_like(y), noise
    )
    assert np.isfinite(float(elbo))
    assert bool(jnp.all(jnp.isfinite(LB)))
    assert bool(jnp.all(jnp.isfinite(beta)))


def test_floor_noise_f64_noop_f32_floors():
    # floor_noise (ops/linalg.py): the effective-noise floor must be a
    # float64 no-op (config.epsilon 1e-12 < the reference's 1e-8 noise
    # bound, gpar/regression.py:172) and clamp to the f32 jitter epsilon
    # in float32, where near-bound noise makes the ELBO catastrophically
    # cancel (bench regression: layer NLL "-2.6e15").
    from gpar_tpu.ops.linalg import floor_noise, resolve_epsilon

    v64 = jnp.asarray([1e-8, 1e-10, 0.1], dtype=jnp.float64)
    approx(floor_noise(v64), np.array([1e-8, 1e-10, 0.1]), rtol=0)

    v32 = jnp.asarray([1e-8, 0.1], dtype=jnp.float32)
    out = np.asarray(floor_noise(v32))
    assert out[0] == np.float32(resolve_epsilon(jnp.float32))
    assert out[1] == np.float32(0.1)


def test_noise_floor_applied_in_gp_core_f32():
    # The FDD choke point (gp/core._noise_vec) applies the same floor:
    # an f32 observation covariance built with bound-level noise must be
    # the epsilon-floored one.
    from gpar_tpu.gp.core import GP
    from gpar_tpu.ops.kernels import EQ
    from gpar_tpu.ops.linalg import resolve_epsilon

    f = GP(EQ())
    x = jnp.asarray(np.linspace(0, 1, 5)[:, None], jnp.float32)
    fdd = f(x, 1e-8)
    eps = np.float32(resolve_epsilon(jnp.float32))
    approx(fdd.noise, np.full(5, eps), rtol=0)


def test_titsias_f32_elbo_accurate_at_noise_floor():
    # Cancellation-free formulation (ops/linalg.py titsias_factors): the
    # f32 ELBO at the f32 noise floor (1e-6, unit-scale kernel) must match
    # the f64 value to small relative error.  The textbook quad/trace
    # forms subtract 1/D-scale quantities and returned systematically
    # *positive* garbage here (observed "+2.6e13" on the bench), steering
    # L-BFGS into the degenerate region.
    from gpar_tpu.ops.kernels import EQ
    from gpar_tpu.ops.linalg import titsias_factors

    n, m = 2048, 128
    r = np.random.default_rng(7)
    x64 = np.sort(r.uniform(0, 10, n))[:, None]
    z64 = np.linspace(0, 10, m)[:, None]
    y64 = np.sin(x64[:, 0]) + 0.05 * r.standard_normal(n)

    def elbo(dtype):
        x = jnp.asarray(x64, dtype)
        z = jnp.asarray(z64, dtype)
        y = jnp.asarray(y64, dtype)
        k = EQ().stretch(jnp.asarray([1.0], dtype))
        noise = jnp.full((n,), 1e-6, dtype)
        e, _, _, beta = titsias_factors(
            gram(k, z, z), gram(k, z, x), kdiag(k, x), y,
            jnp.zeros_like(y), noise,
        )
        return float(e), np.asarray(beta)

    e64, _ = elbo(jnp.float64)
    e32, beta32 = elbo(jnp.float32)
    assert np.isfinite(e32)
    # Hugely negative (the model can't explain 0.05-noise data with 1e-6
    # noise), and f32 within 10% of f64 — not sign-flipped garbage.  The
    # 10% bar is what f32 can inherently deliver here: ``B = I + G`` has
    # condition ~1/d = 1e6 at the floor, so its Cholesky solve carries
    # ~kappa * eps_f32 ~ percent-level relative error into ``est`` no
    # matter how the reductions are ordered (measured: 5.2%).  The old
    # textbook formulation was off by SEVEN orders of magnitude with the
    # wrong sign — the property under test is scale/sign correctness, the
    # thing the optimiser steers by, not ulp accuracy.
    assert e64 < -1e5
    assert abs(e32 - e64) < 0.10 * abs(e64), (e32, e64)
    assert np.all(np.isfinite(beta32))


def test_psd_sample_factor_batched_matches_vmap():
    # The batched factoriser gates the retry ladder and the eigh fallback
    # on BATCH-level finiteness (real lax.cond branches, since it runs
    # outside vmap) but must return exactly what vmap(psd_sample_factor)
    # returns element for element — including when the batch mixes a
    # well-conditioned matrix, one needing an escalated jitter rung, and a
    # genuinely indefinite one that only the clamped eigh can repair.
    from gpar_tpu.ops.linalg import (
        psd_sample_factor,
        psd_sample_factor_batched,
        safe_cholesky,
    )

    n = 24
    ks = []
    # (a) comfortably SPD.
    ks.append(_spd(n))
    # (b) indefinite at a level an escalated absolute rung repairs.
    A = np.asarray(rng.normal(size=(n, n)))
    Ksym = (A + A.T) / 2
    w, V = np.linalg.eigh(Ksym)
    w = np.abs(w)
    w[:3] = -0.5 * config.epsilon * config.cholesky_retry_factors[0]
    ks.append(V @ np.diag(w) @ V.T)
    # (c) indefinite beyond the ladder: needs the clamped eigh.
    w2 = np.abs(w)
    w2[:5] = -1e-4
    ks.append(V @ np.diag(w2) @ V.T)
    K = jnp.asarray(np.stack(ks))

    # Sanity on the construction: (c) really defeats the ladder.
    assert bool(jnp.isnan(safe_cholesky(K[2])).any())

    F_ref = jax.vmap(psd_sample_factor)(K)
    F_bat = psd_sample_factor_batched(K)
    approx(F_bat, F_ref, atol=1e-12)

    # All-finite fast path (the gate everything hinges on) agrees too.
    K_ok = jnp.asarray(np.stack([_spd(n) for _ in range(4)]))
    approx(
        psd_sample_factor_batched(K_ok),
        jax.vmap(psd_sample_factor)(K_ok),
        atol=1e-12,
    )


def test_titsias_trace_clamp_blocks_f32_variance_blowup():
    # PERF.md finding 25: the Nystrom residual knn - qnn is >= 0 exactly,
    # but its operands scale with the kernel VARIANCE — at ~1e20 the f32
    # subtraction is pure cancellation noise of either sign, and an
    # unclamped negative trace (~-1e13 * d_inv) flips the ELBO hugely
    # POSITIVE, a degenerate direction L-BFGS rides to a garbage optimum
    # (observed on-chip: a bucketed f32 fit returned layer NLL -4.6e28
    # with input/var 4.4e29 while the exact-shape trajectory stayed
    # healthy; both programs share the basin).  With the clamp the trace
    # is nonnegative and the logdet barrier keeps the ELBO strongly
    # negative at extreme variance.
    from gpar_tpu.ops.kernels import EQ
    from gpar_tpu.ops.linalg import titsias_factors

    n, m = 256, 16
    x = jnp.asarray(rng.uniform(0, 10, (n, 1)), jnp.float32)
    z = jnp.asarray(np.linspace(0, 10, m)[:, None], jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x[:, 0])), jnp.float32)
    noise = jnp.full((n,), 2.5e-4, jnp.float32)

    for v in [1e12, 1e20, 1e29]:
        k = jnp.float32(v) * EQ().stretch(jnp.asarray([1.0], jnp.float32))
        elbo, *_ = titsias_factors(
            gram(k, z, z), gram(k, z, x), kdiag(k, x), y,
            jnp.zeros_like(y), noise,
        )
        # The barrier: enormous prior variance must be enormously
        # unlikely, never favourable.
        assert float(elbo) < -1e4, (v, float(elbo))

    # And the clamp is a rounding-level no-op at sane variances (f64).
    x64 = jnp.asarray(rng.uniform(0, 10, (64, 1)))
    z64 = jnp.asarray(np.linspace(0, 10, 8)[:, None])
    y64 = jnp.sin(x64[:, 0])
    k64 = 1.3 * EQ().stretch(jnp.asarray([0.9]))
    e1, *_ = titsias_factors(
        gram(k64, z64, z64), gram(k64, z64, x64), kdiag(k64, x64),
        y64, jnp.zeros_like(y64), jnp.full((64,), 0.01),
    )
    assert np.isfinite(float(e1))
