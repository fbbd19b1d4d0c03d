"""Dense linear algebra for the GP core.

This is the TPU-native replacement for the numerics the reference delegates
to stheno/matrix/torch-LAPACK: jittered Cholesky factorisations, triangular
solves, MVN log-densities and the collapsed Titsias (2009) ELBO with
per-point noise (invoked by the reference at ``gpar/model.py:226`` via
``f.measure.logpdf(obs)`` and at ``gpar/model.py:286-289`` via
``PseudoObs``).

Everything here is shape-static and jit/grad-safe.  Cholesky failures are
handled with an escalating-jitter retry ladder (``lax.cond`` so only one
factorisation runs when the first succeeds), mirroring the reference's
reliance on the global ``B.epsilon`` knob (see ``config.epsilon``).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from ..config import config

__all__ = [
    "add_jitter",
    "blocked_cholesky",
    "safe_cholesky",
    "solve_lower",
    "solve_chol",
    "mvn_logpdf",
    "mvn_logpdf_chol",
    "titsias_elbo",
    "titsias_factors",
    "titsias_solve",
    "titsias_assemble",
    "psd_sample_factor",
    "LOG_2PI",
]

LOG_2PI = 1.8378770664093453  # log(2 * pi)


def resolve_epsilon(dtype, epsilon=None):
    """Effective Cholesky jitter for ``dtype``.

    ``config.epsilon`` (the ``lab.B.epsilon`` analogue, default 1e-12) is a
    float64 value; in float32 it is below the representable resolution of
    typical Gram entries, so the float32 floor ``config.epsilon_f32``
    (default 1e-6, the value the reference's ill-conditioned example sets
    globally, ``examples/paper/air_temp.py:18``) applies instead.  An
    explicit ``epsilon`` argument always wins.
    """
    if epsilon is not None:
        return epsilon
    eps = config.epsilon
    if jnp.dtype(dtype) == jnp.dtype("float32"):
        eps = max(eps, getattr(config, "epsilon_f32", 1e-6))
    return eps


def floor_noise(noise_diag):
    """Per-point noise variances floored at the dtype's jitter epsilon.

    The reference bounds the noise *variable* at 1e-8
    (``gpar/regression.py:172``) — fine in float64, but far below float32
    resolution on unit-scale Grams: the Titsias quad-form/trace terms scale
    as ``1/noise`` and catastrophically cancel near the bound, producing
    garbage ELBO values *and* gradients that trap L-BFGS in the degenerate
    region (observed at n=10k/p=16: one layer's NLL "-2.6e15", noise pinned
    at 1e-8, SMSE 16x worse than its siblings).  Flooring the *effective*
    noise at :func:`resolve_epsilon` keeps the objective numerically
    meaningful without touching variable semantics: a no-op in float64
    (1e-12 < the 1e-8 bound), 1e-6 in float32 — the same scale the Cholesky
    jitter already imposes on every covariance, so no new approximation is
    introduced.  Applied at the two choke points every likelihood/sampling
    path flows through (``gp/core._noise_vec`` and the scan-fused bodies'
    ``noise / w``), so fused and unrolled paths stay bit-consistent.
    """
    return jnp.maximum(noise_diag, resolve_epsilon(noise_diag.dtype))


def add_jitter(K, epsilon=None):
    """Add ``epsilon`` to the diagonal of a square matrix."""
    eps = resolve_epsilon(K.dtype, epsilon)
    n = K.shape[-1]
    return K + eps * jnp.eye(n, dtype=K.dtype)


def tri_inv_lower(L, base=128):
    """Inverse of a small lower-triangular block by recursive 2x2 block
    partitioning: ``inv([[A, 0], [B, C]]) = [[iA, 0], [-iC B iA, iC]]``.

    Turns all but the ``base x base`` leaf solves into MXU matmuls — the
    building block of the TRSM -> TRTRI+GEMM panel solve
    (``config.cholesky_trsm_inverse``).  Intended for panel-sized blocks
    (hundreds); the recursion is a Python unroll, so sizes must be
    concrete (they are: panel widths are config constants).
    """
    n = L.shape[-1]
    if n <= base:
        return solve_triangular(L, jnp.eye(n, dtype=L.dtype), lower=True)
    h = n // 2
    iA = tri_inv_lower(L[:h, :h], base)
    iC = tri_inv_lower(L[h:, h:], base)
    X = -iC @ (L[h:, :h] @ iA)
    top = jnp.concatenate([iA, jnp.zeros((h, n - h), L.dtype)], axis=1)
    bot = jnp.concatenate([X, iC], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _panel_solve(Ljj, A21):
    """``L21 = A21 Ljj^{-T}`` — via explicit inversion + one matmul when
    ``config.cholesky_trsm_inverse``, else the direct triangular solve.
    Measured on-chip (n=8192, b=512, same session): no difference between
    the two (the wide TRSM is NOT the panel bottleneck on this chip), so
    the plain solve is the default; the TRTRI+GEMM form stays available
    for chips where TriangularSolve lowers poorly."""
    if config.cholesky_trsm_inverse:
        return A21 @ tri_inv_lower(Ljj).T
    return solve_triangular(Ljj, A21.T, lower=True).T


def _diag_factor(D, subblock):
    """Cholesky of the (b, b) diagonal block.

    With ``subblock`` set, runs ``b / subblock`` right-looking inner steps
    inside the block so the serial leaf shrinks from ``chol(b)`` to
    ``chol(subblock)``; the sub-column solves and intra-block updates are
    MXU matmuls.  Measured on-chip at n=8192/b=512 (same session):
    sub-blocking is a slight LOSS (11.84 ms sub=128 vs 10.95 ms one-shot)
    — the XLA builtin ``chol(512)`` leaf is not the critical-path cost the
    round-1 profile suggested — so ``None`` (one-shot builtin) is the
    default and the knob stays for other chip generations.
    """
    b = D.shape[0]
    if subblock is None or subblock >= b:
        return jnp.linalg.cholesky(D)
    assert b % subblock == 0, (b, subblock)
    for k0 in range(0, b, subblock):
        k1 = k0 + subblock
        Lkk = jnp.linalg.cholesky(D[k0:k1, k0:k1])
        D = D.at[k0:k1, k0:k1].set(Lkk)
        if k1 < b:
            below = _panel_solve(Lkk, D[k1:, k0:k1])
            D = D.at[k1:, k0:k1].set(below)
            D = D.at[k1:, k1:].add(-below @ below.T)
    # The strict upper triangle still holds stale symmetric entries; zero
    # it so the factor matches the builtin exactly.
    return jnp.tril(D)


def _left_blocked_fwd(K, block, subblock):
    """Left-looking blocked Cholesky, lower triangle.

    Panel ``j`` applies ALL prior panels' contributions as ONE rectangular
    GEMM (``L[j0:, :j0] @ L[j0:j0+b, :j0].T``) instead of maintaining a
    running trailing-update buffer: same n³/3 FLOPs as the triangle-aware
    right-looking form, but nb large MXU matmuls replace nb²/2 small syrk
    updates + their dynamic-update-slice writes, and the only mutated
    buffer is the factor itself (two disjoint slice writes per panel).
    Measured on-chip at n=8192 (same session): 10.19 ms at b=256 vs
    10.95 ms for the right-looking form at its best width (b=512) —
    the buffer-update overhead, not FLOPs, was the difference.
    """
    n = K.shape[-1]
    nb = n // block
    L = jnp.zeros_like(K)
    for j in range(nb):
        j0 = j * block
        S = K[j0:, j0 : j0 + block]
        if j0:
            S = S - L[j0:, :j0] @ L[j0 : j0 + block, :j0].T
        Ljj = _diag_factor(S[:block], subblock)
        L = L.at[j0 : j0 + block, j0 : j0 + block].set(Ljj)
        if j0 + block < n:
            L21 = _panel_solve(Ljj, S[block:])
            L = L.at[j0 + block :, j0 : j0 + block].set(L21)
    return L


def _right_blocked_fwd(K, block, subblock):
    """Right-looking blocked Cholesky, lower triangle, triangle-aware.

    The trailing (syrk) update touches only the block-columns at or below
    the diagonal, halving its FLOPs versus the naive full-square
    ``A -= L21 @ L21.T`` — the MXU work then runs within ~7% of a pure
    f32-highest matmul at n=8192 (see PERF.md).  Requires ``n`` to be a
    multiple of ``block`` (callers pad; see :func:`blocked_cholesky`).
    The strict upper triangle of the result is exactly zero (the scatter
    target starts from zeros and only lower blocks are written).

    The diagonal factor and the below-diagonal solve are written into
    ``L`` as TWO disjoint slice updates, NOT concatenated into one
    full-height panel write: the concat + single dynamic-update-slice
    form measured 2.08x slower on-chip at n=8192 (22.8 vs 11.0 ms, same
    session, identical math — XLA fails to update in place through the
    concatenate and copies the buffer every panel).
    """
    n = K.shape[-1]
    nb = n // block
    L = jnp.zeros_like(K)
    A = K
    for j in range(nb):
        j0 = j * block
        Ljj = _diag_factor(A[j0 : j0 + block, j0 : j0 + block], subblock)
        L = L.at[j0 : j0 + block, j0 : j0 + block].set(Ljj)
        if j0 + block < n:
            L21 = _panel_solve(Ljj, A[j0 + block :, j0 : j0 + block])
            L = L.at[j0 + block :, j0 : j0 + block].set(L21)
            for c in range(j + 1, nb):
                c0 = c * block
                upd = L21[c0 - j0 - block :, :] @ L21[c0 - j0 - block : c0 - j0, :].T
                A = A.at[c0:, c0 : c0 + block].add(-upd)
    return L


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
def _blocked_cholesky(K, block, subblock, left):
    fwd = _left_blocked_fwd if left else _right_blocked_fwd
    return fwd(K, block, subblock)


@_blocked_cholesky.defjvp
def _blocked_cholesky_jvp(block, subblock, left, primals, tangents):
    # Standard Cholesky differential: for K = L Lᵀ and symmetric dK,
    # dL = L φ(L⁻¹ dK L⁻ᵀ) with φ(A) = tril(A, -1) + diag(A)/2.  Linear in
    # dK through constant-L triangular solves, so JAX transposes it for
    # reverse mode automatically — the backward pass costs two solves and
    # two matmuls instead of differentiating through every panel.
    (K,) = primals
    (dK,) = tangents
    L = _blocked_cholesky(K, block, subblock, left)
    Lt = jnp.tril(L)
    dK = (dK + dK.T) / 2.0
    tmp = solve_triangular(Lt, dK, lower=True)
    W = solve_triangular(Lt, tmp.T, lower=True).T
    phi = jnp.tril(W, -1) + 0.5 * jnp.diag(jnp.diagonal(W))
    return L, jnp.tril(Lt @ phi)


_UNSET = object()


def blocked_cholesky(K, block=None, subblock=_UNSET, left=None):
    """Blocked Cholesky of an SPD matrix (lower factor).

    Faster than XLA's builtin factorisation on TPU for n >= ~4096 (see
    ``config.use_blocked_cholesky`` for measured numbers); exact same
    semantics (returns NaNs if the matrix is indefinite, so
    :func:`safe_cholesky`'s retry ladder composes).  ``n`` not divisible
    by the panel width is handled by factorising ``blockdiag(K, I)`` —
    block-diagonal inputs have block-diagonal factors, so the top-left
    slice is exact.  The upper triangle is exactly zero by construction
    (no ``tril`` pass is spent on it).  Two scheduling variants (``left``,
    default from ``config.blocked_cholesky_left``): the left-looking form
    (one big GEMM per panel — measured fastest, see
    :func:`_left_blocked_fwd`) and the triangle-aware right-looking form
    (:func:`_right_blocked_fwd`).  ``subblock`` (default from
    ``config.blocked_cholesky_subblock``) sub-factorises each diagonal
    block so the serial leaf is a ``subblock``-sized Cholesky (see
    :func:`_diag_factor`).
    """
    if block is None:
        block = config.blocked_cholesky_block
    if subblock is _UNSET:
        subblock = config.blocked_cholesky_subblock
    if left is None:
        left = config.blocked_cholesky_left
    n = K.shape[-1]
    if n <= block:
        return jnp.linalg.cholesky(K)
    pad = (-n) % block
    if pad:
        K = jnp.block(
            [
                [K, jnp.zeros((n, pad), K.dtype)],
                [jnp.zeros((pad, n), K.dtype), jnp.eye(pad, dtype=K.dtype)],
            ]
        )
    L = _blocked_cholesky(K, block, subblock, bool(left))
    return L[:n, :n] if pad else L


def _dense_cholesky(K):
    """Dispatch: blocked panels on TPU at large n, XLA builtin otherwise."""
    use = config.use_blocked_cholesky
    if use is None:
        use = (
            jax.default_backend() == "tpu"
            and K.shape[-1] >= config.blocked_cholesky_min
        )
    return blocked_cholesky(K) if use else jnp.linalg.cholesky(K)


@jax.custom_vjp
def _chol_grad_safe(K):
    """``_dense_cholesky`` whose backward pass is NaN-proof.

    A failed (indefinite) factorisation returns a NaN primal; the standard
    Cholesky VJP would then compute solves with that NaN factor, and even a
    ZERO cotangent times a NaN intermediate is NaN — so one failed retry
    rung inside :func:`safe_cholesky` would poison the gradient of the
    whole objective although the *value* is finite (the classic
    double-``where`` trap).  This wrapper zeroes the cotangent cleanly when
    the primal factor is non-finite.
    """
    return _dense_cholesky(K)


def _chol_grad_safe_fwd(K):
    L = _dense_cholesky(K)
    return L, L


def _chol_grad_safe_bwd(L, Lbar):
    # Per-matrix check (keepdims) so a vmapped batch with one failed lane
    # zeroes only that lane's cotangent.
    ok = jnp.all(jnp.isfinite(L), axis=(-2, -1), keepdims=True)
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    Ls = jnp.where(ok, L, eye)
    Lbs = jnp.where(ok, jnp.tril(Lbar), 0.0)
    # Standard Cholesky reverse (Murray 2016): with P = Phi(L^T Lbar),
    # Phi = tril with halved diagonal, the input cotangent is
    # sym(L^{-T} P L^{-1}).
    P = jnp.tril(Ls.T @ Lbs)
    P = P - 0.5 * jnp.diag(jnp.diagonal(P))
    tmp = solve_triangular(Ls, P, lower=True, trans=1)  # L^{-T} P
    Kbar = solve_triangular(Ls, tmp.T, lower=True, trans=1).T  # ... L^{-1}
    Kbar = 0.5 * (Kbar + Kbar.T)
    return (jnp.where(ok, Kbar, 0.0),)


_chol_grad_safe.defvjp(_chol_grad_safe_fwd, _chol_grad_safe_bwd)


def safe_cholesky(K, epsilon=None):
    """Cholesky with escalating-jitter retries.

    Tries ``K + eps I`` first; on NaN (indefinite matrix) escalates the
    jitter by ``config.cholesky_retry_factors``.  ``lax.cond`` ensures only
    the needed factorisations execute under jit (on unbatched paths; under
    ``vmap`` both branches run — PERF.md finding 9).  Failed rungs
    contribute exactly zero to the gradient (:func:`_chol_grad_safe`), so
    the objective stays differentiable whenever the *returned* factor is
    finite.
    """
    eps = resolve_epsilon(K.dtype, epsilon)
    n = K.shape[-1]
    if n == 0:
        return jnp.zeros_like(K)
    eye = jnp.eye(n, dtype=K.dtype)

    def attempt(e):
        return _chol_grad_safe(K + e * eye)

    L = attempt(eps)
    for factor in config.cholesky_retry_factors:
        L = lax.cond(
            jnp.all(jnp.isfinite(L)),
            lambda L=L: L,
            lambda f=factor: attempt(eps * f),
        )
    # Last resort: jitter relative to the matrix's own scale.  Absolute
    # rungs top out at eps * max(factor) (1e-6 at the f64 default), which
    # cannot repair a covariance that has gone indefinite at a scale set
    # by its LARGEST diagonal entry (u * lambda_max); 1e-6 of max(diag)
    # covers that (mean(diag) does not when the diagonal is strongly
    # non-uniform, e.g. Linear-kernel Grams or D^{-1}-weighted moment
    # matrices), at the cost of slightly inflated variances on that
    # (already degenerate) factorisation only.
    rel = 1e-6 * jnp.max(jnp.abs(jnp.diagonal(K)))
    L = lax.cond(
        jnp.all(jnp.isfinite(L)),
        lambda L=L: L,
        lambda: attempt(jnp.maximum(rel, eps)),
    )
    return L


def psd_sample_factor(K, epsilon=None):
    """A factor ``F`` with ``F F^T ~= K`` that is always finite, for MVN
    *sampling* (``F @ z``; F need not be triangular).

    Tries the jittered Cholesky first.  If the matrix is genuinely
    indefinite beyond what jitter can repair — posterior covariances of
    near-interpolating GPs (noise at the 1e-8 floor, condition numbers
    ~1e12) can be indefinite at the 1e-4 level in float64 — falls back to
    an eigendecomposition with negative eigenvalues clamped to the jitter
    level: the closest PSD matrix in Frobenius norm.  Log-densities keep
    using :func:`safe_cholesky` (a clamped density would be silently
    wrong; a clamped *sample* is the standard fix).
    """
    eps = resolve_epsilon(K.dtype, epsilon)
    n = K.shape[-1]
    if n == 0:
        return jnp.zeros_like(K)
    L = safe_cholesky(K, epsilon)

    def clamped():
        w, V = jnp.linalg.eigh(K)
        return V * jnp.sqrt(jnp.maximum(w, eps))[None, :]

    return lax.cond(
        jnp.all(jnp.isfinite(L)), lambda: L, clamped
    )


def psd_sample_factor_batched(K, epsilon=None):
    """:func:`psd_sample_factor` over a leading batch axis, with the retry
    ladder and the eigh fallback gated on BATCH-level finiteness.

    Under ``vmap``, ``lax.cond`` lowers to ``select`` and BOTH branches
    execute for every batch element — so ``vmap(psd_sample_factor)`` pays
    every retry rung *plus* a full eigendecomposition per element even when
    the plain jittered Cholesky succeeds for all of them (PERF.md finding
    9: the dominant cost of per-sample ancestral serving).  Called OUTSIDE
    the vmap on the stacked covariances ``K`` of shape (S, n, n), the
    ``lax.cond`` gates here are real branches: the common all-finite case
    costs exactly one batched Cholesky, and each escalation rung (and the
    eigh) runs only when some element actually needs it.  When a rung does
    run, per-element ``where`` keeps already-finite factors — the result
    matches ``vmap(psd_sample_factor)(K)`` element for element.
    """
    eps = resolve_epsilon(K.dtype, epsilon)
    n = K.shape[-1]
    if n == 0:
        return jnp.zeros_like(K)
    eye = jnp.eye(n, dtype=K.dtype)

    def attempt(e):
        # e: scalar or (S, 1, 1).  vmap keeps _chol_grad_safe's per-lane
        # NaN-proof VJP semantics; XLA lowers it to one batched Cholesky.
        return jax.vmap(_chol_grad_safe)(K + e * eye)

    def finite_each(L):
        return jnp.all(jnp.isfinite(L), axis=(-2, -1), keepdims=True)

    L = attempt(eps)
    for factor in config.cholesky_retry_factors:
        L = lax.cond(
            jnp.all(jnp.isfinite(L)),
            lambda L=L: L,
            lambda L=L, f=factor: jnp.where(
                finite_each(L), L, attempt(eps * f)
            ),
        )
    # Relative rung + clamped-eigh fallback, per psd_sample_factor.
    rel = 1e-6 * jnp.max(
        jnp.abs(jnp.diagonal(K, axis1=-2, axis2=-1)), axis=-1
    )
    L = lax.cond(
        jnp.all(jnp.isfinite(L)),
        lambda L=L: L,
        lambda L=L: jnp.where(
            finite_each(L),
            L,
            attempt(jnp.maximum(rel, eps)[:, None, None]),
        ),
    )

    def clamped(L=L):
        w, V = jnp.linalg.eigh(K)
        F = V * jnp.sqrt(jnp.maximum(w, eps))[..., None, :]
        return jnp.where(finite_each(L), L, F)

    return lax.cond(jnp.all(jnp.isfinite(L)), lambda L=L: L, clamped)


def solve_lower(L, b):
    """Solve ``L x = b`` with ``L`` lower triangular."""
    if L.shape[-1] == 0:
        return b
    return solve_triangular(L, b, lower=True)


def solve_chol(L, b):
    """Solve ``(L L^T) x = b`` given the Cholesky factor ``L``."""
    if L.shape[-1] == 0:
        return b
    return solve_triangular(
        L, solve_triangular(L, b, lower=True), lower=True, trans=1
    )


def mvn_logpdf_chol(y, mean, L):
    """Exact MVN log density given the Cholesky factor of the covariance.

    Replaces ``stheno``'s ``fdd.logpdf(y)`` (reference semantics at
    ``tests/test_model.py:137-147``).  ``y``/``mean`` are vectors (n,).
    """
    n = y.shape[0]
    if n == 0:
        return jnp.zeros((), dtype=y.dtype)
    r = y - mean
    a = solve_lower(L, r)
    return (
        -0.5 * n * LOG_2PI
        - jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * jnp.sum(a * a)
    )


def mvn_logpdf(y, mean, K, epsilon=None):
    """Exact MVN log density with covariance ``K`` (jittered Cholesky)."""
    return mvn_logpdf_chol(y, mean, safe_cholesky(K, epsilon))


def titsias_elbo(Kmm, Kmn, knn_diag, y, mean, noise_diag, epsilon=None):
    """Collapsed Titsias (2009) ELBO with heteroscedastic noise.

    Computes (reference semantics pinned by ``tests/test_model.py:141-149``:
    equals the exact logpdf when inducing inputs coincide with the data)::

        log N(y | mean, Q_nn + D) - 1/2 * sum_i (K_nn - Q_nn)_ii / D_ii

    where ``Q_nn = K_nm K_mm^{-1} K_mn`` and ``D = diag(noise_diag)`` is the
    per-point noise ``noise / w`` (``gpar/model.py:287``).

    All heavy work is in the m x n panel products, which XLA maps onto the
    MXU; cost is O(n m^2), never materialising an n x n matrix.

    Args:
        Kmm: (m, m) Gram at inducing points.
        Kmn: (m, n) cross Gram inducing x data.
        knn_diag: (n,) data-kernel diagonal.
        y: (n,) observations.
        mean: (n,) prior mean at the data (zero for prior GPs).
        noise_diag: (n,) per-point noise variances.

    Returns:
        Scalar ELBO.
    """
    if y.shape[0] == 0:
        return jnp.zeros((), dtype=y.dtype)
    return titsias_factors(Kmm, Kmn, knn_diag, y, mean, noise_diag, epsilon)[0]


def titsias_factors(Kmm, Kmn, knn_diag, y, mean, noise_diag, epsilon=None, mask=None):
    """Collapsed Titsias ELBO *and* the sparse-posterior factors from one
    factorisation pass.

    The single source of the Titsias math: :func:`titsias_elbo` and the
    GP core's ``PseudoObs`` (``gp/core.py``) both delegate here, so the
    ELBO and the posterior can never drift apart.

    ``mask`` (optional, (n,) of 0/1) excludes rows exactly: a masked row's
    noise is treated as infinite (``D^{-1} -> 0``) and its logdet/count
    contributions are zeroed — the same neutralisation the multi-chip path
    uses for padding (``parallel/sharded.py``), reused by the scan-fused
    fit to keep every layer's row count shape-uniform.

    Returns:
        ``(elbo, Lm, LB, beta)`` with ``Lm = chol(Kmm)``,
        ``LB = chol(I + Lm^{-1} Kmn D^{-1} Knm Lm^{-T})`` and
        ``beta = Sigma_B^{-1} Kmn D^{-1} r`` where
        ``Sigma_B = Kmm + Kmn D^{-1} Knm`` — the quantities the sparse
        posterior mean/covariance are built from.
    """
    r = y - mean
    if mask is None:
        d_inv = 1.0 / noise_diag
        logdet_d = jnp.sum(jnp.log(noise_diag))
        n_eff = y.shape[0]
    else:
        # Mask applied to d_inv (not inside sqrt/log): ``mask / noise`` is
        # differentiable everywhere (noise > 0) and exactly zeroes the
        # masked rows' contributions to every sum below.
        r = r * mask
        d_inv = mask / noise_diag
        logdet_d = jnp.sum(jnp.log(noise_diag) * mask)
        n_eff = jnp.sum(mask)

    # Cancellation-free float32 formulation.  The textbook form scales
    # ``A = Lm^{-1} Kmn D^{-1/2}`` and computes ``quad = r^T D^{-1} r -
    # |LB^{-1} A D^{-1/2} r|^2`` and ``trace = sum knn/D - tr(A A^T)`` —
    # two differences of 1/D-scale quantities.  At the float32 noise floor
    # (D ~ 1e-6, unit-scale kernels) those operands reach ~1e10-1e12 and
    # the subtractions lose ALL significant digits, with a systematic
    # sign: the computed ELBO comes out hugely *positive* (observed:
    # "+2.6e13") and L-BFGS steers straight into the garbage region,
    # pinning the noise at its bound and wrecking the layer's fit.
    # Instead keep ``A0 = Lm^{-1} Kmn`` at O(1) scale and compute both
    # differences on O(1) operands BEFORE dividing by D:
    #   trace = sum_i (knn_i - qnn_i) * d_inv_i,   qnn = diag(A0^T A0)
    #   quad  = sum_i r_i (r_i - est_i) * d_inv_i, est = Knm beta
    # using the Woodbury identity (Q + D)^{-1} r = D^{-1}(r - Knm beta).
    # ``est`` costs one extra (n, m) matvec: ``Knm beta = A0^T (Lm^T beta)
    # = A0^T w`` with ``w = LB^{-T} c`` already available.
    Lm = safe_cholesky(Kmm, epsilon)
    A0 = solve_lower(Lm, Kmn)  # (m, n), O(1) entries
    qnn = jnp.sum(A0 * A0, axis=0)
    # The Nyström residual knn - qnn is >= 0 in exact arithmetic; clamp
    # it there.  In float32 its operands scale with the kernel VARIANCE,
    # so at extreme variances (~1e29, reachable mid-optimisation) the
    # subtraction is pure cancellation noise of either sign — an
    # unclamped negative "trace" of ~-1e25 flips the ELBO hugely
    # positive, which L-BFGS then rides to a garbage optimum (observed on
    # TPU f32, PERF.md finding 25).  The clamp restores the physical
    # barrier (huge variance => huge nonnegative trace penalty) and is a
    # rounding-level no-op in float64.
    trace_num = jnp.sum(jnp.maximum(knn_diag - qnn, 0.0) * d_inv)
    G = (A0 * d_inv[None, :]) @ A0.T
    u = A0 @ (r * d_inv)
    LB, w, beta = titsias_solve(G, u, Lm)
    est = A0.T @ w
    quad = jnp.sum(r * (r - est) * d_inv)
    elbo = titsias_assemble(logdet_d, LB, quad, trace_num, n_eff)
    return elbo, Lm, LB, beta


def titsias_solve(G, u, Lm):
    """The replicated O(m^3) core of the collapsed Titsias ELBO, shared by
    the single-device path (:func:`titsias_factors`) and the multi-chip
    path (``parallel/sharded.py`` computes the same global ``G``/``u``
    with one ``psum`` and calls this) — ONE copy of the B/LB/beta algebra.

    ``B = I + G`` is factorised with :func:`safe_cholesky`: in float32
    with near-floor noise, ``G``'s entries reach ~1e8 and round-off makes
    ``B`` numerically indefinite — a raw Cholesky would NaN the ELBO and
    every posterior factor (the retry ladder's max(diag)-relative rung
    repairs exactly this case).  ``G`` is resymmetrised here (it is built
    as a generic matmul, not a syrk, so fp asymmetry is possible).

    Args:
        G: (m, m) ``Lm^{-1} Kmn D^{-1} Knm Lm^{-T}``.
        u: (m,) ``Lm^{-1} Kmn D^{-1} r``.
        Lm: (m, m) Cholesky factor of ``Kmm``.

    Returns:
        ``(LB, w, beta)`` with ``LB = chol(I + G)``, ``w = LB^{-T} LB^{-1}
        u = Lm^T beta`` (the vector ``est = A0^T w`` needs), and
        ``beta = Sigma_B^{-1} Kmn D^{-1} r``.
    """
    m = G.shape[-1]
    G = 0.5 * (G + G.T)
    LB = safe_cholesky(G + jnp.eye(m, dtype=G.dtype))
    c = solve_lower(LB, u)
    w = solve_triangular(LB, c, lower=True, trans=1)
    beta = solve_triangular(Lm, w, lower=True, trans=1)
    return LB, w, beta


def titsias_assemble(logdet_d, LB, quad, trace_num, n_total):
    """Assemble the collapsed ELBO from its stable pieces (shared by the
    single-device and sharded paths; see :func:`titsias_factors` for the
    formulation and why ``quad``/``trace_num`` arrive pre-reduced)."""
    logdet = logdet_d + 2.0 * jnp.sum(jnp.log(jnp.diagonal(LB)))
    lognorm = -0.5 * (n_total * LOG_2PI + logdet + quad)
    return lognorm - 0.5 * trace_num
