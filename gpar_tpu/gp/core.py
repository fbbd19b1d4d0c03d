"""Gaussian-process core: priors, finite-dimensional distributions,
observations, and posteriors.

TPU-native replacement for the slice of ``stheno`` the reference uses
(``gpar/model.py:5`` imports ``Obs``/``PseudoObs``; call-site semantics are
documented in SURVEY.md §2.3):

- ``GP(kernel)``: zero-mean prior.
- ``f(x, noise)``: finite-dimensional distribution (``FDD``) with per-point
  noise (``noise / w`` at ``gpar/model.py:270,287``); ``.sample(key)`` and
  ``.logpdf(y)``.
- ``Obs(f(x, noise), y)``: exact observations; ``obs.logpdf`` is the
  marginal likelihood (``f.measure.logpdf(obs)``, ``gpar/model.py:226``).
- ``PseudoObs(f(x_ind), f(x, noise), y)``: Titsias collapsed ELBO
  (``gpar/model.py:286-289``), equal to the exact logpdf when
  ``x_ind == x`` (parity fixture ``tests/test_model.py:141-149``).
- ``f | obs``: posterior with evaluable ``.mean`` and sampleable FDDs
  (``gpar/model.py:170,298-299``).

All objects are frozen-dataclass pytrees with *precomputed factors* (chol,
solves) as leaves, so conditioning happens once and sampling/prediction jit
cleanly with the factors as constants or arguments.  Everything is
shape-static; rows with NaNs are filtered by the caller (GPAR model layer)
before construction.

``Obs`` and ``PseudoObs`` are factory functions returning ``DenseObs`` /
``TitsiasObs`` dataclasses, so call sites read like the reference while the
pytree types stay clean.
"""

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..ops.kernels import Kernel, gram, kdiag
from ..ops.linalg import (
    LOG_2PI,
    floor_noise,
    mvn_logpdf_chol,
    safe_cholesky,
    solve_chol,
    solve_lower,
    titsias_factors,
)

__all__ = [
    "GP",
    "FDD",
    "Obs",
    "PseudoObs",
    "SparseObs",
    "DenseObs",
    "TitsiasObs",
    "PosteriorGP",
    "SparsePosteriorGP",
    "condition",
]


def _register(cls, meta_fields=()):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(
        cls,
        data_fields=[f for f in fields if f not in meta_fields],
        meta_fields=list(meta_fields),
    )
    return cls


def _upcol(x):
    x = jnp.asarray(x)
    return x[:, None] if x.ndim == 1 else x


def _vec(y):
    y = jnp.asarray(y)
    return y[:, 0] if y.ndim == 2 else y


def _noise_vec(noise, n, dtype):
    """Broadcast scalar / vector noise to an (n,) vector; None stays None.

    Floors the effective noise at the dtype's jitter epsilon
    (:func:`gpar_tpu.ops.linalg.floor_noise`): a float64 no-op, but in
    float32 it keeps the likelihood numerically meaningful when the
    optimiser drives the (1e-8-bounded) noise variable below float32
    resolution."""
    if noise is None:
        return None
    noise = jnp.asarray(noise, dtype=dtype)
    if noise.ndim == 0:
        noise = jnp.full((n,), noise, dtype=dtype)
    return floor_noise(jnp.reshape(noise, (n,)))


class AbstractGP:
    """Mixin providing the common GP surface (call, mean, condition)."""

    def __call__(self, x, noise=None):
        x = _upcol(x)
        return FDD(self, x, _noise_vec(noise, x.shape[0], x.dtype))

    def mean(self, x):
        """Mean at inputs, as an (n, 1) column (stheno convention relied on
        by ``gpar/model.py:299,305``)."""
        return self.mean_vec(_upcol(x))[:, None]

    def __or__(self, obs):
        return condition(self, obs)


@dataclass(frozen=True)
class GP(AbstractGP):
    """Zero-mean GP prior (``GP(kernel, measure=Measure())``,
    ``gpar/regression.py:176-180``)."""

    kernel: Kernel

    def mean_vec(self, x):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def cov(self, x, y=None):
        x = _upcol(x)
        y = x if y is None else _upcol(y)
        return gram(self.kernel, x, y)

    def cov_diag(self, x):
        return kdiag(self.kernel, _upcol(x))


_register(GP)


@dataclass(frozen=True)
class PosteriorGP(AbstractGP):
    """Exact posterior of a zero-mean GP given noisy observations.

    Stores the conditioning set and its factorisation so that further exact
    conditioning concatenates data and refactors.

    mean(x*) = K(x*, X) alpha,  alpha = (K(X, X) + D)^{-1} y
    cov(x*, y*) = K(x*, y*) - V_x^T V_y,  V_x = L^{-1} K(X, x*)
    """

    kernel: Kernel
    x_data: jnp.ndarray  # (n, d)
    y_data: jnp.ndarray  # (n,)
    noise_diag: jnp.ndarray  # (n,)
    L: jnp.ndarray  # (n, n) chol of K + D
    alpha: jnp.ndarray  # (n,)

    def mean_vec(self, x):
        return gram(self.kernel, x, self.x_data) @ self.alpha

    def cov(self, x, y=None):
        x = _upcol(x)
        y = x if y is None else _upcol(y)
        Vx = solve_lower(self.L, gram(self.kernel, self.x_data, x))
        Vy = Vx if y is x else solve_lower(self.L, gram(self.kernel, self.x_data, y))
        return gram(self.kernel, x, y) - Vx.T @ Vy

    def cov_diag(self, x):
        x = _upcol(x)
        Vx = solve_lower(self.L, gram(self.kernel, self.x_data, x))
        return kdiag(self.kernel, x) - jnp.sum(Vx * Vx, axis=0)


_register(PosteriorGP)


@dataclass(frozen=True)
class SparsePosteriorGP(AbstractGP):
    """Titsias variational posterior of an arbitrary base GP.

    mean(x*) = m(x*) + K(x*, Z) beta
    cov(x*, y*) = K(x*, y*) - T1_x^T T1_y + T2_x^T T2_y
      with T1_x = Lm^{-1} K(Z, x*),  T2_x = LB^{-1} T1_x,
      Lm = chol(Kmm),  LB = chol(I + A A^T),  A = Lm^{-1} Kmn D^{-1/2},
    where m/K are the base GP's mean/covariance (a zero-mean prior in the
    common case, or a posterior when conditioning a conditioned GPAR again
    — the reference's sparse posterior-logpdf path, ``gpar/model.py:287``
    on posterior layers).
    """

    base: AbstractGP
    x_ind: jnp.ndarray  # (m, d)
    Lm: jnp.ndarray  # (m, m)
    LB: jnp.ndarray  # (m, m)
    beta: jnp.ndarray  # (m,)

    def mean_vec(self, x):
        return self.base.mean_vec(x) + self.base.cov(x, self.x_ind) @ self.beta

    def cov(self, x, y=None):
        x = _upcol(x)
        y = x if y is None else _upcol(y)
        T1x = solve_lower(self.Lm, self.base.cov(self.x_ind, x))
        T1y = T1x if y is x else solve_lower(self.Lm, self.base.cov(self.x_ind, y))
        T2x = solve_lower(self.LB, T1x)
        T2y = T2x if y is x else solve_lower(self.LB, T1y)
        return self.base.cov(x, y) - T1x.T @ T1y + T2x.T @ T2y

    def cov_diag(self, x):
        x = _upcol(x)
        T1x = solve_lower(self.Lm, self.base.cov(self.x_ind, x))
        T2x = solve_lower(self.LB, T1x)
        return (
            self.base.cov_diag(x)
            - jnp.sum(T1x * T1x, axis=0)
            + jnp.sum(T2x * T2x, axis=0)
        )


_register(SparsePosteriorGP)


@dataclass(frozen=True)
class FDD:
    """Finite-dimensional distribution ``f(x, noise)``.

    ``noise`` is None (latent) or an (n,) per-point variance vector
    (``noise / w``, ``gpar/model.py:270``).
    """

    f: AbstractGP
    x: jnp.ndarray  # (n, d)
    noise: Optional[jnp.ndarray]  # (n,) or None

    def mean_vec(self):
        return self.f.mean_vec(self.x)

    def cov(self):
        K = self.f.cov(self.x)
        if self.noise is not None:
            K = K + jnp.diag(self.noise)
        return K

    def chol(self):
        return safe_cholesky(self.cov())

    def logpdf(self, y):
        """Exact MVN log density (``fdd.logpdf(y)``,
        ``tests/test_model.py:137-147``)."""
        return mvn_logpdf_chol(_vec(y), self.mean_vec(), self.chol())

    def sample(self, key, num_samples=None):
        """Joint MVN draw(s); returns (n, 1) for a single sample (stheno
        convention: ``gpar/model.py:264,270``) or (num_samples, n, 1).

        Uses :func:`psd_sample_factor`: near-interpolating posteriors can
        be numerically indefinite beyond jitter repair; sampling clamps
        the spectrum instead of returning NaNs.
        """
        from ..ops.linalg import psd_sample_factor

        n = self.x.shape[0]
        L = psd_sample_factor(self.cov())
        m = self.mean_vec()
        if num_samples is None:
            z = jax.random.normal(key, (n,), dtype=self.x.dtype)
            return (m + L @ z)[:, None]
        z = jax.random.normal(key, (num_samples, n), dtype=self.x.dtype)
        return (m + z @ L.T)[..., None]


_register(FDD)


@dataclass(frozen=True)
class DenseObs:
    """Exact observations with precomputed factors.  Build via ``Obs``.

    ``logpdf_val``/``alpha`` are populated by the row-sharded multi-chip
    path (``parallel/dense.py``): the distributed factorisation emits the
    marginal likelihood and ``(K + D)^{-1} r`` in the same pass, so the
    logpdf needs no further triangular solve (which would force an
    all-gather of the sharded ``L``)."""

    fdd: FDD
    y: jnp.ndarray  # (n,)
    L: jnp.ndarray  # chol of cov + D
    residual: jnp.ndarray  # y - mean
    logpdf_val: Optional[jnp.ndarray] = None  # scalar (sharded path)
    alpha: Optional[jnp.ndarray] = None  # (n,) (K + D)^{-1} residual

    @property
    def logpdf(self):
        """Marginal likelihood of ``y`` under the FDD — for a prior ``f``
        this is the training objective term (``gpar/model.py:226``).
        Delegates to the single density implementation in ops/linalg."""
        if self.y.shape[0] == 0:
            return jnp.zeros((), dtype=self.fdd.x.dtype)
        if self.logpdf_val is not None:
            return self.logpdf_val
        return mvn_logpdf_chol(
            self.residual, jnp.zeros_like(self.residual), self.L
        )


_register(DenseObs)


@dataclass(frozen=True)
class TitsiasObs:
    """Titsias inducing-point observations with precomputed m x m factors
    shared by the ELBO and the sparse posterior.  Build via ``PseudoObs``.
    O(n m^2); the n x n Gram is never formed.
    """

    fdd_ind: FDD
    fdd: FDD
    y: jnp.ndarray  # (n,)
    Lm: jnp.ndarray  # (m, m)
    LB: jnp.ndarray  # (m, m)
    beta: jnp.ndarray  # (m,)
    elbo: jnp.ndarray  # scalar

    @property
    def logpdf(self):
        """The collapsed ELBO (lower-bounds the exact marginal likelihood;
        equals it when inducing inputs coincide with the data)."""
        return self.elbo


_register(TitsiasObs)


def Obs(fdd, y):
    """Exact observations ``Obs(f(x, noise), y)`` (``gpar/model.py:289``).

    Multi-chip path (zero-mean priors): with an active execution mesh
    (``gpar_tpu.use_mesh``) and enough rows, the n x n Gram, the blocked
    Cholesky and the triangular solves all run row-sharded over the mesh
    (``parallel/dense.py``) — O(n^2/P) memory and O(n^3/P) compute per
    device, gradients included.  Identical quantities, oracle-tested
    against the single-device branch."""
    y = _vec(y)
    f = fdd.f
    from ..config import config as _cfg

    mesh = _cfg.mesh
    if (
        isinstance(f, GP)
        and mesh is not None
        and fdd.x.shape[0] >= max(_cfg.shard_min_rows, mesh.devices.size)
    ):
        from ..parallel.dense import sharded_dense_factors

        noise = fdd.noise
        if noise is None:
            noise = jnp.zeros(fdd.x.shape[0], dtype=fdd.x.dtype)
        logpdf_val, L, alpha = sharded_dense_factors(
            f.kernel, fdd.x, y, noise, mesh, axis=_cfg.shard_axis
        )
        return DenseObs(
            fdd=fdd, y=y, L=L, residual=y, logpdf_val=logpdf_val, alpha=alpha
        )

    L = fdd.chol()
    return DenseObs(fdd=fdd, y=y, L=L, residual=y - fdd.mean_vec())


def PseudoObs(fdd_ind, fdd, y):
    """Titsias observations ``PseudoObs(f(x_ind), f(x, noise), y)``
    (``gpar/model.py:287``).

    Works on any base GP — a zero-mean prior, or a (sparse) posterior when
    a conditioned GPAR is conditioned/evaluated again (the reference
    builds sparse observations on posterior layers in its posterior-logpdf
    path).  The collapsed ELBO and the posterior factors (``Lm``, ``LB``,
    ``beta``) come out of ONE factorisation pass.
    """
    f = fdd.f
    y = _vec(y)
    x, z = fdd.x, fdd_ind.x
    noise = fdd.noise
    if noise is None:
        raise ValueError("PseudoObs requires observation noise.")

    # Multi-chip path (zero-mean priors): with an active execution mesh
    # (gpar_tpu.use_mesh) and enough rows, the n-dependent statistics are
    # row-sharded over the mesh with a single m^2 psum
    # (parallel/sharded.py).  Identical quantities, oracle-tested against
    # the single-device branch below.
    from ..config import config as _cfg

    mesh = _cfg.mesh
    if (
        isinstance(f, GP)
        and mesh is not None
        and x.shape[0] >= max(_cfg.shard_min_rows, mesh.devices.size)
    ):
        from ..parallel.sharded import pad_rows, sharded_titsias_factors

        xp, mask = pad_rows(x, mesh.devices.size)
        yp, _ = pad_rows(y, mesh.devices.size)
        noisep, _ = pad_rows(noise, mesh.devices.size, value=1.0)
        elbo, Lm, LB, beta = sharded_titsias_factors(
            f.kernel, z, xp, yp, noisep, mask, mesh, axis=_cfg.shard_axis
        )
        return TitsiasObs(
            fdd_ind=fdd_ind, fdd=fdd, y=y, Lm=Lm, LB=LB, beta=beta, elbo=elbo
        )

    # One factorisation pass shared by the ELBO and the posterior factors
    # (the single source of the Titsias math — ops/linalg.py).
    elbo, Lm, LB, beta = titsias_factors(
        f.cov(z), f.cov(z, x), f.cov_diag(x), y, f.mean_vec(x), noise
    )
    return TitsiasObs(
        fdd_ind=fdd_ind, fdd=fdd, y=y, Lm=Lm, LB=LB, beta=beta, elbo=elbo
    )


#: Alias matching stheno's ``SparseObs`` (``tests/test_model.py:9,144``).
SparseObs = PseudoObs


def condition(f, obs):
    """Posterior GP ``f | obs`` (``gpar/model.py:170,298``).

    ``f`` must be the process the observations were built from (or a
    structurally identical copy — a zero-mean prior with the same kernel
    tree counts, matching stheno's same-measure conditioning): the
    Titsias factors / dense residuals inside ``obs`` were computed from
    ``obs.fdd.f``'s kernel, and attaching them to a structurally
    different process would produce finite but silently wrong
    posteriors."""
    f_obs = obs.fdd.f
    if f is not f_obs:
        mismatch = type(f) is not type(f_obs)
        if not mismatch:
            try:
                mismatch = jax.tree_util.tree_structure(
                    f
                ) != jax.tree_util.tree_structure(f_obs)
            except Exception:  # pragma: no cover - exotic pytrees
                mismatch = False
        if mismatch:
            raise ValueError(
                "condition(f, obs): `obs` was built from a structurally "
                "different process than `f`; condition the process the "
                "observations came from."
            )
    if isinstance(obs, TitsiasObs):
        return SparsePosteriorGP(
            base=f,
            x_ind=obs.fdd_ind.x,
            Lm=obs.Lm,
            LB=obs.LB,
            beta=obs.beta,
        )
    if not isinstance(obs, DenseObs):
        raise TypeError(f"Cannot condition on {type(obs)!r}")

    x_new, y_new = obs.fdd.x, obs.y
    noise_new = obs.fdd.noise
    if noise_new is None:
        noise_new = jnp.zeros(x_new.shape[0], dtype=x_new.dtype)

    if isinstance(f, GP):
        # Reuse the factorisation already inside the observations (it IS
        # chol(K(x) + D) of the same kernel/inputs/noise): halves the
        # Cholesky work in eager mode and keeps the sharded-path factor
        # (computed distributed, ``parallel/dense.py``) instead of
        # refactorising replicated.
        alpha = obs.alpha
        if alpha is None:
            alpha = solve_chol(obs.L, obs.residual)
        return PosteriorGP(
            kernel=f.kernel,
            x_data=x_new,
            y_data=y_new,
            noise_diag=noise_new,
            L=obs.L,
            alpha=alpha,
        )
    if isinstance(f, PosteriorGP):
        # Condition on the union of old and new data.
        x_all = jnp.concatenate([f.x_data, x_new], axis=0)
        y_all = jnp.concatenate([f.y_data, y_new], axis=0)
        d_all = jnp.concatenate([f.noise_diag, noise_new], axis=0)
        return _condition_dense(f.kernel, x_all, y_all, d_all)
    raise NotImplementedError(f"Cannot condition {type(f)!r} on exact obs.")


def _condition_dense(kernel, x, y, noise_diag):
    K = gram(kernel, x, x) + jnp.diag(noise_diag)
    L = safe_cholesky(K)
    alpha = solve_chol(L, y)
    return PosteriorGP(
        kernel=kernel, x_data=x, y_data=y, noise_diag=noise_diag, L=L, alpha=alpha
    )
