"""Named variable store with constrained transforms — the ``varz.Vars``
replacement (reference call sites: ``gpar/regression.py:101-173,314,328-337``
and SURVEY.md §2.3.4).

Variables live as *unconstrained latents*; constrained values are produced
through per-variable transforms:

- ``get(name, init)``: unconstrained (identity).
- ``bnd(name, init, lower=0, upper=None)``: positive / lower-bounded via a
  shifted-exp transform, or doubly-bounded via a scaled logistic — exactly
  the trick that lets plain L-BFGS implement the reference's "L-BFGS-B" box
  constraints (the reference only ever expresses bounds through these
  transforms, ``gpar/regression.py:101-173``).

Variables are created on first access and cached by name thereafter, which
is what makes the lazy ``model()`` closures idempotent
(``gpar/regression.py:92-180``).  A :class:`VarsView` substitutes traced
latents for a subset of names during optimisation, leaving the rest as
constants — the JAX-native analogue of varz's name-filtered optimisation
(``minimise_l_bfgs_b(..., names=[f"{pi}/*"])``, ``gpar/regression.py:459``).
"""

import fnmatch

import jax.numpy as jnp
import numpy as np

from ..config import default_dtype

__all__ = ["Vars", "VarsView"]


def _backend(x):
    """NumPy for host values, jnp for jax/traced values.

    Variable creation and eager reads (``vs.bnd`` inside the lazy
    ``model()`` closures, ``vs[name]``) operate on host latents — routing
    them through jnp would cost one device round-trip per op, and on a
    remote-attached chip creating a 16-layer model's ~100 variables
    measured ~3 s of pure relay dispatch (PERF.md finding 27).  The
    fused bodies constrain TRACED latents through these same transform
    objects, which must stay jnp."""
    return np if isinstance(x, (np.ndarray, np.generic, float, int)) else jnp


class _Identity:
    def constrain(self, latent):
        return latent

    def unconstrain(self, value):
        return value


class _LowerBounded:
    """value = lower + exp(latent); supports the positive default and the
    ``lower=1e-8`` noise bound (``gpar/regression.py:169-173``)."""

    def __init__(self, lower):
        self.lower = lower

    def constrain(self, latent):
        return self.lower + _backend(latent).exp(latent)

    def unconstrain(self, value):
        b = _backend(value)
        if b is np:
            # value == lower gives a -inf latent (exp(-inf) = 0 restores
            # the bound exactly) — jnp produced it silently; keep numpy
            # quiet for parity (e.g. the reference's noise=1e-8 floor).
            with np.errstate(divide="ignore"):
                return np.log(np.asarray(value) - self.lower)
        return b.log(b.asarray(value) - self.lower)


class _Bounded:
    """value = lower + (upper - lower) * sigmoid(latent); used for the RQ
    ``alpha`` in [1e-3, 1e3] (``gpar/regression.py:107``)."""

    def __init__(self, lower, upper):
        self.lower = lower
        self.upper = upper

    def constrain(self, latent):
        width = self.upper - self.lower
        return self.lower + width / (1.0 + _backend(latent).exp(-latent))

    def unconstrain(self, value):
        b = _backend(value)
        value = b.asarray(value)
        frac = (value - self.lower) / (self.upper - self.lower)
        if b is np:
            # value at a bound gives a +/-inf latent — jnp produced it
            # silently; keep numpy quiet for parity (cf. _LowerBounded).
            with np.errstate(divide="ignore"):
                return np.log(frac) - np.log1p(-frac)
        return b.log(frac) - b.log1p(-frac)


class Vars:
    """Flat name -> (latent, transform) store (``varz.Vars(dtype)``,
    ``gpar/regression.py:314``)."""

    def __init__(self, dtype=None):
        self.dtype = jnp.dtype(dtype) if dtype is not None else default_dtype()
        # name -> NumPy array (unconstrained), insertion order.  Latents
        # live on the HOST: they are only ever inputs to jitted programs
        # (which transfer once per call); device-resident latents cost one
        # eager dispatch per ravel/slice in latent_vector /
        # set_latent_vector — ~300 relay round-trips per fit on a
        # 16-layer model.
        self._latents = {}
        self._transforms = {}  # name -> transform

    # -- variable creation / access --------------------------------------
    def _var(self, name, init, transform):
        if name is None:
            raise ValueError("Variables must be named.")
        if name not in self._latents:
            # Entirely host-side: eager jnp here costs 2-3 relay
            # round-trips PER VARIABLE on a remote-attached chip
            # (PERF.md finding 27).
            init = np.asarray(init, dtype=self.dtype)
            self._latents[name] = np.asarray(
                transform.unconstrain(init), dtype=self.dtype
            )
            self._transforms[name] = transform
        return self._transforms[name].constrain(self._latents[name])

    def get(self, init=None, name=None):
        """Unconstrained variable (``gpar/regression.py:137``)."""
        return self._var(name, init, _Identity())

    def bnd(self, init=None, name=None, lower=0.0, upper=None):
        """Bounded variable; positive by default (``vs.bnd``,
        ``gpar/regression.py:101-173``)."""
        if upper is None:
            transform = _LowerBounded(lower)
        else:
            transform = _Bounded(lower, upper)
        return self._var(name, init, transform)

    # -- introspection ----------------------------------------------------
    @property
    def names(self):
        return list(self._latents.keys())

    def __contains__(self, name):
        return name in self._latents

    def __getitem__(self, name):
        """Constrained value (``self.vs[name]``, ``gpar/regression.py:336``)."""
        return self._transforms[name].constrain(self._latents[name])

    def copy(self, detach=True):
        """Independent copy of the store (``vs.copy(detach=True)``,
        ``tests/test_regression.py:236``).  JAX arrays are immutable, so a
        shallow copy of the dicts suffices; ``detach`` is accepted for API
        parity."""
        new = Vars(dtype=self.dtype)
        new._latents = dict(self._latents)
        new._transforms = dict(self._transforms)
        return new

    def snapshot(self):
        """Copy of the current latents (name -> NumPy array).

        Together with :meth:`restore` this gives cheap in-process
        save/rollback of the hyperparameter state — e.g. re-running a fit
        from identical initial conditions (bench.py's warm passes) or
        backtracking a diverged optimisation.  Full cross-process
        checkpointing (data, normaliser, config) lives in
        ``utils/checkpoint.py``."""
        return {k: np.array(v, copy=True) for k, v in self._latents.items()}

    def restore(self, snap):
        """Restore latents from a :meth:`snapshot` (transforms are keyed by
        name and kept; unknown names are an error)."""
        missing = [k for k in snap if k not in self._transforms]
        if missing:
            raise KeyError(f"restore(): unknown variable names {missing}")
        for k, v in snap.items():
            self._latents[k] = np.array(v, copy=True)

    # -- selection & flat latent vectors ----------------------------------
    def select(self, patterns=None):
        """Names matched by glob patterns, in creation order
        (``names=[f"{pi}/*"]``, ``gpar/regression.py:452-456``)."""
        if patterns is None:
            return self.names
        if isinstance(patterns, str):
            patterns = [patterns]
        return [
            name
            for name in self._latents
            if any(fnmatch.fnmatchcase(name, pat) for pat in patterns)
        ]

    def latent_vector(self, names):
        """Concatenate the selected latents into one flat vector (host-side;
        jitted callees transfer it once per call)."""
        if not names:
            return np.zeros((0,), dtype=self.dtype)
        return np.concatenate(
            [np.ravel(np.asarray(self._latents[name])) for name in names]
        )

    def _splits(self, names):
        sizes = [int(np.prod(self._latents[n].shape)) for n in names]
        offsets = np.cumsum([0] + sizes)
        return sizes, offsets

    def split_latent_vector(self, names, vector):
        """Inverse of :meth:`latent_vector`: flat vector -> name -> latent."""
        _, offsets = self._splits(names)
        out = {}
        for i, name in enumerate(names):
            shape = self._latents[name].shape
            out[name] = jnp.reshape(vector[offsets[i] : offsets[i + 1]], shape)
        return out

    def set_latent_vector(self, names, vector):
        # One device->host fetch for the whole vector, then NumPy slices.
        vector = np.asarray(vector)
        _, offsets = self._splits(names)
        for i, name in enumerate(names):
            shape = np.shape(self._latents[name])
            self._latents[name] = np.reshape(
                vector[offsets[i] : offsets[i + 1]], shape
            )

    # -- traced views ------------------------------------------------------
    def with_latents(self, overrides):
        """A view where ``overrides`` (name -> latent, possibly traced)
        shadows the stored latents."""
        return VarsView(self, overrides)

    def with_latent_vector(self, names, vector):
        return VarsView(self, self.split_latent_vector(names, vector))


class VarsView:
    """Read-through view of a :class:`Vars` with substituted latents.

    Passed to objectives during optimisation so that ``vs.bnd``/``vs.get``
    lookups inside the lazy model constructors resolve to traced values for
    the optimised subset and to constants for everything else — mirroring
    how varz objectives receive the store (``objective(vs)``,
    ``gpar/regression.py:434``).
    """

    def __init__(self, base, overrides):
        self._base = base
        self._overrides = overrides

    @property
    def dtype(self):
        return self._base.dtype

    def _resolve(self, name):
        if name in self._overrides:
            return self._base._transforms[name].constrain(self._overrides[name])
        return self._base._transforms[name].constrain(self._base._latents[name])

    def get(self, init=None, name=None):
        if name not in self._base:
            self._base.get(init=init, name=name)
        return self._resolve(name)

    def bnd(self, init=None, name=None, lower=0.0, upper=None):
        if name not in self._base:
            self._base.bnd(init=init, name=name, lower=lower, upper=upper)
        return self._resolve(name)

    @property
    def names(self):
        return self._base.names

    def __contains__(self, name):
        return name in self._base

    def __getitem__(self, name):
        return self._resolve(name)
