"""GPAR model core — the autoregressive layer chain.

Behavioural rebuild of the reference ``gpar/model.py`` on the JAX GP core:
closed-downwards data routing (``per_output``), conditioning (``|``), logpdf
accumulation with resumable inputs, ancestral sampling, and the
impute/replace input-updating rules.

Derived from wesselb/gpar (MIT License, Copyright (c) Wessel Bruinsma) —
see ``LICENSE``.  This module pins the reference's *behavioural contract*
(loop semantics, update rules, public signatures); the implementation is
restructured for JAX (host-side static mask planning, functional PRNG,
jitted vmapped sampling).

TPU-native design notes:

- **Static masks.** The reference filters rows with NaN boolean masks at
  every layer (``gpar/model.py:165,220,281-284``).  Masks derive from the
  *data's* NaN pattern, which is concrete host-side even when
  hyperparameters are traced — so all mask bookkeeping happens in NumPy and
  row filtering lowers to static ``jnp.take`` gathers.  The whole layer
  chain therefore jits with static shapes, which is what lets the per-layer
  NLL objective run as a single fused XLA computation during fitting.
- **Vectorised sampling.** ``sample_batch`` replaces the reference's
  per-sample Python loop (``gpar/regression.py:558-563``) with one jitted
  ``vmap`` over keys; the module-level jit means repeated ``predict`` calls
  reuse the compiled executable.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gp.core import GP, Obs, PseudoObs, condition
from ..utils.rng import next_key

__all__ = ["GPAR", "merge", "construct_model", "last", "per_output"]


def _tracing_active():
    """True when called during a jit/vmap/grad trace — even one where all
    the GPAR *data* operands are closed-over constants and only the
    hyperparameters are traced (so checking a single operand's type is
    not enough)."""
    try:
        from jax._src.core import trace_state_clean

        return not trace_state_clean()
    except Exception:  # pragma: no cover - private-API fallback
        return False  # fail open: behave like the pre-guard code


def _concrete_np(a, what):
    """Host NumPy view of ``a``, raising a clear error if ``a`` is traced.

    GPAR's closed-downwards row routing is host-side mask planning (static
    shapes, SURVEY.md §7 "hard parts"); it can only depend on *concrete*
    data.  Under jit, observations must be closed-over constants (the
    regressor does this) or replayed from the precomputed ``per_output``
    cache — a traced ``y``/mask would otherwise surface as an opaque
    ``TracerArrayConversionError`` deep inside NumPy.
    """
    try:
        return np.asarray(a)
    except Exception as e:
        raise ValueError(
            f"{what} must be concrete (host-side) data but is a "
            "jit/vmap/grad tracer. GPAR's row routing is static host-side "
            "mask planning: trace hyperparameters, not observations — or "
            "pass the precomputed per_output cache (dict overload)."
        ) from e


def _np_mask(mask):
    return _concrete_np(mask, "The row mask").astype(bool)


def _nan_mask_col0(y):
    """Host-side NaN mask of a column tensor's first column.

    Must convert to NumPy *before* slicing: under a jit trace even slicing a
    concrete array stages the op and yields a tracer.  The data's NaN
    pattern is always concrete at trace time in GPAR (hyperparameters are
    traced; the observations are not), so this is safe wherever called.
    """
    return np.isnan(_concrete_np(y, "The observations `y`")[:, 0])


def take_rows(x, mask):
    """Row-filter by a *concrete* boolean mask (static gather, jit-safe even
    when ``x`` is traced).  Replaces ``x[mask]`` (``gpar/model.py:165``).

    NumPy inputs stay NumPy: the regressor's cached ``per_output`` plan is
    built host-side once per dataset, and eager device ops per layer would
    cost a dispatch round-trip each (measured ~0.7 s of pure overhead per
    fit call through a remote relay)."""
    idx = np.nonzero(_np_mask(mask))[0]
    if isinstance(x, np.ndarray):
        return np.take(x, idx, axis=0)
    return jnp.take(jnp.asarray(x), idx, axis=0)


def merge(x, updates, to_update):
    """Merge ``updates`` into ``x`` where ``to_update`` is True, preserving
    order (``gpar/model.py:14-44``).

    Implemented — exactly like the reference — as concatenate + static index
    take (no in-place scatter), which is autograd/jit-safe: ``to_update``
    must be concrete, while ``x``/``updates`` may be traced.
    """
    to_update = _np_mask(to_update)
    n_keep = int((~to_update).sum())
    concat = jnp.concatenate(
        [take_rows(x, ~to_update), jnp.asarray(updates)], axis=0
    )
    indices = np.empty(len(to_update), dtype=np.int64)
    indices[~to_update] = np.arange(n_keep)
    indices[to_update] = n_keep + np.arange(int(to_update.sum()))
    return jnp.take(concat, indices, axis=0)


def construct_model(f, noise):
    """Wrap ``(f, noise)`` in a zero-arg constructor
    (``gpar/model.py:47-57``)."""
    return lambda: (f, noise)


def last(xs, select=None):
    """Pair each element of ``xs`` with an is-last flag, optionally
    restricted to the positions listed in ``select``.

    Contract (matches ``gpar/model.py:60-93``): elements are yielded in
    order; only positions in ``select`` are yielded when it is given; the
    flag is True only for the final element of ``xs``, and then only if
    that element is among the yielded ones.
    """
    items = list(xs)
    n = len(items)
    positions = (
        range(n) if select is None else sorted(set(select) & set(range(n)))
    )
    for i in positions:
        yield i == n - 1, items[i]


def per_output(y, w, keep=False):
    """Yield observations per output, respecting closed-downwards filtering
    (``gpar/model.py:325-368``).

    Yields, per output ``i``, ``(y[mask, i:i+1], w[mask, i], mask)`` where
    ``mask`` marks rows (relative to the previous layer) with output ``i``
    observed — or, with ``keep=True``, rows where any *later* output is
    observed (those rows carry NaNs to impute).

    Also supports the cache overload: passing a dict ``{keep: [items]}`` as
    ``y`` (with ``w=None``) replays precomputed items, the fast path built
    by the regressor (``gpar/regression.py:412-414``).
    """
    if isinstance(y, dict):
        for yi in y[keep]:
            yield yi
        return

    if not isinstance(y, np.ndarray):
        y = jnp.asarray(y)
        w = jnp.asarray(w)
    else:
        w = np.asarray(w)
    p = y.shape[1]
    available = ~np.isnan(_concrete_np(y, "The observations `y`"))

    for i in range(p):
        mask = available[:, i].copy()
        if keep and i < p - 1:
            mask = mask | available[:, i + 1 :].any(axis=1)

        yield take_rows(y, mask)[:, i : i + 1], take_rows(w, mask)[:, i], mask

        y = take_rows(y, mask)
        w = take_rows(w, mask)
        available = available[mask]


class GPAR:
    """Basic GPAR model (``gpar/model.py:96-322``).

    Args:
        replace: Condition on predictive means instead of the data.
        impute: Impute missing points with predictive means to make the data
            closed downwards.
        x_ind: Inducing-point inputs for the sparse (Titsias) approximation.
    """

    def __init__(self, replace=False, impute=False, x_ind=None):
        self.replace = replace
        self.impute = impute
        self.layers = []
        self.sparse = x_ind is not None
        self.x_ind = None if x_ind is None else x_ind

    def copy(self):
        return GPAR(replace=self.replace, impute=self.impute, x_ind=self.x_ind)

    def add_layer(self, model_constructor):
        gpar = self.copy()
        gpar.layers = list(self.layers) + [model_constructor]
        return gpar

    def __or__(self, x_y_w):
        """Condition on data ``(x, y, w)`` (``gpar/model.py:148-176``)."""
        x, y, w = x_y_w
        x = jnp.asarray(x)
        gpar, x_ind = self.copy(), self.x_ind

        for is_last, ((yi, wi, mask), model) in last(
            zip(per_output(y, w, keep=self.impute), self.layers)
        ):
            x = take_rows(x, mask)
            f, noise = model()
            obs = self._obs(x, x_ind, yi, wi, f, noise)

            gpar.layers.append(construct_model(condition(f, obs), noise))

            if not is_last:
                x, x_ind = self._update_inputs(x, x_ind, yi, f, obs)

        return gpar

    def logpdf(
        self,
        x,
        y,
        w,
        only_last_layer=False,
        sample_missing=False,
        return_inputs=False,
        x_ind=None,
        outputs=None,
        key=None,
    ):
        """Compute the logpdf (``gpar/model.py:178-243``).

        Mirrors the reference exactly, including the resumable-inputs fast
        path (``return_inputs``/``x_ind``/``outputs``) that backs
        ``fit(fix=True)``.  ``key`` seeds ``sample_missing`` draws (the
        reference uses the global torch RNG there).
        """
        x = jnp.asarray(x)
        logpdf = jnp.zeros((), dtype=x.dtype)
        x_ind = self.x_ind if x_ind is None else x_ind

        y_per_output = per_output(y, w, keep=self.impute or sample_missing)
        for is_last, ((yi, wi, mask), model) in last(
            zip(y_per_output, self.layers), select=outputs
        ):
            x = take_rows(x, mask)
            f, noise = model()
            obs = self._obs(x, x_ind, yi, wi, f, noise)

            if not only_last_layer or is_last:
                logpdf = logpdf + obs.logpdf

            if not is_last:
                # The availability mask is concrete (from the data's NaN
                # pattern) even when the filled `yi` below becomes traced.
                missing = _nan_mask_col0(yi)
                available = ~missing
                if sample_missing and missing.any():
                    f_post = condition(f, obs)
                    if key is None:
                        if _tracing_active():
                            # next_key() here would be captured as a
                            # trace-time constant: every call of the
                            # user's compiled function would reuse the
                            # identical "random" draw.
                            raise ValueError(
                                "GPAR.logpdf(sample_missing=True) under "
                                "jit requires an explicit key= argument."
                            )
                        k = next_key()
                    else:
                        key, k = jax.random.split(key)
                    yi = merge(
                        yi,
                        f_post(
                            take_rows(x, missing), noise / take_rows(wi, missing)
                        ).sample(k),
                        missing,
                    )
                    available = np.ones_like(missing)

                x, x_ind = self._update_inputs(
                    x, x_ind, yi, f, obs, available=available
                )

        return (x, x_ind) if return_inputs else logpdf

    def sample(self, x, w, latent=False, key=None):
        """Ancestral sample at inputs ``x`` (``gpar/model.py:245-277``).

        In the latent case the *noisy* sample feeds forward to the next
        layer while the noiseless sample is returned — GPAR's generative
        story (``gpar/model.py:266,275``).
        """
        if key is None:
            key = next_key()
        models = [m() for m in self.layers]
        fs = tuple(f for f, _ in models)
        noises = tuple(n for _, n in models)
        return _sample_chain(
            fs,
            noises,
            jnp.asarray(x),
            jnp.asarray(w),
            self.x_ind,
            key,
            latent=latent,
            replace=self.replace,
            sparse=self.sparse,
        )

    def sample_batch(self, x, w, num_samples, latent=False, key=None):
        """Draw ``num_samples`` ancestral samples with one jitted ``vmap``
        (replaces the reference's per-sample Python loop,
        ``gpar/regression.py:558-563``).  Returns (num_samples, n, p)."""
        if key is None:
            key = next_key()
        models = [m() for m in self.layers]
        fs = tuple(f for f, _ in models)
        noises = tuple(jnp.asarray(n) for _, n in models)
        keys = jax.random.split(key, num_samples)
        x = jnp.asarray(x)
        w = jnp.asarray(w)
        x_ind = (
            jnp.zeros((0, x.shape[1]), dtype=x.dtype)
            if self.x_ind is None
            else jnp.asarray(self.x_ind)
        )
        return _sample_batch_jit(
            fs,
            noises,
            x,
            w,
            x_ind,
            keys,
            latent=latent,
            replace=self.replace,
            sparse=self.sparse,
        )

    def _obs(self, x, x_ind, y, w, f, noise):
        """Build (Pseudo)Obs, dropping NaN rows (``gpar/model.py:279-289``)."""
        available = ~_nan_mask_col0(y)
        x = take_rows(x, available)
        y = take_rows(y, available)
        w = take_rows(w, available)

        if self.sparse:
            return PseudoObs(f(x_ind), f(x, noise / w), y)
        else:
            return Obs(f(x, noise / w), y)

    def _update_inputs(self, x, x_ind, y, f, obs, available=None):
        """Impute/replace outputs and append them as input columns
        (``gpar/model.py:291-322``).

        ``available`` (concrete bool mask) may be supplied when ``y`` is
        traced (the sample_missing path fills NaNs with traced draws)."""
        if available is None:
            available = ~_nan_mask_col0(y)

        def estimate(x_):
            # Posterior mean if observations are available, else prior mean.
            if obs is not None:
                return condition(f, obs).mean(x_)
            else:
                return f.mean(x_)

        if self.sparse:
            x_ind = jnp.concatenate([jnp.asarray(x_ind), estimate(x_ind)], axis=1)

        if self.impute and self.replace:
            y = estimate(x)
        else:
            if self.impute and bool((~available).any()):
                y = merge(y, estimate(take_rows(x, ~available)), ~available)

            if self.replace and bool(available.any()):
                y = merge(y, estimate(take_rows(x, available)), available)

        x = jnp.concatenate([x, y], axis=1)
        return x, x_ind


def _sample_chain(fs, noises, x, w, x_ind, key, *, latent, replace, sparse):
    """One ancestral pass through the layer chain; jit/vmap-safe.

    Samples never contain NaNs, so the reference's availability checks in
    ``_update_inputs`` (``gpar/model.py:291-317``) resolve statically: with
    ``replace`` the next layer's input column is the layer mean, otherwise
    the noisy sample feeds forward.
    """
    p = len(fs)
    cols = []
    for i, f in enumerate(fs):
        noise = noises[i]
        key, k1, k2 = jax.random.split(key, 3)
        if latent:
            f_sample = f(x).sample(k1)
            stds = jnp.sqrt(noise / w[:, i : i + 1])
            y_sample = f_sample + stds * jax.random.normal(
                k2, f_sample.shape, dtype=f_sample.dtype
            )
            cols.append(f_sample)
        else:
            y_sample = f(x, noise / w[:, i]).sample(k1)
            cols.append(y_sample)

        if i < p - 1:
            if sparse and x_ind is not None and x_ind.shape[0] > 0:
                x_ind = jnp.concatenate([x_ind, f.mean(x_ind)], axis=1)
            y_next = f.mean(x) if replace else y_sample
            x = jnp.concatenate([x, y_next], axis=1)

    return jnp.concatenate(cols, axis=1)


@partial(jax.jit, static_argnames=("latent", "replace", "sparse"))
def _sample_batch_jit(fs, noises, x, w, x_ind, keys, *, latent, replace, sparse):
    def one(key):
        return _sample_chain(
            fs,
            noises,
            x,
            w,
            x_ind,
            key,
            latent=latent,
            replace=replace,
            sparse=sparse,
        )

    return jax.vmap(one)(keys)
