"""GPARRegressor — the user-facing estimator.

Behavioural rebuild of the reference ``gpar/regression.py`` with the exact
constructor signature and ``fit / condition / predict / sample / logpdf /
get_variables`` API (``gpar/regression.py:200-597``), on top of the JAX GP
core, the named variable store, and jitted L-BFGS.

Derived from wesselb/gpar (MIT License, Copyright (c) Wessel Bruinsma) —
see ``LICENSE``.  The variable-naming scheme, kernel composition order, and
constructor defaults are the pinned parity contract and match the reference
symbol-for-symbol; everything around them (fused scan fits, posterior-factor
caching, mesh sharding, device-resident serving) is new TPU-native design.

Differences from the reference are TPU-idiomatic, not semantic:

- Monte-Carlo prediction draws all samples with one jitted ``vmap``
  (vs. the Python loop at ``gpar/regression.py:558-563``).
- Sampling APIs accept an optional ``key=`` (JAX is functional); without it
  a global auto-seeded key is split per call.
- The per-layer L-BFGS fit runs as a single XLA while-loop per layer.
"""

import collections

import numpy as np

import jax
import jax.numpy as jnp

from ..config import default_dtype, mesh_descriptor, use_mesh
from ..params.optim import lbfgs_traced, lbfgs_traced_restarts, minimise_l_bfgs_b
from ..params.store import Vars
from ..ops.kernels import EQ, RQ, Const, Linear, ZeroKernel
from ..gp.core import GP, Obs, PseudoObs
from ..utils.rng import next_key
from .gpar import GPAR, per_output

__all__ = ["GPARRegressor", "log_transform", "squishing_transform"]

#: Log transform for the data (``gpar/regression.py:22``).
log_transform = (jnp.log, jnp.exp)

#: Squishing transform for the data (``gpar/regression.py:25-28``).
squishing_transform = (
    lambda x: jnp.sign(x) * jnp.log(1 + jnp.abs(x)),
    lambda x: jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1),
)


def _vector_from_init(init, length):
    """Scalar -> broadcast vector; vector -> validated prefix
    (``gpar/regression.py:31-46``)."""
    if np.size(init) == 1:
        return init * np.ones(length)

    flat = np.squeeze(init)
    if np.ndim(flat) != 1:
        raise ValueError(
            f"Hyperparameter initialiser has shape {np.shape(init)}; "
            "expected a scalar or a flat vector."
        )
    if np.size(flat) < length:
        raise ValueError(
            f"Hyperparameter initialiser supplies {np.size(flat)} values "
            f"but this layer needs {length}."
        )

    return np.array(flat)[:length]


def _determine_indices(m, pi, markov):
    """Input / previous-output column indices honouring the Markov order
    (``gpar/regression.py:49-59``).

    Layer ``pi``'s kernel sees the ``m`` raw input columns plus the
    previously-modelled outputs appended after them; a Markov order of
    ``k`` keeps only the ``k`` most recent of those outputs.
    """
    p_last = pi - 1
    p_start = 0 if markov is None else max(p_last - (markov - 1), 0)
    p_num = p_last - p_start + 1

    m_inds = list(range(m))
    p_inds = list(range(m + p_start, m + p_last + 1))

    return m_inds, p_inds, p_num


def _to_jnp(x):
    """NumPy -> float64 JAX array; JAX arrays and None pass through
    (the ``_to_torch`` analogue, ``gpar/regression.py:62-69``)."""
    if x is None or isinstance(x, jax.Array):
        return x
    return jnp.asarray(np.asarray(x), dtype=default_dtype())


def _uprank(x):
    """Vector -> (n, 1) matrix (``B.uprank``)."""
    if x is None:
        return None
    x = jnp.asarray(x)
    if x.ndim == 0:
        return x[None, None]
    if x.ndim == 1:
        return x[:, None]
    if x.ndim == 2:
        return x
    raise ValueError(f"Cannot uprank tensor of rank {x.ndim}.")


def _uprank_host(x):
    """``_uprank(_to_jnp(x))`` without forcing host data onto the device:
    NumPy (and list/scalar) inputs stay NumPy at the default dtype, jax
    arrays take the jnp path.  Host ingest pipelines (condition/logpdf)
    build everything host-side and upload ONCE — each eager device op on
    a remote-attached chip is a relay round-trip (PERF.md finding 27)."""
    if x is None:
        return None
    if isinstance(x, jax.Array):
        return _uprank(x)
    x = np.asarray(x, dtype=np.dtype(default_dtype()))
    if x.ndim == 0:
        return x[None, None]
    if x.ndim == 1:
        return x[:, None]
    if x.ndim == 2:
        return x
    raise ValueError(f"Cannot uprank tensor of rank {x.ndim}.")


def _model_generator(
    vs,
    m,  # input dimensionality
    pi,  # which output this layer models
    scale,
    scale_tie,
    per,
    per_period,
    per_scale,
    per_decay,
    input_linear,
    input_linear_scale,
    linear,
    linear_scale,
    nonlinear,
    nonlinear_scale,
    rq,
    markov,
    noise,
):
    """Per-layer prior constructor; kernel composition and the variable
    naming scheme mirror ``gpar/regression.py:72-182`` verbatim."""

    def model():
        # Two kernel sums, one over each column group (raw inputs vs.
        # previously-modelled outputs), composed at the end via select().
        kernel_inputs = ZeroKernel()
        kernel_outputs = ZeroKernel()

        m_inds, p_inds, p_num = _determine_indices(m, pi, markov)

        # Mandatory stationary term on the raw inputs.
        variance = vs.bnd(name=f"{pi}/input/var", init=1.0)
        scales = vs.bnd(
            name=f"{0 if scale_tie else pi}/input/scales",
            init=_vector_from_init(scale, m),
        )
        if rq:
            k = RQ(vs.bnd(name=f"{pi}/input/alpha", init=1e-2, lower=1e-3, upper=1e3))
        else:
            k = EQ()
        kernel_inputs += variance * k.stretch(scales)

        # Optional locally-periodic term: the periodic embedding doubles
        # every dimension into a (cos, sin) pair, hence 2*m scales.
        if per:
            variance = vs.bnd(name=f"{pi}/input/per/var", init=1.0)
            scales = vs.bnd(
                name=f"{pi}/input/per/scales",
                init=_vector_from_init(per_scale, 2 * m),
            )
            periods = vs.bnd(
                name=f"{pi}/input/per/pers",
                init=_vector_from_init(per_period, m),
            )
            decays = vs.bnd(
                name=f"{pi}/input/per/decay",
                init=_vector_from_init(per_decay, m),
            )
            kernel_inputs += (
                variance * EQ().stretch(scales).periodic(periods) * EQ().stretch(decays)
            )

        # Optional dot-product term on the raw inputs.
        if input_linear:
            scales = vs.bnd(
                name=f"{pi}/input/lin/scales",
                init=_vector_from_init(input_linear_scale, m),
            )
            const = vs.get(name=f"{pi}/input/lin/const", init=1.0)
            kernel_inputs += Linear().stretch(scales) + Const(const)

        # Dependencies on earlier outputs: a dot-product term ...
        if linear and pi > 0:
            scales = vs.bnd(
                name=f"{pi}/output/lin/scales",
                init=_vector_from_init(linear_scale, p_num),
            )
            kernel_outputs += Linear().stretch(scales)

        # ... and/or a stationary (EQ/RQ) term.
        if nonlinear and pi > 0:
            variance = vs.bnd(name=f"{pi}/output/nonlin/var", init=1.0)
            scales = vs.bnd(
                name=f"{pi}/output/nonlin/scales",
                init=_vector_from_init(nonlinear_scale, p_num),
            )
            if rq:
                k = RQ(
                    vs.bnd(
                        name=f"{pi}/output/nonlin/alpha",
                        init=1e-2,
                        lower=1e-3,
                        upper=1e3,
                    )
                )
            else:
                k = EQ()
            kernel_outputs += variance * k.stretch(scales)

        # Observation noise; the 1e-8 lower bound matches the reference
        # (``gpar/regression.py:172``).
        noise_variance = vs.bnd(
            name=f"{pi}/noise",
            init=_vector_from_init(noise, pi + 1)[pi],
            lower=1e-8,
        )

        f = GP(kernel_inputs.select(m_inds) + kernel_outputs.select(p_inds))
        return f, noise_variance

    return model


def _construct_gpar(reg, vs, m, p):
    """Build a fresh GPAR with ``p`` layers from the regressor config
    (``gpar/regression.py:185-190``)."""
    gpar = GPAR(replace=reg.replace, impute=reg.impute, x_ind=reg.x_ind)
    for pi in range(p):
        gpar = gpar.add_layer(_model_generator(vs, m, pi, **reg.model_config))
    return gpar


def _fingerprint(*arrays):
    """Cheap content hash of arrays, used to key compiled-program caches.

    Conditioning data is baked into fused programs as constants (its NaN
    pattern drives static mask planning), so compiled executables may only
    be reused when the data is bit-identical.
    """
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for a in arrays:
        if a is None:
            h.update(b"none")
            continue
        a = np.asarray(a)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def _model_config_key(model_config):
    """Hashable canonical form of the kernel-builder config — the part of
    a greedy-scorer program's structure that is not in its shape key.  Two
    instances with equal keys trace byte-identical scorer programs
    (``_model_generator`` reads only these switches, ``m``, and the
    position)."""

    def _scalar(v):
        if isinstance(v, (np.ndarray, list, tuple)):
            a = np.asarray(v)
            return (str(a.dtype), a.shape, a.tobytes())
        return repr(v)

    return tuple(sorted((k, _scalar(v)) for k, v in model_config.items()))


#: Cross-instance cache of jitted SHAPE-BUCKETED programs.  Bucketed
#: programs are dataset-independent by construction (every data-derived
#: value rides in as a traced argument), so two ``GPARRegressor``
#: instances whose plans fingerprint equal (``fused.
#: plan_static_fingerprint`` + the compat flag + the transform functions)
#: trace byte-identical programs — sharing the ``jax.jit`` object makes a
#: NEW estimator instance on a new dataset hit the already-traced,
#: already-compiled executable instead of re-tracing and re-loading it
#: from the persistent XLA cache (measured 74.4 s vs 6.1 s warm on the
#: r4 stress bench's second-dataset probe; PERF.md finding 22).  Bounded
#: LRU; non-bucketed programs stay in the per-instance ``_jit_cache``
#: (their traces bake the dataset).
_SHARED_JIT_CACHE = collections.OrderedDict()
_SHARED_JIT_CAP = 64


def _shared_jit(key, pins, build):
    """Lookup-or-build in the cross-instance bucketed-program cache.

    ``pins`` are objects the entry must keep alive: the cache key includes
    ``id()`` of the instance's transform functions (identity of code, the
    only robust equality for user-supplied callables), and a pinned
    reference prevents a garbage-collected function's id from being
    reused by a DIFFERENT transform while the entry still lives."""
    ent = _SHARED_JIT_CACHE.get(key)
    if ent is not None:
        _SHARED_JIT_CACHE.move_to_end(key)
        return ent[0]
    fn = build()
    _SHARED_JIT_CACHE[key] = (fn, pins)
    if len(_SHARED_JIT_CACHE) > _SHARED_JIT_CAP:
        _SHARED_JIT_CACHE.popitem(last=False)
    return fn


class _LazyYCache(dict):
    """``per_output`` replay cache that builds each ``keep`` variant on
    first subscript (see ``GPARRegressor._y_cache``)."""

    def __init__(self, y_np, w_np):
        super().__init__()
        self._y_np, self._w_np = y_np, w_np

    def __missing__(self, keep):
        val = list(per_output(self._y_np, self._w_np, keep=keep))
        self[keep] = val
        return val


def _init_weights(w, y):
    """Default weights are ones of ``y``'s shape
    (``gpar/regression.py:193-197``)."""
    if w is None:
        return jnp.ones(y.shape, dtype=y.dtype)
    else:
        return _uprank(_to_jnp(w))


class GPARRegressor:
    """GPAR regressor (``gpar/regression.py:200-597``).

    Args:
        replace (bool): Replace observations with predictive means.
        impute (bool): Impute missing data with predictive means to make the
            data set closed downwards.  Defaults to `True`.
        scale: Initial length scale(s) over the inputs.
        scale_tie (bool): Tie input length scales across layers.
        per (bool): Use a locally periodic kernel over the inputs.
        per_period, per_scale, per_decay: Its initialisation.
        input_linear (bool): Linear kernel over the inputs.
        input_linear_scale: Its initialisation.
        linear (bool): Linear dependencies between outputs.  Default `True`.
        linear_scale: Its initialisation.
        nonlinear (bool): Nonlinear dependencies between outputs.
        nonlinear_scale: Its initialisation.
        rq (bool): RQ kernels instead of EQ.
        markov (int): Markov order of conditionals (None = fully connected).
        noise: Initial observation noise(s).
        x_ind: Inducing-point locations (None disables the sparse scheme).
        normalise_y (bool): Normalise outputs.  Default `True`.
        transform_y (tuple): (transform, inverse) applied to the data before
            fitting.
        compat (bool): Reproduce the reference bug-for-bug in
            :meth:`logpdf`: the reference applies ``_unnormalise_y`` to the
            incoming ``y`` (``gpar/regression.py:483``) where normalisation
            is clearly intended (the quirk is latent there — every
            reference test of ``logpdf`` sets ``normalise_y=False``).
            Defaults to `True` (literal parity); set `False` for the fixed
            semantics (normalise ``y`` like :meth:`condition` does).
            Neither mode adds Jacobian terms for ``transform_y`` /
            normalisation — matching the reference, the returned value is
            the density of the transformed, normalised data.
    """

    def __init__(
        self,
        replace=False,
        impute=True,
        scale=1.0,
        scale_tie=False,
        per=False,
        per_period=1.0,
        per_scale=1.0,
        per_decay=10.0,
        input_linear=False,
        input_linear_scale=100.0,
        linear=True,
        linear_scale=100.0,
        nonlinear=False,
        nonlinear_scale=1.0,
        rq=False,
        markov=None,
        noise=0.1,
        x_ind=None,
        normalise_y=True,
        transform_y=(lambda x: x, lambda x: x),
        compat=True,
    ):
        # Frozen kernel/noise configuration (constructor kwargs verbatim).
        self.replace = replace
        self.impute = impute
        self.sparse = x_ind is not None
        self.x_ind = None if x_ind is None else _uprank(_to_jnp(x_ind))
        self.model_config = {
            "scale": scale,
            "scale_tie": scale_tie,
            "per": per,
            "per_period": per_period,
            "per_scale": per_scale,
            "per_decay": per_decay,
            "input_linear": input_linear,
            "input_linear_scale": input_linear_scale,
            "linear": linear,
            "linear_scale": linear_scale,
            "nonlinear": nonlinear,
            "nonlinear_scale": nonlinear_scale,
            "rq": rq,
            "markov": markov,
            "noise": noise,
        }

        # Fitting state.
        self.vs = Vars()  # default dtype: float64 (configurable, config.dtype)
        # In-process cache of jitted programs (hyperparameters are traced
        # arguments; conditioning data are constants — keys carry a data
        # fingerprint).  Avoids re-tracing on repeated fit/predict calls.
        self._jit_cache = {}
        self.is_conditioned = False
        #: Structured observability for the most recent fit: per-layer NLL,
        #: L-BFGS iteration counts (fused path), wall-clock, path taken.
        self.last_fit_report = None
        # Host-side per-dataset caches (populated by condition()).
        self._y_cache_val = None
        self._data_fingerprint = None
        # Single-slot device-side posterior-factor cache (the repeated-
        # serving fast path; see _posterior_factors / precompute()).
        self._factor_cache = None
        # Single-slot padded-input cache for the shape-bucketed programs
        # (see _bucket_fit_inputs).
        self._bucket_cache = None
        # Single-slot scan-plan cache (see _scan_fit_plan) and host copies
        # of the conditioned data (avoid repeat device->host fetches).
        self._plan_cache = None
        self._x_np = self._y_np = self._w_np = None
        self._x_ind_dev = None
        self._vars_ready = None
        self._x_dev = None  # Inputs of training data (device, lazy)
        self._y_dev = None  # Outputs of training data (device, lazy)
        self._w_dev = None  # Weights (device, lazy)
        self.n = None  # Number of data points
        self.m = None  # Number of input features
        self.p = None  # Number of outputs

        # Output transform + normalisation state.
        self.compat = compat
        self.normalise_y = normalise_y
        self._unnormalise_y, self._normalise_y = lambda x: x, lambda x: x
        self._transform_y, self._untransform_y = transform_y

        #: Greedy output ordering (original-output index per layer), set by
        #: ``fit(greedy=True)`` with ``compat=False``; ``None`` = identity.
        #: Layer ``pi`` models output ``order[pi]``; user-facing inputs and
        #: outputs stay in the original column order.
        self.order = None

    def _permute_outputs(self, a, strict=True):
        """Original column order -> internal (greedy) layer order.

        With a greedy ordering in effect the binding between output
        columns and layers is only defined for the full set of fitted
        outputs; ``strict`` (the condition/logpdf paths) raises on a
        width mismatch rather than silently binding columns to the wrong
        layers.  Non-strict callers (prior sampling with an explicit
        ``p != fitted p`` — a different chain than the fitted one, where
        columns mean "greedy position") pass mismatched widths through
        untouched."""
        if a is None or self.order is None or (
            not strict and a.shape[1] != len(self.order)
        ):
            return a
        if a.shape[1] != len(self.order):
            raise ValueError(
                f"A greedy output ordering over {len(self.order)} outputs "
                f"is in effect; data with {a.shape[1]} output columns "
                "cannot be matched to layers. Pass all fitted outputs, or "
                "clear `self.order`."
            )
        return a[:, np.asarray(self.order)]

    def _unpermute_outputs(self, a, strict=True):
        """Internal (greedy) layer order -> original column order; applies
        to the last axis (sample batches are (s, n, p)).  ``strict`` as in
        :meth:`_permute_outputs` (prior samples of a different chain
        length stay in layer order)."""
        if a is None or self.order is None or (
            not strict and a.shape[-1] != len(self.order)
        ):
            return a
        if a.shape[-1] != len(self.order):
            raise ValueError(
                f"A greedy output ordering over {len(self.order)} outputs "
                f"is in effect; cannot relabel {a.shape[-1]} sampled "
                "columns."
            )
        return a[..., np.argsort(np.asarray(self.order))]

    def _lazy_dev(self, attr, host):
        """Materialise a device copy from a host copy on first access —
        but NEVER cache from inside a jit/vmap/grad trace, where
        ``jnp.asarray`` yields a traced constant whose escape would be a
        leak (legacy objectives read ``self.x`` under trace; they get a
        per-trace constant, exactly what the old eager attribute gave
        them as a closure constant)."""
        cur = getattr(self, attr)
        if cur is not None or host is None:
            return cur
        from .gpar import _tracing_active

        if _tracing_active():
            return jnp.asarray(host)
        val = jnp.asarray(host)
        setattr(self, attr, val)
        return val

    @property
    def x(self):
        """Conditioned inputs as a device array (``reg.x`` — reference
        attribute, ``gpar/regression.py:339-389``), materialised LAZILY
        from the host copy: the bucketed flows never read it, so fresh
        datasets skip the exact-shape upload (PERF.md finding 30)."""
        return self._lazy_dev("_x_dev", self._x_np)

    @x.setter
    def x(self, v):
        self._x_dev = v

    @property
    def y(self):
        return self._lazy_dev("_y_dev", self._y_np)

    @y.setter
    def y(self, v):
        self._y_dev = v

    @property
    def w(self):
        return self._lazy_dev("_w_dev", self._w_np)

    @w.setter
    def w(self, v):
        self._w_dev = v

    def _data_dtype(self):
        """The conditioned data's dtype without touching the device."""
        if self._x_np is not None:
            return self._x_np.dtype
        return self.x.dtype

    def _ensure_vars(self, p):
        """Instantiate every layer's variables once per (m, p).

        The generators run eagerly (each ``vs.bnd`` transform is a device
        op), so repeating this per fit/predict call costs ~100 dispatch
        round-trips on a 16-layer model; the guard makes it once per
        conditioning."""
        if self._vars_ready == (self.m, p):
            return
        for pi in range(p):
            _construct_gpar(self, self.vs, self.m, pi + 1).layers[pi]()
        self._vars_ready = (self.m, p)

    def get_variables(self):
        """Dictionary of all hyperparameters (name -> NumPy value),
        ``gpar/regression.py:328-337``."""
        variables = {}
        for name in self.vs.names:
            variables[name] = np.asarray(self.vs[name])
        return variables

    def condition(self, x, y, w=None):
        """Condition the model on data without training
        (``gpar/regression.py:339-389``).

        If a greedy output ordering was determined (:meth:`fit` with
        ``greedy=True`` and ``compat=False``), the output columns are
        permuted internally so layer ``pi`` models output
        ``self.order[pi]``; all user-facing results come back in the
        original column order.
        """
        # Validate/permute before mutating any state: a width mismatch
        # against a fitted greedy ordering must leave the estimator
        # untouched, not half-updated.  Host (NumPy) inputs stay host-side
        # through permute/transform/normalise and upload ONCE at the end —
        # the previous flow's eager device ops + stat fetches cost ~2.5 s
        # per fresh dataset through the relay (PERF.md finding 27).  A jax
        # input (or a jnp-based transform_y) falls through to device ops,
        # with one fetch for the stats.
        y = self._permute_outputs(_uprank_host(y))
        if w is not None:
            w = self._permute_outputs(_uprank_host(w))
        x = _uprank_host(x)
        y = self._transform_y(y)
        host = not (
            isinstance(x, jax.Array)
            or isinstance(y, jax.Array)
            or isinstance(w, jax.Array)
        )
        self.n, self.m = x.shape
        self.p = y.shape[1]

        # NaN-aware per-output normalisation with the std == 0 -> 1 guard
        # (``gpar/regression.py:356-386``).  Statistics are host-side: the
        # data is concrete here.
        if self.normalise_y:
            y_np = np.asarray(y)
            means, stds = [], []
            for i in range(self.p):
                available = ~np.isnan(y_np[:, i])
                y_i = y_np[available, i]
                means.append(np.mean(y_i))
                std = np.std(y_i, ddof=1) if y_i.size > 1 else 0.0
                stds.append(std if std > 0 else 1.0)

            # NumPy stats: broadcasting against traced/jnp operands inside
            # programs works unchanged, while host pipelines stay off the
            # device.
            means = np.asarray(means, dtype=y_np.dtype)[None, :]
            stds = np.asarray(stds, dtype=y_np.dtype)[None, :]

            def normalise_y(y_):
                return (y_ - means) / stds

            def unnormalise_y(y_):
                return y_ * stds + means

            self._normalise_y = normalise_y
            self._unnormalise_y = unnormalise_y
            # Plain-array statistics, for checkpointing
            # (utils/checkpoint.py).
            self._norm_stats = {
                "means": np.asarray(means),
                "stds": np.asarray(stds),
            }

            y = normalise_y(y)

        if host:
            x_np = np.asarray(x)
            y_np = np.asarray(y)
            w_np = (
                np.ones(y_np.shape, dtype=y_np.dtype)
                if w is None
                else np.asarray(w, dtype=y_np.dtype)
            )
            # No eager device upload: the conditioned data lives on the
            # host, and the device copies (``self.x`` etc.) materialise
            # LAZILY on first access.  Bucketed production flows consume
            # only the padded device arrays (``device_bucket_inputs``),
            # so they never pay the exact-shape transfer at all — at
            # n=52.5k/p=32 the double upload cost ~4 s per fresh dataset
            # (PERF.md finding 30).
            self.x = self.y = self.w = None
            self.is_conditioned = True
            self._rebuild_data_caches(x_np=x_np, y_np=y_np, w_np=w_np)
        else:
            self.x = _uprank(_to_jnp(x))
            self.y = jnp.asarray(y)
            self.w = _init_weights(
                None if w is None else jnp.asarray(w), self.y
            )
            self.is_conditioned = True
            self._rebuild_data_caches()

    @property
    def _y_cache(self):
        """Precomputed ``per_output`` replay items (the dict overload,
        ``gpar/regression.py:412-414``), built LAZILY — per ``keep``
        variant, on first subscript: the build is O(p²·n) host memcpy
        (~4.4 s at n=52.5k/p=32) and only the legacy/unrolled paths
        replay it (PERF.md finding 30).  A real ``dict`` subclass, so
        ``per_output``'s dict-overload isinstance check and the
        ``cache[keep]`` call sites work unchanged — prefetching the
        property (``y_cached = self._y_cache``) costs nothing until a
        consumer actually subscripts it."""
        if self._y_cache_val is None and self._y_np is not None:
            self._y_cache_val = _LazyYCache(self._y_np, self._w_np)
        return self._y_cache_val

    def _rebuild_data_caches(self, x_np=None, y_np=None, w_np=None):
        """Host-side caches computed once per dataset: the per_output mask
        plan (pure NumPy; eager per-layer device gathers cost a dispatch
        round-trip each) and the content fingerprint keying compiled
        programs (one device->host fetch instead of one per fit/predict).
        Called by :meth:`condition` and by checkpoint restore.  Host
        copies may be passed in when the caller already has them (the
        condition() host path) — each ``np.asarray`` of a device array
        here is otherwise a fresh device->host fetch through the relay."""
        if y_np is None:
            y_np, w_np = np.asarray(self.y), np.asarray(self.w)
        if x_np is None:
            x_np = np.asarray(self.x)
        # The per_output replay cache is LAZY: building it is O(p^2 n)
        # host memcpy (measured 9.8 s at n=52.5k/p=32 — the dominant cost
        # of conditioning on a large dataset) and only the legacy/
        # unrolled paths consume it; the bucketed production flows never
        # touch it (PERF.md finding 30).
        self._y_cache_val = None
        self._data_fingerprint = _fingerprint(y_np, w_np, self.x_ind)
        # Host copies for later host-side consumers (the scan-plan build):
        # on a remote-attached chip every np.asarray of a device array is
        # a fresh device->host fetch — one per fresh dataset is enough
        # (PERF.md finding 27).
        self._x_np = x_np
        self._y_np, self._w_np = y_np, w_np
        self._vars_ready = None
        # Posterior factors belong to the previous dataset; release the
        # device memory eagerly (the key would miss anyway).
        self._factor_cache = None
        self._bucket_cache = None
        self._plan_cache = None

    def fit(self, x, y, w=None, greedy=False, fix=True, **kw_args):
        """Fit the model to data (``gpar/regression.py:391-459``).

        Further keyword arguments go to :func:`minimise_l_bfgs_b`
        (e.g. ``iters=``, ``trace=``, and — beyond the reference —
        ``restarts=k``: each layer's L-BFGS runs from one unperturbed plus
        ``k - 1`` perturbed inits *in parallel* (one ``vmap``, still a
        single XLA program on the fused path) and keeps the best optimum;
        ``restart_scale=`` sets the latent-space perturbation std-dev,
        ``key=`` makes the perturbations reproducible).

        Args:
            greedy (bool): Greedily order the outputs by conditional
                marginal likelihood before fitting.  The reference
                documents this option but raises NotImplementedError
                (``gpar/regression.py:410,448``); ``compat=True`` (default)
                matches that literally, ``compat=False`` implements the
                search (see :meth:`_greedy_order`).  The resulting
                permutation is stored in ``self.order``; all user-facing
                columns stay in the original order.
            fix (bool): Fix the parameters of a layer after training it; the
                fast path precomputes the previous layers' augmented inputs
                once per layer (``gpar/regression.py:423-432``).

        The fused-body choice rides on ``fused=`` (beyond the reference):
        ``True`` (default) auto-selects the shape-uniform ``lax.scan``
        body; ``"batched"`` runs all layers' L-BFGS in one vmap when the
        layers are provably independent (dense, fully-observed,
        ``replace=False``, ``scale_tie=False`` — see
        ``models/fused.py:make_batched_fit_body``; measured ~2× slower
        than the scan body on-chip at EEG scale, PERF.md finding 15, so
        never auto-selected); ``"unroll"`` forces
        the round-1 unrolled body; ``False`` the per-layer host driver.
        """
        if greedy:
            if self.compat:
                # Reference parity (``gpar/regression.py:448-449``).
                raise NotImplementedError("Greedy search is not implemented yet.")
            self.order = None
            self.condition(x, y, w)  # identity order: transforms + stats
            self.order = self._greedy_order(
                iters=kw_args.get("iters", 100),
                gtol=kw_args.get("gtol", 1e-9),
                memory_size=kw_args.get("memory_size", 10),
            )

        self.condition(x, y, w)

        # The precomputed `per_output` plan for both values of `keep`
        # (``gpar/regression.py:412-414``), built by condition().
        y_cached = self._y_cache

        # Instantiate every layer's variables once so traced views resolve
        # them without creating state mid-trace.
        self._ensure_vars(self.p)
        all_names = self.vs.select(None)

        # The fix=True fit runs FUSED by default: every layer's L-BFGS loop
        # plus the incremental input-augmentation between layers is a single
        # jitted XLA program — zero host round-trips per iteration, one
        # compile (persistently cached) per data shape.  ``trace=True`` or
        # ``fused=False`` falls back to the per-layer driver.
        fused = kw_args.pop("fused", True)
        profile_dir = kw_args.pop("profile_dir", None)
        mesh = kw_args.pop("mesh", None)
        import contextlib

        if profile_dir is not None:
            # Capture an XLA/TPU profile of the whole fit
            # (``jax.profiler``; view with TensorBoard or xprof).
            ctx = jax.profiler.trace(profile_dir)
        else:
            ctx = contextlib.nullcontext()
        # ``mesh=`` row-shards the sparse per-layer statistics over the
        # device mesh (TPU-native multi-chip; the reference is
        # single-process, SURVEY.md §2.4).
        mesh_ctx = use_mesh(mesh) if mesh is not None else contextlib.nullcontext()
        with ctx, mesh_ctx:
            return self._fit_inner(y_cached, all_names, fix, fused, **kw_args)

    def _greedy_order(self, iters=100, gtol=1e-9, memory_size=10):
        """Greedily order the outputs by conditional marginal likelihood.

        Implements the search the reference documents but stubs out
        (``gpar/regression.py:410,448``; the GPAR paper, arXiv:1802.07182,
        proposes ordering outputs greedily by maximising the marginal
        likelihood).  At position ``k`` with outputs ``S`` already selected,
        each remaining candidate ``o`` is scored by the *per-observation*
        optimised log marginal likelihood of a single layer-``k`` GP mapping
        ``[x, y[:, S]] -> y[:, o]`` on the rows where ``o`` and all of ``S``
        are observed (the closed-downwards requirement); the per-observation
        normalisation keeps candidates with different missingness patterns
        comparable.  The sparse (Titsias) scheme and the Markov order are
        honoured.  Requires :meth:`condition` to have run with identity
        ordering.

        Numerical caveat: the batched scorer factorises masked full-size
        matrices while the per-candidate oracle (``_greedy_layer_nll``)
        factorises the observed-row subset; the float-level differences
        can pick a different permutation only when candidate scores are
        near-tied — i.e. when the data itself does not distinguish the
        orderings (ADVICE r3).

        Returns:
            np.ndarray: permutation; layer ``pi`` models output ``ret[pi]``.
        """
        # Host copies kept by condition() (transformed + normalised).
        y_np, w_np, x_np = self._y_np, self._w_np, self._x_np
        remaining = list(range(self.p))
        selected = []
        # ONE compiled program per position scores ALL remaining candidates
        # (padded rows + masks, candidates vmapped) — compile count O(p)
        # even under heterogeneous missingness, where the per-candidate
        # scorer's shape-keyed jits are O(p^2).  Under an active mesh the
        # CANDIDATE axis is sharded over the devices (each chip optimises
        # its share of the candidates; same full-row masked math as
        # single-device, so the two contexts recover identical orderings);
        # the per-candidate scorer (`_greedy_layer_nll`) survives as the
        # filtered-row oracle only.
        for position in range(self.p):
            masks = np.stack(
                [
                    ~np.isnan(y_np[:, selected + [o]]).any(axis=1)
                    for o in remaining
                ]
            )
            n_obs = masks.sum(axis=1)
            # Rows with any selected output missing are masked out of
            # every candidate's likelihood, so zero-filling the NaNs
            # only feeds neutralised rows.
            x_aug = np.concatenate(
                [x_np, np.nan_to_num(y_np[:, selected], nan=0.0)], axis=1
            )
            nlls = self._greedy_position_nlls(
                position,
                x_aug,
                np.nan_to_num(y_np[:, remaining].T, nan=0.0),
                w_np[:, remaining].T,
                masks,
                iters,
                gtol,
                memory_size,
            )
            # Per-observation scores keep candidates with different
            # missingness comparable; empty candidates AND diverged
            # candidates (non-finite optimised NLL) score -inf — a
            # lexicographic argmax would otherwise PICK a NaN.
            # Ties/all-empty resolve to the first remaining index.
            with np.errstate(invalid="ignore"):
                scores = np.where(
                    n_obs > 0, -nlls / np.maximum(n_obs, 1), -np.inf
                )
            scores = np.where(np.isfinite(scores), scores, -np.inf)
            best_o = remaining[int(np.argmax(scores))]
            selected.append(best_o)
            remaining.remove(best_o)
        return np.asarray(selected)

    def _greedy_position_nlls(
        self, position, x_aug, ys, ws, masks, iters, gtol, memory_size
    ):
        """Optimised single-layer NLLs for ALL candidates at one greedy
        position, in ONE compiled program (candidates vmapped over padded
        rows + 0/1 masks — the neutralisation of ``models/fused.py``).

        Every candidate optimises from the identical fresh initialisation
        (a throwaway store, as the per-candidate scorer uses), so scores
        stay comparable; the jitted program is keyed on (position,
        n_candidates) only — data rides in as traced arguments.

        Under an active mesh the CANDIDATE axis is sharded over the
        devices: the candidate arrays are padded to a mesh multiple (by
        replicating candidate 0 — surplus scores are sliced off) and
        installed with explicit shardings, so GSPMD partitions the vmapped
        L-BFGS along candidates — per-device work O(C/P), one compile per
        position, and bit-identical full-row math to the single-device
        scorer (the two contexts recover the same ordering).
        """
        from ..config import config as _cfg

        from ..config import bucket_rows

        vs = Vars()
        _model_generator(vs, self.m, position, **self.model_config)()
        names = vs.select(None)
        z0 = vs.latent_vector(names)
        dtype = self._data_dtype()
        mesh = _cfg.mesh
        c_pad = 0
        if mesh is not None:
            c_pad = (-ys.shape[0]) % mesh.devices.size
            if c_pad:
                pad = lambda a: np.concatenate(
                    [a, np.repeat(a[:1], c_pad, axis=0)]
                )
                ys, ws, masks = pad(ys), pad(ws), pad(masks)
        # Shape-bucketed rows (config.shape_buckets): every array is
        # already a traced argument, so padding the row axis to the bucket
        # (y -> 0, w -> 1, mask -> 0 — masked rows are exactly neutral in
        # both the Titsias ELBO and the masked dense logpdf, the same
        # construction the fit bodies pin) makes the compiled scorer
        # dataset-independent: a second dataset with any row count inside
        # the bucket reuses all O(p) position programs.
        n_b = bucket_rows(ys.shape[1])
        if n_b > ys.shape[1]:
            r_pad = n_b - ys.shape[1]
            x_aug = np.concatenate(
                [x_aug, np.zeros((r_pad, x_aug.shape[1]), x_aug.dtype)]
            )
            ys = np.concatenate([ys, np.zeros((ys.shape[0], r_pad), ys.dtype)], axis=1)
            ws = np.concatenate([ws, np.ones((ws.shape[0], r_pad), ws.dtype)], axis=1)
            masks = np.concatenate(
                [masks, np.zeros((masks.shape[0], r_pad), masks.dtype)], axis=1
            )
        C, n = ys.shape

        cache_key = (
            "greedy_batch",
            position,
            C,
            n,
            x_aug.shape[1],
            iters,
            gtol,
            memory_size,
            mesh_descriptor(),
        )

        sparse = self.sparse
        n_ind = int(np.asarray(self.x_ind).shape[0]) if sparse else 0

        def _build():
            from ..ops.kernels import gram, kdiag
            from ..ops.linalg import (
                floor_noise,
                resolve_epsilon,
                titsias_factors,
            )
            from .fused import _masked_dense_factors

            def program(z0, x_ind_t, x_aug, ys, ws, masks):
                eps = resolve_epsilon(x_aug.dtype)
                if sparse:
                    # Inducing inputs (a TRACED argument — data-derived in
                    # every reference workload, so baking them would defeat
                    # cross-instance program sharing) augmented with the
                    # prior-mean (zero) estimate of the selected outputs,
                    # as in the per-candidate scorer
                    # (``gpar/model.py:291-305``).
                    z_aug = jnp.concatenate(
                        [
                            x_ind_t,
                            jnp.zeros(
                                (x_ind_t.shape[0], position),
                                dtype=x_ind_t.dtype,
                            ),
                        ],
                        axis=1,
                    )

                def one(y_t, w_t, mask):
                    def obj(z):
                        view = vs.with_latent_vector(names, z)
                        f, noise = _model_generator(
                            view, self.m, position, **self.model_config
                        )()
                        noise_w = floor_noise(noise / w_t)
                        if sparse:
                            kern = f.kernel
                            Kmm = gram(kern, z_aug, z_aug)
                            Kmn = gram(kern, z_aug, x_aug)
                            knn = kdiag(kern, x_aug)
                            elbo, _, _, _ = titsias_factors(
                                Kmm,
                                Kmn,
                                knn,
                                y_t * mask,
                                jnp.zeros_like(y_t),
                                noise_w,
                                mask=mask,
                            )
                            return -elbo
                        K = gram(f.kernel, x_aug, x_aug)
                        logpdf, _, _ = _masked_dense_factors(
                            K, y_t * mask, mask, noise_w, eps
                        )
                        return -logpdf

                    _, nll, _, _ = lbfgs_traced(
                        obj, z0, iters=iters, gtol=gtol, memory_size=memory_size
                    )
                    return nll

                return jax.vmap(one)(ys, ws, masks)

            return jax.jit(program)

        if _cfg.shape_buckets:
            # The scorer's trace is dataset-independent (data, masks, AND
            # inducing inputs all ride as traced arguments), so share the
            # compiled program across estimator instances — keyed on the
            # model structure (the kernel builder's config + m + sparse
            # geometry), the same regime as the fit/serve programs
            # (PERF.md finding 22).
            fn = _shared_jit(
                cache_key
                + (
                    _model_config_key(self.model_config),
                    self.m,
                    sparse,
                    n_ind,
                    str(np.dtype(dtype)),
                ),
                (),
                _build,
            )
        else:
            fn = self._jit_cache.get(cache_key)
            if fn is None:
                fn = _build()
                self._jit_cache[cache_key] = fn
        x_ind_t = (
            jnp.asarray(self.x_ind, dtype=dtype)
            if sparse
            else jnp.zeros((0, self.m), dtype=dtype)
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            cand = NamedSharding(mesh, PartitionSpec(_cfg.shard_axis))
            rep = NamedSharding(mesh, PartitionSpec())
            args = (
                jax.device_put(z0, rep),
                jax.device_put(x_ind_t, rep),
                jax.device_put(jnp.asarray(x_aug, dtype=dtype), rep),
                jax.device_put(jnp.asarray(ys, dtype=dtype), cand),
                jax.device_put(jnp.asarray(ws, dtype=dtype), cand),
                jax.device_put(jnp.asarray(masks, dtype=dtype), cand),
            )
        else:
            args = (
                z0,
                x_ind_t,
                jnp.asarray(x_aug, dtype=dtype),
                jnp.asarray(ys, dtype=dtype),
                jnp.asarray(ws, dtype=dtype),
                jnp.asarray(masks, dtype=dtype),
            )
        nlls = np.asarray(fn(*args))
        return nlls[: C - c_pad] if c_pad else nlls

    def _greedy_layer_nll(self, pi, x_aug, y_t, w_t, iters, gtol, memory_size):
        """Optimised single-layer NLL for one greedy candidate.

        A fresh throwaway variable store per candidate (identical inits, so
        scores are comparable); the whole L-BFGS runs as one jitted program
        with the candidate data as *traced* arguments, so one compile per
        (rows, columns) shape serves every candidate at that position.
        """
        vs = Vars()
        _model_generator(vs, self.m, pi, **self.model_config)()
        names = vs.select(None)
        z0 = vs.latent_vector(names)
        dtype = self._data_dtype()

        cache_key = (
            "greedy_nll",
            pi,
            x_aug.shape,
            iters,
            gtol,
            memory_size,
            mesh_descriptor(),
        )
        fn = self._jit_cache.get(cache_key)
        if fn is None:
            sparse, x_ind = self.sparse, self.x_ind

            def program(z0, x_aug, y_t, w_t):
                def obj(z):
                    view = vs.with_latent_vector(names, z)
                    f, noise = _model_generator(
                        view, self.m, pi, **self.model_config
                    )()
                    if sparse:
                        # Inducing inputs augmented with the prior-mean
                        # (zero) estimate of the selected outputs — the
                        # obs=None branch of `_update_inputs`
                        # (``gpar/model.py:291-305``).
                        z_aug = jnp.concatenate(
                            [x_ind, jnp.zeros((x_ind.shape[0], pi), dtype=x_ind.dtype)],
                            axis=1,
                        )
                        obs = PseudoObs(f(z_aug), f(x_aug, noise / w_t), y_t)
                    else:
                        obs = Obs(f(x_aug, noise / w_t), y_t)
                    return -obs.logpdf

                _, nll, _, _ = lbfgs_traced(
                    obj, z0, iters=iters, gtol=gtol, memory_size=memory_size
                )
                return nll

            fn = jax.jit(program)
            self._jit_cache[cache_key] = fn
        return float(
            fn(
                z0,
                jnp.asarray(x_aug, dtype=dtype),
                jnp.asarray(y_t, dtype=dtype),
                jnp.asarray(w_t, dtype=dtype),
            )
        )

    def _fit_inner(self, y_cached, all_names, fix, fused, **kw_args):
        # trace= stays inside kw_args (it belongs to minimise_l_bfgs_b);
        # it also forces the per-layer driver, whose progress output would
        # be invisible inside one fused program.
        trace = kw_args.get("trace", False)
        if fused and not trace and kw_args.get("jit", True):
            iters = kw_args.pop("iters", 1000)
            gtol = kw_args.pop("gtol", 1e-9)
            memory_size = kw_args.pop("memory_size", 10)
            restarts = kw_args.pop("restarts", 1)
            restart_scale = kw_args.pop("restart_scale", 1.0)
            key = kw_args.pop("key", None)
            kw_args.pop("trace", None)
            kw_args.pop("jit", None)
            if kw_args:
                # The per-layer driver would raise TypeError on unknown
                # options; silently dropping them here would be an
                # inconsistent contract (and hide typos like `itres=`).
                raise TypeError(
                    "Unsupported fit() options: "
                    + ", ".join(sorted(kw_args))
                )
            self._fit_fixed_fused(
                y_cached,
                all_names,
                iters=iters,
                gtol=gtol,
                memory_size=memory_size,
                restarts=restarts,
                restart_scale=restart_scale,
                key=key,
                scan=self._use_scan_body(fused),
                fix=fix,
            )
            return

        import time as _time

        from ..utils.experiment import Counter

        t0 = _time.time()
        layer_nll = []
        # Per-layer progress, as the reference shows
        # (``Counter(name="Training conditionals", ...)``,
        # ``gpar/regression.py:417``). The fused path is one opaque XLA
        # call and reports through ``last_fit_report`` instead.
        counter_ctx = Counter(name="Training conditionals", total=self.p)
        with counter_ctx as counter:
            self._fit_per_layer_loop(
                counter, y_cached, all_names, fix, layer_nll, **kw_args
            )
        self.last_fit_report = {
            "layer_nll": np.asarray(layer_nll),
            "layer_iters": None,  # per-layer driver does not track iterations
            "wall_clock_s": _time.time() - t0,
            "fused": False,
        }

    def _fit_per_layer_loop(
        self, counter, y_cached, all_names, fix, layer_nll, **kw_args
    ):
        for pi in range(self.p):
            counter.count()
            if fix:
                # Precompute the previous layers' augmented inputs — the
                # resumable-inputs fast path (``gpar/regression.py:423-432``)
                # — as ONE jitted program (hyperparameters traced, so the
                # compiled executable is reusable across fit calls).
                def _precompute(z, x, pi=pi):
                    view = self.vs.with_latent_vector(all_names, z)
                    gpar = _construct_gpar(self, view, self.m, pi + 1)
                    return gpar.logpdf(
                        x,
                        y_cached,
                        None,
                        only_last_layer=True,
                        outputs=list(range(pi)),
                        return_inputs=True,
                    )

                cache_key = (
                    "fit_precompute",
                    pi,
                    self.n,
                    self.m,
                    mesh_descriptor(),
                    self._data_fingerprint,
                )
                precompute_fn = self._jit_cache.get(cache_key)
                if precompute_fn is None:
                    precompute_fn = jax.jit(_precompute)
                    self._jit_cache[cache_key] = precompute_fn
                fixed_x, fixed_x_ind = precompute_fn(
                    self.vs.latent_vector(all_names), self.x
                )

            def objective(vs):
                gpar = _construct_gpar(self, vs, self.m, pi + 1)
                if fix:
                    return -gpar.logpdf(
                        fixed_x,
                        y_cached,
                        None,
                        only_last_layer=True,
                        outputs=[pi],
                        x_ind=fixed_x_ind,
                    )
                else:
                    return -gpar.logpdf(self.x, y_cached, None, only_last_layer=False)

            if fix:
                names = [f"{pi}/*"]
            else:
                names = [f"{i}/*" for i in range(pi + 1)]

            layer_kw = kw_args
            if kw_args.get("restarts", 1) > 1:
                # Independent restart perturbations per layer (the fused
                # path splits its key per layer too); without this, layers
                # with same-shaped latent vectors would draw identical
                # offsets.
                if kw_args.get("key") is None:
                    kw_args["key"] = next_key()
                layer_kw = {**kw_args, "key": jax.random.fold_in(kw_args["key"], pi)}
            layer_nll.append(
                minimise_l_bfgs_b(objective, self.vs, names=names, **layer_kw)
            )

    def _use_scan_body(self, fused):
        """Which shape-uniform fused body the fix=True fit should use.

        Returns ``"scan"`` (one ``lax.scan`` layer body), ``"batched"``
        (all layers' L-BFGS in one vmap — requires provably independent
        layers, ``models/fused.py:make_batched_fit_body``; opt-in via
        ``fused="batched"``), or ``False`` (the round-1 unrolled body,
        forced by ``fused="unroll"``).

        Under an active mesh the scan body runs for fits with enough rows
        to shard (``models/fused.py``: the whole scan inside one
        shard_map — sparse layers psum-reduce the Titsias ELBO, dense
        layers factorise through the distributed blocked Cholesky of
        ``parallel/dense.py``); small-n fits fall back to the unrolled
        body, which shards its per-layer statistics through the GP core's
        own mesh dispatch.
        """
        if fused == "unroll":
            return False
        from ..config import config as _cfg

        if fused == "batched":
            if _cfg.mesh is not None:
                raise ValueError(
                    "fused='batched' is a single-device program; disable "
                    "the active mesh or use fused=True."
                )
            return "batched"
        if _cfg.mesh is None:
            return "scan"
        if self.n is not None and self.n >= max(
            _cfg.shard_min_rows, _cfg.mesh.devices.size
        ):
            return "scan"
        return False

    def _fit_fixed_fused(
        self,
        y_cached,
        all_names,
        iters,
        gtol,
        memory_size,
        restarts=1,
        restart_scale=1.0,
        key=None,
        scan=True,
        fix=True,
    ):
        """The whole fit as one jitted program (fix=True or fix=False).

        Per layer pi: L-BFGS (``lbfgs_traced``, a lax.while_loop) on
        -logpdf of layer pi given the incrementally-threaded augmented
        inputs; then one input-augmentation step (the resumable-inputs
        contract, ``gpar/model.py:199-243``) feeds layer pi+1.  Because
        fix=True freezes earlier layers, threading inputs forward is exactly
        equivalent to the reference's full-chain recomputation per layer
        (``gpar/regression.py:423-432``).

        With ``fix=False`` (the Jura workload), layer pi's objective is the
        FULL chain logpdf re-evaluated from the raw inputs, optimising all
        latents ``{0..pi}/*`` jointly (``gpar/regression.py:452-456``) —
        see :meth:`_build_free_fused_fit_body`.

        ``restarts > 1`` vmaps each layer's L-BFGS over one unperturbed
        plus ``restarts - 1`` perturbed inits and keeps the best optimum
        (:func:`gpar_tpu.params.optim.lbfgs_traced_restarts`) — all inside
        the same single XLA program.
        """
        from ..config import config as _cfg

        # Preflight for a latent libtpu abort (PERF.md finding 24): a fresh
        # x64 compile of the mesh fit with restarts>1 (vmap of the
        # shard_map'd layer objective) hard-crashes libtpu's memory-space
        # assignment ("Check failed: memory_space == existing_required_
        # assignment->memory_space", v5e) — a process abort, not a Python
        # error.  The construct is correct JAX (the identical f32 program
        # and the identical x64 program on a CPU mesh both run), so raise a
        # clear error instead of letting the runtime kill the process.
        if (
            restarts > 1
            and _cfg.mesh is not None
            and np.dtype(self._data_dtype()) == np.float64
            and any(
                d.platform == "tpu" for d in _cfg.mesh.devices.flat[:1]
            )
        ):
            raise RuntimeError(
                "fit(restarts>1) under a TPU mesh in float64 aborts inside "
                "libtpu (memory-space assignment check; PERF.md finding "
                "24). Use float32 on TPU (GPAR_TPU_NO_X64=1, the "
                "production mode), or run the x64 fit on a CPU mesh "
                "(parity testing), or set restarts=1."
            )
        p = self.p
        if restarts > 1 and key is None:
            key = next_key()
        layer_keys = self._fit_layer_keys(key, restarts)

        # Shape-bucketed compilation (config.shape_buckets, single-device
        # scan bodies): rows pad to a geometric bucket and the data rides
        # in as traced arguments, so the compiled program is keyed on the
        # BUCKET, not the dataset — a second dataset with any row count
        # inside the bucket reuses the executable (in-process via
        # _jit_cache, cross-process via the persistent XLA cache, whose
        # HLO is now data-independent).
        bucketed = self._fit_bucketed(scan)
        if bucketed:
            plan = self._scan_fit_plan(all_names)
            n_b, x_fit, xs_rows = self._bucket_fit_inputs(plan)
        else:
            n_b, x_fit, xs_rows = self.n, self.x, None

        cache_key = (
            "fit_fused",
            scan,
            fix,
            bucketed,
            n_b,
            self.m,
            p,
            iters,
            gtol,
            memory_size,
            restarts,
            restart_scale,
            mesh_descriptor(),
            None if bucketed else self._data_fingerprint,
        )

        def _build():
            program = self._build_fit_body(
                y_cached,
                all_names,
                iters,
                gtol,
                memory_size,
                restarts,
                restart_scale,
                scan,
                fix,
                rows_traced=bucketed,
            )
            return jax.jit(program)

        if bucketed:
            # Bucketed programs are dataset-independent: share the jitted
            # executable ACROSS estimator instances (a new instance on a
            # new dataset skips re-tracing; PERF.md finding 22).
            fit_fn = _shared_jit(
                cache_key + self._bucket_share_key(plan),
                self._transform_pins(),
                _build,
            )
        else:
            fit_fn = self._jit_cache.get(cache_key)
            if fit_fn is None:
                fit_fn = _build()
                self._jit_cache[cache_key] = fit_fn
        import time as _time

        t0 = _time.time()
        args = (self.vs.latent_vector(all_names), x_fit, layer_keys)
        if bucketed:
            args = args + (xs_rows,)
        z_final, layer_nll, layer_iters, layer_nll0 = fit_fn(*args)
        jax.block_until_ready(z_final)
        self.vs.set_latent_vector(all_names, z_final)
        # Structured fit observability (SURVEY.md §5: the reference logs
        # nothing beyond a progress bar).  ``layer_nll0`` is the NLL at the
        # initial hyperparameters, so ``layer_nll0 - layer_nll`` is the
        # per-layer optimisation gain (reported by bench.py's quality line).
        self.last_fit_report = {
            "layer_nll": np.asarray(layer_nll),
            "layer_nll0": np.asarray(layer_nll0),
            "layer_iters": np.asarray(layer_iters),
            "wall_clock_s": _time.time() - t0,
            "fused": True,
            "restarts": restarts,
        }

    def _fit_layer_keys(self, key, restarts):
        """Per-layer PRNG keys for restart perturbations (a dummy filler
        when restarts == 1 so the program signature stays uniform)."""
        if restarts > 1:
            return jax.random.split(key, self.p)
        return jnp.zeros((self.p, 2), dtype=jnp.uint32)

    def _build_fit_body(
        self,
        y_cached,
        all_names,
        iters,
        gtol,
        memory_size,
        restarts,
        restart_scale,
        scan,
        fix=True,
        rows_traced=False,
    ):
        """Whole-fit body builder: the scan (shape-uniform, one compiled
        layer body — ``models/fused.py``), the round-1 unrolled variant
        (one body per layer; shards under an active mesh), or the
        free (fix=False) full-chain variant (scan-fused, single-device
        or inside one shard_map under a mesh)."""
        if not fix:
            from ..config import config as _cfg

            if scan == "batched":
                raise ValueError(
                    "fused='batched' requires independent layer fits; "
                    "fit(fix=False) optimises layers jointly — use "
                    "fused=True or fused='unroll'."
                )
            if scan:
                from .fused import make_scan_free_fit_body

                plan = self._scan_fit_plan(all_names)
                return make_scan_free_fit_body(
                    plan, self.x_ind, iters, gtol, memory_size, restarts,
                    restart_scale, rows_traced=rows_traced,
                    mesh=_cfg.mesh, shard_axis=_cfg.shard_axis,
                )
            return self._build_free_fused_fit_body(
                y_cached, all_names, iters, gtol, memory_size, restarts,
                restart_scale,
            )
        if scan == "batched":
            from .fused import make_batched_fit_body

            plan = self._scan_fit_plan(all_names)
            return make_batched_fit_body(
                plan, iters, gtol, memory_size, restarts, restart_scale
            )
        if scan:
            from ..config import config as _cfg
            from .fused import make_scan_fit_body

            plan = self._scan_fit_plan(all_names)
            return make_scan_fit_body(
                plan, self.x_ind, iters, gtol, memory_size, restarts,
                restart_scale, mesh=_cfg.mesh, shard_axis=_cfg.shard_axis,
                rows_traced=rows_traced,
            )
        return self._build_fused_fit_body(
            y_cached, all_names, iters, gtol, memory_size, restarts, restart_scale
        )

    def _build_fused_fit_body(
        self, y_cached, all_names, iters, gtol, memory_size, restarts, restart_scale
    ):
        """The traced whole-fit body ``(z_all, x, layer_keys) -> (z_final,
        layer_nll, layer_iters)`` shared by :meth:`_fit_fixed_fused` (which
        jits it alone) and :meth:`fit_predict` (which composes it with the
        prediction tail in one program)."""
        p, m = self.p, self.m

        # Flat-vector index spans per layer (the names=[f"{pi}/*"] filter of
        # ``gpar/regression.py:452-456``, as static gather indices).
        offsets = {}
        off = 0
        for name in all_names:
            size = int(np.prod(self.vs._latents[name].shape))
            offsets[name] = (off, size)
            off += size
        layer_idx = []
        for pi in range(p):
            names_pi = self.vs.select([f"{pi}/*"])
            idx = np.concatenate(
                [np.arange(offsets[n][0], offsets[n][0] + offsets[n][1]) for n in names_pi]
            ).astype(np.int64)
            layer_idx.append(jnp.asarray(idx))

        def program(z_all, x, layer_keys):
            fixed_x, fixed_x_ind = x, self.x_ind
            layer_nll, layer_iters, layer_nll0 = [], [], []
            for pi in range(p):
                idx = layer_idx[pi]

                def obj(z_pi, z_all=z_all, fixed_x=fixed_x, fixed_x_ind=fixed_x_ind, pi=pi, idx=idx):
                    z_full = z_all.at[idx].set(z_pi)
                    view = self.vs.with_latent_vector(all_names, z_full)
                    gpar = _construct_gpar(self, view, m, pi + 1)
                    return -gpar.logpdf(
                        fixed_x,
                        y_cached,
                        None,
                        only_last_layer=True,
                        outputs=[pi],
                        x_ind=fixed_x_ind,
                    )

                z_pi_opt, nll_pi, it_pi, nll0_pi = lbfgs_traced_restarts(
                    obj,
                    z_all[idx],
                    layer_keys[pi],
                    restarts,
                    restart_scale=restart_scale,
                    iters=iters,
                    gtol=gtol,
                    memory_size=memory_size,
                )
                layer_nll.append(nll_pi)
                layer_iters.append(it_pi)
                layer_nll0.append(nll0_pi)
                z_all = z_all.at[idx].set(z_pi_opt)

                if pi < p - 1:
                    # One incremental augmentation step: a (pi+2)-layer GPAR
                    # with outputs=[pi] filters by layer pi's mask, builds
                    # its observations, and appends the (imputed/replaced)
                    # output column — without re-running layers < pi (their
                    # filtering/augmentation is already baked into fixed_x).
                    view = self.vs.with_latent_vector(all_names, z_all)
                    gpar = _construct_gpar(self, view, m, pi + 2)
                    fixed_x, fixed_x_ind = gpar.logpdf(
                        fixed_x,
                        y_cached,
                        None,
                        only_last_layer=True,
                        outputs=[pi],
                        x_ind=fixed_x_ind,
                        return_inputs=True,
                    )
            return (
                z_all,
                jnp.stack(layer_nll),
                jnp.stack(layer_iters),
                jnp.stack(layer_nll0),
            )

        return program

    def _build_free_fused_fit_body(
        self, y_cached, all_names, iters, gtol, memory_size, restarts, restart_scale
    ):
        """The traced whole-fit body for ``fit(fix=False)``.

        Reference semantics (``gpar/regression.py:452-456``): at layer pi
        the objective is the FULL chain marginal likelihood of layers
        ``0..pi`` re-evaluated from the raw inputs (so earlier layers'
        hyperparameters keep moving and the impute/replace augmentation is
        recomputed inside every objective evaluation), optimising all
        latents ``{0..pi}/*`` jointly.  Same contract as
        :meth:`_build_fused_fit_body`; the reported ``layer_nll`` is the
        full-chain NLL (matching what the per-layer driver's
        ``minimise_l_bfgs_b`` returns on this path).

        Compile-size note: the traced program contains the layer-0..pi
        chain once per layer — O(p^2/2) layer bodies.  The scan-fused
        free body (``fused.make_scan_free_fit_body``) compiles O(1) in p
        and is the default both single-device and under a mesh (where it
        runs inside one shard_map); this unrolled variant remains the
        ``fused="unroll"`` oracle (its per-layer statistics shard through
        the GP core's mesh dispatch).
        """
        p, m = self.p, self.m

        offsets = {}
        off = 0
        for name in all_names:
            size = int(np.prod(self.vs._latents[name].shape))
            offsets[name] = (off, size)
            off += size
        prefix_idx = []
        for pi in range(p):
            names_pi = self.vs.select([f"{i}/*" for i in range(pi + 1)])
            idx = np.concatenate(
                [np.arange(offsets[n][0], offsets[n][0] + offsets[n][1]) for n in names_pi]
            ).astype(np.int64)
            prefix_idx.append(jnp.asarray(idx))

        def program(z_all, x, layer_keys):
            layer_nll, layer_iters, layer_nll0 = [], [], []
            for pi in range(p):
                idx = prefix_idx[pi]

                def obj(z_sub, z_all=z_all, pi=pi, idx=idx):
                    z_full = z_all.at[idx].set(z_sub)
                    view = self.vs.with_latent_vector(all_names, z_full)
                    gpar = _construct_gpar(self, view, m, pi + 1)
                    return -gpar.logpdf(x, y_cached, None, only_last_layer=False)

                z_sub_opt, nll_pi, it_pi, nll0_pi = lbfgs_traced_restarts(
                    obj,
                    z_all[idx],
                    layer_keys[pi],
                    restarts,
                    restart_scale=restart_scale,
                    iters=iters,
                    gtol=gtol,
                    memory_size=memory_size,
                )
                layer_nll.append(nll_pi)
                layer_iters.append(it_pi)
                layer_nll0.append(nll0_pi)
                z_all = z_all.at[idx].set(z_sub_opt)
            return (
                z_all,
                jnp.stack(layer_nll),
                jnp.stack(layer_iters),
                jnp.stack(layer_nll0),
            )

        return program

    def fit_predict(
        self,
        x,
        y,
        x_test=None,
        w=None,
        w_test=None,
        num_samples=100,
        latent=False,
        credible_bounds=False,
        key=None,
        **kw_args,
    ):
        """Fit and predict in ONE compiled program and device round-trip.

        Equivalent to ``fit(x, y, w, **kw_args)`` followed by
        ``predict(x_test, w_test, num_samples, latent, credible_bounds)``
        — but the whole pipeline (every layer's L-BFGS loop, posterior
        conditioning, the vmapped ancestral sampling chain, and the
        Monte-Carlo mean/percentile reduction) executes as a single XLA
        program, so the host is involved exactly once.  A TPU-native
        serving path beyond the reference: on a remote-attached chip each
        dispatch costs hundreds of ms, so fusing the two phases removes
        ~1/3 of the end-to-end latency (PERF.md).

        ``x_test`` defaults to the training inputs.  Accepts the fused-fit
        options (``iters=``, ``gtol=``, ``memory_size=``, ``restarts=``,
        ``restart_scale=``).  Updates the store and ``last_fit_report``
        exactly like :meth:`fit`.
        """
        self.condition(x, y, w)
        x_test = (
            (self._x_np if self._x_np is not None else self.x)
            if x_test is None
            else _uprank(_to_jnp(x_test))
        )

        self._ensure_vars(self.p)
        all_names = self.vs.select(None)
        y_cached = self._y_cache

        iters = kw_args.pop("iters", 1000)
        gtol = kw_args.pop("gtol", 1e-9)
        memory_size = kw_args.pop("memory_size", 10)
        restarts = kw_args.pop("restarts", 1)
        restart_scale = kw_args.pop("restart_scale", 1.0)
        fused = kw_args.pop("fused", True)
        if kw_args:
            raise TypeError(
                "Unsupported fit_predict() options: " + ", ".join(sorted(kw_args))
            )
        scan = self._use_scan_body(fused)

        from ..config import bucket_rows, bucket_samples
        from ..config import config as _cfg

        # Scan-fused serving: conditioning + the whole MC predictive
        # collapse into one lax.scan over layers whose body compiles once —
        # cold-compile O(1) in p instead of the unrolled path's p-fold
        # conditioning + vmapped sampling chain.  replace=True shares the
        # per-layer factors across samples (posterior means feed forward);
        # replace=False (the reference default) vmaps per-sample chains
        # inside the scan body (make_scan_ancestral_tail).  Under an
        # active mesh the fit body runs inside one shard_map
        # (_build_fit_body) and the serving tail runs GSPMD-partitioned:
        # per-layer factors replicate, the sharded key batch keeps the
        # sample axis distributed.  Single-device, the whole program is
        # SHAPE-BUCKETED by default (config.shape_buckets): rows, test
        # rows, and the sample count pad to buckets with the data traced
        # as arguments, so one compiled executable serves every dataset
        # in the size range (VERDICT r3 №1).
        scan_tail = scan and _cfg.scan_predict
        plan = None
        bucketed = False
        n_b = self.n
        if scan_tail:
            plan = self._scan_fit_plan(all_names)
            bucketed = self._fit_bucketed(scan)
            if bucketed:
                n_b = bucket_rows(self.n)
            if not self.replace and not self._factor_stack_fits(
                plan, n_rows=n_b
            ):
                # Falls back to the unrolled chain when a dense stack is
                # too large to materialise.
                scan_tail = False
                bucketed = False
                n_b = self.n

        if key is None:
            key = next_key()
        fit_key, sample_key = jax.random.split(key)
        layer_keys = self._fit_layer_keys(fit_key, restarts)
        n_keys = num_samples
        if bucketed:
            # Pad the key batch to the sample bucket; surplus draws are
            # invalidated before the on-device reduction (prefix-stable
            # key splitting keeps the real draws identical).
            n_keys = bucket_samples(num_samples)
        if _cfg.mesh is not None:
            # Pad the key batch (after any sample bucketing) to a mesh
            # multiple and shard it: each chip draws its share of the
            # Monte-Carlo samples; the surplus is sliced off (masked in
            # bucketed mode) before the on-device reduction.
            size = _cfg.mesh.devices.size
            n_keys = n_keys + (-n_keys) % size
        keys = jax.random.split(sample_key, n_keys)
        if _cfg.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            keys = jax.device_put(
                keys,
                NamedSharding(
                    _cfg.mesh, PartitionSpec(_cfg.shard_axis)
                ),
            )

        # Padded test inputs + row/sample validity masks (bucketed mode).
        n_test = x_test.shape[0]
        nt_b = bucket_rows(n_test) if bucketed else n_test
        dtype = x_test.dtype
        if bucketed:
            if nt_b > n_test:
                x_test_in = jnp.asarray(
                    np.pad(np.asarray(x_test), ((0, nt_b - n_test), (0, 0)))
                )
            else:
                x_test_in = x_test
            mt = jnp.asarray((np.arange(nt_b) < n_test).astype(dtype))
            ms = jnp.asarray((np.arange(n_keys) < num_samples).astype(dtype))
            _, x_fit, xs_rows = self._bucket_fit_inputs(plan)
        else:
            x_test_in, mt, ms = x_test, None, None
            x_fit, xs_rows = self.x, None
        if w_test is None:
            w_test = jnp.ones((nt_b, self.p), dtype=dtype)
        else:
            w_test = self._permute_outputs(_uprank(_to_jnp(w_test)))
            if bucketed and nt_b > n_test:
                # Pad weights with 1 (they divide the noise).
                w_test = jnp.concatenate(
                    [w_test, jnp.ones((nt_b - n_test, self.p), dtype=dtype)]
                )

        cache_factors = False
        if scan_tail and not self.replace:
            # Per-sample ancestral serving from the factor stack.
            from .fused import (
                make_scan_ancestral_tail,
                make_scan_posterior_factors,
                resolve_sample_chunk,
            )

            fit_body = self._build_fit_body(
                y_cached, all_names, iters, gtol, memory_size,
                restarts, restart_scale, scan, rows_traced=bucketed,
            )
            factors_fn = make_scan_posterior_factors(
                plan, self.x_ind, mesh=_cfg.mesh, rows_traced=bucketed
            )
            anc_tail = make_scan_ancestral_tail(
                plan, latent,
                sample_chunk=resolve_sample_chunk(
                    _cfg.predict_sample_chunk, n_keys, nt_b, dtype,
                    _cfg.predict_memory_budget,
                ),
                mesh=_cfg.mesh, rows_traced=bucketed,
            )
            cache_factors = self._factor_cache_eligible(plan, n_rows=n_b)

            def program(
                z0, x_arr, x_test, w_test, keys, layer_keys,
                xs_rows=None, mt=None, ms=None, nstats=None,
                _cache=cache_factors,
            ):
                if bucketed:
                    z_final, layer_nll, layer_iters, layer_nll0 = fit_body(
                        z0, x_arr, layer_keys, xs_rows
                    )
                    factors = factors_fn(z_final, x_arr, xs_rows)
                    batch = anc_tail(
                        z_final, factors, x_test, w_test.T, keys, xs_rows, mt
                    )
                else:
                    z_final, layer_nll, layer_iters, layer_nll0 = fit_body(
                        z0, x_arr, layer_keys
                    )
                    factors = factors_fn(z_final, x_arr)
                    batch = anc_tail(
                        z_final, factors, x_test, w_test.T, keys
                    )
                mean, lowers, uppers = self._mc_stats(
                    self._undo_t(batch, nstats), num_samples, ms,
                )
                return (
                    z_final, layer_nll, layer_iters, layer_nll0,
                    mean, lowers, uppers,
                    factors if _cache else None,
                )

        if scan_tail and self.replace:
            from .fused import make_scan_predict_tail

            # _build_fit_body threads the active mesh into the scan body
            # (shard_map'd fit; the serving tail below stays GSPMD).
            fit_body = self._build_fit_body(
                y_cached, all_names, iters, gtol, memory_size, restarts,
                restart_scale, scan, rows_traced=bucketed,
            )
            # When the posterior-factor cache is eligible, run the split
            # serving tail and RETURN the factors so follow-up predict/
            # sample calls skip conditioning entirely (PERF.md finding 19); the
            # single-scan tail remains for big dense stacks, where
            # materialising p (n, n) factors would cost more HBM than the
            # cache saves.
            cache_factors = self._factor_cache_eligible(plan, n_rows=n_b)
            if cache_factors:
                from .fused import (
                    make_scan_cached_tail,
                    make_scan_posterior_factors,
                )

                factors_fn = make_scan_posterior_factors(
                    plan, self.x_ind, mesh=_cfg.mesh, rows_traced=bucketed
                )
                tail_cached = make_scan_cached_tail(
                    plan, latent, mesh=_cfg.mesh, rows_traced=bucketed
                )

                def program(
                    z0, x_arr, x_test, w_test, keys, layer_keys,
                    xs_rows=None, mt=None, ms=None, nstats=None,
                ):
                    if bucketed:
                        z_final, layer_nll, layer_iters, layer_nll0 = (
                            fit_body(z0, x_arr, layer_keys, xs_rows)
                        )
                        factors = factors_fn(z_final, x_arr, xs_rows)
                        batch, _ = tail_cached(
                            z_final, factors, x_test, w_test.T, keys,
                            xs_rows, mt,
                        )
                    else:
                        z_final, layer_nll, layer_iters, layer_nll0 = (
                            fit_body(z0, x_arr, layer_keys)
                        )
                        factors = factors_fn(z_final, x_arr)
                        batch, _ = tail_cached(
                            z_final, factors, x_test, w_test.T, keys
                        )
                    mean, lowers, uppers = self._mc_stats(
                        self._undo_t(batch, nstats), num_samples, ms,
                    )
                    return (
                        z_final, layer_nll, layer_iters, layer_nll0,
                        mean, lowers, uppers, factors,
                    )

            else:
                tail = make_scan_predict_tail(
                    plan, self.x_ind, latent, mesh=_cfg.mesh,
                    rows_traced=bucketed,
                )

                def program(
                    z0, x_arr, x_test, w_test, keys, layer_keys,
                    xs_rows=None, mt=None, ms=None, nstats=None,
                ):
                    if bucketed:
                        z_final, layer_nll, layer_iters, layer_nll0 = (
                            fit_body(z0, x_arr, layer_keys, xs_rows)
                        )
                        batch, _ = tail(
                            z_final, x_arr, x_test, w_test.T, keys,
                            xs_rows, mt,
                        )
                    else:
                        z_final, layer_nll, layer_iters, layer_nll0 = (
                            fit_body(z0, x_arr, layer_keys)
                        )
                        batch, _ = tail(
                            z_final, x_arr, x_test, w_test.T, keys
                        )
                    mean, lowers, uppers = self._mc_stats(
                        self._undo_t(batch, nstats), num_samples, ms,
                    )
                    return (
                        z_final, layer_nll, layer_iters, layer_nll0,
                        mean, lowers, uppers, None,
                    )

        if not scan_tail:
            fit_body = self._build_fit_body(
                y_cached, all_names, iters, gtol, memory_size, restarts,
                restart_scale, scan,
            )

            from .gpar import _sample_chain

            def program(z0, x_arr, x_test, w_test, keys, layer_keys):
                z_final, layer_nll, layer_iters, layer_nll0 = fit_body(
                    z0, x_arr, layer_keys
                )
                view = self.vs.with_latent_vector(all_names, z_final)
                gpar = _construct_gpar(self, view, self.m, self.p)
                gpar = gpar | (x_arr, y_cached, None)
                models = [mo() for mo in gpar.layers]
                fs = tuple(f for f, _ in models)
                noises = tuple(n for _, n in models)
                x_ind = gpar.x_ind

                def one(k):
                    return _sample_chain(
                        fs,
                        noises,
                        x_test,
                        w_test,
                        x_ind,
                        k,
                        latent=latent,
                        replace=self.replace,
                        sparse=self.sparse,
                    )

                batch = jax.vmap(one)(keys)
                batch = batch[:num_samples]  # drop mesh-padding surplus
                batch = self._untransform_y(self._unnormalise_y(batch))
                mean = jnp.mean(batch, axis=0)
                lowers = jnp.percentile(batch, 2.5, axis=0)
                uppers = jnp.percentile(batch, 100 - 2.5, axis=0)
                return (
                    z_final, layer_nll, layer_iters, layer_nll0,
                    mean, lowers, uppers, None,
                )

        cache_key = (
            "fit_predict",
            scan,
            scan_tail,
            cache_factors,
            bucketed,
            n_b,
            self.m,
            self.p,
            (nt_b, x_test.shape[1]),
            # Bucketed programs are num_samples-agnostic (the surplus is
            # masked out of nan-reductions); exact programs bake the
            # sample count and the dataset.
            n_keys if bucketed else num_samples,
            latent,
            iters,
            gtol,
            memory_size,
            restarts,
            restart_scale,
            mesh_descriptor(),
            None if bucketed else self._data_fingerprint,
        )
        if bucketed:
            # Dataset-independent program: share across instances
            # (PERF.md finding 22).
            fn = _shared_jit(
                cache_key + self._bucket_share_key(plan),
                self._transform_pins(),
                lambda: jax.jit(program),
            )
        else:
            fn = self._jit_cache.get(cache_key)
            if fn is None:
                fn = jax.jit(program)
                self._jit_cache[cache_key] = fn

        import time as _time

        t0 = _time.time()
        call_args = (
            self.vs.latent_vector(all_names), x_fit, x_test_in, w_test,
            keys, layer_keys,
        )
        if bucketed:
            call_args = call_args + (
                xs_rows, mt, ms, self._norm_args(self.p, dtype),
            )
        (
            z_final, layer_nll, layer_iters, layer_nll0,
            mean, lowers, uppers, factors,
        ) = fn(*call_args)
        jax.block_until_ready(mean)
        self.vs.set_latent_vector(all_names, z_final)
        if factors is not None:
            # Seed the repeated-serving fast path with the freshly fitted
            # factors (same key _posterior_factors will compute: the store
            # round-trips z_final through NumPy bit-exactly).
            fac_key = (
                self._data_fingerprint,
                self.p,
                mesh_descriptor(),
                np.asarray(z_final).tobytes(),
            )
            self._factor_cache = (fac_key, factors)
        self.last_fit_report = {
            "layer_nll": np.asarray(layer_nll),
            "layer_nll0": np.asarray(layer_nll0),
            "layer_iters": np.asarray(layer_iters),
            "wall_clock_s": _time.time() - t0,
            "fused": True,
            "restarts": restarts,
        }

        mean = self._unpermute_outputs(np.asarray(mean)[:n_test])
        if credible_bounds:
            lowers = self._unpermute_outputs(np.asarray(lowers)[:n_test])
            uppers = self._unpermute_outputs(np.asarray(uppers)[:n_test])
            return mean, lowers, uppers
        return mean

    def logpdf(
        self,
        x,
        y,
        w=None,
        sample_missing=False,
        posterior=False,
        key=None,
        mesh=None,
    ):
        """Logpdf of observations (``gpar/regression.py:461-506``).

        Returns a JAX scalar if ``x`` or ``y`` was a JAX array (the analogue
        of the reference keeping torch inputs attached to the graph),
        otherwise a Python float.
        """
        if mesh is not None:
            with use_mesh(mesh):
                return self.logpdf(
                    x, y, w, sample_missing=sample_missing,
                    posterior=posterior, key=key,
                )
        any_jax = isinstance(x, jax.Array) or isinstance(y, jax.Array)

        # Host inputs stay host-side through permute/transform/renorm
        # (numpy normalisation stats): the scored data is consumed as
        # NumPy below (the NaN plan build), so eager device ops here were
        # pure relay round-trips (PERF.md finding 27).
        x = _uprank_host(x)
        # NOTE(reference parity): the reference applies `_unnormalise_y`
        # here (``gpar/regression.py:483``) — not `_normalise_y` — and adds
        # no Jacobian terms for the transforms.  ``compat=True`` (default)
        # reproduces it literally; ``compat=False`` applies the intended
        # normalisation.
        renorm = self._unnormalise_y if self.compat else self._normalise_y
        y = self._permute_outputs(_uprank_host(y))
        if w is not None:
            w = self._permute_outputs(_uprank_host(w))
        y = renorm(self._transform_y(y))
        if isinstance(y, jax.Array):
            w = _init_weights(w, y)
        elif w is None:
            w = np.ones(np.shape(y), dtype=np.asarray(y).dtype)
        m, p = x.shape[1], y.shape[1]

        if posterior and not self.is_conditioned:
            raise RuntimeError(
                "Cannot evaluate the posterior logpdf: no data has been "
                "conditioned on yet (call fit() or condition() first)."
            )

        y_np, w_np = np.asarray(y), np.asarray(w)
        if posterior:
            self._ensure_vars(self.p)
        else:
            for pi in range(p):
                _construct_gpar(self, self.vs, m, pi + 1).layers[pi]()
        names = self.vs.select(None)
        z = self.vs.latent_vector(names)
        if sample_missing and key is None:
            key = next_key()

        # Scan-fused, shape-bucketed scoring (the production path): the
        # scored data's values/weights/NaN plan ride in as TRACED
        # arguments (fused._ROW_KEYS / pad_plan_rows), so ONE compiled
        # program per (model structure, row bucket) serves every dataset
        # in the size range — a held-out scoring loop over fresh datasets
        # (the standard model-comparison use, ``gpar/regression.py:
        # 461-506``) pays zero per-dataset compiles, and fresh estimator
        # instances share the executable (``_shared_jit``).
        # ``sample_missing`` (needs in-chain draws) stays on the legacy
        # exact-shape program below, as does ``config.shape_buckets=
        # False``.  Under an active mesh the scan programs run inside one
        # shard_map (scored rows sharded, same geometry as the mesh fit)
        # when there are enough rows to shard — the prior chain always,
        # the posterior tail for SPARSE models (replicated cached
        # factors + one psum per layer).  Dense posterior scoring and
        # small-n mesh scoring use the GP-core path, which shards
        # through ``Obs``/``PseudoObs``'s distributed branches.
        from ..config import config as _cfg

        mesh_ok = _cfg.mesh is None or (
            y_np.shape[0]
            >= max(_cfg.shard_min_rows, _cfg.mesh.devices.size)
            and (not posterior or self.sparse)
        )
        if (
            not sample_missing
            and _cfg.scan_predict
            and _cfg.shape_buckets
            and mesh_ok
            and y_np.shape[0] > 0
        ):
            value = self._logpdf_scan(x, y_np, w_np, names, z, posterior)
            if value is not None:
                return value if any_jax else float(value)

        # Legacy exact-shape program: one jitted executable per (data
        # fingerprint, flags) — the NaN mask plan of `y` is static,
        # hyperparameters and `x` are traced.
        def program(z, x, key):
            view = self.vs.with_latent_vector(names, z)
            gpar = _construct_gpar(self, view, m, p)
            if posterior:
                gpar = gpar | (self.x, self._y_cache, None)
            return gpar.logpdf(
                x,
                y_np,
                w_np,
                only_last_layer=False,
                sample_missing=sample_missing,
                key=key,
            )

        cache_key = (
            "logpdf",
            posterior,
            sample_missing,
            x.shape,
            p,
            mesh_descriptor(),
            _fingerprint(y_np, w_np),
            self._data_fingerprint if posterior else None,
        )
        logpdf_fn = self._jit_cache.get(cache_key)
        if logpdf_fn is None:
            logpdf_fn = jax.jit(program)
            self._jit_cache[cache_key] = logpdf_fn
        value = logpdf_fn(z, x, key)

        if not any_jax:
            value = float(value)

        return value

    def _bucket_score_inputs(self, plan, x, y_np, w_np):
        """Padded (bucket size, x, traced per-row plan arrays) for a
        shape-bucketed program over SCORED data (``logpdf``'s argument
        dataset, not the conditioned caches — cf. the cached
        :meth:`_bucket_fit_inputs`).

        Uploads the scored x/y/w once and derives the per-row plan
        arrays ON DEVICE (``fused.device_bucket_inputs`` — 3 transfers +
        1 dispatch instead of 6 uploads incl. the five padded (p, n_b)
        host-built row arrays; PERF.md finding 27)."""
        from ..config import bucket_rows
        from .fused import device_bucket_inputs

        n_b = bucket_rows(plan.n)
        x_pad, xs_rows = device_bucket_inputs(
            np.asarray(x), y_np, w_np, n_b=n_b, impute=bool(self.impute)
        )
        if plan.sparse:
            # Traced like the fit plans': inducing inputs are data-derived
            # in every reference workload (see _bucket_fit_inputs).
            xs_rows = dict(xs_rows)
            xs_rows["x_ind"] = self._x_ind_traced(x_pad.dtype)
        return n_b, x_pad, xs_rows

    def _logpdf_scan(self, x, y_np, w_np, names, z, posterior):
        """Shape-bucketed scan-fused logpdf dispatch (both prior and
        posterior); returns ``None`` when ineligible (the caller falls
        back to the legacy exact-shape program).

        Matches ``gpar/regression.py:461-506`` through
        :func:`fused.make_scan_logpdf_body` (prior chain) /
        :func:`fused.make_scan_posterior_logpdf_tail` (scored data under
        the per-layer posteriors, consuming the cached factors of
        :func:`fused.make_scan_posterior_factors`)."""
        from .fused import (
            build_scan_data_plan,
            make_scan_logpdf_body,
            make_scan_posterior_logpdf_tail,
        )

        plan = build_scan_data_plan(self, np.asarray(x), y_np, w_np, names)
        if posterior and (plan.p != self.p or plan.m != self.m):
            # The factors stack self.p layers over self.m input columns;
            # scoring a different width re-derives through the GP core.
            return None
        n_b, x_pad, xs_rows = self._bucket_score_inputs(plan, x, y_np, w_np)

        if not posterior:
            from ..config import config as _cfg

            jit_key = (
                "logpdf_scan", n_b, plan.m, plan.p, mesh_descriptor(),
            ) + self._bucket_share_key(plan)

            def _build():
                return jax.jit(
                    make_scan_logpdf_body(
                        plan, self.x_ind, rows_traced=True,
                        mesh=_cfg.mesh, shard_axis=_cfg.shard_axis,
                    )
                )

            fn = _shared_jit(jit_key, self._transform_pins(), _build)
            return fn(z, x_pad, xs_rows)

        plan_tr = self._scan_fit_plan(names)
        n_b_tr, _x_tr, xs_rows_tr = self._bucket_fit_inputs(plan_tr)
        if not self._factor_cache_eligible(plan_tr, n_rows=n_b_tr):
            # Dense factor stack over budget (or the cache disabled):
            # re-conditioning per call through the GP core is the
            # reference behaviour (``gpar/regression.py:499``).
            return None
        factors = self._posterior_factors(plan_tr, names, z)
        tr_mask = None if plan.sparse else xs_rows_tr["obs_mask"]
        jit_key = (
            "logpdf_post_scan", n_b, n_b_tr, plan.m, plan.p,
            mesh_descriptor(),
        ) + self._bucket_share_key(plan)

        from ..config import config as _cfg2

        def _build():
            return jax.jit(
                make_scan_posterior_logpdf_tail(
                    plan, self.x_ind, rows_traced=True,
                    mesh=_cfg2.mesh, shard_axis=_cfg2.shard_axis,
                )
            )

        fn = _shared_jit(jit_key, self._transform_pins(), _build)
        return fn(z, factors, x_pad, xs_rows, tr_mask)

    def sample(
        self,
        x,
        w=None,
        p=None,
        posterior=False,
        num_samples=1,
        latent=False,
        key=None,
        mesh=None,
    ):
        """Sample from the prior or posterior
        (``gpar/regression.py:508-564``).

        Returns a single (n, p) array, or a list of them when
        ``num_samples > 1`` (reference convention).

        ``mesh=`` (or an enclosing :func:`gpar_tpu.use_mesh`) shards the
        Monte-Carlo key batch over the device mesh — each chip draws its
        share of the samples.
        """
        import contextlib

        from ..config import config as _cfg

        mesh_ctx = use_mesh(mesh) if mesh is not None else contextlib.nullcontext()
        with mesh_ctx:
            return self._sample_inner(
                x, w, p, posterior, num_samples, latent, key, _cfg.mesh
            )

    def _sample_inner(
        self, x, w, p, posterior, num_samples, latent, key, active_mesh,
        reduce=None,
    ):
        x = _uprank(_to_jnp(x))

        if posterior and not self.is_conditioned:
            raise RuntimeError(
                "Cannot sample from the posterior: no data has been "
                "conditioned on yet (call fit() or condition() first)."
            )
        elif not posterior and p is None:
            raise ValueError("Prior sampling needs `p`, the number of outputs to draw.")

        if w is None:
            w = jnp.ones(
                (x.shape[0], self.p if posterior else p), dtype=x.dtype
            )
        else:
            w = self._permute_outputs(_uprank(_to_jnp(w)), strict=posterior)

        def undo_transforms(y_):
            return self._untransform_y(self._unnormalise_y(y_))

        from ..config import bucket_rows, bucket_samples
        from ..config import config as _cfg

        # Shape bucketing (config.shape_buckets, single-device scan
        # tails): the sample count pads to a bucket up front — safe on
        # every path (surplus draws are masked/sliced before results
        # leave the program; prefix-stable key splitting keeps the real
        # draws identical) — and the test rows pad once the serving path
        # is known below.
        bucket_candidate = bool(_cfg.shape_buckets and _cfg.scan_predict)
        if key is None:
            key = next_key()
        n_keys = num_samples
        if bucket_candidate:
            n_keys = bucket_samples(num_samples)
        if active_mesh is not None:
            # Pad the key batch (after any sample bucketing) to a mesh
            # multiple so each device draws an equal share; surplus samples
            # are dropped (masked in bucketed mode) after the fact.
            size = active_mesh.devices.size
            n_keys = n_keys + (-n_keys) % size
        keys = jax.random.split(key, n_keys)
        if active_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            keys = jax.device_put(
                keys, NamedSharding(active_mesh, PartitionSpec(_cfg.shard_axis))
            )

        # Conditioning + the whole vmapped ancestral sampling chain run as
        # ONE jitted program: per-op dispatch never touches the host, all
        # Gram/Cholesky/solve work fuses into a single XLA computation, and
        # hyperparameters enter as traced arguments so the executable is
        # reusable across fit/predict cycles.  (The reference loops per
        # sample in Python, ``gpar/regression.py:558-563``.)
        from .gpar import _sample_chain

        if posterior:
            # Static mask plan for the closed-downwards conditioning
            # (LAZY: builds on first subscript inside a program trace).
            y_cache = self._y_cache
            m_in, p_out = self.m, self.p
        else:
            m_in, p_out = x.shape[1], p

        names = self.vs.select(None)

        def program(z, x_data, x_test, w_test, keys):
            view = self.vs.with_latent_vector(names, z)
            gpar = _construct_gpar(self, view, m_in, p_out)
            if posterior:
                gpar = gpar | (x_data, y_cache, None)
            models = [mo() for mo in gpar.layers]
            fs = tuple(f for f, _ in models)
            noises = tuple(n for _, n in models)
            x_ind = gpar.x_ind

            def one(k):
                return _sample_chain(
                    fs,
                    noises,
                    x_test,
                    w_test,
                    x_ind,
                    k,
                    latent=latent,
                    replace=self.replace,
                    sparse=self.sparse,
                )

            return jax.vmap(one)(keys)

        # Instantiate variables eagerly before tracing (once per (m, p)).
        if posterior:
            self._ensure_vars(p_out)
        else:
            gpar_warm = _construct_gpar(self, self.vs, m_in, p_out)
            for layer in gpar_warm.layers:
                layer()
        names = self.vs.select(None)
        z = self.vs.latent_vector(names)

        # Scan-fused posterior sampling (replace=True): the whole
        # conditioning + MC chain as one lax.scan over layers —
        # cold-compile O(1) in p (see models/fused.make_scan_predict_tail).
        # Under a mesh the pre-sharded key batch rides through unchanged:
        # the tail's per-layer factors are key-independent (replicated by
        # GSPMD) and the draws/outputs propagate the sample-axis sharding.
        # Single-device scan tails run SHAPE-BUCKETED by default: test
        # rows/samples pad to buckets with the data traced as arguments,
        # so the compiled program serves every dataset in the size range.
        scan_tail = posterior and _cfg.scan_predict
        factors = None
        bucketed = False
        n_b = None
        if scan_tail:
            plan = self._scan_fit_plan(names)
            bucketed = bucket_candidate
            n_b = bucket_rows(self.n) if bucketed else self.n
            if self.replace and self._factor_cache_eligible(plan, n_rows=n_b):
                # Repeated-serving fast path: reuse the per-layer posterior
                # factors across predict/sample calls (the reference
                # re-conditions on every call, ``gpar/regression.py:547``).
                from .fused import make_scan_cached_tail

                factors = self._posterior_factors(plan, names, z)
                tail = make_scan_cached_tail(
                    plan, latent, mesh=_cfg.mesh, rows_traced=bucketed
                )

                if bucketed:

                    def program(z, factors, x_test, w_test, keys, xs_rows, mt):
                        batch, _ = tail(
                            z, factors, x_test, w_test.T, keys, xs_rows, mt
                        )
                        return batch

                else:

                    def program(z, factors, x_test, w_test, keys):
                        batch, _ = tail(z, factors, x_test, w_test.T, keys)
                        return batch

            elif self.replace:
                from .fused import make_scan_predict_tail

                tail = make_scan_predict_tail(
                    plan, self.x_ind, latent, mesh=_cfg.mesh,
                    rows_traced=bucketed,
                )

                if bucketed:

                    def program(z, x_data, x_test, w_test, keys, xs_rows, mt):
                        batch, _ = tail(
                            z, x_data, x_test, w_test.T, keys, xs_rows, mt
                        )
                        return batch

                else:

                    def program(z, x_data, x_test, w_test, keys):
                        batch, _ = tail(z, x_data, x_test, w_test.T, keys)
                        return batch

            elif self._factor_stack_fits(plan, n_rows=n_b):
                # replace=False (the reference-default predictive config):
                # per-sample ancestral chains through ONE lax.scan whose
                # body vmaps the sample axis — cold compile O(1) in p,
                # posterior factors cached across calls when eligible.
                from .fused import (
                    make_scan_ancestral_tail,
                    resolve_sample_chunk,
                )

                nt_chunk = bucket_rows(x.shape[0]) if bucketed else x.shape[0]
                tail = make_scan_ancestral_tail(
                    plan, latent,
                    sample_chunk=resolve_sample_chunk(
                        _cfg.predict_sample_chunk, n_keys, nt_chunk,
                        x.dtype, _cfg.predict_memory_budget,
                    ),
                    mesh=_cfg.mesh, rows_traced=bucketed,
                )
                if self._factor_cache_eligible(plan, n_rows=n_b):
                    factors = self._posterior_factors(plan, names, z)

                    if bucketed:

                        def program(
                            z, factors, x_test, w_test, keys, xs_rows, mt
                        ):
                            return tail(
                                z, factors, x_test, w_test.T, keys,
                                xs_rows, mt,
                            )

                    else:

                        def program(z, factors, x_test, w_test, keys):
                            return tail(z, factors, x_test, w_test.T, keys)

                else:
                    # Cache disabled: compute the factors inside the same
                    # program (the reference re-conditions per call).
                    from .fused import make_scan_posterior_factors

                    factors_fn = make_scan_posterior_factors(
                        plan, self.x_ind, mesh=_cfg.mesh,
                        rows_traced=bucketed,
                    )

                    if bucketed:

                        def program(
                            z, x_data, x_test, w_test, keys, xs_rows, mt
                        ):
                            return tail(
                                z, factors_fn(z, x_data, xs_rows), x_test,
                                w_test.T, keys, xs_rows, mt,
                            )

                    else:

                        def program(z, x_data, x_test, w_test, keys):
                            return tail(
                                z, factors_fn(z, x_data), x_test,
                                w_test.T, keys,
                            )

            else:
                # A dense factor stack too large to materialise: keep the
                # unrolled per-sample chain (same peak memory, O(p)
                # compile).
                scan_tail = False
                bucketed = False

        if not posterior and _cfg.scan_predict:
            # Scan-fused PRIOR sampling: per-sample ancestral chains with
            # zero-mean layers through one lax.scan — cold compile O(1)
            # in p (fused.make_scan_prior_tail; bit-matches the unrolled
            # chain per key).
            from .fused import (
                build_scan_prior_plan,
                make_scan_prior_tail,
                resolve_sample_chunk,
            )

            scan_tail = True
            bucketed = bucket_candidate
            prior_plan = build_scan_prior_plan(
                self, m_in, p_out, names, x.dtype
            )
            nt_chunk = bucket_rows(x.shape[0]) if bucketed else x.shape[0]
            prior_tail = make_scan_prior_tail(
                prior_plan, latent,
                sample_chunk=resolve_sample_chunk(
                    _cfg.predict_sample_chunk, n_keys, nt_chunk,
                    x.dtype, _cfg.predict_memory_budget,
                ),
                mesh=_cfg.mesh,
            )

            if bucketed:

                def program(z, x_data, x_test, w_test, keys, xs_rows, mt):
                    return prior_tail(z, x_test, w_test.T, keys, mt)

            else:

                def program(z, x_data, x_test, w_test, keys):
                    return prior_tail(z, x_test, w_test.T, keys)

        # Padded test inputs + row/sample validity masks (bucketed mode);
        # the per-row plan arrays (training data) ride as traced args.
        nt = x.shape[0]
        if bucketed:
            nt_b = bucket_rows(nt)
            np_dtype = np.dtype(np.asarray(x).dtype)
            if nt_b > nt:
                x_in = jnp.asarray(
                    np.pad(np.asarray(x), ((0, nt_b - nt), (0, 0)))
                )
                w_in = jnp.concatenate(
                    [w, jnp.ones((nt_b - nt, w.shape[1]), dtype=w.dtype)]
                )
            else:
                x_in, w_in = x, w
            mt = jnp.asarray((np.arange(nt_b) < nt).astype(np_dtype))
            ms = jnp.asarray((np.arange(n_keys) < num_samples).astype(np_dtype))
            if posterior:
                _, x_data_in, xs_rows = self._bucket_fit_inputs(plan)
            else:
                x_data_in, xs_rows = None, None
        else:
            nt_b, x_in, w_in = nt, x, w
            mt, ms, xs_rows = None, None, None
            # The exact-shape device copy materialises ONLY for programs
            # that actually consume it (the legacy conditioning chain and
            # the factors-in-program tails) — the cached-factor serving
            # paths never upload it (PERF.md finding 30).
            x_data_in = (
                self.x if (posterior and factors is None) else None
            )

        def finalize(batch, ms, nstats=None):
            # On-device reduction (predict): undo transforms (traced
            # normalisation stats under bucketing — the program must not
            # bake the dataset's mean/std as constants), drop the
            # padding surplus (slice for mesh padding; NaN masking +
            # nan-reductions for sample buckets, keeping the program
            # num_samples-agnostic), then reduce over the sample axis —
            # the host transfer becomes O(n p) instead of O(S n p)
            # (``gpar/regression.py:589-595`` reduces host-side).
            if reduce is None:
                return batch
            batch = self._undo_t(batch, nstats)
            if ms is None:
                batch = batch[:num_samples]
                mean_f, pct_f = jnp.mean, jnp.percentile
            else:
                batch = jnp.where(ms[:, None, None] > 0, batch, jnp.nan)
                mean_f, pct_f = jnp.nanmean, jnp.nanpercentile
            mean = mean_f(batch, axis=0)
            if reduce == "bounds":
                return (
                    mean,
                    pct_f(batch, 2.5, axis=0),
                    pct_f(batch, 100 - 2.5, axis=0),
                )
            return (mean,)

        if bucketed:

            def full_program(
                z, lead, x_test, w_test, keys, xs_rows, mt, ms, nstats
            ):
                return finalize(
                    program(z, lead, x_test, w_test, keys, xs_rows, mt),
                    ms, nstats,
                )

        else:

            def full_program(*args):
                return finalize(program(*args), None)

        cache_key = (
            "sample",
            scan_tail,
            factors is not None,
            bucketed,
            reduce,
            (nt_b, x.shape[1]),
            n_keys,
            None if bucketed else num_samples,
            latent,
            posterior,
            p_out,
            n_b,
            mesh_descriptor(),
            None
            if bucketed
            else (self._data_fingerprint if posterior else None),
        )
        if bucketed:
            # Dataset-independent serving program: share across instances
            # (PERF.md finding 22).
            sample_fn = _shared_jit(
                cache_key
                + self._bucket_share_key(plan if posterior else prior_plan),
                self._transform_pins(),
                lambda: jax.jit(full_program),
            )
        else:
            sample_fn = self._jit_cache.get(cache_key)
            if sample_fn is None:
                sample_fn = jax.jit(full_program)
                self._jit_cache[cache_key] = sample_fn
        lead = factors if factors is not None else x_data_in
        if bucketed:
            out = sample_fn(
                z, lead, x_in, w_in, keys, xs_rows, mt, ms,
                self._norm_args(p_out, np.asarray(x).dtype),
            )
        else:
            out = sample_fn(z, lead, x_in, w_in, keys)
        if reduce is not None:
            out = tuple(
                self._unpermute_outputs(np.asarray(a)[:nt], strict=posterior)
                for a in out
            )
            return out[0] if reduce == "mean" else out
        batch = np.asarray(undo_transforms(out))[:num_samples, :nt]
        # Greedy-ordered layers -> original output columns (prior samples
        # of a different chain length stay in layer order).
        batch = self._unpermute_outputs(batch, strict=posterior)
        samples = [batch[i] for i in range(num_samples)]
        return samples[0] if num_samples == 1 else samples

    def _fit_bucketed(self, scan):
        """Whether the shape-bucketed (rows-traced) form of the scan fit
        body applies: scan bodies only (single-device or mesh — the mesh
        programs pad from the bucket to the device geometry inside the
        trace); the unrolled/batched fallbacks bake the data's NaN plan
        and stay exact-shape."""
        from ..config import config as _cfg

        return bool(scan == "scan" and _cfg.shape_buckets)

    def _bucket_share_key(self, plan):
        """Cross-instance cache-key suffix for a shape-bucketed program:
        the plan's structural fingerprint (everything baked into the
        trace: index maps, gates, config switches — greedy reordering
        included) plus the instance knobs that select code paths inside
        serving programs (``compat``; the transform functions by
        identity, pinned alive by :func:`_shared_jit`)."""
        from .fused import plan_static_fingerprint

        return (
            plan_static_fingerprint(plan),
            self.compat,
            id(self._transform_y),
            id(self._untransform_y),
        )

    def _transform_pins(self):
        return (self._transform_y, self._untransform_y)

    def _x_ind_traced(self, dtype):
        """Device copy of the inducing inputs at ``dtype``, cached per
        dtype (x_ind never changes after construction; an f32 scored-data
        call must not poison the f64 training programs' copy)."""
        dt = jnp.dtype(dtype)
        if self._x_ind_dev is None:
            self._x_ind_dev = {}
        arr = self._x_ind_dev.get(dt)
        if arr is None:
            arr = jnp.asarray(np.asarray(self.x_ind), dtype=dt)
            self._x_ind_dev[dt] = arr
        return arr

    def _scan_fit_plan(self, all_names):
        """The conditioned dataset's scan plan, cached per (dataset,
        variable layout): a fresh ``fit_predict`` request builds the plan
        2-3 times (fit body, posterior factors, serving tail) — the numpy
        work is cheap, but each rebuild re-fetched ``y``/``w`` from the
        device through the relay (PERF.md finding 27)."""
        from .fused import build_scan_fit_plan

        key = (self._data_fingerprint, tuple(all_names))
        slot = self._plan_cache
        if slot is not None and slot[0] == key:
            return slot[1]
        plan = build_scan_fit_plan(self, all_names)
        self._plan_cache = (key, plan)
        return plan

    def _bucket_fit_inputs(self, plan):
        """Padded (bucket size, x, per-row plan arrays) for the
        shape-bucketed scan programs, cached per (dataset, bucket).

        Built ON DEVICE from the already-resident conditioned data
        (``fused.device_bucket_inputs``, one dispatch): the host path
        (``pad_plan_rows`` + five (p, n_b) ``jnp.asarray`` uploads) cost
        seconds of per-fresh-dataset latency through the relay (PERF.md
        finding 27).  Values are oracle-pinned equal
        (``tests/test_buckets.py::test_device_bucket_inputs_match_host``).
        """
        from ..config import bucket_rows
        from .fused import device_bucket_inputs

        n_b = bucket_rows(plan.n)
        key = (self._data_fingerprint, n_b)
        slot = self._bucket_cache
        if slot is not None and slot[0] == key:
            return n_b, slot[1], slot[2]
        x_pad, xs_rows = device_bucket_inputs(
            self._x_np if self._x_np is not None else self.x,
            self._y_np if self._y_np is not None else self.y,
            self._w_np if self._w_np is not None else self.w,
            n_b=n_b,
            impute=bool(self.impute),
        )
        if plan.sparse:
            # Inducing inputs ride as a traced argument too: they are
            # data-derived in every reference workload (linspace over the
            # data range, examples/paper/air_temp.py:33), and baking them
            # as HLO constants would defeat cross-instance reuse via the
            # persistent compile cache.  Device copy cached per dtype
            # (:meth:`_x_ind_traced`).
            xs_rows = dict(xs_rows)
            xs_rows["x_ind"] = self._x_ind_traced(x_pad.dtype)
        self._bucket_cache = (key, x_pad, xs_rows)
        return n_b, x_pad, xs_rows

    def _norm_args(self, p_out, dtype):
        """Output-normalisation statistics as TRACED arguments for the
        shape-bucketed serving programs.  The bucketed cache key drops the
        data fingerprint, so anything data-derived inside the program must
        ride as an argument — including the (1, p) mean/std the serving
        tails unnormalise with (closure-captured stats would be baked as
        HLO constants and replay the PREVIOUS dataset's normalisation on
        reuse).  Identity (0, 1) when ``normalise_y`` is off, keeping the
        program signature uniform."""
        if self.normalise_y and getattr(self, "_norm_stats", None):
            return (
                jnp.asarray(self._norm_stats["means"], dtype=dtype),
                jnp.asarray(self._norm_stats["stds"], dtype=dtype),
            )
        return (
            jnp.zeros((1, p_out), dtype=dtype),
            jnp.ones((1, p_out), dtype=dtype),
        )

    def _undo_t(self, batch, nstats):
        """Model space -> data space: unnormalise (traced stats when the
        bucketed programs thread them, the conditioned closure otherwise)
        then untransform (``gpar/regression.py:589-595`` order)."""
        if nstats is None:
            return self._untransform_y(self._unnormalise_y(batch))
        mu, sd = nstats
        return self._untransform_y(batch * sd + mu)

    @staticmethod
    def _mc_stats(batch, num_samples, ms):
        """On-device Monte-Carlo mean + 95% central bounds over the sample
        axis.  ``ms is None``: slice the surplus (mesh padding) and reduce
        exactly.  With a sample-validity mask ``ms`` (shape bucketing),
        surplus draws become NaN and the nan-reductions see exactly the
        ``num_samples`` real draws — the program stays num_samples-
        agnostic (one executable per sample BUCKET)."""
        if ms is None:
            batch = batch[:num_samples]
            return (
                jnp.mean(batch, axis=0),
                jnp.percentile(batch, 2.5, axis=0),
                jnp.percentile(batch, 100 - 2.5, axis=0),
            )
        batch = jnp.where(ms[:, None, None] > 0, batch, jnp.nan)
        return (
            jnp.nanmean(batch, axis=0),
            jnp.nanpercentile(batch, 2.5, axis=0),
            jnp.nanpercentile(batch, 100 - 2.5, axis=0),
        )

    def _factor_cache_eligible(self, plan, n_rows=None):
        """Whether the posterior-factor cache engages for this model/data.

        Sparse factors are O(p·M²) — always cheap.  Dense factors stack
        the per-layer (n, n) Cholesky factors, O(p·n²) memory, so they are
        gated by ``config.posterior_cache_max_bytes`` (a p=16 / n=10k f32
        stack is ~6.4 GB — bigger than the win).  ``config.posterior_cache
        = False`` disables the cache entirely (every call re-conditions,
        the reference behaviour, ``gpar/regression.py:547``).
        """
        from ..config import config as _cfg

        return _cfg.posterior_cache and self._factor_stack_fits(
            plan, n_rows=n_rows
        )

    def _factor_stack_fits(self, plan, n_rows=None):
        """Whether the per-layer posterior-factor stack is small enough to
        materialise at all (cache or in-program): sparse factors are
        O(p·M²); dense stacks hold p (n, n) Cholesky factors and are
        bounded by ``config.posterior_cache_max_bytes``.  ``n_rows``
        overrides the row count (the padded bucket under shape
        bucketing)."""
        from ..config import config as _cfg

        if plan.sparse:
            return True
        n = plan.n if n_rows is None else n_rows
        itemsize = np.dtype(self._data_dtype()).itemsize
        bytes_needed = plan.p * n * (n + plan.W + 1) * itemsize
        return bytes_needed <= _cfg.posterior_cache_max_bytes

    def _posterior_factors(self, plan, names, z):
        """Per-layer posterior factors for the current (hyperparameters,
        conditioning data), computed at most once per (fit, dataset).

        Keyed by the latent vector's bytes + the data fingerprint, so a
        refit or recondition naturally misses; one slot is kept (the
        previous fit's factors are garbage the moment ``z`` changes).
        """
        key = (
            self._data_fingerprint,
            self.p,
            mesh_descriptor(),
            np.asarray(z).tobytes(),
        )
        slot = self._factor_cache
        if slot is not None and slot[0] == key:
            return slot[1]
        from ..config import config as _cfg
        from .fused import make_scan_posterior_factors

        # Shape-bucketed factors (rows padded, data traced): the compiled
        # factor program is keyed on the bucket, and the factors match
        # the bucketed serving tails' shapes.
        bucketed = self._fit_bucketed("scan")

        def _build():
            return jax.jit(
                make_scan_posterior_factors(
                    plan, self.x_ind, mesh=_cfg.mesh, rows_traced=bucketed
                )
            )

        if bucketed:
            n_b, x_in, xs_rows = self._bucket_fit_inputs(plan)
            jit_key = ("pfactors", self.p, n_b, mesh_descriptor())
            # Dataset-independent program: share across instances
            # (PERF.md finding 22).
            fn = _shared_jit(
                jit_key + self._bucket_share_key(plan),
                self._transform_pins(),
                _build,
            )
        else:
            x_in, xs_rows = self.x, None
            jit_key = (
                "pfactors", self.p, mesh_descriptor(), self._data_fingerprint
            )
            fn = self._jit_cache.get(jit_key)
            if fn is None:
                fn = _build()
                self._jit_cache[jit_key] = fn
        factors = fn(z, x_in, xs_rows) if bucketed else fn(z, x_in)
        self._factor_cache = (key, factors)
        return factors

    def precompute(self):
        """Warm the repeated-serving fast path: compute and cache the
        per-layer posterior factors for the current hyperparameters and
        conditioning data, so the next ``predict``/``sample`` calls skip
        the O(n·m²) (sparse) / O(n³) (dense) conditioning work and only
        run the test-point math.

        Beyond the reference (which re-conditions inside every ``sample``
        call, ``gpar/regression.py:547``); a no-op when the scan serving
        tail does not apply (``config.scan_predict`` off, or a dense
        factor stack over ``config.posterior_cache_max_bytes``).  Both
        ``replace`` modes consume the cache (``make_scan_cached_tail`` /
        ``make_scan_ancestral_tail``).  Factors are invalidated
        automatically by ``fit``/``condition`` (the cache keys on the
        latent vector and the data fingerprint).  Returns True when
        factors were computed (or already cached), False when ineligible.
        """
        from ..config import config as _cfg

        if not self.is_conditioned:
            raise RuntimeError(
                "Cannot precompute posterior factors: no data has been "
                "conditioned on yet (call fit() or condition() first)."
            )
        if not _cfg.scan_predict:
            return False
        self._ensure_vars(self.p)
        names = self.vs.select(None)
        plan = self._scan_fit_plan(names)
        if not self._factor_cache_eligible(plan):
            return False
        self._posterior_factors(plan, names, self.vs.latent_vector(names))
        return True

    def predict(
        self,
        x,
        w=None,
        num_samples=100,
        latent=False,
        credible_bounds=False,
        key=None,
        mesh=None,
    ):
        """Monte-Carlo predictive means (and 95% central credible bounds)
        at new inputs (``gpar/regression.py:566-597``).

        The sample batch never leaves the device: the Monte-Carlo mean and
        percentiles are computed inside the same compiled program as the
        sampling (the reference reduces host-side over a Python list,
        ``gpar/regression.py:589-595``), so the host transfer is O(n·p)
        rather than O(num_samples·n·p) — on a remote-attached chip the
        transfer dominates large-n prediction.  Values match a host-side
        reduction of :meth:`sample` with the same key to float rounding.
        """
        import contextlib

        from ..config import config as _cfg

        mesh_ctx = use_mesh(mesh) if mesh is not None else contextlib.nullcontext()
        with mesh_ctx:
            return self._sample_inner(
                x,
                w,
                None,
                True,
                num_samples,
                latent,
                key,
                _cfg.mesh,
                reduce="bounds" if credible_bounds else "mean",
            )

    def warmup(
        self,
        n,
        p,
        m=1,
        n_test=None,
        num_samples=100,
        latent=False,
        credible_bounds=False,
        paths=None,
        **fit_kwargs,
    ):
        """Pre-compile the shape-bucketed programs for this estimator's
        model structure before any real data arrives.

        TPU-native serving extension with no reference counterpart (the
        reference, ``gpar/regression.py:391-459``, compiles nothing and
        pays its per-call cost every call).  Drives the REAL ``fit`` /
        ``fit_predict`` / ``predict`` machinery on a synthetic
        fully-observed dataset of the given shape, on a scratch estimator
        constructed with this instance's configuration, so the
        cross-instance bucketed-program cache (:func:`_shared_jit`) and
        the persistent XLA compile cache are populated for the containing
        buckets.  A later call on REAL data whose row / test-row / sample
        counts land in the same buckets then reuses the compiled
        executables — zero cold compile at request time.

        The hit does not depend on the real data's values or missingness
        pattern: a bucketed program's data, NaN plan, inducing inputs and
        normalisation statistics all ride in as traced arguments
        (``fused._ROW_KEYS`` / ``fused.plan_static_fingerprint``), so the
        fully-observed synthetic fit traces a byte-identical program.

        Args:
            n (int): Training-row count to warm for (the program covers
                every dataset with ``config.bucket_rows(rows) ==
                config.bucket_rows(n)``).
            p (int): Number of outputs (exact — part of the model
                structure).
            m (int): Number of input features (exact).  Defaults to `1`.
            n_test (int, optional): Test-row count; when given, the
                serving programs (``predict`` tail and fused
                ``fit_predict``) are warmed too.
            num_samples (int): Monte-Carlo sample count for the serving
                programs (bucketed via ``config.bucket_samples``).
            latent (bool): Warm the serving programs in latent mode.
            credible_bounds (bool): Warm the bounds-reducing serving
                programs.
            paths (tuple, optional): Which programs to warm, a subset of
                ``("fit", "predict", "fit_predict", "logpdf")``.
                Defaults to ``("fit", "logpdf")`` without ``n_test`` and
                all four with it.  ``"logpdf"`` warms the bucketed
                scoring programs: the prior chain at the training bucket
                (and the ``n_test`` bucket when given) plus the posterior
                tail and its factor program.
            **fit_kwargs: Optimiser options of the production ``fit`` /
                ``fit_predict`` calls (``iters=``, ``gtol=``,
                ``memory_size=``, ``restarts=``, ``restart_scale=``,
                ``fused=``, ``fix=``) — they are part of the program cache
                key, so they must match the production calls to hit.

        Caveats: greedy ordering cannot be pre-compiled (the permutation
        is data-dependent and changes the programs' gather maps), and a
        custom ``transform_y`` whose inverse maps a standard normal to
        non-finite values needs a user-driven dummy fit instead.

        Returns:
            dict: ``{"buckets": {...}, "seconds": {path: wall_s}}``.
        """
        import time as _time

        from ..config import bucket_rows, bucket_samples
        from ..config import config as _cfg

        if not _cfg.shape_buckets:
            raise RuntimeError(
                "warmup() pre-compiles the shape-bucketed programs; "
                "config.shape_buckets is off, so every dataset compiles "
                "its own exact-shape program and there is nothing to warm."
            )
        if fit_kwargs.pop("greedy", False):
            raise ValueError(
                "warmup() cannot pre-compile a greedy fit: the output "
                "ordering is data-dependent and is baked into the "
                "programs' gather maps."
            )
        fix = fit_kwargs.pop("fix", True)
        if paths is None:
            paths = ("fit", "logpdf") if n_test is None else (
                "fit", "predict", "fit_predict", "logpdf")
        unknown = set(paths) - {"fit", "predict", "fit_predict", "logpdf"}
        if unknown:
            raise ValueError(f"Unknown warmup() paths: {sorted(unknown)}")
        if ("predict" in paths or "fit_predict" in paths) and n_test is None:
            raise ValueError(
                "Warming the serving programs needs n_test=."
            )

        # A scratch estimator with this instance's exact configuration:
        # the shared-cache key includes the transform functions BY
        # IDENTITY, so the scratch must carry the same objects.
        scratch = GPARRegressor(
            replace=self.replace,
            impute=self.impute,
            x_ind=self.x_ind,
            normalise_y=self.normalise_y,
            transform_y=(self._transform_y, self._untransform_y),
            compat=self.compat,
            **self.model_config,
        )

        # Synthetic fully-observed data, mapped through the inverse
        # transform so condition()'s forward transform recovers a
        # well-conditioned standard-normal model-space dataset whatever
        # the user's transform_y is.
        rng = np.random.default_rng(20)
        x_d = rng.uniform(size=(n, m))
        z = 0.5 * rng.standard_normal((n, p))
        y_d = np.asarray(self._untransform_y(jnp.asarray(z)), dtype=float)
        if not np.isfinite(y_d).all():
            raise ValueError(
                "warmup()'s synthetic data is non-finite through this "
                "estimator's inverse transform_y; run a dummy fit with "
                "representative data instead."
            )
        x_t = rng.uniform(size=(n_test, m)) if n_test is not None else None

        fp_keys = (
            "iters", "gtol", "memory_size", "restarts", "restart_scale",
            "fused", "key",
        )
        fp_kwargs = {k: v for k, v in fit_kwargs.items() if k in fp_keys}
        seconds = {}
        if "fit" in paths or "predict" in paths:
            # predict needs fitted state; its warm-fit doubles as the fit
            # program warm.
            t0 = _time.perf_counter()
            scratch.fit(x_d, y_d, fix=fix, **fit_kwargs)
            seconds["fit"] = _time.perf_counter() - t0
        if "logpdf" in paths:
            # Prior chain at the training bucket, plus — with n_test — the
            # scoring bucket and the posterior tail (whose factor program,
            # shared with the repeated-serving path, warms alongside).
            if not scratch.is_conditioned:
                scratch.condition(x_d, y_d)
            t0 = _time.perf_counter()
            scratch.logpdf(x_d, y_d)
            if n_test is not None:
                z_t = 0.5 * rng.standard_normal((n_test, p))
                y_t = np.asarray(
                    self._untransform_y(jnp.asarray(z_t)), dtype=float
                )
                scratch.logpdf(x_t, y_t)
                scratch.logpdf(x_t, y_t, posterior=True)
            else:
                scratch.logpdf(x_d, y_d, posterior=True)
            seconds["logpdf"] = _time.perf_counter() - t0
        if "predict" in paths:
            t0 = _time.perf_counter()
            scratch.predict(
                x_t,
                num_samples=num_samples,
                latent=latent,
                credible_bounds=credible_bounds,
            )
            seconds["predict"] = _time.perf_counter() - t0
        if "fit_predict" in paths:
            t0 = _time.perf_counter()
            scratch.fit_predict(
                x_d,
                y_d,
                x_test=x_t,
                num_samples=num_samples,
                latent=latent,
                credible_bounds=credible_bounds,
                **fp_kwargs,
            )
            seconds["fit_predict"] = _time.perf_counter() - t0

        buckets = {"rows": bucket_rows(n)}
        if n_test is not None:
            buckets["test_rows"] = bucket_rows(n_test)
            buckets["samples"] = bucket_samples(num_samples)
        return {"buckets": buckets, "seconds": seconds}
