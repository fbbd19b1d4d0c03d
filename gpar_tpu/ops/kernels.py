"""Kernel algebra as a JAX pytree combinator tree.

This replaces the ``stheno`` kernels used by the reference at
``gpar/regression.py:92-180`` (``EQ``, ``RQ``, ``Linear``, ``ZeroKernel``,
scalar variances, sums, products, ``.stretch``, ``.periodic``, ``.select``).
Kernels are frozen dataclasses registered as pytrees: hyperparameters are
leaves (traced under ``jit``/``grad``), structure is static.  Evaluation is
a small recursive interpreter (`gram`, `kdiag`) that lowers everything to
MXU-friendly dense ops — squared distances via the
``|x|^2 + |y|^2 - 2 x y^T`` matmul identity so XLA tiles the dominant cost
onto the systolic array and fuses the elementwise tails.

Input-transform combinators (``Stretch``, ``Periodic``, ``Select``) are
implemented as *input* rewrites applied before leaf evaluation, which is both
how stheno composes them semantically and the layout XLA fuses best.
"""

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config

__all__ = [
    "Kernel",
    "gram_eval",
    "EQ",
    "RQ",
    "Linear",
    "Const",
    "ZeroKernel",
    "Sum",
    "Product",
    "Scaled",
    "Stretch",
    "Periodic",
    "Select",
    "Gate",
    "gram",
    "kdiag",
    "sq_dists",
]


def _register(cls, meta_fields=()):
    """Register a kernel dataclass as a pytree with given static fields."""
    fields = [f.name for f in dataclasses.fields(cls)]
    data_fields = [f for f in fields if f not in meta_fields]
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=list(meta_fields)
    )
    return cls


def _asparam(v):
    return jnp.asarray(v)


class Kernel:
    """Base class providing the combinator algebra.

    Mirrors the composition surface used by the reference at
    ``gpar/regression.py:110,127-138,146,166,178``.
    """

    # -- algebra ----------------------------------------------------------
    def __add__(self, other):
        other = _coerce(other)
        if isinstance(other, ZeroKernel):
            return self
        if isinstance(self, ZeroKernel):
            return other
        return Sum(self, other)

    __radd__ = __add__

    def __mul__(self, other):
        if isinstance(other, Kernel):
            if isinstance(self, ZeroKernel) or isinstance(other, ZeroKernel):
                return ZeroKernel()
            return Product(self, other)
        if isinstance(self, ZeroKernel):
            return ZeroKernel()
        return Scaled(self, _asparam(other))

    def __rmul__(self, other):
        return self.__mul__(other)

    def stretch(self, scales):
        """Divide inputs by per-dimension length scales."""
        return Stretch(self, _asparam(scales))

    def periodic(self, period):
        """Map each input dim to a (cos, sin) pair with the given period,
        then apply this kernel in the embedded (2m-dim) space.

        Note the embedding doubles dimensionality, which is why the
        reference initialises ``per_scale`` with length ``2*m``
        (``gpar/regression.py:115-118``).
        """
        return Periodic(self, _asparam(period))

    def select(self, inds):
        """Restrict the kernel to a subset of input columns
        (``gpar/regression.py:178``)."""
        return Select(self, tuple(int(i) for i in inds))

    def gate(self, gates):
        """Multiply input columns by a (traced) 0/1 gate vector — the
        shape-uniform analogue of :meth:`select`: a gated-out dimension
        contributes exactly nothing to EQ/RQ distances, linear inner
        products, or periodic embeddings, but the input width stays fixed.
        This is what lets the fused fit run all layers through ONE
        ``lax.scan`` body (different layers = different gate values, same
        shapes) instead of one compiled body per layer."""
        return Gate(self, _asparam(gates))

    # -- evaluation -------------------------------------------------------
    def __call__(self, x, y=None):
        x = _upcol(x)
        y = x if y is None else _upcol(y)
        return gram(self, x, y)

    def elwise(self, x):
        return kdiag(self, _upcol(x))


def _coerce(v):
    if isinstance(v, Kernel):
        return v
    return Const(_asparam(v))


def _upcol(x):
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    return x


@_register
@dataclass(frozen=True)
class EQ(Kernel):
    """Exponentiated quadratic: ``k(x, y) = exp(-1/2 |x - y|^2)``."""


@_register
@dataclass(frozen=True)
class RQ(Kernel):
    """Rational quadratic: ``k(x, y) = (1 + |x-y|^2 / (2 alpha))^(-alpha)``.

    ``alpha`` is bounded to ``[1e-3, 1e3]`` by the regressor
    (``gpar/regression.py:107``)."""

    alpha: jnp.ndarray


@_register
@dataclass(frozen=True)
class Linear(Kernel):
    """Dot-product kernel: ``k(x, y) = x . y``."""


@_register
@dataclass(frozen=True)
class Const(Kernel):
    """Constant kernel: ``k(x, y) = value`` (used for the ``+ const`` term
    of the input-linear kernel, ``gpar/regression.py:138``)."""

    value: jnp.ndarray


@_register
@dataclass(frozen=True)
class ZeroKernel(Kernel):
    """Additive identity (``gpar/regression.py:94-95``)."""


@_register
@dataclass(frozen=True)
class Sum(Kernel):
    k1: Kernel
    k2: Kernel


@_register
@dataclass(frozen=True)
class Product(Kernel):
    k1: Kernel
    k2: Kernel


@_register
@dataclass(frozen=True)
class Scaled(Kernel):
    k: Kernel
    scale: jnp.ndarray


@_register
@dataclass(frozen=True)
class Stretch(Kernel):
    k: Kernel
    scales: jnp.ndarray


@_register
@dataclass(frozen=True)
class Periodic(Kernel):
    k: Kernel
    period: jnp.ndarray


@dataclass(frozen=True)
class Select(Kernel):
    k: Kernel
    inds: tuple


_register(Select, meta_fields=("inds",))


@_register
@dataclass(frozen=True)
class Gate(Kernel):
    """Input rewrite ``x -> x * gates`` (see :meth:`Kernel.gate`)."""

    k: Kernel
    gates: jnp.ndarray


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def sq_dists(x, y):
    """Pairwise squared Euclidean distances via the matmul identity.

    ``|x_i - y_j|^2 = |x_i|^2 + |y_j|^2 - 2 x_i . y_j`` — one (n, m, d)
    contraction on the MXU instead of an O(n m d) broadcast subtract.
    Clamped at zero to guard against cancellation.
    """
    x2 = jnp.sum(x * x, axis=-1)[:, None]
    y2 = jnp.sum(y * y, axis=-1)[None, :]
    # Full-precision contraction: the TPU MXU defaults to bfloat16 passes
    # for float32 operands, which costs ~1e-2 absolute error in Gram
    # entries — fatal downstream where Cholesky jitter is 1e-6.
    xy = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def _embed_periodic(x, period):
    """Per-dimension (cos, sin) embedding, interleaved as
    ``[cos x_0, sin x_0, cos x_1, sin x_1, ...]``."""
    theta = 2.0 * jnp.pi * x / period
    c, s = jnp.cos(theta), jnp.sin(theta)
    n, d = x.shape
    return jnp.stack([c, s], axis=-1).reshape(n, 2 * d)


def gram(k, x, y):
    """Evaluate the full pairwise kernel matrix ``k(x, y)`` of shape (n, m).

    Dispatches to the fused Pallas kernel (``ops/pallas_gram.py``) when
    running on TPU with float32 inputs and a supported kernel tree — one
    tiled output pass instead of one n x m intermediate per term — and
    falls back to the reference jnp recursion (:func:`gram_eval`)
    otherwise.
    """
    fast = _maybe_fused(k, x, y)
    if fast is not None:
        return fast
    return gram_eval(k, x, y)


def _pallas_gram_active():
    """The auto gate: fused Gram only when the default execution target is
    a real TPU (tests pin jax_default_device to CPU, which disables it)."""
    import jax

    mode = getattr(config, "use_pallas_gram", "auto")
    if mode is False:
        return False
    if mode is True:
        return True
    if jax.default_backend() != "tpu":
        return False
    dd = jax.config.jax_default_device
    return dd is None or getattr(dd, "platform", "tpu") == "tpu"


def _maybe_fused(k, x, y):
    if x.ndim != 2 or y.ndim != 2 or x.dtype != jnp.float32:
        return None
    if x.shape[0] * y.shape[0] < getattr(config, "pallas_gram_min_size", 262144):
        return None
    if not _pallas_gram_active():
        return None
    from .pallas_gram import gram_fused_or_none

    return gram_fused_or_none(k, x, y)


def gram_eval(k, x, y):
    """Reference jnp evaluation of the kernel tree (recursion over the
    combinators); also the gradient path of the fused kernel."""
    if isinstance(k, Sum):
        return gram_eval(k.k1, x, y) + gram_eval(k.k2, x, y)
    if isinstance(k, Product):
        return gram_eval(k.k1, x, y) * gram_eval(k.k2, x, y)
    if isinstance(k, Scaled):
        return k.scale * gram_eval(k.k, x, y)
    if isinstance(k, Stretch):
        return gram_eval(k.k, x / k.scales, y / k.scales)
    if isinstance(k, Periodic):
        return gram_eval(k.k, _embed_periodic(x, k.period), _embed_periodic(y, k.period))
    if isinstance(k, Select):
        inds = np.asarray(k.inds, dtype=np.int64)
        return gram_eval(k.k, x[:, inds], y[:, inds])
    if isinstance(k, Gate):
        return gram_eval(k.k, x * k.gates, y * k.gates)
    if isinstance(k, EQ):
        return jnp.exp(-0.5 * sq_dists(x, y))
    if isinstance(k, RQ):
        return (1.0 + sq_dists(x, y) / (2.0 * k.alpha)) ** (-k.alpha)
    if isinstance(k, Linear):
        return jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    if isinstance(k, Const):
        dt = jnp.result_type(x.dtype, jnp.asarray(k.value).dtype)
        return jnp.broadcast_to(
            jnp.asarray(k.value, dtype=dt), (x.shape[0], y.shape[0])
        )
    if isinstance(k, ZeroKernel):
        return jnp.zeros((x.shape[0], y.shape[0]), dtype=x.dtype)
    raise TypeError(f"Unknown kernel type: {type(k)!r}")


def kdiag(k, x):
    """Evaluate the kernel's diagonal ``k(x_i, x_i)`` of shape (n,).

    Needed by the Titsias ELBO trace term (reference semantics at
    ``gpar/model.py:286-289``) without building the full n x n Gram.
    """
    if isinstance(k, Sum):
        return kdiag(k.k1, x) + kdiag(k.k2, x)
    if isinstance(k, Product):
        return kdiag(k.k1, x) * kdiag(k.k2, x)
    if isinstance(k, Scaled):
        return k.scale * kdiag(k.k, x)
    if isinstance(k, Stretch):
        return kdiag(k.k, x / k.scales)
    if isinstance(k, Periodic):
        return kdiag(k.k, _embed_periodic(x, k.period))
    if isinstance(k, Select):
        inds = np.asarray(k.inds, dtype=np.int64)
        return kdiag(k.k, x[:, inds])
    if isinstance(k, Gate):
        return kdiag(k.k, x * k.gates)
    if isinstance(k, (EQ, RQ)):
        return jnp.ones(x.shape[0], dtype=x.dtype)
    if isinstance(k, Linear):
        return jnp.sum(x * x, axis=-1)
    if isinstance(k, Const):
        dt = jnp.result_type(x.dtype, jnp.asarray(k.value).dtype)
        return jnp.broadcast_to(jnp.asarray(k.value, dtype=dt), (x.shape[0],))
    if isinstance(k, ZeroKernel):
        return jnp.zeros(x.shape[0], dtype=x.dtype)
    raise TypeError(f"Unknown kernel type: {type(k)!r}")
