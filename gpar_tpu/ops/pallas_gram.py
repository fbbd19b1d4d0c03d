"""Fused pairwise-kernel Gram construction as a Pallas TPU kernel.

The hot op of the dense GP path is building ``K(x, y)`` for a *composite*
kernel — a sum of EQ / RQ / linear / locally-periodic terms (the structure
assembled by the regressor, reference ``gpar/regression.py:92-180``).  The
XLA lowering of the reference-style composition materialises one n x m
intermediate per term; at large n the op is HBM-bound, so fusing all terms
into one tiled output pass is the win.

Design
------
1. ``analyze_kernel`` flattens the kernel tree into a list of *term specs*.
   Every input transform (stretch / periodic embedding / select) is folded
   into a per-term **feature map** computed once outside the kernel
   (O(n d), negligible); products of EQ-like factors merge by feature
   concatenation (``exp(-a)exp(-b) = exp(-(a+b))``); linear weights fold
   into one side's features.  Supported leaves: EQ, RQ, Linear, Const.
2. Each term's features are padded to the 128-lane width, so the per-term
   contraction inside the kernel is a (TM, 128) x (128, TN) matmul — an
   MXU-shaped op even though the logical feature dimension is tiny.
3. One Pallas kernel computes, per (TM, TN) output tile::

       acc = sum_t  w_t * g_t(|u_t|^2 + |v_t|^2 - 2 u_t v_t^T)   (rbf/rq)
           + sum_t  u_t v_t^T                                     (linear)
           + const

   writing the n x m Gram exactly once.

Differentiation: the forward pass is the Pallas kernel; the backward pass
falls back to the VJP of the reference jnp evaluation (`ops.kernels.gram`)
via ``jax.custom_vjp`` — bit-identical gradients, fused forward.

Falls back to the reference evaluation automatically when the tree
contains unsupported structure, when not running on TPU, or for small
problems where fusion cannot pay for itself.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from . import kernels as K

__all__ = ["analyze_kernel", "gram_fused", "supported"]

LANES = 128


class _Term(NamedTuple):
    kind: str  # 'rbf' | 'rq' | 'lin'
    feats: object  # callable x -> (n, d) features
    weight: object  # scalar (traced ok); folded into x-features for 'lin'
    alpha: object  # RQ alpha or None


class _Unsupported(Exception):
    pass


def _collect(k, weight, fmap, terms, const_acc):
    """Walk the kernel tree, carrying the accumulated scalar weight and the
    input feature map ``fmap`` (outermost transforms apply first:
    ``gram(Stretch(k, s), x, y) == gram(k, x/s, y/s)``)."""
    if isinstance(k, K.Sum):
        const_acc = _collect(k.k1, weight, fmap, terms, const_acc)
        const_acc = _collect(k.k2, weight, fmap, terms, const_acc)
        return const_acc
    if isinstance(k, K.Scaled):
        return _collect(k.k, weight * k.scale, fmap, terms, const_acc)
    if isinstance(k, K.Stretch):
        scales = k.scales
        return _collect(
            k.k, weight, lambda x, f=fmap, s=scales: f(x) / s, terms, const_acc
        )
    if isinstance(k, K.Periodic):
        period = k.period

        def embedded(x, f=fmap, p=period):
            return K._embed_periodic(f(x), p)

        return _collect(k.k, weight, embedded, terms, const_acc)
    if isinstance(k, K.Select):
        inds = np.asarray(k.inds, dtype=np.int64)
        return _collect(
            k.k, weight, lambda x, f=fmap, i=inds: f(x)[:, i], terms, const_acc
        )
    if isinstance(k, K.Product):
        # Supported: products whose factors each reduce to a single rbf
        # term (feature concatenation: exp(-a)exp(-b) = exp(-(a+b))) —
        # this covers the locally periodic kernel
        # ``EQ().stretch(s).periodic(p) * EQ().stretch(d)``
        # (``gpar/regression.py:127-129``).
        sub1, sub2 = [], []
        c1 = _collect(k.k1, 1.0, fmap, sub1, 0.0)
        c2 = _collect(k.k2, 1.0, fmap, sub2, 0.0)
        if len(sub1) == 1 and len(sub2) == 1 and not _nonzero(c1) and not _nonzero(c2):
            t1, t2 = sub1[0], sub2[0]
            if t1.kind == "rbf" and t2.kind == "rbf":
                terms.append(
                    _Term(
                        "rbf",
                        lambda x, a=t1.feats, b=t2.feats: jnp.concatenate(
                            [a(x), b(x)], axis=1
                        ),
                        weight * t1.weight * t2.weight,
                        None,
                    )
                )
                return const_acc
        raise _Unsupported(f"product {type(k.k1).__name__} * {type(k.k2).__name__}")
    if isinstance(k, K.EQ):
        terms.append(_Term("rbf", fmap, weight, None))
        return const_acc
    if isinstance(k, K.RQ):
        terms.append(_Term("rq", fmap, weight, k.alpha))
        return const_acc
    if isinstance(k, K.Linear):
        terms.append(_Term("lin", fmap, weight, None))
        return const_acc
    if isinstance(k, K.Const):
        return const_acc + weight * k.value
    if isinstance(k, K.ZeroKernel):
        return const_acc
    raise _Unsupported(type(k).__name__)


def _nonzero(c):
    return not (isinstance(c, float) and c == 0.0)


def analyze_kernel(kernel):
    """Flatten a kernel tree into (terms, const) or None if unsupported."""
    terms = []
    try:
        const = _collect(kernel, 1.0, lambda x: x, terms, 0.0)
    except _Unsupported:
        return None
    if not terms:
        return None
    return terms, const


def supported(kernel):
    return analyze_kernel(kernel) is not None


def _pad_lanes(a):
    d = a.shape[1]
    if d > LANES:
        return None
    if d == LANES:
        return a
    return jnp.pad(a, ((0, 0), (0, LANES - d)))


def _pad_rows(a, mult):
    r = (-a.shape[0]) % mult
    if r == 0:
        return a
    return jnp.pad(a, ((0, r), (0, 0)))


def _gram_kernel_body(kinds, dims, xf_ref, yf_ref, xn_ref, yn_ref, par_ref, out_ref):
    """One (TM, TN) output tile; static python loop over terms.

    ``dims[t]`` is term t's true feature width (static; kept for cost
    modelling).  A VPU per-dimension broadcast variant for narrow terms
    was tried and measured ~2x slower than the MXU contraction (the
    (TM,1)x(1,TN) outer broadcasts cost a relayout per dimension per
    tile), so all terms use the MXU at full (6-pass) precision.
    """
    T = len(kinds)
    acc = None
    for t, kind in enumerate(kinds):
        a = xf_ref[:, t * LANES : (t + 1) * LANES]
        b = yf_ref[:, t * LANES : (t + 1) * LANES]
        dot = jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # MXU defaults to one bfloat16 pass for f32 operands; full
            # precision keeps the fused path on par with the jnp path.
            precision=jax.lax.Precision.HIGHEST,
        )
        if kind == "lin":
            term = dot
        else:
            d2 = xn_ref[:, t : t + 1] + yn_ref[:, t : t + 1].T - 2.0 * dot
            d2 = jnp.maximum(d2, 0.0)
            w = par_ref[t, 0]
            if kind == "rbf":
                term = w * jnp.exp(-0.5 * d2)
            else:  # rq
                alpha = par_ref[t, 1]
                term = w * jnp.exp(-alpha * jnp.log1p(d2 / (2.0 * alpha)))
        acc = term if acc is None else acc + term
    acc = acc + par_ref[0, 2]  # constant offset
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("kinds", "dims", "tm", "tn"))
def _gram_pallas_call(kinds, dims, xf, yf, xn, yn, params, tm, tn):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = len(kinds)
    n_pad, m_pad = xf.shape[0], yf.shape[0]
    grid = (n_pad // tm, m_pad // tn)

    return pl.pallas_call(
        functools.partial(_gram_kernel_body, kinds, dims),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, T * LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, T * LANES), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, T), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(xf, yf, xn, yn, params)


def _prepare(terms, const, x, y, tm, tn):
    """Feature maps -> padded feature/norm/param arrays."""
    kinds = tuple(t.kind for t in terms)
    dims = []
    xf_list, yf_list, xn_list, yn_list, par_list = [], [], [], [], []
    for t in terms:
        u = t.feats(x).astype(jnp.float32)
        v = t.feats(y).astype(jnp.float32)
        dims.append(u.shape[1])
        if t.kind == "lin":
            # Fold the scalar weight into one side.
            u = u * jnp.asarray(t.weight, jnp.float32)
        up = _pad_lanes(u)
        vp = _pad_lanes(v)
        if up is None or vp is None:
            return None
        xf_list.append(up)
        yf_list.append(vp)
        xn_list.append(jnp.sum(u * u, axis=1))
        yn_list.append(jnp.sum(v * v, axis=1))
        par_list.append(
            [
                jnp.asarray(t.weight, jnp.float32),
                jnp.asarray(1.0 if t.alpha is None else t.alpha, jnp.float32),
                jnp.asarray(0.0, jnp.float32),
            ]
        )
    # Constant offset rides in params[0, 2].
    par_list[0][2] = jnp.asarray(const, jnp.float32)

    xf = _pad_rows(jnp.concatenate(xf_list, axis=1), tm)
    yf = _pad_rows(jnp.concatenate(yf_list, axis=1), tn)
    xn = _pad_rows(jnp.stack(xn_list, axis=1), tm)
    yn = _pad_rows(jnp.stack(yn_list, axis=1), tn)
    params = jnp.stack([jnp.stack(p) for p in par_list])
    return kinds, tuple(dims), xf, yf, xn, yn, params


def _gram_fused_fwd_impl(kernel, x, y, tm=256, tn=256):
    parsed = analyze_kernel(kernel)
    if parsed is None:
        return None
    terms, const = parsed
    prep = _prepare(terms, const, x, y, tm, tn)
    if prep is None:
        return None
    kinds, dims, xf, yf, xn, yn, params = prep
    out = _gram_pallas_call(kinds, dims, xf, yf, xn, yn, params, tm, tn)
    return out[: x.shape[0], : y.shape[0]].astype(x.dtype)


@jax.custom_vjp
def _gram_fused(kernel, x, y):
    out = _gram_fused_fwd_impl(kernel, x, y)
    if out is None:  # pragma: no cover — callers check `supported` first
        return K.gram_eval(kernel, x, y)
    return out


def _fwd(kernel, x, y):
    return _gram_fused(kernel, x, y), (kernel, x, y)


def _bwd(res, g):
    kernel, x, y = res
    # Reference VJP: bit-identical gradients through the jnp evaluation.
    _, vjp = jax.vjp(lambda k, a, b: K.gram_eval(k, a, b), kernel, x, y)
    return vjp(g)


_gram_fused.defvjp(_fwd, _bwd)


def gram_fused_or_none(kernel, x, y):
    """Fused Gram or None when the kernel tree is unsupported (the
    dispatch hook in :func:`ops.kernels.gram` falls back then).  Feature
    widths beyond the 128-lane span fall back inside the primal."""
    if analyze_kernel(kernel) is None:
        return None
    return _gram_fused(kernel, x, y)


def gram_fused(kernel, x, y=None):
    """Gram matrix via the fused Pallas kernel, reference fallback
    otherwise.  Use on TPU with float32 inputs; returns the same values as
    :func:`gpar_tpu.ops.kernels.gram` (oracle-tested)."""
    x = jnp.asarray(x)
    y = x if y is None else jnp.asarray(y)
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    if not supported(kernel):
        return K.gram_eval(kernel, x, y)
    return _gram_fused(kernel, x, y)
