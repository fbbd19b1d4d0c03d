"""Fused Pallas Gram kernel vs the reference jnp evaluation.

On CPU the kernel runs in interpreter mode (pallas ``interpret=True`` via
``force_tpu_interpret_mode``); on TPU the same tests exercise the compiled
kernel.  Values must match ``ops.kernels.gram`` to float32 accuracy, and
gradients are routed through the reference VJP (bit-identical).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_tpu.ops import EQ, RQ, Const, Linear, gram
from gpar_tpu.ops.pallas_gram import analyze_kernel, gram_fused, supported

from .util import approx

rng = np.random.default_rng(13)


def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def _x(n, d):
    return jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)


def test_analyze_simple():
    k = 2.0 * EQ().stretch(jnp.ones(3))
    terms, const = analyze_kernel(k)
    assert len(terms) == 1 and terms[0].kind == "rbf"

    k = EQ() + Linear() + Const(jnp.asarray(1.5))
    terms, const = analyze_kernel(k)
    assert sorted(t.kind for t in terms) == ["lin", "rbf"]
    assert float(const) == 1.5


def test_analyze_periodic_product():
    d = 2
    k = 1.3 * (
        EQ().stretch(jnp.ones(2 * d)).periodic(jnp.ones(d)) * EQ().stretch(jnp.ones(d))
    )
    terms, const = analyze_kernel(k)
    assert len(terms) == 1 and terms[0].kind == "rbf"


def test_analyze_regressor_composition():
    # The exact composition the regressor builds
    # (gpar/regression.py:176-179).
    m_inds, p_inds = [0, 1], [2, 3]
    k_in = 1.2 * EQ().stretch(jnp.ones(2)) + Linear().stretch(jnp.ones(2)) + Const(
        jnp.asarray(0.5)
    )
    k_out = Linear().stretch(jnp.ones(2)) + 0.7 * RQ(jnp.asarray(0.5)).stretch(
        jnp.ones(2)
    )
    k = k_in.select(m_inds) + k_out.select(p_inds)
    assert supported(k)


@pytest.mark.parametrize(
    "build",
    [
        lambda d: EQ(),
        lambda d: 1.7 * EQ().stretch(jnp.asarray(rng.uniform(0.5, 2, d), jnp.float32)),
        lambda d: RQ(jnp.asarray(0.8, jnp.float32)),
        lambda d: Linear().stretch(jnp.asarray(rng.uniform(0.5, 2, d), jnp.float32)),
        lambda d: 2.0 * EQ() + Linear() + Const(jnp.asarray(0.3, jnp.float32)),
        lambda d: 0.5
        * (
            EQ()
            .stretch(jnp.asarray(rng.uniform(0.5, 2, 2 * d), jnp.float32))
            .periodic(jnp.asarray(rng.uniform(0.5, 2, d), jnp.float32))
            * EQ().stretch(jnp.asarray(rng.uniform(5, 10, d), jnp.float32))
        ),
    ],
    ids=["eq", "scaled-stretch-eq", "rq", "lin", "sum", "periodic"],
)
def test_fused_matches_reference(build):
    d = 2
    x = _x(37, d)
    y = _x(23, d)
    k = build(d)
    expected = gram(k, x, y)
    with _interpret():
        got = gram_fused(k, x, y)
    assert got.shape == expected.shape
    approx(got, expected, rtol=1e-5, atol=1e-5)


def test_fused_square_and_vector_input():
    x = jnp.asarray(rng.normal(size=17), dtype=jnp.float32)
    k = EQ()
    with _interpret():
        got = gram_fused(k, x)
    approx(got, gram(k, x[:, None], x[:, None]), rtol=1e-5, atol=1e-6)


def test_fused_gradients_match_reference():
    d = 2
    x = _x(16, d)
    y = _x(16, d)

    def loss_fused(log_scale):
        k = jnp.exp(log_scale) * EQ()
        with _interpret():
            return jnp.sum(gram_fused(k, x, y))

    def loss_ref(log_scale):
        k = jnp.exp(log_scale) * EQ()
        return jnp.sum(gram(k, x, y))

    g1 = jax.grad(loss_fused)(jnp.asarray(0.3, jnp.float32))
    g2 = jax.grad(loss_ref)(jnp.asarray(0.3, jnp.float32))
    approx(g1, g2, rtol=1e-5, atol=1e-6)


def test_unsupported_falls_back():
    # RQ * RQ products are not fusable; must silently fall back.
    k = RQ(jnp.asarray(0.5)) * RQ(jnp.asarray(0.7))
    assert not supported(k)
    x = _x(8, 1)
    approx(gram_fused(k, x, x), gram(k, x, x), rtol=1e-5, atol=1e-6)
