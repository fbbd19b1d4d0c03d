"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gpar_tpu.gp import GP
from gpar_tpu.ops import EQ, gram, kdiag, titsias_elbo
from gpar_tpu.parallel.sharded import (
    make_mesh,
    pad_rows,
    sharded_sample_batch,
    sharded_titsias_elbo,
)

from .util import approx

rng = np.random.default_rng(7)


def _cpu_mesh(n=8):
    return make_mesh(n, devices=jax.devices("cpu"))


def test_mesh_has_8_devices():
    mesh = _cpu_mesh()
    assert mesh.devices.size == 8


def test_sharded_titsias_matches_single_device():
    n, m, d = 48, 6, 2
    x = jnp.asarray(rng.normal(size=(n, d)))
    z = jnp.asarray(rng.normal(size=(m, d)))
    y = jnp.asarray(rng.normal(size=n))
    noise = jnp.asarray(rng.uniform(0.05, 0.2, size=n))
    kern = 1.3 * EQ().stretch(jnp.asarray([0.9, 1.4]))

    expected = titsias_elbo(
        gram(kern, z, z), gram(kern, z, x), kdiag(kern, x), y, jnp.zeros(n), noise
    )

    mesh = _cpu_mesh()
    got = sharded_titsias_elbo(kern, z, x, y, noise, jnp.ones(n), mesh)
    approx(got, expected, atol=1e-8)


def test_sharded_titsias_with_padding():
    n, m, d = 43, 5, 1  # 43 is not divisible by 8
    x = jnp.asarray(rng.normal(size=(n, d)))
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    y = jnp.asarray(rng.normal(size=n))
    noise = jnp.asarray(rng.uniform(0.05, 0.2, size=n))
    kern = EQ()

    expected = titsias_elbo(
        gram(kern, z, z), gram(kern, z, x), kdiag(kern, x), y, jnp.zeros(n), noise
    )

    mesh = _cpu_mesh()
    xp, mask = pad_rows(x, 8)
    yp, _ = pad_rows(y, 8)
    noisep, _ = pad_rows(noise, 8, value=1.0)  # avoid log(0) on padding
    got = sharded_titsias_elbo(kern, z, xp, yp, noisep, mask, mesh)
    approx(got, expected, atol=1e-8)


def test_sharded_titsias_grad():
    # Hyperparameter gradients must flow through the sharded ELBO (this is
    # the distributed training objective).
    n, m = 32, 4
    x = jnp.asarray(rng.normal(size=(n, 1)))
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    y = jnp.asarray(rng.normal(size=n))
    mesh = _cpu_mesh()

    def obj(log_scale):
        kern = EQ().stretch(jnp.exp(log_scale))
        return -sharded_titsias_elbo(
            kern, z, x, y, jnp.full(n, 0.1), jnp.ones(n), mesh
        )

    g = jax.grad(obj)(jnp.asarray(0.0))
    assert np.isfinite(float(g))

    def obj_ref(log_scale):
        kern = EQ().stretch(jnp.exp(log_scale))
        return -titsias_elbo(
            gram(kern, z, z),
            gram(kern, z, x),
            kdiag(kern, x),
            y,
            jnp.zeros(n),
            jnp.full(n, 0.1),
        )

    approx(g, jax.grad(obj_ref)(jnp.asarray(0.0)), atol=1e-8)


def test_sharded_sample_batch():
    x = jnp.asarray(rng.normal(size=(6, 1)))
    f = GP(EQ())

    def one(key):
        return f(x, 0.1).sample(key)

    mesh = _cpu_mesh()
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    out = sharded_sample_batch(one, keys, mesh)
    assert out.shape == (16, 6, 1)
    # Must equal the unsharded vmap with the same keys.
    expected = jax.vmap(one)(keys)
    approx(out, expected, atol=1e-10)
