"""Checkpoint round-trip tests."""

import numpy as np

from gpar_tpu import GPARRegressor
from gpar_tpu.utils import checkpoint

from .util import approx

rng = np.random.default_rng(11)


def test_state_roundtrip_unconditioned(tmp_path):
    reg = GPARRegressor(scale=0.5, nonlinear=True, markov=1, noise=0.05)
    x = rng.normal(size=(10, 2))
    reg.sample(x, p=2)  # instantiate variables
    path = str(tmp_path / "model.pkl")
    checkpoint.save(reg, path)
    reg2 = checkpoint.load(path)
    assert reg2.model_config == reg.model_config
    assert reg2.vs.names == reg.vs.names
    for name in reg.vs.names:
        approx(reg2.vs[name], reg.vs[name], atol=1e-12)


def test_state_roundtrip_conditioned_predictions_match(tmp_path):
    import jax

    reg = GPARRegressor(
        scale=1.0, linear=True, nonlinear=False, noise=0.05, impute=False,
        normalise_y=True,
    )
    x = np.linspace(0, 5, 12)
    y = reg.sample(x, p=2, key=jax.random.PRNGKey(0))
    reg.fit(x, y, iters=3)

    path = str(tmp_path / "model.pkl")
    checkpoint.save(reg, path)
    reg2 = checkpoint.load(path)

    key = jax.random.PRNGKey(7)
    pred1 = reg.predict(x, num_samples=10, key=key)
    pred2 = reg2.predict(x, num_samples=10, key=key)
    approx(pred1, pred2, atol=1e-8)

    lp1 = reg.logpdf(x, y)
    lp2 = reg2.logpdf(x, y)
    approx(lp1, lp2, atol=1e-8)
