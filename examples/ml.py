"""Machine-learning hyperparameter experiment (port of the reference
``examples/paper/ml.py``): learning curves at 5 epochs as outputs, with
cascading 30% dropout of later outputs (closed-downwards missingness).

Run: ``python examples/ml.py [--quick] [--data PICKLE]``
Without ``--data``, a synthetic stand-in with the same structure is used
(the reference reads ``examples/paper/ml_data/data.pickle``).
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running from a checkout without installing


import pickle
import sys

import numpy as np

from gpar_tpu import GPARRegressor
from gpar_tpu.utils import experiment as out
from gpar_tpu.utils.experiment import WorkingDirectory
from gpar_tpu.utils.metrics import smse

if __name__ == "__main__":
    out.report_time = True
    quick = "--quick" in sys.argv
    wd = WorkingDirectory("_experiments", "ml")

    num_outputs = 5
    if "--data" in sys.argv:
        path = sys.argv[sys.argv.index("--data") + 1]
        with open(path, "rb") as f:
            results = pickle.load(f, encoding="latin1")
        output_indices = [0, 5, 10, 15, 20]
        params = list(results.keys())
        x = np.array([list(p) for p in params])
        y = np.array(
            [np.take(results[p]["val_loss"], output_indices) for p in params]
        )
    else:
        # Synthetic stand-in: 6 hyperparameters -> decaying loss curves.
        # The targets depend smoothly on the final feature values (incl.
        # the wide-range "log learning rate" column) so the curves are
        # learnable from x, as the real grid-search data is.
        rng = np.random.default_rng(0)
        n = 200
        x = rng.uniform(-1, 1, size=(n, 6))
        # Column 3 plays the "log learning rate"; like the real grid-search
        # features it lives on a comparable (unit-ish) scale — the
        # reference config's scale=0.1 initial lengthscale cannot adapt to
        # an arbitrarily wide column within the optimisation budget.
        lr_term = np.exp(-(((x[:, 3] - 0.2) / 0.4) ** 2))  # sweet spot ~0.2
        quality = 1.2 - 0.6 * lr_term + 0.3 * np.tanh(
            x[:, [0, 1, 2, 4, 5]] @ rng.normal(size=5)
        )
        epochs = np.array([1, 6, 11, 16, 21], dtype=float)
        y = quality[:, None] * (1.0 + 2.0 * np.exp(-epochs[None, :] / 8.0))
        y += 0.05 * rng.standard_normal(y.shape)

    # Filter extreme points (reference examples/paper/ml.py:28-33).
    max_error_at_0 = 5
    min_log_learning_rate = -10
    keep = np.logical_and(x[:, 3] > min_log_learning_rate, y[:, 0] < max_error_at_0)
    x, y = x[keep, :], y[keep, :]

    # Random train/test split (reference examples/paper/ml.py:35-40).
    i_split = int(np.round(0.6 * y.shape[0]))
    perm = np.random.permutation(y.shape[0])
    inds_train, inds_test = perm[:i_split], perm[i_split:]
    x_train, x_test = x[inds_train], x[inds_test]
    y_train, y_test = y[inds_train].copy(), y[inds_test]

    # Cascading 30% dropout (reference examples/paper/ml.py:42-53).
    prob_drop = 0.3
    indices_remain = np.arange(y_train.shape[0])
    for i in range(1, num_outputs):
        n_rem = len(indices_remain)
        perm = np.random.permutation(n_rem)[: int(np.round(prob_drop * n_rem))]
        indices_drop = indices_remain[perm]
        indices_remain = np.array(
            sorted(set(indices_remain) - set(indices_drop))
        )
        y_train[indices_drop, i:] = np.nan

    iters = 10 if quick else 100
    num_samples = 20 if quick else 100

    # Reference config (examples/paper/ml.py:56-66).  Initial lengthscales
    # are set per-column relative to each hyperparameter's range (the
    # reference's scalar 0.1 presumes comparably-scaled columns; the grid
    # columns here span anywhere from 0.6 to 400 units).
    scale_init = 0.1 if "--data" not in sys.argv else 0.2 * (
        x_train.max(axis=0) - x_train.min(axis=0)
    )
    model = GPARRegressor(
        scale=scale_init,
        linear=True,
        linear_scale=100.0,
        nonlinear=True,
        nonlinear_scale=1.0,
        noise=0.01,
        impute=True,
        replace=True,
        normalise_y=True,
    )
    model.fit(x_train, y_train, iters=iters)
    means = model.predict(x_test, num_samples=num_samples, latent=True)

    out.kv("Remaining", np.sum(~np.isnan(y_train), axis=0))
    out.kv("SMSE", smse(means, y_test))
    if "--check" in sys.argv:
        # Golden envelope for the seeded stand-in (--quick; measured mean
        # 0.845 on CPU f64 — the 30% cascading-dropout curves task is hard
        # at the quick budget, so the gate pins "clearly beats the mean
        # predictor" rather than a tight value).
        out.check_metric("ml mean SMSE", np.nanmean(smse(means, y_test)), 0.95)
    wd.save({"means": means, "y_test": y_test}, "ml.pickle")
