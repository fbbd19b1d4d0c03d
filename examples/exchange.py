"""Exchange-rates experiment (port of the reference
``examples/paper/exchange.py``): 13 outputs, RQ kernels, train-mean
standardised SMSE.

Run: ``python examples/exchange.py [--quick] [--data-dir DIR]``
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running from a checkout without installing


import sys

import numpy as np

from gpar_tpu import GPARRegressor
from gpar_tpu.utils import experiment as out
from gpar_tpu.utils.data import load_exchange
from gpar_tpu.utils.experiment import WorkingDirectory
from gpar_tpu.utils.metrics import smse_train_mean

if __name__ == "__main__":
    out.report_time = True
    quick = "--quick" in sys.argv
    data_dir = None
    if "--data-dir" in sys.argv:
        data_dir = sys.argv[sys.argv.index("--data-dir") + 1]
    wd = WorkingDirectory("_experiments", "exchange")

    x, y_train, y_test, columns = load_exchange(data_dir)

    iters = 20 if quick else 200
    num_samples = 50 if quick else 200

    # Reference config (examples/paper/exchange.py:21-31): RQ kernels on.
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
    model.fit(x, y_train, iters=iters)
    means, lowers, uppers = model.predict(
        x, num_samples=num_samples, credible_bounds=True, latent=False
    )

    # Train-mean-standardised SMSE (examples/paper/exchange.py:37-45).
    train_means = np.nanmean(y_train, axis=0)
    scores = smse_train_mean(means, y_test, train_means)
    for name, s in zip(columns, scores):
        if np.isfinite(s):
            out.kv(f"SMSE {name}", s)
    out.kv("Average SMSE", np.nanmean(scores))
    if "--check" in sys.argv:
        # Golden envelope for the seeded synthetic stand-in (--quick;
        # measured 0.011 on CPU f64 — ~13x margin for platform drift).
        out.check_metric("exchange mean SMSE", np.nanmean(scores), 0.15)
    wd.save(
        {"x": x, "means": means, "lowers": lowers, "uppers": uppers},
        "exchange.pickle",
    )
