"""Air-temperature experiment (port of the reference
``examples/paper/air_temp.py``): the large-data config — inducing points,
raised jitter, D-GPAR-L-NL, pickled predictions.

Run: ``python examples/air_temp.py [size] [--quick] [--data-dir DIR]``
(size in {0, 1, 2} selects 10/15/31 days, as in the reference,
``examples/paper/air_temp.py:23-27``).
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running from a checkout without installing


import sys

import numpy as np

import gpar_tpu
from gpar_tpu import GPARRegressor
from gpar_tpu.utils import experiment as out
from gpar_tpu.utils.data import load_air_temp
from gpar_tpu.utils.experiment import WorkingDirectory
from gpar_tpu.utils.metrics import smse

if __name__ == "__main__":
    # Raised Cholesky jitter for this ill-conditioned problem (the
    # reference sets B.epsilon = 1e-6, examples/paper/air_temp.py:18).
    gpar_tpu.config.epsilon = 1e-6
    out.report_time = True
    quick = "--quick" in sys.argv
    data_dir = None
    if "--data-dir" in sys.argv:
        data_dir = sys.argv[sys.argv.index("--data-dir") + 1]
    args = [a for a in sys.argv[1:] if not a.startswith("--") and a.isdigit()]
    d_size = int(args[0]) if args else 0
    wd = WorkingDirectory("_experiments", "air_temp")

    x_all, x_train_t, y_train, tests = load_air_temp(data_dir, size=d_size)

    # Inducing points evenly spaced (examples/paper/air_temp.py:26-31).
    n_ind = [10 * 10 + 1, 10 * 15 + 1, 10 * 31 + 1][d_size]
    x_ind = np.linspace(x_all.min(), x_all.max(), n_ind)

    iters = 10 if quick else 100
    num_samples = 20 if quick else 50

    # D-GPAR-L-NL (examples/paper/air_temp.py:35-46).
    model = GPARRegressor(
        scale=0.2,
        linear=True,
        linear_scale=10.0,
        nonlinear=True,
        nonlinear_scale=1.0,
        noise=0.1,
        impute=True,
        replace=True,
        normalise_y=True,
        x_ind=x_ind,
    )
    model.fit(x_train_t, y_train, iters=iters)

    preds = []
    chunk_smses = []
    for i, (x_t, y_t) in enumerate(tests):
        pred = model.predict(
            x_t, num_samples=num_samples, credible_bounds=True, latent=False
        )
        preds.append(pred)
        s = np.nanmean(smse(pred[0], y_t))
        chunk_smses.append(s)
        out.kv(f"SMSE test chunk {i}", s)

    if "--check" in sys.argv:
        # Golden envelope for the seeded synthetic stand-in (--quick;
        # measured 0.011/0.009 on CPU f64 — ~13x margin).
        out.check_metric("air_temp mean SMSE", np.nanmean(chunk_smses), 0.15)
    wd.save(preds, f"results{d_size}.pickle")
