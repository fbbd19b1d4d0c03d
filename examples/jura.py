"""Jura geostatistics experiment (port of the reference
``examples/paper/jura.py``): 2-D spatial inputs, log transform,
joint fit (``fix=False``), MAE on cadmium.

Run: ``python examples/jura.py [--quick] [--data-dir DIR]``
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running from a checkout without installing


import sys

from gpar_tpu import GPARRegressor, log_transform
from gpar_tpu.utils import experiment as out
from gpar_tpu.utils.data import load_jura
from gpar_tpu.utils.experiment import WorkingDirectory
from gpar_tpu.utils.metrics import mae

if __name__ == "__main__":
    out.report_time = True
    quick = "--quick" in sys.argv
    data_dir = None
    if "--data-dir" in sys.argv:
        data_dir = sys.argv[sys.argv.index("--data-dir") + 1]
    wd = WorkingDirectory("_experiments", "jura")

    x_train, y_train, x_test, y_test, columns = load_jura(data_dir)

    iters = 10 if quick else 100
    num_samples = 50 if quick else 200

    # Reference config (examples/paper/jura.py:22-31): log transform +
    # replace, trained jointly (fix=False, examples/paper/jura.py:32).
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
    model.fit(x_train, y_train, fix=False, iters=iters)
    means = model.predict(x_test, num_samples=num_samples, latent=True)

    scores = mae(means, y_test)
    out.kv("MAE Cd", scores[columns.index("Cd")])
    if "--check" in sys.argv:
        # Golden envelope for the seeded synthetic stand-in (--quick;
        # measured 0.077 on CPU f64 — ~4x margin for platform drift).
        out.check_metric("jura Cd MAE", scores[columns.index("Cd")], 0.3)
    wd.save({"x_test": x_test, "means": means}, "jura.pickle")
