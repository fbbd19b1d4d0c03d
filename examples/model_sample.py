"""Prior sampling + fit + predict demo (port of the reference
``examples/model_sample.py``): sample three outputs from the GPAR prior,
discard increasing fractions, refit, and predict.

Run: ``python examples/model_sample.py [--quick]``
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running from a checkout without installing


import sys

import numpy as np

from gpar_tpu import GPARRegressor

if __name__ == "__main__":
    quick = "--quick" in sys.argv

    x = np.linspace(0, 1, 100)
    model = GPARRegressor(
        scale=0.1,
        linear=False,
        nonlinear=True,
        nonlinear_scale=0.5,
        impute=True,
        replace=True,
        noise=0.1,
        normalise_y=True,
    )

    # Sample observations and discard some (reference
    # examples/model_sample.py:19-24).
    y = model.sample(x, p=3)
    y_obs = y.copy()
    y_obs[np.random.permutation(100)[:25], 0] = np.nan
    y_obs[np.random.permutation(100)[:50], 1] = np.nan
    y_obs[np.random.permutation(100)[:75], 2] = np.nan

    iters = 20 if quick else 200
    num_samples = 50 if quick else 200

    model.fit(x, y_obs, iters=iters)
    means, lowers, uppers = model.predict(
        x, num_samples=num_samples, latent=False, credible_bounds=True
    )
    print("predictive means:", means.shape)
    print(
        "coverage of truth by 95% bounds:",
        float(np.mean((y >= lowers) & (y <= uppers))),
    )
