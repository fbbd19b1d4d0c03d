"""Synthetic multi-output experiment (port of the reference
``examples/paper/synthetic.py``): three outputs depending on each other in
complicated ways, GPAR vs the independent-GP baseline (``markov=0``).

Run: ``python examples/synthetic.py [--quick]``
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
from gpar_tpu.utils.experiment import WorkingDirectory
from gpar_tpu.utils.metrics import smse

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    wd = WorkingDirectory("_experiments", "synthetic", seed=1)

    # Toy data set (reference examples/paper/synthetic.py:10-24).
    n = 200
    x = np.linspace(0, 1, n)
    noise = 0.1

    f1 = -np.sin(10 * np.pi * (x + 1)) / (2 * x + 1) - x**4
    f2 = np.cos(f1) ** 2 + np.sin(3 * x)
    f3 = f2 * f1**2 + 3 * x
    f = np.stack((f1, f2, f3), axis=0).T

    y = f + noise * np.random.randn(n, 3)
    x_obs, y_obs = x[::8], y[::8]

    iters = 20 if quick else 200
    num_samples = 50 if quick else 200

    # GPAR (reference config, examples/paper/synthetic.py:27-37).
    model = GPARRegressor(
        scale=0.1,
        linear=True,
        linear_scale=10.0,
        nonlinear=True,
        nonlinear_scale=0.1,
        noise=0.1,
        impute=True,
        replace=False,
        normalise_y=False,
    )
    model.fit(x_obs, y_obs, iters=iters)
    means, lowers, uppers = model.predict(
        x, num_samples=num_samples, credible_bounds=True, latent=True
    )

    # Independent GPs: markov=0 (examples/paper/synthetic.py:42-51).
    igp = GPARRegressor(
        scale=0.1,
        linear=True,
        linear_scale=10.0,
        nonlinear=True,
        nonlinear_scale=0.1,
        noise=0.1,
        markov=0,
        normalise_y=False,
    )
    igp.fit(x_obs, y_obs, iters=iters)
    igp_means, igp_lowers, igp_uppers = igp.predict(
        x, num_samples=num_samples, credible_bounds=True, latent=True
    )

    out.kv("GPAR SMSE vs truth", smse(means, f))
    out.kv("IGP  SMSE vs truth", smse(igp_means, f))
    if "--check" in sys.argv:
        # Golden envelopes for the seeded workload (--quick): GPAR must
        # fit the truth AND beat the independent-GP baseline on the
        # downstream outputs (the paper's qualitative claim, made a gate).
        out.check_metric("synthetic GPAR mean SMSE", np.nanmean(smse(means, f)), 1.0)
        out.check_metric(
            "synthetic GPAR-beats-IGP margin",
            float(np.nanmean(smse(igp_means, f)) - np.nanmean(smse(means, f))),
            0.0,
            larger_is_worse=False,
        )
    wd.save(
        {
            "x": x,
            "f": f,
            "gpar": (means, lowers, uppers),
            "igp": (igp_means, igp_lowers, igp_uppers),
        },
        "synthetic.pickle",
    )

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(15, 3))
        for i in range(3):
            plt.subplot(1, 3, i + 1)
            plt.scatter(x_obs, y_obs[:, i], c="k", s=8, label="Observations")
            plt.plot(x, f[:, i], "k--", label="Truth")
            plt.plot(x, means[:, i], "tab:blue", label="GPAR")
            plt.fill_between(x, lowers[:, i], uppers[:, i], alpha=0.2, color="tab:blue")
            plt.plot(x, igp_means[:, i], "tab:orange", label="IGP")
            plt.fill_between(
                x, igp_lowers[:, i], igp_uppers[:, i], alpha=0.2, color="tab:orange"
            )
            plt.xlabel("$t$")
            plt.ylabel(f"$y_{i + 1}$")
            if i == 2:
                plt.legend()
        plt.tight_layout()
        plt.savefig(wd.file("synthetic.pdf"))
        print("saved", wd.file("synthetic.pdf"))
    except Exception as e:  # matplotlib optional
        print("plotting skipped:", e)
