"""Post-process the air-temperature runs: SMSE table + prediction plot.

Port of the reference ``examples/paper/air_temp_process.py``: reloads the
predictions pickled by ``air_temp.py`` (``results{size}.pickle``),
recomputes the SMSE over the first two test chunks per size, and renders
the prediction/credible-band figure.

Run ``python examples/air_temp.py <size>`` for each size first, then
``python examples/air_temp_process.py``.
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running from a checkout without installing

import numpy as np

from gpar_tpu.utils import experiment as out
from gpar_tpu.utils.data import load_air_temp
from gpar_tpu.utils.experiment import WorkingDirectory
from gpar_tpu.utils.metrics import smse

LOOKUP_SIZE = {0: "10 Days", 1: "15 Days", 2: "1 Month"}

if __name__ == "__main__":
    data_dir = None
    if "--data-dir" in _sys.argv:
        data_dir = _sys.argv[_sys.argv.index("--data-dir") + 1]
    wd = WorkingDirectory("_experiments", "air_temp")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(15, 4))
    except Exception:  # pragma: no cover — plotting is best-effort
        plt = None

    found = []
    for d_size in [0, 1, 2]:
        path = wd.file(f"results{d_size}.pickle")
        if not _os.path.exists(path):
            continue
        preds = wd.load(f"results{d_size}.pickle")
        _, _, y_train, tests = load_air_temp(data_dir, size=d_size)

        # SMSE over the first two test chunks (the rest are the extended
        # sets, reference air_temp_process.py:32-39).
        smses = [
            np.nanmean(smse(mean, y_t))
            for (mean, _, _), (x_t, y_t) in list(zip(preds, tests))[:2]
        ]
        out.kv(f"SMSE {LOOKUP_SIZE[d_size]}", float(np.mean(smses)))
        found.append(d_size)

        if plt is not None:
            for i, ((mean, lowers, uppers), (x_t, y_t)) in enumerate(
                list(zip(preds, tests))[:2]
            ):
                ax = plt.subplot(2, 3, d_size + i * 3 + 1)
                xi = np.arange(mean.shape[0])
                # Plot the held-out output of this chunk (y_t is NaN
                # everywhere else — the loader's test contract).
                y_t = np.asarray(y_t)
                c = int(np.flatnonzero(~np.isnan(y_t).all(axis=0))[0])
                ax.plot(xi, mean[:, c], label="GPAR mean")
                ax.fill_between(
                    xi, lowers[:, c], uppers[:, c], alpha=0.25, label="95%"
                )
                ax.scatter(xi, y_t[:, c], s=4, c="k", label="truth")
                ax.set_title(f"{LOOKUP_SIZE[d_size]} / chunk {i}")

    if not found:
        print(
            "No results pickles found — run `python examples/air_temp.py "
            "<size>` first.",
            file=_sys.stderr,
        )
        _sys.exit(1)

    if plt is not None:
        fig.tight_layout()
        fig.savefig(wd.file("air_temp_predictions.pdf"))
        out.kv("Figure", wd.file("air_temp_predictions.pdf"))
