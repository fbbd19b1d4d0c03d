"""Hyperparameter grid search producing ``data.pickle`` for ``ml.py``.

Stand-in for the reference's grid search
(``examples/paper/ml_data/grid_search.py``): the same six-hyperparameter
grid and the same on-disk contract — ``data.pickle`` maps the parameter
tuple ``(n_neurons, n_hidden_layers, prob_drop_out, log_learning_rate,
log_l1_weight_reg, log_l2_weight_reg)`` to ``{"val_loss": curve}`` — with
incremental checkpointing so interrupted runs resume.

Run: ``python examples/ml_data/grid_search.py [n_configs]`` (default 64),
then ``python examples/ml.py --data examples/ml_data/data.pickle``.
"""

import os
import pickle
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from evaluate_neural_net import get_results  # noqa: E402

KEY_ORDER = [
    "n_neurons",
    "n_hidden_layers",
    "prob_drop_out",
    "log_learning_rate",
    "log_l1_weight_reg",
    "log_l2_weight_reg",
]

# Ranges chosen so most configurations train at least partially — the
# loss response surface is then smooth in the hyperparameters, which is
# the regime the GPAR experiment studies (a surface that is mostly
# "diverged" carries no learnable signal for any regressor).
GRID = {
    "n_neurons": np.arange(50.0, 500.0, 50.0),
    "n_hidden_layers": np.arange(1.0, 4.0, 1.0),
    "prob_drop_out": np.arange(0.0, 0.7, 0.1),
    "log_learning_rate": np.arange(-7.0, -1.0, 0.5),
    "log_l1_weight_reg": np.arange(-12.0, -4.0, 1.0),
    "log_l2_weight_reg": np.arange(-12.0, -4.0, 1.0),
}

if __name__ == "__main__":
    n_configs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data.pickle")

    results = {}
    if os.path.isfile(out_path):
        with open(out_path, "rb") as handle:
            results = pickle.load(handle)

    rng = random.Random(0)
    todo = []
    while len(todo) < n_configs:
        params = {k: float(rng.choice(list(v))) for k, v in GRID.items()}
        key = tuple(params[k] for k in KEY_ORDER)
        if key not in results:
            todo.append((key, params))

    for i, (key, params) in enumerate(todo):
        results[key] = get_results(params)
        with open(out_path, "wb") as handle:
            pickle.dump(results, handle, protocol=pickle.HIGHEST_PROTOCOL)
        print(
            f"[{i + 1}/{len(todo)}] {key} -> final val_loss "
            f"{results[key]['val_loss'][-1]:.4f}",
            flush=True,
        )
