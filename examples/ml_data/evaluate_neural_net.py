"""Train one MLP configuration and report its validation-loss curve.

Stand-in for the reference's keras/MNIST evaluator
(``examples/paper/ml_data/evaluate_neural_net.py``): same six
hyperparameters and the same output contract — ``get_results(params)``
returns ``{"val_loss": np.ndarray of per-epoch validation losses}`` — but
built on torch (CPU) and the bundled sklearn ``digits`` set, so it runs
offline.  The curves feed ``examples/ml.py`` via ``grid_search.py``.
"""

import numpy as np
import torch
import torch.nn as nn
from sklearn.datasets import load_digits
from sklearn.model_selection import train_test_split

N_EPOCHS = 25


def _data(seed=0):
    digits = load_digits()
    x = digits.data.astype(np.float32) / 16.0
    y = digits.target.astype(np.int64)
    return train_test_split(x, y, test_size=0.3, random_state=seed)


def build_model(params, n_in=64, n_out=10):
    n_hidden_layers = int(np.round(params["n_hidden_layers"]))
    n_neurons = int(np.round(params["n_neurons"]))
    prob_drop_out = float(params["prob_drop_out"])

    layers, width = [], n_in
    for _ in range(n_hidden_layers):
        layers += [nn.Linear(width, n_neurons), nn.ReLU(), nn.Dropout(prob_drop_out)]
        width = n_neurons
    layers += [nn.Linear(width, n_out)]
    return nn.Sequential(*layers)


def get_results(params, n_epochs=N_EPOCHS, seed=0):
    torch.manual_seed(seed)
    x_train, x_val, y_train, y_val = _data(seed)
    x_train_t = torch.from_numpy(x_train)
    y_train_t = torch.from_numpy(y_train)
    x_val_t = torch.from_numpy(x_val)
    y_val_t = torch.from_numpy(y_val)

    model = build_model(params)
    opt = torch.optim.Adam(
        model.parameters(), lr=float(np.exp(params["log_learning_rate"]))
    )
    loss_fn = nn.CrossEntropyLoss()
    l1 = float(np.exp(params["log_l1_weight_reg"]))
    l2 = float(np.exp(params["log_l2_weight_reg"]))

    val_losses = []
    for _ in range(n_epochs):
        model.train()
        opt.zero_grad()
        loss = loss_fn(model(x_train_t), y_train_t)
        reg = sum(
            l1 * p.abs().sum() + l2 * (p**2).sum()
            for p in model.parameters()
            if p.ndim == 2
        )
        (loss + reg).backward()
        opt.step()

        model.eval()
        with torch.no_grad():
            val_losses.append(float(loss_fn(model(x_val_t), y_val_t)))
    # Cap diverged runs: a val_loss beyond 5 carries no more information
    # than "diverged" (the downstream experiment filters at error 5,
    # reference examples/paper/ml.py:28-33) but its magnitude (up to ~1e4)
    # would dominate normalisation statistics.
    return {"val_loss": np.minimum(np.asarray(val_losses), 5.0)}
