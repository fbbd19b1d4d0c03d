"""Checkpoint / resume for GPAR regressors.

The reference has no model checkpointing (SURVEY.md §5): it only exposes
``get_variables()`` (a name -> NumPy dict, ``gpar/regression.py:328-337``)
and pickles *predictions* in examples.  Here the full estimator state —
hyperparameter latents + transforms, conditioning data, normaliser
statistics, model configuration — round-trips through a plain
``np.savez``-compatible dict, so fits survive process restarts and can be
shipped between hosts/chips.
"""

import pickle

import numpy as np

__all__ = ["state_dict", "load_state_dict", "save", "load"]


def state_dict(reg):
    """Serialisable snapshot of a :class:`GPARRegressor`."""
    vs_state = {
        name: {
            "latent": np.asarray(reg.vs._latents[name]),
            "transform": _transform_state(reg.vs._transforms[name]),
        }
        for name in reg.vs.names
    }
    data_state = None
    if reg.is_conditioned:
        # Prefer the host copies condition() keeps: ``np.asarray(reg.x)``
        # would lazily UPLOAD the array to the device and fetch it back
        # through the relay (PERF.md finding 30).
        hx = getattr(reg, "_x_np", None)
        data_state = {
            "x": hx if hx is not None else np.asarray(reg.x),
            "y": reg._y_np if hx is not None else np.asarray(reg.y),
            "w": reg._w_np if hx is not None else np.asarray(reg.w),
        }
    return {
        "format_version": 1,
        "model_config": dict(reg.model_config),
        "replace": reg.replace,
        "impute": reg.impute,
        "x_ind": None if reg.x_ind is None else np.asarray(reg.x_ind),
        "normalise_y": reg.normalise_y,
        "compat": reg.compat,
        "vs": vs_state,
        "data": data_state,
        # Normaliser statistics (the closures are reconstructed on load).
        "norm_stats": getattr(reg, "_norm_stats", None),
        # Greedy output ordering (fit(greedy=True), compat=False).
        "order": None if getattr(reg, "order", None) is None else np.asarray(reg.order),
    }


def _transform_state(t):
    from ..params.store import _Bounded, _Identity, _LowerBounded

    if isinstance(t, _Identity):
        return ("identity",)
    if isinstance(t, _LowerBounded):
        return ("lower", float(t.lower))
    if isinstance(t, _Bounded):
        return ("bounded", float(t.lower), float(t.upper))
    raise TypeError(f"Unknown transform {t!r}")


def _transform_from_state(s):
    from ..params.store import _Bounded, _Identity, _LowerBounded

    if s[0] == "identity":
        return _Identity()
    if s[0] == "lower":
        return _LowerBounded(s[1])
    if s[0] == "bounded":
        return _Bounded(s[1], s[2])
    raise ValueError(f"Unknown transform state {s!r}")


def load_state_dict(state, transform_y=None):
    """Rebuild a :class:`GPARRegressor` from :func:`state_dict` output.

    ``transform_y`` must be re-supplied if a non-default data transform was
    used (function pairs are not serialised; pass e.g. ``log_transform``).
    """
    import jax.numpy as jnp

    from ..models.regressor import GPARRegressor

    kwargs = dict(state["model_config"])
    reg = GPARRegressor(
        replace=state["replace"],
        impute=state["impute"],
        x_ind=state["x_ind"],
        normalise_y=state["normalise_y"],
        compat=state.get("compat", True),
        **kwargs,
    )
    if transform_y is not None:
        reg._transform_y, reg._untransform_y = transform_y

    order = state.get("order")
    reg.order = None if order is None else np.asarray(order)

    for name, entry in state["vs"].items():
        reg.vs._transforms[name] = _transform_from_state(entry["transform"])
        reg.vs._latents[name] = np.asarray(entry["latent"], dtype=reg.vs.dtype)

    if state["data"] is not None:
        d = state["data"]
        reg.x = jnp.asarray(d["x"])
        reg.y = jnp.asarray(d["y"])
        reg.w = jnp.asarray(d["w"])
        reg.n, reg.m = reg.x.shape
        reg.p = reg.y.shape[1]
        reg.is_conditioned = True
        reg._rebuild_data_caches()

        stats = state.get("norm_stats")
        if stats is not None:
            # NumPy stats, matching condition(): host pipelines stay off
            # the device, traced programs fold them as constants.
            means = np.asarray(stats["means"])
            stds = np.asarray(stats["stds"])
            reg._norm_stats = {"means": means, "stds": stds}
            reg._normalise_y = lambda y_: (y_ - means) / stds
            reg._unnormalise_y = lambda y_: y_ * stds + means
    return reg


def save(reg, path):
    """Pickle the estimator state to ``path``."""
    with open(path, "wb") as f:
        pickle.dump(state_dict(reg), f)


def load(path, transform_y=None):
    """Load an estimator saved with :func:`save`."""
    with open(path, "rb") as f:
        state = pickle.load(f)
    return load_state_dict(state, transform_y=transform_y)
