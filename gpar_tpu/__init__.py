"""gpar-tpu: a TPU-native JAX rebuild of GPAR (Gaussian Process
Autoregressive Regression, arXiv:1802.07182).

Public API matches the reference package ``gpar`` (``gpar/__init__.py:1-2``
star-imports model + regression, exposing exactly ``GPAR``,
``GPARRegressor``, ``log_transform``, ``squishing_transform``); the
TPU-native internals (kernel algebra, GP core, variable store, L-BFGS,
Pallas kernels, sharding) are available under their submodules.
"""

from . import config as _config_module  # noqa: F401 — enables x64 on import
from .config import config, use_mesh  # noqa: F401
from .models.gpar import GPAR  # noqa: F401
from .models.regressor import (  # noqa: F401
    GPARRegressor,
    log_transform,
    squishing_transform,
)
from .utils.rng import set_seed  # noqa: F401

__version__ = "0.2.0"

__all__ = [
    "GPAR",
    "GPARRegressor",
    "log_transform",
    "squishing_transform",
    "set_seed",
    "config",
    "use_mesh",
]
