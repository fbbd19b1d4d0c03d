from .gpar import GPAR, construct_model, last, merge, per_output  # noqa: F401
from .regressor import GPARRegressor, log_transform, squishing_transform  # noqa: F401
