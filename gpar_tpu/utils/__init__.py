from . import data, experiment, metrics  # noqa: F401
from .rng import next_key, set_seed  # noqa: F401
