from .rng import next_key, set_seed  # noqa: F401
