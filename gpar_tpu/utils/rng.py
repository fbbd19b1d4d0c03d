"""Global PRNG-key plumbing.

The reference relies on the global torch RNG (`B.randn` at
``gpar/model.py:266``; fresh randomness per call).  JAX is functional, so we
keep a module-level key that is split on every draw; every public sampling
API also accepts an explicit ``key=`` for full reproducibility.
"""

import secrets

import jax

__all__ = ["set_seed", "next_key"]

_key = None


def set_seed(seed):
    """Seed the global PRNG (deterministic sampling thereafter)."""
    global _key
    _key = jax.random.PRNGKey(seed)


def next_key():
    """Split a fresh subkey off the global key (auto-seeded on first use)."""
    global _key
    if _key is None:
        _key = jax.random.PRNGKey(secrets.randbits(63))
    _key, sub = jax.random.split(_key)
    return sub
