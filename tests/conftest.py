"""Test configuration.

Tests run on the host CPU backend with true float64 (the parity bar of the
reference suite is 1e-6 under torch.float64) and with 8 virtual host
devices so the multi-chip sharding paths can be exercised without TPU
hardware.

Note: on this image the 'axon' TPU plugin registers itself with higher
priority than the CPU backend and ``JAX_PLATFORMS=cpu`` does not exclude
it, so we pin ``jax_default_device`` to the first CPU device instead.
``XLA_FLAGS`` must be set before JAX initialises a backend, hence the env
manipulation at conftest import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

import gpar_tpu  # noqa: E402, F401 — enables x64 before any array ops

jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Tests execute on CPU even though the axon TPU plugin is registered, so
# keep their compile cache separate from the TPU runs' cache (mixed-backend
# cache dirs poison lookup speed; see gpar_tpu/config.py).
if not os.environ.get("GPAR_TPU_NO_COMPILATION_CACHE"):
    _test_cache = os.path.join(
        os.path.expanduser("~"), ".cache", "gpar_tpu_xla_cputest"
    )
    os.makedirs(_test_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _test_cache)


def pytest_collection_modifyitems(items):
    """Two-tier suite (VERDICT r4 №6): everything not explicitly marked
    ``heavy`` gets the ``quick`` marker, so ``pytest -m quick`` is the
    iteration tier (target <=8 min on this one-core host) and the default
    invocation stays the full suite — the only honest gate."""
    import pytest as _pytest

    for item in items:
        if item.get_closest_marker("heavy") is None:
            item.add_marker(_pytest.mark.quick)
