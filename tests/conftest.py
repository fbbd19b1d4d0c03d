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


# The heavy tier (multi-second oracle tests, measured with --durations on
# this one-core host; the multi-minute entries are the sharded-gradient
# and mesh A/Bs).  Keyed by "<file>::<test base name>" so parametrized
# variants collapse; kept central so retiming the suite is one edit.
_HEAVY = {
    "test_parallel.py::test_sharded_titsias_grad",
    "test_parallel.py::test_sharded_dense_grad_matches_single_device",
    "test_parallel.py::test_sharded_dense_factors_match_single_device",
    "test_parallel.py::test_dense_obs_under_mesh_matches_single_device",
    "test_parallel.py::test_sharded_titsias_factors_match_pseudo_obs",
    "test_parallel.py::test_sharded_titsias_matches_single_device",
    "test_parallel.py::test_sharded_titsias_with_padding",
    "test_parallel.py::test_sharded_sample_batch",
    "test_parallel.py::test_use_mesh_estimator_end_to_end",
    "test_parallel.py::test_mesh_fit_predict_single_program",
    "test_parallel.py::test_dense_estimator_under_mesh_end_to_end",
    "test_fused_scan.py::test_free_fused_fit_matches_driver",
    "test_fused_scan.py::test_scan_fit_predict_matches_unrolled",
    "test_fused_scan.py::test_batched_fit_matches_scan",
    "test_fused_scan.py::test_free_fit_sharded_matches_single_device",
    "test_fused_scan.py::test_scan_fit_matches_unrolled",
    "test_fused_scan.py::test_scan_predict_tail_mean_chain_oracle",
    "test_fused_scan.py::test_scan_fit_sharded_matches_single_device",
    "test_greedy.py::test_greedy_under_mesh",
    "test_greedy.py::test_greedy_batched_scores_match_per_candidate",
    "test_greedy.py::test_greedy_sparse_scorer",
    "test_greedy.py::test_greedy_under_mesh_batched_matches_single_device",
    "test_greedy.py::test_greedy_batched_scorer_recovers_known_permutation",
    "test_greedy.py::test_greedy_picks_predictable_output_first",
    "test_buckets.py::test_greedy_scorer_shared_across_instances",
    "test_buckets.py::test_bucketed_logpdf_under_mesh_matches_single_device",
    "test_buckets.py::test_bucketed_fit_predict_under_mesh_matches_exact",
    "test_buckets.py::test_bucketed_greedy_reuses_scorer_and_matches_exact",
    "test_buckets.py::test_bucketed_fit_predict_matches_exact",
    "test_buckets.py::test_bucketed_programs_shared_across_instances",
    "test_buckets.py::test_bucketed_fit_predict_reuses_program_across_datasets",
    "test_buckets.py::test_bucketed_markov_fit_predict_matches_exact",
    "test_regression.py::test_logpdf_differentiable",
    "test_regression.py::test_fit_restarts_fused_and_per_layer",
    "test_regression.py::test_fit_trace_kwarg",
    "test_regression.py::test_logpdf",
    "test_regression.py::test_sample_and_predict",
    "test_regression.py::test_condition_and_fit",
    "test_regression.py::test_fit_predict_matches_fit_then_predict",
    "test_model.py::test_logpdf",
    "test_model.py::test_sample",
    "test_linalg.py::test_titsias_trace_clamp_blocks_f32_variance_blowup",
    "test_linalg.py::test_titsias_f32_elbo_accurate_at_noise_floor",
    "test_linalg.py::test_psd_sample_factor_batched_matches_vmap",
    "test_linalg.py::test_titsias_elbo_grad_finite_at_small_noise",
    "test_linalg.py::test_blocked_cholesky_subblocked_panels_match_builtin",
    "test_gp.py::test_pseudo_obs_on_posterior_base_matches_exact",
    "test_gp.py::test_posterior_of_posterior_equals_joint_conditioning",
}


def pytest_collection_modifyitems(items):
    """Two-tier suite (VERDICT r4 №6): tests in the measured ``_HEAVY``
    list (or explicitly marked ``heavy``) form the heavy tier; everything
    else gets the ``quick`` marker, so ``pytest -m quick`` is the
    iteration tier (<=8 min on this one-core host) and the default
    invocation stays the full suite — the only honest gate."""
    import pytest as _pytest

    seen = set()
    files = set()
    for item in items:
        key = f"{item.fspath.basename}::{item.name.split('[')[0]}"
        files.add(item.fspath.basename)
        if key in _HEAVY:
            seen.add(key)
            if item.get_closest_marker("heavy") is None:
                item.add_marker(_pytest.mark.heavy)
        if item.get_closest_marker("heavy") is None:
            item.add_marker(_pytest.mark.quick)
    # Renamed/moved heavy tests must not silently demote into the quick
    # tier.  Only enforced on full-suite collections (node-id/-k subset
    # runs legitimately collect a few items from a file); the full suite
    # is what CI and `make test` run, so drift gets loud there.
    if len(items) >= 250:
        stale = {k for k in _HEAVY - seen if k.split("::")[0] in files}
        assert not stale, (
            f"_HEAVY entries match no collected test: {sorted(stale)}"
        )
