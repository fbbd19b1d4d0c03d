"""Global configuration for gpar-tpu.

The reference stack exposes a single global jitter knob ``lab.B.epsilon``
(default ``1e-12``), which is added to kernel-matrix diagonals before
Cholesky factorisations (see e.g. reference ``examples/paper/air_temp.py:18``
raising it to ``1e-6`` for an ill-conditioned run).  We keep that policy
explicit and configurable here, plus an escalating retry ladder for failed
factorisations (standard GP practice that the reference delegates to its
dependencies).

float64 is enabled by default to meet the reference's parity bar
(``tests/test_model.py:137-149`` asserts 1e-6 tolerances under
``torch.float64``).  Set ``GPAR_TPU_NO_X64=1`` in the environment before
import to keep JAX in its default 32-bit mode (useful for pure-throughput
benchmarking on TPU where fp64 is emulated).
"""

import os

import jax

if not os.environ.get("GPAR_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# The TPU MXU defaults to single-pass bfloat16 contractions for float32
# operands (~1e-2 absolute error in Gram entries) — unusable for GP
# numerics where Cholesky jitter is 1e-6 and the parity bar is 1e-6.
# Force full-precision matmuls everywhere (posterior cross-covariances,
# Titsias A A^T, predictive sampling); hot kernels that can tolerate
# lower precision opt in locally.  Override with GPAR_TPU_MATMUL_PRECISION.
jax.config.update(
    "jax_default_matmul_precision",
    os.environ.get("GPAR_TPU_MATMUL_PRECISION", "highest"),
)

# Persistent XLA compilation cache: GP fits compile one executable per layer
# shape; caching them on disk makes repeated runs (tests, benchmarks, the
# examples) start hot.
if not os.environ.get("GPAR_TPU_NO_COMPILATION_CACHE"):
    _cache_dir = os.environ.get(
        "GPAR_TPU_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gpar_tpu_xla"),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover — cache is best-effort
        pass


class _Config:
    """Mutable global configuration (mirrors ``lab.B.epsilon``)."""

    def __init__(self):
        #: Diagonal jitter added before every Cholesky factorisation.
        #: Mirrors ``lab.B.epsilon`` (default 1e-12).
        self.epsilon = 1e-12
        #: Multiplicative factors for escalating jitter retries when a
        #: factorisation produces NaNs.  Each entry multiplies ``epsilon``.
        self.cholesky_retry_factors = (1e3, 1e6)
        #: Default dtype for model parameters and data
        #: (reference: ``torch.float64``, ``gpar/regression.py:314``).
        self.dtype = "float64" if not os.environ.get("GPAR_TPU_NO_X64") else "float32"
        #: Fused Pallas Gram construction: "auto" enables it when the
        #: default execution target is a TPU and inputs are float32;
        #: True/False force it on/off.  Default False: measured on v5e,
        #: XLA's own fusion of the jnp kernel recursion beats the Pallas
        #: kernel (217 vs 141 GB/s of output write at n=16384; XLA fuses
        #: the elementwise term combination into the matmul consumers, so
        #: the fusion the Pallas kernel adds is not the bottleneck).
        #: Kept as an opt-in for other TPU generations; see bench_kernels.py.
        self.use_pallas_gram = False
        #: Minimum n*m size for the fused Gram to engage (small problems
        #: are dominated by launch overhead).
        self.pallas_gram_min_size = 262144


config = _Config()


def default_dtype():
    import jax.numpy as jnp

    return jnp.dtype(config.dtype)
