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
    # One cache dir PER PLATFORM: mixing backends in one dir is poisonous —
    # entries AOT-compiled elsewhere (e.g. by a remote TPU compile service
    # on a host with different CPU features) fail to load with a logged
    # error on every lookup, which measurably slows every jit call
    # (observed: a 1.6 GB mixed cache made a 19 s test subset take 118 s).
    # Key on the REAL backend, not the env var: an unset JAX_PLATFORMS can
    # resolve to tpu on one run and cpu on another (plugin present or not),
    # and mixing their entries in one dir is the poisoning described below.
    _platform = os.environ.get("JAX_PLATFORMS")
    if not _platform:
        try:
            _platform = jax.default_backend()
        except Exception:  # pragma: no cover — no backend available yet
            _platform = "default"
    _cache_dir = os.environ.get(
        "GPAR_TPU_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", f"gpar_tpu_xla_{_platform}"
        ),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Only persist compiles that are worth the disk/load traffic.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — cache is best-effort
        pass


# Honour an explicit JAX_PLATFORMS=cpu even when an out-of-tree TPU plugin
# registers itself anyway (observed with tunnelled-TPU plugins): pin the
# default device to the host CPU so example scripts and user code run where
# the user asked.  No-op on standard installs (backend is already cpu).
if "cpu" in os.environ.get("JAX_PLATFORMS", "").split(","):
    try:  # pragma: no cover — plugin-specific environment quirk
        if jax.default_backend() != "cpu":
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass


class _Config:
    """Mutable global configuration (mirrors ``lab.B.epsilon``)."""

    def __init__(self):
        #: Diagonal jitter added before every Cholesky factorisation.
        #: Mirrors ``lab.B.epsilon`` (default 1e-12).
        self.epsilon = 1e-12
        #: Jitter floor applied when factorising float32 matrices, where
        #: 1e-12 is below working resolution (the reference's large-data
        #: example raises the global knob to exactly this,
        #: ``examples/paper/air_temp.py:18``).  The effective float32
        #: jitter is ``max(epsilon, epsilon_f32)``.
        self.epsilon_f32 = 1e-6
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
        #: Blocked (triangle-aware right-looking) Cholesky for large dense
        #: factorisations: ``None`` = auto (TPU backend and
        #: n >= ``blocked_cholesky_min``), True/False force it on/off.
        #: Measured on v5e at f32-highest: 2.27 ms vs builtin 2.55 ms at
        #: n=4096, 10.95 vs 12.27 ms at n=8192 (51% vs 45% of the 6-pass
        #: f32 MXU roofline); parity at n=16384; builtin wins below 4096.
        self.use_blocked_cholesky = None
        #: Minimum matrix size for the blocked Cholesky to engage.
        self.blocked_cholesky_min = 4096
        #: Panel width.  Measured on-chip at n=8192: 256 is optimal for
        #: the left-looking schedule (10.19 ms vs 10.44 at 512), 512 for
        #: the right-looking one (every other width 8-25% slower).
        self.blocked_cholesky_block = 256
        #: Panel schedule: True = left-looking (panel j applies all prior
        #: panels' contributions as ONE rectangular GEMM; no running
        #: trailing buffer to update in place), False = triangle-aware
        #: right-looking (round-1 form; halves syrk FLOPs but pays
        #: nb²/2 small dynamic-update-slice writes).  Left measured
        #: faster on-chip at n=8192 (10.19 vs 10.95 ms, same session).
        self.blocked_cholesky_left = True
        #: Panel solve strategy: True replaces the wide triangular solve
        #: ``L21 = A21 Ljj^{-T}`` with an explicit blocked triangular
        #: inversion of the diagonal block followed by one MXU matmul
        #: (the TRSM -> TRTRI+GEMM transformation).  Measured on-chip at
        #: n=8192 (same session): a WIN on the left-looking b=256
        #: schedule (9.99 vs 10.19 ms — TRSM runs at 9.6 vs the GEMM's
        #: 30.9 TF/s, and inv(256) is cheap), a wash on right-looking
        #: b=512.  Default True to match the left-looking default.
        self.cholesky_trsm_inverse = True
        #: Sub-block width for factorising the (b, b) diagonal block in
        #: ``b / subblock`` right-looking inner steps, shrinking the
        #: serial leaf from ``chol(b)`` to ``chol(subblock)``.  Measured
        #: on-chip at n=8192/b=512: a slight LOSS (11.84 ms sub=128 vs
        #: 10.95 ms one-shot builtin), so ``None`` (one-shot) is the
        #: default; must divide ``blocked_cholesky_block`` when set.
        self.blocked_cholesky_subblock = None
        #: Execution mesh for multi-chip runs (``jax.sharding.Mesh`` with
        #: one axis, or None).  When set, the sparse (Titsias) training
        #: path row-shards its per-layer statistics over the mesh and
        #: Monte-Carlo sampling shards its key batch.  Set via
        #: :func:`gpar_tpu.use_mesh` or the ``mesh=`` arguments on
        #: ``GPARRegressor.fit/predict/sample/logpdf``.
        self.mesh = None
        #: Name of the mesh axis rows/samples are sharded over.
        self.shard_axis = "dp"
        #: Layers with fewer rows than this stay single-device (the psum +
        #: padding overhead dominates tiny layers).
        self.shard_min_rows = 1024
        #: Panel width of the distributed dense Cholesky
        #: (``parallel/dense.py``); shrunk automatically for small
        #: problems so padding overhead stays bounded.
        self.dense_shard_block = 256
        #: Scan-fused posterior prediction (``models/fused.py``
        #: ``make_scan_predict_tail``): conditioning + Monte-Carlo
        #: sampling as one ``lax.scan`` over layers instead of a p-fold
        #: Python unroll — compile time O(1) in p.  Engages for posterior
        #: sampling/prediction/fit_predict on ``replace=True`` chains
        #: (under an active mesh, ``sample``/``predict`` shard the key
        #: batch through the tail; ``fit_predict`` keeps the unrolled
        #: tail); False forces the unrolled path everywhere
        #: (oracle/fallback).
        self.scan_predict = True
        #: Repeated-serving fast path: cache the per-layer posterior
        #: factors (sparse: Titsias Lm/LB/beta + augmented inducing
        #: inputs; dense: alpha + Cholesky factors + augmented training
        #: inputs) across ``predict``/``sample`` calls, so only the
        #: test-point math runs per call.  Invalidates automatically on
        #: refit/recondition (keyed on the latent vector + data
        #: fingerprint).  False = re-condition every call (the reference
        #: behaviour, ``gpar/regression.py:547``).
        self.posterior_cache = True
        #: Dense factor stacks above this size skip the cache (they hold
        #: p (n, n) Cholesky factors; sparse stacks are always small).
        self.posterior_cache_max_bytes = 1 << 30
        #: Per-sample serving (``replace=False``, the reference default)
        #: draws each Monte-Carlo sample through its own posterior
        #: covariance (the sampled outputs feed forward).  ``None`` vmaps
        #: the whole sample batch — peak memory O(S * n_test^2) per layer,
        #: the same profile as the unrolled path.  An integer processes
        #: the sample axis in ``lax.map`` chunks of that size, bounding
        #: peak memory at O(chunk * n_test^2) for large test sets.
        self.predict_sample_chunk = None


config = _Config()


import contextlib


@contextlib.contextmanager
def use_mesh(mesh, min_rows=None, axis=None):
    """Execute the enclosed fits/predictions sharded over ``mesh``.

    The reference has no distributed execution (SURVEY.md §2.4); this is
    the TPU-native scale-out path: row-sharded Titsias statistics (one
    m^2 psum over ICI per layer) and sample-sharded prediction.

    Example::

        mesh = gpar_tpu.parallel.make_mesh()
        with gpar_tpu.use_mesh(mesh):
            reg.fit(x, y)
            means = reg.predict(x_new)
    """
    prev = (config.mesh, config.shard_min_rows, config.shard_axis)
    config.mesh = mesh
    if min_rows is not None:
        config.shard_min_rows = min_rows
    if axis is not None:
        config.shard_axis = axis
    try:
        yield mesh
    finally:
        config.mesh, config.shard_min_rows, config.shard_axis = prev


def mesh_descriptor():
    """Hashable summary of every trace-time global that gets baked into a
    compiled program: the active mesh AND the numeric-config knobs
    (jitter, Cholesky dispatch, Pallas toggle).  In-process program caches
    key on this so changing any knob between calls retraces instead of
    reusing a stale executable (the persistent XLA cache is HLO-keyed and
    needs no help)."""
    m = config.mesh
    mesh_part = None
    if m is not None:
        mesh_part = (
            tuple(m.axis_names),
            tuple(m.devices.shape),
            config.shard_axis,
            config.shard_min_rows,
        )
    return (
        mesh_part,
        config.epsilon,
        config.epsilon_f32,
        tuple(config.cholesky_retry_factors),
        config.use_pallas_gram,
        config.pallas_gram_min_size,
        config.use_blocked_cholesky,
        config.blocked_cholesky_min,
        config.blocked_cholesky_block,
        config.blocked_cholesky_subblock,
        config.blocked_cholesky_left,
        config.cholesky_trsm_inverse,
        config.dense_shard_block,
        config.predict_sample_chunk,
    )


def default_dtype():
    import jax.numpy as jnp

    return jnp.dtype(config.dtype)
