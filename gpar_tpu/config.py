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
        #: Shape-bucketed compilation: pad the row axes (n, n_test) of the
        #: scan-fused fit and serving programs up to geometric buckets and
        #: the Monte-Carlo sample count to a quantum, with the data riding
        #: in as TRACED arguments and the padding neutralised by the same
        #: 0/1 row masks the mesh paths use — so ONE compiled executable
        #: serves a whole size range and a new dataset (same model, any
        #: row count inside the bucket) reuses it instead of paying the
        #: per-shape cold XLA compile.  Applies to every scan-fused path —
        #: single-device AND under an active mesh (the mesh programs take
        #: the bucketed row arrays as traced arguments and pad from the
        #: bucket to the device geometry inside the trace) — and to the
        #: batched greedy scorer's row axis.  Only the unrolled/batched
        #: fallbacks bake the data's NaN plan and stay exact-shape.
        #: False: compile exactly at the data shape.
        self.shape_buckets = True
        #: Geometric ratio between consecutive row buckets: padding wastes
        #: at most ~(ratio - 1) of the rows and the number of distinct
        #: compiles over any size range is logarithmic.
        self.bucket_ratio = 1.25
        #: Smallest row bucket (also the multiple every bucket is rounded
        #: up to — MXU-tile friendly).
        self.bucket_floor = 64
        #: Monte-Carlo sample counts pad up to a multiple of this; the
        #: surplus draws are invalidated before the on-device reduction
        #: (prefix-stable key splitting keeps the real draws identical).
        self.sample_bucket = 16
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
        #: Scan-fused serving (``models/fused.py``): conditioning +
        #: Monte-Carlo sampling as ``lax.scan``s over layers instead of a
        #: p-fold Python unroll — compile time O(1) in p.  Engages for
        #: every serving path: posterior ``sample``/``predict``/
        #: ``fit_predict`` on BOTH replace modes (replace=True via
        #: ``make_scan_predict_tail``/``make_scan_cached_tail``,
        #: replace=False via ``make_scan_posterior_factors`` +
        #: ``make_scan_ancestral_tail``) and prior sampling
        #: (``make_scan_prior_tail``), single-device and under an active
        #: mesh alike (the key batch stays sharded through the tails; the
        #: mesh ``fit_predict`` fit body runs inside one shard_map).  The
        #: only automatic fallback to the unrolled path is a dense factor
        #: stack too large to materialise
        #: (``posterior_cache_max_bytes``).  False forces the unrolled
        #: path everywhere (oracle/fallback).
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
        #: covariance (the sampled outputs feed forward), so the batched
        #: tails hold O(S * n_test^2) covariance buffers.  ``"auto"``
        #: (default) bounds that peak by processing the sample axis in
        #: ``lax.map`` chunks sized from ``predict_memory_budget`` (see
        #: :func:`gpar_tpu.models.fused.resolve_sample_chunk`); an integer
        #: fixes the chunk size; ``None``/``0`` vmaps the whole batch
        #: (peak O(S * n_test^2) per layer, the unrolled path's profile).
        #: Chunked draws bit-match the unchunked tail per key.
        self.predict_sample_chunk = "auto"
        #: Peak-memory budget (bytes) for the per-sample serving tails'
        #: batched covariance work under ``predict_sample_chunk="auto"``:
        #: the chunk is sized so ~4 live (chunk, n_test, n_test) buffers
        #: (covariance, PSD factor, retry-ladder temporaries) stay inside
        #: it.  Mirrors ``posterior_cache_max_bytes``.
        self.predict_memory_budget = 2 << 30


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

    Single-process meshes only (SURVEY.md §5): the estimator device_puts
    plan/data/key arrays from the host with explicit shardings, which
    requires every mesh device to be addressable from this process —
    multi-host (``jax.distributed``) runs raise up front rather than
    silently mis-sharding (see ``parallel.sharded.make_mesh`` and
    docs/design.md "Multi-host readiness").
    """
    import jax

    if jax.process_count() > 1:
        raise NotImplementedError(
            "gpar_tpu meshes are single-process (SURVEY.md §5): host-side "
            "device_put of plan/data arrays assumes all mesh devices are "
            "addressable from this process."
        )
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
        config.shape_buckets,
        config.bucket_ratio,
        config.bucket_floor,
        config.sample_bucket,
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
        config.predict_memory_budget,
    )


def bucket_rows(n):
    """Smallest row bucket >= ``n``: geometric steps of ``bucket_ratio``
    from ``bucket_floor``, each rounded up to a ``bucket_floor`` multiple.
    Identity when ``shape_buckets`` is off (compile exactly at ``n``)."""
    if not config.shape_buckets or n <= 0:
        return n
    q = b = config.bucket_floor
    while b < n:
        b = int(-(-int(b * config.bucket_ratio) // q) * q)
    return b


def bucket_samples(s):
    """Smallest ``sample_bucket`` multiple >= ``s`` (identity when
    ``shape_buckets`` is off)."""
    if not config.shape_buckets or s <= 0:
        return s
    q = config.sample_bucket
    return -(-s // q) * q


def default_dtype():
    import jax.numpy as jnp

    return jnp.dtype(config.dtype)
