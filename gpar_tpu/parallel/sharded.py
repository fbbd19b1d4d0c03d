"""Multi-chip execution: row-sharded sparse GP training and sample-sharded
prediction over a ``jax.sharding.Mesh``.

The reference has no distributed execution of any kind (SURVEY.md §2.4).
The TPU-native scaling axes for GPAR are:

- **Data parallelism over rows (``dp``)**: the Titsias collapsed ELBO
  decomposes over data rows given the inducing-point statistics —
  ``Kmn D^{-1} Knm = sum_i k(Z, x_i) k(Z, x_i)^T / d_i`` — so each device
  computes an (m, m) moment matrix + an m-vector + scalars on its row
  shard, reduced with one ``psum`` over ICI; the m x m solve (two Cholesky
  factorisations) is replicated, followed by one scalar psum of the
  row-wise quadratic form (cancellation-free float32 formulation — see
  ``ops/linalg.titsias_factors``).  Per-device compute is O(n m^2 / P)
  with O(m^2) communication, independent of n.
- **Sample parallelism (``dp`` again)**: Monte-Carlo predictive sampling
  vmaps over independent keys; sharding the key batch across devices
  parallelises prediction embarrassingly.

Everything is expressed with ``shard_map`` over a named mesh so XLA inserts
the collectives; no explicit device placement.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kernels import gram, kdiag
from ..ops.linalg import (
    safe_cholesky,
    solve_lower,
    titsias_assemble,
    titsias_solve,
)

__all__ = [
    "make_mesh",
    "sharded_titsias_elbo",
    "sharded_titsias_factors",
    "titsias_psum_body",
    "pad_rows",
    "sharded_sample_batch",
]


def make_mesh(n_devices=None, axis="dp", devices=None):
    """A 1-D device mesh over the first ``n_devices`` devices.

    Single-process (single-host) meshes only.  SURVEY.md §5 scopes the
    distributed backend to one host (``jax.distributed`` is not required
    for the BASELINE targets), and the estimator's mesh paths assume
    every mesh device is addressable from this process: plan arrays and
    padded data are ``jax.device_put`` from the host with explicit
    shardings (``models/fused._committed_plan_xs``), and greedy/serving
    key batches are built host-side.  Under ``jax.distributed.
    initialize`` those transfers would need process-local addressable
    shards (``jax.make_array_from_process_local_data``) — unimplemented,
    so this raises rather than silently mis-sharding.
    """
    if jax.process_count() > 1:
        raise NotImplementedError(
            "gpar_tpu meshes are single-process: host-side device_put of "
            "plan/data arrays assumes all mesh devices are addressable "
            "from this process (SURVEY.md §5 scopes multi-host out; see "
            "docs/design.md 'Multi-host readiness')."
        )
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # Silently truncating would hand back a SMALLER mesh than
            # asked for (observed footgun: tests requesting an 8-device
            # CPU mesh got a 1-device TPU mesh because the TPU plugin
            # outranks the CPU backend in jax.devices()).
            raise ValueError(
                f"make_mesh({n_devices}) with only {len(devices)} "
                f"device(s) available ({devices[0].platform}); pass "
                f"devices= explicitly (e.g. jax.devices('cpu'))."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def pad_rows(arr, multiple, value=0.0):
    """Pad axis 0 up to a multiple of ``multiple`` (returns arr, mask)."""
    n = arr.shape[0]
    n_pad = (-n) % multiple
    mask = jnp.concatenate([jnp.ones(n, arr.dtype), jnp.zeros(n_pad, arr.dtype)])
    if n_pad == 0:
        return arr, mask
    pad_width = [(0, n_pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad_width, constant_values=value), mask


def titsias_psum_body(Lm, A0, knn_local, y, noise_diag, mask, axis):
    """psum-reduced collapsed Titsias ELBO + posterior factors from one
    shard's local panels — the communication core shared by every
    row-sharded sparse path (:func:`sharded_titsias_factors` and the
    mesh mode of the scan-fused fit, ``models/fused.py``).

    Two reductions: one psum of the (m, m)/(m,)/scalar moment statistics,
    then — after the replicated O(m^3) solve — one scalar psum of the
    row-wise quadratic form.  The quad/trace terms use the same
    cancellation-free float32 formulation as the single-device
    ``ops.linalg.titsias_factors`` (O(1) subtractions before the 1/D
    division; see its inline note), with the local shard's ``A0`` panel
    reused for the second pass so no n-sized recompute happens.

    Padded rows are neutralised by ``mask``: their noise is treated as
    infinite (D^{-1} -> 0) and their logdet/count contributions are zeroed.

    Args:
        Lm: (m, m) replicated Cholesky factor of ``Kmm``.
        A0: (m, n_local) ``Lm^{-1} Kmn`` for the local rows.
        knn_local: (n_local,) prior variances at the local rows.
        y / noise_diag / mask: (n_local,) local residuals, per-point
            noise, 0/1 validity.
    """
    r = y * mask
    d_inv = mask / noise_diag  # 0 on padded rows
    qnn = jnp.sum(A0 * A0, axis=0)

    G = jax.lax.psum((A0 * d_inv[None, :]) @ A0.T, axis)
    u = jax.lax.psum(A0 @ (r * d_inv), axis)
    logdet_d = jax.lax.psum(jnp.sum(jnp.log(noise_diag) * mask), axis)
    # Clamped like ops/linalg.titsias_factors: the Nyström residual is
    # >= 0 exactly; in f32 at extreme variances the subtraction is
    # cancellation noise and an unclamped negative trace flips the ELBO's
    # sign into a garbage-optimum direction (PERF.md finding 25).
    trace_num = jax.lax.psum(
        jnp.sum(jnp.maximum(knn_local - qnn, 0.0) * d_inv), axis
    )
    n_total = jax.lax.psum(jnp.sum(mask), axis)

    # Replicated O(m^3) core (single source: ops/linalg.titsias_solve —
    # the single-device and sharded paths cannot drift apart).
    LB, w, beta = titsias_solve(G, u, Lm)
    est = A0.T @ w  # local rows of Knm beta
    quad = jax.lax.psum(jnp.sum(r * (r - est) * d_inv), axis)
    elbo = titsias_assemble(logdet_d, LB, quad, trace_num, n_total)
    return elbo, LB, beta


def _sharded_titsias_body(kernel, z, Lm, x, y, noise_diag, mask, axis):
    """Per-shard body: local Gram panels + :func:`titsias_psum_body`."""
    Kmn = gram(kernel, z, x)  # (m, n_local)
    A0 = solve_lower(Lm, Kmn)  # O(1) entries (no 1/D scaling)
    return titsias_psum_body(
        Lm, A0, kdiag(kernel, x), y, noise_diag, mask, axis
    )


def sharded_titsias_elbo(kernel, z, x, y, noise_diag, mask, mesh, axis="dp"):
    """Collapsed Titsias ELBO with rows of (x, y, noise, mask) sharded over
    ``mesh``'s ``axis``.

    Equals :func:`gpar_tpu.ops.linalg.titsias_elbo` on the unpadded rows
    (oracle-tested); the n-dependent work runs data-parallel with one
    m^2-sized psum over ICI.

    Args:
        kernel: Kernel pytree (replicated; traced hyperparameters fine).
        z: (m, d) inducing inputs, replicated.
        x: (n, d) inputs, n divisible by mesh size (use :func:`pad_rows`).
        y: (n,) observations.
        noise_diag: (n,) per-point noise.
        mask: (n,) 1/0 row-validity mask (0 for padding).
        mesh: ``jax.sharding.Mesh`` with a single axis named ``axis``.
    """
    m = z.shape[0]
    dtype = x.dtype
    Lm = safe_cholesky(gram(kernel, z, z))

    def local(kernel, z, Lm, x, y, noise_diag, mask):
        return _sharded_titsias_body(
            kernel, z, Lm, x, y, noise_diag, mask, axis
        )[0]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    return fn(kernel, z, Lm, x, y, noise_diag, mask)


def sharded_titsias_factors(kernel, z, x, y, noise_diag, mask, mesh, axis="dp"):
    """Sharded Titsias ELBO *and* posterior factors in one pass.

    Computes the same quantities as the single-device ``PseudoObs``
    (``gp/core.py``): the collapsed ELBO plus the (m, m)/(m,) posterior
    factors ``Lm``, ``LB``, ``beta``.  Rows of (x, y, noise_diag, mask)
    are sharded over ``mesh``'s ``axis``; each device contributes an
    (m, m) moment matrix and an m-vector through one ``psum`` plus one
    scalar psum for the quadratic form (O(m^2) communication total,
    independent of n); the O(m^3) solve is replicated.

    Returns:
        (elbo, Lm, LB, beta)
    """
    m = z.shape[0]
    dtype = x.dtype
    Lm = safe_cholesky(gram(kernel, z, z))

    def local(kernel, z, Lm, x, y, noise_diag, mask):
        return _sharded_titsias_body(
            kernel, z, Lm, x, y, noise_diag, mask, axis
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    elbo, LB, beta = fn(kernel, z, Lm, x, y, noise_diag, mask)
    return elbo, Lm, LB, beta


def sharded_sample_batch(sample_fn, keys, mesh, axis="dp"):
    """Run ``vmap(sample_fn)`` over a key batch sharded across ``mesh``.

    ``len(keys)`` must be divisible by the mesh size.  Each device draws its
    shard of the Monte-Carlo predictive samples (the TPU-native replacement
    for the reference's sequential sampling loop,
    ``gpar/regression.py:558-563``, at multi-chip scale).
    """
    batched = jax.vmap(sample_fn)
    fn = jax.shard_map(batched, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    sharding = NamedSharding(mesh, P(axis))
    keys = jax.device_put(keys, sharding)
    return fn(keys)
