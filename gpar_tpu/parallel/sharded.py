"""Multi-chip execution: row-sharded sparse GP training and sample-sharded
prediction over a ``jax.sharding.Mesh``.

The reference has no distributed execution of any kind (SURVEY.md §2.4).
The TPU-native scaling axes for GPAR are:

- **Data parallelism over rows (``dp``)**: the Titsias collapsed ELBO
  decomposes over data rows given the inducing-point statistics —
  ``Kmn D^{-1} Knm = sum_i k(Z, x_i) k(Z, x_i)^T / d_i`` — so each device
  computes an (m, m) moment matrix + an m-vector + three scalars on its row
  shard and a single ``psum`` over ICI reduces them; the m x m finish
  (two Cholesky factorisations) is replicated.  Per-device compute is
  O(n m^2 / P) with O(m^2) communication, independent of n.
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
from ..ops.linalg import LOG_2PI, safe_cholesky, solve_lower, titsias_finish

__all__ = [
    "make_mesh",
    "sharded_titsias_elbo",
    "sharded_titsias_factors",
    "pad_rows",
    "sharded_sample_batch",
]


def make_mesh(n_devices=None, axis="dp", devices=None):
    """A 1-D device mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
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


def _local_titsias_stats(kernel, z, Lm, x, y, mean, noise_diag, mask, axis):
    """Per-shard Titsias statistics, reduced with one psum.

    Padded rows are neutralised by ``mask``: their noise is treated as
    infinite (D^{-1} -> 0) and their logdet/count contributions are zeroed.
    """
    r = (y - mean) * mask
    d_inv = mask / noise_diag  # 0 on padded rows

    Kmn = gram(kernel, z, x)  # (m, n_local)
    # A_loc = Lm^{-1} Kmn sqrt(D^{-1})
    A = solve_lower(Lm, Kmn) * jnp.sqrt(d_inv)[None, :]

    G = jax.lax.psum(A @ A.T, axis)  # (m, m): Lm^{-1} Kmn D^{-1} Knm Lm^{-T}
    b = jax.lax.psum(A @ (r * jnp.sqrt(d_inv)), axis)  # (m,): Lm^{-1} Kmn D^{-1} r
    logdet_d = jax.lax.psum(jnp.sum(jnp.log(noise_diag) * mask), axis)
    quad_diag = jax.lax.psum(jnp.sum(r * r * d_inv), axis)
    trace_knn = jax.lax.psum(jnp.sum(kdiag(kernel, x) * d_inv), axis)
    n_total = jax.lax.psum(jnp.sum(mask), axis)
    return G, b, logdet_d, quad_diag, trace_knn, n_total


# The O(m^3) finish (B factorisation, ELBO tail, beta) is the shared
# single-source implementation in ops/linalg.py:titsias_finish — the
# single-device and sharded paths cannot drift apart.


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
        stats = _local_titsias_stats(
            kernel, z, Lm, x, y, jnp.zeros_like(y), noise_diag, mask, axis
        )
        return titsias_finish(*stats, Lm)[0]

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
    (m, m) moment matrix and an m-vector through a single ``psum`` (the
    only communication — O(m^2), independent of n); the O(m^3) finish is
    replicated.

    Returns:
        (elbo, Lm, LB, beta)
    """
    m = z.shape[0]
    dtype = x.dtype
    Lm = safe_cholesky(gram(kernel, z, z))

    def local(kernel, z, Lm, x, y, noise_diag, mask):
        return _local_titsias_stats(
            kernel, z, Lm, x, y, jnp.zeros_like(y), noise_diag, mask, axis
        )

    stats_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    G, b, logdet_d, quad_diag, trace_knn, n_total = stats_fn(
        kernel, z, Lm, x, y, noise_diag, mask
    )
    elbo, LB, beta = titsias_finish(
        G, b, logdet_d, quad_diag, trace_knn, n_total, Lm
    )
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
