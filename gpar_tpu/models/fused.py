"""Scan-fused fit: every layer's L-BFGS through ONE compiled loop body.

The round-1 fused fit (``regressor._build_fused_fit_body``) unrolls the
p-layer chain in Python, instantiating one L-BFGS ``while_loop`` — and one
copy of the whole objective HLO — per layer.  Compile time scales with p:
the n=10k/p=16 benchmark paid ~610 s of cold XLA compilation
(BENCH_r01.json).  This module makes the layer bodies *shape-uniform* so
the unroll collapses into a single ``lax.scan`` whose body XLA compiles
once:

- **Uniform widths.** The augmented input buffer is allocated at its final
  width ``W = m + p - 1`` up front; layer pi's active columns are selected
  by a traced 0/1 *gate* vector (``ops.kernels.Gate``) instead of the
  static per-layer ``select`` — a gated-out dimension contributes exactly
  nothing to EQ/RQ distances, linear inner products, or periodic
  embeddings (reference column routing: ``gpar/regression.py:176-179``).
- **Uniform rows.** Layer row filtering (``per_output`` +
  ``_obs``'s NaN drop, ``gpar/model.py:279-289``) becomes 0/1 row masks
  over all n rows: masked rows get ``D^{-1} = 0`` in the Titsias ELBO
  (``ops.linalg.titsias_factors(mask=...)``) or identity rows in the dense
  covariance — the same exact neutralisation the multi-chip paths use for
  padding, so the per-layer NLL equals the filtered computation to
  rounding.
- **Uniform parameters.** Each layer's hyperparameters are gathered from
  the flat latent vector through per-layer index maps padded with a dummy
  slot (latent 0 -> natural 1 after the positive transform; always gated
  out), and constrained with the store's own transform rules
  (``params.store``: lower + exp, scaled logistic) so the two paths cannot
  drift.

The scan body contains exactly one L-BFGS ``lax.while_loop`` plus one
input-augmentation step (the resumable-inputs contract,
``gpar/model.py:199-243``); per-layer masks, gates, gather maps, data
columns and PRNG keys ride in as stacked scan inputs.

Semantics are those of ``fit(fix=True)`` — the reference's fast path
(``gpar/regression.py:423-432``): earlier layers are frozen while layer pi
trains, then one augmentation step threads the (imputed/replaced) output
column forward.  Oracle-tested equal to both the per-layer driver and the
unrolled fused path.

Scope: all kernel options (rq, per, input_linear, markov, scale_tie),
sparse + dense, impute/replace, missing data, and vmapped restarts.
Under an active ``use_mesh``, fits run the SAME scan inside one
``shard_map`` (rows sharded; sparse layers psum-reduce the Titsias ELBO,
dense layers factorise through the distributed blocked Cholesky of
``parallel/dense.py`` — see :func:`make_scan_fit_body`), and the serving
tails run GSPMD-partitioned with the Monte-Carlo key batch sharded over
devices.  Small-n fits fall back to the unrolled bodies, which shard
through the GP core.

Serving tails: :func:`make_scan_predict_tail` (replace=True, shared
factors), :func:`make_scan_posterior_factors` +
:func:`make_scan_cached_tail` (replace=True, repeated serving) /
:func:`make_scan_ancestral_tail` (replace=False, per-sample chains —
the reference's default predictive configuration).
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.kernels import EQ, RQ, Const, Linear, ZeroKernel, gram, kdiag
from ..ops.linalg import (
    floor_noise,
    psd_sample_factor,
    psd_sample_factor_batched,
    resolve_epsilon,
    safe_cholesky,
    solve_chol,
    solve_lower,
    mvn_logpdf_chol,
    titsias_factors,
)
from ..params.optim import lbfgs_traced_restarts
from ..params.store import _Bounded, _Identity, _LowerBounded

__all__ = [
    "ScanFitPlan",
    "build_scan_data_plan",
    "build_scan_fit_plan",
    "build_scan_prior_plan",
    "device_bucket_inputs",
    "make_scan_logpdf_body",
    "make_scan_posterior_logpdf_tail",
    "make_batched_fit_body",
    "make_scan_ancestral_tail",
    "make_scan_fit_body",
    "make_scan_free_fit_body",
    "make_scan_predict_tail",
    "make_scan_prior_tail",
    "resolve_sample_chunk",
]


# Constrained transforms per field, shared with the store (single source:
# params/store.py applies the identical rules when the per-layer model
# generators run).
_POS = _LowerBounded(0.0)
_NOISE = _LowerBounded(1e-8)
_ALPHA = _Bounded(1e-3, 1e3)
_ID = _Identity()

#: Plan entries carrying one value per data row (everything else in the
#: plan is model structure: index maps, gates, column ids).  The row
#: arrays shard along the row axis under a mesh and ride in as TRACED
#: arguments under shape bucketing (``config.shape_buckets``), making the
#: compiled programs data-independent.
_ROW_KEYS = ("route_mask", "obs_mask", "avail", "y_col", "w_col")


def pad_plan_rows(plan, n_rows):
    """Host-side padded copies of the plan's per-layer row arrays for a
    rows-traced (shape-bucketed) program: data and mask columns pad with 0
    — masked rows contribute exactly nothing (identity rows in the dense
    covariance, ``D^{-1} = 0`` in the Titsias ELBO) — and weights with 1
    (they divide the noise).  Returns a dict of (p, n_rows) jnp arrays."""
    pad = n_rows - plan.n
    out = {}
    for k in _ROW_KEYS:
        v = np.asarray(plan.xs[k])
        if pad:
            cval = 1.0 if k == "w_col" else 0.0
            v = np.pad(v, ((0, 0), (0, pad)), constant_values=cval)
        out[k] = jnp.asarray(v)
    return out


def device_bucket_inputs(x, y, w, *, n_b, impute):
    """Bucketed fit inputs: one upload of the bucket-padded data + ONE
    per-BUCKET jitted program deriving the per-layer row arrays on
    device — the serving-latency replacement for the old host path
    (``pad_plan_rows`` + five (p, n_b) host-built uploads; PERF.md
    finding 27).

    Padding happens host-side in NumPy (the data is host-resident in
    every ingest path — ``condition`` keeps host copies, ``logpdf``
    scores user arrays): y pads with NaN and w with 1, so padded rows
    drop out of every mask.  An earlier revision padded INSIDE the jit
    from the unpadded shapes, which re-specialised (and recompiled,
    ~0.7 s each through the relay compile service) for every distinct
    dataset row count; the bucket-shaped program compiles once per
    bucket and serves every n inside it (PERF.md finding 29).

    The device half derives :data:`_ROW_KEYS` — the closed-downwards
    ``per_output`` routing of ``gpar/model.py:325-368`` as cumulative
    mask algebra.  Values equal ``pad_plan_rows(build_scan_data_plan(
    ...), n_b)`` exactly (oracle-pinned,
    ``tests/test_buckets.py::test_device_bucket_inputs_match_host``).

    Returns ``(x_pad, rows)`` with ``rows`` the traced-argument dict the
    bucketed programs consume.
    """
    x = np.asarray(x)
    y = np.asarray(y)
    w = np.asarray(w)
    pad = n_b - y.shape[0]
    dtype = x.dtype
    x_pad = np.pad(x, ((0, pad), (0, 0)))
    y_pad = np.pad(y, ((0, pad), (0, 0)), constant_values=np.nan)
    w_pad = np.pad(
        w.astype(dtype), ((0, pad), (0, 0)), constant_values=1.0
    )
    return _device_plan_rows(x_pad, y_pad, w_pad, impute=impute)


@partial(jax.jit, static_argnames=("impute",))
def _device_plan_rows(x_pad, y_pad, w_pad, *, impute):
    """The bucket-shaped device half of :func:`device_bucket_inputs`."""
    dtype = x_pad.dtype
    yT = y_pad.T
    wT = w_pad.astype(dtype).T
    avail_b = ~jnp.isnan(yT)  # (p, n_b)
    avail = avail_b.astype(dtype)
    if impute:
        # keep[pi] = avail[pi] | any(avail[pi+1:]) for pi < p-1; the last
        # layer keeps its own availability (per_output keep=True).
        suffix = jnp.flip(
            lax.cummax(jnp.flip(avail_b, 0).astype(jnp.int32), axis=0), 0
        )
        keep = jnp.concatenate(
            [avail_b[:-1] | (suffix[1:] > 0), avail_b[-1:]], axis=0
        )
    else:
        keep = avail_b
    route = jnp.cumprod(keep.astype(dtype), axis=0)  # cumulative AND
    rows = {
        "route_mask": route,
        "obs_mask": route * avail,
        "avail": avail,
        "y_col": jnp.nan_to_num(yT, nan=0.0).astype(dtype),
        "w_col": wT,
    }
    return jnp.asarray(x_pad), rows


def _mesh_pad_geometry(n_rows, n_dev, sparse):
    """(pad, dense panel width) to bring ``n_rows`` to whole per-device
    rows on an ``n_dev``-device mesh — static at trace time (``n_rows``
    is a traced operand's static shape).  Sparse plans need only
    divisibility; dense plans need whole distributed-Cholesky panels
    (``parallel.dense._pad_geometry``).  The single source for every
    bucketed mesh builder (fixed fit, free fit, prior logpdf)."""
    if sparse:
        return (-n_rows) % n_dev, None
    from ..config import config as _cfg
    from ..parallel.dense import _pad_geometry

    nloc_b, blk = _pad_geometry(n_rows, n_dev, _cfg.dense_shard_block)
    return n_dev * nloc_b - n_rows, blk


def _static_plan_xs(xs_np):
    """The plan's model-structure scan inputs (everything but the per-row
    arrays), materialised as constants."""
    return {
        k: jnp.asarray(v) for k, v in xs_np.items() if k not in _ROW_KEYS
    }


def _mask_test_cov(cov_t, mt):
    """Neutralise padded test rows in a predictive covariance: masked
    rows/columns zero, identity on the padded diagonal.  The factor of the
    resulting block-diagonal matrix leaves the real block's draws
    bit-identical to the unpadded program (prefix-stable normals), which
    is what makes test-row bucketing exact rather than statistical."""
    if mt is None:
        return cov_t
    return cov_t * (mt[:, None] * mt[None, :]) + jnp.diag(1.0 - mt)


@dataclass
class ScanFitPlan:
    """Host-side precomputed plan for the scan-fused fit (static per
    (dataset, model config))."""

    m: int
    p: int
    W: int  # augmented buffer width m + p (last column is gated scratch:
    # the uniform scan body writes an augmentation column after EVERY
    # layer, including the last, whose write lands in the scratch column)
    n: int
    s_max: int  # padded per-layer latent span
    n_z: int  # total latents (dummy slot index)
    xs: dict  # stacked per-layer scan inputs (numpy)
    config: dict  # model_config (static switches read at trace time)
    sparse: bool
    impute: bool
    replace: bool


def plan_static_fingerprint(plan):
    """Byte-level fingerprint of everything a shape-bucketed program bakes
    into its trace: the plan scalars, the model-config switches, and the
    data-INDEPENDENT per-layer scan inputs (index maps + gates — the
    non-:data:`_ROW_KEYS` arrays, which enter the compiled HLO as
    constants via :func:`_static_plan_xs`).  Two regressor instances with
    equal fingerprints trace byte-identical bucketed programs (the
    per-ROW arrays, inducing inputs, and normalisation stats all ride in
    as traced arguments), so their jitted executables are interchangeable
    — the key for the cross-instance program cache
    (``regressor._shared_jit``).  Fingerprints cover greedy reordering
    (a different output order changes the gather maps' bytes)."""
    import hashlib

    def _scalar(v):
        if isinstance(v, (np.ndarray, list, tuple)):
            a = np.asarray(v)
            return (str(a.dtype), a.shape, a.tobytes())
        return repr(v)

    h = hashlib.sha256()
    cfg = tuple(sorted((k, _scalar(v)) for k, v in plan.config.items()))
    h.update(
        repr(
            (
                # NOT plan.n: the dataset's row count must not split the
                # cache — sharing across datasets in one bucket is the
                # point (the bucket size n_b is already in the jit key).
                plan.m, plan.p, plan.W, plan.s_max, plan.n_z,
                plan.sparse, plan.impute, plan.replace, cfg,
            )
        ).encode()
    )
    for k in sorted(plan.xs):
        if k in _ROW_KEYS:
            continue
        v = np.ascontiguousarray(np.asarray(plan.xs[k]))
        h.update(k.encode())
        h.update(str(v.dtype).encode())
        h.update(repr(v.shape).encode())
        h.update(v.tobytes())
    return h.hexdigest()


def _name_offsets(vs, all_names):
    offsets = {}
    off = 0
    for name in all_names:
        size = int(np.prod(vs._latents[name].shape))
        offsets[name] = (off, size)
        off += size
    return offsets, off


def _field_idx(offsets, name, actual, padded, dummy, shift=0):
    """Index map of a (possibly absent/short) variable into the flat latent
    vector, padded with the dummy slot."""
    idx = np.full(padded, dummy, dtype=np.int32)
    if name in offsets and actual > 0:
        off, size = offsets[name]
        assert size == actual, (name, size, actual)
        idx[shift : shift + actual] = np.arange(off, off + actual, dtype=np.int32)
    return idx


def _kernel_field_xs(vs, all_names, m, p, W, cfg, dtype):
    """Data-independent per-layer scan inputs: the latent-span gather map
    and the kernel-field index maps + gates consumed by
    :func:`_layer_kernel`.  Shared by the fit plan (conditioned data) and
    the prior-sampling plan (no data)."""
    offsets, n_z = _name_offsets(vs, all_names)
    dummy = n_z

    # Per-layer latent spans (the names=[f"{pi}/*"] filter,
    # ``gpar/regression.py:452-456``) padded to a uniform length.
    spans = []
    for pi in range(p):
        names_pi = vs.select([f"{pi}/*"])
        idx = np.concatenate(
            [
                np.arange(offsets[nm][0], offsets[nm][0] + offsets[nm][1])
                for nm in names_pi
            ]
        ).astype(np.int32)
        spans.append(idx)
    s_max = max(len(s) for s in spans)
    layer_gather = np.full((p, s_max), dummy, dtype=np.int32)
    for pi, s in enumerate(spans):
        layer_gather[pi, : len(s)] = s

    # Per-layer field gather maps + gates.
    from .regressor import _determine_indices

    P1 = W - m  # padded output-column count (incl. the scratch column)
    xs = {
        "layer_gather": layer_gather,
        "in_var": np.zeros((p,), np.int32),
        "in_scales": np.zeros((p, m), np.int32),
        "noise": np.zeros((p,), np.int32),
        "out_gate": np.zeros((p, P1), dtype),
        "nl_gate": np.zeros((p,), dtype),
        "outlin_scales": np.zeros((p, P1), np.int32),
        "outnl_var": np.zeros((p,), np.int32),
        "outnl_scales": np.zeros((p, P1), np.int32),
    }
    if cfg["rq"]:
        xs["in_alpha"] = np.zeros((p,), np.int32)
        xs["outnl_alpha"] = np.zeros((p,), np.int32)
    if cfg["per"]:
        xs["per_var"] = np.zeros((p,), np.int32)
        xs["per_scales"] = np.zeros((p, 2 * m), np.int32)
        xs["per_pers"] = np.zeros((p, m), np.int32)
        xs["per_decay"] = np.zeros((p, m), np.int32)
    if cfg["input_linear"]:
        xs["inlin_scales"] = np.zeros((p, m), np.int32)
        xs["inlin_const"] = np.zeros((p,), np.int32)

    for pi in range(p):
        _, p_inds, p_num = _determine_indices(m, pi, cfg["markov"])
        p_start = (p_inds[0] - m) if p_num > 0 else 0

        xs["in_var"][pi] = _field_idx(offsets, f"{pi}/input/var", 1, 1, dummy)[0]
        scales_name = f"{0 if cfg['scale_tie'] else pi}/input/scales"
        xs["in_scales"][pi] = _field_idx(offsets, scales_name, m, m, dummy)
        xs["noise"][pi] = _field_idx(offsets, f"{pi}/noise", 1, 1, dummy)[0]
        if cfg["rq"]:
            xs["in_alpha"][pi] = _field_idx(
                offsets, f"{pi}/input/alpha", 1, 1, dummy
            )[0]
            xs["outnl_alpha"][pi] = _field_idx(
                offsets, f"{pi}/output/nonlin/alpha", 1, 1, dummy
            )[0]
        if cfg["per"]:
            xs["per_var"][pi] = _field_idx(
                offsets, f"{pi}/input/per/var", 1, 1, dummy
            )[0]
            xs["per_scales"][pi] = _field_idx(
                offsets, f"{pi}/input/per/scales", 2 * m, 2 * m, dummy
            )
            xs["per_pers"][pi] = _field_idx(
                offsets, f"{pi}/input/per/pers", m, m, dummy
            )
            xs["per_decay"][pi] = _field_idx(
                offsets, f"{pi}/input/per/decay", m, m, dummy
            )
        if cfg["input_linear"]:
            xs["inlin_scales"][pi] = _field_idx(
                offsets, f"{pi}/input/lin/scales", m, m, dummy
            )
            xs["inlin_const"][pi] = _field_idx(
                offsets, f"{pi}/input/lin/const", 1, 1, dummy
            )[0]

        if p_num > 0:
            xs["out_gate"][pi, p_start : p_start + p_num] = 1.0
            if cfg["linear"]:
                xs["outlin_scales"][pi] = _field_idx(
                    offsets,
                    f"{pi}/output/lin/scales",
                    p_num,
                    P1,
                    dummy,
                    shift=p_start,
                )
        # The output terms exist whenever pi > 0 (``gpar/regression.py:
        # 141,149`` condition on the LAYER index, not the selection
        # width): at markov=0 the selection is empty and the nonlinear
        # EQ/RQ over zero dimensions degenerates to a CONSTANT
        # ``variance * 1`` kernel — a reference quirk the gate must
        # reproduce, so ``nl_gate`` keys on pi > 0 while the per-dim
        # ``out_gate`` stays zero (an all-gated EQ evaluates to exactly
        # 1, matching ``select([])``).  The empty-selection Linear term
        # contributes exactly zero either way.
        if cfg["nonlinear"] and pi > 0:
            xs["nl_gate"][pi] = 1.0
            xs["outnl_var"][pi] = _field_idx(
                offsets, f"{pi}/output/nonlin/var", 1, 1, dummy
            )[0]
            if p_num > 0:
                xs["outnl_scales"][pi] = _field_idx(
                    offsets,
                    f"{pi}/output/nonlin/scales",
                    p_num,
                    P1,
                    dummy,
                    shift=p_start,
                )

    xs["col"] = np.arange(p, dtype=np.int32)  # output column index per layer
    return xs, s_max, n_z


def build_scan_fit_plan(reg, all_names):
    """Build the per-layer stacked scan inputs from the regressor's data
    caches and variable store (everything here is concrete NumPy).

    Uses the host copies ``_rebuild_data_caches`` keeps (``reg._x_np``
    etc.) when present: on a remote-attached chip every ``np.asarray``
    of a device array is a fresh device->host fetch through the relay —
    measurable per-request latency (PERF.md finding 27)."""
    x_np = getattr(reg, "_x_np", None)
    if x_np is not None:
        return build_scan_data_plan(reg, x_np, reg._y_np, reg._w_np, all_names)
    return build_scan_data_plan(
        reg, np.asarray(reg.x), np.asarray(reg.y), np.asarray(reg.w),
        all_names,
    )


def build_scan_data_plan(reg, x_np, y_np, w_np, all_names):
    """Scan plan from EXPLICIT data arrays rather than the regressor's
    conditioned caches — the host-side half shared by the fit plan
    (``build_scan_fit_plan``) and the scored-data logpdf plan
    (``GPARRegressor.logpdf`` evaluates data that need not be the
    conditioned dataset, ``gpar/regression.py:461-506``).  The row arrays
    (:data:`_ROW_KEYS`) carry this data's values and NaN routing; the
    model-structure arrays depend only on the variable store and config,
    so two plans over different datasets share a
    :func:`plan_static_fingerprint`."""
    cfg = reg.model_config
    m, p, n = x_np.shape[1], y_np.shape[1], x_np.shape[0]
    W = m + p  # p - 1 real output columns + one gated scratch column
    dtype = np.dtype(x_np.dtype)

    avail = ~np.isnan(y_np)

    # Absolute row masks: the cumulative per_output routing
    # (``gpar/model.py:325-368``) composed onto the original n rows.
    keep = bool(reg.impute)
    route = np.ones(n, dtype=bool)
    route_mask = np.zeros((p, n), dtype=bool)
    for pi in range(p):
        if keep and pi < p - 1:
            layer_keep = avail[:, pi] | avail[:, pi + 1 :].any(axis=1)
        else:
            layer_keep = avail[:, pi]
        route = route & layer_keep
        route_mask[pi] = route
    obs_mask = route_mask & avail.T  # (p, n)

    xs, s_max, n_z = _kernel_field_xs(reg.vs, all_names, m, p, W, cfg, dtype)
    xs["route_mask"] = route_mask.astype(dtype)
    xs["obs_mask"] = obs_mask.astype(dtype)
    xs["avail"] = avail.T.astype(dtype)  # (p, n)
    xs["y_col"] = np.nan_to_num(y_np, nan=0.0).T.astype(dtype)  # (p, n)
    xs["w_col"] = w_np.T.astype(dtype)  # (p, n)

    return ScanFitPlan(
        m=m,
        p=p,
        W=W,
        n=n,
        s_max=s_max,
        n_z=n_z,
        xs=xs,
        config=dict(cfg),
        sparse=reg.sparse,
        impute=bool(reg.impute),
        replace=bool(reg.replace),
    )


def build_scan_prior_plan(reg, m, p, all_names, dtype):
    """Plan for scan-fused PRIOR sampling: the kernel-field xs only — the
    prior chain has no conditioning data, so the row arrays are absent
    (``n = 0``).

    Matches the prior branch of ``GPARRegressor.sample``
    (``gpar/regression.py:508-550``), whose ancestral chain
    (``gpar/model.py:245-277``) is consumed by :func:`make_scan_prior_tail`.
    """
    xs, s_max, n_z = _kernel_field_xs(
        reg.vs, all_names, m, p, m + p, reg.model_config, np.dtype(dtype)
    )
    return ScanFitPlan(
        m=m,
        p=p,
        W=m + p,
        n=0,
        s_max=s_max,
        n_z=n_z,
        xs=xs,
        config=dict(reg.model_config),
        sparse=reg.sparse,
        impute=bool(reg.impute),
        replace=bool(reg.replace),
    )


def _layer_kernel(plan, lin, z_full):
    """Build layer ``pi``'s prior kernel from gathered traced parameters —
    the shape-uniform equivalent of ``_model_generator``'s composition
    (``gpar/regression.py:92-180``), with gates replacing the static
    ``select``."""
    cfg = plan.config
    m, P1, W = plan.m, plan.W - plan.m, plan.W

    def nat(tr, idx):
        return tr.constrain(z_full[idx])

    ones_p1 = jnp.ones((P1,), z_full.dtype)
    ones_m = jnp.ones((m,), z_full.dtype)
    gate_in = jnp.concatenate([ones_m, jnp.zeros((P1,), z_full.dtype)])
    gate_out = jnp.concatenate([jnp.zeros((m,), z_full.dtype), lin["out_gate"]])

    # Input terms (first m dims; padded dims gated to zero).
    in_scales = jnp.concatenate([nat(_POS, lin["in_scales"]), ones_p1])
    if cfg["rq"]:
        base_in = RQ(nat(_ALPHA, lin["in_alpha"]))
    else:
        base_in = EQ()
    kin = nat(_POS, lin["in_var"]) * base_in.stretch(in_scales)
    if cfg["per"]:
        per_scales = jnp.concatenate(
            [nat(_POS, lin["per_scales"]), jnp.ones((2 * P1,), z_full.dtype)]
        )
        per_pers = jnp.concatenate([nat(_POS, lin["per_pers"]), ones_p1])
        per_decay = jnp.concatenate([nat(_POS, lin["per_decay"]), ones_p1])
        kin = kin + nat(_POS, lin["per_var"]) * EQ().stretch(per_scales).periodic(
            per_pers
        ) * EQ().stretch(per_decay)
    if cfg["input_linear"]:
        inlin_scales = jnp.concatenate([nat(_POS, lin["inlin_scales"]), ones_p1])
        kin = kin + Linear().stretch(inlin_scales) + Const(
            nat(_ID, lin["inlin_const"])
        )
    kernel = kin.gate(gate_in)

    # Output terms (appended columns; per-layer gate honours the Markov
    # order; the nonlinear variance is gated because EQ/RQ of all-zero
    # inputs is 1, not 0).
    if cfg["linear"]:
        outlin_scales = jnp.concatenate(
            [ones_m, nat(_POS, lin["outlin_scales"])]
        )
        kernel = kernel + Linear().stretch(outlin_scales).gate(gate_out)
    if cfg["nonlinear"]:
        outnl_scales = jnp.concatenate(
            [ones_m, nat(_POS, lin["outnl_scales"])]
        )
        if cfg["rq"]:
            base_out = RQ(nat(_ALPHA, lin["outnl_alpha"]))
        else:
            base_out = EQ()
        kernel = kernel + (lin["nl_gate"] * nat(_POS, lin["outnl_var"])) * (
            base_out.stretch(outnl_scales).gate(gate_out)
        )

    noise = nat(_NOISE, lin["noise"])
    return kernel, noise


def _masked_dense_factors(K, r, mask, noise_w, eps):
    """Exact masked dense marginal likelihood + posterior mean weights.

    Masked rows are replaced by identity rows (the construction used by
    ``parallel/dense.py`` for padding): they contribute exactly nothing to
    the logdet, the quadratic form, or ``alpha``.  ``safe_cholesky`` adds
    ``eps`` to the whole diagonal, so masked diagonals pre-subtract it to
    land exactly at 1.
    """
    n = K.shape[0]
    A = K * (mask[:, None] * mask[None, :])
    diag_fix = mask * noise_w + (1.0 - mask) * (1.0 - eps)
    A = A + jnp.diag(diag_fix)
    L = safe_cholesky(A)
    rm = r * mask
    v = solve_lower(L, rm)
    n_eff = jnp.sum(mask)
    from ..ops.linalg import LOG_2PI

    logpdf = (
        -0.5 * n_eff * LOG_2PI
        - jnp.sum(jnp.log(jnp.diagonal(L)) * mask)
        - 0.5 * jnp.sum(v * v)
    )
    alpha = solve_chol(L, rm)
    return logpdf, alpha, L


def _layer_nll_factors(plan, lin, z_full, x_aug, zi_aug, eps):
    """Single-device layer NLL + posterior-mean factors in uniform shapes:
    the sparse (Titsias, ``ops.linalg.titsias_factors``) or masked dense
    marginal likelihood of layer ``lin`` at parameters ``z_full``, plus
    the factors :func:`_est_from_factors` turns into posterior-mean
    estimates for the augmentation step.  Shared by the scan fit body
    (non-mesh branches) and the free (fix=False) chain objective."""
    kernel, noise = _layer_kernel(plan, lin, z_full)
    # Same float32 noise floor as gp/core._noise_vec (f64 no-op) — keeps
    # scan and unrolled objectives bit-consistent.
    noise_w = floor_noise(noise / lin["w_col"])
    omask = lin["obs_mask"]
    r = lin["y_col"]  # zero-filled; masked rows neutralised
    if plan.sparse:
        Kmm = gram(kernel, zi_aug, zi_aug)
        Kmn = gram(kernel, zi_aug, x_aug)
        knn = kdiag(kernel, x_aug)
        elbo, Lm, LB, beta = titsias_factors(
            Kmm, Kmn, knn, r, jnp.zeros_like(r), noise_w, mask=omask
        )
        return -elbo, (Kmm, Kmn, beta)
    K = gram(kernel, x_aug, x_aug)
    logpdf, alpha, _ = _masked_dense_factors(K, r, omask, noise_w, eps)
    return -logpdf, (K, alpha)


def _mesh_layer_nll_factors(
    plan, lin, z_full, x_aug, zi_aug, eps, shard_axis, dense_block, n_dev
):
    """Mesh (shard_map-local) layer NLL + posterior-mean factors — the
    distributed counterpart of :func:`_layer_nll_factors`, evaluated on one
    row shard with cross-device collectives.  Shared by the fixed scan fit
    body and the free (fix=False) chain objective under a mesh.

    - Sparse plans: the layer ELBO reduces through
      :func:`gpar_tpu.parallel.sharded.titsias_psum_body` (one (m, m) psum
      + one scalar psum per evaluation) — O(n m²/P) per device.
    - Dense plans: the masked covariance rows are built locally
      (``gram(kernel, x_local, x_full)`` after one (n, W) all_gather) and
      factorised cooperatively by the distributed blocked Cholesky with
      its distributed custom-VJP backward
      (``parallel/dense._chol_logpdf_core``) — O(n³/P) compute and
      O(n²/P) memory per device.
    """
    kernel, noise = _layer_kernel(plan, lin, z_full)
    # Same float32 noise floor as gp/core._noise_vec (f64 no-op) —
    # keeps scan and unrolled objectives bit-consistent.
    noise_w = floor_noise(noise / lin["w_col"])
    omask = lin["obs_mask"]
    r = lin["y_col"]  # zero-filled; masked rows neutralised
    if plan.sparse:
        from ..parallel.sharded import titsias_psum_body

        Kmm = gram(kernel, zi_aug, zi_aug)
        Lm = safe_cholesky(Kmm)
        Kmn = gram(kernel, zi_aug, x_aug)  # (m, n_local)
        A0 = solve_lower(Lm, Kmn)
        knn = kdiag(kernel, x_aug)
        elbo, LB, beta = titsias_psum_body(
            Lm, A0, knn, r, noise_w, omask, shard_axis
        )
        return -elbo, (Kmm, Kmn, beta)
    # Distributed masked dense factors: the same construction as
    # parallel/dense.sharded_dense_factors, but on the scan's per-layer
    # masks (padding and per_output routing are both just masked-out
    # identity rows).
    from ..parallel.dense import _chol_logpdf_core

    n_local = x_aug.shape[0]
    n_tot = n_local * n_dev
    x_full = lax.all_gather(x_aug, shard_axis, axis=0, tiled=True)
    mask_full = lax.all_gather(omask, shard_axis, axis=0, tiled=True)
    K_local = gram(kernel, x_aug, x_full)
    A_local = K_local * (omask[:, None] * mask_full[None, :])
    grows = lax.axis_index(shard_axis) * n_local + jnp.arange(n_local)
    col_is_diag = grows[:, None] == jnp.arange(n_tot)[None, :]
    diag_term = omask * (noise_w + eps) + (1.0 - omask)
    A_local = A_local + jnp.where(col_is_diag, diag_term[:, None], 0.0)
    logpdf, _L_local, alpha = _chol_logpdf_core(
        (shard_axis, dense_block), A_local, r * omask, omask
    )
    return -logpdf, (K_local, alpha)


def _est_from_factors(plan, factors):
    """Posterior-mean estimates at the data rows (and inducing points,
    sparse) from :func:`_layer_nll_factors`'s factors — the quantities the
    resumable-inputs augmentation step feeds forward
    (``gpar/model.py:291-322``)."""
    if plan.sparse:
        Kmm, Kmn, beta = factors
        return Kmn.T @ beta, Kmm @ beta
    K, alpha = factors
    return K @ alpha, None


def _augment_cols(plan, lin, est_rows, est_ind, x_aug, zi_aug):
    """One input-augmentation step in uniform shapes: write the
    (imputed/replaced) output column into the augmented buffers per the
    reference rules (``gpar/model.py:291-322``)."""
    avail = lin["avail"]
    y_col = lin["y_col"]
    if plan.impute and plan.replace:
        y_next = est_rows
    elif plan.impute:
        y_next = jnp.where(avail > 0, y_col, est_rows)
    elif plan.replace:
        y_next = jnp.where(avail > 0, est_rows, y_col)
    else:
        y_next = y_col

    col = plan.m + lin["col"]
    x_aug = lax.dynamic_update_slice(
        x_aug, y_next[:, None], (jnp.int32(0), jnp.asarray(col, jnp.int32))
    )
    if plan.sparse:
        zi_aug = lax.dynamic_update_slice(
            zi_aug,
            est_ind[:, None],
            (jnp.int32(0), jnp.asarray(col, jnp.int32)),
        )
    return x_aug, zi_aug


def _committed_plan_xs(xs_np, mesh):
    """Pre-commit the plan's per-layer arrays for a program that shares an
    XLA computation with ``shard_map`` collectives.

    Returns ``None`` when no mesh is active — the builders then materialise
    the arrays inside the trace as plain constants (measured fine
    single-device).  Under a mesh, numpy constants materialised inside the
    trace become foldable XLA literals, and the constant folder has been
    observed to mis-evaluate folded prologues in programs containing
    shard_map collectives on some hosts (PERF.md finding 18; CLAUDE.md) —
    so install them ONCE at build time as explicitly replicated, committed
    ``jax.device_put`` arrays, which enter the program as parameters.
    """
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    return {k: jax.device_put(np.asarray(v), rep) for k, v in xs_np.items()}


def _plan_xs(xs_np, xs_dev):
    """Materialise the plan's per-layer scan inputs inside a trace: the
    committed replicated device arrays when a mesh is active (see
    :func:`_committed_plan_xs`), plain constants otherwise."""
    if xs_dev is not None:
        return dict(xs_dev)
    return {k: jnp.asarray(v) for k, v in xs_np.items()}


def _shard_plan_xs(xs_np, mesh, shard_axis, n_pad):
    """Pad the plan's per-ROW arrays (:data:`_ROW_KEYS`) to the device
    geometry host-side and install everything on the mesh with explicit
    shardings at BUILD time: row arrays shard along ``shard_axis``, the
    rest replicate.  Closing over committed ``jax.Array``s (instead of
    numpy constants materialised inside the trace) keeps this data out of
    XLA's constant folder — whose evaluation through the shard_map
    collectives was observed to be WRONG on some hosts (NaN objectives on
    XLA:CPU; the identical program with the data as parameters is
    correct; PERF.md finding 18) — and out of the compiled program's
    literal pool.  ``w_col`` pads with 1 (it divides the noise);
    masks/data with 0 — masked rows contribute exactly nothing
    (``titsias_psum_body`` / identity rows in the dense factor).  Shared
    by the fixed and free mesh fit bodies."""
    from jax.sharding import NamedSharding, PartitionSpec as PSpec

    xs_dev = {}
    for k, v in xs_np.items():
        v = np.asarray(v)
        if k in _ROW_KEYS:
            if n_pad:
                cval = 1.0 if k == "w_col" else 0.0
                v = np.pad(v, ((0, 0), (0, n_pad)), constant_values=cval)
            sharding = NamedSharding(mesh, PSpec(None, shard_axis))
        else:
            sharding = NamedSharding(mesh, PSpec())
        xs_dev[k] = jax.device_put(v, sharding)
    return xs_dev


def _bucketed_plan_xs(xs_np, xs_dev):
    """Model-structure scan inputs for a shape-bucketed (rows-traced)
    program: the committed replicated device arrays when a mesh is active
    (the constant-folding hazard, see :func:`_committed_plan_xs`), plain
    constants otherwise.  The per-row arrays ride in as traced arguments
    either way (the caller merges ``xs_rows`` on top)."""
    if xs_dev is not None:
        return {k: xs_dev[k] for k in xs_np if k not in _ROW_KEYS}
    return _static_plan_xs(xs_np)


def _pop_x_ind(xs_rows):
    """Split the traced inducing inputs out of a bucketed row-args dict
    (``GPARRegressor._bucket_fit_inputs`` adds them for sparse models so
    the compiled HLO carries NO dataset-dependent constants — inducing
    inputs are data-derived in every reference workload,
    ``/root/reference/examples/paper/air_temp.py:33``): they are (M, m),
    not per-row, so they must not enter the per-layer scan."""
    if xs_rows is None or "x_ind" not in xs_rows:
        return xs_rows, None
    xs_rows = dict(xs_rows)
    return xs_rows, xs_rows.pop("x_ind")


def _zi(x_ind, zi_t, dtype):
    """The inducing inputs inside a trace: the traced argument when shape
    bucketing threads one through (:func:`_pop_x_ind`), the build-time
    constant otherwise."""
    if zi_t is not None:
        return zi_t.astype(dtype)
    return jnp.asarray(x_ind, dtype=dtype)


def resolve_sample_chunk(sample_chunk, num_samples, n_test, dtype, budget):
    """Effective sample-axis chunk for the per-sample serving tails.

    ``sample_chunk`` is ``config.predict_sample_chunk``: ``"auto"`` sizes
    chunks so ~4 live (chunk, n_test, n_test) buffers — the batched
    covariance, its PSD factor, and the retry ladder's temporaries in
    :func:`gpar_tpu.ops.linalg.psd_sample_factor_batched` — fit inside
    ``budget`` bytes (``config.predict_memory_budget``); an int passes
    through; ``None``/``0`` disables chunking.  Returns ``None`` when no
    chunking is needed (the whole batch fits)."""
    if sample_chunk == "auto":
        per_sample = 4 * n_test * n_test * np.dtype(dtype).itemsize
        chunk = max(1, int(budget // max(per_sample, 1)))
        return None if chunk >= num_samples else chunk
    if not sample_chunk:
        return None
    return int(sample_chunk)


def _chunked_batch(batch_fn, xt_b, keys, sample_chunk):
    """Run a per-sample tail body over the sample axis, optionally in
    ``lax.map`` chunks of ``sample_chunk`` (peak memory O(chunk · n_test²)
    per layer instead of O(S · n_test²)).  Shared by the ancestral and
    prior serving tails; ``batch_fn(xt_b, keys) -> (xt_b, keys, rets)``
    is the one-vmap body.  Padding replicates the leading samples and is
    sliced back off, so chunked draws bit-match the unchunked tail per
    key."""
    S, n_test, W = xt_b.shape
    if sample_chunk is None or sample_chunk >= S:
        return batch_fn(xt_b, keys)
    pad = (-S) % sample_chunk
    xt_p = jnp.concatenate([xt_b, xt_b[:pad]]) if pad else xt_b
    keys_p = jnp.concatenate([keys, keys[:pad]]) if pad else keys
    nch = (S + pad) // sample_chunk

    def chunk(args):
        return batch_fn(*args)

    xt_p, keys_p, rets_p = lax.map(
        chunk,
        (
            xt_p.reshape(nch, sample_chunk, n_test, W),
            # *shape[1:] keeps both key layouts working: raw uint32 keys
            # are (S, 2), typed PRNG keys are (S,).
            keys_p.reshape(nch, sample_chunk, *keys_p.shape[1:]),
        ),
    )
    return (
        xt_p.reshape(-1, n_test, W)[:S],
        keys_p.reshape(-1, *keys_p.shape[2:])[:S],
        rets_p.reshape(-1, n_test)[:S],
    )


def make_scan_fit_body(
    plan,
    x_ind,
    iters,
    gtol,
    memory_size,
    restarts,
    restart_scale,
    mesh=None,
    shard_axis="dp",
    rows_traced=False,
):
    """The traced scan-fused whole-fit body ``(z_all, x, layer_keys) ->
    (z_final, layer_nll, layer_iters, layer_nll0)`` — same contract as
    ``regressor._build_fused_fit_body`` but one compiled layer body.

    With ``mesh`` set, the whole scan runs inside one ``shard_map`` over
    the mesh: data rows (the augmented buffer and every per-layer (p, n)
    scan input) shard over ``shard_axis`` and the small L-BFGS state stays
    replicated in lockstep on every device — cold compile O(1) in p AND
    per-device work O(1/P) in n, combining the two scaling axes.

    - Sparse plans: the layer ELBO reduces through
      :func:`gpar_tpu.parallel.sharded.titsias_psum_body` (one (m, m)
      psum + one scalar psum per evaluation) — O(n m²/P) per device.
    - Dense plans: the masked covariance rows are built locally
      (``gram(kernel, x_local, x_full)`` after one (n, W) all_gather) and
      factorised cooperatively by the distributed blocked Cholesky with
      its distributed custom-VJP backward
      (``parallel/dense._chol_logpdf_core``) — O(n³/P) compute and
      O(n²/P) memory per device.

    Rows are padded to the device geometry with zeroed masks — identity
    rows in the dense covariance, ``D^{-1} = 0`` in the ELBO — the exact
    neutralisation both distributed kernels document.
    """
    m, p, W, n = plan.m, plan.p, plan.W, plan.n
    sparse = plan.sparse
    xs_np = plan.xs

    dense_block = None
    if mesh is not None and not sparse:
        from ..config import config as _cfg
        from ..parallel.dense import _pad_geometry

        _nloc, dense_block = _pad_geometry(
            n, mesh.devices.size, _cfg.dense_shard_block
        )

    def _scan_chain(z_all, x_local, xs, n_rows, zi_t=None, block=None):
        """The shared scan over layers; ``x_local``/(p, n_rows) scan inputs
        may be the full data (single-device) or one shard (mesh mode).
        ``block`` overrides the build-time dense panel width (the bucketed
        mesh program derives its geometry from the bucket, not the
        dataset's row count)."""
        blk = dense_block if block is None else block
        dtype = x_local.dtype
        eps = resolve_epsilon(dtype)
        z_ext = jnp.concatenate([z_all, jnp.zeros((1,), z_all.dtype)])
        x_aug = jnp.concatenate(
            [x_local, jnp.zeros((n_rows, W - m), dtype)], axis=1
        )
        if sparse:
            zi = _zi(x_ind, zi_t, dtype)
            n_ind = zi.shape[0]
            zi_aug = jnp.concatenate(
                [zi, jnp.zeros((n_ind, W - m), dtype)], axis=1
            )
        else:
            zi_aug = jnp.zeros((0, W), dtype)

        def layer_nll_and_factors(lin, z_full, x_aug, zi_aug):
            if mesh is None:
                return _layer_nll_factors(plan, lin, z_full, x_aug, zi_aug, eps)
            return _mesh_layer_nll_factors(
                plan, lin, z_full, x_aug, zi_aug, eps, shard_axis,
                blk, mesh.devices.size,
            )

        def step(carry, lin):
            z_ext, x_aug, zi_aug = carry

            def obj(z_pi):
                z_full = z_ext.at[lin["layer_gather"]].set(z_pi)
                nll, _ = layer_nll_and_factors(lin, z_full, x_aug, zi_aug)
                return nll

            z0_pi = z_ext[lin["layer_gather"]]
            z_pi_opt, nll_pi, it_pi, nll0_pi = lbfgs_traced_restarts(
                obj,
                z0_pi,
                lin["key"],
                restarts,
                restart_scale=restart_scale,
                iters=iters,
                gtol=gtol,
                memory_size=memory_size,
            )
            z_ext = z_ext.at[lin["layer_gather"]].set(z_pi_opt)
            z_ext = z_ext.at[-1].set(0.0)

            # One augmentation step (the resumable-inputs contract,
            # ``gpar/model.py:291-322``): posterior-mean estimates fill the
            # next input column per the impute/replace rules.
            z_full = z_ext.at[lin["layer_gather"]].set(z_pi_opt)
            _, factors = layer_nll_and_factors(lin, z_full, x_aug, zi_aug)
            est_rows, est_ind = _est_from_factors(plan, factors)

            x_aug, zi_aug = _augment_cols(plan, lin, est_rows, est_ind, x_aug, zi_aug)
            return (z_ext, x_aug, zi_aug), (nll_pi, it_pi, nll0_pi)

        (z_ext, _, _), (layer_nll, layer_iters, layer_nll0) = lax.scan(
            step, (z_ext, x_aug, zi_aug), xs
        )
        return z_ext[:-1], layer_nll, layer_iters, layer_nll0

    if mesh is None:
        if rows_traced:
            # Shape-bucketed form: the per-row plan arrays ride in as
            # traced arguments (padded to the bucket by
            # :func:`pad_plan_rows`), so the compiled program is
            # data-independent — one executable per (model structure,
            # bucket) serves every dataset in the size range.

            def program(z_all, x, layer_keys, xs_rows):
                xs_rows, zi_t = _pop_x_ind(xs_rows)
                xs = _static_plan_xs(xs_np)
                xs.update(xs_rows)
                xs["key"] = layer_keys
                return _scan_chain(z_all, x, xs, x.shape[0], zi_t)

            return program

        def program(z_all, x, layer_keys):
            xs = {k: jnp.asarray(v) for k, v in xs_np.items()}
            xs["key"] = layer_keys
            return _scan_chain(z_all, x, xs, n)

        return program

    from jax.sharding import PartitionSpec as PSpec

    n_dev = mesh.devices.size
    if rows_traced:
        # Shape-bucketed mesh form: the caller passes the per-row plan
        # arrays padded to the bucket as TRACED arguments (pad_plan_rows),
        # so one compiled mesh program serves every dataset in the size
        # range — the same cross-dataset/cross-instance reuse as the
        # single-device bucketed path, composed with the shard_map row
        # sharding.  Model-structure scan inputs stay committed replicated
        # device arrays (the shard_map constant-folding hazard, PERF.md
        # finding 18); geometry padding from the bucket to whole
        # per-device rows happens inside the trace (static: a function of
        # the bucket size only).
        xs_static_dev = _shard_plan_xs(
            {k: v for k, v in xs_np.items() if k not in _ROW_KEYS},
            mesh, shard_axis, 0,
        )

        def _geometry(n_rows):
            return _mesh_pad_geometry(n_rows, n_dev, sparse)

        def program(z_all, x, layer_keys, xs_rows):
            xs_rows, zi_t = _pop_x_ind(xs_rows)
            n_pad_b, blk = _geometry(x.shape[0])
            x_p = jnp.pad(x, ((0, n_pad_b), (0, 0))) if n_pad_b else x
            xs = dict(xs_static_dev)
            for k, v in xs_rows.items():
                if n_pad_b:
                    cval = 1.0 if k == "w_col" else 0.0
                    v = jnp.pad(
                        v, ((0, 0), (0, n_pad_b)), constant_values=cval
                    )
                xs[k] = v
            xs["key"] = layer_keys
            xs_specs = {
                k: PSpec(None, shard_axis) if k in _ROW_KEYS else PSpec()
                for k in xs
            }

            def local(z_all, x_loc, xs_loc, zi_t=None):
                return _scan_chain(
                    z_all, x_loc, xs_loc, x_loc.shape[0], zi_t, block=blk
                )

            if zi_t is not None:
                fn = jax.shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(
                        PSpec(), PSpec(shard_axis), xs_specs, PSpec(),
                    ),
                    out_specs=(PSpec(), PSpec(), PSpec(), PSpec()),
                )
                return fn(z_all, x_p, xs, zi_t)

            fn = jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(PSpec(), PSpec(shard_axis), xs_specs),
                out_specs=(PSpec(), PSpec(), PSpec(), PSpec()),
            )
            return fn(z_all, x_p, xs)

        return program

    if sparse:
        n_pad = (-n) % n_dev
    else:
        # The distributed Cholesky needs per-device rows in whole panels.
        n_pad = n_dev * _nloc - n
    xs_dev = _shard_plan_xs(xs_np, mesh, shard_axis, n_pad)

    def program(z_all, x, layer_keys):
        x_p = jnp.pad(x, ((0, n_pad), (0, 0))) if n_pad else x
        xs = dict(xs_dev)
        xs["key"] = layer_keys

        xs_specs = {
            k: PSpec(None, shard_axis) if k in _ROW_KEYS else PSpec()
            for k in xs
        }

        def local(z_all, x_loc, xs_loc):
            return _scan_chain(z_all, x_loc, xs_loc, x_loc.shape[0])

        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(PSpec(), PSpec(shard_axis), xs_specs),
            out_specs=(PSpec(), PSpec(), PSpec(), PSpec()),
        )
        return fn(z_all, x_p, xs)

    return program


def make_batched_fit_body(plan, iters, gtol, memory_size, restarts, restart_scale):
    """All p layers' L-BFGS fits batched in ONE ``vmap`` — the TPU-native
    answer to SURVEY §2.4's pipeline-parallelism row.

    The survey's PP analogue observes that per-layer hyperparameter fits of
    *fixed* layers are independent given cached inputs.  On a single TPU
    core, pipelining (overlapping layer pi+1's work with layer pi's tail)
    buys nothing — XLA executes one compute op at a time — but the same
    independence enables something better: *batching*.  When no estimated
    output feeds forward, every layer's objective depends only on its own
    latent span and the raw data, so the p optimisations run as one vmapped
    L-BFGS whose every ELBO evaluation is a p-stacked batch of kernels/
    factorisations — p-fold larger MXU ops for the small dense workloads
    (EEG/exchange-scale) where per-layer matrices underutilise the chip.

    Independence requires ALL of (validated here, dispatched by
    ``GPARRegressor._use_scan_body``):

    - dense (no inducing points: sparse chains always impute the inducing
      outputs with posterior means, ``gpar/model.py:315-322``);
    - ``replace=False`` (replace feeds posterior means into observed rows,
      ``gpar/model.py:308``);
    - fully-observed data (with NaNs present, ``impute=True`` feeds
      estimates forward; fully observed, impute is a no-op);
    - ``scale_tie=False`` (tied input scales make every layer read layer
      0's variables, ``gpar/regression.py:151``, so layer order matters).

    Semantics equal the sequential scan body exactly under these
    conditions (oracle-tested): the augmented buffer is pre-filled with
    the observed output columns, gates hide the columns later layers may
    not see.
    """
    if plan.sparse:
        raise ValueError("batched layer fits require a dense model")
    if plan.replace:
        raise ValueError("batched layer fits require replace=False")
    if plan.config["scale_tie"]:
        raise ValueError("batched layer fits require scale_tie=False")
    if not np.all(np.asarray(plan.xs["avail"]) == 1.0):
        raise ValueError("batched layer fits require fully-observed data")
    m, p, W, n = plan.m, plan.p, plan.W, plan.n
    xs_np = plan.xs

    def program(z_all, x, layer_keys):
        dtype = x.dtype
        eps = resolve_epsilon(dtype)
        xs = {k: jnp.asarray(v) for k, v in xs_np.items()}
        xs["key"] = layer_keys
        z_ext = jnp.concatenate([z_all, jnp.zeros((1,), z_all.dtype)])
        # All augmentation columns are the observed outputs — known up
        # front; per-layer gates hide the not-yet-visible ones.
        x_aug = jnp.concatenate([x, xs["y_col"].T], axis=1)  # (n, W)

        def one_layer(lin):
            def obj(z_pi):
                z_full = z_ext.at[lin["layer_gather"]].set(z_pi)
                kernel, noise = _layer_kernel(plan, lin, z_full)
                noise_w = floor_noise(noise / lin["w_col"])
                K = gram(kernel, x_aug, x_aug)
                logpdf, _, _ = _masked_dense_factors(
                    K, lin["y_col"], lin["obs_mask"], noise_w, eps
                )
                return -logpdf

            z0_pi = z_ext[lin["layer_gather"]]
            return lbfgs_traced_restarts(
                obj,
                z0_pi,
                lin["key"],
                restarts,
                restart_scale=restart_scale,
                iters=iters,
                gtol=gtol,
                memory_size=memory_size,
            )

        z_opt, layer_nll, layer_iters, layer_nll0 = jax.vmap(one_layer)(xs)
        # Scatter every layer's optimised span back; spans are disjoint
        # without scale_tie, and the padded gather slots all alias the
        # dummy latent, re-zeroed after the scatter (same trick as the
        # scan body).
        z_ext = z_ext.at[jnp.reshape(xs["layer_gather"], (-1,))].set(
            jnp.reshape(z_opt, (-1,))
        )
        z_ext = z_ext.at[-1].set(0.0)
        return z_ext[:-1], layer_nll, layer_iters, layer_nll0

    return program


def make_scan_free_fit_body(
    plan, x_ind, iters, gtol, memory_size, restarts, restart_scale,
    rows_traced=False, mesh=None, shard_axis="dp",
):
    """The scan-fused whole-fit body for ``fit(fix=False)`` — compile
    O(1) in p.

    Reference semantics (``gpar/regression.py:452-456``): at position pi
    the objective is the FULL chain marginal likelihood of layers
    ``0..pi`` re-evaluated from the raw inputs (earlier layers'
    hyperparameters keep moving and the impute/replace augmentation is
    recomputed inside every objective evaluation), optimising all latents
    ``{0..pi}/*`` jointly.  The unrolled builder
    (``regressor._build_free_fused_fit_body``) traces the layer-0..pi
    chain once per position — O(p²/2) layer bodies in the compiled
    program, a compile blow-up at stress scale (p=32).  This makes both
    axes shape-uniform:

    - the OUTER loop over positions is one ``lax.scan`` whose step runs
      one L-BFGS on the position's prefix objective (prefix latent spans
      gathered through per-position index maps padded with the dummy
      slot, exactly like the per-layer spans of the fixed scan body);
    - the INNER chain evaluation is one ``lax.scan`` over ALL p layers
      whose per-layer NLLs are multiplied by a 0/1 *contribution gate*
      (``gate[pi, l] = l <= pi``) before summing — layers beyond the
      prefix run but contribute exactly zero, so the gated sum equals the
      prefix-chain logpdf bit-for-bit (their augmentation writes land in
      columns the prefix never reads).

    The traded cost is FLOPs, not compile: every objective evaluation
    runs all p layers (the unrolled body runs pi+1), ~2× the chain work
    on average — the right trade on TPU, where the unrolled body's
    O(p²/2) HLO copies dominate end-to-end time through XLA compilation
    long before the MXU is the bottleneck.  Contract and outputs match
    ``_build_free_fused_fit_body`` (the reported ``layer_nll`` is the
    full prefix-chain NLL per position); oracle-tested against the
    per-layer driver (``tests/test_fused_scan.py::
    test_free_fused_fit_matches_driver``).

    With ``mesh`` set, the whole two-level scan runs inside one
    ``shard_map`` over the mesh — the same geometry as the fixed body's
    mesh path (:func:`make_scan_fit_body`): data rows and every per-row
    scan input shard over ``shard_axis``, the L-BFGS state stays
    replicated in lockstep, and each chain evaluation reduces through
    :func:`_mesh_layer_nll_factors` — cold compile O(1) in p AND
    per-device work O(1/P) in n on the fix=False path too (the O(p²/2)
    unrolled mesh fallback survives only as the ``fused="unroll"``
    oracle).  With ``rows_traced`` too (shape bucketing under a mesh),
    the per-row plan arrays ride in as traced arguments and geometry
    padding happens inside the trace — one compiled mesh program per
    bucket, shared across datasets and instances.
    """
    m, p, W, n = plan.m, plan.p, plan.W, plan.n
    sparse = plan.sparse
    xs_np = plan.xs

    dense_block = None
    if mesh is not None and not sparse:
        from ..config import config as _cfg
        from ..parallel.dense import _pad_geometry

        _nloc, dense_block = _pad_geometry(
            n, mesh.devices.size, _cfg.dense_shard_block
        )

    # Per-position prefix gathers (the names=[f"{i}/*" for i in 0..pi]
    # filter) padded with the dummy slot.  Spans are disjoint by
    # construction (scale_tie's shared variable lives in layer 0's span),
    # so the prefix is the concatenation of the per-layer spans.
    lg = np.asarray(xs_np["layer_gather"])  # (p, s_max), dummy-padded
    dummy = plan.n_z
    prefix_gather = np.full((p, plan.n_z), dummy, dtype=np.int32)
    for pi in range(p):
        idx = np.concatenate([row[row != dummy] for row in lg[: pi + 1]])
        prefix_gather[pi, : len(idx)] = idx

    def _free_chain(
        z_all, x_local, xs, layer_keys, pg_all, gates, zi_t=None, block=None
    ):
        """The shared two-level scan; ``x_local``/per-row ``xs`` entries
        may be the full data (single-device) or one shard (mesh mode).
        ``block`` overrides the build-time dense panel width (the bucketed
        mesh program derives its geometry from the bucket)."""
        blk = dense_block if block is None else block
        dtype = x_local.dtype
        eps = resolve_epsilon(dtype)
        x_aug0 = jnp.concatenate(
            [x_local, jnp.zeros((x_local.shape[0], W - m), dtype)], axis=1
        )
        if sparse:
            zi = _zi(x_ind, zi_t, dtype)
            zi_aug0 = jnp.concatenate(
                [zi, jnp.zeros((zi.shape[0], W - m), dtype)], axis=1
            )
        else:
            zi_aug0 = jnp.zeros((0, W), dtype)

        def layer_eval(lin, z_full, x_aug, zi_aug):
            if mesh is None:
                return _layer_nll_factors(plan, lin, z_full, x_aug, zi_aug, eps)
            return _mesh_layer_nll_factors(
                plan, lin, z_full, x_aug, zi_aug, eps, shard_axis,
                blk, mesh.devices.size,
            )

        def chain_nll(z_ext, gate):
            """Gated full-chain NLL: one scan over ALL p layers from the
            raw inputs (the reference's full re-evaluation per objective
            call, ``gpar/regression.py:452-456``)."""

            def step(carry, lin_g):
                lin, g = lin_g
                x_aug, zi_aug = carry
                nll, factors = layer_eval(lin, z_ext, x_aug, zi_aug)
                est_rows, est_ind = _est_from_factors(plan, factors)
                x_aug, zi_aug = _augment_cols(
                    plan, lin, est_rows, est_ind, x_aug, zi_aug
                )
                return (x_aug, zi_aug), g * nll

            _, nlls = lax.scan(step, (x_aug0, zi_aug0), (xs, gate))
            return jnp.sum(nlls)

        def position_step(z_ext, pin):
            pg, gate, key = pin

            def obj(z_sub):
                # Padded slots all alias the dummy latent (last-wins
                # garbage there feeds only gated-out kernel fields — the
                # same construction the fixed scan body uses).
                z_full = z_ext.at[pg].set(z_sub)
                return chain_nll(z_full, gate)

            z0_sub = z_ext[pg]
            z_sub_opt, nll_pi, it_pi, nll0_pi = lbfgs_traced_restarts(
                obj,
                z0_sub,
                key,
                restarts,
                restart_scale=restart_scale,
                iters=iters,
                gtol=gtol,
                memory_size=memory_size,
            )
            z_ext = z_ext.at[pg].set(z_sub_opt)
            z_ext = z_ext.at[-1].set(0.0)
            return z_ext, (nll_pi, it_pi, nll0_pi)

        z_ext = jnp.concatenate([z_all, jnp.zeros((1,), z_all.dtype)])
        z_ext, (layer_nll, layer_iters, layer_nll0) = lax.scan(
            position_step, z_ext, (pg_all, gates, layer_keys)
        )
        return z_ext[:-1], layer_nll, layer_iters, layer_nll0

    # gates[pi, l] = layer l contributes at position pi
    gates_np = np.tril(np.ones((p, p), dtype=np.asarray(xs_np["y_col"]).dtype))

    if mesh is None:

        def program(z_all, x, layer_keys, xs_rows=None):
            xs_rows, zi_t = _pop_x_ind(xs_rows)
            if rows_traced:
                xs = _static_plan_xs(xs_np)
                xs.update(xs_rows)
            else:
                xs = {k: jnp.asarray(v) for k, v in xs_np.items()}
            gates = jnp.asarray(gates_np, dtype=x.dtype)
            pg_all = jnp.asarray(prefix_gather)
            return _free_chain(z_all, x, xs, layer_keys, pg_all, gates, zi_t)

        return program

    from jax.sharding import NamedSharding, PartitionSpec as PSpec

    n_dev = mesh.devices.size
    if sparse:
        n_pad = (-n) % n_dev
    else:
        # The distributed Cholesky needs per-device rows in whole panels.
        n_pad = n_dev * _nloc - n
    xs_dev = _shard_plan_xs(
        {k: v for k, v in xs_np.items() if not (rows_traced and k in _ROW_KEYS)},
        mesh, shard_axis, n_pad,
    )
    # The position-scan constants enter as committed replicated parameters
    # too (the shard_map constant-folding hazard, PERF.md finding 18).
    rep = NamedSharding(mesh, PSpec())
    pg_dev = jax.device_put(prefix_gather, rep)
    gates_dev = jax.device_put(gates_np, rep)

    def _run(z_all, x_p, xs, layer_keys, zi_t=None, block=None):
        xs_specs = {
            k: PSpec(None, shard_axis) if k in _ROW_KEYS else PSpec()
            for k in xs
        }

        def local(z_all, x_loc, xs_loc, keys, pg, gates, zi_t=None):
            return _free_chain(
                z_all, x_loc, xs_loc, keys, pg, gates, zi_t, block=block
            )

        if zi_t is not None:
            fn = jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    PSpec(), PSpec(shard_axis), xs_specs, PSpec(), PSpec(),
                    PSpec(), PSpec(),
                ),
                out_specs=(PSpec(), PSpec(), PSpec(), PSpec()),
            )
            return fn(z_all, x_p, xs, layer_keys, pg_dev, gates_dev, zi_t)
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                PSpec(), PSpec(shard_axis), xs_specs, PSpec(), PSpec(),
                PSpec(),
            ),
            out_specs=(PSpec(), PSpec(), PSpec(), PSpec()),
        )
        return fn(z_all, x_p, xs, layer_keys, pg_dev, gates_dev)

    if rows_traced:
        # Shape-bucketed mesh form (see make_scan_fit_body): per-row plan
        # arrays ride as traced arguments, geometry padding is a static
        # function of the bucket size.
        def _geometry(n_rows):
            return _mesh_pad_geometry(n_rows, n_dev, sparse)

        def program(z_all, x, layer_keys, xs_rows):
            xs_rows, zi_t = _pop_x_ind(xs_rows)
            n_pad_b, blk = _geometry(x.shape[0])
            x_p = jnp.pad(x, ((0, n_pad_b), (0, 0))) if n_pad_b else x
            xs = dict(xs_dev)
            for k, v in xs_rows.items():
                if n_pad_b:
                    cval = 1.0 if k == "w_col" else 0.0
                    v = jnp.pad(
                        v, ((0, 0), (0, n_pad_b)), constant_values=cval
                    )
                xs[k] = v
            return _run(z_all, x_p, xs, layer_keys, zi_t, block=blk)

        return program

    def program(z_all, x, layer_keys):
        x_p = jnp.pad(x, ((0, n_pad), (0, 0))) if n_pad else x
        return _run(z_all, x_p, dict(xs_dev), layer_keys)

    return program


def make_scan_logpdf_body(plan, x_ind, rows_traced=False, mesh=None,
                          shard_axis="dp"):
    """Scan-fused PRIOR logpdf of a dataset: ``program(z_all, x[, xs_rows])
    -> scalar`` — the chain accumulation of ``GPAR.logpdf``
    (``gpar/model.py:178-243`` with ``only_last_layer=False``,
    ``sample_missing=False``) in the shape-uniform scan form, backing
    ``GPARRegressor.logpdf(posterior=False)``
    (``gpar/regression.py:461-506``).

    Exactly the fixed fit body's chain (:func:`make_scan_fit_body`) minus
    the per-layer L-BFGS: per layer, the masked marginal likelihood
    (:func:`_layer_nll_factors` — Titsias ELBO or masked dense MVN) at the
    CURRENT latents, then one impute/replace augmentation step
    (:func:`_augment_cols`).  The total logpdf is the negated sum of the
    per-layer NLLs.

    With ``rows_traced`` (shape bucketing), the scored data's row arrays
    (values, weights, NaN routing — :func:`pad_plan_rows`) and the
    inducing inputs ride in as traced arguments, so the compiled program
    is data-independent: one executable per (model structure, row bucket)
    scores every dataset in the size range — the held-out model-comparison
    loop pays ZERO per-dataset compiles.

    With ``mesh`` (requires ``rows_traced``), the whole chain runs inside
    one ``shard_map`` with the scored rows sharded over ``shard_axis`` —
    the same geometry as the fit body's mesh path (sparse layers
    psum-reduce the Titsias ELBO, dense layers factorise through the
    distributed blocked Cholesky), so huge held-out datasets score with
    O(n/P) per-device work AND per-bucket compile reuse.
    """
    m, p, W = plan.m, plan.p, plan.W
    sparse = plan.sparse
    xs_np = plan.xs
    if mesh is not None and not rows_traced:
        raise ValueError(
            "make_scan_logpdf_body: the mesh form is shape-bucketed only "
            "(rows_traced=True)."
        )

    def _chain(z_all, x_local, xs, zi_t, eps, blk=None, n_dev=1):
        dtype = x_local.dtype
        z_ext = jnp.concatenate([z_all, jnp.zeros((1,), z_all.dtype)])
        x_aug = jnp.concatenate(
            [x_local, jnp.zeros((x_local.shape[0], W - m), dtype)], axis=1
        )
        if sparse:
            zi = _zi(x_ind, zi_t, dtype)
            zi_aug = jnp.concatenate(
                [zi, jnp.zeros((zi.shape[0], W - m), dtype)], axis=1
            )
        else:
            zi_aug = jnp.zeros((0, W), dtype)

        def step(carry, lin):
            x_aug, zi_aug = carry
            if mesh is None:
                nll, factors = _layer_nll_factors(
                    plan, lin, z_ext, x_aug, zi_aug, eps
                )
            else:
                nll, factors = _mesh_layer_nll_factors(
                    plan, lin, z_ext, x_aug, zi_aug, eps, shard_axis,
                    blk, n_dev,
                )
            est_rows, est_ind = _est_from_factors(plan, factors)
            x_aug, zi_aug = _augment_cols(
                plan, lin, est_rows, est_ind, x_aug, zi_aug
            )
            return (x_aug, zi_aug), nll

        _, layer_nll = lax.scan(step, (x_aug, zi_aug), xs)
        return -jnp.sum(layer_nll)

    if mesh is None:

        def program(z_all, x, xs_rows=None):
            eps = resolve_epsilon(x.dtype)
            xs_rows, zi_t = _pop_x_ind(xs_rows)
            if rows_traced:
                xs = _static_plan_xs(xs_np)
                xs.update(xs_rows)
            else:
                xs = {k: jnp.asarray(v) for k, v in xs_np.items()}
            return _chain(z_all, x, xs, zi_t, eps)

        return program

    # Mesh form: same structure as make_scan_fit_body's bucketed mesh
    # branch — committed replicated model-structure inputs (the shard_map
    # constant-folding hazard, PERF.md finding 18), traced row arrays
    # sharded over the row axis, geometry padding from the bucket inside
    # the trace.
    from jax.sharding import PartitionSpec as PSpec

    n_dev = mesh.devices.size
    xs_static_dev = _shard_plan_xs(
        {k: v for k, v in xs_np.items() if k not in _ROW_KEYS},
        mesh, shard_axis, 0,
    )

    def _geometry(n_rows):
        return _mesh_pad_geometry(n_rows, n_dev, sparse)

    def program(z_all, x, xs_rows=None):
        eps = resolve_epsilon(x.dtype)
        xs_rows, zi_t = _pop_x_ind(xs_rows)
        n_pad_b, blk = _geometry(x.shape[0])
        x_p = jnp.pad(x, ((0, n_pad_b), (0, 0))) if n_pad_b else x
        xs = dict(xs_static_dev)
        for k, v in xs_rows.items():
            if n_pad_b:
                cval = 1.0 if k == "w_col" else 0.0
                v = jnp.pad(v, ((0, 0), (0, n_pad_b)), constant_values=cval)
            xs[k] = v
        xs_specs = {
            k: PSpec(None, shard_axis) if k in _ROW_KEYS else PSpec()
            for k in xs
        }

        def local(z_all, x_loc, xs_loc, zi_t=None):
            return _chain(z_all, x_loc, xs_loc, zi_t, eps, blk, n_dev)

        if zi_t is not None:
            fn = jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(PSpec(), PSpec(shard_axis), xs_specs, PSpec()),
                out_specs=PSpec(),
            )
            return fn(z_all, x_p, xs, zi_t)
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(PSpec(), PSpec(shard_axis), xs_specs),
            out_specs=PSpec(),
        )
        return fn(z_all, x_p, xs)

    return program


def make_scan_posterior_logpdf_tail(plan, x_ind, rows_traced=False,
                                    mesh=None, shard_axis="dp"):
    """Scan-fused POSTERIOR logpdf of new data given cached per-layer
    posterior factors: ``program(z_all, factors, x[, xs_rows, tr_mask])
    -> scalar`` — ``GPARRegressor.logpdf(posterior=True)``
    (``gpar/regression.py:461-506``: condition on the training data, then
    ``GPAR.logpdf`` of the scored data under the posterior layers).

    ``plan`` is the SCORED data's plan (:func:`build_scan_data_plan`):
    its row arrays are the new data's values/weights/NaN routing;
    ``factors`` are the training-side per-layer posterior factors from
    :func:`make_scan_posterior_factors` (any impute/replace combination).
    Per layer the step reproduces the GP core's nested-conditioning
    algebra exactly (``gp/core.py``):

    - sparse: the new data forms ``PseudoObs`` under the posterior layer
      (``gpar/model.py:287`` on posterior layers) — the Titsias factors
      of the POSTERIOR prior, whose mean/covariances come from the cached
      training factors (``SparsePosteriorGP.mean_vec/cov``), evaluated at
      the scoring chain's own augmented inducing inputs (``GPAR.logpdf``
      restarts the ``x_ind`` augmentation from the original inducing
      inputs, ``gpar/model.py:199,251``);
    - dense: exact MVN of the residual under the posterior predictive at
      the new rows (``Obs`` on a ``PosteriorGP``), masked rows as
      identity rows; ``tr_mask`` (p, n_train[_bucket]) carries the
      training chain's per-layer observation masks (the cached ``L``/
      ``alpha`` were factorised with masked rows neutralised, so the
      cross-covariance must mask the same rows — exactly as
      :func:`make_scan_cached_tail` does).

    The augmentation step feeds ``condition(f_post, obs_new).mean``
    forward (``gpar/model.py:291-322``): sequential conditioning, equal
    to the GP core's train+new joint refactorisation by Gaussian algebra.

    With ``rows_traced``, the scored data's row arrays AND the training
    mask ride in as traced arguments — one executable per (model
    structure, training-row bucket, scored-row bucket).

    With ``mesh`` (sparse plans only, requires ``rows_traced``), the
    SCORED rows shard over ``shard_axis`` while the cached training
    factors replicate: the posterior-prior Titsias statistics of the new
    observations reduce through
    :func:`gpar_tpu.parallel.sharded.titsias_psum_body` (one m² psum +
    scalar psums per layer) — O(n_scored·M²/P) per device.  Dense plans
    under a mesh stay on the GP-core distributed path (the cached dense
    factor stack is O(p·n²) and the new-obs factorisation would need a
    distributed nested Cholesky — not worth it while the factor-stack
    budget caps dense n anyway).
    """
    m, p, W = plan.m, plan.p, plan.W
    sparse = plan.sparse
    xs_np = plan.xs
    if mesh is not None and not (sparse and rows_traced):
        raise ValueError(
            "make_scan_posterior_logpdf_tail: the mesh form is sparse + "
            "shape-bucketed only."
        )

    def _run(z_all, x, xs, zi_t):
        """The scoring chain proper, over pre-assembled scan inputs
        (full data single-device, or one row shard under the mesh)."""
        dtype = x.dtype
        eps = resolve_epsilon(dtype)
        z_ext = jnp.concatenate([z_all, jnp.zeros((1,), z_all.dtype)])
        x_aug = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], W - m), dtype)], axis=1
        )
        if sparse:
            zi = _zi(x_ind, zi_t, dtype)
            zi_aug = jnp.concatenate(
                [zi, jnp.zeros((zi.shape[0], W - m), dtype)], axis=1
            )
        else:
            zi_aug = jnp.zeros((0, W), dtype)

        def step(carry, lin):
            x_aug, zi_aug = carry
            kernel, noise = _layer_kernel(plan, lin, z_ext)
            noise_w = floor_noise(noise / lin["w_col"])
            omask = lin["obs_mask"]
            r = lin["y_col"]  # zero-filled; masked rows neutralised
            fac = lin["fac"]
            if sparse:
                # Posterior mean/cov from the training factors
                # (SparsePosteriorGP algebra), at the scoring chain's
                # augmented data and inducing buffers.
                zi_tr = fac["zi_aug"]
                Km_x = gram(kernel, zi_tr, x_aug)
                T1x = solve_lower(fac["Lm"], Km_x)
                T2x = solve_lower(fac["LB"], T1x)
                Km_z = gram(kernel, zi_tr, zi_aug)
                T1z = solve_lower(fac["Lm"], Km_z)
                T2z = solve_lower(fac["LB"], T1z)
                mean_x = Km_x.T @ fac["beta"]
                mean_z = Km_z.T @ fac["beta"]
                Kmm_p = gram(kernel, zi_aug, zi_aug) - T1z.T @ T1z + T2z.T @ T2z
                Kmn_p = gram(kernel, zi_aug, x_aug) - T1z.T @ T1x + T2z.T @ T2x
                knn_p = (
                    kdiag(kernel, x_aug)
                    - jnp.sum(T1x * T1x, axis=0)
                    + jnp.sum(T2x * T2x, axis=0)
                )
                if mesh is None:
                    elbo, _Lm_n, _LB_n, beta_n = titsias_factors(
                        Kmm_p, Kmn_p, knn_p, r, mean_x, noise_w, mask=omask
                    )
                else:
                    # Distributed new-obs statistics: same math, columns
                    # local, one psum (parallel/sharded.titsias_psum_body;
                    # Lm_p applied here exactly as titsias_factors does).
                    from ..parallel.sharded import titsias_psum_body

                    Lm_p = safe_cholesky(Kmm_p)
                    A0 = solve_lower(Lm_p, Kmn_p)
                    elbo, _LB_n, beta_n = titsias_psum_body(
                        Lm_p, A0, knn_p, r - mean_x, noise_w, omask,
                        shard_axis,
                    )
                nll = -elbo
                # condition(f_post, obs_new).mean — the nested sparse
                # posterior's mean (gp/core.py SparsePosteriorGP.mean_vec
                # with base = the training posterior).
                est_rows = mean_x + Kmn_p.T @ beta_n
                est_ind = mean_z + Kmm_p @ beta_n
            else:
                Kxt = gram(kernel, fac["x_aug"], x_aug) * lin["tr_mask"][:, None]
                mean_x = Kxt.T @ fac["alpha"]
                V = solve_lower(fac["L"], Kxt)
                Kp = gram(kernel, x_aug, x_aug) - V.T @ V
                lp, alpha_n, _L_n = _masked_dense_factors(
                    Kp, (r - mean_x) * omask, omask, noise_w, eps
                )
                nll = -lp
                # Sequential conditioning: posterior-over-(train+new)
                # mean at the new rows (alpha_n is zero at masked rows,
                # so the unmasked Kp matvec reads only observed columns).
                est_rows = mean_x + Kp @ alpha_n
                est_ind = None
            x_aug, zi_aug = _augment_cols(
                plan, lin, est_rows, est_ind, x_aug, zi_aug
            )
            return (x_aug, zi_aug), nll

        _, layer_nll = lax.scan(step, (x_aug, zi_aug), xs)
        return -jnp.sum(layer_nll)

    def _check_tr_mask(tr_mask):
        if not sparse and tr_mask is None:
            # The scored plan's own obs_mask is NOT a valid stand-in: the
            # cached L/alpha were factorised with the TRAINING chain's
            # masked rows neutralised, and masking the cross-covariance
            # with the scored data's NaN pattern would be silently wrong
            # (or a shape error).
            raise ValueError(
                "make_scan_posterior_logpdf_tail: dense factors need "
                "the training chain's per-layer observation masks "
                "(tr_mask, shape (p, n_train[_bucket]) — e.g. "
                "GPARRegressor._bucket_fit_inputs' obs_mask)."
            )

    if mesh is None:

        def program(z_all, factors, x, xs_rows=None, tr_mask=None):
            _check_tr_mask(tr_mask)
            xs_rows, zi_t = _pop_x_ind(xs_rows)
            if rows_traced:
                xs = _static_plan_xs(xs_np)
                xs.update(xs_rows)
            else:
                xs = {k: jnp.asarray(v) for k, v in xs_np.items()}
            xs["fac"] = factors
            if not sparse:
                xs["tr_mask"] = jnp.asarray(tr_mask)
            return _run(z_all, x, xs, zi_t)

        return program

    # Mesh form (sparse + bucketed, validated above): scored rows shard,
    # cached factors replicate, model-structure inputs ride as committed
    # replicated device arrays (the shard_map constant-folding hazard,
    # PERF.md finding 18).
    from jax.sharding import PartitionSpec as PSpec

    n_dev = mesh.devices.size
    xs_static_dev = _shard_plan_xs(
        {k: v for k, v in xs_np.items() if k not in _ROW_KEYS},
        mesh, shard_axis, 0,
    )

    def program(z_all, factors, x, xs_rows=None, tr_mask=None):
        xs_rows, zi_t = _pop_x_ind(xs_rows)
        n_pad_b = (-x.shape[0]) % n_dev
        x_p = jnp.pad(x, ((0, n_pad_b), (0, 0))) if n_pad_b else x
        xs = dict(xs_static_dev)
        for k, v in xs_rows.items():
            if n_pad_b:
                cval = 1.0 if k == "w_col" else 0.0
                v = jnp.pad(v, ((0, 0), (0, n_pad_b)), constant_values=cval)
            xs[k] = v
        xs["fac"] = factors
        xs_specs = {
            k: (PSpec(None, shard_axis) if k in _ROW_KEYS else PSpec())
            for k in xs
        }
        xs_specs["fac"] = PSpec()  # pytree prefix: whole factor stack

        def local(z_all, x_loc, xs_loc, zi_t=None):
            return _run(z_all, x_loc, xs_loc, zi_t)

        if zi_t is not None:
            fn = jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(PSpec(), PSpec(shard_axis), xs_specs, PSpec()),
                out_specs=PSpec(),
            )
            return fn(z_all, x_p, xs, zi_t)
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(PSpec(), PSpec(shard_axis), xs_specs),
            out_specs=PSpec(),
        )
        return fn(z_all, x_p, xs)

    return program


def make_scan_posterior_factors(plan, x_ind, mesh=None, rows_traced=False):
    """Stage A of the split serving path: per-layer posterior factors.

    Runs the conditioning half of the serving path — the closed-downwards
    chain of ``GPAR.__or__`` (``gpar/model.py:148-176``) with the plan's
    impute/replace input-augmentation rules (any combination: the training
    chain is sample-independent regardless, since estimates are posterior
    means) — and returns the stacked per-layer posterior factors instead
    of consuming them in place:

    - sparse (Titsias): the augmented inducing inputs at layer entry
      ``zi_aug`` (p, M, W) plus ``Lm``/``LB`` (p, M, M) and ``beta``
      (p, M) — everything the sparse posterior needs at new test points
      (``gp/core.py:SparsePosteriorGP``);
    - dense: the augmented training inputs at layer entry ``x_aug``
      (p, n, W) plus ``alpha`` (p, n) and the Cholesky factor ``L``
      (p, n, n) (``gp/core.py:PosteriorGP``).

    The factors depend only on (hyperparameters, conditioning data), NOT
    on the test points — so ``GPARRegressor`` computes them once per
    (fit, dataset) and reuses them across ``predict``/``sample`` calls
    (the repeated-serving fast path; the reference re-conditions on every
    ``sample`` call, ``gpar/regression.py:547``).  Contract, pinned by
    ``tests/test_fused_scan.py``: composing this with
    :func:`make_scan_cached_tail` (replace=True) reproduces
    :func:`make_scan_predict_tail` bit-exactly, and composing it with
    :func:`make_scan_ancestral_tail` matches the unrolled vmapped
    ``_sample_chain`` for every impute/replace combination.
    """
    m, W, n = plan.m, plan.W, plan.n
    sparse = plan.sparse
    xs_np = plan.xs
    xs_dev = _committed_plan_xs(
        {k: v for k, v in xs_np.items()
         if not (rows_traced and k in _ROW_KEYS)},
        mesh,
    )

    def factors(z_all, x, xs_rows=None):
        dtype = x.dtype
        eps = resolve_epsilon(dtype)
        xs_rows, zi_t = _pop_x_ind(xs_rows)
        z_ext = jnp.concatenate([z_all, jnp.zeros((1,), z_all.dtype)])
        x_aug = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], W - m), dtype)], axis=1
        )
        if sparse:
            zi = _zi(x_ind, zi_t, dtype)
            zi_aug = jnp.concatenate(
                [zi, jnp.zeros((zi.shape[0], W - m), dtype)], axis=1
            )
        else:
            zi_aug = jnp.zeros((0, W), dtype)
        if rows_traced:
            # Shape-bucketed form: padded per-row arrays ride in as
            # traced arguments (see pad_plan_rows) — the program is
            # data-independent and keyed on the bucket only.
            xs = _bucketed_plan_xs(xs_np, xs_dev)
            xs.update(xs_rows)
        else:
            xs = _plan_xs(xs_np, xs_dev)

        def step(carry, lin):
            x_aug, zi_aug = carry
            kernel, noise = _layer_kernel(plan, lin, z_ext)
            noise_w = floor_noise(noise / lin["w_col"])
            omask = lin["obs_mask"]
            r = lin["y_col"]
            if sparse:
                Kmm = gram(kernel, zi_aug, zi_aug)
                Kmn = gram(kernel, zi_aug, x_aug)
                knn = kdiag(kernel, x_aug)
                _, Lm, LB, beta = titsias_factors(
                    Kmm, Kmn, knn, r, jnp.zeros_like(r), noise_w, mask=omask
                )
                est_rows = Kmn.T @ beta
                est_ind = Kmm @ beta
                out = {"zi_aug": zi_aug, "Lm": Lm, "LB": LB, "beta": beta}
            else:
                K = gram(kernel, x_aug, x_aug)
                _, alpha, L = _masked_dense_factors(K, r, omask, noise_w, eps)
                est_rows = K @ alpha
                est_ind = None
                out = {"x_aug": x_aug, "alpha": alpha, "L": L}
            x_aug, zi_aug = _augment_cols(
                plan, lin, est_rows, est_ind, x_aug, zi_aug
            )
            return (x_aug, zi_aug), out

        _, outs = lax.scan(step, (x_aug, zi_aug), xs)
        return outs

    return factors


def make_scan_cached_tail(plan, latent, mesh=None, rows_traced=False):
    """Stage B of the split serving path: Monte-Carlo predictive sampling
    from the cached per-layer factors of
    :func:`make_scan_posterior_factors`.

    Identical math and per-sample key stream as the test-point half of
    :func:`make_scan_predict_tail` (three-way split per layer, draw with
    the middle key, the same PSD factor ``FDD.sample`` uses,
    ``gpar/model.py:259-276``), so samples bit-match the single-scan tail
    and the vmapped unrolled chain.  The layer kernels are rebuilt from
    the (tiny) latent vector each call; only the O(n·m²)/O(n³)
    conditioning factors are reused.

    Returns ``tail(z_all, factors, x_test, w_test_T, keys) -> (batch,
    mean_chain)`` matching :func:`make_scan_predict_tail`'s outputs.
    """
    if not plan.replace:
        raise ValueError("make_scan_cached_tail requires replace=True chains.")
    m, W = plan.m, plan.W
    sparse = plan.sparse
    xs_np = plan.xs
    xs_dev = _committed_plan_xs(
        {k: v for k, v in xs_np.items()
         if not (rows_traced and k in _ROW_KEYS)},
        mesh,
    )

    def tail(z_all, factors, x_test, w_test_T, keys, xs_rows=None, mt=None):
        dtype = x_test.dtype
        n_test = x_test.shape[0]
        # Conditioning already happened (the factors); the traced inducing
        # inputs, if threaded, are unused here — discard before the scan.
        xs_rows, _ = _pop_x_ind(xs_rows)
        z_ext = jnp.concatenate([z_all, jnp.zeros((1,), z_all.dtype)])
        xt_aug = jnp.concatenate(
            [x_test, jnp.zeros((n_test, W - m), dtype)], axis=1
        )
        if rows_traced:
            xs = _bucketed_plan_xs(xs_np, xs_dev)
            xs.update(xs_rows)
        else:
            xs = _plan_xs(xs_np, xs_dev)
        xs["w_t"] = jnp.asarray(w_test_T, dtype=dtype)  # (p, n_test)
        xs["fac"] = factors

        def step(carry, lin):
            xt_aug, keys = carry
            kernel, noise = _layer_kernel(plan, lin, z_ext)
            fac = lin["fac"]
            if sparse:
                Kmt = gram(kernel, fac["zi_aug"], xt_aug)
                mean_t = Kmt.T @ fac["beta"]
                T1 = solve_lower(fac["Lm"], Kmt)
                T2 = solve_lower(fac["LB"], T1)
                cov_t = gram(kernel, xt_aug, xt_aug) - T1.T @ T1 + T2.T @ T2
            else:
                Kxt = gram(kernel, fac["x_aug"], xt_aug) * lin["obs_mask"][:, None]
                mean_t = Kxt.T @ fac["alpha"]
                V = solve_lower(fac["L"], Kxt)
                cov_t = gram(kernel, xt_aug, xt_aug) - V.T @ V
            cov_t = _mask_test_cov(cov_t, mt)

            if latent:
                F = psd_sample_factor(cov_t)
            else:
                F = psd_sample_factor(
                    cov_t + jnp.diag(floor_noise(noise / lin["w_t"]))
                )
            ks = jax.vmap(lambda k: jax.random.split(k, 3))(keys)  # (S, 3)
            keys_next, k1s = ks[:, 0], ks[:, 1]
            Z = jax.vmap(
                lambda k: jax.random.normal(k, (n_test,), dtype)
            )(k1s)  # (S, n_test)
            ys = mean_t[None, :] + Z @ F.T  # (S, n_test)

            col = m + lin["col"]
            xt_aug = lax.dynamic_update_slice(
                xt_aug,
                mean_t[:, None],
                (jnp.int32(0), jnp.asarray(col, jnp.int32)),
            )
            return (xt_aug, keys_next), (ys, mean_t)

        _, (ys_stack, mean_stack) = lax.scan(step, (xt_aug, keys), xs)
        return jnp.transpose(ys_stack, (1, 2, 0)), mean_stack.T

    return tail


def make_scan_ancestral_tail(
    plan, latent, sample_chunk=None, mesh=None, rows_traced=False
):
    """Per-sample ancestral chains from cached posterior factors — the
    scan-fused serving tail for ``replace=False`` (the reference's DEFAULT
    predictive configuration: EEG/exchange/jura all serve with it).

    With ``replace=False`` the *sampled* output feeds the next layer's
    inputs (``gpar/model.py:266,275``), so each Monte-Carlo sample carries
    its own augmented test buffer and its own per-layer posterior
    covariance — per-sample factorisations are inherent (PERF.md finding
    9).  What is NOT per-sample is (a) the training-side conditioning
    chain (estimates are posterior means — :func:`make_scan_posterior_
    factors` covers every impute/replace combination) and (b) the compiled
    program: one ``lax.scan`` over layers whose body ``vmap``s the sample
    axis, so cold XLA compilation is O(1) in p — the round-1 unrolled
    path's O(p) conditioning + O(p) sampling chain collapses to one body.

    Per-sample math and key stream replicate ``GPAR._sample_chain``
    exactly (three-way key split per layer; observed draws add the floored
    per-point noise to the covariance before the PSD factor, matching
    ``FDD.sample`` on ``f(x, noise/w)``; latent draws return the noiseless
    sample but feed the noisy one forward with UNfloored noise —
    ``_sample_chain`` takes ``sqrt(noise/w)`` directly), so samples
    bit-match the unrolled vmapped chain per key.

    ``sample_chunk`` bounds peak memory: the sample axis is processed in
    ``lax.map`` chunks of that size (each chunk an inner vmap), trading
    latency for a peak of O(chunk * n_test^2) per layer instead of
    O(S * n_test^2).  ``None`` vmaps the full batch — the same memory
    profile as the unrolled path it replaces.

    Returns ``tail(z_all, factors, x_test, w_test_T, keys) -> batch`` with
    ``batch`` (S, n_test, p) model-space samples (matching
    ``GPAR.sample_batch``).  Works for replace=True chains too (feeding
    the mean forward), but :func:`make_scan_cached_tail` computes that
    case with shared factors — prefer it there.
    """
    m, W = plan.m, plan.W
    sparse = plan.sparse
    xs_np = plan.xs
    xs_dev = _committed_plan_xs(
        {k: v for k, v in xs_np.items()
         if not (rows_traced and k in _ROW_KEYS)},
        mesh,
    )

    def tail(z_all, factors, x_test, w_test_T, keys, xs_rows=None, mt=None):
        dtype = x_test.dtype
        n_test = x_test.shape[0]
        S = keys.shape[0]
        # Conditioning already happened (the factors); the traced inducing
        # inputs, if threaded, are unused here — discard before the scan.
        xs_rows, _ = _pop_x_ind(xs_rows)
        z_ext = jnp.concatenate([z_all, jnp.zeros((1,), z_all.dtype)])
        xt0 = jnp.concatenate(
            [x_test, jnp.zeros((n_test, W - m), dtype)], axis=1
        )
        xt_b = jnp.broadcast_to(xt0, (S, n_test, W))
        if rows_traced:
            xs = _bucketed_plan_xs(xs_np, xs_dev)
            xs.update(xs_rows)
        else:
            xs = _plan_xs(xs_np, xs_dev)
        xs["w_t"] = jnp.asarray(w_test_T, dtype=dtype)  # (p, n_test)
        xs["fac"] = factors

        def step(carry, lin):
            xt_b, keys = carry
            kernel, noise = _layer_kernel(plan, lin, z_ext)
            fac = lin["fac"]

            def prep(xt_s):
                if sparse:
                    Kmt = gram(kernel, fac["zi_aug"], xt_s)
                    mean_t = Kmt.T @ fac["beta"]
                    T1 = solve_lower(fac["Lm"], Kmt)
                    T2 = solve_lower(fac["LB"], T1)
                    cov_t = (
                        gram(kernel, xt_s, xt_s) - T1.T @ T1 + T2.T @ T2
                    )
                else:
                    Kxt = (
                        gram(kernel, fac["x_aug"], xt_s)
                        * lin["obs_mask"][:, None]
                    )
                    mean_t = Kxt.T @ fac["alpha"]
                    V = solve_lower(fac["L"], Kxt)
                    cov_t = gram(kernel, xt_s, xt_s) - V.T @ V
                return mean_t, _mask_test_cov(cov_t, mt)

            def draw(xt_s, key, mean_t, F):
                ks = jax.random.split(key, 3)
                key_next, k1, k2 = ks[0], ks[1], ks[2]
                z1 = jax.random.normal(k1, (n_test,), dtype)
                if latent:
                    f_s = mean_t + F @ z1
                    z2 = jax.random.normal(k2, (n_test,), dtype)
                    y_s = f_s + jnp.sqrt(noise / lin["w_t"]) * z2
                    ret = f_s
                else:
                    y_s = mean_t + F @ z1
                    ret = y_s

                y_next = mean_t if plan.replace else y_s
                col = m + lin["col"]
                xt_s = lax.dynamic_update_slice(
                    xt_s,
                    y_next[:, None],
                    (jnp.int32(0), jnp.asarray(col, jnp.int32)),
                )
                return xt_s, key_next, ret

            def batch(xt_b, keys):
                # The PSD factorisations run BATCHED, outside the sample
                # vmap: under vmap lax.cond lowers to select and every
                # sample would pay the full retry ladder plus an eigh
                # (PERF.md finding 9); the batch-level gates in
                # psd_sample_factor_batched make the common all-finite
                # case one batched Cholesky per layer.
                mean_b, cov_b = jax.vmap(prep)(xt_b)
                if not latent:
                    cov_b = cov_b + jnp.diag(
                        floor_noise(noise / lin["w_t"])
                    )[None]
                F_b = psd_sample_factor_batched(cov_b)
                return jax.vmap(draw)(xt_b, keys, mean_b, F_b)

            xt_b, keys, rets = _chunked_batch(batch, xt_b, keys, sample_chunk)
            return (xt_b, keys), rets

        _, ys_stack = lax.scan(step, (xt_b, keys), xs)  # (p, S, n_test)
        return jnp.transpose(ys_stack, (1, 2, 0))

    return tail


def make_scan_prior_tail(plan, latent, sample_chunk=None, mesh=None):
    """Per-sample PRIOR ancestral chains as one ``lax.scan`` over layers —
    the scan-fused form of ``GPARRegressor.sample(posterior=False)``
    (``gpar/regression.py:508-564``, prior branch), built from a
    :func:`build_scan_prior_plan`.

    The prior chain is ``_sample_chain`` with prior GPs: the mean is zero
    everywhere, so under ``replace=True`` the forwarded column is exactly
    zero (``f.mean(x) == 0``, ``gpar/model.py:275`` with ``obs=None``) and
    the sparse path's inducing-input augmentation (zero columns) never
    influences a draw — prior FDDs ignore the inducing points.  Key
    stream, noise placement (floored per-point noise inside the observed
    covariance; UNfloored ``sqrt(noise/w)`` on latent feed-forward), and
    the PSD sampling factor replicate ``_sample_chain`` per key, so draws
    bit-match the unrolled vmapped chain whenever ``safe_cholesky``'s
    jitter ladder succeeds.  One caveat: with ``latent=True`` on a
    degenerate noiseless Gram (dense EQ kernels over many close points),
    ``psd_sample_factor`` falls back to the clamped eigendecomposition,
    and eigenvectors of near-equal eigenvalues are not stable across two
    differently-compiled programs — scan and unrolled then draw from the
    same clamped distribution through different (equally valid) factors,
    so samples agree only to ~sqrt(eps) (~5e-4 observed in f64; see
    ``tests/test_fused_scan.py::test_prior_scan_tail_degenerate_latent``).
    Cold compile is O(1) in p — the last serving path that still paid
    O(p) XLA compilation.

    ``sample_chunk`` as in :func:`make_scan_ancestral_tail`.  Returns
    ``tail(z_all, x_test, w_test_T, keys) -> batch`` of (S, n_test, p)
    model-space samples.
    """
    m, W = plan.m, plan.W
    xs_np = plan.xs
    xs_dev = _committed_plan_xs(xs_np, mesh)

    def tail(z_all, x_test, w_test_T, keys, mt=None):
        dtype = x_test.dtype
        n_test = x_test.shape[0]
        S = keys.shape[0]
        z_ext = jnp.concatenate([z_all, jnp.zeros((1,), z_all.dtype)])
        xt0 = jnp.concatenate(
            [x_test, jnp.zeros((n_test, W - m), dtype)], axis=1
        )
        xt_b = jnp.broadcast_to(xt0, (S, n_test, W))
        xs = _plan_xs(xs_np, xs_dev)
        xs["w_t"] = jnp.asarray(w_test_T, dtype=dtype)  # (p, n_test)

        def step(carry, lin):
            xt_b, keys = carry
            kernel, noise = _layer_kernel(plan, lin, z_ext)

            def draw(xt_s, key, F):
                ks = jax.random.split(key, 3)
                key_next, k1, k2 = ks[0], ks[1], ks[2]
                z1 = jax.random.normal(k1, (n_test,), dtype)
                if latent:
                    f_s = F @ z1
                    z2 = jax.random.normal(k2, (n_test,), dtype)
                    y_s = f_s + jnp.sqrt(noise / lin["w_t"]) * z2
                    ret = f_s
                else:
                    y_s = F @ z1
                    ret = y_s

                # Prior mean is zero: replace=True forwards an (already
                # zero) column, so only the replace=False write matters.
                if not plan.replace:
                    col = m + lin["col"]
                    xt_s = lax.dynamic_update_slice(
                        xt_s,
                        y_s[:, None],
                        (jnp.int32(0), jnp.asarray(col, jnp.int32)),
                    )
                return xt_s, key_next, ret

            def batch(xt_b, keys):
                # Factorisations batched outside the sample vmap — see
                # make_scan_ancestral_tail (PERF.md finding 9).
                cov_b = jax.vmap(
                    lambda xt_s: _mask_test_cov(gram(kernel, xt_s, xt_s), mt)
                )(xt_b)
                if not latent:
                    cov_b = cov_b + jnp.diag(
                        floor_noise(noise / lin["w_t"])
                    )[None]
                F_b = psd_sample_factor_batched(cov_b)
                return jax.vmap(draw)(xt_b, keys, F_b)

            xt_b, keys, rets = _chunked_batch(batch, xt_b, keys, sample_chunk)
            return (xt_b, keys), rets

        _, ys_stack = lax.scan(step, (xt_b, keys), xs)  # (p, S, n_test)
        return jnp.transpose(ys_stack, (1, 2, 0))

    return tail


def make_scan_predict_tail(plan, x_ind, latent, mesh=None, rows_traced=False):
    """Scan-fused posterior conditioning + Monte-Carlo predictive sampling.

    The round-1 serving path unrolls the p-layer chain twice in Python —
    once for conditioning (``GPAR.__or__``, ``gpar/model.py:148-176``) and
    once per vmapped ancestral sample (``gpar/model.py:245-277``) — so the
    traced program holds p copies of the posterior algebra and cold XLA
    compilation scales with p (BENCH_r01: 167 s for predict at p=16).
    This builds the same computation as ONE ``lax.scan`` whose body XLA
    compiles once, using the shape-uniform gated-kernel machinery of the
    scan fit (:func:`build_scan_fit_plan`).

    Scope: ``replace=True`` chains only (the reference's ``replace`` rule
    feeds the posterior *mean* to the next layer, ``gpar/model.py:308``,
    making the chained inputs sample-independent — so per-layer train
    factors and the test covariance factor are computed once, not per
    sample, and the MC batch reduces to one trailing matmul).  With
    ``replace=False`` the sampled outputs feed forward and each sample
    carries its own chain; the unrolled vmapped path handles that case.

    Per layer: Titsias/dense factors on the (masked) training rows with
    the final hyperparameters, the posterior mean/covariance at the test
    points, one PSD factor, ``len(keys)`` joint draws via a single
    (n_test, S) matmul, then one augmentation step for the training buffer
    (impute/replace rules) and the test buffer (posterior mean).

    ``keys`` is the same per-sample key batch the unrolled path vmaps
    ``_sample_chain`` over, and the per-layer stream replicates it exactly
    (three-way split per layer, draw with the middle key, the same PSD
    factor ``FDD.sample`` uses) — so, per-sample, the draws bit-match the
    unrolled path and the fused/unrolled oracle comparison stays exact
    rather than statistical.

    Returns ``tail(z_all, x, x_test, w_test_T, keys) -> (batch,
    mean_chain)`` with ``batch`` (S, n_test, p) model-space samples
    (matching ``GPAR.sample_batch``) and ``mean_chain`` (n_test, p) the
    deterministic per-layer posterior means (the chained inputs) — exposed
    for oracle tests against the unrolled posterior.
    """
    if not plan.replace:
        raise ValueError("make_scan_predict_tail requires replace=True chains.")
    m, p, W, n = plan.m, plan.p, plan.W, plan.n
    sparse = plan.sparse
    xs_np = plan.xs
    xs_dev = _committed_plan_xs(
        {k: v for k, v in xs_np.items()
         if not (rows_traced and k in _ROW_KEYS)},
        mesh,
    )

    def tail(z_all, x, x_test, w_test_T, keys, xs_rows=None, mt=None):
        dtype = x.dtype
        eps = resolve_epsilon(dtype)
        n_test = x_test.shape[0]
        xs_rows, zi_t = _pop_x_ind(xs_rows)
        z_ext = jnp.concatenate([z_all, jnp.zeros((1,), z_all.dtype)])
        x_aug = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], W - m), dtype)], axis=1
        )
        xt_aug = jnp.concatenate(
            [x_test, jnp.zeros((n_test, W - m), dtype)], axis=1
        )
        if sparse:
            zi = _zi(x_ind, zi_t, dtype)
            zi_aug = jnp.concatenate(
                [zi, jnp.zeros((zi.shape[0], W - m), dtype)], axis=1
            )
        else:
            zi_aug = jnp.zeros((0, W), dtype)

        if rows_traced:
            xs = _bucketed_plan_xs(xs_np, xs_dev)
            xs.update(xs_rows)
        else:
            xs = _plan_xs(xs_np, xs_dev)
        xs["w_t"] = jnp.asarray(w_test_T, dtype=dtype)  # (p, n_test)

        def step(carry, lin):
            x_aug, zi_aug, xt_aug, keys = carry
            kernel, noise = _layer_kernel(plan, lin, z_ext)
            # Same float32 noise floor as gp/core._noise_vec (f64 no-op).
            noise_w = floor_noise(noise / lin["w_col"])
            omask = lin["obs_mask"]
            r = lin["y_col"]

            if sparse:
                Kmm = gram(kernel, zi_aug, zi_aug)
                Kmn = gram(kernel, zi_aug, x_aug)
                knn = kdiag(kernel, x_aug)
                _, Lm, LB, beta = titsias_factors(
                    Kmm, Kmn, knn, r, jnp.zeros_like(r), noise_w, mask=omask
                )
                # Sparse posterior at the test points
                # (gp/core.py SparsePosteriorGP: mean = K(t,Z) beta,
                #  cov = Ktt - T1^T T1 + T2^T T2).
                Kmt = gram(kernel, zi_aug, xt_aug)
                mean_t = Kmt.T @ beta
                T1 = solve_lower(Lm, Kmt)
                T2 = solve_lower(LB, T1)
                cov_t = gram(kernel, xt_aug, xt_aug) - T1.T @ T1 + T2.T @ T2
                est_rows = Kmn.T @ beta
                est_ind = Kmm @ beta
            else:
                K = gram(kernel, x_aug, x_aug)
                _, alpha, L = _masked_dense_factors(K, r, omask, noise_w, eps)
                # Exact posterior at the test points (gp/core.py
                # PosteriorGP); masked training rows have alpha = 0 and
                # identity rows in L, so zeroing their cross-covariance
                # rows reproduces conditioning on the observed rows only.
                Kxt = gram(kernel, x_aug, xt_aug) * omask[:, None]
                mean_t = Kxt.T @ alpha
                V = solve_lower(L, Kxt)
                cov_t = gram(kernel, xt_aug, xt_aug) - V.T @ V
                est_rows = K @ alpha
                est_ind = None

            cov_t = _mask_test_cov(cov_t, mt)
            # One joint MVN draw per sample: latent returns the noiseless
            # f-sample, observed adds the per-point noise to the covariance
            # (``gpar/model.py:259-276``); with replace=True neither feeds
            # forward — the posterior mean does.  Key stream replicates
            # ``_sample_chain`` per sample: three-way split per layer, draw
            # with k1 (k2 seeds the latent path's noisy feedforward sample,
            # unused under replace but still consumed by the split).
            if latent:
                F = psd_sample_factor(cov_t)
            else:
                F = psd_sample_factor(
                    cov_t + jnp.diag(floor_noise(noise / lin["w_t"]))
                )
            ks = jax.vmap(lambda k: jax.random.split(k, 3))(keys)  # (S, 3)
            keys_next, k1s = ks[:, 0], ks[:, 1]
            Z = jax.vmap(
                lambda k: jax.random.normal(k, (n_test,), dtype)
            )(k1s)  # (S, n_test)
            ys = mean_t[None, :] + Z @ F.T  # (S, n_test)

            x_aug, zi_aug = _augment_cols(
                plan, lin, est_rows, est_ind, x_aug, zi_aug
            )
            col = m + lin["col"]
            xt_aug = lax.dynamic_update_slice(
                xt_aug,
                mean_t[:, None],
                (jnp.int32(0), jnp.asarray(col, jnp.int32)),
            )
            return (x_aug, zi_aug, xt_aug, keys_next), (ys, mean_t)

        _, (ys_stack, mean_stack) = lax.scan(
            step, (x_aug, zi_aug, xt_aug, keys), xs
        )
        # (p, S, n_test) -> (S, n_test, p); (p, n_test) -> (n_test, p).
        return jnp.transpose(ys_stack, (1, 2, 0)), mean_stack.T

    return tail
