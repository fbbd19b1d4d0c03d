"""Kernel-level roofline benchmark: Gram construction and Cholesky.

BASELINE.md target: Gram + Cholesky kernel throughput > 60% of roofline on
one TPU chip.  The rooflines differ:

- Gram with d << 128 features is **HBM-bound**: the mandatory traffic is
  the (n, m) float32 output write, so roofline = HBM write bandwidth.
- Cholesky is **compute-bound** at large n: n^3/3 FLOPs against the
  f32-highest MXU peak (full-precision f32 executes as 6-pass bfloat16,
  so peak_f32 = peak_bf16 / 6).

Measurement methodology (see PERF.md finding 3): wall-clock through the
remote TPU relay is dominated by per-call dispatch (~40 ms) and defeated
by execution memoisation, so kernels are timed **on-device** — each
program runs under ``jax.profiler.trace`` and the XLA-op durations are
summed from the xplane protobuf.  Gram is measured as (gram+matvec) minus
(matvec alone): the matvec consumer forces materialisation of the (n, m)
output without XLA fusing the reduction into the Gram computation.

Prints one JSON line per measurement.  Not the driver bench — that is
``bench.py``.

Run: ``python bench_kernels.py`` (TPU, float32).
"""

import glob
import json
import os
import sys

os.environ.setdefault("GPAR_TPU_NO_X64", "1")

import numpy as np

import jax
import jax.numpy as jnp

from gpar_tpu.ops import kernels as K
from gpar_tpu.ops import linalg
from gpar_tpu.ops.pallas_gram import gram_fused

# TPU v5e (v5 lite) specs; override for other chips.
HBM_GBPS = float(os.environ.get("BENCH_HBM_GBPS", 819.0))
# Peak bf16 MXU throughput; full-precision f32 ("highest") runs 6 passes.
PEAK_BF16_TFLOPS = float(os.environ.get("BENCH_PEAK_BF16_TFLOPS", 197.0))
PEAK_F32_TFLOPS = PEAK_BF16_TFLOPS / 6.0


def device_seconds(fn, args, tag):
    """On-device execution time of one jitted call, from the profiler's
    xplane: the sum of XLA-op durations on the TPU plane.  Immune to relay
    dispatch overhead and (for the trace itself) to memoisation games —
    TPU execution is statically scheduled, so one profiled run is
    representative."""
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    tmp = f"/tmp/gpar_tpu_xprof_{tag}"
    with jax.profiler.trace(tmp):
        jax.block_until_ready(fn(*args))
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # pragma: no cover - fallback without tensorflow
        print(
            "[bench_kernels] tensorflow xplane proto unavailable; "
            "on-device times cannot be extracted",
            file=sys.stderr,
        )
        raise
    total_ps = 0
    files = glob.glob(tmp + "/**/*.xplane.pb", recursive=True)
    for f in files:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(f, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            for line in plane.lines:
                if "xla op" in line.name.lower():
                    total_ps += sum(ev.duration_ps for ev in line.events)
    assert total_ps > 0, f"no device events captured under {tmp}"
    return total_ps / 1e12


def bench_gram(n=16384, m=16384, d=8):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((m,)), jnp.float32)
    # The regressor's composite kernel shape: EQ + scaled Linear.
    k = (1.5 * K.EQ().stretch(jnp.ones(d))) + 0.5 * K.Linear().stretch(
        jnp.ones(d)
    )

    # Matvec consumer forces the (n, m) Gram to materialise; its own cost
    # is measured separately and subtracted.
    G = jax.jit(lambda a, b: K.gram_eval(k, a, b))(x, y)
    jax.block_until_ready(G)
    t_mv = device_seconds(jax.jit(lambda M, vv: M @ vv), (G, v), f"mv{n}")

    results = {}
    for name, fn in [
        ("pallas_fused", jax.jit(lambda a, b, vv: gram_fused(k, a, b) @ vv)),
        ("xla_jnp", jax.jit(lambda a, b, vv: K.gram_eval(k, a, b) @ vv)),
    ]:
        t = device_seconds(fn, (x, y, v), f"gram_{name}_{n}") - t_mv
        out_gb = 4.0 * n * m / 1e9
        results[name] = {
            "seconds": t,
            "achieved_gbps": out_gb / t,
            "frac_of_hbm_roofline": (out_gb / t) / HBM_GBPS,
        }
    return results


def bench_cholesky(n=8192):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((n, 256)), jnp.float32)
    mat = jax.jit(lambda a: a @ a.T + n * jnp.eye(n, dtype=jnp.float32))(a)
    jax.block_until_ready(mat)
    flops = n**3 / 3.0

    def blocked_variant(block, subblock, left):
        return jax.jit(
            lambda mat: linalg.blocked_cholesky(mat, block, subblock, left)
        )

    variants = [
        ("xla_builtin", jax.jit(jnp.linalg.cholesky)),
        ("blocked_default", jax.jit(linalg.blocked_cholesky)),  # config knobs
        ("blocked_left_b256", blocked_variant(256, None, True)),
        ("blocked_left_b512", blocked_variant(512, None, True)),
        ("blocked_right_b512", blocked_variant(512, None, False)),  # round-1 form
    ]
    results = {}
    for name, fn in variants:
        t = device_seconds(fn, (mat,), f"chol_{name}_{n}")
        results[name] = {
            "seconds": t,
            "achieved_tflops": flops / t / 1e12,
            "frac_of_f32_roofline": (flops / t / 1e12) / PEAK_F32_TFLOPS,
        }
    return results


def main():
    for n in (8192, 16384):
        g = bench_gram(n=n, m=n)
        for name, r in g.items():
            print(
                json.dumps(
                    {
                        "metric": f"gram_{name}_n{n}_write_bandwidth",
                        "value": round(r["achieved_gbps"], 1),
                        "unit": "GB/s",
                        "vs_baseline": round(r["frac_of_hbm_roofline"], 3),
                    }
                )
            )
    for n in (4096, 8192):
        c = bench_cholesky(n=n)
        for name, r in c.items():
            print(
                json.dumps(
                    {
                        "metric": f"cholesky_{name}_n{n}_throughput",
                        "value": round(r["achieved_tflops"], 2),
                        "unit": "TFLOP/s",
                        "vs_baseline": round(r["frac_of_f32_roofline"], 3),
                    }
                )
            )


if __name__ == "__main__":
    main()
