"""Kernel-level roofline benchmark: Gram construction and Cholesky.

BASELINE.md target: Gram + Cholesky kernel throughput > 60% of roofline on
one TPU chip.  The rooflines differ:

- Gram with d << 128 features is **HBM-bound**: the mandatory traffic is
  the (n, m) float32 output write, so roofline = HBM write bandwidth.
  We report achieved GB/s (output bytes / wall-clock) against the chip's
  HBM bandwidth.
- Cholesky is **compute-bound** at large n: n^3/3 FLOPs.  We report
  achieved FLOP/s against the chip's f32 matmul peak (the MXU executes
  full-precision f32 as multi-pass bfloat16).

Prints one JSON line per measurement.  Not the driver bench — that is
``bench.py``.

Run: ``python bench_kernels.py`` (TPU, float32).
"""

import json
import os
import sys
import time

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


def timeit(fn, *args, reps=10):
    """Median wall-clock over ``reps`` calls, each with a slightly perturbed
    first argument.  The perturbation defeats execution memoisation in
    remote-relay TPU setups (identical (executable, args) pairs can return
    cached results, reporting physically impossible throughput)."""
    variants = [
        (args[0] * (1.0 + 1e-6 * i),) + args[1:] for i in range(reps + 1)
    ]
    jax.block_until_ready(variants)
    out = fn(*variants[-1])
    jax.block_until_ready(out)  # compile + warm
    t0 = time.time()
    outs = [fn(*variants[i]) for i in range(reps)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / reps


def bench_gram(n=16384, m=16384, d=8):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    # The regressor's composite kernel shape: EQ + scaled Linear.
    k = (1.5 * K.EQ().stretch(jnp.ones(d))) + 0.5 * K.Linear().stretch(
        jnp.ones(d)
    )

    results = {}
    # Both paths jitted whole, as they appear inside the fit/predict
    # programs (feature prep + padding fuse into the program).
    for name, fn in [
        ("pallas_fused", jax.jit(lambda a, b: gram_fused(k, a, b))),
        ("xla_jnp", jax.jit(lambda a, b: K.gram_eval(k, a, b))),
    ]:
        s = timeit(fn, x, y)
        out_gb = 4.0 * n * m / 1e9
        results[name] = {
            "seconds": s,
            "achieved_gbps": out_gb / s,
            "frac_of_hbm_roofline": (out_gb / s) / HBM_GBPS,
        }
    return results


def bench_cholesky(n=8192):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((n, 256)), jnp.float32)
    mat = a @ a.T + n * jnp.eye(n, dtype=jnp.float32)

    chol = jax.jit(linalg.safe_cholesky)
    s = timeit(chol, mat)
    flops = n**3 / 3.0
    return {
        "seconds": s,
        "achieved_tflops": flops / s / 1e12,
        "frac_of_f32_roofline": (flops / s / 1e12) / PEAK_F32_TFLOPS,
    }


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
        print(
            json.dumps(
                {
                    "metric": f"cholesky_n{n}_throughput",
                    "value": round(c["achieved_tflops"], 2),
                    "unit": "TFLOP/s",
                    "vs_baseline": round(c["frac_of_f32_roofline"], 3),
                }
            )
        )


if __name__ == "__main__":
    main()
