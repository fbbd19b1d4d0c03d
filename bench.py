"""Benchmark: sparse GPAR fit + predict at n=10k, p=16 on one TPU chip.

The BASELINE.md build target: fit + predict wall-clock at n=10k / p=16 in
< 10 s on a single chip (the reference has no committed numbers — it is a
single-process float64 CPU package; see BASELINE.md).  The workload mirrors
the largest paper config (air-temp, reference ``examples/paper/air_temp.py``:
inducing points, linear + nonlinear output dependencies, impute + replace,
output normalisation), scaled up to p=16 outputs and n=10k rows.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}
``vs_baseline`` is target_seconds / measured_seconds (>1 == beating the
10 s target).

Run on TPU in float32 (TPU has no native f64; the 1e-6 numerical parity bar
is enforced by the float64 CPU test suite instead).  A warmup pass at
identical shapes populates the jit caches so the measurement reflects
steady-state production use; cold-compile cost is reported separately on
stderr.
"""

import json
import os
import sys
import time

os.environ.setdefault("GPAR_TPU_NO_X64", "1")  # float32 on TPU

import numpy as np

import gpar_tpu
from gpar_tpu import GPARRegressor, set_seed

TARGET_SECONDS = 10.0


def make_data(n=10_000, p=16, seed=0):
    """Synthetic closed-downwards chain: each output depends nonlinearly on
    the previous one plus the input (the GPAR generative structure).

    Returns ``(x, y, f)`` with ``f`` the noiseless truth — the bench's
    quality line scores predictions against it (SMSE vs truth)."""
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 10.0, size=n))
    cols = [np.sin(x) - x**2 / 50.0]
    for i in range(1, p):
        prev = cols[-1]
        cols.append(np.cos(prev) ** 2 + np.sin((i + 1) * x / 3.0) / (1 + i / 8.0))
    f = np.stack(cols, axis=1)
    y = f + 0.05 * rng.standard_normal((n, p))
    return x.astype(np.float32), y.astype(np.float32), f.astype(np.float32)


def build_model(x):
    # Air-temp style D-GPAR-L-NL config (reference examples/paper/air_temp.py
    # :35-46) with 256 inducing points.
    x_ind = np.linspace(float(x.min()), float(x.max()), 256)
    return GPARRegressor(
        scale=0.2,
        linear=True,
        linear_scale=10.0,
        nonlinear=True,
        nonlinear_scale=1.0,
        noise=0.1,
        impute=True,
        replace=True,
        normalise_y=True,
        x_ind=x_ind,
    )


def run_once(reg, x, y, x_test, iters, num_samples, key_seed):
    """Two-call path (fit, then predict) — kept for the phase breakdown."""
    set_seed(key_seed)
    t0 = time.time()
    reg.fit(x, y, iters=iters)
    t_fit = time.time() - t0
    t0 = time.time()
    mean, lowers, uppers = reg.predict(
        x_test, num_samples=num_samples, credible_bounds=True, latent=False
    )
    t_pred = time.time() - t0
    assert np.isfinite(mean).all(), "non-finite predictions"
    return t_fit, t_pred


def run_once_fused(reg, x, y, x_test, iters, num_samples, key_seed):
    """Production serving path: fit + conditioning + MC prediction as ONE
    compiled program / device round-trip (GPARRegressor.fit_predict)."""
    set_seed(key_seed)
    t0 = time.time()
    mean, lowers, uppers = reg.fit_predict(
        x, y, x_test, iters=iters, num_samples=num_samples,
        credible_bounds=True, latent=False,
    )
    total = time.time() - t0
    assert np.isfinite(mean).all(), "non-finite predictions"
    return total, mean


# Golden quality envelopes (VERDICT r2 №3): regression gates on the seeded,
# deterministic bench workloads, with ~2.5x margin over the values measured
# on-chip in rounds 1-2 (PERF.md "Headline"):
#   10k/p16:  mean SMSE 2e-4 (worst 5e-4), NLL decrease ~106k
#   50k/p32:  mean SMSE 7.1e-3 (worst 0.22), NLL decrease ~1.17M
# A quality regression (bad kernel change, broken optimiser step, noise-
# floor regression) fails the bench run outright rather than shipping a
# fast-but-wrong number.
QUALITY_GATES = {
    "10k": dict(mean_smse=5e-4, worst_smse=2e-3, nll_decrease=5e4),
    "50k": dict(mean_smse=3e-2, worst_smse=5e-1, nll_decrease=5e5),
}


def report_quality(reg, mean, f_test, gates):
    """Prove the timed fit converges AND meets the committed golden
    envelope (stderr block + hard asserts).

    Reports the total NLL decrease across layers (from the fused fit's
    ``last_fit_report``: initial vs final per-layer NLL at the bench's
    iteration budget) and the mean SMSE of the predictive mean against the
    noiseless synthetic truth."""
    from gpar_tpu.utils.metrics import smse

    rep = reg.last_fit_report
    nll0 = float(np.sum(rep["layer_nll0"]))
    nll = float(np.sum(rep["layer_nll"]))
    iters_used = rep["layer_iters"]
    s = smse(mean, f_test)
    mean_s, worst_s = float(np.nanmean(s)), float(np.nanmax(s))
    print(
        f"[bench] quality: sum NLL {nll0:.1f} -> {nll:.1f} "
        f"(decrease {nll0 - nll:.1f}; per-layer iters used "
        f"min {int(iters_used.min())} max {int(iters_used.max())}); "
        f"mean SMSE vs noiseless truth {mean_s:.4f} "
        f"(worst output {worst_s:.4f})",
        file=sys.stderr,
    )
    assert nll0 - nll >= gates["nll_decrease"], (
        f"NLL decrease {nll0 - nll:.1f} below the golden envelope "
        f"{gates['nll_decrease']:.1f} — the fit regressed"
    )
    assert mean_s <= gates["mean_smse"], (
        f"mean SMSE {mean_s:.2e} above the golden envelope "
        f"{gates['mean_smse']:.2e} — prediction quality regressed"
    )
    assert worst_s <= gates["worst_smse"], (
        f"worst-output SMSE {worst_s:.2e} above the golden envelope "
        f"{gates['worst_smse']:.2e} — prediction quality regressed"
    )


def main_serve():
    """``--serve``: the production serving story, driver-visible
    (VERDICT r4 №5).  One process = one serving worker: ``warmup()``
    pre-compiles the bucketed programs for two adjacent row buckets,
    then a sweep of fresh datasets — FRESH estimator instance per
    request, row counts spread across both buckets — runs
    ``fit_predict`` end to end.  Reports per-request latency p50/p95 on
    stderr and ONE JSON line (p95) on stdout.

    What the sweep proves: request latency is the warm number, not a
    per-dataset XLA compile — every data-derived value rides into the
    shared executables as a traced argument.  The first request per
    bucket after ``warmup()`` isolates the residual host-side cost
    (plan construction + transfer), the tail requests the steady state.
    """
    gpar_tpu.config.epsilon = 1e-6
    from gpar_tpu.config import bucket_rows

    p, n_test, num_samples, iters = 16, 1024, 100, 10
    nA = 10_000
    bA = bucket_rows(nA)
    nB = bA + 1  # first count in the NEXT bucket
    bB = bucket_rows(nB)
    counts = [nA, nA + 350, bA, nB, nB + 300, nB + 600]
    assert all(bucket_rows(c) in (bA, bB) for c in counts)

    # Warm both buckets from synthetic data (no real data needed).
    proto = build_model(np.array([0.0, 10.0]))
    t0 = time.time()
    proto.warmup(nA, p, n_test=n_test, num_samples=num_samples,
                 iters=iters, paths=("fit_predict",))
    proto.warmup(nB, p, n_test=n_test, num_samples=num_samples,
                 iters=iters, paths=("fit_predict",))
    t_warm = time.time() - t0
    print(f"[bench-serve] warmup (buckets {bA} + {bB}): {t_warm:.1f}s",
          file=sys.stderr)

    lat = []
    score_lat = []
    for i, n_i in enumerate(counts):
        x, y, f = make_data(n_i, p, seed=100 + i)
        xt = x[:: max(1, n_i // n_test)][:n_test]
        reg = build_model(x)  # fresh instance: a new request
        set_seed(1000 + i)
        t0 = time.time()
        mean, lo, up = reg.fit_predict(
            x, y, xt, iters=iters, num_samples=num_samples,
            credible_bounds=True,
        )
        dt = time.time() - t0
        assert np.isfinite(mean).all()
        lat.append(dt)
        # Held-out scoring on the same fitted model (the bucketed logpdf
        # programs; first dataset pays the one compile per bucket).
        xs, ys, _ = make_data(2000 + 31 * i, p, seed=500 + i)
        t0 = time.time()
        lp = reg.logpdf(xs, ys)
        lpp = reg.logpdf(xs, ys, posterior=True)
        ds = time.time() - t0
        assert np.isfinite(lp) and np.isfinite(lpp)
        score_lat.append(ds)
        print(
            f"[bench-serve] request {i}: n={n_i} bucket={bucket_rows(n_i)} "
            f"fit_predict {dt:.2f}s  score(prior+post) {ds:.2f}s",
            file=sys.stderr,
        )
    lat_sorted = sorted(lat)
    p50 = lat_sorted[len(lat) // 2]
    p95 = lat_sorted[min(len(lat) - 1, int(round(0.95 * (len(lat) - 1))))]
    first_per_bucket = {bucket_rows(counts[0]): lat[0],
                        bucket_rows(nB): lat[3]}
    score_sorted = sorted(score_lat)
    print(
        f"[bench-serve] latency p50 {p50:.2f}s p95 {p95:.2f}s "
        f"(first request per bucket: "
        + ", ".join(f"{b}: {t:.2f}s" for b, t in first_per_bucket.items())
        + f"); held-out scoring p50 {score_sorted[len(score_lat) // 2]:.2f}s "
        f"(first {score_lat[0]:.2f}s incl. compiles)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "gpar_serve_fresh_dataset_p95_wall_clock",
                "value": round(p95, 3),
                "unit": "s",
                "vs_baseline": round(TARGET_SECONDS / p95, 3),
            }
        )
    )


def main():
    gpar_tpu.config.epsilon = 1e-6  # float32 jitter floor

    # --stress: the BASELINE.md stress config — n=50k, p=32, inducing
    # points, 100-sample vmapped predictive with credible bounds.
    stress = "--stress" in sys.argv
    if stress:
        n, p = 50_000, 32
        metric = "gpar_fit_predict_n50k_p32_stress_wall_clock"
        target = 60.0  # no committed reference number; 60 s sanity ceiling
        gates = QUALITY_GATES["50k"]
    else:
        n, p = 10_000, 16
        metric = "gpar_fit_predict_n10k_p16_wall_clock"
        target = TARGET_SECONDS
        gates = QUALITY_GATES["10k"]
    n_test, num_samples, iters = 1024, 100, 10
    x, y, f = make_data(n, p)
    test_idx = np.arange(n)[:: n // n_test][:n_test]
    x_test, f_test = x[test_idx], f[test_idx]

    reg = build_model(x)

    # Snapshot the INITIAL hyperparameter state so every timed pass runs
    # the full optimisation from identical (fresh) initial conditions.
    # Without this, warm re-fits would start from the previous pass's
    # converged latents, terminate L-BFGS after ~1 iteration, and the
    # quality line would describe a degenerate re-fit instead of a real
    # one.
    reg.condition(x, y)
    reg._ensure_vars(reg.p)
    z_init = reg.vs.snapshot()

    # Cold pass: pays tracing + XLA compiles (persistently cached on disk).
    t0 = time.time()
    cold_fit, cold_pred = run_once(reg, x, y, x_test, iters, num_samples, 0)
    reg.vs.restore(z_init)
    cold_fused, _ = run_once_fused(reg, x, y, x_test, iters, num_samples, 0)
    print(
        f"[bench] cold: fit {cold_fit:.1f}s predict {cold_pred:.1f}s "
        f"fused fit_predict {cold_fused:.1f}s "
        f"(total incl. setup {time.time() - t0:.1f}s)",
        file=sys.stderr,
    )

    # Steady-state passes: same shapes and data -> cached executables;
    # same initial hyperparameters -> identical optimisation work.
    reg.vs.restore(z_init)
    fit_s, pred_s = run_once(reg, x, y, x_test, iters, num_samples, 1)
    print(
        f"[bench] warm two-call: fit {fit_s:.1f}s predict {pred_s:.1f}s "
        f"total {fit_s + pred_s:.1f}s",
        file=sys.stderr,
    )
    # The headline: the single-dispatch production path (one compiled
    # program for fit + conditioning + 100-sample predictive; one host
    # round-trip), from fresh initial hyperparameters.
    reg.vs.restore(z_init)
    total, mean = run_once_fused(reg, x, y, x_test, iters, num_samples, 1)
    print(f"[bench] warm fused fit_predict: {total:.1f}s", file=sys.stderr)
    report_quality(reg, mean, f_test, gates)

    # Second-dataset cold (VERDICT r3 №1): a NEW dataset with a different
    # row count inside the same shape bucket must reuse the compiled
    # executable — production "new dataset" latency is the warm number,
    # not a fresh XLA compile.
    from gpar_tpu.config import bucket_rows

    n2 = n + n // 20
    x2, y2, f2 = make_data(n2, p, seed=42)
    assert bucket_rows(n2) == bucket_rows(n), (n, n2)
    reg2 = build_model(x2)
    t0 = time.time()
    total2, mean2 = run_once_fused(reg2, x2, y2, x2[:: n2 // n_test][:n_test],
                                   iters, num_samples, 2)
    assert np.isfinite(mean2).all()
    print(
        f"[bench] second-dataset cold (n={n2}, same bucket "
        f"{bucket_rows(n)}): fused fit_predict {total2:.1f}s "
        f"(bucket reuse; was ~{cold_fused:.0f}s per fresh shape unbucketed)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(total, 3),
                "unit": "s",
                "vs_baseline": round(target / total, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--serve" in sys.argv:
        main_serve()
    else:
        main()
