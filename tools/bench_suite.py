"""Multi-workload benchmark suite: one JSON line per workload.

`bench.py` stays the driver's single flagship artifact; this suite
records every README headline number from ONE session so regressions in
the secondary kernels (FW/purity, weighted bootstrap, general-case
multi, 10M scale, sweep compile-once) are caught by a committed
artifact (`BENCH_suite.json`) instead of living in unreproducible
profiling sessions.

Usage: `timeout 6000 python tools/bench_suite.py [--out BENCH_suite.json]`
(runs on the real TPU; every config is a fresh HLO on a cold cache).
Device time comes from jax.profiler traces (the axon tunnel adds ~60 ms
of dispatch latency per call that wall-clock would mis-attribute), and
solver rows report STEADY-STATE per-iteration device time (while-body
kernels only) with the one-time setup (lane pads, loop-invariant Grams,
initial cost) as a separate `setup_ms` field — a short profile window
otherwise charges setup to ms/iter (round 4's 10M row carried ~13 ms of
setup over 20 iters, inflating it ~19%). Raw `value`s also scale with
the session chip's delivered HBM bandwidth (see bench.py / ROADMAP
round-5 findings) — compare across sessions via tools/hbm_calibrate.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/demethify_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import N_CPG, N_INNER, N_U, make_problem  # noqa: E402
from tools.profile_solvers import device_ms_split  # noqa: E402
from demethify_tpu.solvers import fused  # noqa: E402

RESULTS = []


def emit(metric, value, unit, **extra):
    row = {"metric": metric, "value": round(value, 4), "unit": unit}
    row.update(extra)
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def _restart_batch(rng, n_cpg, n_s, p_full, n_u, n_b):
    u0_b = rng.uniform(size=(n_b, n_cpg, n_u)).astype(np.float32)
    a0_b = np.stack([rng.dirichlet(np.ones(p_full), size=n_s).T
                     for _ in range(n_b)]).astype(np.float32)
    return jax.device_put(u0_b), jax.device_put(a0_b)


def main(out_path=None):
    y, d, Rt, u0, a0 = make_problem()
    n_cpg, n_s = y.shape
    n_ct = Rt.shape[1]
    yj, dj, Rtj, uj, aj = (jax.device_put(x) for x in (y, d, Rt, u0, a0))
    jax.block_until_ready([yj, dj, Rtj, uj, aj])
    rng = np.random.default_rng(42)

    # 1. flagship: 1M-site partial-ref megakernel, f32
    iters = 50
    ms, setup, _ = device_ms_split("/tmp/bsuite_pr", lambda: float(
        fused.partial_ref_solve_fused(uj, aj, yj, dj, Rtj, N_U,
                                      n_iter1=iters, n_iter2=N_INNER,
                                      tol=0.0)[2]["cost"]), iters)
    emit("partial-ref megakernel, 1M sites x 10 samples, f32",
         ms / iters, "ms/outer-iter",
         site_iters_per_s=round(n_cpg * iters / (ms / 1e3), 1),
         setup_ms=round(setup, 3))

    # 2. flagship under bf16 storage (Y/D/Rt bf16, f32 state/accum) —
    # measured AT PARITY with f32 (ROADMAP round-4 note); pinned here so
    # a regression in the bf16 path is visible
    yb, db, Rtb = (x.astype(jnp.bfloat16) for x in (yj, dj, Rtj))
    jax.block_until_ready([yb, db, Rtb])
    ms, setup, _ = device_ms_split("/tmp/bsuite_bf16", lambda: float(
        fused.partial_ref_solve_fused(uj, aj, yb, db, Rtb, N_U,
                                      n_iter1=iters, n_iter2=N_INNER,
                                      tol=0.0)[2]["cost"]), iters)
    emit("partial-ref megakernel, 1M sites, bf16 storage",
         ms / iters, "ms/outer-iter", setup_ms=round(setup, 3))

    # 3. multi-restart megakernel, n_u = 1 closed form, B = 16
    B = 16
    u0_b, a0_b = _restart_batch(rng, n_cpg, n_s, n_ct + N_U, N_U, B)
    it1 = 20
    ms, setup, _ = device_ms_split("/tmp/bsuite_multi", lambda: float(
        jnp.sum(fused.partial_ref_solve_fused_multi(
            u0_b, a0_b, yj, dj, Rtj, N_U, n_iter1=it1, n_iter2=N_INNER,
            tol=0.0)[2]["cost"])), it1)
    emit("multi-restart megakernel, 1M sites, B=16, n_u=1",
         ms / it1 / B, "ms/outer-iter/restart", setup_ms=round(setup, 3))

    # 4. GENERAL-case multi megakernel, n_u = 4, B = 16 (round-4
    # rework: component-list FISTA, pair-product grams, raised
    # scoped-VMEM limit — see ROADMAP.md)
    n_u4 = 4
    u0_b4, a0_b4 = _restart_batch(rng, n_cpg, n_s, n_ct + n_u4, n_u4, B)
    it1 = 10
    ms, setup, _ = device_ms_split("/tmp/bsuite_multi4", lambda: float(
        jnp.sum(fused.partial_ref_solve_fused_multi(
            u0_b4, a0_b4, yj, dj, Rtj, n_u4, n_iter1=it1,
            n_iter2=N_INNER, tol=0.0)[2]["cost"])), it1)
    emit("multi-restart megakernel, 1M sites, B=16, n_u=4 (general)",
         ms / it1 / B, "ms/outer-iter/restart", setup_ms=round(setup, 3))

    # 5. weighted-bootstrap megakernel: B = 16 replicates as
    # row-multiplicity weights on shared (Y, D, Rt)
    idx = rng.integers(0, n_cpg, size=(B, n_cpg))
    w_b = jax.device_put(np.stack(
        [np.bincount(idx[b], minlength=n_cpg) for b in range(B)]
    ).astype(np.float32))
    jax.block_until_ready(w_b)
    it1 = 20
    ms, setup, _ = device_ms_split("/tmp/bsuite_wboot", lambda: float(
        jnp.sum(fused.partial_ref_solve_fused_multi(
            u0_b, a0_b, yj, dj, Rtj, N_U, n_iter1=it1, n_iter2=N_INNER,
            tol=0.0, row_weights_b=w_b)[2]["cost"])), it1)
    emit("weighted-bootstrap megakernel, 1M sites, B=16 replicates",
         ms / it1 / B, "ms/outer-iter/replicate",
         setup_ms=round(setup, 3))

    # 6. purity multi-restart, B = 8 (500 FW steps per outer iteration)
    Bp = 8
    u0_bp, a0_bp = _restart_batch(rng, n_cpg, n_s, n_ct + N_U, N_U, Bp)
    purity = jax.device_put(
        rng.uniform(0.3, 0.8, size=n_s).astype(np.float32))
    it1 = 5
    ms, setup, _ = device_ms_split("/tmp/bsuite_pur", lambda: float(
        jnp.sum(fused.purity_solve_fused_multi(
            u0_bp, a0_bp, yj, dj, Rtj, purity, N_U, n_iter1=it1,
            n_iter2=500, tol=0.0)[2]["cost"])), it1)
    emit("purity multi-restart megakernel, 1M sites, B=8, 500 FW",
         ms / it1 / Bp, "ms/outer-iter/restart",
         setup_ms=round(setup, 3))

    # 7. 10M-site single-member solve (genome scale on one chip)
    n10 = 10 * N_CPG
    reps = 10
    y10 = np.tile(y, (reps, 1))
    d10 = np.tile(d, (reps, 1))
    Rt10 = np.tile(Rt, (reps, 1))
    u10 = np.tile(u0, (reps, 1))
    y10j, d10j, Rt10j, u10j = (jax.device_put(x)
                               for x in (y10, d10, Rt10, u10))
    jax.block_until_ready([y10j, d10j, Rt10j, u10j])
    it1 = 20
    ms, setup, _ = device_ms_split("/tmp/bsuite_10m", lambda: float(
        fused.partial_ref_solve_fused(u10j, aj, y10j, d10j, Rt10j, N_U,
                                      n_iter1=it1, n_iter2=N_INNER,
                                      tol=0.0)[2]["cost"]), it1)
    emit("partial-ref megakernel, 10M sites", ms / it1, "ms/outer-iter",
         site_iters_per_s=round(n10 * it1 / (ms / 1e3), 1),
         setup_ms=round(setup, 3))

    # 8. supervised (reference-based WLS) path: all 10 samples' weighted
    # NNLS-with-intercept at 1M sites in one batched dispatch
    # (ops/nnls.wls_intercept_batch; reference loops sklearn per sample,
    # `demethify/demethify.py:209-213` — 5.1 ms for 350 sites)
    from demethify_tpu.ops.nnls import wls_intercept_batch

    wls = jax.jit(lambda: wls_intercept_batch(dj * yj, dj, Rtj))
    ms, setup, _ = device_ms_split("/tmp/bsuite_sup", lambda: float(
        jnp.sum(wls())), 1)
    emit("supervised WLS (NNLS+intercept), 1M sites x 10 samples",
         ms + setup, "ms/solve")

    # 9. genome-scale CI writer: 1M x 2 "(lo, hi)" cells to CSV
    # (io/writers.write_ci_profile vectorized string assembly — host)
    import tempfile

    from demethify_tpu.io.writers import write_ci_profile

    lo = rng.uniform(size=(n_cpg, 2))
    hi = lo + rng.uniform(size=(n_cpg, 2))
    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        write_ci_profile(td, lo, hi, ["unknown_cell_1",
                                      "unknown_cell_2"])
        emit("CI profile writer, 1M rows x 2 unknowns",
             time.time() - t0, "s")

    # 10. warm compile-once AIC sweep on the fixture-scale workload
    # (350 x 10, 5 known cell types — the reference took 6.95 s)
    from demethify_tpu.selection.batched_sweep import evaluate_ic_batched

    yf, df, Rtf, _, _ = make_problem()
    yf, df, Rtf = yf[:350], df[:350], Rtf[:350]
    yfj, dfj, Rtfj = (jax.device_put(np.ascontiguousarray(x))
                      for x in (yf, df, Rtf))
    jax.block_until_ready([yfj, dfj, Rtfj])

    def sweep():
        _, _, n_u, ics = evaluate_ic_batched(
            yfj, dfj, Rtfj, "AIC", seed=1, iter1=10000, iter2=20,
            tol=1e-2, n_u_max=25)
        return n_u

    sweep()   # compile
    t0 = time.time()
    sweep()
    emit("warm AIC sweep n_u=1..25, 350-site fixture scale",
         time.time() - t0, "s")

    # 11. same-session hardware calibration: the solver rows above are
    # HBM-bound and scale with the session chip's delivered bandwidth
    # (ROADMAP round-5); this row makes the artifact self-normalizing
    try:
        from tools.hbm_calibrate import measured_bandwidth_gbs

        emit("session chip: achieved HBM stream bandwidth",
             measured_bandwidth_gbs(), "GB/s",
             device=jax.devices()[0].device_kind)
    except Exception as e:                      # probe is best-effort
        print(f"calibration skipped: {e}", flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(RESULTS, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    out = None
    if len(_sys.argv) > 2 and _sys.argv[1] == "--out":
        out = _sys.argv[2]
    main(out)
