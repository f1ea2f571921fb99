"""Device-time per outer iteration for the fused solvers (axon profiler)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import collections
import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/demethify_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_problem, N_U, N_INNER  # noqa: E402
from demethify_tpu.solvers import fused  # noqa: E402

ITERS = 50


def _device_durations(tracedir, fn):
    fn()  # warm
    with jax.profiler.trace(tracedir):
        fn()
    path = sorted(glob.glob(f"{tracedir}/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            if e["name"].startswith(("jit_", "while")):
                continue
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return dur, cnt


def device_ms(tracedir, fn):
    dur, _ = _device_durations(tracedir, fn)
    total = sum(dur.values())
    top = ", ".join(f"{n}={d/1e3:.2f}ms" for n, d in dur.most_common(4))
    return total / 1e3, top


def device_ms_split(tracedir, fn, iters):
    """(steady_ms, setup_ms, top): device time split into per-iteration
    work (events firing >= iters/2 times — the while-loop body kernels)
    and one-time setup (lane-padding, loop-invariant Gram precompute,
    initial cost — events firing once). A small profile window otherwise
    charges setup to the per-iter number: the 10M-site entry at 20 iters
    carried ~13 ms of one-time pads/Grams, inflating ms/iter by ~19%
    (round-4 BENCH_suite's '10M falloff' was partly this accounting)."""
    dur, cnt = _device_durations(tracedir, fn)
    steady = sum(d for n, d in dur.items() if cnt[n] >= max(2, iters // 2))
    setup = sum(dur.values()) - steady
    top = ", ".join(f"{n}={d/1e3:.2f}ms" for n, d in dur.most_common(4))
    return steady / 1e3, setup / 1e3, top


def main(which="all", storage=None, bf16_compute=False,
         packed_io=None):
    """``storage`` (e.g. jnp.bfloat16) casts the DATA arrays (Y, D, Rt)
    on device; the solver state (u, alpha) and all reductions stay f32
    (ops/gram.accum_dtype). bf16 storage halves the dominant HBM read
    traffic of the HBM-bound megakernel."""
    y, d, Rt, u0, a0 = make_problem()
    uj, aj, yj, dj, Rtj = [jax.device_put(x) for x in (u0, a0, y, d, Rt)]
    if storage is not None:
        yj, dj, Rtj = (x.astype(storage) for x in (yj, dj, Rtj))
    jax.block_until_ready([uj, aj, yj, dj, Rtj])

    tag = "" if storage is None else f" [{jnp.dtype(storage).name} storage]"
    if bf16_compute:
        tag += " [bf16 compute]"
    if packed_io:
        tag += " [packed io]"
    if which in ("all", "partial"):
        ms, top = device_ms("/tmp/prof_pr", lambda: float(
            fused.partial_ref_solve_fused(uj, aj, yj, dj, Rtj, N_U,
                                          n_iter1=ITERS, n_iter2=N_INNER,
                                          tol=0.0,
                                          bf16_compute=bf16_compute,
                                          packed_io=packed_io
                                          )[2]["cost"]))
        print(f"partial-ref fused{tag}: {ms/ITERS:.4f} ms/iter [{top}]",
              flush=True)

    if which in ("all", "purity"):
        rng = np.random.default_rng(1)
        purity = jnp.asarray(rng.uniform(0.3, 0.8, size=y.shape[1]),
                             jnp.float32)
        ms, top = device_ms("/tmp/prof_pur", lambda: float(
            fused.purity_solve_fused(uj, aj, yj, dj, Rtj, purity, N_U,
                                     n_iter1=20, n_iter2=500,
                                     tol=0.0)[2]["cost"]))
        print(f"purity fused     : {ms/20:.4f} ms/iter (500 FW) [{top}]",
              flush=True)

    if which in ("all", "unsup"):
        rng = np.random.default_rng(2)
        nu = 6
        u0u = jnp.asarray(rng.uniform(size=(y.shape[0], nu)), jnp.float32)
        a0u = jnp.asarray(rng.dirichlet(np.ones(nu), size=y.shape[1]).T,
                          jnp.float32)
        ms, top = device_ms("/tmp/prof_uns", lambda: float(
            fused.unsupervised_solve_fused(u0u, a0u, yj, dj, nu,
                                           n_iter1=ITERS, n_iter2=N_INNER,
                                           tol=0.0)[2]["cost"]))
        print(f"unsupervised n_u=6: {ms/ITERS:.4f} ms/iter [{top}]",
              flush=True)


def main_multi(n_b=16, n_iter1=20):
    """Multi-restart megakernel: ms/outer-iter/restart at B members."""
    rng = np.random.default_rng(3)
    y, d, Rt, u0, a0 = make_problem()
    n_cpg, n_s = y.shape
    u0_b = rng.uniform(size=(n_b, n_cpg, N_U)).astype(np.float32)
    a0_b = np.stack([
        rng.dirichlet(np.ones(Rt.shape[1] + N_U), size=n_s).T
        for _ in range(n_b)]).astype(np.float32)
    yj, dj, Rtj = (jax.device_put(x) for x in (y, d, Rt))
    ub, ab = jax.device_put(u0_b), jax.device_put(a0_b)
    jax.block_until_ready([yj, dj, Rtj, ub, ab])

    ms, top = device_ms("/tmp/prof_multi", lambda: float(jnp.sum(
        fused.partial_ref_solve_fused_multi(
            ub, ab, yj, dj, Rtj, N_U, n_iter1=n_iter1, n_iter2=N_INNER,
            tol=0.0)[2]["cost"])))
    print(f"partial-ref fused multi B={n_b}: "
          f"{ms/n_iter1/n_b:.4f} ms/iter/restart [{top}]", flush=True)


def main_multi_purity(n_b=8, n_iter1=5):
    rng = np.random.default_rng(4)
    y, d, Rt, u0, a0 = make_problem()
    n_cpg, n_s = y.shape
    purity = jnp.asarray(rng.uniform(0.3, 0.8, size=n_s), jnp.float32)
    u0_b = rng.uniform(size=(n_b, n_cpg, N_U)).astype(np.float32)
    a0_b = np.stack([
        rng.dirichlet(np.ones(Rt.shape[1] + N_U), size=n_s).T
        for _ in range(n_b)]).astype(np.float32)
    yj, dj, Rtj = (jax.device_put(x) for x in (y, d, Rt))
    ub, ab = jax.device_put(u0_b), jax.device_put(a0_b)
    jax.block_until_ready([yj, dj, Rtj, ub, ab])

    ms, top = device_ms("/tmp/prof_multi_pur", lambda: float(jnp.sum(
        fused.purity_solve_fused_multi(
            ub, ab, yj, dj, Rtj, purity, N_U, n_iter1=n_iter1,
            n_iter2=500, tol=0.0)[2]["cost"])))
    print(f"purity fused multi B={n_b}: "
          f"{ms/n_iter1/n_b:.4f} ms/iter/restart (500 FW) [{top}]",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "multi":
        main_multi()
    elif which == "multi_purity":
        main_multi_purity()
    elif which == "bf16":
        main("partial", storage=jnp.bfloat16)
    elif which == "bf16compute":
        main("partial", storage=jnp.bfloat16, bf16_compute=True)
    elif which == "packed":
        main("partial", packed_io=True)
    elif which == "packed_bf16":
        main("partial", storage=jnp.bfloat16, packed_io=True)
    else:
        main(which)
