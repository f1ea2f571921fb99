"""Profile the 10M-site megakernel run and print the full per-op device
breakdown (VERDICT r4: 10M sites ran at 68% of the 1M per-site rate with
no recorded explanation). Compares per-site device time at 1M vs 10M in
the SAME session so chip-bandwidth variation cancels."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import collections
import glob
import gzip
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/demethify_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import N_INNER, N_U, make_problem  # noqa: E402
from demethify_tpu.solvers import fused  # noqa: E402


def full_breakdown(tracedir, fn, top=12):
    fn()
    with jax.profiler.trace(tracedir):
        fn()
    path = sorted(glob.glob(
        f"{tracedir}/plugins/profile/*/vm.trace.json.gz"))[-1]
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
    total = sum(dur.values())
    print(f"  total device: {total/1e3:.3f} ms")
    for n, d in dur.most_common(top):
        print(f"    {n}: {d/1e3:.3f} ms  (x{cnt[n]})")
    return total / 1e3


def run(scale: int, iters: int, tile: int = 0):
    y, d, Rt, u0, a0 = make_problem()
    if scale > 1:
        y = np.tile(y, (scale, 1))
        d = np.tile(d, (scale, 1))
        Rt = np.tile(Rt, (scale, 1))
        u0 = np.tile(u0, (scale, 1))
    n = y.shape[0]
    yj, dj, Rtj, uj, aj = (jax.device_put(x)
                           for x in (y, d, Rt, u0, a0))
    jax.block_until_ready([yj, dj, Rtj, uj, aj])
    print(f"{n} sites, {iters} outer iters, tile={tile or 'auto'}:")
    ms = full_breakdown(f"/tmp/prof_scale{scale}_{tile}", lambda: float(
        fused.partial_ref_solve_fused(uj, aj, yj, dj, Rtj, N_U,
                                      n_iter1=iters, n_iter2=N_INNER,
                                      tol=0.0, tile=tile)[2]["cost"]))
    per_iter = ms / iters
    print(f"  => {per_iter:.4f} ms/outer-iter, "
          f"{n * iters / (ms / 1e3) / 1e9:.3f} B site-iters/s",
          flush=True)
    return per_iter, n


def main():
    ms1, n1 = run(1, 50)
    ms10, n10 = run(10, 20)
    ratio = (ms10 / n10) / (ms1 / n1)
    print(f"per-site 10M/1M ratio: {ratio:.3f} (1.0 = flat scaling)")
    # tile sweep at 10M: if per-grid-step overhead (unhidden VPU FISTA
    # + fixed step cost) drives the falloff, larger tiles amortize it
    for tile in (32768, 49152, 65536):
        run(10, 20, tile=tile)


if __name__ == "__main__" and len(_sys.argv) > 1:
    # profile_10m.py SCALE ITERS [TILE]
    run(int(_sys.argv[1]), int(_sys.argv[2]),
        int(_sys.argv[3]) if len(_sys.argv) > 3 else 0)
    _sys.exit(0)


if __name__ == "__main__":
    main()
