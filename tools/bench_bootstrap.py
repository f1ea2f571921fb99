"""Genome-scale bootstrap timing: weighted (row-multiplicity) vs
gathered-resample layouts at 1M sites on the TPU.

The weighted mode's point is memory: a gathered batch keeps
B x (2 n_s + n_ct) x n_cpg floats of copies (100 MB per replicate at 1M
sites x 10 samples), the weighted batch one (n_cpg,) vector per
replicate. This script times B replicates through each layout at a fixed
iteration budget (tol=0) and prints seconds per replicate.

MEASURED (v5e, B=16, 50x20 iters, 1M sites, jax.profiler): the vmapped
XLA weighted batch runs 0.395 ms device time per outer-iter per
replicate; the multi-member MEGAKERNEL route (default on a single TPU
device — per-member weights folded into its Gram accumulations, one
shared Y/D read per outer iteration) runs 0.106. The ~60 s wall on this
dev image is the remote axon tunnel + trace overhead, not compute — see
tools/profile_solvers.device_ms for honest numbers.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/demethify_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_problem, N_U  # noqa: E402
from demethify_tpu.uncertainty.bootstrap import bootstrap_ci  # noqa: E402

B = 16
ITER1 = 50


def run(method):
    y, d, Rt, _, _ = make_problem()
    for label in ("cold", "warm"):
        t0 = time.time()
        lo, hi, lo_u, hi_u = bootstrap_ci(
            y, d, Rt, N_U, level=95.0, n_bootstrap=B, n_iter1=ITER1,
            n_iter2=20, tol=0.0, key=jax.random.PRNGKey(0),
            method=method)
        wall = time.time() - t0
        assert np.all(np.isfinite(lo)) and np.all(np.isfinite(hi))
        print(f"{method:9s} {label}: {wall:.1f}s total, "
              f"{wall/B:.2f}s/replicate (B={B}, {ITER1}x20 iters, "
              f"1M sites)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "weights"
    run(which)
