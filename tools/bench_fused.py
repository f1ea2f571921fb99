"""Compare default XLA solver vs megakernel-fused solver on the bench workload."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/demethify_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_problem, N_U, N_OUTER, N_INNER  # noqa: E402

from demethify_tpu.solvers.partial_ref import partial_ref_solve  # noqa: E402
from demethify_tpu.solvers.fused import partial_ref_solve_fused  # noqa: E402


def time_fn(fn, *args, **kw):
    def run():
        out = fn(*args, **kw)
        return float(out[2]["cost"])

    t0 = time.time()
    cost = run()
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t = time.time()
        run()
        times.append(time.time() - t)
    return min(times), compile_s, cost


def main():
    y, d, Rt, u0, a0 = make_problem()
    args = [jax.device_put(x) for x in (u0, a0, y, d, Rt)]
    jax.block_until_ready(args)

    t_x, c_x, cost_x = time_fn(partial_ref_solve, *args, N_U,
                               n_iter1=N_OUTER, n_iter2=N_INNER, tol=0.0)
    print(f"xla    : {t_x*1e3/N_OUTER:.4f} ms/iter  total {t_x:.3f}s "
          f"(compile {c_x:.0f}s) cost {cost_x:.6e}", flush=True)

    t_f, c_f, cost_f = time_fn(partial_ref_solve_fused, *args, N_U,
                               n_iter1=N_OUTER, n_iter2=N_INNER, tol=0.0)
    print(f"fused  : {t_f*1e3/N_OUTER:.4f} ms/iter  total {t_f:.3f}s "
          f"(compile {c_f:.0f}s) cost {cost_f:.6e}", flush=True)
    print(f"speedup: {t_x/t_f:.2f}x; rel cost diff "
          f"{abs(cost_x-cost_f)/cost_x:.2e}", flush=True)


if __name__ == "__main__":
    main()
