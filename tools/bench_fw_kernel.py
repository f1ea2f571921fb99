"""Micro-benchmark the member-batched Frank-Wolfe kernel: per-step cost
vs fixed launch overhead (vary n_steps at fixed shapes), to locate the
purity solver's VPU floor. Device time from the profiler."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/demethify_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.profile_solvers import device_ms  # noqa: E402
from demethify_tpu.ops.pallas_small import fw_phase_full_multi  # noqa: E402


def main(n_b=8, n_s=10, n_ct=5, n_u=1):
    rng = np.random.default_rng(0)
    p = n_ct + n_u
    gtt = jnp.asarray(rng.uniform(size=(n_s, n_ct, n_ct)), jnp.float32)
    bt = jnp.asarray(rng.uniform(size=(n_ct, n_s)), jnp.float32)
    gu_b = jnp.asarray(rng.uniform(size=(n_b, n_s, n_u, p)), jnp.float32)
    bu_b = jnp.asarray(rng.uniform(size=(n_b, n_u, n_s)), jnp.float32)
    ydy = jnp.asarray(rng.uniform(size=(n_s,)), jnp.float32)
    alpha_b = jnp.asarray(
        np.stack([rng.dirichlet(np.ones(p), size=n_s).T
                  for _ in range(n_b)]), jnp.float32)
    purity = jnp.asarray(rng.uniform(0.3, 0.8, size=n_s), jnp.float32)
    jax.block_until_ready([gtt, bt, gu_b, bu_b, ydy, alpha_b, purity])

    results = {}
    for n_steps in (100, 500, 1000):
        # n_steps must stay a static Python int (it shapes the unroll)
        fn = jax.jit(lambda ns=n_steps: jnp.sum(fw_phase_full_multi(
            gtt, bt, gu_b, bu_b, ydy, alpha_b, purity, 2500.0,
            ns, n_u)[0]))
        ms, top = device_ms(f"/tmp/fwk_{n_steps}",
                            lambda: float(fn()))
        results[n_steps] = ms
        print(f"n_steps={n_steps}: {ms:.4f} ms  [{top}]", flush=True)
    per_step = (results[1000] - results[100]) / 900
    fixed = results[100] - 100 * per_step
    print(f"per-step: {per_step*1e3:.2f} us, fixed: {fixed:.3f} ms")


if __name__ == "__main__":
    import sys
    n_b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    main(n_b=n_b)
