"""Isolate per-outer-iteration phase costs on the TPU: XLA vs pallas variants."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/demethify_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_problem, N_U, N_INNER  # noqa: E402
from demethify_tpu.ops import fista  # noqa: E402
from demethify_tpu.ops.gram import (  # noqa: E402
    known_block_grams, sample_grams_incremental, site_curvature,
    u_constant_term)
from demethify_tpu.ops.pallas_kernels import u_phase, u_phase_grams  # noqa: E402

STEPS = 100


def timed(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    s = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t = time.time()
        out = f(*args)
        s = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
        times.append(time.time() - t)
    print(f"{name:28s}: {min(times)*1e3/STEPS:.4f} ms/iter "
          f"(compile {compile_s:.0f}s, chk {s:.3e})", flush=True)


def main(which):
    y, d, Rt, u0, a0 = make_problem()
    yj = jax.device_put(y); dj = jax.device_put(d)
    Rtj = jax.device_put(Rt); uj = jax.device_put(u0)
    aj = jax.device_put(a0)
    jax.block_until_ready([yj, dj, Rtj, uj, aj])
    yt, dt, rtt, ut = yj.T, dj.T, Rtj.T, uj.T
    dmax2 = jnp.max(dj) ** 2
    l_w = jnp.sum(aj[-N_U:] ** 2) * dmax2
    a1b, a2b = aj[:-N_U], aj[-N_U:]

    if which in ("all", "xla_uphase"):
        # XLA u-phase: C/M build + unrolled FISTA (as in partial_ref_solve)
        def xla_uphase(u):
            def step(carry, _):
                u, up, a, lp = carry
                C = u_constant_term(yj, dj, Rtj, a1b, a2b)
                M = site_curvature(dj, a2b)
                u, up, a, lp = fista.fista_u_gram(u, up, a, lp, l_w, C, M,
                                                  N_INNER)
                return (u, up, a, lp), None
            (u, *_), _ = jax.lax.scan(step, (u, u, jnp.ones(()), l_w),
                                      None, length=STEPS)
            return u
        timed("xla u-phase", xla_uphase, uj)

    if which in ("all", "xla_grams"):
        G_tt, b_t, ydy = known_block_grams(Rtj, dj, yj)

        def xla_grams(u):
            def step(carry, _):
                G, b = sample_grams_incremental(G_tt, b_t, Rtj, u, dj, yj)
                return carry + jnp.sum(b), None
            out, _ = jax.lax.scan(step, jnp.zeros(()), None, length=STEPS)
            return out
        timed("xla grams(incremental)", xla_grams, uj)

    for tile in (8192, 16384, 32768):
        key = f"mega{tile}"
        if which in ("all", key):
            def mega(u, tile=tile):
                def step(carry, _):
                    u, up, a, lp = carry
                    u, up, a, lp, gu, bu, usq = u_phase_grams(
                        yt, dt, rtt, a1b, a2b, u, up, a, l_w, lp,
                        N_INNER, tile=tile)
                    return (u, up, a, lp), None
                (u, *_), _ = jax.lax.scan(step, (u, u, jnp.ones(()), l_w),
                                          None, length=STEPS)
                return u
            timed(f"megakernel tile={tile}", mega, ut)

    for tile in (2048, 16384):
        key = f"uph{tile}"
        if which in ("all", key):
            def uph(u, tile=tile):
                def step(carry, _):
                    u, up, a, lp = carry
                    u, up, a, lp = u_phase(
                        yt, dt, rtt, a1b, a2b, u, up, a, l_w, lp,
                        N_INNER, tile=tile)
                    return (u, up, a, lp), None
                (u, *_), _ = jax.lax.scan(step, (u, u, jnp.ones(()), l_w),
                                          None, length=STEPS)
                return u
            timed(f"u_phase(no grams) t={tile}", uph, ut)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
