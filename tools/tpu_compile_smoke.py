"""Compile-smoke every multi-megakernel variant on REAL TPU hardware
(tiny shapes: compile coverage, not perf).

Interpret-mode tests CANNOT catch Mosaic lowering failures — round 3
found three kernel paths that had never compiled on hardware (a
lane-splitting reshape, <8-member batches on the n_u=1 closed form, a
zero-width concat at n_ct=0). Run this after ANY change to a kernel
dataflow: `timeout 3000 python tools/tpu_compile_smoke.py`. Expect
17/17 "OK"; each fresh HLO costs 10-600 s on the remote compiler."""
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/demethify_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from demethify_tpu.solvers import fused

rng = np.random.default_rng(0)
n, n_s, n_ct, B = 4096, 6, 4, 3

def mk(n_u):
    Rt = rng.uniform(size=(n, n_ct)).astype(np.float32)
    y = rng.uniform(size=(n, n_s)).astype(np.float32)
    d = (rng.poisson(30, size=(n, n_s)) + 1).astype(np.float32)
    u0 = rng.uniform(size=(B, n, n_u)).astype(np.float32)
    a0 = np.stack([rng.dirichlet(np.ones(n_ct + n_u), size=n_s).T
                   for _ in range(B)]).astype(np.float32)
    au = np.stack([rng.dirichlet(np.ones(n_u), size=n_s).T
                   for _ in range(B)]).astype(np.float32)
    w = np.stack([np.bincount(rng.integers(0, n, n), minlength=n)
                  for _ in range(B)]).astype(np.float32)
    return (jnp.asarray(y), jnp.asarray(d), jnp.asarray(Rt),
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(au),
            jnp.asarray(w))

def check(name, fn):
    t0 = time.time()
    try:
        out = fn()
        c = np.asarray(out[2]["cost"])
        ok = bool(np.all(np.isfinite(c)))
        print(f"{name}: OK finite={ok} ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)

# SINGLE-member kernel general paths (restart=1 / deterministic-init
# solves route here): gram-form coupled step at n_u=2 (component
# lists), lagged gram form, and the direct dataflow (n_u^2 > 3 n_s)
y1, d1, Rt1, u01, a01, au1, _ = mk(2)
check("single partial n_u=2", lambda: fused.partial_ref_solve_fused(
    u01[0], a01[0], y1, d1, Rt1, 2, n_iter1=2, n_iter2=3, tol=0.0))
# packed IO is the f32 default; smoke the unpacked layout too (bf16
# storage and the sharded single-member form still use it) and the
# opt-in rt-fold variant
check("single partial n_u=2 unpacked",
      lambda: fused.partial_ref_solve_fused(
          u01[0], a01[0], y1, d1, Rt1, 2, n_iter1=2, n_iter2=3,
          tol=0.0, packed_io=False))
check("single partial n_u=2 rt-fold",
      lambda: fused.partial_ref_solve_fused(
          u01[0], a01[0], y1, d1, Rt1, 2, n_iter1=2, n_iter2=3,
          tol=0.0, packed_io="rt"))
check("single unsup lagged n_u=2",
      lambda: fused.unsupervised_solve_fused(
          u01[0], au1[0], y1, d1, 2, n_iter1=2, n_iter2=3, tol=0.0))
check("single unsup lagged n_u=2 unpacked",
      lambda: fused.unsupervised_solve_fused(
          u01[0], au1[0], y1, d1, 2, n_iter1=2, n_iter2=3, tol=0.0,
          packed_io=False))
y5, d5, Rt5, u05, a05, au5, _ = mk(5)
check("single unsup direct n_u=5",
      lambda: fused.unsupervised_solve_fused(
          u05[0], au5[0], y5, d5, 5, n_iter1=2, n_iter2=3, tol=0.0))

for n_u in (1, 2):
    y, d, Rt, u0, a0, au, w = mk(n_u)
    pur = jnp.asarray(rng.uniform(0.3, 0.7, size=n_s), jnp.float32)
    check(f"unsup multi n_u={n_u}", lambda: fused.unsupervised_solve_fused_multi(
        u0, au, y, d, n_u, n_iter1=2, n_iter2=3, tol=0.0))
    check(f"purity multi n_u={n_u}", lambda: fused.purity_solve_fused_multi(
        u0, a0, y, d, Rt, pur, n_u, n_iter1=2, n_iter2=4, tol=0.0))
    check(f"purity multi weighted n_u={n_u}",
          lambda: fused.purity_solve_fused_multi(
              u0, a0, y, d, Rt, pur, n_u, n_iter1=2, n_iter2=4, tol=0.0,
              row_weights_b=w))
    check(f"partial multi weighted n_u={n_u}",
          lambda: fused.partial_ref_solve_fused_multi(
              u0, a0, y, d, Rt, n_u, n_iter1=2, n_iter2=3, tol=0.0,
              row_weights_b=w))

# REGRESSION (round 5): a member count > 8 that is NOT a multiple of 8
# (the genome-scale bootstrap auto-sized B=29 and Mosaic rejected the
# flat-gram concat at sublane offset 5; batches now pad up to a
# multiple of 8). B=13 pads to 16 — must lower and run.
y, d, Rt, u0, a0, au, w = mk(1)
u13 = jnp.concatenate([u0] * 5, axis=0)[:13]
a13 = jnp.concatenate([a0] * 5, axis=0)[:13]
w13 = jnp.concatenate([w] * 5, axis=0)[:13]
check("partial multi weighted B=13 (pad to 16)",
      lambda: fused.partial_ref_solve_fused_multi(
          u13, a13, y, d, Rt, 1, n_iter1=2, n_iter2=3, tol=0.0,
          row_weights_b=w13))

# sharded wrappers on the 1-device TPU mesh (real kernels inside
# shard_map, not interpret)
from demethify_tpu.parallel.mesh import make_mesh, shard_dataset
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = make_mesh(jax.devices()[:1])
n_u = 1
y, d, Rt, u0, a0, au, w = mk(n_u)
y_s, d_s, Rt_s = shard_dataset(mesh, np.asarray(y), np.asarray(d),
                               np.asarray(Rt))
u0_s = jax.device_put(np.asarray(u0),
                      NamedSharding(mesh, P(None, "cpg", None)))
a0_s = jax.device_put(np.asarray(a0), NamedSharding(mesh, P()))
w_s = jax.device_put(np.asarray(w), NamedSharding(mesh, P(None, "cpg")))
check("sharded multi", lambda: fused.partial_ref_solve_fused_multi_sharded(
    u0_s, a0_s, y_s, d_s, Rt_s, n_u, n_iter1=2, n_iter2=3, tol=0.0))
check("sharded multi weighted",
      lambda: fused.partial_ref_solve_fused_multi_sharded(
          u0_s, a0_s, y_s, d_s, Rt_s, n_u, n_iter1=2, n_iter2=3,
          tol=0.0, row_weights_b=w_s))
print("done", flush=True)
