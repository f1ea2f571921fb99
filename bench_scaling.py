"""Scaling-efficiency harness: sites/s/chip at 1..N devices.

Weak scaling over the 'cpg' mesh axis: each device gets a fixed per-device
row block (default 250k sites), so ideal scaling keeps time/iteration flat
while total throughput grows linearly. The per-sample Gram reductions are
the only cross-device communication (psum over ICI on real hardware).

On this development image only one real TPU chip is reachable, so by
default the harness runs on N virtual CPU devices
(`jax.config jax_num_cpu_devices`) — that validates the collective
structure and measures software overhead, NOT real ICI scaling; on a pod
slice run with `--platform tpu` and real devices. Prints one JSON line per
device count plus a summary efficiency line.
"""

import argparse
import json
import time

import numpy as np


def run(n_devices_list, per_device_rows, n_s, n_ct, n_u, iters, platform):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_num_cpu_devices", max(n_devices_list))

    import jax.numpy as jnp

    from demethify_tpu.parallel.mesh import make_mesh, shard_dataset, \
        cpg_sharding
    from demethify_tpu.solvers.partial_ref import partial_ref_solve

    results = []
    for n_dev in n_devices_list:
        devices = jax.devices()[:n_dev]
        mesh = make_mesh(devices, replicate=1)
        n_cpg = per_device_rows * n_dev

        rng = np.random.default_rng(0)
        Rt = rng.uniform(size=(n_cpg, n_ct)).astype(np.float32)
        y = rng.uniform(size=(n_cpg, n_s)).astype(np.float32)
        d = (rng.poisson(50, size=(n_cpg, n_s)) + 1).astype(np.float32)
        u0 = rng.uniform(size=(n_cpg, n_u)).astype(np.float32)
        a0 = rng.dirichlet(np.ones(n_ct + n_u),
                           size=n_s).T.astype(np.float32)

        y_s, d_s, Rt_s = shard_dataset(mesh, y, d, Rt)
        u_s = jax.device_put(u0, cpg_sharding(mesh))
        a_s = jax.device_put(a0, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))

        def solve():
            out = partial_ref_solve(u_s, a_s, y_s, d_s, Rt_s, n_u,
                                    n_iter1=iters, n_iter2=20, tol=0.0)
            return float(out[2]["cost"])

        solve()  # compile + warm
        times = []
        for _ in range(3):
            t = time.time()
            solve()
            times.append(time.time() - t)
        t_best = min(times)
        sites_per_s = n_cpg * iters / t_best
        results.append((n_dev, t_best, sites_per_s))
        print(json.dumps({
            "metric": f"weak-scaling sites-iters/s @ {n_dev} devices "
                      f"({per_device_rows} rows/device)",
            "value": round(sites_per_s, 1),
            "unit": "site-iters/s",
            "vs_baseline": round(sites_per_s / results[0][2], 3),
        }))

    base_dev, base_t, _ = results[0]
    for n_dev, t_best, _ in results[1:]:
        eff = base_t / t_best  # ideal weak scaling: time stays flat
        print(json.dumps({
            "metric": f"weak-scaling efficiency {base_dev}->{n_dev} devices",
            "value": round(eff, 3),
            "unit": "fraction",
            "vs_baseline": round(eff, 3),
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--rows-per-device", type=int, default=250_000)
    ap.add_argument("--samples", type=int, default=10)
    ap.add_argument("--celltypes", type=int, default=5)
    ap.add_argument("--unknown", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default="cpu",
                    help="cpu (virtual devices) or tpu (real pod)")
    args = ap.parse_args()
    run(args.devices, args.rows_per_device, args.samples, args.celltypes,
        args.unknown, args.iters, args.platform)


if __name__ == "__main__":
    main()
