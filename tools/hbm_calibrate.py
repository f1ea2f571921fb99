"""Measure the attached chip's achieved HBM bandwidth (and MXU rate).

The flagship megakernel is HBM-bound, so its ms/iter scales inversely
with whatever bandwidth the session's chip actually delivers — which on
this dev image's tunneled TPUs has varied ~25% between sessions on
byte-identical code (0.154 / 0.1907 / 0.2338 ms/iter across rounds 3-5).
This tool pins the session's hardware baseline so bench artifacts can
normalize: report sites/s AND the same-session achieved GB/s.

Bandwidth probe: y = x1 + x2 over two 512 MiB f32 arrays (read 2 bytes +
write 1 per element-pair byte) — a triad-style streaming kernel XLA
compiles to a single fused loop; no reduction, no MXU. Device time from
the profiler (wall includes ~60 ms tunnel dispatch).
"""
import collections
import glob
import gzip
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/demethify_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 256 * 1024 * 1024          # f32 elements per operand (1 GiB)


@jax.jit
def _stream(x1, x2):
    # single fused elementwise kernel: unambiguous traffic accounting
    # (read x1, read x2, write y = 3 bytes/element-triple); a chained
    # form risks XLA's algebraic simplifier collapsing the reads
    return x1 + x2


@jax.jit
def _matmul(a, b):
    return a @ b


def _device_ms(tracedir, fn, name_filter=None):
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
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            if e["name"].startswith(("jit_", "while")):
                continue
            dur[e["name"]] += e.get("dur", 0)
    return sum(dur.values()) / 1e3


def measured_bandwidth_gbs() -> float:
    """Achieved streaming HBM bandwidth (GB/s) of the attached chip."""
    x1 = jnp.ones((N,), jnp.float32)
    x2 = jnp.ones((N,), jnp.float32)
    jax.block_until_ready([x1, x2])
    ms = _device_ms("/tmp/prof_hbm", lambda: float(_stream(x1, x2)[0]))
    traffic = 4.0 * N * 3
    return traffic / (ms / 1e3) / 1e9


def measured_matmul_tflops(dtype=jnp.bfloat16) -> float:
    k = 8192
    a = jnp.ones((k, k), dtype)
    b = jnp.ones((k, k), dtype)
    jax.block_until_ready([a, b])
    ms = _device_ms("/tmp/prof_mxu",
                    lambda: float(_matmul(a, b)[0, 0]))
    return 2.0 * k ** 3 / (ms / 1e3) / 1e12


if __name__ == "__main__":
    bw = measured_bandwidth_gbs()
    tf = measured_matmul_tflops()
    print(json.dumps({
        "device": jax.devices()[0].device_kind,
        "hbm_gbs": round(bw, 1),
        "mxu_bf16_tflops": round(tf, 1),
    }))
