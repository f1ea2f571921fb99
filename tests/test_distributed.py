"""Multi-host helpers: row-block ownership, global array assembly."""

import numpy as np
import jax

from demethify_tpu.parallel.distributed import host_row_block, initialize
from demethify_tpu.parallel.mesh import make_mesh


def test_host_row_block_partitions_exactly():
    n_rows, n_hosts = 103, 4
    blocks = [host_row_block(n_rows, n_hosts, h) for h in range(n_hosts)]
    # contiguous, disjoint, covering
    assert blocks[0][0] == 0
    assert blocks[-1][1] == n_rows
    for (s0, e0), (s1, e1) in zip(blocks, blocks[1:]):
        assert e0 == s1
    sizes = [e - s for s, e in blocks]
    assert max(sizes) - min(sizes) <= 1


def test_initialize_single_process_noop():
    initialize()  # must not raise or attempt a network rendezvous
    initialize(num_processes=1)


def test_make_mesh_replicate_override():
    mesh = make_mesh(jax.devices(), replicate=1)
    assert mesh.shape["replicate"] == 1
    assert mesh.shape["cpg"] == len(jax.devices())
