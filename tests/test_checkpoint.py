"""Checkpoint round-trip, including sharded arrays on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from demethify_tpu.checkpoint import load_factors, save_factors
from demethify_tpu.parallel.mesh import cpg_sharding, make_mesh


def test_roundtrip_plain(tmp_path):
    u = jnp.asarray(np.random.default_rng(0).uniform(size=(64, 2)))
    alpha = jnp.asarray(np.random.default_rng(1).dirichlet(
        np.ones(5), size=3).T)
    save_factors(str(tmp_path / "ckpt"), u=u, alpha=alpha,
                 step=np.asarray(17))
    state = load_factors(str(tmp_path / "ckpt"))
    np.testing.assert_allclose(np.asarray(state["u"]), np.asarray(u))
    np.testing.assert_allclose(np.asarray(state["alpha"]),
                               np.asarray(alpha))
    assert int(state["step"]) == 17


def test_sharded_save_numpy_restore(tmp_path):
    # as_numpy=True must ignore the saved sharding entirely — the safe
    # restore when the device topology changed between save and resume
    mesh = make_mesh(jax.devices())
    sh = cpg_sharding(mesh)
    u_host = np.random.default_rng(3).uniform(size=(64, 2))
    save_factors(str(tmp_path / "ckpt"),
                 u=jax.device_put(u_host, sh), cost=np.float32(1.5))
    state = load_factors(str(tmp_path / "ckpt"), as_numpy=True)
    assert isinstance(state["u"], np.ndarray)
    np.testing.assert_allclose(state["u"], u_host)
    assert float(np.asarray(state["cost"])) == 1.5


def test_roundtrip_sharded(tmp_path):
    mesh = make_mesh(jax.devices())
    sh = cpg_sharding(mesh)
    u_host = np.random.default_rng(2).uniform(size=(128, 1))
    u = jax.device_put(u_host, sh)
    save_factors(str(tmp_path / "ckpt"), u=u)
    state = load_factors(str(tmp_path / "ckpt"), like={"u": u})
    restored = state["u"]
    np.testing.assert_allclose(np.asarray(restored), u_host)
    assert restored.sharding == u.sharding
