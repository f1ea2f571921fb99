"""Single-launch alpha/FW kernels must reproduce the XLA loops exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from demethify_tpu.ops import fista
from demethify_tpu.ops.frank_wolfe import frank_wolfe_gram
from demethify_tpu.ops.gram import sample_grams
from demethify_tpu.ops.pallas_small import alpha_phase, fw_phase


@pytest.fixture
def grams_fixture(small_problem):
    p = small_problem
    R = np.hstack([p["R_trunc"], p["u_true"]])
    G, b, ydy = sample_grams(jnp.asarray(R), jnp.asarray(p["d"]),
                             jnp.asarray(p["y"]))
    l_h = float(np.linalg.norm(R) ** 2 * p["d"].max() ** 2)
    return p, G, b, l_h


class TestAlphaPhaseKernel:
    def test_matches_xla_loop(self, grams_fixture):
        p, G, b, l_h = grams_fixture
        alpha = jnp.asarray(p["alpha"])
        want = fista.fista_alpha_gram(alpha, alpha, jnp.ones(()),
                                      jnp.asarray(l_h), jnp.asarray(l_h),
                                      G, b, 9)
        got = alpha_phase(G, b, alpha, alpha, jnp.ones(()),
                          jnp.asarray(l_h), jnp.asarray(l_h), 9)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   atol=1e-12)
        assert float(got[2]) == pytest.approx(float(want[2]))
        assert float(got[3]) == pytest.approx(float(want[3]))

    def test_masked_matches_xla(self, grams_fixture):
        p, G, b, l_h = grams_fixture
        pp = G.shape[1]
        mask = jnp.asarray(np.arange(pp) < pp - 1)
        alpha_m = jnp.asarray(p["alpha"]).at[-1].set(0.0)
        alpha_m = alpha_m / alpha_m.sum(axis=0, keepdims=True)
        want = fista.fista_alpha_gram(alpha_m, alpha_m, jnp.ones(()),
                                      jnp.asarray(l_h), jnp.asarray(l_h),
                                      G, b, 6, row_mask=mask)
        got = alpha_phase(G, b, alpha_m, alpha_m, jnp.ones(()),
                          jnp.asarray(l_h), jnp.asarray(l_h), 6,
                          row_mask=mask)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=1e-12)


class TestFWPhaseKernel:
    def test_matches_xla_loop(self, grams_fixture):
        p, G, b, _ = grams_fixture
        n_u = p["n_u"]
        n_s = p["y"].shape[1]
        rng = np.random.default_rng(0)
        purity = jnp.asarray(rng.uniform(0.2, 0.8, size=n_s))
        a1 = jnp.asarray(rng.dirichlet(np.ones(p["R_trunc"].shape[1]),
                                       size=n_s).T * np.asarray(purity))
        a2 = jnp.asarray(rng.dirichlet(np.ones(n_u), size=n_s).T
                         * (1 - np.asarray(purity)))
        want1, want2 = frank_wolfe_gram(a1, a2, G, b, purity, 25)
        got1, got2 = fw_phase(G, b, a1, a2, purity, 25)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                                   atol=1e-12)
