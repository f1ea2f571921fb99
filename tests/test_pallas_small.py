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


class TestMultiMemberKernels:
    """Member-batched alpha/FW kernels must reproduce a vmap of the
    single-member kernels (same G/b assembly, loop, and per-member
    l_w/cost outputs)."""

    def _multi_fixture(self, small_problem, n_b=4, seed=11):
        import jax

        p = small_problem
        rng = np.random.default_rng(seed)
        y, d, Rt = (jnp.asarray(p["y"]), jnp.asarray(p["d"]),
                    jnp.asarray(p["R_trunc"]))
        n_cpg, n_s = p["y"].shape
        n_ct = Rt.shape[1]
        n_u = p["n_u"]
        pp = n_ct + n_u
        from demethify_tpu.ops.gram import known_block_grams

        gtt, bt, ydy = known_block_grams(Rt, d, y)
        u_b = rng.uniform(size=(n_b, n_cpg, n_u))
        # gu[b, s, u, q] = sum_i u[b,i,u] d[i,s] Rext[b,i,q]
        gu, bu, usq = [], [], []
        for b_i in range(n_b):
            Rext = np.hstack([np.asarray(Rt), u_b[b_i]])
            gu.append(np.einsum("iu,is,iq->suq", u_b[b_i],
                                np.asarray(d), Rext))
            bu.append(np.einsum("iu,is->us", u_b[b_i],
                                np.asarray(d) * np.asarray(y)))
            usq.append(float(np.sum(u_b[b_i] ** 2)))
        gu_b = jnp.asarray(np.stack(gu))
        bu_b = jnp.asarray(np.stack(bu))
        usq_b = jnp.asarray(np.asarray(usq))
        alpha_b = jnp.asarray(np.stack(
            [rng.dirichlet(np.ones(pp), size=n_s).T for _ in range(n_b)]))
        rt_sq = float(np.sum(np.asarray(Rt) ** 2))
        dmax2 = float(np.max(np.asarray(d)) ** 2)
        return dict(gtt=gtt, bt=bt, ydy=ydy, gu_b=gu_b, bu_b=bu_b,
                    usq_b=usq_b, alpha_b=alpha_b, rt_sq=rt_sq,
                    dmax2=dmax2, n_u=n_u, n_b=n_b, n_ct=n_ct,
                    rng=rng, jax=jax)

    def test_alpha_multi_matches_vmapped_single(self, small_problem):
        from demethify_tpu.ops.pallas_small import (
            alpha_phase_full,
            alpha_phase_full_multi,
        )

        f = self._multi_fixture(small_problem)
        jax = f["jax"]
        n_b = f["n_b"]
        a_b = jnp.asarray(f["rng"].uniform(1.0, 3.0, size=n_b))
        lhp_b = jnp.asarray(f["rng"].uniform(50.0, 200.0, size=n_b))

        def single(gu, bu, usq, alpha, a, lhp):
            return alpha_phase_full(f["gtt"], f["bt"], gu, bu, usq,
                                    f["ydy"], alpha, alpha, a, lhp,
                                    f["rt_sq"], f["dmax2"], 7, f["n_u"])

        want = jax.vmap(single)(f["gu_b"], f["bu_b"], f["usq_b"],
                                f["alpha_b"], a_b, lhp_b)
        got = alpha_phase_full_multi(
            f["gtt"], f["bt"], f["gu_b"], f["bu_b"], f["usq_b"],
            f["ydy"], f["alpha_b"], f["alpha_b"], a_b, lhp_b,
            f["rt_sq"], f["dmax2"], 7, f["n_u"])
        for i in range(6):
            np.testing.assert_allclose(np.asarray(got[i]),
                                       np.asarray(want[i]), rtol=1e-9,
                                       atol=1e-10)

    def test_alpha_multi_row_masks(self, small_problem):
        # per-member masks: member i activates n_ct + (i % n_u + 1) rows
        from demethify_tpu.ops.pallas_small import (
            alpha_phase_full,
            alpha_phase_full_multi,
        )

        f = self._multi_fixture(small_problem, n_b=3, seed=12)
        jax = f["jax"]
        n_b, n_ct, n_u = f["n_b"], f["n_ct"], f["n_u"]
        pp = n_ct + n_u
        masks = np.ones((n_b, pp), bool)
        for i in range(n_b):
            masks[i, n_ct + 1 + (i % n_u):] = False
        masks_b = jnp.asarray(masks)
        alpha_b = f["alpha_b"] * masks_b[:, :, None]
        alpha_b = alpha_b / jnp.sum(alpha_b, axis=1, keepdims=True)
        a_b = jnp.ones((n_b,))
        lhp_b = jnp.full((n_b,), 100.0)

        def single(gu, bu, usq, alpha, mask):
            return alpha_phase_full(f["gtt"], f["bt"], gu, bu, usq,
                                    f["ydy"], alpha, alpha,
                                    jnp.ones(()), jnp.asarray(100.0),
                                    f["rt_sq"], f["dmax2"], 5, f["n_u"],
                                    row_mask=mask)

        want = jax.vmap(single)(f["gu_b"], f["bu_b"], f["usq_b"],
                                alpha_b, masks_b)
        got = alpha_phase_full_multi(
            f["gtt"], f["bt"], f["gu_b"], f["bu_b"], f["usq_b"],
            f["ydy"], alpha_b, alpha_b, a_b, lhp_b,
            f["rt_sq"], f["dmax2"], 5, f["n_u"], row_mask_b=masks_b)
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(want[0]), atol=1e-10)
        # masked rows stay exactly zero
        for i in range(n_b):
            np.testing.assert_array_equal(
                np.asarray(got[0][i])[~masks[i]], 0.0)

    def test_fw_multi_matches_vmapped_single(self, small_problem):
        from demethify_tpu.ops.pallas_small import (
            fw_phase_full,
            fw_phase_full_multi,
        )

        f = self._multi_fixture(small_problem, seed=13)
        jax = f["jax"]
        n_s = f["bt"].shape[1]
        purity = jnp.asarray(f["rng"].uniform(0.2, 0.8, size=n_s))
        # purity-feasible starting alpha per member
        a1 = f["alpha_b"][:, :f["n_ct"]]
        a1 = a1 / jnp.sum(a1, axis=1, keepdims=True) * purity[None, None]
        a2 = f["alpha_b"][:, f["n_ct"]:]
        a2 = (a2 / jnp.sum(a2, axis=1, keepdims=True)
              * (1.0 - purity)[None, None])
        alpha_b = jnp.concatenate([a1, a2], axis=1)

        def single(gu, bu, alpha):
            return fw_phase_full(f["gtt"], f["bt"], gu, bu, f["ydy"],
                                 alpha, purity, f["dmax2"], 30, f["n_u"])

        want = jax.vmap(single)(f["gu_b"], f["bu_b"], alpha_b)
        got = fw_phase_full_multi(f["gtt"], f["bt"], f["gu_b"],
                                  f["bu_b"], f["ydy"], alpha_b, purity,
                                  f["dmax2"], 30, f["n_u"])
        for i in range(3):
            np.testing.assert_allclose(np.asarray(got[i]),
                                       np.asarray(want[i]), rtol=1e-9,
                                       atol=1e-10)

    def test_alpha_multi_unsupervised(self, small_problem):
        # n_ct = 0: G/b assembled purely from the member blocks
        from demethify_tpu.ops.pallas_small import (
            alpha_phase_full,
            alpha_phase_full_multi,
        )

        p = small_problem
        import jax

        rng = np.random.default_rng(14)
        y, d = jnp.asarray(p["y"]), jnp.asarray(p["d"])
        n_cpg, n_s = p["y"].shape
        n_u, n_b = 3, 4
        u_b = rng.uniform(size=(n_b, n_cpg, n_u))
        gu, bu, usq = [], [], []
        for b_i in range(n_b):
            gu.append(np.einsum("iu,is,iq->suq", u_b[b_i],
                                np.asarray(d), u_b[b_i]))
            bu.append(np.einsum("iu,is->us", u_b[b_i],
                                np.asarray(d) * np.asarray(y)))
            usq.append(float(np.sum(u_b[b_i] ** 2)))
        gu_b, bu_b = jnp.asarray(np.stack(gu)), jnp.asarray(np.stack(bu))
        usq_b = jnp.asarray(np.asarray(usq))
        ydy = jnp.sum(d * y * y, axis=0)
        alpha_b = jnp.asarray(np.stack(
            [rng.dirichlet(np.ones(n_u), size=n_s).T
             for _ in range(n_b)]))
        dmax2 = float(np.max(np.asarray(d)) ** 2)
        a_b = jnp.ones((n_b,))
        lhp_b = jnp.full((n_b,), 77.0)

        def single(gu, bu, usq, alpha):
            return alpha_phase_full(None, None, gu, bu, usq, ydy,
                                    alpha, alpha, jnp.ones(()),
                                    jnp.asarray(77.0), 0.0, dmax2, 6,
                                    n_u)

        want = jax.vmap(single)(gu_b, bu_b, usq_b, alpha_b)
        got = alpha_phase_full_multi(None, None, gu_b, bu_b, usq_b, ydy,
                                     alpha_b, alpha_b, a_b, lhp_b,
                                     0.0, dmax2, 6, n_u)
        for i in range(6):
            np.testing.assert_allclose(np.asarray(got[i]),
                                       np.asarray(want[i]), rtol=1e-9,
                                       atol=1e-10)
