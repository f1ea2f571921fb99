"""Pallas kernels (interpret mode on CPU) vs the XLA Gram-form solvers —
identical trajectories required."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demethify_tpu.ops.gram import sample_grams
from demethify_tpu.ops.pallas_kernels import grams, u_phase
from demethify_tpu.ops import fista
from demethify_tpu.ops.gram import site_curvature, u_constant_term
from demethify_tpu.solvers.fused import (
    partial_ref_solve_fused,
    purity_solve_fused,
    unsupervised_solve_fused,
)
from demethify_tpu.solvers.partial_ref import partial_ref_solve
from demethify_tpu.solvers.purity import purity_solve
from demethify_tpu.solvers.unsupervised import unsupervised_solve

TILE = 64  # small tile so the CPU interpreter exercises multiple programs


class TestGramKernel:
    def test_matches_xla(self, small_problem):
        p = small_problem
        R = np.hstack([p["R_trunc"], p["u_true"]])
        want = sample_grams(jnp.asarray(R), jnp.asarray(p["d"]),
                            jnp.asarray(p["y"]))
        got = grams(jnp.asarray(p["y"].T), jnp.asarray(p["d"].T),
                    jnp.asarray(R.T), tile=TILE)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-10)


class TestUPhaseKernel:
    @pytest.mark.parametrize("lagged", [False, True])
    def test_matches_xla_loop(self, small_problem, lagged):
        p = small_problem
        y, d, Rt, n_u = p["y"], p["d"], p["R_trunc"], p["n_u"]
        alpha = p["alpha"]
        rng = np.random.default_rng(5)
        u = rng.uniform(size=(y.shape[0], n_u))
        l_w = np.linalg.norm(alpha[-n_u:]) ** 2 * d.max() ** 2

        if lagged:
            # unsupervised form: R = U, full alpha is the unknown block
            alpha_u = rng.dirichlet(np.ones(n_u), size=y.shape[1]).T
            C = (jnp.asarray(d) * jnp.asarray(y)) @ jnp.asarray(alpha_u).T
            M = site_curvature(jnp.asarray(d), jnp.asarray(alpha_u))
            from demethify_tpu.solvers.unsupervised import \
                _fista_u_lagged_gram
            want = _fista_u_lagged_gram(
                jnp.asarray(u), jnp.asarray(u), jnp.ones(()),
                jnp.asarray(l_w), jnp.asarray(l_w), C, M, 7)
            got = u_phase(jnp.asarray(y.T), jnp.asarray(d.T), None, None,
                          jnp.asarray(alpha_u), jnp.asarray(u.T),
                          jnp.asarray(u.T), jnp.ones(()),
                          jnp.asarray(l_w), jnp.asarray(l_w), 7,
                          lagged=True, tile=TILE)
        else:
            C = u_constant_term(jnp.asarray(y), jnp.asarray(d),
                                jnp.asarray(Rt), jnp.asarray(alpha[:-n_u]),
                                jnp.asarray(alpha[-n_u:]))
            M = site_curvature(jnp.asarray(d), jnp.asarray(alpha[-n_u:]))
            want = fista.fista_u_gram(
                jnp.asarray(u), jnp.asarray(u), jnp.ones(()),
                jnp.asarray(l_w), jnp.asarray(l_w), C, M, 7)
            got = u_phase(jnp.asarray(y.T), jnp.asarray(d.T),
                          jnp.asarray(Rt.T), jnp.asarray(alpha[:-n_u]),
                          jnp.asarray(alpha[-n_u:]), jnp.asarray(u.T),
                          jnp.asarray(u.T), jnp.ones(()),
                          jnp.asarray(l_w), jnp.asarray(l_w), 7, tile=TILE)

        np.testing.assert_allclose(np.asarray(got[0]).T,
                                   np.asarray(want[0]), atol=1e-10)
        np.testing.assert_allclose(np.asarray(got[1]).T,
                                   np.asarray(want[1]), atol=1e-10)
        assert float(got[2]) == pytest.approx(float(want[2]))
        assert float(got[3]) == pytest.approx(float(want[3]))


class TestFusedSolvers:
    def test_partial_ref_trajectory(self, small_problem):
        p = small_problem
        y, d, Rt, n_u = p["y"], p["d"], p["R_trunc"], p["n_u"]
        rng = np.random.default_rng(6)
        u0 = rng.uniform(size=(y.shape[0], n_u))
        a0 = rng.dirichlet(np.ones(Rt.shape[1] + n_u), size=y.shape[1]).T

        want = partial_ref_solve(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), n_u,
            n_iter1=12, n_iter2=6, tol=1e-9)
        got = partial_ref_solve_fused(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), n_u,
            n_iter1=12, n_iter2=6, tol=1e-9)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   atol=1e-8)
        np.testing.assert_allclose(float(got[2]["cost"]),
                                   float(want[2]["cost"]), rtol=1e-9)

    def test_packed_io_bit_identical(self, small_problem):
        """packed_io (one [Y;D] block, one [u;u_prev] carry) must give
        EXACTLY the unpacked trajectory — row-slicing a VMEM block is
        value-exact."""
        p = small_problem
        y, d, Rt, n_u = p["y"], p["d"], p["R_trunc"], p["n_u"]
        rng = np.random.default_rng(17)
        u0 = rng.uniform(size=(y.shape[0], n_u))
        a0 = rng.dirichlet(np.ones(Rt.shape[1] + n_u), size=y.shape[1]).T
        args = [jnp.asarray(x) for x in (u0, a0, y, d, Rt)]
        want = partial_ref_solve_fused(*args, n_u, n_iter1=15, n_iter2=6,
                                       tol=1e-9, packed_io=False)
        got = partial_ref_solve_fused(*args, n_u, n_iter1=15, n_iter2=6,
                                      tol=1e-9, packed_io=True)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1]),
                                      np.asarray(want[1]))
        assert float(got[2]["cost"]) == float(want[2]["cost"])
        assert int(got[2]["n_iter"]) == int(want[2]["n_iter"])

    def test_packed_io_bit_identical_unsup_purity(self, small_problem):
        from demethify_tpu.solvers.fused import (
            purity_solve_fused,
            unsupervised_solve_fused,
        )
        p = small_problem
        y, d, Rt, n_u = p["y"], p["d"], p["R_trunc"], p["n_u"]
        rng = np.random.default_rng(19)
        u0 = jnp.asarray(rng.uniform(size=(y.shape[0], n_u)))
        a0u = jnp.asarray(rng.dirichlet(np.ones(n_u), size=y.shape[1]).T)
        kw = dict(n_iter1=10, n_iter2=6, tol=1e-9)
        want = unsupervised_solve_fused(u0, a0u, jnp.asarray(y),
                                        jnp.asarray(d), n_u,
                                        packed_io=False, **kw)
        got = unsupervised_solve_fused(u0, a0u, jnp.asarray(y),
                                       jnp.asarray(d), n_u,
                                       packed_io=True, **kw)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(want[0]))
        assert float(got[2]["cost"]) == float(want[2]["cost"])

        a0p = jnp.asarray(rng.dirichlet(
            np.ones(Rt.shape[1] + n_u), size=y.shape[1]).T)
        purity = jnp.asarray(rng.uniform(0.3, 0.7, size=y.shape[1]))
        kwp = dict(n_iter1=4, n_iter2=10, tol=1e-9)
        want = purity_solve_fused(u0, a0p, jnp.asarray(y),
                                  jnp.asarray(d), jnp.asarray(Rt),
                                  purity, n_u, packed_io=False, **kwp)
        got = purity_solve_fused(u0, a0p, jnp.asarray(y),
                                 jnp.asarray(d), jnp.asarray(Rt),
                                 purity, n_u, packed_io=True, **kwp)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(want[0]))
        assert float(got[2]["cost"]) == float(want[2]["cost"])

    def test_unsupervised_trajectory(self, small_problem):
        p = small_problem
        y, d = p["y"], p["d"]
        n_u = 3
        rng = np.random.default_rng(7)
        u0 = rng.uniform(size=(y.shape[0], n_u))
        a0 = rng.dirichlet(np.ones(n_u), size=y.shape[1]).T

        want = unsupervised_solve(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), n_u, n_iter1=10, n_iter2=5, tol=1e-9)
        got = unsupervised_solve_fused(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), n_u, n_iter1=10, n_iter2=5, tol=1e-9)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   atol=1e-8)

    @pytest.mark.parametrize("tile", [64, 128])
    def test_partial_ref_trajectory_multitile(self, small_problem, tile):
        # small tile -> multiple grid steps: exercises the megakernel's
        # cross-tile Gram accumulation (pl.when k==0 / k>0 branches) and
        # the lane padding of the last tile
        p = small_problem
        y, d, Rt, n_u = p["y"], p["d"], p["R_trunc"], p["n_u"]
        rng = np.random.default_rng(16)
        u0 = rng.uniform(size=(y.shape[0], n_u))
        a0 = rng.dirichlet(np.ones(Rt.shape[1] + n_u), size=y.shape[1]).T

        want = partial_ref_solve(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), n_u,
            n_iter1=8, n_iter2=5, tol=1e-9)
        got = partial_ref_solve_fused(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), n_u,
            n_iter1=8, n_iter2=5, tol=1e-9, tile=tile)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   atol=1e-8)

    def test_unsupervised_trajectory_direct_dataflow(self, small_problem):
        # n_u^2 > 3 n_s selects the kernel's DIRECT u-gradient dataflow
        # (pallas_kernels use_gram heuristic) — must match the XLA solver
        p = small_problem
        y, d = p["y"], p["d"]
        n_u = 5
        assert n_u * n_u > 3 * y.shape[1]
        rng = np.random.default_rng(9)
        u0 = rng.uniform(size=(y.shape[0], n_u))
        a0 = rng.dirichlet(np.ones(n_u), size=y.shape[1]).T

        want = unsupervised_solve(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), n_u, n_iter1=8, n_iter2=5, tol=1e-9)
        got = unsupervised_solve_fused(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), n_u, n_iter1=8, n_iter2=5, tol=1e-9)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   atol=1e-8)

    def test_purity_trajectory(self, small_problem):
        p = small_problem
        y, d, Rt, n_u = p["y"], p["d"], p["R_trunc"], p["n_u"]
        n_s = y.shape[1]
        rng = np.random.default_rng(8)
        purity = rng.uniform(0.2, 0.8, size=n_s)
        u0 = rng.uniform(size=(y.shape[0], n_u))
        a1 = rng.dirichlet(np.ones(Rt.shape[1]), size=n_s).T * purity
        a2 = rng.dirichlet(np.ones(n_u), size=n_s).T * (1 - purity)
        a0 = np.vstack([a1, a2])

        want = purity_solve(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), jnp.asarray(purity), n_u,
            n_iter1=6, n_iter2=20, tol=1e-9)
        got = purity_solve_fused(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), jnp.asarray(purity), n_u,
            n_iter1=6, n_iter2=20, tol=1e-9)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   atol=1e-8)


class TestFusedRowMask:
    def test_masked_padded_solve_equals_lower_rank(self, small_problem):
        """Fused solver with row_mask: a padded (n_u_max) solve whose
        inactive u columns / alpha rows start at zero must equal the
        unpadded lower-rank fused solve exactly (the compile-once sweep
        contract, selection/batched_sweep.py)."""
        p = small_problem
        y, d, Rt = p["y"], p["d"], p["R_trunc"]
        n_ct, n_s = Rt.shape[1], y.shape[1]
        n_u, n_u_max = 1, 3
        rng = np.random.default_rng(21)
        u_small = rng.uniform(size=(y.shape[0], n_u))
        a_small = rng.dirichlet(np.ones(n_ct + n_u), size=n_s).T
        u_pad = np.zeros((y.shape[0], n_u_max))
        u_pad[:, :n_u] = u_small
        a_pad = np.zeros((n_ct + n_u_max, n_s))
        a_pad[:n_ct] = a_small[:n_ct]
        a_pad[n_ct:n_ct + n_u] = a_small[n_ct:]
        mask = jnp.asarray(np.arange(n_ct + n_u_max) < n_ct + n_u)

        want_u, want_a, want_info = partial_ref_solve_fused(
            jnp.asarray(u_small), jnp.asarray(a_small), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), n_u,
            n_iter1=12, n_iter2=6, tol=1e-9)
        got_u, got_a, got_info = partial_ref_solve_fused(
            jnp.asarray(u_pad), jnp.asarray(a_pad), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), n_u_max,
            n_iter1=12, n_iter2=6, tol=1e-9, row_mask=mask)

        got_u = np.asarray(got_u)
        got_a = np.asarray(got_a)
        np.testing.assert_array_equal(got_u[:, n_u:], 0.0)
        np.testing.assert_array_equal(got_a[n_ct + n_u:], 0.0)
        np.testing.assert_allclose(got_u[:, :n_u], np.asarray(want_u),
                                   atol=1e-10)
        np.testing.assert_allclose(got_a[:n_ct + n_u], np.asarray(want_a),
                                   atol=1e-10)


class TestFusedTrace:
    def test_cost_trace_matches_xla(self, small_problem):
        p = small_problem
        y, d, Rt, n_u = p["y"], p["d"], p["R_trunc"], p["n_u"]
        rng = np.random.default_rng(23)
        u0 = rng.uniform(size=(y.shape[0], n_u))
        a0 = rng.dirichlet(np.ones(Rt.shape[1] + n_u), size=y.shape[1]).T
        kw = dict(n_iter1=10, n_iter2=5, tol=1e-9, record_trace=True)
        want = partial_ref_solve(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), n_u, **kw)[2]["trace"]
        got = partial_ref_solve_fused(
            jnp.asarray(u0), jnp.asarray(a0), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), n_u, **kw)[2]["trace"]
        w, g = np.asarray(want), np.asarray(got)
        np.testing.assert_array_equal(np.isnan(w), np.isnan(g))
        np.testing.assert_allclose(g[~np.isnan(g)], w[~np.isnan(w)],
                                   rtol=1e-9)


class TestFusedMultiRestart:
    """The multi-member megakernel solver (one Y/D read for ALL restarts)
    must reproduce a vmap of the XLA solver per member, including each
    member's own termination iteration."""

    def _batch(self, p, n_b=5, seed=9):
        rng = np.random.default_rng(seed)
        n_cpg, n_s = p["y"].shape
        p_full = p["R_trunc"].shape[1] + p["n_u"]
        u0_b = rng.uniform(size=(n_b, n_cpg, p["n_u"]))
        a0_b = np.stack([rng.dirichlet(np.ones(p_full), size=n_s).T
                         for _ in range(n_b)])
        return jnp.asarray(u0_b), jnp.asarray(a0_b)

    def test_matches_vmapped_solver(self, small_problem):
        from demethify_tpu.solvers.fused import partial_ref_solve_fused_multi

        p = small_problem
        y, d, Rt, n_u = (jnp.asarray(p["y"]), jnp.asarray(p["d"]),
                         jnp.asarray(p["R_trunc"]), p["n_u"])
        u0_b, a0_b = self._batch(p)

        want = jax.vmap(lambda u0, a0: partial_ref_solve(
            u0, a0, y, d, Rt, n_u, n_iter1=12, n_iter2=6, tol=1e-9,
            record_trace=True))(u0_b, a0_b)
        got = partial_ref_solve_fused_multi(
            u0_b, a0_b, y, d, Rt, n_u, n_iter1=12, n_iter2=6, tol=1e-9,
            record_trace=True)
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(want[0]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[1]),
                                   np.asarray(want[1]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[2]["cost"]),
                                   np.asarray(want[2]["cost"]), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(got[2]["trace"]),
                                   np.asarray(want[2]["trace"]),
                                   rtol=1e-8)

    def test_matches_vmapped_solver_nu1(self, small_problem):
        # n_u = 1 takes the kernel's du-free closed-form Gram path
        from demethify_tpu.solvers.fused import partial_ref_solve_fused_multi

        p = dict(small_problem)
        p["n_u"] = 1
        y, d, Rt = (jnp.asarray(p["y"]), jnp.asarray(p["d"]),
                    jnp.asarray(p["R_trunc"]))
        u0_b, a0_b = self._batch(p, n_b=6, seed=1)
        want = jax.vmap(lambda u0, a0: partial_ref_solve(
            u0, a0, y, d, Rt, 1, n_iter1=12, n_iter2=6,
            tol=1e-9))(u0_b, a0_b)
        got = partial_ref_solve_fused_multi(
            u0_b, a0_b, y, d, Rt, 1, n_iter1=12, n_iter2=6, tol=1e-9)
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(want[0]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[1]),
                                   np.asarray(want[1]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[2]["cost"]),
                                   np.asarray(want[2]["cost"]), rtol=1e-9)

    def test_odd_member_count_pads_to_sublane_multiple(self,
                                                       small_problem):
        """B > 8 and not a multiple of 8 must pad up (Mosaic rejects
        the flat-gram slices at sublane offsets — production hit at
        B=29, round 5) and still match the vmapped solver exactly."""
        from demethify_tpu.solvers.fused import partial_ref_solve_fused_multi
        p = small_problem
        y, d, Rt, n_u = (jnp.asarray(p["y"]), jnp.asarray(p["d"]),
                         jnp.asarray(p["R_trunc"]), p["n_u"])
        rng = np.random.default_rng(29)
        n_b = 13
        u0_b = jnp.asarray(rng.uniform(size=(n_b, y.shape[0], n_u)))
        a0_b = jnp.asarray(np.stack(
            [rng.dirichlet(np.ones(Rt.shape[1] + n_u), size=y.shape[1]).T
             for _ in range(n_b)]))
        want = jax.vmap(lambda u0, a0: partial_ref_solve(
            u0, a0, y, d, Rt, n_u, n_iter1=6, n_iter2=4,
            tol=1e-9))(u0_b, a0_b)
        got = partial_ref_solve_fused_multi(
            u0_b, a0_b, y, d, Rt, n_u, n_iter1=6, n_iter2=4, tol=1e-9)
        assert got[0].shape[0] == n_b
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(want[0]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[2]["cost"]),
                                   np.asarray(want[2]["cost"]),
                                   rtol=1e-9)

    def test_per_member_termination(self, small_problem):
        # a loose tolerance makes members converge at different outer
        # iterations; each member's n_iter must equal its standalone run
        from demethify_tpu.solvers.fused import partial_ref_solve_fused_multi

        p = small_problem
        y, d, Rt, n_u = (jnp.asarray(p["y"]), jnp.asarray(p["d"]),
                         jnp.asarray(p["R_trunc"]), p["n_u"])
        u0_b, a0_b = self._batch(p, n_b=4, seed=3)
        got = partial_ref_solve_fused_multi(
            u0_b, a0_b, y, d, Rt, n_u, n_iter1=400, n_iter2=6, tol=5.0)
        n_iters = np.asarray(got[2]["n_iter"])
        for b in range(4):
            single = partial_ref_solve(
                u0_b[b], a0_b[b], y, d, Rt, n_u,
                n_iter1=400, n_iter2=6, tol=5.0)
            assert int(single[2]["n_iter"]) == int(n_iters[b])
            np.testing.assert_allclose(np.asarray(got[1][b]),
                                       np.asarray(single[1]), atol=1e-8)
        assert len(set(n_iters.tolist())) > 1  # members really diverged

    def test_unsupervised_matches_vmapped(self, small_problem):
        from demethify_tpu.solvers.fused import (
            unsupervised_solve_fused_multi,
        )
        from demethify_tpu.solvers.unsupervised import unsupervised_solve

        p = small_problem
        y, d = jnp.asarray(p["y"]), jnp.asarray(p["d"])
        n_u = 3
        rng = np.random.default_rng(4)
        n_cpg, n_s = p["y"].shape
        u0_b = jnp.asarray(rng.uniform(size=(5, n_cpg, n_u)))
        a0_b = jnp.asarray(np.stack([
            rng.dirichlet(np.ones(n_u), size=n_s).T for _ in range(5)]))
        want = jax.vmap(lambda u0, a0: unsupervised_solve(
            u0, a0, y, d, n_u, n_iter1=10, n_iter2=5,
            tol=1e-9))(u0_b, a0_b)
        got = unsupervised_solve_fused_multi(
            u0_b, a0_b, y, d, n_u, n_iter1=10, n_iter2=5, tol=1e-9)
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(want[0]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[2]["cost"]),
                                   np.asarray(want[2]["cost"]), rtol=1e-9)

    def test_purity_matches_vmapped(self, small_problem):
        from demethify_tpu.solvers.fused import purity_solve_fused_multi
        from demethify_tpu.solvers.purity import purity_solve

        p = small_problem
        y, d, Rt, n_u = (jnp.asarray(p["y"]), jnp.asarray(p["d"]),
                         jnp.asarray(p["R_trunc"]), p["n_u"])
        purity = jnp.asarray(np.full(p["y"].shape[1], 0.4))
        u0_b, a0_b = self._batch(p, n_b=4, seed=6)
        want = jax.vmap(lambda u0, a0: purity_solve(
            u0, a0, y, d, Rt, purity, n_u, n_iter1=6, n_iter2=10,
            tol=1e-9))(u0_b, a0_b)
        got = purity_solve_fused_multi(
            u0_b, a0_b, y, d, Rt, purity, n_u,
            n_iter1=6, n_iter2=10, tol=1e-9)
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(want[0]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[1]),
                                   np.asarray(want[1]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(got[2]["cost"]),
                                   np.asarray(want[2]["cost"]), rtol=1e-9)

    def test_restart_api_uses_batch_path(self, small_problem):
        # the public restart API must accept the batched solver and pick
        # the lowest-cost member (NaN-proof selection unchanged)
        from demethify_tpu.solvers.api import partial_reference_deconv

        p = small_problem
        res = partial_reference_deconv(
            jnp.asarray(p["y"]), jnp.asarray(p["d"]),
            jnp.asarray(p["R_trunc"]), p["n_u"], n_restarts=4,
            n_iter1=10, n_iter2=4, tol=1e-9, seed=2)
        assert np.isfinite(res.cost)
        assert res.u.shape == (p["y"].shape[0], p["n_u"])


class TestMultiVmemBudget:
    def test_member_cap_respects_budget(self):
        from demethify_tpu.solvers.fused import (
            _multi_budget,
            _multi_bytes_per_lane,
            max_multi_members,
        )

        for n_u, n_s, n_ct, weighted in [(1, 10, 5, True), (2, 10, 5, False),
                                         (3, 6, 4, True), (5, 10, 5, False)]:
            cap = max_multi_members(n_u, n_s, n_ct, weighted=weighted)
            assert cap >= 1
            limit = _multi_budget(n_u) // 1024
            assert _multi_bytes_per_lane(cap, n_u, n_s, n_ct, 4,
                                         weighted) <= limit
            if cap < 4096:
                assert _multi_bytes_per_lane(cap + 1, n_u, n_s, n_ct, 4,
                                             weighted) > limit

    def test_budget_formula_in_sync_with_kernel_source(self):
        # _multi_bytes_per_lane models the kernel's VMEM temporaries; a
        # kernel edit that doesn't re-derive the formula (and re-run the
        # hardware compile smoke) must fail loudly HERE instead of as a
        # scoped-VMEM OOM that only the real TPU compiler reports.
        import hashlib
        import inspect

        from demethify_tpu.ops import pallas_kernels
        from demethify_tpu.solvers.fused import (
            _MEGA_KERNEL_SRC_SHA1,
            _MULTI_KERNEL_SRC_SHA1,
        )

        for kern, want, budget_name in [
                (pallas_kernels._u_phase_grams_multi_kernel,
                 _MULTI_KERNEL_SRC_SHA1, "_multi_bytes_per_lane"),
                (pallas_kernels._u_phase_grams_kernel,
                 _MEGA_KERNEL_SRC_SHA1, "auto_tile")]:
            src = inspect.getsource(kern)
            assert hashlib.sha1(src.encode()).hexdigest()[:12] == want, (
                f"{kern.__name__} source changed: re-derive "
                f"{budget_name}, re-run tools/tpu_compile_smoke.py on "
                "hardware, then update the SHA1 constant in "
                "solvers/fused.py")

    def test_auto_tile_multi_within_budget(self):
        from demethify_tpu.solvers.fused import (
            _multi_budget,
            _multi_bytes_per_lane,
            auto_tile_multi,
        )

        for n_b, n_u in [(16, 1), (16, 2), (30, 2), (8, 5)]:
            tile = auto_tile_multi(n_b, n_u, 10, 5, weighted=True)
            if tile > 1024:   # above the floor the tile must fit
                assert (_multi_bytes_per_lane(n_b, n_u, 10, 5, 4, True)
                        * tile <= _multi_budget(n_u))


def test_unsupervised_multi_nu1_matches_vmapped(small_problem):
    # n_u = 1 closed-form gram path with rtt=None (zero known columns):
    # exercises the o == 0 flat-output branch
    from demethify_tpu.solvers.fused import unsupervised_solve_fused_multi
    from demethify_tpu.solvers.unsupervised import unsupervised_solve

    p = small_problem
    y, d = jnp.asarray(p["y"]), jnp.asarray(p["d"])
    rng = np.random.default_rng(8)
    n_cpg, n_s = p["y"].shape
    u0_b = jnp.asarray(rng.uniform(size=(4, n_cpg, 1)))
    a0_b = jnp.asarray(np.stack([
        rng.dirichlet(np.ones(1), size=n_s).T for _ in range(4)]))
    want = jax.vmap(lambda u0, a0: unsupervised_solve(
        u0, a0, y, d, 1, n_iter1=8, n_iter2=5, tol=1e-9))(u0_b, a0_b)
    got = unsupervised_solve_fused_multi(
        u0_b, a0_b, y, d, 1, n_iter1=8, n_iter2=5, tol=1e-9)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(got[2]["cost"]),
                               np.asarray(want[2]["cost"]), rtol=1e-9)
