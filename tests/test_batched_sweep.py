"""Compile-once masked sweep: padded member solves must be EXACTLY the
standalone lower-rank solves (same init values), and the batched AIC/BIC
sweep must agree with per-rank evaluation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demethify_tpu.ops.simplex import (
    project_columns_to_simplex,
    project_columns_to_simplex_masked,
)
from demethify_tpu.selection.batched_sweep import (
    batched_rank_sweep,
    evaluate_ic_batched,
)
from demethify_tpu.selection.criteria import compute_aic
from demethify_tpu.solvers.partial_ref import partial_ref_solve
from demethify_tpu.solvers.unsupervised import unsupervised_solve


class TestMaskedProjection:
    def test_exactly_matches_subvector_projection(self, rng):
        p, n, active = 9, 12, 5
        v = rng.normal(size=(p, n)) * 2
        mask = jnp.asarray(np.arange(p) < active)
        got = np.asarray(project_columns_to_simplex_masked(
            jnp.asarray(v), mask))
        want_active = np.asarray(project_columns_to_simplex(
            jnp.asarray(v[:active])))
        np.testing.assert_array_equal(got[active:], 0.0)
        np.testing.assert_allclose(got[:active], want_active, atol=1e-14)

    def test_all_active_equals_plain(self, rng):
        v = rng.normal(size=(6, 8))
        mask = jnp.ones(6, bool)
        np.testing.assert_allclose(
            np.asarray(project_columns_to_simplex_masked(jnp.asarray(v),
                                                         mask)),
            np.asarray(project_columns_to_simplex(jnp.asarray(v))),
            atol=0)


class TestMaskedSolveExactness:
    def test_padded_member_equals_standalone(self, small_problem):
        """A padded solve with mask of size n_u must reproduce the
        standalone n_u solve bit-for-bit (same init values)."""
        p = small_problem
        y, d, Rt = p["y"], p["d"], p["R_trunc"]
        n_ct = Rt.shape[1]
        n_u, n_u_max = 2, 4
        rng = np.random.default_rng(3)
        n_cpg, n_s = y.shape

        u_small = rng.uniform(size=(n_cpg, n_u))
        a_small = rng.dirichlet(np.ones(n_ct + n_u), size=n_s).T

        u_pad = np.zeros((n_cpg, n_u_max))
        u_pad[:, :n_u] = u_small
        a_pad = np.zeros((n_ct + n_u_max, n_s))
        a_pad[:n_ct] = a_small[:n_ct]
        a_pad[n_ct:n_ct + n_u] = a_small[n_ct:]
        mask = jnp.asarray(np.arange(n_ct + n_u_max) < n_ct + n_u)

        want_u, want_a, want_info = partial_ref_solve(
            jnp.asarray(u_small), jnp.asarray(a_small), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), n_u,
            n_iter1=25, n_iter2=8, tol=1e-8)
        got_u, got_a, got_info = partial_ref_solve(
            jnp.asarray(u_pad), jnp.asarray(a_pad), jnp.asarray(y),
            jnp.asarray(d), jnp.asarray(Rt), n_u_max,
            n_iter1=25, n_iter2=8, tol=1e-8, row_mask=mask)

        got_u = np.asarray(got_u)
        got_a = np.asarray(got_a)
        # inactive stayed exactly zero
        np.testing.assert_array_equal(got_u[:, n_u:], 0.0)
        np.testing.assert_array_equal(got_a[n_ct + n_u:], 0.0)
        # active slices identical to the standalone solve
        np.testing.assert_allclose(got_u[:, :n_u], np.asarray(want_u),
                                   atol=1e-12)
        np.testing.assert_allclose(got_a[:n_ct + n_u], np.asarray(want_a),
                                   atol=1e-12)
        assert int(got_info["n_iter"]) == int(want_info["n_iter"])
        np.testing.assert_allclose(float(got_info["cost"]),
                                   float(want_info["cost"]), rtol=1e-12)

    def test_unsupervised_member(self, small_problem):
        p = small_problem
        y, d = p["y"], p["d"]
        n_u, n_u_max = 2, 3
        rng = np.random.default_rng(4)
        u_small = rng.uniform(size=(y.shape[0], n_u))
        a_small = rng.dirichlet(np.ones(n_u), size=y.shape[1]).T
        u_pad = np.zeros((y.shape[0], n_u_max))
        u_pad[:, :n_u] = u_small
        a_pad = np.zeros((n_u_max, y.shape[1]))
        a_pad[:n_u] = a_small
        mask = jnp.asarray(np.arange(n_u_max) < n_u)

        want = unsupervised_solve(
            jnp.asarray(u_small), jnp.asarray(a_small), jnp.asarray(y),
            jnp.asarray(d), n_u, n_iter1=15, n_iter2=6, tol=1e-8)
        got = unsupervised_solve(
            jnp.asarray(u_pad), jnp.asarray(a_pad), jnp.asarray(y),
            jnp.asarray(d), n_u_max, n_iter1=15, n_iter2=6, tol=1e-8,
            row_mask=mask)
        np.testing.assert_allclose(np.asarray(got[0])[:, :n_u],
                                   np.asarray(want[0]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(got[1])[:n_u],
                                   np.asarray(want[1]), atol=1e-12)


class TestBatchedSweep:
    def test_costs_match_standalone_per_rank(self, small_problem):
        p = small_problem
        y, d, Rt = p["y"], p["d"], p["R_trunc"]
        key = jax.random.PRNGKey(0)
        u_b, a_b, costs, n_iters = batched_rank_sweep(
            y, d, Rt, n_u_max=3, key=key, iter1=15, iter2=5, tol=1e-7)
        assert costs.shape == (3,)
        # all members produce feasible factors
        for i in range(3):
            a = np.asarray(a_b[i])
            np.testing.assert_allclose(a.sum(axis=0), 1.0, atol=1e-8)
            np.testing.assert_array_equal(
                a[Rt.shape[1] + i + 1:], 0.0)

    def test_evaluate_ic_batched(self, small_problem):
        p = small_problem
        u, alpha, n_u, ics = evaluate_ic_batched(
            jnp.asarray(p["y"]), jnp.asarray(p["d"]),
            jnp.asarray(p["R_trunc"]), "AIC",
            iter1=15, iter2=5, tol=1e-7, n_u_max=3)
        assert len(ics) == 3
        assert u.shape[1] == n_u
        assert alpha.shape[0] == p["R_trunc"].shape[1] + n_u
        assert ics[n_u - 1] == min(ics)

    def test_rejects_non_aic_bic(self, small_problem):
        p = small_problem
        with pytest.raises(ValueError):
            evaluate_ic_batched(jnp.asarray(p["y"]), jnp.asarray(p["d"]),
                                None, "CCC", iter1=1, iter2=1, tol=1.0)


class TestBatchedCCCAndBCV:
    def test_ccc_sweep(self, small_problem):
        from demethify_tpu.selection.batched_sweep import batched_ccc_sweep
        p = small_problem
        u, alpha, n_u, ics = batched_ccc_sweep(
            p["y"], p["d"], jnp.asarray(p["R_trunc"]), n_u_max=3,
            n_restarts=3, key=jax.random.PRNGKey(0),
            iter1=10, iter2=5, tol=1e-7)
        assert len(ics) == 3
        assert u.shape[1] == n_u
        assert alpha.shape[0] == p["R_trunc"].shape[1] + n_u
        np.testing.assert_allclose(alpha.sum(axis=0), 1.0, atol=1e-8)
        assert ics[n_u - 1] == min(ics)

    def test_bcv_sweep(self, small_problem):
        from demethify_tpu.selection.batched_sweep import batched_bcv_sweep
        p = small_problem
        u, alpha, n_u, press = batched_bcv_sweep(
            p["y"], p["d"], jnp.asarray(p["R_trunc"]), n_u_max=3,
            n_folds=3, key=jax.random.PRNGKey(1),
            iter1=10, iter2=5, tol=1e-7)
        assert len(press) == 3
        assert all(v > 0 for v in press)
        assert u.shape[1] == n_u
        assert press[n_u - 1] == min(press)

    def test_sweep_dispatches_batched(self, small_problem):
        from demethify_tpu.selection.sweep import evaluate_best_ic
        p = small_problem
        u, alpha, n_u, ics = evaluate_best_ic(
            p["y"], p["d"], p["R_trunc"], "uniform_", "CCC",
            iter1=8, iter2=4, tol=1e-6, n_restarts=3, n_u_max=2)
        assert len(ics) == 2
        u, alpha, n_u, ics = evaluate_best_ic(
            p["y"], p["d"], p["R_trunc"], "uniform_", "BCV",
            iter1=8, iter2=4, tol=1e-6, n_restarts=3, n_u_max=2)
        assert len(ics) == 2


class TestDeterministicInitSweep:
    """SVD/ICA-init AIC sweeps through the compile-once batched path must
    equal the per-rank serial sweep EXACTLY (deterministic inits; masked
    projection/zero-guard/solve are bit-faithful to the unpadded forms)."""

    def _serial_sweep(self, y, d, ref, init, n_u_max, key):
        from demethify_tpu.selection.sweep import _rank_criterion
        out = []
        for n_u in range(1, n_u_max + 1):
            crit, u, alpha = _rank_criterion(
                jnp.asarray(y), jnp.asarray(d), jnp.asarray(ref), n_u,
                init, "AIC", key, 25, 5, 1e-9, 1)
            out.append(crit)
        return out

    @pytest.mark.parametrize("init", ["SVD", "ICA"])
    def test_matches_per_rank(self, small_problem, init):
        p = small_problem
        y, d, ref = p["y"], p["d"], p["R_trunc"]
        n_u_max = 3  # <= n_samples: fully deterministic, exact parity
        key = jax.random.PRNGKey(11)
        want = self._serial_sweep(y, d, ref, init, n_u_max, key)
        _, _, best_n_u, got = evaluate_ic_batched(
            jnp.asarray(y), jnp.asarray(d), jnp.asarray(ref), "AIC",
            key=key, iter1=25, iter2=5, tol=1e-9, n_u_max=n_u_max,
            init_option=init)
        np.testing.assert_allclose(got, want, rtol=1e-9)
        assert best_n_u == int(np.argmin(want)) + 1

    def test_svd_unsupervised_matches(self, small_problem):
        p = small_problem
        y, d = p["y"], p["d"]
        from demethify_tpu.selection.sweep import _rank_criterion
        key = jax.random.PRNGKey(4)
        want = []
        for n_u in range(1, 4):
            crit, _, _ = _rank_criterion(
                jnp.asarray(y), jnp.asarray(d), None, n_u,
                "SVD", "AIC", key, 20, 5, 1e-9, 1)
            want.append(crit)
        _, _, _, got = evaluate_ic_batched(
            jnp.asarray(y), jnp.asarray(d), None, "AIC",
            key=key, iter1=20, iter2=5, tol=1e-9, n_u_max=3,
            init_option="SVD")
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_fallback_ranks_run(self, small_problem):
        # ranks above n_samples take the uniform_ fallback; the sweep
        # must still produce finite criteria for every member
        p = small_problem
        y, d, ref = p["y"], p["d"], p["R_trunc"]
        n_u_max = y.shape[1] + 2
        _, _, best, got = evaluate_ic_batched(
            jnp.asarray(y), jnp.asarray(d), jnp.asarray(ref), "AIC",
            key=jax.random.PRNGKey(0), iter1=10, iter2=3, tol=1e-9,
            n_u_max=n_u_max, init_option="SVD")
        assert len(got) == n_u_max
        assert np.isfinite(got).all()
