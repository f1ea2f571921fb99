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


class TestRandomInitSweep:
    """beta / uniform (WLS-alpha) inits through the compile-once path:
    masked draws live on the active support only, the masked WLS equals
    the truncated-design WLS, and the sweeps dispatch batched (no
    per-rank serial compiles)."""

    def test_masked_beta_init_support(self, small_problem):
        from demethify_tpu.selection.batched_sweep import (
            _masked_random_init,
        )
        p = small_problem
        y, d, ref = (jnp.asarray(p["y"]), jnp.asarray(p["d"]),
                     jnp.asarray(p["R_trunc"]))
        n_ct, n_u_max = ref.shape[1], 4
        mask = jnp.asarray(np.arange(n_ct + n_u_max) < n_ct + 2)
        u0, a0 = _masked_random_init(jax.random.PRNGKey(7), "beta",
                                     y, d, ref, n_ct, n_u_max, mask)
        u0, a0 = np.asarray(u0), np.asarray(a0)
        np.testing.assert_array_equal(u0[:, 2:], 0.0)
        assert ((u0[:, :2] >= 0) & (u0[:, :2] <= 1)).all()
        np.testing.assert_array_equal(a0[n_ct + 2:], 0.0)
        np.testing.assert_allclose(a0.sum(axis=0), 1.0, atol=1e-12)

    def test_masked_wls_equals_truncated_design(self, small_problem):
        """The 'uniform' init's WLS on the padded design (zero inactive
        columns) must equal the WLS on the truncated design exactly —
        zero columns get exactly-zero NNLS coefficients."""
        from demethify_tpu.ops.nnls import wls_intercept_batch
        from demethify_tpu.selection.batched_sweep import (
            _masked_random_init,
        )
        from demethify_tpu.solvers.init import _zero_guard
        p = small_problem
        y, d, ref = (jnp.asarray(p["y"]), jnp.asarray(p["d"]),
                     jnp.asarray(p["R_trunc"]))
        n_ct, n_u_max, rank = ref.shape[1], 4, 2
        mask = jnp.asarray(np.arange(n_ct + n_u_max) < n_ct + rank)
        u0, a0 = _masked_random_init(jax.random.PRNGKey(3), "uniform",
                                     y, d, ref, n_ct, n_u_max, mask)
        u_act = u0[:, :rank]
        want = wls_intercept_batch(
            y, d, jnp.concatenate([ref, u_act], axis=1))
        want = _zero_guard(want, rank)
        got = np.asarray(a0)
        np.testing.assert_array_equal(got[n_ct + rank:], 0.0)
        np.testing.assert_allclose(got[:n_ct + rank], np.asarray(want),
                                   rtol=1e-9, atol=1e-12)

    @pytest.mark.parametrize("init", ["beta", "uniform"])
    def test_evaluate_ic_batched_random_inits(self, small_problem, init):
        p = small_problem
        n_u_max = p["y"].shape[1] + 1   # exercises the rank fallback too
        u, alpha, n_u, ics = evaluate_ic_batched(
            jnp.asarray(p["y"]), jnp.asarray(p["d"]),
            jnp.asarray(p["R_trunc"]), "AIC", key=jax.random.PRNGKey(5),
            iter1=10, iter2=4, tol=1e-7, n_u_max=n_u_max,
            init_option=init)
        assert len(ics) == n_u_max and np.isfinite(ics).all()
        assert u.shape[1] == n_u
        np.testing.assert_allclose(alpha.sum(axis=0), 1.0, atol=1e-8)

    @pytest.mark.parametrize("init", ["beta", "uniform"])
    def test_unsupervised_random_inits(self, small_problem, init):
        p = small_problem
        u, alpha, n_u, ics = evaluate_ic_batched(
            jnp.asarray(p["y"]), jnp.asarray(p["d"]), None, "BIC",
            key=jax.random.PRNGKey(6), iter1=10, iter2=4, tol=1e-7,
            n_u_max=3, init_option=init)
        assert len(ics) == 3 and np.isfinite(ics).all()
        np.testing.assert_allclose(alpha.sum(axis=0), 1.0, atol=1e-8)

    @pytest.mark.parametrize("ic", ["AIC", "CCC", "BCV"])
    def test_sweep_dispatches_batched_for_beta(self, small_problem, ic,
                                               monkeypatch):
        """--ic {AIC,CCC,BCV} --init beta must take the compile-once
        path — the serial per-rank criterion must never run."""
        from demethify_tpu.selection import sweep

        def boom(*a, **k):
            raise AssertionError("serial per-rank path taken")

        monkeypatch.setattr(sweep, "_rank_criterion", boom)
        p = small_problem
        u, alpha, n_u, ics = sweep.evaluate_best_ic(
            p["y"], p["d"], p["R_trunc"], "beta", ic,
            iter1=6, iter2=3, tol=1e-6, n_restarts=2, n_u_max=2)
        assert len(ics) == 2

    def test_bcv_uniform_init_per_fold(self, small_problem):
        """BCV with the data-dependent 'uniform' init recomputes inits on
        each fold's masked data (serial-path semantics, bcv.py)."""
        from demethify_tpu.selection.batched_sweep import batched_bcv_sweep
        p = small_problem
        u, alpha, n_u, press = batched_bcv_sweep(
            p["y"], p["d"], jnp.asarray(p["R_trunc"]), n_u_max=2,
            n_folds=2, key=jax.random.PRNGKey(8),
            iter1=6, iter2=3, tol=1e-6, init_option="uniform")
        assert len(press) == 2
        assert all(np.isfinite(v) for v in press)

    def test_bcv_svd_matches_per_rank(self, small_problem):
        """BCV with the deterministic SVD init through the compile-once
        path: per-fold PRESS must equal a serial per-rank evaluation
        that uses the SAME fold masks and the per-fold SVD init on the
        masked data (init_partial at the true rank — the padded batch's
        shared NNDSVD truncation must reproduce it)."""
        from demethify_tpu.selection.batched_sweep import batched_bcv_sweep
        from demethify_tpu.solvers.init import init_partial

        p = small_problem
        y, d = jnp.asarray(p["y"]), jnp.asarray(p["d"])
        ref = jnp.asarray(p["R_trunc"])
        n_ct = ref.shape[1]
        n_u_max, n_folds = 3, 2
        key = jax.random.PRNGKey(11)
        kw = dict(iter1=8, iter2=4, tol=1e-9)

        u, alpha, n_u, press = batched_bcv_sweep(
            y, d, ref, n_u_max=n_u_max, n_folds=n_folds, key=key,
            init_option="SVD", **kw)

        # serial reference with identical fold masks + per-fold SVD init
        k_folds, k_init = jax.random.split(key)
        want = np.zeros(n_u_max)
        for fold in range(n_folds):
            kf = jax.random.fold_in(k_folds, fold)
            train = jax.random.uniform(kf, y.shape) < 0.3
            test = ~train
            n_test = float(jnp.sum(test))
            y_tr, d_tr = y * train, d * train
            for r in range(1, n_u_max + 1):
                u0, a0 = init_partial(
                    jax.random.fold_in(k_init, fold), "SVD", y_tr, d_tr,
                    ref, r)
                u_r, a_r, _ = partial_ref_solve(
                    u0, a0, y_tr, d_tr, ref, r, n_iter1=kw["iter1"],
                    n_iter2=kw["iter2"], tol=kw["tol"])
                R = jnp.concatenate([ref, u_r], axis=1)
                err = float(jnp.sum(((y - R @ a_r) * test) ** 2)) / n_test
                want[r - 1] += err
        np.testing.assert_allclose(press, want, rtol=1e-6)

    def test_sweep_dispatches_batched_bcv_svd(self, small_problem,
                                              monkeypatch):
        """--ic BCV --init SVD must take the compile-once path."""
        from demethify_tpu.selection import sweep

        def boom(*a, **k):
            raise AssertionError("serial per-rank path taken")

        monkeypatch.setattr(sweep, "_rank_criterion", boom)
        p = small_problem
        u, alpha, n_u, ics = sweep.evaluate_best_ic(
            p["y"], p["d"], p["R_trunc"], "SVD", "BCV",
            iter1=6, iter2=3, tol=1e-6, n_restarts=2, n_u_max=2)
        assert len(ics) == 2 and all(np.isfinite(v) for v in ics)


class TestMemberChunking:
    """Large --icmax sweeps must chunk the member axis (bounded memory,
    one compile) and produce results identical to the unchunked batch."""

    @pytest.mark.parametrize("init", ["uniform_", "beta", "SVD"])
    def test_chunked_equals_unchunked(self, small_problem, init):
        p = small_problem
        y, d, ref = (jnp.asarray(p["y"]), jnp.asarray(p["d"]),
                     jnp.asarray(p["R_trunc"]))
        key = jax.random.PRNGKey(2)
        kw = dict(n_u_max=5, key=key, iter1=8, iter2=4, tol=1e-7,
                  init_option=init)
        u_w, a_w, c_w, n_w = batched_rank_sweep(y, d, ref,
                                                member_chunk=5, **kw)
        u_g, a_g, c_g, n_g = batched_rank_sweep(y, d, ref,
                                                member_chunk=2, **kw)
        np.testing.assert_allclose(np.asarray(u_g), np.asarray(u_w),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(a_g), np.asarray(a_w),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(c_g), np.asarray(c_w),
                                   rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(n_g), np.asarray(n_w))

    def test_auto_chunk_engages_on_tiny_budget(self, small_problem,
                                               monkeypatch):
        from demethify_tpu.selection import batched_sweep as bs
        monkeypatch.setattr(bs, "_SWEEP_MEMBER_BUDGET", 1)  # 1 byte
        p = small_problem
        assert bs._sweep_member_chunk(p["y"].shape[0], p["y"].shape[1],
                                      4, 8) == 1
        u_b, a_b, costs, _ = bs.batched_rank_sweep(
            jnp.asarray(p["y"]), jnp.asarray(p["d"]),
            jnp.asarray(p["R_trunc"]), n_u_max=4,
            key=jax.random.PRNGKey(0), iter1=5, iter2=3, tol=1e-6)
        assert costs.shape == (4,)
        assert np.isfinite(np.asarray(costs)).all()
