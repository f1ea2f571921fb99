"""Model-selection subsystem: criteria formulas vs reference definitions,
CCC/BCV/minka behavior, sweep driver, bootstrap statistics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demethify_tpu.selection.bcv import bicross_validation
from demethify_tpu.selection.ccc import compute_ccc, compute_consensus_matrix
from demethify_tpu.selection.criteria import compute_aic, compute_bic
from demethify_tpu.selection.minka import get_log_lik_partial, select_rank_minka
from demethify_tpu.selection.sweep import evaluate_best_ic
from demethify_tpu.uncertainty.bootstrap import bootstrap_ci


class TestCriteria:
    def test_formulas(self):
        # direct transcription of ic.py:11-22
        cost, n_u, n_cpg, n_ct, n_s = 123.4, 2, 350, 5, 10
        l = n_s * n_cpg
        k = n_u * n_cpg + (n_ct + n_u - 1) * n_s
        want_bic = (2 * np.log(cost) * k * np.log(l)
                    + (k * np.log(l) * (k + 1)) / (l - k - 1))
        want_aic = (l * np.log(cost / l) + 2 * k
                    + (2 * k * (k + 1)) / (l - k - 1))
        assert compute_bic(cost, n_u, n_cpg, n_ct, n_s) == \
            pytest.approx(want_bic)
        assert compute_aic(cost, n_u, n_cpg, n_ct, n_s) == \
            pytest.approx(want_aic)


class TestCCC:
    def test_consensus_loop_oracle(self, rng):
        runs = [rng.dirichlet(np.ones(4), size=8).T for _ in range(5)]
        got = compute_consensus_matrix(runs)
        want = np.zeros((8, 8))
        for alpha in runs:
            assign = np.argmax(alpha, axis=0)
            for i in range(8):
                for j in range(8):
                    if assign[i] == assign[j]:
                        want[i, j] += 1
        want /= 5
        np.testing.assert_allclose(got, want)

    def test_perfectly_stable_clustering(self, rng):
        # identical assignments every run -> consensus is 0/1 blocks
        base = rng.dirichlet(np.ones(3), size=10).T
        runs = [base + 1e-6 * rng.normal(size=base.shape)
                for _ in range(4)]
        ccc = compute_ccc(runs)
        assert 0.0 <= ccc <= 1.0 + 1e-9


class TestMinka:
    def test_recovers_exact_lowrank(self, rng):
        # exactly rank-3 matrix: eigenvalues beyond 3 are ~0, so the
        # evidence is -inf there (ic.py:139-140) and the argmax is <= 3
        n, m, true_rank = 200, 12, 3
        A = rng.normal(size=(n, true_rank))
        B = rng.normal(size=(true_rank, m))
        Y = A @ B
        counts = np.ones_like(Y)
        rank, info = select_rank_minka(Y, counts, None)
        assert rank == true_rank

    def test_sharded_spectrum_path(self, rng, monkeypatch):
        # force the Gram-eigh (device/sharded) spectrum path and check it
        # still resolves an exactly low-rank residual
        import demethify_tpu.selection.minka as minka_mod
        monkeypatch.setattr(minka_mod, "_HOST_SVD_MAX_ROWS", 10)
        n, m, true_rank = 300, 10, 4
        A = rng.normal(size=(n, true_rank))
        B = rng.normal(size=(true_rank, m))
        Y = A @ B
        counts = np.ones_like(Y)
        rank, info = select_rank_minka(Y, counts, None)
        assert rank == true_rank

    def test_log_lik_validates_rank(self, rng):
        evals = np.sort(rng.uniform(size=8))[::-1]
        with pytest.raises(ValueError):
            get_log_lik_partial(evals, 0, (10, 8))
        with pytest.raises(ValueError):
            get_log_lik_partial(evals, 8, (10, 8))

    def test_loop_oracle_parity(self, rng):
        # vectorized pairwise term vs the double-loop definition
        from scipy.special import gammaln
        evals = np.sort(rng.uniform(0.1, 2.0, size=10))[::-1]
        rank, shape = 4, (20, 10)
        got = get_log_lik_partial(evals.copy(), rank, shape)

        n_samples, n_features = shape
        eps = 1e-15
        pu = -rank * np.log(2.0)
        for i in range(1, rank + 1):
            pu += (gammaln((n_features - i + 1) / 2.0)
                   - np.log(np.pi) * (n_features - i + 1) / 2.0)
        pl = -np.sum(np.log(evals[:rank])) * n_samples / 2.0
        v = max(eps, np.sum(evals[rank:]) / (n_features - rank))
        pv = -np.log(v) * n_samples * (n_features - rank) / 2.0
        m = n_features * rank - rank * (rank + 1.0) / 2.0
        pp = np.log(2.0 * np.pi) * (m + rank) / 2.0
        pa = 0.0
        spectrum = evals.copy()
        spectrum[rank:] = v
        for i in range(rank):
            for j in range(i + 1, len(evals)):
                pa += (np.log((evals[i] - evals[j])
                              * (1.0 / spectrum[j] - 1.0 / spectrum[i]))
                       + np.log(n_samples))
        want = (pu + pl + pv + pp - pa / 2.0
                - rank * np.log(n_samples) / 2.0)
        assert got == pytest.approx(want, rel=1e-10)


class TestBCV:
    def test_returns_total_press_and_factors(self, small_problem):
        p = small_problem
        total, u, alpha = bicross_validation(
            p["y"], p["d"], 2, ref=p["R_trunc"], iter1=10, iter2=5,
            tol=1e-6, n_folds=3, key=jax.random.PRNGKey(0))
        assert total > 0
        assert u.shape == (p["y"].shape[0], 2)
        assert alpha.shape[0] == p["R_trunc"].shape[1] + 2


class TestSweep:
    def test_aic_picks_a_rank(self, small_problem):
        p = small_problem
        u, alpha, n_u, ics = evaluate_best_ic(
            p["y"], p["d"], p["R_trunc"], "uniform_", "AIC",
            iter1=20, iter2=5, tol=1e-6, n_u_max=3)
        assert n_u in (1, 2, 3)
        assert len(ics) == 3
        assert ics[n_u - 1] == min(ics)

    def test_minka_path_works(self, small_problem):
        p = small_problem
        u, alpha, n_u, ics = evaluate_best_ic(
            p["y"], p["d"], p["R_trunc"], "uniform_", "minka",
            iter1=10, iter2=5, tol=1e-6)
        assert 1 <= n_u
        assert u.shape[1] == n_u

    def test_ccc_path(self, small_problem):
        p = small_problem
        u, alpha, n_u, ics = evaluate_best_ic(
            p["y"], p["d"], p["R_trunc"], "uniform_", "CCC",
            iter1=10, iter2=5, tol=1e-6, n_restarts=3, n_u_max=2)
        assert len(ics) == 2

    def test_rejects_unknown_ic(self, small_problem):
        p = small_problem
        with pytest.raises(ValueError):
            evaluate_best_ic(p["y"], p["d"], p["R_trunc"], "uniform_",
                             "XYZ", iter1=1, iter2=1, tol=1.0)


class TestBootstrap:
    def test_supervised_ci_covers_point(self, small_problem):
        p = small_problem
        R = np.hstack([p["R_trunc"], p["u_true"]])
        lo, hi, lo_u, hi_u = bootstrap_ci(
            p["y"], p["d"], R, 0, level=90, n_bootstrap=32,
            key=jax.random.PRNGKey(0))
        assert lo_u is None and hi_u is None
        assert lo.shape == hi.shape == (R.shape[1], p["y"].shape[1])
        assert (lo <= hi + 1e-12).all()
        # intervals should bracket the true proportions most of the time
        inside = ((p["alpha"] >= lo - 0.1) & (p["alpha"] <= hi + 0.1))
        assert inside.mean() > 0.8

    def test_partial_ci_shapes(self, small_problem):
        p = small_problem
        lo, hi, lo_u, hi_u = bootstrap_ci(
            p["y"], p["d"], p["R_trunc"], p["n_u"], level=95,
            n_bootstrap=8, n_iter1=20, n_iter2=5, tol=1e-4,
            key=jax.random.PRNGKey(1), batch_size=4)
        assert lo.shape[0] == p["R_trunc"].shape[1] + p["n_u"]
        assert lo_u.shape == (p["y"].shape[0], p["n_u"])
        assert (lo_u <= hi_u + 1e-12).all()
