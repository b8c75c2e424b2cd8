"""Sampler correctness on analytically-known posteriors.

The reference had no sampler tests at all (SURVEY.md §4); these validate
the stretch move recovers known Gaussian moments with correct acceptance
statistics, and that runs are exactly reproducible under a fixed key.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import (
    integrated_autocorr_time, effective_sample_size, gelman_rubin,
    burnin_steps)


def _gauss_lnprob(mu, cov_inv):
    def lnprob(theta):
        d = theta - mu
        return -0.5 * d @ cov_inv @ d
    return jax.vmap(lnprob)


def test_recovers_gaussian_moments():
    mu = jnp.asarray([1.0, -2.0, 0.5])
    cov = np.array([[1.0, 0.5, 0.0], [0.5, 2.0, 0.3], [0.0, 0.3, 0.5]])
    lnprob = _gauss_lnprob(mu, jnp.asarray(np.linalg.inv(cov)))
    key = jax.random.PRNGKey(0)
    k_init, k_run = jax.random.split(key)
    pos0 = mu + 0.1 * jax.random.normal(k_init, (64, 3))
    state, chain, lnps, acc = run_stretch(lnprob, pos0, k_run, 4000)
    burn, tau = burnin_steps(np.asarray(chain), 4000)
    samples = np.asarray(chain)[burn:].reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(axis=0), np.asarray(mu),
                               atol=0.08)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.15)
    # acceptance fraction in the healthy range for a=2 on a Gaussian
    frac = float(np.mean(np.asarray(acc))) / 4000
    assert 0.2 < frac < 0.8
    assert np.all(gelman_rubin(np.asarray(chain)[burn:]) < 1.05)


@pytest.mark.quick
def test_reproducible_with_same_key():
    lnprob = _gauss_lnprob(jnp.zeros(2), jnp.eye(2))
    pos0 = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    out1 = run_stretch(lnprob, pos0, jax.random.PRNGKey(2), 100)
    out2 = run_stretch(lnprob, pos0, jax.random.PRNGKey(2), 100)
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))
    out3 = run_stretch(lnprob, pos0, jax.random.PRNGKey(3), 100)
    assert not np.array_equal(np.asarray(out1[1]), np.asarray(out3[1]))


def test_thinning_matches_final_state():
    lnprob = _gauss_lnprob(jnp.zeros(2), jnp.eye(2))
    pos0 = jax.random.normal(jax.random.PRNGKey(4), (16, 2))
    key = jax.random.PRNGKey(5)
    st1, chain1, _, _ = run_stretch(lnprob, pos0, key, 100, thin=1)
    st2, chain2, _, _ = run_stretch(lnprob, pos0, key, 100, thin=10)
    assert chain2.shape[0] == 10
    np.testing.assert_allclose(np.asarray(st1.pos), np.asarray(st2.pos))
    np.testing.assert_allclose(np.asarray(chain1[9::10]),
                               np.asarray(chain2))


def test_autocorr_on_known_process():
    # AR(1) with phi=0.9 has tau = (1+phi)/(1-phi) = 19
    rng = np.random.default_rng(0)
    n, w = 20000, 8
    x = np.zeros((n, w, 1))
    for t in range(1, n):
        x[t] = 0.9 * x[t - 1] + rng.standard_normal((w, 1))
    tau = integrated_autocorr_time(x)[0]
    assert 14 < tau < 25
    ess = effective_sample_size(x)[0]
    np.testing.assert_allclose(ess, n * w / tau, rtol=1e-6)


def test_rejects_out_of_bounds_walkers():
    # -inf regions are never entered
    def lnprob_scalar(th):
        good = jnp.all(jnp.abs(th) < 3.0)
        return jnp.where(good, -0.5 * jnp.sum(th**2), -jnp.inf)
    lnprob = jax.vmap(lnprob_scalar)
    pos0 = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (32, 2))
    _, chain, lnps, _ = run_stretch(lnprob, pos0, jax.random.PRNGKey(7), 500)
    assert np.all(np.isfinite(np.asarray(lnps)))
    assert np.all(np.abs(np.asarray(chain)) < 3.0)


def test_de_and_mix_moves_recover_moments():
    """The DE and mixed proposals target the same distribution as the
    stretch move (symmetric Metropolis — tested on a strongly
    correlated Gaussian, where DE should also mix faster)."""
    import pytest
    cov = np.array([[1.0, 0.95], [0.95, 1.0]])
    lnprob = _gauss_lnprob(jnp.zeros(2), jnp.asarray(np.linalg.inv(cov)))
    pos0 = 0.1 * jax.random.normal(jax.random.PRNGKey(10), (64, 2))
    ess = {}
    for move in ("stretch", "de", "mix"):
        _, chain, _, acc = run_stretch(lnprob, pos0,
                                       jax.random.PRNGKey(11), 4000,
                                       move=move)
        samples = np.asarray(chain)[1000:].reshape(-1, 2)
        np.testing.assert_allclose(samples.mean(axis=0), 0.0, atol=0.08)
        np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.12)
        frac = float(np.mean(np.asarray(acc))) / 4000
        assert 0.15 < frac < 0.85
        ess[move] = float(effective_sample_size(
            np.asarray(chain)[1000:]).min())
    # the DE direction proposal exploits the correlation structure;
    # qualitative bound only — the measured ratio (~3x here) is
    # seed-dependent and a 2x threshold could fail on an unlucky key
    # without any code regression
    assert ess["de"] > ess["stretch"]
    with pytest.raises(ValueError, match="unknown move"):
        run_stretch(lnprob, pos0, jax.random.PRNGKey(12), 10,
                    move="bogus")


def test_de_move_reproducible():
    lnprob = _gauss_lnprob(jnp.zeros(2), jnp.eye(2))
    pos0 = jax.random.normal(jax.random.PRNGKey(13), (16, 2))
    out1 = run_stretch(lnprob, pos0, jax.random.PRNGKey(14), 100,
                       move="de")
    out2 = run_stretch(lnprob, pos0, jax.random.PRNGKey(14), 100,
                       move="de")
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))
    # thinning contract holds for the new rand pytrees (mix exercises
    # the nested tree_map reshape)
    st1, chain1, _, _ = run_stretch(lnprob, pos0, jax.random.PRNGKey(15),
                                    100, thin=10, move="mix")
    st2, chain2, _, _ = run_stretch(lnprob, pos0, jax.random.PRNGKey(15),
                                    100, thin=1, move="mix")
    np.testing.assert_allclose(np.asarray(st1.pos), np.asarray(st2.pos))
    np.testing.assert_allclose(np.asarray(chain2[9::10]),
                               np.asarray(chain1))


def test_multi_ensemble_runner():
    from lumfuncmcmc_tpu.samplers.affine import run_stretch_ensembles
    lnprob = _gauss_lnprob(jnp.zeros(2), jnp.eye(2))
    pos0 = jax.random.normal(jax.random.PRNGKey(8), (4, 16, 2))
    st, chain, lnps, acc = run_stretch_ensembles(
        lnprob, pos0, jax.random.PRNGKey(9), 800)
    assert chain.shape == (4, 800, 16, 2)
    # the mixed move composes with the ensemble vmap (its deterministic
    # DE schedule keeps the per-step cond predicate unbatched)
    _, chain_m, _, _ = run_stretch_ensembles(
        lnprob, pos0, jax.random.PRNGKey(9), 200, move="mix")
    assert np.all(np.isfinite(np.asarray(chain_m)))
    # chains are independent (different keys -> different trajectories)
    c = np.asarray(chain)
    assert not np.allclose(c[0], c[1])
    # cross-ensemble R-hat on the stacked walkers is healthy
    stacked = c[:, 400:].transpose(1, 0, 2, 3).reshape(400, 64, 2)
    assert np.all(gelman_rubin(stacked) < 1.2)


def test_de_schedule_block_continuity():
    """Blocked (checkpointed) runs slice the GLOBAL Bresenham schedule:
    concatenated slices equal the unblocked schedule, and the realized
    DE fraction is exact — a per-block restart would quantize it (and
    silently zero it whenever de_prob < 1/block)."""
    from lumfuncmcmc_tpu.samplers.affine import de_schedule
    full = de_schedule(400, 0.05)
    parts = np.concatenate([de_schedule(10, 0.05, offset=o)
                            for o in range(0, 400, 10)])
    np.testing.assert_array_equal(parts, full)
    assert full.sum() == 20                       # exactly 5% of 400
    restart = np.concatenate([de_schedule(10, 0.05, offset=0)] * 40)
    assert restart.sum() == 0                     # the bug this fixes


def test_run_stretch_de_sel_matches_host_schedule():
    """Passing de_sel as a traced input reproduces the host-constant
    schedule exactly (same chain bit-for-bit)."""
    from lumfuncmcmc_tpu.samplers.affine import de_schedule, run_stretch
    lnprob = _gauss_lnprob(jnp.zeros(2), jnp.eye(2))
    pos0 = jax.random.normal(jax.random.PRNGKey(21), (16, 2))
    a = run_stretch(lnprob, pos0, jax.random.PRNGKey(22), 60,
                    move="mix", de_prob=0.3)
    b = run_stretch(lnprob, pos0, jax.random.PRNGKey(22), 60,
                    move="mix", de_prob=0.3,
                    de_sel=de_schedule(60, 0.3))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_rank_normalized_rhat_catches_scale_disagreement():
    """The modern diagnostic's reason to exist: two walker groups with
    the SAME location but different SCALES pass classic split-R-hat
    (it compares means) while the folded rank-normalized variant flags
    them; converged identical-distribution chains stay ~1 under both;
    and rank normalization keeps the statistic finite on
    infinite-variance (Cauchy) chains."""
    from lumfuncmcmc_tpu.samplers.diagnostics import (
        gelman_rubin, rank_normalized_rhat)

    rng = np.random.default_rng(31)
    n, w = 600, 8
    good = rng.normal(size=(n, w, 2))
    assert gelman_rubin(good).max() < 1.02
    assert rank_normalized_rhat(good).max() < 1.02

    scales = np.where(np.arange(w)[None, :, None] < w // 2, 1.0, 4.0)
    scale_only = rng.normal(size=(n, w, 2)) * scales
    assert gelman_rubin(scale_only).max() < 1.05      # blind to scale
    assert rank_normalized_rhat(scale_only).max() > 1.2

    cauchy = rng.standard_cauchy(size=(n, w, 2))
    r = rank_normalized_rhat(cauchy)
    assert np.all(np.isfinite(r)) and r.max() < 1.05


def test_rank_normalized_rhat_ensembles_scale_disagreement():
    """Ensembles variant: scale-only disagreement between independent
    ensembles passes the classic cross-ensemble statistic and is
    flagged by the folded rank-normalized one."""
    from lumfuncmcmc_tpu.samplers.diagnostics import (
        gelman_rubin_ensembles, rank_normalized_rhat_ensembles)

    rng = np.random.default_rng(33)
    c, n, w = 4, 400, 6
    good = rng.normal(size=(c, n, w, 2))
    assert gelman_rubin_ensembles(good).max() < 1.02
    assert rank_normalized_rhat_ensembles(good).max() < 1.02

    scales = np.where(np.arange(c)[:, None, None, None] < c // 2,
                      1.0, 4.0)
    scale_only = rng.normal(size=(c, n, w, 2)) * scales
    assert gelman_rubin_ensembles(scale_only).max() < 1.05
    assert rank_normalized_rhat_ensembles(scale_only).max() > 1.2


def test_mcse_quantile_iid_and_correlated():
    """Median MCSE matches the analytic iid value sqrt(pi/2)*sigma/
    sqrt(N) and inflates ~sqrt(k) when each draw is repeated k times
    (the autocorrelation-aware ESS is what distinguishes it from a
    naive order-statistic error)."""
    from lumfuncmcmc_tpu.samplers.diagnostics import mcse_quantile

    rng = np.random.default_rng(41)
    n, w = 500, 16
    x = rng.normal(size=(n, w, 2))
    got = mcse_quantile(x, 0.5)
    expect = np.sqrt(np.pi / 2.0) / np.sqrt(n * w)
    assert np.all(np.abs(got / expect - 1.0) < 0.35), (got, expect)

    k = 4
    xc = np.repeat(rng.normal(size=(n // k, w, 2)), k, axis=0)
    got_c = mcse_quantile(xc, 0.5)
    ratio = got_c / got
    assert np.all(ratio > 1.4) and np.all(ratio < 3.2), ratio


def test_average_ranks_match_scipy_on_ties():
    """Tied samples (MCMC chains repeat walker positions on rejection)
    must share their AVERAGE rank (Vehtari et al. 2021), not get
    argsort-order-distinct ranks; oracle = scipy.stats.rankdata."""
    from scipy.stats import rankdata

    from lumfuncmcmc_tpu.samplers.diagnostics import _average_ranks

    rng = np.random.default_rng(37)
    # heavy ties: values drawn from a tiny discrete set, plus a block
    # of literal repeats (the rejected-proposal pattern)
    v = rng.choice([0.0, 1.0, 1.0, 2.5, -3.0], size=200)
    v[50:70] = v[49]
    np.testing.assert_allclose(_average_ranks(v),
                               rankdata(v, method="average"))
    # tie-free data reduces to ordinary 1-based ranks
    u = rng.normal(size=101)
    np.testing.assert_allclose(_average_ranks(u),
                               rankdata(u, method="average"))
