"""WAIC / PSIS-LOO information criteria.

Oracles: scipy.stats.genpareto draws for the Zhang–Stephens tail fit
(truth recovery), the analytic conjugate-normal leave-one-out
predictive for PSIS-LOO, and the likelihood's own (lnpart, fullint)
split for the exact pointwise decomposition (the Poisson point
process conditioned on N factorizes exactly, so the reconstruction
must hold at roundoff — not a tolerance statement about an
approximation).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.hierarchical import ThetaLayoutH
from lumfuncmcmc_tpu.models.ic import (
    format_ic_report, gpd_fit_tail, information_criteria,
    loo_from_loglik, psis_smooth, waic_from_loglik)
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, sample_init)
from lumfuncmcmc_tpu.models.likelihood_z import ThetaLayoutZ
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import burnin_steps
from lumfuncmcmc_tpu.utils.synth import apply_completeness_cut, make_catalog


# ---------------------------------------------------------------------------
# GPD tail fit
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("xi_true", [-0.3, 0.2, 0.7])
def test_gpd_fit_recovers_truth(xi_true):
    rng = np.random.default_rng(7)
    n = 4000
    x = np.sort(stats.genpareto.rvs(xi_true, scale=1.0, size=(3, n),
                                    random_state=rng), axis=1)
    xi, sigma = gpd_fit_tail(x)
    assert np.all(np.abs(xi - xi_true) < 0.1), (xi, xi_true)
    assert np.all(np.abs(sigma - 1.0) < 0.15), sigma


def test_gpd_fit_matches_scipy_mle_loosely():
    """Zhang–Stephens and MLE are different estimators but must agree
    to estimator-level noise on clean mid-size samples."""
    rng = np.random.default_rng(11)
    x = np.sort(stats.genpareto.rvs(0.4, scale=2.0, size=2000,
                                    random_state=rng))
    xi, sigma = gpd_fit_tail(x[None, :])
    c_mle, loc, sc_mle = stats.genpareto.fit(x, floc=0.0)
    assert abs(xi[0] - c_mle) < 0.08
    assert abs(sigma[0] - sc_mle) / sc_mle < 0.1


def test_gpd_fit_row_blocking_consistent():
    """The internal row-blocking (memory guard) must not change any
    row's estimate vs a one-row call."""
    rng = np.random.default_rng(3)
    n = 100                       # block size ~800 rows at n=100
    x = np.sort(stats.genpareto.rvs(0.3, scale=1.0, size=(900, n),
                                    random_state=rng), axis=1)
    xi_all, sig_all = gpd_fit_tail(x)
    for i in (0, 449, 899):
        xi_i, sig_i = gpd_fit_tail(x[i:i + 1])
        assert xi_all[i] == xi_i[0]
        assert sig_all[i] == sig_i[0]


def test_gpd_fit_degenerate_rows():
    """Zero-spread or non-positive exceedances give xi=inf (callers
    skip smoothing), never a crash or a bogus finite fit."""
    x = np.zeros((2, 50))
    x[1] = 1.0                    # constant positive: no spread
    xi, sigma = gpd_fit_tail(x)
    assert np.all(np.isinf(xi))


# ---------------------------------------------------------------------------
# PSIS-LOO vs the analytic conjugate-normal oracle
# ---------------------------------------------------------------------------

def _normal_logpdf(y, mu, var):
    return -0.5 * ((y - mu) ** 2 / var + np.log(2.0 * np.pi * var))


def test_psis_loo_conjugate_normal_oracle():
    """y_i ~ N(theta, 1), theta ~ N(0, 10^2): the exact leave-one-out
    predictive p(y_i | y_{-i}) = N(mu_{-i}, 1 + s2_{-i}) is analytic.
    PSIS-LOO from direct posterior draws must match it to MC error."""
    rng = np.random.default_rng(42)
    N, S, tau2 = 40, 4000, 100.0
    y = rng.normal(1.3, 1.0, size=N)

    def posterior(yv):
        n = yv.size
        s2 = 1.0 / (n / 1.0 + 1.0 / tau2)
        return s2 * yv.sum(), s2

    mu_n, s2_n = posterior(y)
    thetas = rng.normal(mu_n, np.sqrt(s2_n), size=S)
    ll = _normal_logpdf(y[None, :], thetas[:, None], 1.0)

    exact = np.empty(N)
    for i in range(N):
        mu_i, s2_i = posterior(np.delete(y, i))
        exact[i] = _normal_logpdf(y[i], mu_i, 1.0 + s2_i)

    elpd_i, k = loo_from_loglik(ll)
    assert np.all(k < 0.7), k.max()
    assert abs(elpd_i.sum() - exact.sum()) < 0.3, (
        elpd_i.sum(), exact.sum())
    # WAIC agrees with LOO on this well-behaved posterior
    lppd, p, elpd_waic = waic_from_loglik(ll)
    assert abs(elpd_waic.sum() - exact.sum()) < 0.5
    # one unknown parameter: p_waic ~ 1
    assert 0.5 < p.sum() < 2.0


def test_psis_weights_normalized_and_capped():
    rng = np.random.default_rng(5)
    ll = rng.normal(size=(400, 30))
    logw, k = psis_smooth(ll)
    assert logw.shape == ll.shape
    assert np.all(logw <= 1e-12)          # max-normalized and capped
    assert np.all(np.isfinite(logw))
    assert np.all(np.isfinite(k))


# ---------------------------------------------------------------------------
# exact pointwise decomposition on every model family
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cat_ctx():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, quadrature="gauss",
                   Lstar=42.5, phistar=-2.6, sch_al=-1.6, nwalkers=32)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=300, seed=4),
                                 cfg)
    return cfg, cat


def _draws(layout, n=16, seed=0):
    """Posterior-ish draws: box-uniform shrunk toward the center (the
    NUTS-init rule) so free-completeness omegas stay positive."""
    u = np.asarray(sample_init(jax.random.PRNGKey(seed), layout, n))
    lo, hi = (np.asarray(a) for a in layout.bounds_arrays())
    mid = (lo + hi) / 2.0
    return 0.8 * mid[None, :] + 0.2 * u


def _ctx_for(cfg, cat):
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"],
                           field_id=cat["field_id"])
    return ctx


@pytest.mark.parametrize("family", ["fixed", "free", "exact", "z", "hier"])
@pytest.mark.quick
def test_reconstruction_exact(cat_ctx, family):
    cfg0, cat = cat_ctx
    kw = {}
    if family == "fixed":
        cfg = cfg0
        layout_cls = ThetaLayout
    elif family in ("free", "exact"):
        cfg = dataclasses.replace(cfg0, fix_comp=False)
        layout_cls = ThetaLayout
        if family == "exact":
            kw = dict(exact_bounds=True, min_comp_frac=cfg.min_comp_frac)
    elif family == "z":
        cfg = cfg0
        layout_cls = ThetaLayoutZ
    else:
        cfg = cfg0
        layout_cls = ThetaLayoutH
    ctx = _ctx_for(cfg, cat)
    layout = layout_cls.from_config(cfg)
    draws = _draws(layout, n=12, seed=1)
    ic = information_criteria(draws, ctx, layout, ndraws=12, chunk=64,
                              theta_batch=8, **kw)
    assert ic["max_abs_recon_err"] < 1e-9, (family, ic)
    assert ic["n_sources"] == int(np.asarray(ctx.src_mask).sum())


def test_padded_sources_do_not_change_ic(cat_ctx):
    """Source-axis padding (src_mask == 0 rows) must be invisible."""
    cfg, cat = cat_ctx
    ctx = _ctx_for(cfg, cat)
    layout = ThetaLayout.from_config(cfg)
    npad = 37
    rep = {}
    for name in ("lum", "zsrc", "logf_src", "omega0_src", "ln_om_src",
                 "field_id", "src_mask"):
        a = np.asarray(getattr(ctx, name))
        pad = np.repeat(a[-1:], npad, axis=0)
        if name == "src_mask":
            pad = np.zeros_like(pad)
        rep[name] = jnp.asarray(np.concatenate([a, pad]))
    padded = dataclasses.replace(ctx, **rep)
    draws = _draws(layout, n=10, seed=2)
    a = information_criteria(draws, ctx, layout, ndraws=10, chunk=97)
    b = information_criteria(draws, padded, layout, ndraws=10, chunk=97)
    for kname in ("elpd_waic", "elpd_loo", "p_waic", "lppd",
                  "count_lppd", "elpd_waic_total"):
        assert a[kname] == b[kname], kname
    assert a["n_sources"] == b["n_sources"]


def test_count_term_is_poisson_loglik(cat_ctx):
    """count_lppd at a single draw equals ln Poisson(N; Lam) exactly."""
    cfg, cat = cat_ctx
    ctx = _ctx_for(cfg, cat)
    layout = ThetaLayout.from_config(cfg)
    th = _draws(layout, n=2, seed=3)
    ic = information_criteria(th[:1], ctx, layout, ndraws=1)
    from lumfuncmcmc_tpu.models.likelihood import (
        lnlike_single_epoch_parts)
    _, lam = lnlike_single_epoch_parts(jnp.asarray(th[0]), ctx, layout)
    lam = float(lam)
    n = ic["n_sources"]
    expect = n * math.log(lam) - lam - math.lgamma(n + 1)
    np.testing.assert_allclose(ic["count_lppd"], expect, rtol=1e-12)


# ---------------------------------------------------------------------------
# end to end on a fitted posterior
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fitted(cat_ctx):
    cfg, cat = cat_ctx
    ctx = _ctx_for(cfg, cat)
    layout = ThetaLayout.from_config(cfg)
    lnprob = jax.vmap(make_lnprob(ctx, layout))
    pos0 = sample_init(jax.random.PRNGKey(0), layout, 32)
    _, chain, lnps, _ = run_stretch(lnprob, pos0, jax.random.PRNGKey(1),
                                    400)
    chain = np.asarray(chain)
    burn, _ = burnin_steps(chain, 400)
    samples = chain[burn:].reshape(-1, layout.ndim)
    lnp = np.asarray(lnps)[burn:].reshape(-1)
    # the pipeline feeds IC the lnprobcut-selected posterior
    # (select_samples); stuck cold walkers would otherwise inflate the
    # pointwise variance that p_waic measures
    samples = samples[lnp > lnp.max() - 7.5]
    return ctx, layout, samples


def test_ic_on_fitted_posterior(fitted):
    ctx, layout, samples = fitted
    ic = information_criteria(samples, ctx, layout, ndraws=400, seed=0,
                              chunk=128)
    assert ic["ndraws"] == 400           # subsampling path
    assert np.isfinite(ic["elpd_waic"]) and np.isfinite(ic["elpd_loo"])
    # well-specified 3-parameter model: effective complexity is a few
    assert 0.3 < ic["p_waic"] < 12.0, ic["p_waic"]
    assert ic["p_loo"] > 0.0
    # WAIC and PSIS-LOO estimate the same elpd
    assert abs(ic["elpd_waic"] - ic["elpd_loo"]) < max(
        2.0, 0.02 * abs(ic["elpd_loo"]))
    # direct posterior draws from a clean fit: tails well-behaved
    assert ic["frac_k_gt_07"] < 0.1, ic["k_max"]
    assert ic["se_waic"] > 0 and ic["se_loo"] > 0
    assert ic["max_abs_recon_err"] < 1e-9
    rep = format_ic_report(ic)
    assert "elpd_waic" in rep and "pareto-k" in rep


def test_ic_chunking_invariance(fitted):
    """Chunk size is a memory knob, not a result knob (PSIS sees whole
    columns either way)."""
    ctx, layout, samples = fitted
    a = information_criteria(samples, ctx, layout, ndraws=100, seed=1,
                             chunk=64, theta_batch=16)
    b = information_criteria(samples, ctx, layout, ndraws=100, seed=1,
                             chunk=10_000, theta_batch=100)
    np.testing.assert_allclose(a["elpd_waic"], b["elpd_waic"], rtol=1e-12)
    np.testing.assert_allclose(a["elpd_loo"], b["elpd_loo"], rtol=1e-12)


def test_ic_extra_lnp_column_ignored(fitted):
    ctx, layout, samples = fitted
    with_lnp = np.concatenate(
        [samples, np.full((samples.shape[0], 1), -1.0)], axis=1)
    a = information_criteria(samples, ctx, layout, ndraws=50, seed=2)
    b = information_criteria(with_lnp, ctx, layout, ndraws=50, seed=2)
    assert a["elpd_waic"] == b["elpd_waic"]


# ---------------------------------------------------------------------------
# paired model comparison
# ---------------------------------------------------------------------------

def test_compare_ic_paired_preference():
    """compare_ic prefers the true model with |z| > 2, and the paired
    SE beats the unpaired quadrature combination (the pointwise elpds
    of two models on shared data are correlated through the data)."""
    from lumfuncmcmc_tpu.models.ic import compare_ic

    rng = np.random.default_rng(9)
    N, S = 80, 1500
    y = rng.normal(0.0, 1.0, size=N)
    th_a = rng.normal(0.0, 1.0 / np.sqrt(N), size=S)     # true model
    th_b = rng.normal(0.9, 1.0 / np.sqrt(N), size=S)     # displaced

    def build(th):
        ll = _normal_logpdf(y[None, :], th[:, None], 1.0)
        lppd, p, elpd_w = waic_from_loglik(ll)
        elpd_l, k = loo_from_loglik(ll)
        return {"elpd_waic_i": elpd_w, "elpd_loo_i": elpd_l,
                "pareto_k": k}

    a, b = build(th_a), build(th_b)
    for which in ("loo", "waic"):
        r = compare_ic(a, b, which=which)
        assert r["delta"] > 0 and r["z"] > 2.0, r
        assert r["preferred"] == "a"
        assert r["n_sources"] == N
        # unpaired quadrature combination overstates the uncertainty
        key = f"elpd_{which}_i"
        se_a = np.sqrt(N * np.var(a[key], ddof=1))
        se_b = np.sqrt(N * np.var(b[key], ddof=1))
        assert r["se"] < np.sqrt(se_a ** 2 + se_b ** 2)

    r = compare_ic(b, a)                  # order flips the sign
    assert r["preferred"] == "b" and r["z"] < -2.0

    with pytest.raises(ValueError, match="same catalog"):
        compare_ic(a, {"elpd_loo_i": a["elpd_loo_i"][:-1],
                       "elpd_waic_i": a["elpd_waic_i"][:-1]})


def test_ic_pointwise_arrays_always_present(fitted):
    ctx, layout, samples = fitted
    ic = information_criteria(samples, ctx, layout, ndraws=50, seed=4)
    n = ic["n_sources"]
    for k in ("elpd_waic_i", "elpd_loo_i", "pareto_k"):
        assert ic[k].shape == (n,)
    np.testing.assert_allclose(ic["elpd_waic_i"].sum(),
                               ic["elpd_waic"], rtol=1e-12)
    np.testing.assert_allclose(ic["elpd_loo_i"].sum(),
                               ic["elpd_loo"], rtol=1e-12)


def test_stacking_weights_mixture_oracle():
    """Data from a 50/50 mixture of two predictives: stacking finds
    w ~ (0.5, 0.5) (the optimal mixture), a strictly dominated third
    model gets ~0 weight, and the stacked score beats every single
    model — while pseudo-BMA, by construction, piles weight on one."""
    from lumfuncmcmc_tpu.models.ic import stacking_weights

    rng = np.random.default_rng(21)
    N = 4000
    comp = rng.integers(0, 2, size=N)
    y = rng.normal(np.where(comp, 3.0, -3.0), 1.0)
    lpd = np.column_stack([
        _normal_logpdf(y, -3.0, 1.0),    # model A: left component
        _normal_logpdf(y, 3.0, 1.0),     # model B: right component
        _normal_logpdf(y, 20.0, 1.0),    # model C: nonsense
    ])
    w, info = stacking_weights(lpd)
    assert info["converged"]
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-8)
    assert np.all(w >= -1e-12)
    assert abs(w[0] - 0.5) < 0.05 and abs(w[1] - 0.5) < 0.05, w
    assert w[2] < 1e-3
    assert info["log_score"] > info["log_score_single"].max() + 100
    # pseudo-BMA cannot mix: all its weight lands on one component
    assert info["pseudo_bma"].max() > 0.99


def test_stacking_true_model_takes_all():
    """When one model IS the data-generating predictive, stacking
    gives it ~all the weight."""
    from lumfuncmcmc_tpu.models.ic import stacking_weights

    rng = np.random.default_rng(22)
    y = rng.normal(0.0, 1.0, size=3000)
    lpd = np.column_stack([_normal_logpdf(y, 0.0, 1.0),
                           _normal_logpdf(y, 1.5, 1.0)])
    w, info = stacking_weights(lpd)
    assert w[0] > 0.95, w
