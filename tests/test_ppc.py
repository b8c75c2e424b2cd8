"""Posterior predictive check: self-consistency on well-specified data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, sample_init)
from lumfuncmcmc_tpu.models.ppc import (
    predicted_counts, posterior_predictive_check, plot_ppc)
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import burnin_steps
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut


@pytest.fixture(scope="module")
def fitted():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, quadrature="gauss",
                   Lstar=42.5, phistar=-2.6, sch_al=-1.6, nwalkers=48)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=1500, seed=12),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)
    lnprob = jax.vmap(make_lnprob(ctx, layout))
    pos0 = sample_init(jax.random.PRNGKey(0), layout, 48)
    _, chain, lnps, _ = run_stretch(lnprob, pos0, jax.random.PRNGKey(1),
                                    500)
    chain = np.asarray(chain)
    burn, _ = burnin_steps(chain, 500)
    samples = chain[burn:].reshape(-1, layout.ndim)
    return cfg, ctx, layout, samples, cat


def test_predicted_total_matches_truth_rate(fitted):
    """At the true theta, the predicted total must equal the Poisson
    intensity that generated the catalog (~N observed +- sqrt(N))."""
    cfg, ctx, layout, samples, cat = fitted
    th_true = jnp.asarray([cfg.Lstar, cat["theta_true"]["phistar"],
                           cfg.sch_al])
    lum = np.asarray(ctx.lum)
    edges = jnp.asarray(np.linspace(lum.min() - 1e-9, lum.max() + 1e-9,
                                    21))
    total_pred = float(jnp.sum(predicted_counts(th_true, ctx, layout,
                                                edges)))
    n_obs = lum.shape[0]
    assert abs(total_pred - n_obs) < 5.0 * np.sqrt(n_obs), (
        total_pred, n_obs)


def test_predicted_counts_family_parity(fitted):
    """The z-evolving rate kernel at constant pivots and the
    hierarchical kernel with identical per-field parameters both
    collapse to the single-epoch fixed-completeness rate — the same
    degeneracy the likelihoods satisfy, so any divergence is a PPC
    dispatch bug, not a modeling difference."""
    from lumfuncmcmc_tpu.models.hierarchical import ThetaLayoutH
    from lumfuncmcmc_tpu.models.likelihood_z import ThetaLayoutZ

    cfg, ctx, layout, samples, cat = fitted
    lum = np.asarray(ctx.lum)
    edges = jnp.asarray(np.linspace(lum.min() - 1e-9, lum.max() + 1e-9,
                                    13))
    p = float(cat["theta_true"]["phistar"])
    base = np.asarray(predicted_counts(
        jnp.asarray([cfg.Lstar, p, cfg.sch_al]), ctx, layout, edges))
    assert base.sum() > 0

    lz = ThetaLayoutZ.from_config(cfg)
    th_z = [cfg.Lstar] * 3 + [p] * 3
    if not lz.fix_sch_al:
        th_z.append(cfg.sch_al)
    cz = np.asarray(predicted_counts(jnp.asarray(th_z), ctx, lz, edges))
    np.testing.assert_allclose(cz, base, rtol=1e-8)

    lh = ThetaLayoutH.from_config(cfg)
    th_h = [cfg.Lstar, 0.3, p, 0.3]
    if not lh.fix_sch_al:
        th_h.append(cfg.sch_al)
    th_h += [cfg.Lstar] * lh.nfields + [p] * lh.nfields
    ch = np.asarray(predicted_counts(jnp.asarray(th_h), ctx, lh, edges))
    np.testing.assert_allclose(ch, base, rtol=1e-10)


def test_ppc_on_well_specified_model(fitted, tmp_path):
    cfg, ctx, layout, samples, cat = fitted
    ppc = posterior_predictive_check(samples, ctx, layout, nbins=15,
                                     ndraws=150)
    # totals consistent
    assert abs(ppc["total_predicted"] - ppc["total_observed"]) \
        < 5.0 * np.sqrt(ppc["total_observed"])
    # a well-specified model should not fail many bins at p<0.05
    assert (ppc["pvalue"] < 0.05).sum() <= 3
    # plot renders
    out = plot_ppc(ppc, str(tmp_path / "ppc.png"))
    import os
    assert os.path.getsize(out) > 10_000
