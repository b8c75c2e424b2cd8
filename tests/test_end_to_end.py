"""End-to-end posterior recovery on a synthetic catalog with known truth."""

import numpy as np
import jax
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, sample_init)
from lumfuncmcmc_tpu.models.likelihood_z import ThetaLayoutZ, make_lnprob_z
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import burnin_steps
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut

TRUTH = dict(Lstar=42.5, phistar=-2.6, sch_al=-1.6)


@pytest.fixture(scope="module")
def fit():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=61, **TRUTH)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=1500, seed=1),
                                 cfg)
    data, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                              flux_e=cat["flux_e"],
                              field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)
    lnprob = jax.vmap(make_lnprob(ctx, layout))
    pos0 = sample_init(jax.random.PRNGKey(0), layout, 64)
    _, chain, lnps, acc = run_stretch(lnprob, pos0, jax.random.PRNGKey(1),
                                      500)
    return np.asarray(chain), np.asarray(acc), layout, cat["theta_true"]


def test_posterior_covers_truth(fit):
    chain, acc, layout, truth_eff = fit
    burn, tau = burnin_steps(chain, 500)
    post = chain[burn:].reshape(-1, layout.ndim)
    mean, std = post.mean(axis=0), post.std(axis=0)
    for i, name in enumerate(layout.names):
        true = truth_eff[name]
        assert abs(mean[i] - true) < 3.0 * std[i] + 0.05, (
            f"{name}: posterior {mean[i]:.3f}+-{std[i]:.3f} vs truth {true}")
    # posteriors should actually constrain the parameters
    assert std[0] < 1.0 and std[2] < 0.5


def test_healthy_acceptance(fit):
    chain, acc, layout, _ = fit
    frac = acc.mean() / 500
    assert 0.15 < frac < 0.9


def test_z_model_recovers_nonevolving_truth():
    """Truth recovery for the z model (previously finiteness-only): a
    catalog drawn from a z-CONSTANT Schechter process must yield pivot
    posteriors (L1..L3, phi1..phi3) that each cover the constant truth,
    with the curvature consistent with zero evolution."""
    truth = dict(Lstar=42.5, phistar=-2.6, sch_al=-1.6)
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=41, **truth)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=1200, seed=6),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayoutZ.from_config(cfg)
    lnprob = jax.vmap(make_lnprob_z(ctx, layout))
    rng = np.random.default_rng(7)
    pos0 = np.column_stack([rng.uniform(42.0, 43.0, (48, 3)),
                            rng.uniform(-3.5, -2.0, (48, 3)),
                            rng.uniform(-1.9, -1.2, (48, 1))])
    _, chain, lnps, acc = run_stretch(lnprob, jax.numpy.asarray(pos0),
                                      jax.random.PRNGKey(8), 400)
    chain = np.asarray(chain)
    burn, tau = burnin_steps(chain, 400)
    post = chain[burn:].reshape(-1, layout.ndim)
    mean, std = post.mean(axis=0), post.std(axis=0)
    t_eff = cat["theta_true"]
    targets = [t_eff["Lstar"]] * 3 + [t_eff["phistar"]] * 3 \
        + [t_eff["sch_al"]]
    for i, (name, true) in enumerate(zip(layout.names, targets)):
        assert abs(mean[i] - true) < 3.0 * std[i] + 0.1, (
            f"{name}: posterior {mean[i]:.3f}+-{std[i]:.3f} "
            f"vs constant truth {true}")
    # the mid pivot is the best constrained; it must actually constrain
    assert std[1] < 0.8 and std[4] < 0.8
    # zero-evolution consistency: the L3-L1 slope posterior covers 0
    slope = post[:, 2] - post[:, 0]
    assert abs(slope.mean()) < 3.0 * slope.std() + 0.1


def test_z_model_runs_and_is_finite():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=41)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=400, seed=2),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayoutZ.from_config(cfg)
    lnprob = jax.vmap(make_lnprob_z(ctx, layout))
    rng = np.random.default_rng(3)
    pos0 = np.column_stack([rng.uniform(41.8, 43.5, (32, 3)),
                            rng.uniform(-4, -1.5, (32, 3)),
                            rng.uniform(-2, -0.8, (32, 1))])
    _, chain, lnps, acc = run_stretch(lnprob, jax.numpy.asarray(pos0),
                                      jax.random.PRNGKey(4), 100)
    assert np.all(np.isfinite(np.asarray(lnps)))
    assert acc.sum() > 0
