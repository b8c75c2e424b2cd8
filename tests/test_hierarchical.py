"""Hierarchical multi-field model: consistency + recovery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.hierarchical import (
    ThetaLayoutH, lnlike_h, make_lnprob_h)
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, lnlike_single_epoch)
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import burnin_steps
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut

TRUTH = dict(Lstar=42.5, phistar=-2.6, sch_al=-1.6)


@pytest.fixture(scope="module")
def setup():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=41,
                   quadrature="gauss", **TRUTH)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=2000, seed=6),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    return cfg, ctx


def test_per_field_scalars_sum_to_global(setup):
    cfg, ctx = setup
    np.testing.assert_allclose(float(jnp.sum(ctx.nsrc_f)),
                               float(ctx.nsrc), rtol=1e-12)
    np.testing.assert_allclose(float(jnp.sum(ctx.sum_lum_f)),
                               float(ctx.sum_lum), rtol=1e-12)
    np.testing.assert_allclose(float(jnp.sum(ctx.sum_ln_om_f)),
                               float(ctx.sum_ln_om), rtol=1e-12)


@pytest.mark.quick
def test_reduces_to_single_epoch_when_tied(setup):
    """With all per-field params equal, lnlike_h equals the single-epoch
    lnlike plus the (constant-at-center) hyperprior terms."""
    cfg, ctx = setup
    layout_h = ThetaLayoutH.from_config(cfg)
    layout_s = ThetaLayout.from_config(cfg)
    ls, ps, al = 42.6, -2.8, -1.5
    sig_l, sig_p = 0.3, 0.5
    nf = layout_h.nfields
    th_h = jnp.asarray([ls, sig_l, ps, sig_p, al] + [ls] * nf + [ps] * nf)
    th_s = jnp.asarray([ls, ps, al])
    got = float(lnlike_h(th_h, ctx, layout_h))
    base = float(lnlike_single_epoch(th_s, ctx, layout_s))
    # hyperprior at the center: F * [lnN(0 dev) for L and phi]
    hyper = nf * (-0.5 * np.log(2 * np.pi) - np.log(sig_l)
                  - 0.5 * np.log(2 * np.pi) - np.log(sig_p))
    np.testing.assert_allclose(got, base + hyper, rtol=1e-10)


def test_hierarchical_recovery(setup):
    """Fields drawn from one truth: hyper-mean recovers it and the
    per-field spread stays small."""
    cfg, ctx = setup
    layout = ThetaLayoutH.from_config(cfg)
    lnprob = jax.vmap(make_lnprob_h(ctx, layout))
    rng = np.random.default_rng(0)
    nf = layout.nfields
    nw = 48
    pos0 = np.column_stack(
        [rng.uniform(42.0, 43.0, nw), rng.uniform(0.05, 0.5, nw),
         rng.uniform(-3.5, -2.0, nw), rng.uniform(0.1, 1.0, nw),
         rng.uniform(-1.9, -1.2, nw)]
        + [rng.uniform(42.0, 43.0, nw) for _ in range(nf)]
        + [rng.uniform(-3.5, -2.0, nw) for _ in range(nf)])
    _, chain, lnps, acc = run_stretch(lnprob, jnp.asarray(pos0),
                                      jax.random.PRNGKey(1), 600)
    chain = np.asarray(chain)
    burn, _ = burnin_steps(chain, 600)
    post = chain[burn:].reshape(-1, layout.ndim)
    mu_l = post[:, 0]
    assert abs(np.median(mu_l) - TRUTH["Lstar"]) < 0.4
    # per-field Lstar posteriors all near the truth
    for i in range(nf):
        med = np.median(post[:, 5 + i])
        assert abs(med - TRUTH["Lstar"]) < 0.5, (i, med)
    assert float(np.mean(np.asarray(acc))) / 600 > 0.1


def test_hier_sharded_matches_unsharded(setup):
    """Regression: source-axis mesh must not double-count the per-field
    data term (the hier likelihood has no shardable source axis)."""
    from lumfuncmcmc_tpu.parallel.mesh import make_mesh
    from lumfuncmcmc_tpu.parallel.sharding import make_lnprob_sharded
    cfg, ctx = setup
    layout = ThetaLayoutH.from_config(cfg)
    nf = layout.nfields
    th = jnp.asarray([[42.6, 0.3, -2.8, 0.5, -1.5]
                      + [42.6] * nf + [-2.8] * nf] * 8)
    ref = np.asarray(jax.vmap(make_lnprob_h(ctx, layout))(th))
    mesh = make_mesh(2, 4)
    got = np.asarray(make_lnprob_sharded(ctx, layout, mesh,
                                         model="hier")(th))
    np.testing.assert_allclose(got, ref, rtol=1e-9)
