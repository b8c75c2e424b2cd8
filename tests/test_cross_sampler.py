"""Cross-sampler validation: the stretch ensemble and NUTS must agree on
the same posterior (independent algorithms, shared likelihood) — a
correctness check neither sampler can pass alone."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, lnlike_single_epoch, make_lnprob)
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import burnin_steps
from lumfuncmcmc_tpu.samplers.nuts import make_unconstrained, run_nuts
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut


@pytest.mark.slow
def test_stretch_and_nuts_agree():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=41,
                   quadrature="gauss", Lstar=42.5, phistar=-2.6,
                   sch_al=-1.6)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=1200, seed=2),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)

    # stretch ensemble
    lnprob = jax.vmap(make_lnprob(ctx, layout))
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(np.column_stack(
        [rng.uniform(42.2, 42.9, 64), rng.uniform(-3.2, -2.0, 64),
         rng.uniform(-1.9, -1.2, 64)]))
    _, chain, _, _ = run_stretch(lnprob, pos0, jax.random.PRNGKey(1),
                                 2500)
    chain = np.asarray(chain)
    burn, _ = burnin_steps(chain, 2500)
    post_s = chain[burn:].reshape(-1, 3)

    # NUTS on the same posterior
    lo, hi = layout.bounds_arrays()
    lnp_y, to_theta, to_y = make_unconstrained(
        lambda th: lnlike_single_epoch(th, ctx, layout), lo, hi)
    start = jnp.asarray([[42.5, -2.6, -1.6]] * 8) + \
        0.02 * jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    samples, _, _, _, _ = run_nuts(lnp_y, jax.vmap(to_y)(start),
                                jax.random.PRNGKey(3), num_warmup=400,
                                num_samples=1000, max_doublings=7)
    post_n = np.asarray(jax.vmap(jax.vmap(to_theta))(samples)
                        ).reshape(-1, 3)

    mean_s, mean_n = post_s.mean(axis=0), post_n.mean(axis=0)
    std_s, std_n = post_s.std(axis=0), post_n.std(axis=0)
    # means agree within a fraction of the posterior width
    for i in range(3):
        tol = 0.2 * max(std_s[i], std_n[i])
        assert abs(mean_s[i] - mean_n[i]) < tol, (
            i, mean_s, mean_n, std_s, std_n)
    # widths agree tightly — a ~15% band would have caught (a weakened
    # form of) both historic width-bias bugs: endpoint-only U-turn
    # checking (1.7x) and the leftward sub-u-turn orientation flip
    np.testing.assert_allclose(std_s, std_n, rtol=0.15)

    # the mixed stretch/DE proposal (the better-mixing option,
    # docs/PERFORMANCE.md) targets the same posterior: third
    # independent algorithm, same agreement bands. Processed like the
    # real pipeline: the reference's lnprobcut selection
    # (select_samples) runs before any posterior use — it is the guard
    # against a straggling walker, which box-wide inits can leave
    # behind for thousands of steps (DE steps halve the rate at which
    # stretch moves absorb outliers, so mix chains hit this at ~2x the
    # stretch rate on unlucky seeds)
    from lumfuncmcmc_tpu.models.model import select_samples
    _, chain_m, lnps_m, _ = run_stretch(lnprob, pos0,
                                        jax.random.PRNGKey(4),
                                        2500, move="mix")
    chain_m = np.asarray(chain_m)
    burn_m, _ = burnin_steps(chain_m, 2500)
    flat_m = chain_m[burn_m:].reshape(-1, 3)
    flat_lnp = np.asarray(lnps_m)[burn_m:].reshape(-1, 1)
    post_m = select_samples(np.concatenate([flat_m, flat_lnp], axis=1),
                            drop_lnp=True)
    mean_m, std_m = post_m.mean(axis=0), post_m.std(axis=0)
    for i in range(3):
        tol = 0.2 * max(std_s[i], std_m[i])
        assert abs(mean_m[i] - mean_s[i]) < tol, (
            i, mean_m, mean_s, std_m, std_s)
    np.testing.assert_allclose(std_m, std_s, rtol=0.15)
