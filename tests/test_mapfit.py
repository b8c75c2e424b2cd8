"""MAP + Laplace approximation: analytic Gaussian oracle, model
truth-recovery, and the Laplace-vs-tempering ln Z cross-check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.mapfit import laplace_fit
from lumfuncmcmc_tpu.utils.synth import apply_completeness_cut, make_catalog


@pytest.mark.quick
def test_laplace_gaussian_oracle():
    """On an exactly Gaussian lnpost the Laplace 'approximation' is
    exact: MAP = mean, cov = Sigma, and ln_int = the true log normal
    integral (0 for a normalized density)."""
    mu = jnp.asarray([0.7, -0.3, 1.2])
    sd = jnp.asarray([0.5, 1.5, 0.2])
    rho = 0.6
    C = jnp.diag(sd ** 2).at[0, 1].set(rho * sd[0] * sd[1]).at[1, 0].set(
        rho * sd[0] * sd[1])
    Cinv = jnp.linalg.inv(C)
    lognorm = 0.5 * (3 * np.log(2 * np.pi)
                     + float(jnp.linalg.slogdet(C)[1]))

    def lnpost(th):
        d = th - mu
        return -0.5 * d @ Cinv @ d - lognorm

    lo = jnp.full(3, -8.0)
    hi = jnp.full(3, 8.0)
    res = laplace_fit(lnpost, lo, hi, key=jax.random.PRNGKey(1))
    assert res["hess_ok"] and res["converged"]
    np.testing.assert_allclose(res["theta"], np.asarray(mu), atol=2e-5)
    np.testing.assert_allclose(res["cov"], np.asarray(C), rtol=1e-3,
                               atol=1e-6)
    assert abs(res["ln_int"]) < 1e-5
    assert res["grad_norm"] < 1e-3


def test_laplace_boundary_mode_profiled():
    """A posterior monotone in one direction pins the MAP at the prior
    box edge: that axis is flagged ``boundary``, profiled OUT of the
    covariance (interior errors stay honest, pinned one is NaN), and
    ln_int integrates the ACTUAL pinned-axis slice numerically —
    here a slice that GROWS toward the edge (e^{t^2}), whose exact
    factorized mass is sqrt(pi) * int_-3^3 e^{u^2} du (scipy.quad
    oracle); a Gaussian or linearized-tail edge model would be nats
    off."""
    import math
    from scipy.integrate import quad

    def lnpost(th):
        return -th[0] ** 2 + th[1] ** 2   # unbounded above in th[1]

    lo = jnp.asarray([-3.0, -3.0])
    hi = jnp.asarray([3.0, 3.0])
    res = laplace_fit(lnpost, lo, hi, key=jax.random.PRNGKey(2))
    assert res["boundary"][1] and not res["boundary"][0]
    assert res["hess_ok"]
    # interior block: curvature 2 -> sd = 1/sqrt(2)
    np.testing.assert_allclose(res["se"][0], 1 / np.sqrt(2.0),
                               rtol=1e-3)
    assert np.isnan(res["se"][1])
    assert abs(abs(res["theta"][1]) - 3.0) < 1e-3
    grow, _ = quad(lambda u: math.exp(u * u), -3.0, 3.0)
    exact = 0.5 * math.log(math.pi) + math.log(grow)
    # the interior axis contributes its exact Gaussian (the Laplace
    # expansion is exact for -t0^2); the slice quadrature carries the
    # f32-mode slight edge offset, hence the loose 1e-2 band
    np.testing.assert_allclose(res["ln_int"], exact, atol=2e-2)


@pytest.fixture(scope="module")
def fitted_map():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, quadrature="gauss",
                   Lstar=42.5, phistar=-2.6, sch_al=-1.6, nwalkers=16,
                   nsteps=400, seed=3)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=1200, seed=5),
                                 cfg)
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    m = LumFuncModel(cfg, z=cat["z"], flux=cat["flux"],
                     flux_e=cat["flux_e"], field_id=cat["field_id"])
    return m, cat


def test_map_recovers_truth(fitted_map):
    m, cat = fitted_map
    res = m.fit_map()
    assert res["hess_ok"] and res["converged"]
    truth = np.asarray([m.cfg.Lstar, cat["theta_true"]["phistar"],
                        m.cfg.sch_al])
    pull = np.abs(res["theta"] - truth) / res["se"]
    # the MAP of a well-specified 1200-source fit sits within a few
    # Laplace sigmas of the generating parameters
    assert np.all(pull < 4.0), (res["theta"], truth, res["se"])
    assert np.all(res["se"] > 0)
    assert res["grad_norm"] < 1e-2 * abs(res["lnpost"])
    assert res["lnz_laplace"] is not None


def test_laplace_lnz_cross_checks_tempering(fitted_map):
    """The two independent evidence estimators (Gaussian expansion vs
    the tempered ladder) must agree on a posterior this data-dominated.
    The tolerance is set by the ladder's own MC scatter (measured
    0.1-0.4 nats at this size, vs a stable Laplace number); the bug
    class this catches is a normalization-convention mismatch — e.g. a
    dropped prior volume would shift lnz_laplace by ln V ~ 5 nats on a
    |ln Z| ~ 2e4 scale."""
    m, _ = fitted_map
    res = m.fit_map()
    ev = m.log_evidence(nrungs=12, nsteps=400)
    assert abs(res["lnz_laplace"] - ev["lnz_ss"]) < 1.0, (
        res["lnz_laplace"], ev["lnz_ss"])


def test_boundary_lnint_matches_analytic_edge_mass():
    """Boundary-mode ln_int: a posterior monotone along one axis pins
    the MAP at the box edge; the edge-slice quadrature must recover
    the EXACT one-sided mass. Oracle: lnpost = -3 t0 - t1^2/2 on
    [0,1]x[-5,5] has mode (0, 0) and
    ln_int = ln[(1-e^-3)/3] + ln sqrt(2 pi) in closed form."""
    import math
    from lumfuncmcmc_tpu.models.mapfit import laplace_fit
    lnp = lambda th: -3.0 * th[0] - 0.5 * th[1] ** 2  # noqa: E731
    res = laplace_fit(lnp, jnp.asarray([0.0, -5.0]),
                      jnp.asarray([1.0, 5.0]),
                      key=jax.random.PRNGKey(1))
    assert res["boundary"].tolist() == [True, False]
    exact = (math.log((1.0 - math.exp(-3.0)) / 3.0)
             + 0.5 * math.log(2.0 * math.pi))
    assert abs(res["ln_int"] - exact) < 1e-3, (res["ln_int"], exact)


def test_hier_prior_lnz0_vs_dblquad_oracle():
    """The hierarchical prior normalization (box-truncated Gaussian
    hyperprior mass): the split-panel GL integral must match an
    independent scipy.integrate.dblquad transcription at ~1e-9, and
    lnz0_prior must compose the two blocks + the sch_al width."""
    import math
    from scipy.integrate import dblquad
    from lumfuncmcmc_tpu.models.hierarchical import (
        ThetaLayoutH, _box_mass_integral, lnz0_prior)

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True)
    layout = ThetaLayoutH.from_config(cfg)
    lo = np.asarray(layout.lo)
    hi = np.asarray(layout.hi)
    F = layout.nfields
    kf = 4 + (0 if layout.fix_sch_al else 1)

    def g_pow(mu, sig, a, b):
        G = 0.5 * (math.erf((b - mu) / (sig * math.sqrt(2.0)))
                   - math.erf((a - mu) / (sig * math.sqrt(2.0))))
        return G ** F

    parts = []
    for jm, js, jx in ((0, 1, kf), (2, 3, kf + F)):
        got = _box_mass_integral(lo[jm], hi[jm], lo[js], hi[js],
                                 lo[jx], hi[jx], F)
        ref, err = dblquad(
            lambda sig, mu: g_pow(mu, sig, lo[jx], hi[jx]),
            lo[jm], hi[jm], lo[js], hi[js], epsabs=1e-11,
            epsrel=1e-11)
        np.testing.assert_allclose(got, ref, rtol=1e-8)
        parts.append(math.log(got))
    expect = sum(parts) + (0.0 if layout.fix_sch_al
                           else math.log(hi[4] - lo[4]))
    np.testing.assert_allclose(lnz0_prior(layout), expect, rtol=1e-12)


def test_map_hier_laplace_lnz_real_and_convention_tied():
    """fith --map's third evidence estimator: the hierarchical MAP
    pins the funnel sigma axes at their lower bound, the edge-slice
    quadrature still yields a real ln_int, and lnz_laplace subtracts
    the EXACT normalization of the ladder's beta=0 measure
    (lnz0_prior) — the identity is pinned so a convention drift (the
    ~6-nat dropped-Z0 bug class) cannot pass."""
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, quadrature="gauss",
                   nwalkers=16, seed=4)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=400, seed=6),
                                 cfg)
    from lumfuncmcmc_tpu.models.hierarchical import lnz0_prior
    from lumfuncmcmc_tpu.models.model import LumFuncModelH
    m = LumFuncModelH(cfg, z=cat["z"], flux=cat["flux"],
                      flux_e=cat["flux_e"], field_id=cat["field_id"])
    res = m.fit_map()
    assert np.all(np.isfinite(res["theta"]))
    # the funnel: sigma hyper-axes sit at the lower bound
    assert res["boundary"][1] and res["boundary"][3]
    assert res["ln_int"] is not None and np.isfinite(res["ln_int"])
    assert np.isfinite(res["lnz_laplace"])
    np.testing.assert_allclose(
        res["lnz_laplace"], res["ln_int"] - lnz0_prior(m.layout),
        rtol=1e-12)
    # scale sanity: ln Z sits below the max lnpost and within the
    # posterior's own order of magnitude
    assert res["lnz_laplace"] < res["lnpost"]
    assert abs(res["lnz_laplace"]) < 3.0 * abs(res["lnpost"]) + 100.0


def test_init_map_walker_start(fitted_map):
    """cfg.init_map draws walkers from the 2x-overdispersed Laplace
    ball (inside the box, diverse, centered on the MAP) and the
    resulting posterior matches the uniform-init posterior — the warm
    start changes burn-in, not the target."""
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    m, cat = fitted_map
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])
    cfg2 = m.cfg.replace(init_map=True, nwalkers=32, nsteps=300)
    m2 = LumFuncModel(cfg2, **kw)
    pos = np.asarray(m2._initial_positions(jax.random.PRNGKey(0)))
    lo = np.asarray(m2.layout.lo)
    hi = np.asarray(m2.layout.hi)
    assert np.all((pos > lo) & (pos < hi))
    res = m2.map_fit
    se = res["se"]
    assert np.all(np.abs(pos.mean(axis=0) - res["theta"]) < 2.0 * se)
    sd = pos.std(axis=0)
    assert np.all(sd > 0.5 * se) and np.all(sd < 10.0 * se)

    s_map = m2.fit_model()
    m3 = LumFuncModel(cfg2.replace(init_map=False), **kw)
    s_uni = m3.fit_model()
    med_map = np.median(s_map[:, :3], axis=0)
    med_uni = np.median(s_uni[:, :3], axis=0)
    assert np.all(np.abs(med_map - med_uni) < 0.15), (med_map, med_uni)


def test_init_map_nuts_start(fitted_map):
    """--sampler nuts honors init_map (and skips the center-shrink
    that would drag mode starts off the mode)."""
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    m, cat = fitted_map
    cfg2 = m.cfg.replace(init_map=True, nwalkers=16, nsteps=30)
    m2 = LumFuncModel(cfg2, z=cat["z"], flux=cat["flux"],
                      flux_e=cat["flux_e"], field_id=cat["field_id"])
    s = m2.fit_model_nuts(num_warmup=60, nchains=4)
    assert np.all(np.isfinite(s))
    med = np.median(s[:, :3], axis=0)
    assert np.all(np.abs(med - m2.map_fit["theta"]) < 0.5)


def test_init_map_fallback_keeps_uniform_semantics(fitted_map):
    """When the mode Hessian is unusable, init_map falls back to the
    DEFAULT uniform draws and records _init_from_map=False — the flag
    fit_model_nuts' center-shrink gates on (a raw-corner NUTS start
    from a silent fallback was a caught review finding)."""
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    m, cat = fitted_map
    cfg2 = m.cfg.replace(init_map=True)
    m2 = LumFuncModel(cfg2, z=cat["z"], flux=cat["flux"],
                      flux_e=cat["flux_e"], field_id=cat["field_id"])
    m2.map_fit = {"hess_ok": False}      # poisoned cached Laplace
    key = jax.random.PRNGKey(4)
    pos = np.asarray(m2._initial_positions(key))
    assert m2._init_from_map is False
    np.testing.assert_array_equal(
        pos, np.asarray(m2._default_positions(key)))
