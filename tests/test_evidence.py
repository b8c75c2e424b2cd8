"""Parallel-tempering evidence: analytic Gaussian oracle + model API."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from lumfuncmcmc_tpu.samplers.tempering import (
    beta_ladder, evidence_from_ladder, run_tempered)


def _gaussian_ladder(mu, sd, half_width, nrungs=12, nwalkers=64,
                     nsteps=400, seed=0):
    """Run the ladder on an unnormalized Gaussian likelihood inside a
    centered box prior; returns the estimator dict."""
    mu = jnp.asarray(mu)
    sd = jnp.asarray(sd)
    d = mu.shape[0]

    def lnprior(th):
        ok = jnp.all(jnp.abs(th) < half_width)
        return jnp.where(ok, 0.0, -jnp.inf)

    def lnlike(th):
        return -0.5 * jnp.sum(((th - mu) / sd) ** 2)

    k_init, k_run = jax.random.split(jax.random.PRNGKey(seed))
    pos0 = jax.random.uniform(k_init, (nrungs, nwalkers, d),
                              minval=-half_width, maxval=half_width,
                              dtype=jnp.float64)
    betas = beta_ladder(nrungs)
    _, lnls, _ = run_tempered(lnprior, lnlike, pos0, betas, k_run,
                              nsteps)
    return evidence_from_ladder(np.asarray(lnls), betas)


def test_gaussian_evidence_matches_analytic():
    """ln Z = ln[(2pi)^{d/2} prod(sd)] - ln V_box for a box that
    contains essentially all the Gaussian mass. Stepping-stone is
    unbiased per factor (tight tolerance); TI carries trapezoid bias
    on a 12-rung ladder (looser), and |SS-TI| is the advertised
    resolution check."""
    sd = np.asarray([1.0, 0.5])
    half = 6.0
    ev = _gaussian_ladder(mu=[0.3, -0.4], sd=sd, half_width=half)
    lnz_true = float(np.log(2 * np.pi * sd.prod())
                     - np.log((2 * half) ** 2))
    assert abs(ev["lnz_ss"] - lnz_true) < 0.15, (ev["lnz_ss"], lnz_true)
    assert abs(ev["lnz_ti"] - lnz_true) < 0.6
    # the delta-method SS error is an honest band on a converged
    # ladder: positive, small, and covering the true value at ~5 sigma
    # (the looser factor absorbs the ESS estimate's own noise)
    assert 0.0 < ev["lnz_ss_err"] < 0.5
    assert abs(ev["lnz_ss"] - lnz_true) < 5.0 * ev["lnz_ss_err"] + 0.05
    # E_beta[lnl] is increasing in beta in expectation
    # (d/dbeta = Var >= 0); adjacent tiny-beta rungs are nearly the
    # same distribution, so only the well-separated top half is
    # required to be strictly monotone in one MC realization
    e = ev["mean_lnl"]
    assert e[-1] > e[0]
    assert np.all(np.diff(e[len(e) // 2:]) > 0)


def test_tune_ladder_equalizes_rejection():
    """tune_ladder (Syed et al. 2021 communication-barrier schedule):
    rungs migrate toward the pairs that REJECT — analytic check on a
    synthetic rejection profile, plus structural invariants (same
    length, endpoints exactly 0/1, strictly increasing, no-op when
    rejection is already uniform)."""
    from lumfuncmcmc_tpu.samplers.tempering import tune_ladder

    betas = np.linspace(0.0, 1.0, 9)
    # all rejection concentrated in the FIRST pair
    swap = np.ones(8)
    swap[0] = 0.0
    out = tune_ladder(betas, swap)
    assert out.shape == betas.shape
    assert out[0] == 0.0 and out[-1] == 1.0
    assert np.all(np.diff(out) > 0)
    # nearly the whole barrier sits in [0, 1/8]: the tuned ladder puts
    # most interior rungs inside the first original panel
    assert np.sum(out[1:-1] < betas[1] + 1e-9) >= 5, out

    # uniform rejection -> the ladder is already optimal (unchanged)
    np.testing.assert_allclose(
        tune_ladder(betas, np.full(8, 0.5)), betas, atol=1e-12)

    # pathological float ties reaching the TOP rung (duplicate betas
    # at 1.0): the tie repair must stay interior and re-pin β_{K-1}
    # to exactly 1.0 — a forward sweep over all indices would push it
    # past 1 and break evidence_from_ladder's β_{K-1} == 1 assumption
    # (ADVICE r4)
    tied = np.array([0.0, 0.25, 1.0, 1.0, 1.0])
    out_t = tune_ladder(tied, np.full(4, 0.9))
    assert out_t[-1] == 1.0
    assert np.all(np.diff(out_t) > 0)


@pytest.mark.quick
def test_barrier_stats_oracle():
    """barrier_stats: Λ is the summed pair rejection and the DEO
    round-trip rate is 1/(2+2Λ) (Syed et al. 2021 Cor. 1) — checked
    against hand-computed values, incl. clipping of out-of-range
    swap fractions."""
    from lumfuncmcmc_tpu.samplers.tempering import barrier_stats

    bs = barrier_stats(np.full(7, 0.75))     # 8 rungs, r = 0.25 each
    assert abs(bs["lambda"] - 7 * 0.25) < 1e-12
    assert abs(bs["roundtrip_rate"] - 1.0 / (2 + 2 * 1.75)) < 1e-12
    # perfect mixing: zero barrier, the 1/2 ceiling
    assert barrier_stats(np.ones(3))["roundtrip_rate"] == 0.5
    # values outside [0, 1] (degenerate short runs) are clipped
    assert barrier_stats([1.5, -0.2])["lambda"] == 1.0


def test_tuned_ladder_improves_swap_uniformity():
    """End-to-end ITERATIVE tuning: start from a deliberately bad
    linear ladder on a sharp Gaussian-in-a-box target, whose real
    communication barrier is concentrated at beta ~ 1e-3 — far inside
    the first linear panel, so one tuning round cannot see it
    (piecewise-linear interpolation resolves nothing below the current
    rung spacing) but successive rounds zoom in geometrically
    (measured: min pair acceptance 0.010 -> 0.302 over 4 rounds).
    After tuning, the worst pair exchanges at a usable rate, the
    across-pair spread shrinks, and the evidence still matches the
    analytic value within its own reported error."""
    from lumfuncmcmc_tpu.samplers.tempering import (
        run_parallel_tempering, tune_ladder)

    sd = np.asarray([0.05, 0.05])   # sharp likelihood: real barrier
    half = 6.0
    mu = jnp.asarray([0.3, -0.4])

    def lnprior(th):
        return jnp.where(jnp.all(jnp.abs(th) < half), 0.0, -jnp.inf)

    def lnlike(th):
        return -0.5 * jnp.sum(((th - jnp.asarray(mu)) / sd) ** 2)

    K, W, S = 12, 64, 400
    keys = jax.random.split(jax.random.PRNGKey(3), 6)
    pos = jax.random.uniform(keys[0], (K, W, 2), minval=-half,
                             maxval=half, dtype=jnp.float64)
    betas = np.linspace(0.0, 1.0, K)   # bad for this target
    sw_first = None
    for t in range(4):
        ch, _, _, sw = run_parallel_tempering(
            lnprior, lnlike, pos, betas, keys[t + 1], S,
            swap_every=10)
        sw = np.asarray(sw)
        if sw_first is None:
            sw_first = sw
        betas = tune_ladder(betas, sw)
        pos = ch[:, -1]
    _, lnl, _, sw_end = run_parallel_tempering(
        lnprior, lnlike, pos, betas, keys[5], S, swap_every=10)
    sw_end = np.asarray(sw_end)
    assert sw_first.min() < 0.05               # the bad-start premise
    assert sw_end.min() > 0.15, (sw_first, sw_end)
    assert sw_end.std() < 0.6 * sw_first.std()
    lnz_true = float(np.log(2 * np.pi * sd.prod())
                     - np.log((2 * half) ** 2))
    ev = evidence_from_ladder(np.asarray(lnl), betas)
    assert abs(ev["lnz_ss"] - lnz_true) < 3.0 * ev["lnz_ss_err"] + 0.3


def test_evidence_prefers_the_true_model():
    """Model-selection sanity: the same data (encoded in the
    likelihood center) gives a larger evidence to the well-specified
    model than to one whose likelihood is displaced — the Bayes-factor
    ordering the capability exists for."""
    ev_good = _gaussian_ladder(mu=[0.0, 0.0], sd=[1.0, 1.0],
                               half_width=5.0, seed=1)
    # "wrong model": likelihood mass pushed against the prior edge
    ev_bad = _gaussian_ladder(mu=[4.5, 4.5], sd=[1.0, 1.0],
                              half_width=5.0, seed=1)
    assert ev_good["lnz_ss"] > ev_bad["lnz_ss"] + 0.5


def test_parallel_tempering_unsticks_multimodal_cold_chain():
    """Replica exchange is load-bearing on multimodal targets: an
    ensemble whose walkers all start in ONE mode of a well-separated
    bimodal posterior cannot reach the other by stretch moves alone
    (proposals interpolate within the occupied mode), while the PT
    ladder hands modes down from the prior-like rungs. The swapless
    ladder is the control. Evidence from the swapped ladder matches
    the analytic value."""
    from lumfuncmcmc_tpu.samplers.tempering import run_parallel_tempering

    half = 8.0
    sd = 0.3

    def lnprior(th):
        return jnp.where(jnp.all(jnp.abs(th) < half), 0.0, -jnp.inf)

    def lnlike(th):
        # normalized equal mixture at +-4: integral over R is 1
        lp1 = -0.5 * ((th[0] + 4.0) / sd) ** 2
        lp2 = -0.5 * ((th[0] - 4.0) / sd) ** 2
        norm = jnp.log(2.0 * sd * jnp.sqrt(2.0 * jnp.pi))
        return jnp.logaddexp(lp1, lp2) - norm

    K, W, S = 10, 32, 600
    # ALL rungs seeded inside the -4 mode
    pos0 = -4.0 + sd * jax.random.normal(jax.random.PRNGKey(0),
                                         (K, W, 1), dtype=jnp.float64)
    betas = beta_ladder(K, power=3.0)

    ch_pt, lnl_pt, _, swap_frac = run_parallel_tempering(
        lnprior, lnlike, pos0, betas, jax.random.PRNGKey(1), S,
        swap_every=10)
    cold_pt = np.asarray(ch_pt)[-1, S // 2:, :, 0]
    frac_pt = float((cold_pt > 0).mean())
    assert 0.2 < frac_pt < 0.8, frac_pt
    assert np.all(np.asarray(swap_frac) > 0.05)

    ch_nc, _, _ = run_tempered(lnprior, lnlike, pos0, betas,
                               jax.random.PRNGKey(1), S)
    cold_nc = np.asarray(ch_nc)[-1, S // 2:, :, 0]
    assert float((cold_nc > 0).mean()) < 0.05

    # evidence: ln Z = ln(1 / V_box) for the normalized likelihood
    ev = evidence_from_ladder(np.asarray(lnl_pt), betas)
    assert abs(ev["lnz_ss"] - (-np.log(2 * half))) < 0.2


def test_model_log_evidence_all_families():
    """log_evidence runs on all three model classes; the hierarchical
    split puts the hyperprior in the prior measure (lnlike_h == data +
    hyper is pinned separately); SS and TI agree to ladder-resolution
    scale on a tiny run."""
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.model import (
        LumFuncModel, LumFuncModelH, LumFuncModelZ)
    from lumfuncmcmc_tpu.utils.synth import (
        apply_completeness_cut, make_catalog)

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=21,
                   nwalkers=16, nsteps=80)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=3),
                                 cfg)
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])
    for cls in (LumFuncModel, LumFuncModelZ, LumFuncModelH):
        m = cls(cfg, **kw)
        ev = m.log_evidence(nrungs=8, nsteps=60)
        assert np.isfinite(ev["lnz_ss"]) and np.isfinite(ev["lnz_ti"])
        assert m.evidence is ev
        # the prior rung's astronomical lnl range makes coarse-ladder
        # TI badly biased for these posteriors (stepping-stone is the
        # primary estimator for exactly this reason) — but the TI
        # error bar must OWN that bias: the SS-TI gap stays within a
        # few sigma of the reported quadrature error
        assert (abs(ev["lnz_ss"] - ev["lnz_ti"])
                < max(20.0, 5.0 * ev["lnz_ti_err"]))
        # SS itself stays at posterior scale, not prior-rung scale
        assert -1e5 < ev["lnz_ss"] < 0


def test_hierarchical_split_sums_to_lnlike():
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.context import build_context
    from lumfuncmcmc_tpu.models.hierarchical import (
        ThetaLayoutH, lnlike_h, lnlike_h_split)
    from lumfuncmcmc_tpu.utils.synth import (
        apply_completeness_cut, make_catalog)

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=21)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=150, seed=5),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"],
                           field_id=cat["field_id"])
    layout = ThetaLayoutH.from_config(cfg)
    th = jnp.asarray(0.5 * (np.asarray(layout.lo)
                            + np.asarray(layout.hi)))
    data, hyper = lnlike_h_split(th, ctx, layout)
    np.testing.assert_allclose(float(data + hyper),
                               float(lnlike_h(th, ctx, layout)),
                               rtol=1e-12)
