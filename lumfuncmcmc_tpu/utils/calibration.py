"""Shared calibration replicates: frequentist coverage + SBC ranks.

One replicate = draw a truth, generate a synthetic catalog from it,
run the full fit (context build + likelihood + sampler + burn-in
rule), and score the posterior against the truth. Two scorers:

- interval coverage (the frequentist check of
  ``examples/coverage_check.py``): does the central 68%/95% posterior
  interval contain the truth? Nominal rates require every layer of the
  stack to be unbiased.
- SBC ranks (Talts et al. 2018, ``examples/sbc_check.py``): with the
  truth drawn FROM the fitting prior, its rank among M thinned
  posterior draws is exactly uniform on {0..M} — any systematic
  posterior bias shows as a non-uniform rank histogram.

The examples drive these at K=40-48 for the VALIDATION.md tables; the
``-m slow`` gates in ``tests/test_calibration.py`` run small-K smokes
of :func:`sbc_replicate` (single-epoch; its truth-from-prior draws
make it a valid coverage replicate too), :func:`coverage_replicate_z`
(redshift-evolving pivots against non-evolving truths), and
:func:`sbc_replicate_h` (hierarchical, truths rejection-drawn from the
exact box-truncated hyperprior) so a regression that skews calibration
in ANY model family fails the suite instead of waiting for a manual
example run.
"""

from __future__ import annotations

import numpy as np
import jax

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, sample_init)
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import burnin_steps
from lumfuncmcmc_tpu.utils.synth import (
    apply_completeness_cut, make_catalog)

PARAMS = ("Lstar", "phistar", "sch_al")

# SBC prior box: the GENERATING prior must equal the FITTING prior
# (a mismatch voids the rank-uniformity theorem), and catalogs keep
# their physical normalization (n_target=None — a rescale would
# silently change the phistar the posterior estimates)
SBC_BOX = {"Lstar_lims": (42.3, 42.7), "phistar_lims": (-2.9, -2.3),
           "sch_al_lims": (-1.8, -1.4)}


def _interval_coverage(post, names, truth):
    """(in68, in95) per parameter name from flat posterior draws."""
    cover = {}
    for i, name in enumerate(names):
        lo68, hi68 = np.percentile(post[:, i], [16, 84])
        lo95, hi95 = np.percentile(post[:, i], [2.5, 97.5])
        cover[name] = (bool(lo68 <= truth[name] <= hi68),
                       bool(lo95 <= truth[name] <= hi95))
    return cover


def sbc_replicate(k, rng, nwalkers=64, nsteps=600, M=7, box=None,
                  size_ln=None):
    """One SBC replicate: truth ~ prior box, physical-normalization
    catalog, full stretch fit, rank of the truth among ``M`` thinned
    posterior draws (distinct walkers, steps >= 2*tau apart, never
    wrapping onto one step — same-step draws from an interacting
    ensemble are strongly correlated and would bias the histogram).

    Returns ``(ranks (ndim,), cover {name: (in68, in95)}, nsrc, tau)``
    — the truth-from-prior draw makes the interval coverage a valid
    frequentist check of the same fit, so one replicate feeds both
    scorers.
    """
    box = dict(SBC_BOX if box is None else box)
    truth = {nm: rng.uniform(*box[nm + "_lims"]) for nm in PARAMS}
    kw = {} if size_ln is None else {"size_ln": int(size_ln)}
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, quadrature="gauss",
                   nwalkers=nwalkers, nsteps=nsteps, seed=k, **box,
                   **truth, **kw)
    cat = apply_completeness_cut(
        make_catalog(cfg, n_target=None, seed=1000 + k,
                     lum_err_dex=0.0), cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"],
                           field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)
    lnprob = jax.vmap(make_lnprob(ctx, layout))
    pos0 = sample_init(jax.random.PRNGKey(2000 + k), layout, nwalkers)
    _, chain, _, _ = run_stretch(lnprob, pos0,
                                 jax.random.PRNGKey(3000 + k), nsteps)
    chain = np.asarray(chain)
    burn, tau = burnin_steps(chain, nsteps)
    post = chain[burn:]

    gap = max(min(int(2 * tau), post.shape[0] // M), 1)
    steps = gap * np.arange(M)
    assert steps[-1] < post.shape[0]
    walkers = rng.choice(chain.shape[1], size=M, replace=False)
    draws = post[steps, walkers]                          # (M, ndim)
    tvec = np.asarray([truth[nm] for nm in PARAMS])
    ranks = (draws < tvec[None, :]).sum(axis=0)           # (ndim,)
    cover = _interval_coverage(post.reshape(-1, layout.ndim),
                               list(layout.names), truth)
    return ranks, cover, len(cat["z"]), tau


def coverage_replicate_z(k, rng, n_target=800, nwalkers=32, nsteps=800,
                         pad=1024, size_ln=41):
    """One frequentist-coverage replicate of the redshift-evolving
    (3-pivot) model: the catalog is drawn from a NON-evolving Schechter
    process, so every L* pivot's truth is the generating Lstar and
    every phi* pivot's the (amplitude-rescaled) phistar — the quadratic
    evolution model must recover flat evolution with nominal interval
    coverage (the small-K gate twin of
    ``examples/coverage_check_z.py``).

    Returns ``({name: (in68, in95)}, names)``.
    """
    from lumfuncmcmc_tpu.models.likelihood_z import (
        ThetaLayoutZ, make_lnprob_z)
    from lumfuncmcmc_tpu.parallel.sharding import pad_sources

    truth = dict(Lstar=rng.uniform(42.2, 42.8),
                 phistar=rng.uniform(-3.2, -2.2),
                 sch_al=rng.uniform(-1.8, -1.2))
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, quadrature="gauss",
                   nwalkers=nwalkers, nsteps=nsteps, seed=k,
                   size_ln=int(size_ln), **truth)
    cat = apply_completeness_cut(
        make_catalog(cfg, n_target=n_target, seed=2000 + k,
                     lum_err_dex=0.0), cfg)
    phistar_eff = cat["theta_true"]["phistar"]
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"],
                           field_id=cat["field_id"])
    ctx = pad_sources(ctx, int(pad))
    layout = ThetaLayoutZ.from_config(cfg)
    lnprob = jax.vmap(make_lnprob_z(ctx, layout))
    lo, hi = layout.bounds_arrays()
    u = jax.random.uniform(jax.random.PRNGKey(2 * k),
                           (nwalkers, layout.ndim), dtype=lo.dtype)
    pos0 = u * (hi - lo) + lo
    _, chain, _, _ = run_stretch(lnprob, pos0,
                                 jax.random.PRNGKey(2 * k + 1), nsteps)
    chain = np.asarray(chain)
    burn, _ = burnin_steps(chain, nsteps)
    post = chain[burn:].reshape(-1, layout.ndim)
    truths = dict(zip(layout.names,
                      [truth["Lstar"]] * 3 + [phistar_eff] * 3
                      + [truth["sch_al"]]))
    return _interval_coverage(post, list(layout.names), truths), \
        list(layout.names)


# hier SBC field/hyper boxes: the field boxes are deliberately the
# same physical-sized box as the single-epoch gate (retune SBC_BOX and
# both gates move together); the sig boxes come from
# ThetaLayoutH.from_config (0.01..2 / 0.01..3)
HIER_BOX = dict(SBC_BOX)


def _draw_hier_truth(rng, layout, block=4096):
    """Exact draw from the hierarchical fitting prior by rejection:
    hypers uniform in their boxes, field params ~ N(mu, sig), accept
    only if every field param lands inside its box. The accepted joint
    density is exactly the box-masked ``uniform(hyper) x prod_f
    N(field | hyper)`` measure ``make_lnprob_h`` samples — an SBC
    truth from any OTHER density voids the rank-uniformity theorem."""
    lo = np.asarray(layout.lo, np.float64)
    hi = np.asarray(layout.hi, np.float64)
    F = layout.nfields
    kf = 4 + (0 if layout.fix_sch_al else 1)
    for _ in range(64):
        mu_l = rng.uniform(lo[0], hi[0], block)
        sig_l = rng.uniform(lo[1], hi[1], block)
        mu_p = rng.uniform(lo[2], hi[2], block)
        sig_p = rng.uniform(lo[3], hi[3], block)
        ls = rng.normal(mu_l[:, None], sig_l[:, None], (block, F))
        ps = rng.normal(mu_p[:, None], sig_p[:, None], (block, F))
        ok = (np.all((ls > lo[kf]) & (ls < hi[kf]), axis=1)
              & np.all((ps > lo[kf + F]) & (ps < hi[kf + F]), axis=1))
        idx = np.flatnonzero(ok)
        if idx.size:
            i = idx[0]
            th = [mu_l[i], sig_l[i], mu_p[i], sig_p[i]]
            if not layout.fix_sch_al:
                th.append(rng.uniform(lo[4], hi[4]))
            return np.asarray(th + list(ls[i]) + list(ps[i]))
    raise RuntimeError("hier prior rejection sampler starved")


def sbc_replicate_h(k, rng, nfields=2, nwalkers=48, nsteps=800, M=7,
                    size_ln=41):
    """One hierarchical-family SBC replicate: truth ~ the exact hier
    prior (rejection draw), one physical-normalization catalog PER
    FIELD from that field's own (Lstar_f, phistar_f), joint fit with
    ``make_lnprob_h``, rank of the truth among ``M`` thinned posterior
    draws plus interval coverage (valid frequentist check because the
    truth came from the fitting prior).

    Returns ``(ranks (ndim,), cover {name: (in68, in95)}, nsrc, tau)``.
    """
    from lumfuncmcmc_tpu.models.hierarchical import (
        ThetaLayoutH, make_lnprob_h)

    from lumfuncmcmc_tpu.config import _DEFAULT_FLIM, _DEFAULT_OMEGA_0
    flim = _DEFAULT_FLIM[:nfields]
    omega = _DEFAULT_OMEGA_0[:nfields]
    box = dict(HIER_BOX)
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, quadrature="gauss",
                   nwalkers=nwalkers, nsteps=nsteps, seed=k,
                   Flim=flim, Omega_0=omega, size_ln=int(size_ln),
                   **box)
    layout = ThetaLayoutH.from_config(cfg)
    theta_true = _draw_hier_truth(rng, layout)
    kf = 4 + (0 if layout.fix_sch_al else 1)
    sch_al = layout.sch_al0 if layout.fix_sch_al else theta_true[4]

    # per-field catalogs from each field's OWN (Lstar_f, phistar_f) —
    # physical normalization (n_target=None): a rescale would shift the
    # phistar_f the posterior estimates off the drawn truth
    zs, fluxes, flux_es, fids = [], [], [], []
    for f in range(nfields):
        cfg_f = LFConfig(min_comp_frac=0.5, fix_comp=True,
                         quadrature="gauss", seed=k,
                         Flim=(flim[f],), Omega_0=(omega[f],),
                         Lstar=float(theta_true[kf + f]),
                         phistar=float(theta_true[kf + nfields + f]),
                         sch_al=float(sch_al))
        cat_f = apply_completeness_cut(
            make_catalog(cfg_f, n_target=None, seed=1000 + 7 * k + f,
                         lum_err_dex=0.0), cfg_f)
        zs.append(cat_f["z"]); fluxes.append(cat_f["flux"])
        flux_es.append(cat_f["flux_e"])
        fids.append(np.full(len(cat_f["z"]), f, dtype=np.int32))
    _, ctx = build_context(cfg, z=np.concatenate(zs),
                           flux=np.concatenate(fluxes),
                           flux_e=np.concatenate(flux_es),
                           field_id=np.concatenate(fids))
    lnprob = jax.vmap(make_lnprob_h(ctx, layout))
    lo, hi = layout.bounds_arrays()
    u = jax.random.uniform(jax.random.PRNGKey(2000 + k),
                           (nwalkers, layout.ndim), dtype=lo.dtype)
    pos0 = u * (hi - lo) + lo
    _, chain, _, _ = run_stretch(lnprob, pos0,
                                 jax.random.PRNGKey(3000 + k), nsteps)
    chain = np.asarray(chain)
    burn, tau = burnin_steps(chain, nsteps)
    post = chain[burn:]

    gap = max(min(int(2 * tau), post.shape[0] // M), 1)
    steps = gap * np.arange(M)
    assert steps[-1] < post.shape[0]
    walkers = rng.choice(chain.shape[1], size=M, replace=False)
    draws = post[steps, walkers]                          # (M, ndim)
    ranks = (draws < theta_true[None, :]).sum(axis=0)     # (ndim,)
    cover = _interval_coverage(post.reshape(-1, layout.ndim),
                               list(layout.names),
                               dict(zip(layout.names, theta_true)))
    return ranks, cover, int(sum(len(z) for z in zs)), tau


def coverage_replicate(k, rng, free=False, pallas=False, move="stretch",
                       init_map=False, n_target=1500, nwalkers=64,
                       nsteps=None, pad=2048):
    """One frequentist-coverage replicate: truth varied per replicate
    (narrower than the fitting box — this is the interval check, not
    SBC), fixed catalog size, full fit through the selected engine
    (XLA or the native Pallas tier), proposal, and init scheme.

    Returns ``{name: (in68, in95)}`` per layout parameter. The source
    axis is padded to ``pad`` so every replicate reuses ONE compiled
    program (shapes are static under jit).
    """
    truth = dict(Lstar=rng.uniform(42.2, 42.8),
                 phistar=rng.uniform(-3.2, -2.2),
                 sch_al=rng.uniform(-1.8, -1.2))
    if nsteps is None:
        nsteps = 1500 if free else 600
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=not free,
                   quadrature="gauss", nwalkers=nwalkers, nsteps=nsteps,
                   seed=k, **truth)
    cat = apply_completeness_cut(
        make_catalog(cfg, n_target=n_target, seed=1000 + k,
                     lum_err_dex=0.0), cfg)
    truth = dict(truth)
    truth["phistar"] = cat["theta_true"]["phistar"]  # amplitude rescale
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"],
                           field_id=cat["field_id"])
    from lumfuncmcmc_tpu.parallel.sharding import pad_sources
    ctx = pad_sources(ctx, int(pad))
    layout = ThetaLayout.from_config(cfg)
    if pallas:
        from lumfuncmcmc_tpu.ops.pallas_lnlike import make_pallas_lnprob
        lnprob = make_pallas_lnprob(ctx, layout,
                                    interpret=jax.default_backend()
                                    != "tpu")
    else:
        lnprob = jax.vmap(make_lnprob(ctx, layout))
    if init_map:
        import jax.numpy as jnp
        from lumfuncmcmc_tpu.models.mapfit import laplace_fit
        lo, hi = layout.bounds_arrays()
        res = laplace_fit(make_lnprob(ctx, layout), lo, hi,
                          key=jax.random.PRNGKey(5 * k + 3), nstarts=4)
        u = sample_init(jax.random.PRNGKey(3 * k + 7), layout, nwalkers)
        if res["hess_ok"] and not np.asarray(res["boundary"]).any():
            # boundary modes leave NaN rows in cov, which cholesky
            # silently propagates — same guard as _map_init_positions
            chol = np.linalg.cholesky(res["cov"])
            z = jax.random.normal(jax.random.PRNGKey(2 * k),
                                  (nwalkers, layout.ndim),
                                  dtype=lo.dtype)
            pos0 = (jnp.asarray(res["theta"], lo.dtype)[None, :]
                    + 2.0 * (z @ jnp.asarray(chol, lo.dtype).T))
            mid = (lo + hi) / 2.0
            pos0 = jnp.where((pos0 > lo) & (pos0 < hi), pos0,
                             0.8 * mid[None, :] + 0.2 * u)
        else:
            pos0 = u
    else:
        pos0 = sample_init(jax.random.PRNGKey(2 * k), layout, nwalkers)
    _, chain, _, _ = run_stretch(lnprob, pos0,
                                 jax.random.PRNGKey(2 * k + 1),
                                 nsteps, move=move)
    chain = np.asarray(chain)
    burn, _ = burnin_steps(chain, nsteps)
    post = chain[burn:].reshape(-1, layout.ndim)
    if free:
        for i in range(len(cfg.Flim)):
            truth[f"Flim_{i}"] = cfg.Flim[i]
        truth["alpha"] = cfg.alpha
    return _interval_coverage(post, list(layout.names), truth)
