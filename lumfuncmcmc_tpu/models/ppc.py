"""Posterior predictive checks (new capability).

Neither the reference nor the classical 1/V_eff overlay answers "does
the fitted model actually reproduce the observed counts?". The Poisson
point-process model makes this exact: for any luminosity bin B,

    N_pred(B | theta) = sum_f integral_B phi(L|theta) Omega_f dV/dz dz,

a Poisson rate, evaluated here by re-binning the same frozen quadrature
grid the likelihood uses (each grid node carries logL[f,i,j] and weight
w_fixed[f,i,j]; a one-hot segment-sum accumulates nodes into L bins).
Drawing theta from the posterior gives the posterior predictive count
distribution per bin; comparing to the observed histogram yields
bin-wise predictive p-values and a chi^2-style summary.

Fixed-completeness path (Omega frozen); free-completeness thetas are
handled by recomputing Omega per draw like the likelihood does. All
three model families share the binning machinery — only the per-node
rate contribution differs (``_rate_contrib`` dispatches on the layout
class): single-epoch (``ThetaLayout``), z-evolving (``ThetaLayoutZ``,
phi evaluated at each node's redshift via the pivot quadratics), and
hierarchical (``ThetaLayoutH``, field f's grid slab uses that field's
(L*_f, phi*_f); the hyperparameters shape the prior, not the rate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lumfuncmcmc_tpu.models.context import LFContext
from lumfuncmcmc_tpu.models.likelihood_z import ThetaLayoutZ
from lumfuncmcmc_tpu.models.hierarchical import ThetaLayoutH
from lumfuncmcmc_tpu.ops.omega import omega_from_logf
from lumfuncmcmc_tpu.ops.schechter import (
    log_schechter_z, log_true_lum_func)


def _rate_contrib(theta, ctx: LFContext, layout):
    """Per-quadrature-node expected-count contribution (F, nz, nl)."""
    if isinstance(layout, ThetaLayoutZ):
        L1, L2, L3, p1, p2, p3, al = layout.unpack(theta)
        lnphi = log_schechter_z(ctx.logL_grid, ctx.zarr[:, None, :],
                                al, L1, L2, L3, p1, p2, p3,
                                layout.z1, layout.z2, layout.z3)
        return jnp.exp(lnphi) * ctx.w_fixed
    if isinstance(layout, ThetaLayoutH):
        _, _, _, _, sch_al, lstar_f, phistar_f = layout.unpack(theta)
        lnphi = log_true_lum_func(ctx.logL_grid, sch_al,
                                  lstar_f[:, None, None],
                                  phistar_f[:, None, None])
        return jnp.exp(lnphi) * ctx.w_fixed
    lstar, phistar, sch_al, logf50, alpha_c = layout.unpack(theta)
    lnphi = log_true_lum_func(ctx.logL_grid, sch_al, lstar, phistar)
    if layout.fix_comp:
        return jnp.exp(lnphi) * ctx.w_fixed
    om = omega_from_logf(ctx.logf_grid, ctx.omega0_f[:, None, None],
                         logf50[:, None, None], alpha_c,
                         layout.fcmin)
    return jnp.exp(lnphi) * om * ctx.w_open


def predicted_counts(theta, ctx: LFContext, layout, edges):
    """Expected counts per luminosity bin for one theta (jittable)."""
    contrib = _rate_contrib(theta, ctx, layout)
    nbins = edges.shape[0] - 1
    idx = jnp.clip(jnp.searchsorted(edges, ctx.logL_grid, side="right")
                   - 1, 0, nbins - 1)
    inside = ((ctx.logL_grid >= edges[0])
              & (ctx.logL_grid < edges[-1])).astype(contrib.dtype)
    return jnp.zeros(nbins, contrib.dtype).at[idx.ravel()].add(
        (contrib * inside).ravel())


def posterior_predictive_check(samples, ctx: LFContext,
                               layout, nbins: int = 20,
                               ndraws: int = 200, seed: int = 0):
    """Bin-wise posterior predictive check.

    ``samples``: flat posterior array (n, ndim [+ lnp column allowed —
    extra columns are ignored]).

    Returns a dict with bin centers, observed counts, the predictive
    mean/16/84 bands (including Poisson scatter), and two-sided
    predictive p-values per bin.
    """
    rng = np.random.default_rng(seed)
    lum = np.asarray(ctx.lum)
    mask = np.asarray(ctx.src_mask) > 0
    lum = lum[mask]
    edges = np.linspace(lum.min() - 1e-9, lum.max() + 1e-9, nbins + 1)
    observed, _ = np.histogram(lum, bins=edges)

    idx = rng.integers(0, samples.shape[0], ndraws)
    thetas = jnp.asarray(samples[idx, : layout.ndim])
    rates = np.asarray(jax.vmap(
        lambda th: predicted_counts(th, ctx, layout,
                                    jnp.asarray(edges)))(thetas))
    # posterior predictive includes Poisson scatter
    draws = rng.poisson(np.maximum(rates, 0.0))
    lo, med, hi = np.percentile(draws, [16, 50, 84], axis=0)
    # two-sided predictive p-value per bin. NOTE: no continuity
    # correction — both tails include the P(draws == obs) point mass,
    # so for low-count bins the p-values are conservative (err on the
    # side of NOT flagging a discrepancy)
    p_hi = (draws >= observed[None, :]).mean(axis=0)
    p_lo = (draws <= observed[None, :]).mean(axis=0)
    pval = np.minimum(1.0, 2.0 * np.minimum(p_hi, p_lo))

    centers = 0.5 * (edges[:-1] + edges[1:])
    return {
        "centers": centers,
        "edges": edges,
        "observed": observed,
        "rate_mean": rates.mean(axis=0),
        "pred_p16": lo, "pred_p50": med, "pred_p84": hi,
        "pvalue": pval,
        "total_observed": int(observed.sum()),
        "total_predicted": float(rates.sum(axis=1).mean()),
    }


def plot_ppc(ppc: dict, outname: str):
    """Observed counts vs the posterior predictive band."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax, axp) = plt.subplots(
        2, 1, sharex=True, figsize=(7, 6),
        gridspec_kw={"height_ratios": [3, 1]})
    ax.fill_between(ppc["centers"], ppc["pred_p16"], ppc["pred_p84"],
                    alpha=0.3, color="C0",
                    label="posterior predictive 68%")
    ax.plot(ppc["centers"], ppc["pred_p50"], color="C0", lw=1)
    ax.plot(ppc["centers"], ppc["observed"], "k.", label="observed")
    ax.set_yscale("log")
    ax.set_ylabel("counts per bin")
    ax.legend(loc="best")
    ax.set_title(f"N_obs={ppc['total_observed']}  "
                 f"E[N_pred]={ppc['total_predicted']:.1f}")
    axp.plot(ppc["centers"], ppc["pvalue"], "k.-", lw=0.8)
    axp.axhline(0.05, color="r", ls=":", lw=0.8)
    axp.set_ylim(0, 1.05)
    axp.set_xlabel(r"$\log$ L (erg s$^{-1}$)")
    axp.set_ylabel("pred. p-value")
    fig.savefig(outname, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return outname
