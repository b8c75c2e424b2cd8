"""Host-side matplotlib visualization.

Replaces the reference's plotting layer (C13 in SURVEY.md §2):
``triangle_plot`` + ``add_LumFunc_plot`` + ``add_subplots``
(``lumfuncmcmc.py:569-651``), the z-variant pcolormesh inset
(``lumfuncmcmc_z.py:517-593``), ``plotSchechter``
(``VmaxLumFunc.py:513-579``) and ``plotParamSpace``
(``VmaxLumFunc.py:691-699``). The ``corner`` package is not a dependency;
:func:`corner_plot` is a self-contained triangle-plot implementation with
the same conventions (30 bins, 16/50/84% quantile titles, 95-percentile
ranges). Styling approximates the reference's seaborn ticks-in look
without requiring seaborn at runtime.
"""

from __future__ import annotations

import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from lumfuncmcmc_tpu.ops.omega import LOG10_4PI as _LOG10_4PI  # noqa: E402

plt.rcParams.update({
    "xtick.direction": "in", "ytick.direction": "in",
    "xtick.top": True, "ytick.right": True,
})


def _quantile_title(x, label):
    q16, q50, q84 = np.percentile(x, [16, 50, 84])
    return (f"{label} = ${q50:.2f}_{{-{q50 - q16:.2f}}}"
            f"^{{+{q84 - q50:.2f}}}$")


def corner_plot(samples, labels, bins=30, range_frac=0.95, fig=None):
    """Minimal triangle plot: histograms on the diagonal (with
    16/50/84% titles and quantile lines), 2-D histograms + contours
    below the diagonal."""
    samples = np.asarray(samples)
    ndim = samples.shape[1]
    lo = np.percentile(samples, 100 * (1 - range_frac) / 2, axis=0)
    hi = np.percentile(samples, 100 * (1 + range_frac) / 2, axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    lo, hi = lo - 0.02 * span, hi + 0.02 * span

    size = max(2.0 * ndim, 6.0)
    if fig is None:
        fig = plt.figure(figsize=(size, size))
    axes = fig.subplots(ndim, ndim, squeeze=False)
    fs = 11 + int(round(0.75 * ndim))
    for i in range(ndim):
        for j in range(ndim):
            ax = axes[i][j]
            if j > i:
                ax.set_visible(False)
                continue
            if i == j:
                ax.hist(samples[:, i], bins=bins, range=(lo[i], hi[i]),
                        histtype="step", color="k")
                for q in np.percentile(samples[:, i], [16, 50, 84]):
                    ax.axvline(q, color="k", ls="dashed", lw=0.8)
                ax.set_title(_quantile_title(samples[:, i], labels[i]),
                             fontsize=fs - 2)
                ax.set_yticks([])
            else:
                h, xe, ye = np.histogram2d(
                    samples[:, j], samples[:, i], bins=bins,
                    range=[(lo[j], hi[j]), (lo[i], hi[i])])
                ax.pcolormesh(xe, ye, h.T, cmap="Greys", rasterized=True)
                hs = np.sort(h.ravel())[::-1]
                cdf = np.cumsum(hs) / max(hs.sum(), 1)
                levels = sorted({float(hs[np.searchsorted(cdf, f)])
                                 for f in (0.39, 0.86)
                                 if np.searchsorted(cdf, f) < hs.size})
                if levels:
                    xc = 0.5 * (xe[:-1] + xe[1:])
                    yc = 0.5 * (ye[:-1] + ye[1:])
                    try:
                        ax.contour(xc, yc, h.T, levels=levels,
                                   colors="k", linewidths=0.8)
                    except ValueError:
                        pass  # degenerate histogram (e.g. single cell)
            ax.set_xlim(lo[j], hi[j])
            if i != j:
                ax.set_ylim(lo[i], hi[i])
            if i == ndim - 1:
                ax.set_xlabel(labels[j], fontsize=fs)
                ax.tick_params(labelsize=fs - 4)
                ax.tick_params(axis="x", rotation=45)
            else:
                ax.set_xticklabels([])
            if j == 0 and i != 0:
                ax.set_ylabel(labels[i], fontsize=fs)
                ax.tick_params(labelsize=fs - 4)
            else:
                ax.set_yticklabels([])
    fig.subplots_adjust(hspace=0.06, wspace=0.06)
    return fig


def add_lumfunc_axes(ax):
    """Axis styling of ``add_LumFunc_plot`` (``lumfuncmcmc.py:569-574``)."""
    ax.set_yscale("log")
    ax.set_xlabel(r"$\log$ L (erg s$^{-1}$)")
    ax.set_ylabel(r"$\phi_{\rm{true}}$ (Mpc$^{-3}$ dex$^{-1}$)")
    ax.minorticks_on()


def triangle_plot_single(model, outname, lnprobcut=7.5, imgtype="png",
                         rndsamples=200):
    """Corner plot with the LF inset (``triangle_plot`` + ``add_subplots``,
    ``lumfuncmcmc.py:576-651``)."""
    from lumfuncmcmc_tpu.models.model import select_samples
    import jax.numpy as jnp
    from lumfuncmcmc_tpu.ops.schechter import true_lum_func

    nsamples = select_samples(model.samples, lnprobcut)
    model.log.info("Shape of nsamples (with a lnprobcut applied)")
    model.log.info(str(nsamples.shape))
    names = model.get_param_names()
    fig = corner_plot(nsamples[:, :-1], names)

    ndim = nsamples.shape[1] - 1
    poss = ([0.50 - 0.008 * (ndim - 4), 0.78 - 0.001 * (ndim - 4),
             0.48 + 0.008 * (ndim - 4), 0.19 + 0.001 * (ndim - 4)]
            if ndim >= 4 else [0.67, 0.75, 0.32, 0.23])
    ax1 = fig.add_axes(poss)
    add_lumfunc_axes(ax1)

    lum = model.lum
    indsort = np.argsort(lum)
    # canonical median fit: medianLF / median_flim / median_alpha and
    # the V_eff overlay come from ONE routine so they cannot diverge
    # (this block previously re-derived them with a different RNG seed)
    model.set_median_fit(rndsamples=rndsamples, lnprobcut=lnprobcut)
    med_flim = model.median_flim
    med_alpha = model.median_alpha
    rng = np.random.default_rng(model.cfg.seed + 3)
    idx = rng.integers(0, nsamples.shape[0], rndsamples)
    lstars = []
    for th in nsamples[idx, :-1]:
        lstar, phistar, sch_al, logf50, alpha_c = model.layout.unpack(
            jnp.asarray(th))
        mod = np.asarray(true_lum_func(jnp.asarray(lum), sch_al, lstar,
                                       phistar))
        lstars.append(float(lstar))
        ax1.plot(lum[indsort], mod[indsort], color="r", linestyle="solid",
                 alpha=0.1)
    ax1.plot(lum[indsort], model.medianLF[indsort], color="dimgray",
             linestyle="solid")

    # axis limits from the completeness floor (lumfuncmcmc.py:598-602)
    from lumfuncmcmc_tpu.ops.completeness import fleming_root_logf_np
    logF50 = np.log10(med_flim) - 17.0
    if model.cfg.min_comp_frac > 0.001:
        roots = fleming_root_logf_np(logF50, med_alpha,
                                     model.cfg.min_comp_frac,
                                     model.cfg.fcmin)
    else:
        roots = logF50 - 2.0
    zmin_dl = float(model.ctx.cosmo.log10_dl_cm_at(model.zmin))
    xmin = float(np.max(roots)) + _LOG10_4PI + 2.0 * zmin_dl
    xmax = min(lum.max(), np.median(lstars) + 1.0)
    ax1.set_xlim(left=xmin, right=xmax)
    cond = (lum >= xmin) & (lum <= xmax)
    if cond.any():
        ax1.set_ylim(bottom=np.percentile(model.medianLF[cond], 0),
                     top=np.percentile(model.medianLF[cond], 100))
    fig.savefig(f"{outname}.{imgtype}", dpi=200)
    plt.close(fig)


def triangle_plot_z(model, outname, lnprobcut=7.5, imgtype="png",
                    zlen=100, Llen=100):
    """z-variant corner plot with the LF(z, L) pcolormesh inset
    (``lumfuncmcmc_z.py:517-593``)."""
    from lumfuncmcmc_tpu.models.model import select_samples

    nsamples = select_samples(model.samples, lnprobcut)
    names = model.get_param_names()
    fig = corner_plot(nsamples[:, :-1], names)

    ndim = nsamples.shape[1] - 1
    poss = ([0.44 - 0.008 * (ndim - 4), 0.78 - 0.001 * (ndim - 4),
             0.48 + 0.008 * (ndim - 4), 0.19 + 0.001 * (ndim - 4)]
            if ndim >= 4 else [0.67, 0.75, 0.32, 0.23])
    ax1 = fig.add_axes(poss)
    add_lumfunc_axes(ax1)

    model.set_median_fit(lnprobcut=lnprobcut, zlen=zlen, Llen=Llen)
    LL, zzout = np.meshgrid(model.Lout, model.zout)
    # reference semantics (lumfuncmcmc_z.py:534): y coordinates are the
    # LF *values* (non-monotonic by construction) colored by redshift —
    # matplotlib warns about the cell-center interpretation; intentional.
    import warnings
    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", message=".*cell centers.*")
        im = ax1.pcolormesh(LL, model.medianLF, zzout, shading="auto",
                            cmap="viridis")
    med = np.percentile(nsamples[:, :3], 50.0, axis=0)
    xmax = min(np.max(med) + 0.5, model.Lout.max())
    cond = model.Lout <= xmax
    ax1.set_ylim(bottom=max(np.percentile(model.medianLF[:, cond], 1),
                            3.1e-5 * model.medianLF.max()))
    ax1.set_xlim(right=xmax)
    fig.colorbar(im, ax=ax1, label="Redshift", fraction=0.05, pad=0.02)
    fig.savefig(f"{outname}.{imgtype}", dpi=200)
    plt.close(fig)


def plot_schechter(Lavg, lfbinorig, var, fit, name, img_dir="ImageFiles",
                   log=False, integ=False):
    """Best-fit Schechter over the binned V_eff LF with a 3-sigma band
    (``plotSchechter``, ``VmaxLumFunc.py:513-579``)."""
    pars = fit.params
    fig, ax = plt.subplots()
    if not log:
        ax.set_xscale("log")
    ax.set_yscale("log")
    best = fit.best_fit(Lavg)
    if not log:
        dL = Lavg[1] - Lavg[0]
        ratio = pars["Lstar"] / dL
        amp = pars["integ" if integ else "phistar"] * ratio
        label = (r"Fit: $\alpha=%.3f$, amp$=%.1e$, $L_*=%.1e$"
                 % (pars["al"], amp, pars["Lstar"]))
    else:
        ratio = 1.0
        amp = pars["integ" if integ else "phistar"]
        label = (r"Fit: $\alpha=%.3f$, amp$=%.2f$, $\log L_*=%.2f$"
                 % (pars["al"], amp, pars["Lstar"]))
    ax.plot(Lavg, best * ratio, "r-", label=label)
    ax.errorbar(Lavg, lfbinorig * ratio, yerr=np.sqrt(var) * ratio,
                fmt="b^", label="Measured LF")
    try:
        dely = fit.eval_uncertainty(Lavg, sigma=3)
        ax.fill_between(Lavg, ratio * (best - dely), ratio * (best + dely),
                        color="r", alpha=0.2,
                        label=r"$3 \sigma$ Uncertainty Band")
    except Exception:
        pass
    if log:
        ax.set_xlabel(r"$\log$ L (erg s$^{-1}$)")
        ax.set_ylabel(r"$\phi_{\rm{true}}$ (Number Mpc$^{-3}$ dex$^{-1}$)")
    else:
        ax.set_xlabel(r"L (erg s$^{-1}$)")
        ax.set_ylabel(r"$dn/d({\rm{L/L_*}})$ (Number Mpc$^{-3}$)")
    ax.legend(loc="best")
    ax.minorticks_on()
    sub = "Log" if log else "Lin"
    os.makedirs(os.path.join(img_dir, sub), exist_ok=True)
    stem = os.path.splitext(name)[0]
    suffix = ("_log" if log else "") + ("_integ" if integ else "")
    fn = os.path.join(img_dir, sub, f"{stem}{suffix}.png")
    fig.savefig(fn, bbox_inches="tight", dpi=300)
    plt.close(fig)
    return fn


_MARKERS = ["o", "^", "*", "s", "+", "v", "<", ">"]


def plot_z_evolution(results, name, img_dir="ImageFiles", log=True,
                     integ=False):
    """Overlay per-z-bin binned LFs and their Schechter fits on one
    figure (``zEvolSteps``, ``VmaxLumFunc.py:611-689``).

    ``results``: list of dicts with keys Lavg, lfbinorig, var, fit,
    zlabel.
    """
    fig, ax = plt.subplots()
    if not log:
        ax.set_xscale("log")
    ax.set_yscale("log")
    for i, r in enumerate(results):
        pars = r["fit"].params
        best = r["fit"].best_fit(r["Lavg"])
        if log:
            ratio = 1.0
            amp = pars["integ" if integ else "phistar"]
            label = (r"%s: $\alpha=%.2f$, amp$=%.2f$, $\log L_*=%.2f$"
                     % (r["zlabel"], pars["al"], amp, pars["Lstar"]))
        else:
            dL = r["Lavg"][1] - r["Lavg"][0]
            ratio = pars["Lstar"] / dL
            amp = pars["integ" if integ else "phistar"] * ratio
            label = (r"%s: $\alpha=%.2f$, amp$=%.1e$, $L_*=%.1e$"
                     % (r["zlabel"], pars["al"], amp, pars["Lstar"]))
        eb = ax.errorbar(r["Lavg"], r["lfbinorig"] * ratio,
                         yerr=np.sqrt(r["var"]) * ratio,
                         marker=_MARKERS[i % len(_MARKERS)],
                         linestyle="none", label="")
        color = eb.lines[0].get_color()
        ax.plot(r["Lavg"], best * ratio, color=color, label=label)
        try:
            dely = r["fit"].eval_uncertainty(r["Lavg"], sigma=3)
            ax.fill_between(r["Lavg"], ratio * (best - dely),
                            ratio * (best + dely), color=color,
                            alpha=0.2, label="")
        except Exception:
            pass
    if log:
        ax.set_xlabel(r"$\log$ L (erg s$^{-1}$)")
        ax.set_ylabel(r"$\phi_{\rm{true}}$ (Number Mpc$^{-3}$ dex$^{-1}$)")
    else:
        ax.set_xlabel(r"L (erg s$^{-1}$)")
        ax.set_ylabel(r"$dn/d({\rm{L/L_*}})$ (Number Mpc$^{-3}$)")
    ax.legend(loc="best", fontsize="x-small")
    ax.minorticks_on()
    sub = "Log" if log else "Lin"
    os.makedirs(os.path.join(img_dir, sub), exist_ok=True)
    stem = os.path.splitext(name)[0]
    suffix = ("_log" if log else "") + ("_integ" if integ else "")
    fn = os.path.join(img_dir, sub, f"{stem}_zevol{suffix}.png")
    fig.savefig(fn, bbox_inches="tight", dpi=300)
    plt.close(fig)
    return fn


def plot_param_space(mcf, al, ls, mcfmc=None, almc=None, lsmc=None,
                     ln="OIII", lp=r"[OIII] $\lambda 5007$",
                     img_dir="ImageFiles", extratext=""):
    """Scatter of (alpha, L*) colored by min completeness fraction
    (``plotParamSpace``, ``VmaxLumFunc.py:691-699``)."""
    fig = plt.figure()
    # one shared normalization: independent autoscaling would map the
    # same completeness fraction to different colors in the two sets
    allc = (np.concatenate([np.asarray(mcf), np.asarray(mcfmc)])
            if mcfmc is not None else np.asarray(mcf))
    vmin, vmax = float(np.min(allc)), float(np.max(allc))
    sc = plt.scatter(al, ls, c=mcf, s=12, cmap="viridis",
                     vmin=vmin, vmax=vmax)
    if almc is not None:
        sc = plt.scatter(almc, lsmc, c=mcfmc, s=40, marker="*",
                         cmap="viridis", vmin=vmin, vmax=vmax)
    plt.xlabel(r"%s $\alpha$" % lp)
    plt.ylabel(r"%s $\mathcal{L}_*$" % lp)
    plt.colorbar(sc, label="Min Completeness Fraction")
    os.makedirs(img_dir, exist_ok=True)
    fn = os.path.join(img_dir, f"al_ls_mcf_space_mcmc_{ln}{extratext}.png")
    plt.savefig(fn, bbox_inches="tight", dpi=300)
    plt.close(fig)
    return fn
