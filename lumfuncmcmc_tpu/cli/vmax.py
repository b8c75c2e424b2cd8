"""The standalone 1/V_eff pipeline subcommand (``combineStepsLog`` /
``zEvolSteps``, ``VmaxLumFunc.py:581-689``), plus the
min-completeness-fraction parameter-space scan the reference keeps in
its commented-out driver (``VmaxLumFunc.py:799-815``)."""

from __future__ import annotations

import os

import numpy as np

from lumfuncmcmc_tpu.cli.common import (
    _apply_precision, _build_cfg, _load_inputs)


def _veff_cut_and_weights(cfg, flux, z, flim, omega0, mcf):
    """Shared V_eff front half: completeness cut at ``mcf``, cosmology
    table, log-luminosities, per-source 1/V_eff weights. Used by the
    per-z-bin pipeline and the mcf scan so the cut/root/weight semantics
    cannot diverge."""
    import jax
    import jax.numpy as jnp
    from lumfuncmcmc_tpu.cosmology import build_cosmo_table
    from lumfuncmcmc_tpu.models.veff import veff_weights
    from lumfuncmcmc_tpu.ops.completeness import fleming_root_logf_np
    from lumfuncmcmc_tpu.ops.omega import LOG10_4PI

    if mcf > 1.0e-6:
        root = float(10.0 ** fleming_root_logf_np(
            np.log10(flim), cfg.alpha, float(mcf), cfg.fcmin))
    else:
        root = 0.0  # reference get_min_flux: mcf ~ 0 means no cut
    keep = flux > root
    fz, zz = flux[keep], z[keep]
    if len(fz) == 0:
        return None
    zmin, zmax = float(zz.min()), float(zz.max())
    cosmo = build_cosmo_table(
        1.05 * zmax + 0.1,
        dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    logf = jnp.asarray(np.log10(fz))
    lum = logf + LOG10_4PI + 2.0 * cosmo.log10_dl_cm_at(jnp.asarray(zz))
    log_root = np.log10(root) if root > 0 else -np.inf
    w = veff_weights(logf, lum, jnp.full(len(fz), np.log10(flim)),
                     jnp.full(len(fz), log_root), omega0,
                     zmin, zmax, cfg.alpha, cosmo, cfg.fcmin, float(mcf))
    return dict(flux=fz, z=zz, zmin=zmin, zmax=zmax, cosmo=cosmo,
                logf=logf, lum=lum, log_root=log_root, w=w, root=root)


def _vmax_mcf_scan(args, cfg, flux, z, flim, omega0):
    """Min-completeness-fraction parameter-space scan.

    Reproduces the reference's commented-out ``VmaxLumFunc.main`` driver
    (``VmaxLumFunc.py:799-815``): re-run the log V_eff pipeline + LM
    Schechter fit at each mcf in the scan, then scatter (alpha, L*)
    colored by mcf (``plotParamSpace``, ``VmaxLumFunc.py:691-699``).
    Writes the scatter png plus a .dat table of the scanned fits.
    """
    import jax
    from lumfuncmcmc_tpu.models.schfit import fit_schechter
    from lumfuncmcmc_tpu.models.veff import (
        binned_lf_bootstrap, log_bin_edges)
    from lumfuncmcmc_tpu.utils.io import write_fixed_width_two_line
    from lumfuncmcmc_tpu.utils.plotting import plot_param_space

    try:
        lo_s, hi_s, n_s = args.mcf_scan.split(",")
        lo_v, hi_v, n = float(lo_s), float(hi_s), int(n_s)
    except ValueError:
        raise SystemExit("--mcf-scan expects 'lo,hi,n' (e.g. 0.1,0.9,9)")

    mcfs, als, lss = [], [], []
    for mcf in np.linspace(lo_v, hi_v, n):
        cw = _veff_cut_and_weights(cfg, flux, z, flim, omega0,
                                   float(mcf))
        if cw is None or len(cw["flux"]) < cfg.nbins + 2:
            nkeep = 0 if cw is None else len(cw["flux"])
            print(f"mcf={mcf:.3f}: only {nkeep} sources survive the "
                  "cut; skipped")
            continue
        edges = log_bin_edges(cw["lum"], cfg.nbins)
        lavg, lfbin, var = binned_lf_bootstrap(
            jax.random.PRNGKey(cfg.seed), cw["lum"], cw["w"], edges,
            cfg.nboot, cfg.nbins)
        fit = fit_schechter(np.asarray(lavg), np.asarray(lfbin),
                            np.asarray(var), name=cfg.line_name,
                            log=True, integ=args.integ)
        mcfs.append(float(mcf))
        als.append(fit.params["al"])
        lss.append(fit.params["Lstar"])
        print(f"mcf={mcf:.3f}: N={len(cw['flux'])} "
              f"alpha={fit.params['al']:.3f} "
              f"Lstar={fit.params['Lstar']:.3f}")
    if not mcfs:
        raise SystemExit("mcf scan produced no usable fits")
    fn = plot_param_space(mcfs, als, lss, ln=cfg.line_name,
                          lp=cfg.line_plot_name, img_dir=args.img_dir)
    tab_fn = os.path.join(
        args.img_dir, f"al_ls_mcf_scan_{cfg.line_name}.dat")
    write_fixed_width_two_line(
        tab_fn, {"mcf": mcfs, "alpha": als, "Lstar": lss})
    print("Wrote param-space scan:", fn, "and", tab_fn)
    return 0


def cmd_vmax(args):
    """Standalone V_eff pipeline (``combineStepsLog``,
    ``VmaxLumFunc.py:594-609``; per-z-bin variant ``zEvolSteps``)."""
    import jax
    from lumfuncmcmc_tpu.models.schfit import fit_schechter
    from lumfuncmcmc_tpu.models.veff import (
        binned_lf_bootstrap, log_bin_edges, equal_count_z_bins)
    from lumfuncmcmc_tpu.utils.io import (
        read_ascii_table, write_fixed_width_two_line)
    from lumfuncmcmc_tpu.utils.plotting import plot_schechter
    from lumfuncmcmc_tpu.ops.completeness import fleming_root_logf_np

    cfg = _build_cfg(args)
    _apply_precision(cfg)
    if args.synthetic:
        inputs = _load_inputs(args, cfg)
        flux = np.asarray(inputs["flux"]) * 1e-17
        z = np.asarray(inputs["z"])
    else:
        tab = read_ascii_table(args.filename)
        flux = np.asarray(tab[f"{cfg.line_name}_flux"]) * 1e-17
        z = np.asarray(tab["z"])
    flim = cfg.Flim[0] * 1e-17
    omega0 = float(np.sum(cfg.Omega_0))
    if getattr(args, "mcf_scan", None):
        return _vmax_mcf_scan(args, cfg, flux, z, flim, omega0)
    if cfg.min_comp_frac > 1.0e-6:
        root = float(10.0 ** fleming_root_logf_np(
            np.log10(flim), cfg.alpha, cfg.min_comp_frac, cfg.fcmin))
    else:
        root = 0.0  # reference get_min_flux: mcf ~ 0 means no cut
    keep = flux > root
    flux, z = flux[keep], z[keep]
    if getattr(args, "ppc", False):
        print("WARNING: --ppc needs a posterior; the vmax pipeline "
              "has none — ignored here")
    if getattr(args, "linear", False):
        if not jax.config.jax_enable_x64:
            # the linear pipeline leaves log10 space (10**lum ~ 1e42,
            # Lstar bounds up to 1e45) — float32 overflows to inf
            jax.config.update("jax_enable_x64", True)
            print("Linear binning: enabling float64 (linear "
                  "luminosities overflow float32)")
    print("About to start Veff process for", cfg.line_name)
    print("Length of arrays:", len(flux), len(z))

    zbins = max(getattr(args, "zbins", 1) or 1, 1)
    zbin_idx = (equal_count_z_bins(z, zbins) if zbins > 1
                else np.zeros(len(z), dtype=int))
    img_dir = args.img_dir
    zevol_results = []
    for b in range(zbins):
        sel = zbin_idx == b
        # the mcf cut is already applied globally (bin membership is
        # defined on the cut catalog); the shared helper re-derives the
        # same root, so the per-bin re-cut is a no-op
        cw = _veff_cut_and_weights(cfg, flux[sel], z[sel], flim, omega0,
                                   cfg.min_comp_frac)
        if cw is None or len(cw["flux"]) < cfg.nbins + 2:
            nkeep = 0 if cw is None else len(cw["flux"])
            print(f"z bin {b}: only {nkeep} sources survive the cut "
                  f"(need > nbins+1 = {cfg.nbins + 1}); skipped")
            continue
        zmin, zmax = cw["zmin"], cw["zmax"]
        cosmo, lum, w = cw["cosmo"], cw["lum"], cw["w"]
        log_root = cw["log_root"]
        linear = bool(getattr(args, "linear", False))
        if linear:
            # combineSteps path (VmaxLumFunc.py:581-592): linear
            # luminosities, edges from the min-flux luminosity at zmax,
            # bins hold sum(phi) (no dL division)
            from lumfuncmcmc_tpu.models.veff import linear_bin_edges
            lum_lin = 10.0 ** lum
            edges = linear_bin_edges(lum_lin, log_root, zmax, cosmo,
                                     cfg.nbins)
            lavg, lfbin, var = binned_lf_bootstrap(
                jax.random.PRNGKey(cfg.seed), lum_lin, w, edges,
                cfg.nboot, cfg.nbins, log_bins=False)
        else:
            edges = log_bin_edges(lum, cfg.nbins)
            lavg, lfbin, var = binned_lf_bootstrap(
                jax.random.PRNGKey(cfg.seed), lum, w, edges, cfg.nboot,
                cfg.nbins)
        lavg, lfbin, var = map(np.asarray, (lavg, lfbin, var))
        if getattr(args, "correct_low", False):
            if linear:
                # mult_factor works in log10-luminosity space (as the
                # reference applies it, getBootErrLog only); against
                # linear edges it would silently return factor 1
                raise SystemExit(
                    "--correct-low is a log-binning feature (the "
                    "reference applies it in getBootErrLog only) — "
                    "drop --linear")
            from lumfuncmcmc_tpu.models.veff import (
                apply_partial_bin_correction)
            lfbin, var = apply_partial_bin_correction(
                np.asarray(edges), lfbin, var, log_root, zmin, zmax,
                cosmo)
        print("Finished getting bootstrap-based errors")
        fit = fit_schechter(lavg, lfbin, var, name=cfg.line_name,
                            log=not linear, integ=args.integ)
        print(fit.fit_report())
        name = (args.output_filename or
                f"{cfg.line_name}_Vmax_LF_mcf_"
                f"{int(100 * cfg.min_comp_frac)}_bins_{cfg.nbins}.png")
        if zbins > 1:
            name = f"{name.split('.')[0]}_zbin{b}.png"
        sub = "Lin" if linear else "Log"
        os.makedirs(os.path.join(img_dir, sub), exist_ok=True)
        suffix = "" if linear else "_log"
        write_fixed_width_two_line(
            os.path.join(img_dir, sub,
                         f"{name.split('.')[0]}{suffix}.dat"),
            {"Luminosity": lavg, "BinLF": lfbin,
             "BinLFErr": np.sqrt(var)})
        plot_schechter(lavg, lfbin, var, fit, name, img_dir,
                       log=not linear, integ=args.integ)
        zevol_results.append({"Lavg": lavg, "lfbinorig": lfbin,
                              "var": var, "fit": fit,
                              "zlabel": r"$%.2f < z \leq %.2f$"
                              % (zmin, zmax)})
        print("Finished plotting true luminosity and best-fit "
              "Schechter fit")
    if zbins > 1:
        from lumfuncmcmc_tpu.utils.plotting import plot_z_evolution
        fn = plot_z_evolution(zevol_results,
                              args.output_filename or cfg.line_name,
                              img_dir, log=not getattr(args, "linear",
                                                       False),
                              integ=args.integ)
        print("Wrote z-evolution overlay:", fn)
    return 0
