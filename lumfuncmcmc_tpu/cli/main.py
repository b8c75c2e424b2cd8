"""CLI drivers.

Subcommands (one binary instead of the reference's two scripts + module
main):

- ``fit``  — single-epoch Schechter fit (``run_lumfuncmcmc.py:230-331``)
- ``fitz`` — redshift-evolving fit (``run_lumfuncmcmc_z.py:203-304``)
- ``vmax`` — standalone V_eff pipeline (``VmaxLumFunc.combineStepsLog`` /
  ``zEvolSteps``, ``VmaxLumFunc.py:581-689``)

Flags carry the reference's names (-f -o -nw -ns -nbins -nboot -mcf -al
-fl -sa -fsa -fc -sr -ln); config precedence is CLI > --config file >
defaults, and — unlike the reference (``run_lumfuncmcmc.py:124``) — a
flag value of 0 is NOT treated as unset. Artifacts (fitposterior,
bestfitLF, VeffLF, parameters table, .args settings dump, triangle plot)
use the reference's filenames and the fixed_width_two_line format, and an
existing fitposterior file triggers the reference's resume-and-replot
behavior (``run_lumfuncmcmc.py:259-270``).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from lumfuncmcmc_tpu.config import LFConfig, load_config_file, merge_config
from lumfuncmcmc_tpu.utils.logging import setup_logging


def _evidence_rungs(s):
    """argparse type for --evidence: fail at parse time, not after the
    whole fit has run (beta_ladder needs >= 3 rungs)."""
    v = int(s)
    if v < 3:
        raise argparse.ArgumentTypeError(
            "--evidence needs at least 3 ladder rungs (beta = 0, "
            "intermediate, 1); omit the flag to skip the evidence run")
    return v


def _add_common_flags(p):
    p.add_argument("-f", "--filename", type=str, default=None,
                   help="File to be read for galaxy data")
    p.add_argument("-o", "--output_filename", type=str, default=None,
                   help="Output filename for given run")
    p.add_argument("-nw", "--nwalkers", type=int, default=None)
    p.add_argument("-ns", "--nsteps", type=int, default=None)
    p.add_argument("-nbins", "--nbins", type=int, default=None)
    p.add_argument("-nboot", "--nboot", type=int, default=None)
    p.add_argument("-mcf", "--min_comp_frac", type=float, default=None)
    p.add_argument("-al", "--alpha", type=float, default=None)
    p.add_argument("-fl", "--Flim", type=float, nargs="+", default=None)
    p.add_argument("-sa", "--sch_al", type=float, default=None)
    p.add_argument("-fsa", "--fix_sch_al", action="store_true",
                   default=None)
    p.add_argument("-ln", "--line_name", type=str, default=None)
    p.add_argument("--config", type=str, default=None,
                   help="JSON or configLF-style python config file")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--sampler", type=str, default=None,
                   choices=["stretch", "nuts"])
    p.add_argument("--move", type=str, default=None,
                   choices=["stretch", "de", "mix"],
                   help="ensemble proposal for --sampler stretch: "
                        "Goodman-Weare stretch (reference semantics), "
                        "differential evolution, or a 50/50 per-step "
                        "mix (better-mixing option for correlated "
                        "posteriors)")
    p.add_argument("--de-prob", dest="de_prob", type=float, default=None,
                   help="--move mix: fraction of DE steps "
                        "(deterministic schedule; default 0.5 = "
                        "emcee-style equal weighting, flagship optimum "
                        "~0.7)")
    p.add_argument("--size-ln", dest="size_ln", type=int, default=None)
    p.add_argument("--thin", type=int, default=None,
                   help="record every thin-th sampler step")
    p.add_argument("--checkpoint-every", dest="checkpoint_every",
                   type=int, default=None)
    p.add_argument("--mesh-walkers", dest="mesh_walkers", type=int,
                   default=None)
    p.add_argument("--mesh-sources", dest="mesh_sources", type=int,
                   default=None)
    p.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="Use an N-source synthetic catalog instead of -f")
    p.add_argument("--dust-file", dest="dust_file", type=str, default=None,
                   help="Optional dust/E(B-V) table joined on Field+ID "
                        "(the reference hardwired its filename, "
                        "run_lumfuncmcmc.py:241)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="Write a jax.profiler trace of the fit to DIR")
    p.add_argument("--quadrature", type=str, default=None,
                   choices=["trapz", "gauss"],
                   help="trapz = reference parity; gauss = production "
                        "split-panel Gauss-Legendre (default trapz)")
    p.add_argument("--z-param", dest="z_param", type=str, default=None,
                   choices=["pivots", "natural"],
                   help="fitz parameterization: pivot values (reference) "
                        "or value/slope/curvature at z2")
    p.add_argument("--ppc", action="store_true",
                   help="write a posterior predictive check (counts per "
                        "L bin vs the model's Poisson prediction)")
    p.add_argument("--init-map", dest="init_map", action="store_true",
                   default=None,
                   help="start walkers/chains from overdispersed "
                        "Laplace draws around the MAP instead of "
                        "uniform box draws (slashes burn-in; the "
                        "evidence ladder keeps prior-wide starts "
                        "regardless)")
    p.add_argument("--map", action="store_true",
                   help="MAP + Laplace quick-look (fit/fitz/fith): "
                        "multi-start BFGS posterior mode, Hessian "
                        "standard errors, and a Laplace ln Z "
                        "cross-check of --evidence — NO sampling "
                        "(map_*.dat; seconds instead of minutes)")
    p.add_argument("--ic", action="store_true",
                   help="compute WAIC and PSIS-LOO predictive "
                        "information criteria from the fitted posterior "
                        "(no extra sampling; ic_*.dat) — two models' "
                        "elpd difference ranks predictive accuracy")
    p.add_argument("--ic-draws", dest="ic_draws", type=int, default=1000,
                   metavar="S",
                   help="posterior draws used by --ic (default 1000)")
    p.add_argument("--evidence", type=_evidence_rungs, default=None,
                   metavar="K",
                   help="estimate ln Z (marginal likelihood) by "
                        "parallel tempering over a K-rung temperature "
                        "ladder (K >= 3) sampled simultaneously "
                        "(stepping-stone + thermodynamic integration; "
                        "evidence_*.dat); two models' ln Z difference "
                        "is a Bayes factor")
    p.add_argument("--evidence-swap", dest="evidence_swap", type=int,
                   default=0, metavar="M",
                   help="with --evidence: DEO replica-exchange swaps "
                        "between adjacent ladder rungs every M steps "
                        "(true parallel tempering — cold chains "
                        "inherit mode-hopping from the hot rungs; "
                        "composes with a device mesh via ghost-rung "
                        "exchange; 0 = no swaps)")
    p.add_argument("--evidence-tune", dest="evidence_tune", type=int,
                   default=0, metavar="T",
                   help="with --evidence-swap: T short adaptation "
                        "legs before the main run, re-spacing the "
                        "ladder to equalize measured swap rejection "
                        "across pairs (communication-barrier "
                        "schedule, Syed et al. 2021); 0 = fixed "
                        "power-law ladder")
    p.add_argument("--exact-bounds", dest="exact_bounds",
                   action="store_true", default=None,
                   help="free completeness: re-derive the integration "
                        "bound from theta each eval (reference freezes "
                        "it at the build-time parameters)")
    p.add_argument("--use-pallas", dest="use_pallas", action="store_true",
                   default=None,
                   help="force the fused Pallas TPU likelihood kernel "
                        "(the native tier; DEFAULT on TPU backends)")
    p.add_argument("--no-pallas", dest="use_pallas", action="store_false",
                   help="force the XLA likelihood path")
    p.add_argument("--nchains", type=int, default=None, metavar="C",
                   help="--sampler nuts: number of NUTS chains "
                        "(default 8, must be >= 1; with a device mesh "
                        "the count is rounded to the device/axis "
                        "multiple of the selected path)")
    p.add_argument("--nuts-pooled", dest="nuts_pooled",
                   action="store_true",
                   help="--sampler nuts on a mesh with the native "
                        "gradient kernel: pmean-pool step-size/mass "
                        "adaptation across devices (one shared eps "
                        "from the global chain population) instead of "
                        "independent per-device replicas")
    p.add_argument("--min-ess", dest="min_ess", type=float, default=None,
                   metavar="N",
                   help="run until every parameter reaches N effective "
                        "samples (convergence-controlled stopping; "
                        "repeats nsteps-sized blocks, max 50) instead "
                        "of a fixed step count")
    p.add_argument("--ensembles", type=int, default=None, metavar="C",
                   help="run C independent replicated ensembles in one "
                        "vmapped program and report the true "
                        "cross-ensemble Gelman-Rubin R-hat (fills the "
                        "chip at small walker counts)")
    p.add_argument("--distributed", type=str, default=None,
                   metavar="HOST:PORT,NPROC,PID",
                   help="multi-process jax.distributed init (run one "
                        "process per host; PID 0 hosts the coordinator). "
                        "Meshes then span the global device list")


def _build_cfg(args) -> LFConfig:
    overrides = {k: v for k, v in vars(args).items()
                 if k in LFConfig.field_names()}
    if overrides.get("Flim") is not None:
        overrides["Flim"] = tuple(overrides["Flim"])
    file_over = load_config_file(args.config) if args.config else None
    cfg = merge_config(LFConfig(), file_over, overrides)
    # label special-casing applies to the MERGED line name (the reference
    # applies it post-merge too, run_lumfuncmcmc.py:129-132), so a
    # line_name set only in a --config file still gets the right label
    if cfg.line_name == "OIII":
        cfg = cfg.replace(line_plot_name=r"[OIII] $\lambda 5007$")
    elif cfg.line_name == "Ha":
        cfg = cfg.replace(line_plot_name=r"${\rm{H\alpha}}$")
    return cfg


def _pivot_z(cfg: LFConfig, filename) -> LFConfig:
    """Pivot-redshift special cases (``run_lumfuncmcmc_z.py:123-128``)."""
    base = os.path.basename(filename) if filename else ""
    if base == "OIIIGautamWillNoAGN.dat":
        z = (1.20, 1.76, 2.32)
    else:
        z = (1.20, 1.53, 1.86)
    if cfg.line_name == "Ha":
        z = (1.18, 1.36, 1.54)
    return cfg.replace(z1=z[0], z2=z[1], z3=z[2])


def _align_fields(cfg, field_names):
    """Align the per-field config arrays to the catalog's fields.

    By-name matching against cfg.survey_fields when the names are known,
    else positional truncation (see ``io.align_field_params``). With
    fewer unique fields in the data than configured Flim/Omega_0
    entries, the extra entries would enter the Poisson integral as
    surveyed-but-empty fields and bias phistar low (the reference
    crashes in this situation, run_lumfuncmcmc.py:174/defineFlimOmArr).
    Keeping a genuinely surveyed zero-detection field is a library-level
    choice — pass the full arrays to build_context directly for that.
    """
    from lumfuncmcmc_tpu.utils.io import align_field_params
    return align_field_params(cfg, field_names)


def _load_inputs(args, cfg):
    from lumfuncmcmc_tpu.utils.io import read_catalog
    if args.synthetic:
        from lumfuncmcmc_tpu.utils.synth import (
            make_catalog, apply_completeness_cut)
        cat = apply_completeness_cut(
            make_catalog(cfg, n_target=args.synthetic, seed=cfg.seed), cfg)
        return dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
                    lum=None, lum_e=None, field_id=cat["field_id"],
                    field_names=np.asarray(
                        [f"F{i}" for i in range(len(cfg.Flim))]))
    if not args.filename:
        raise SystemExit("either -f FILE or --synthetic N is required")
    cat = read_catalog(args.filename, cfg,
                       dust_fn=getattr(args, "dust_file", None))
    return dict(z=cat["z"], flux=cat.get("flux"),
                flux_e=cat.get("flux_e"), lum=cat.get("lum"),
                lum_e=cat.get("lum_e"), field_id=cat["field_id"],
                field_names=cat["field_names"])


def _apply_precision(cfg):
    """Apply the config precision policy (LFConfig.use_x64): None = auto
    (float64 on CPU for accuracy, float32 on TPU for speed)."""
    import jax
    use = cfg.use_x64
    if use is None:
        use = jax.default_backend() == "cpu"
    jax.config.update("jax_enable_x64", bool(use))


def _make_mesh_maybe(cfg):
    import jax
    if cfg.mesh_walkers or cfg.mesh_sources > 1:
        from lumfuncmcmc_tpu.parallel.mesh import make_mesh
        return make_mesh(cfg.mesh_walkers, cfg.mesh_sources)
    if len(jax.devices()) > 1:
        from lumfuncmcmc_tpu.parallel.mesh import make_mesh
        return make_mesh(len(jax.devices()), 1)
    return None


def _write_outputs(model, cfg, args, outdir, names, z_variant=False):
    from lumfuncmcmc_tpu.utils.io import (
        artifact_path, write_fixed_width_two_line)
    log = model.log
    od = cfg.output_dict

    if od.get("triangle plot"):
        model.triangle_plot(
            artifact_path(outdir, "triangle", args.output_filename,
                          cfg),
            imgtype=od.get("image format", "png"))
        print("Finished making Triangle Plot with Best-fit LF "
              "(and V_eff-method-based data)")
    else:
        model.set_median_fit()
        print("Finished setting median fit and V_eff parameters")

    full_names = names + ["Ln Prob"]
    if od.get("fitposterior"):
        cols = {nm: model.samples[:, i]
                for i, nm in enumerate(full_names)}
        write_fixed_width_two_line(
            artifact_path(outdir, "fitposterior", args.output_filename,
                          cfg, ext="dat"), cols)
        print("Finished writing fitposterior file")
    if od.get("bestfitLF"):
        if not z_variant:
            cols = {"Luminosity": model.lum,
                    "Luminosity_Err": model.lum_e,
                    "MedianLF": model.medianLF}
        else:
            # z variant writes the LF matrix alongside its axes
            # (run_lumfuncmcmc_z.py:276-281)
            cols = {"Luminosity_cols": model.Lout,
                    "Redshift_rows": model.zout,
                    **{f"LF_z{i}": model.medianLF[i]
                       for i in range(model.medianLF.shape[0])}}
        write_fixed_width_two_line(
            artifact_path(outdir, "bestfitLF", args.output_filename, cfg,
                          ext="dat"),
            cols)
        print("Finished writing bestfitLF file")
    if od.get("VeffLF"):
        write_fixed_width_two_line(
            artifact_path(outdir, "VeffLF", args.output_filename, cfg,
                          ext="dat"),
            {"Luminosity": model.Lavg, "BinLF": model.lfbinorig,
             "BinLFErr": np.sqrt(model.var)})
        print("Finished writing VeffLF file")

    # percentile parameters table (run_lumfuncmcmc.py:272-286,316-324)
    percentiles = list(cfg.param_percentiles)
    labels = ["Line"] + [f"{nm}_{per:02d}" for nm in names
                         for per in percentiles]
    model.table = _SimpleTable(labels)
    model.table.add_row([cfg.line_name] + [0.0] * (len(labels) - 1))
    model.add_fitinfo_to_table(percentiles)
    print(model.table)
    if od.get("parameters"):
        formats = {lab: "%0.3f" for lab in labels}
        formats["Line"] = "%s"
        write_fixed_width_two_line(
            os.path.join(outdir, args.output_filename),
            model.table.as_columns(), formats)
        print("Finished writing LF main table")
    if od.get("settings"):
        with open(os.path.join(outdir,
                               args.output_filename + ".args"), "w") as fh:
            d = dict(vars(args))
            d.pop("log", None)
            fh.write(str(d))
        print("Finished writing settings to file")


class _SimpleTable:
    """Tiny astropy.Table stand-in supporting the reference's usage:
    ``table[-1][idx] = value`` and column export."""

    def __init__(self, labels):
        self.labels = labels
        self.rows = []

    def add_row(self, vals):
        self.rows.append(list(vals))

    def __getitem__(self, i):
        return self.rows[i]

    def __len__(self):
        return len(self.rows)

    def as_columns(self):
        return {lab: [row[i] for row in self.rows]
                for i, lab in enumerate(self.labels)}

    def __str__(self):
        out = [" ".join(self.labels)]
        for row in self.rows:
            out.append(" ".join(str(v) for v in row))
        return "\n".join(out)


def _resume_if_done(model, cfg, args, outdir):
    from lumfuncmcmc_tpu.utils.io import (
        artifact_path, read_fixed_width_two_line)
    fn = artifact_path(outdir, "fitposterior", args.output_filename,
                       cfg, ext="dat")
    if not os.path.isfile(fn):
        return False
    tab = read_fixed_width_two_line(fn)
    model.samples = np.column_stack([tab[k] for k in tab])
    model.triangle_plot(
        artifact_path(outdir, "triangle", args.output_filename, cfg),
        imgtype=cfg.output_dict.get("image format", "png"))
    print(f"Resumed from existing {fn}; regenerated plots only")
    return True


def _resumed_outputs(model, cfg, args, outdir):
    """Post-fit analyses on a RESUMED posterior — without this, a
    rerun adding --ic/--ppc/--map/--evidence would print 'regenerated
    plots only' and silently produce nothing. Collective first: the
    evidence ladder must run on EVERY process before any is_primary
    gate (the documented deadlock pattern); --map has its own gate;
    the remaining writers are primary-only."""
    from lumfuncmcmc_tpu.parallel.distributed import is_primary
    ev = (_run_evidence(model, args)
          if getattr(args, "evidence", None) is not None else None)
    if getattr(args, "map", False):
        _map_quicklook(model, cfg, args, outdir)
    if not is_primary():
        return
    if getattr(args, "ic", False):
        _write_ic(model, cfg, args, outdir)
    if getattr(args, "ppc", False):
        _write_ppc(model, cfg, args, outdir)
    if ev is not None:
        _write_evidence(ev, cfg, args, outdir)


def _dispatch_sampler(model, cfg, args, outdir):
    """Shared sampler dispatch for fit/fitz/fith: nuts / replicated
    ensembles / convergence-controlled / plain checkpointed fit, with
    loud warnings for silently-ignored flag combinations and the
    jax.profiler trace wrapper (--profile)."""
    import contextlib
    import jax
    from lumfuncmcmc_tpu.utils.io import artifact_path

    ens = int(getattr(args, "ensembles", None) or 0)
    min_ess = getattr(args, "min_ess", None)
    nchains = getattr(args, "nchains", None)
    nchains = 8 if nchains is None else int(nchains)
    if nchains < 1:
        raise SystemExit(f"--nchains must be >= 1, got {nchains}")
    prof = (jax.profiler.trace(args.profile)
            if getattr(args, "profile", None)
            else contextlib.nullcontext())
    with prof:
        if cfg.sampler == "nuts":
            if ens > 1:
                print("WARNING: --ensembles applies to the ensemble "
                      "sampler; ignored under --sampler nuts")
            ck = (artifact_path(outdir, "checkpoint_nuts",
                                args.output_filename, cfg, ext="npz")
                  if cfg.checkpoint_every else None)
            model.fit_model_nuts(
                nchains=nchains,
                pooled=(True if getattr(args, "nuts_pooled", False)
                        else None),
                min_ess=(float(min_ess) if min_ess else None),
                checkpoint_path=ck,
                resume=bool(ck and os.path.exists(ck)))
        elif ens > 1 and min_ess:
            # block-extended ensembles; checkpoint_every enables
            # per-block saves (a DISTINCT artifact kind from both the
            # fixed-length ensembles and the plain min-ess protocols)
            ck = (artifact_path(outdir, "checkpoint_ens_until",
                                args.output_filename, cfg, ext="npz")
                  if cfg.checkpoint_every else None)
            model.fit_model_ensembles(
                ens, min_ess=float(min_ess), checkpoint_path=ck,
                resume=bool(ck and os.path.exists(ck)))
        elif ens > 1:
            ck = None
            if cfg.checkpoint_every:
                # a DISTINCT artifact kind: the plain-fit checkpoint of
                # the same output name has an incompatible
                # layout/fingerprint
                ck = artifact_path(outdir, "checkpoint_ens",
                                   args.output_filename, cfg, ext="npz")
                if not os.path.exists(ck):
                    # pre-rename ensembles checkpoints used the plain
                    # kind; a 7-wide fingerprint identifies them — keep
                    # in-flight runs resumable
                    legacy = artifact_path(outdir, "checkpoint",
                                           args.output_filename, cfg,
                                           ext="npz")
                    if os.path.exists(legacy):
                        try:
                            nfp = np.load(legacy)["fingerprint"].shape[0]
                        except Exception:
                            nfp = 0
                        if nfp == 7:
                            print("WARNING: resuming from a legacy "
                                  "ensembles checkpoint name "
                                  "(checkpoint_...); new runs write "
                                  "checkpoint_ens_...")
                            ck = legacy
            model.fit_model_ensembles(
                ens, checkpoint_path=ck,
                resume=bool(ck and os.path.exists(ck)))
        elif min_ess:
            if cfg.thin > 1:
                print("WARNING: --thin is ignored under --min-ess")
            # checkpoint_every enables per-block saving (blocks are
            # cfg.nsteps long — the ESS loop re-decides stopping each
            # block, so the block size IS the save cadence)
            ck = (artifact_path(outdir, "checkpoint_until",
                                args.output_filename, cfg, ext="npz")
                  if cfg.checkpoint_every else None)
            model.fit_model_until(
                float(min_ess), checkpoint_path=ck,
                resume=bool(ck and os.path.exists(ck)))
        else:
            ck = (artifact_path(outdir, "checkpoint",
                                args.output_filename, cfg, ext="npz")
                  if cfg.checkpoint_every else None)
            model.fit_model(checkpoint_path=ck,
                            resume=bool(ck and os.path.exists(ck)))


def cmd_fit(args):
    args.output_filename = args.output_filename or "test.dat"
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    cfg = _build_cfg(args)
    _apply_precision(cfg)
    outdir = "LFMCMCOut"
    os.makedirs(outdir, exist_ok=True)
    inputs = _load_inputs(args, cfg)
    cfg = _align_fields(cfg, inputs["field_names"])
    print("Read Input File")
    model = LumFuncModel(cfg, z=inputs["z"], flux=inputs["flux"],
                         flux_e=inputs["flux_e"], lum=inputs["lum"],
                         lum_e=inputs["lum_e"],
                         field_id=inputs["field_id"],
                         field_names=inputs["field_names"],
                         mesh=_make_mesh_maybe(cfg))
    print("Initialized LumFuncModel")
    if _resume_if_done(model, cfg, args, outdir):
        _resumed_outputs(model, cfg, args, outdir)
        return 0
    names = model.get_param_names()
    print("Labels:", names)
    if getattr(args, "map", False):
        return _map_only_outputs(model, cfg, args, outdir)
    _dispatch_sampler(model, cfg, args, outdir)
    # collective: every process runs the ladder; process 0 writes
    ev = (_run_evidence(model, args)
          if getattr(args, "evidence", None) is not None else None)
    from lumfuncmcmc_tpu.parallel.distributed import is_primary
    if not is_primary():
        # every process holds the full gathered chain after fit_model;
        # exactly one writes (shared filesystems would race otherwise)
        print("Non-primary process: artifacts written by process 0")
        return 0
    print("Finished fitting model and about to create outputs")
    _write_outputs(model, cfg, args, outdir, names)
    if getattr(args, "ppc", False):
        _write_ppc(model, cfg, args, outdir)
    if getattr(args, "ic", False):
        _write_ic(model, cfg, args, outdir)
    if ev is not None:
        _write_evidence(ev, cfg, args, outdir)
    return 0


def _write_ppc(model, cfg, args, outdir):
    from lumfuncmcmc_tpu.models.ppc import (
        posterior_predictive_check, plot_ppc)
    from lumfuncmcmc_tpu.models.context import build_context
    from lumfuncmcmc_tpu.utils.io import (
        artifact_path, write_fixed_width_two_line)
    if cfg.exact_bounds:
        print("WARNING: --ppc evaluates predicted counts on the frozen "
              "build-time grid; with --exact-bounds the posterior was "
              "sampled under per-theta integration bounds, so faint-bin "
              "predictions can be biased where posterior Flim drifts "
              "from the build-time value")
    # rate evaluation on a FINER grid than the fit used: whole
    # quadrature-node weights land in single bins, so coarse grids
    # (gauss-32 especially) quantize the per-bin rates by up to ~5%
    # rebuild from the log-luminosities (unit-stable: LFData.flux is
    # absolute cgs while build_context takes 1e-17 units); base on
    # model.cfg so the z/hier models' forced fix_comp=True carries over
    d = model.data
    _, ctx_fine = build_context(
        model.cfg.replace(size_ln=max(201, model.cfg.size_ln or 0),
                          quadrature="trapz"),
        z=d.z, lum=d.lum, lum_e=d.lum_e, field_id=d.field_id)
    ppc = posterior_predictive_check(model.samples, ctx_fine,
                                     model.layout, nbins=cfg.nbins,
                                     seed=cfg.seed)
    write_fixed_width_two_line(
        artifact_path(outdir, "ppc", args.output_filename, cfg,
                      ext="dat"),
        {"Luminosity": ppc["centers"], "Observed": ppc["observed"],
         "PredMean": ppc["rate_mean"], "Pred16": ppc["pred_p16"],
         "Pred84": ppc["pred_p84"], "PValue": ppc["pvalue"]})
    plot_ppc(ppc, artifact_path(outdir, "ppc", args.output_filename,
                                cfg, ext="png"))
    print("Finished writing posterior predictive check "
          f"(N_obs={ppc['total_observed']}, "
          f"E[N_pred]={ppc['total_predicted']:.1f})")


def _map_only_outputs(model, cfg, args, outdir):
    """Fresh-run --map path: no sampling happens, so the
    sampling-dependent flags (--ic/--ppc) cannot run — warn instead of
    silently ignoring them. --evidence needs no posterior, so it DOES
    run, making a fresh `--map --evidence` invocation produce the same
    artifacts as the resumed one (`_resumed_outputs`). Collective
    first: the ladder must run on every process before any
    is_primary-gated writer (the documented deadlock pattern)."""
    from lumfuncmcmc_tpu.parallel.distributed import is_primary
    skipped = [f for f in ("ic", "ppc") if getattr(args, f, False)]
    if skipped:
        print("WARNING: --map skips sampling, so "
              + "/".join("--" + f for f in skipped)
              + " cannot run (they need a posterior); rerun without "
              "--map, or rerun with the same output file once a "
              "posterior exists to add them")
    ev = (_run_evidence(model, args)
          if getattr(args, "evidence", None) is not None else None)
    rc = _map_quicklook(model, cfg, args, outdir)
    if ev is not None and is_primary():
        _write_evidence(ev, cfg, args, outdir)
    return rc


def _map_quicklook(model, cfg, args, outdir):
    """--map: MAP + Laplace instead of sampling. The fit is a plain
    per-process jit with no collectives (multi-process safe in any
    order); only process 0 writes."""
    from lumfuncmcmc_tpu.parallel.distributed import is_primary
    from lumfuncmcmc_tpu.utils.io import (
        artifact_path, write_fixed_width_two_line)
    res = model.fit_map()
    if not is_primary():
        print("Non-primary process: artifacts written by process 0")
        return 0
    cols = {}
    se = res["se"]
    for i, nm in enumerate(model.layout.names):
        cols[nm] = np.asarray([res["theta"][i]])
        cols[nm + "_se"] = np.asarray(
            [se[i] if se is not None else np.nan])
    cols["lnpost"] = np.asarray([res["lnpost"]])
    cols["lnz_laplace"] = np.asarray(
        [np.nan if res["lnz_laplace"] is None else res["lnz_laplace"]])
    write_fixed_width_two_line(
        artifact_path(outdir, "map", args.output_filename, cfg,
                      ext="dat"), cols)
    if np.asarray(res["boundary"]).any():
        pinned = [nm for nm, b in zip(model.layout.names,
                                      res["boundary"]) if b]
        print("NOTE: MAP pinned at the prior bound for "
              f"{', '.join(pinned)} — those columns carry no Laplace "
              "error (edge mass is not Gaussian; ln Z integrates the "
              "posterior slice along each pinned axis numerically); "
              "widen the box if they should be free")
    print("Finished writing MAP/Laplace quick-look "
          f"(lnpost={res['lnpost']:.3f}"
          + ("" if res["lnz_laplace"] is None
             else f", Laplace ln Z={res['lnz_laplace']:.3f}") + ")")
    return 0


def _write_ic(model, cfg, args, outdir):
    """Compute + write WAIC / PSIS-LOO (primary process only — the
    computation is a plain per-process jit with no collectives, so it
    is safe after the is_primary gate, unlike the evidence ladder)."""
    from lumfuncmcmc_tpu.utils.io import (
        artifact_path, write_fixed_width_two_line)
    ic = model.information_criteria(ndraws=int(args.ic_draws))
    write_fixed_width_two_line(
        artifact_path(outdir, "ic", args.output_filename, cfg,
                      ext="dat"),
        {k: np.asarray([ic[k]]) for k in
         ("elpd_waic", "se_waic", "p_waic", "elpd_loo", "se_loo",
          "p_loo", "lppd", "k_max", "frac_k_gt_07", "count_lppd",
          "elpd_waic_total", "n_sources", "ndraws")})
    # per-source arrays: the paired inputs `compare-ic` needs
    np.savez(artifact_path(outdir, "ic_pointwise",
                           args.output_filename, cfg, ext="npz"),
             elpd_waic_i=ic["elpd_waic_i"],
             elpd_loo_i=ic["elpd_loo_i"],
             pareto_k=ic["pareto_k"])
    print("Finished writing information criteria "
          f"(elpd_waic={ic['elpd_waic']:.2f}+-{ic['se_waic']:.2f}, "
          f"elpd_loo={ic['elpd_loo']:.2f}+-{ic['se_loo']:.2f}, "
          f"max Pareto k={ic['k_max']:.2f})")


def cmd_compare_ic(args):
    """Paired model comparison from two --ic pointwise artifacts
    (same catalog required — enforced by the paired-shape check)."""
    from lumfuncmcmc_tpu.models.ic import compare_ic
    a = dict(np.load(args.npz_a))
    b = dict(np.load(args.npz_b))
    r = None
    for which in ("loo", "waic"):
        res = compare_ic(a, b, which=which)
        if which == "loo":
            r = res
        print(f"elpd_{which}(A) - elpd_{which}(B) = "
              f"{res['delta']:+.3f} +- {res['se']:.3f}  "
              f"(z = {res['z']:+.2f}, {res['n_sources']} paired "
              "sources)")
    verdict = {"a": f"model A ({args.npz_a}) is preferred",
               "b": f"model B ({args.npz_b}) is preferred",
               "tie": "no significant preference (|z| <= 2)"}
    kmax = float(max(a["pareto_k"].max(), b["pareto_k"].max()))
    if kmax > 0.7:
        print(f"WARNING: max Pareto k = {kmax:.2f} > 0.7 — some LOO "
              "columns are unreliable; weigh the WAIC line more")
    print(verdict[r["preferred"]])
    return 0


def cmd_stack_ic(args):
    """Stacking weights over K models' pointwise-elpd artifacts: the
    optimal predictive mixture, not just a pairwise ranking."""
    from lumfuncmcmc_tpu.models.ic import stacking_weights
    # the only standalone JAX-using subcommand: apply the same
    # precision policy the fit commands do (f64 on CPU) so the BFGS
    # does not silently run the f64 elpd columns in f32
    _apply_precision(LFConfig())
    if len(args.npz) < 2:
        print("stack-ic needs at least 2 ic_pointwise npz files")
        return 1
    cols = []
    for p in args.npz:
        cols.append(np.asarray(np.load(p)["elpd_loo_i"],
                               dtype=np.float64))
        if cols[-1].shape != cols[0].shape:
            raise ValueError(
                f"stacking needs the same sources: {args.npz[0]} has "
                f"{cols[0].shape[0]} pointwise terms, {p} "
                f"{cols[-1].shape[0]} — were all fits run on the same "
                "catalog?")
    w, info = stacking_weights(np.column_stack(cols))
    for i, p in enumerate(args.npz):
        print(f"  w={w[i]:.4f}  (pseudo-BMA {info['pseudo_bma'][i]:.4f},"
              f" elpd_loo {info['log_score_single'][i]:.3f})  {p}")
    print(f"stacked log score {info['log_score']:.3f} vs best single "
          f"{info['log_score_single'].max():.3f} "
          f"({len(cols[0])} paired sources)")
    return 0


def _run_evidence(model, args):
    """Run the tempered-evidence ladder. COLLECTIVE: under
    --distributed every process must call this (shard_map over the
    global mesh + the collective to_host live inside) — only the
    artifact write (:func:`_write_evidence`) is primary-only."""
    swap = int(getattr(args, "evidence_swap", 0) or 0)
    tune = int(getattr(args, "evidence_tune", 0) or 0)
    if tune and not swap:
        raise SystemExit("--evidence-tune needs --evidence-swap M "
                         "(the ladder is tuned from measured swap "
                         "rates)")
    return model.log_evidence(nrungs=int(args.evidence),
                              swap_every=swap, tune_rounds=tune)


def _write_evidence(ev, cfg, args, outdir):
    """Write the per-rung E_beta[lnlike] curve plus the two
    estimators (evidence_*.dat). Primary process only."""
    from lumfuncmcmc_tpu.utils.io import (
        artifact_path, write_fixed_width_two_line)
    K = int(ev["nrungs"])
    write_fixed_width_two_line(
        artifact_path(outdir, "evidence", args.output_filename, cfg,
                      ext="dat"),
        {"Beta": ev["betas"], "MeanLnL": ev["mean_lnl"],
         # scalar summaries replicated per row: the two-line format
         # has no header fields, and one flat table round-trips
         "LnZ_SS": np.full(K, ev["lnz_ss"]),
         "LnZ_SS_err": np.full(K, ev["lnz_ss_err"]),
         "LnZ_TI": np.full(K, ev["lnz_ti"]),
         "LnZ_TI_err": np.full(K, ev["lnz_ti_err"])})
    print("Finished writing evidence ladder "
          f"(ln Z = {ev['lnz_ss']:.3f} +- {ev['lnz_ss_err']:.3f} "
          f"stepping-stone, "
          f"{ev['lnz_ti']:.3f} +- {ev['lnz_ti_err']:.3f} TI)")


def cmd_fitz(args):
    args.output_filename = args.output_filename or "test.dat"
    from lumfuncmcmc_tpu.models.model import LumFuncModelZ
    cfg = _pivot_z(_build_cfg(args), args.filename)
    _apply_precision(cfg)
    outdir = "LFMCMCzOut"
    os.makedirs(outdir, exist_ok=True)
    inputs = _load_inputs(args, cfg)
    cfg = _align_fields(cfg, inputs["field_names"])
    print("Read Input File")
    model = LumFuncModelZ(cfg, z=inputs["z"], flux=inputs["flux"],
                          flux_e=inputs["flux_e"], lum=inputs["lum"],
                          lum_e=inputs["lum_e"],
                          field_id=inputs["field_id"],
                          field_names=inputs["field_names"],
                          mesh=_make_mesh_maybe(cfg))
    print("Initialized LumFuncModelZ")
    if _resume_if_done(model, cfg, args, outdir):
        _resumed_outputs(model, cfg, args, outdir)
        return 0
    names = model.get_param_names()
    print("Labels:", names)
    if getattr(args, "map", False):
        return _map_only_outputs(model, cfg, args, outdir)
    _dispatch_sampler(model, cfg, args, outdir)
    ev = (_run_evidence(model, args)
          if getattr(args, "evidence", None) is not None else None)
    from lumfuncmcmc_tpu.parallel.distributed import is_primary
    if not is_primary():
        print("Non-primary process: artifacts written by process 0")
        return 0
    print("Finished fitting model and about to create outputs")
    _write_outputs(model, cfg, args, outdir, names, z_variant=True)
    if getattr(args, "ppc", False):
        _write_ppc(model, cfg, args, outdir)
    if getattr(args, "ic", False):
        _write_ic(model, cfg, args, outdir)
    if ev is not None:
        _write_evidence(ev, cfg, args, outdir)
    return 0


def cmd_fith(args):
    """Hierarchical multi-field joint fit (new capability).

    Parallels :func:`cmd_fit`; the model is
    :class:`~lumfuncmcmc_tpu.models.model.LumFuncModelH`."""
    args.output_filename = args.output_filename or "test.dat"
    from lumfuncmcmc_tpu.models.model import LumFuncModelH
    cfg = _build_cfg(args)
    _apply_precision(cfg)
    outdir = "LFMCMCHOut"
    os.makedirs(outdir, exist_ok=True)
    inputs = _load_inputs(args, cfg)
    cfg = _align_fields(cfg, inputs["field_names"])
    print("Read Input File")
    model = LumFuncModelH(cfg, z=inputs["z"], flux=inputs["flux"],
                          flux_e=inputs["flux_e"], lum=inputs["lum"],
                          lum_e=inputs["lum_e"],
                          field_id=inputs["field_id"],
                          field_names=inputs["field_names"],
                          mesh=_make_mesh_maybe(cfg))
    print("Initialized LumFuncModelH")
    if _resume_if_done(model, cfg, args, outdir):
        _resumed_outputs(model, cfg, args, outdir)
        return 0
    names = model.get_param_names()
    print("Labels:", names)
    if getattr(args, "map", False):
        return _map_only_outputs(model, cfg, args, outdir)
    _dispatch_sampler(model, cfg, args, outdir)
    ev = (_run_evidence(model, args)
          if getattr(args, "evidence", None) is not None else None)
    from lumfuncmcmc_tpu.parallel.distributed import is_primary
    if not is_primary():
        print("Non-primary process: artifacts written by process 0")
        return 0
    print("Finished fitting model and about to create outputs")
    _write_outputs(model, cfg, args, outdir, names)
    if getattr(args, "ppc", False):
        _write_ppc(model, cfg, args, outdir)
    if getattr(args, "ic", False):
        _write_ic(model, cfg, args, outdir)
    if ev is not None:
        _write_evidence(ev, cfg, args, outdir)
    return 0


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
        import jax
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
        fz, zz = cw["flux"], cw["z"]
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


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="lumfuncmcmc_tpu",
        description="TPU-native luminosity-function inference")
    sub = parser.add_subparsers(dest="command", required=True)

    p_fit = sub.add_parser("fit", help="single-epoch Schechter MCMC fit")
    _add_common_flags(p_fit)
    p_fit.add_argument("-fc", "--fix_comp", action="store_true",
                       default=None)
    p_fit.add_argument("-sr", "--same_rand", action="store_true")
    p_fit.set_defaults(func=cmd_fit)

    p_fitz = sub.add_parser("fitz", help="redshift-evolving Schechter fit")
    _add_common_flags(p_fitz)
    p_fitz.set_defaults(func=cmd_fitz)

    p_fith = sub.add_parser(
        "fith", help="hierarchical multi-field joint fit (new)")
    _add_common_flags(p_fith)
    p_fith.set_defaults(func=cmd_fith)

    p_cmp = sub.add_parser(
        "compare-ic",
        help="paired elpd comparison of two --ic runs on the same "
             "catalog (reads the ic_pointwise_*.npz artifacts)")
    p_cmp.add_argument("npz_a", type=str,
                       help="ic_pointwise npz of model A")
    p_cmp.add_argument("npz_b", type=str,
                       help="ic_pointwise npz of model B")
    p_cmp.set_defaults(func=cmd_compare_ic)

    p_stk = sub.add_parser(
        "stack-ic",
        help="stacking weights for model averaging from K --ic runs "
             "on the same catalog (Yao et al. 2018)")
    p_stk.add_argument("npz", type=str, nargs="+",
                       help="ic_pointwise npz artifacts (>= 2)")
    p_stk.set_defaults(func=cmd_stack_ic)

    p_vmax = sub.add_parser("vmax", help="standalone 1/V_eff pipeline")
    _add_common_flags(p_vmax)
    p_vmax.add_argument("--zbins", type=int, default=1)
    p_vmax.add_argument("--integ", action="store_true")
    p_vmax.add_argument("--linear", action="store_true",
                        help="linear-luminosity pipeline (combineSteps; "
                             "default is the log pipeline)")
    p_vmax.add_argument("--correct-low", dest="correct_low",
                        action="store_true",
                        help="partial-bin completeness correction "
                             "(getBootErrLog correct_low)")
    p_vmax.add_argument("--img-dir", dest="img_dir", type=str,
                        default="ImageFiles")
    p_vmax.add_argument("--mcf-scan", dest="mcf_scan", type=str,
                        default=None, metavar="LO,HI,N",
                        help="scan min_comp_frac over N values and write "
                             "the (alpha, L*) vs mcf parameter-space "
                             "scatter (VmaxLumFunc.py:691-699,799-815)")
    p_vmax.set_defaults(func=cmd_vmax)

    args = parser.parse_args(argv)
    if (int(getattr(args, "evidence_tune", 0) or 0)
            and not int(getattr(args, "evidence_swap", 0) or 0)):
        # fail at argument-handling time: _run_evidence's own check
        # fires only AFTER the sampler dispatch, i.e. after a
        # potentially hours-long run has already completed (ADVICE r4)
        parser.error("--evidence-tune needs --evidence-swap M (the "
                     "ladder is tuned from measured swap rates)")
    if getattr(args, "distributed", None):
        # must run before any other JAX use so the backend comes up in
        # multi-controller mode and meshes span the global device list
        from lumfuncmcmc_tpu.parallel.distributed import (
            init_distributed, parse_distributed_spec)
        coord, nproc, pid = parse_distributed_spec(args.distributed)
        init_distributed(coord, nproc, pid)
    if getattr(args, "same_rand", False):
        args.diff_rand = False
    setup_logging()
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
