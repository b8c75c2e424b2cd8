"""The three MCMC fit subcommands.

- ``fit``  — single-epoch Schechter fit (``run_lumfuncmcmc.py:230-331``)
- ``fitz`` — redshift-evolving fit (``run_lumfuncmcmc_z.py:203-304``)
- ``fith`` — hierarchical multi-field joint fit (new capability)

All three share :func:`_dispatch_sampler` (nuts / replicated ensembles /
convergence-controlled / plain checkpointed fit) and the writers in
:mod:`lumfuncmcmc_tpu.cli.outputs`.
"""

from __future__ import annotations

import os

import numpy as np

from lumfuncmcmc_tpu.cli.common import (
    _align_fields, _apply_precision, _build_cfg, _load_inputs,
    _make_mesh_maybe, _pivot_z)
from lumfuncmcmc_tpu.cli.outputs import (
    _map_only_outputs, _resume_if_done, _resumed_outputs, _run_evidence,
    _write_evidence, _write_ic, _write_outputs, _write_ppc)


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


def _run_fit_family(args, model_cls, outdir, z_variant=False,
                    pivot=False):
    """The shared fit/fitz/fith driver body: build config + model, the
    resume-and-replot early exit, --map early exit, sampler dispatch,
    then the collective-before-is_primary artifact sequence."""
    args.output_filename = args.output_filename or "test.dat"
    cfg = _build_cfg(args)
    if pivot:
        cfg = _pivot_z(cfg, args.filename)
    _apply_precision(cfg)
    os.makedirs(outdir, exist_ok=True)
    inputs = _load_inputs(args, cfg)
    cfg = _align_fields(cfg, inputs["field_names"])
    print("Read Input File")
    model = model_cls(cfg, z=inputs["z"], flux=inputs["flux"],
                      flux_e=inputs["flux_e"], lum=inputs["lum"],
                      lum_e=inputs["lum_e"],
                      field_id=inputs["field_id"],
                      field_names=inputs["field_names"],
                      mesh=_make_mesh_maybe(cfg))
    print(f"Initialized {model_cls.__name__}")
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
    _write_outputs(model, cfg, args, outdir, names, z_variant=z_variant)
    if getattr(args, "ppc", False):
        _write_ppc(model, cfg, args, outdir)
    if getattr(args, "ic", False):
        _write_ic(model, cfg, args, outdir)
    if ev is not None:
        _write_evidence(ev, cfg, args, outdir)
    return 0


def cmd_fit(args):
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    return _run_fit_family(args, LumFuncModel, "LFMCMCOut")


def cmd_fitz(args):
    from lumfuncmcmc_tpu.models.model import LumFuncModelZ
    return _run_fit_family(args, LumFuncModelZ, "LFMCMCzOut",
                           z_variant=True, pivot=True)


def cmd_fith(args):
    """Hierarchical multi-field joint fit (new capability).

    Parallels :func:`cmd_fit`; the model is
    :class:`~lumfuncmcmc_tpu.models.model.LumFuncModelH`."""
    from lumfuncmcmc_tpu.models.model import LumFuncModelH
    return _run_fit_family(args, LumFuncModelH, "LFMCMCHOut")
