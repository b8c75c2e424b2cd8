"""CLI entry point.

Subcommands (one binary instead of the reference's two scripts + module
main):

- ``fit``  — single-epoch Schechter fit (``run_lumfuncmcmc.py:230-331``)
- ``fitz`` — redshift-evolving fit (``run_lumfuncmcmc_z.py:203-304``)
- ``fith`` — hierarchical multi-field joint fit (new)
- ``vmax`` — standalone V_eff pipeline (``VmaxLumFunc.combineStepsLog`` /
  ``zEvolSteps``, ``VmaxLumFunc.py:581-689``)
- ``compare-ic`` / ``stack-ic`` — model comparison over --ic artifacts

The implementation lives in per-subcommand modules:
:mod:`~lumfuncmcmc_tpu.cli.common` (shared flags + config plumbing),
:mod:`~lumfuncmcmc_tpu.cli.fit` (fit/fitz/fith),
:mod:`~lumfuncmcmc_tpu.cli.vmax`, :mod:`~lumfuncmcmc_tpu.cli.ic_cmds`,
and :mod:`~lumfuncmcmc_tpu.cli.outputs` (artifact writers). This module
only builds the parser and dispatches.
"""

from __future__ import annotations

import argparse
import sys

from lumfuncmcmc_tpu.cli.common import _add_common_flags
from lumfuncmcmc_tpu.cli.fit import cmd_fit, cmd_fith, cmd_fitz
from lumfuncmcmc_tpu.cli.ic_cmds import cmd_compare_ic, cmd_stack_ic
from lumfuncmcmc_tpu.cli.vmax import cmd_vmax
from lumfuncmcmc_tpu.utils.logging import setup_logging


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
