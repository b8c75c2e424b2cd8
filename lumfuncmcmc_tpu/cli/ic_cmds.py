"""Standalone information-criteria subcommands: paired model
comparison and stacking weights over ``--ic`` pointwise artifacts.
Both are additions over the reference (which has no model-comparison
machinery)."""

from __future__ import annotations

import numpy as np

from lumfuncmcmc_tpu.cli.common import _apply_precision
from lumfuncmcmc_tpu.config import LFConfig


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
