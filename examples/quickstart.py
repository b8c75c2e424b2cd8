"""Quickstart: fit a Schechter luminosity function on synthetic data.

Run from the repo root:

    python examples/quickstart.py

Draws a multi-field catalog from a known Schechter process, fits it
with the stretch-move ensemble AND with NUTS, cross-checks against the
1/V_eff estimator, and writes a corner plot — a compact tour of the
library API. Works on CPU (float64) or TPU (float32) unchanged.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

import numpy as np

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.model import LumFuncModel
from lumfuncmcmc_tpu.models.schfit import fit_schechter
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut

TRUTH = dict(Lstar=42.5, phistar=-2.6, sch_al=-1.6)


def main():
    cfg = LFConfig(
        min_comp_frac=0.5,
        fix_comp=True,            # completeness fixed -> 3-parameter fit
        quadrature="gauss",       # split-panel GL-32 production mode
        nwalkers=64,
        nsteps=800,
        seed=0,
        **TRUTH,
    )

    cat = apply_completeness_cut(
        make_catalog(cfg, n_target=3000, seed=1), cfg)
    print(f"synthetic catalog: {len(cat['z'])} sources, "
          f"{len(cfg.Flim)} fields; truth {TRUTH}")

    model = LumFuncModel(cfg, z=cat["z"], flux=cat["flux"],
                         flux_e=cat["flux_e"], field_id=cat["field_id"])

    # --- ensemble fit ---
    samples = model.fit_model()
    for i, name in enumerate(["logL*", "logphi*", "alpha"]):
        med = np.median(samples[:, i])
        lo, hi = np.percentile(samples[:, i], [16, 84])
        print(f"  stretch  {name:8s} = {med:7.3f}  (+{hi - med:.3f} "
              f"-{med - lo:.3f})")

    # --- NUTS on the same posterior ---
    samples_n = model.fit_model_nuts(num_warmup=300, nchains=8)
    for i, name in enumerate(["logL*", "logphi*", "alpha"]):
        print(f"  NUTS     {name:8s} = {np.median(samples_n[:, i]):7.3f}")

    # --- independent replicated ensembles + true multi-chain R-hat ---
    # (on a multi-device mesh, pass mesh= to the model and the replicas
    # run one-per-device: model = LumFuncModel(cfg, mesh=make_mesh(...)))
    model.fit_model_ensembles(4)
    print("  cross-ensemble R-hat:",
          np.round(model.rhat_ensembles, 4))

    # --- marginal likelihood (Bayes-factor model comparison) ---
    # all ladder rungs sample at once; compare another model's lnz_ss
    # on the same catalog to get a Bayes factor
    ev = model.log_evidence(nrungs=12, nsteps=300)
    print(f"  ln Z = {ev['lnz_ss']:.2f} (stepping-stone, "
          f"{ev['nrungs']} rungs)")

    # --- WAIC / PSIS-LOO (predictive model comparison, no extra
    # sampling: reuses the posterior draws the fit already produced) ---
    ic = model.information_criteria(ndraws=400)
    print(f"  elpd_waic = {ic['elpd_waic']:.2f} +- {ic['se_waic']:.2f}"
          f"  (p_waic {ic['p_waic']:.1f}, max Pareto k "
          f"{ic['k_max']:.2f})")

    # --- 1/V_eff cross-check + chi^2 Schechter fit to the binned LF ---
    lavg, lfbin, var = model.veff_lf()
    good = lfbin > 0
    fit = fit_schechter(lavg[good], lfbin[good], var[good],
                        name=cfg.line_name, log=True)
    print(fit.fit_report())

    # --- plots + artifacts ---
    os.makedirs("QuickstartOut", exist_ok=True)
    model.triangle_plot("QuickstartOut/triangle_quickstart")
    print("wrote QuickstartOut/triangle_quickstart.png")


if __name__ == "__main__":
    main()
